"""read_parquet schema-memo contract (r13 optimization batch 3).

`io.read_parquet` memoizes the parquet SCHEMA per (path, mtime) so repeat
reads of an immutable table skip the per-invocation 1-task footer-inference
job. The contract under test:

1. the memo-hit read returns the same schema AND the same rows as a plain
   `spark.read.parquet` — only the inference job is skipped, never data;
2. rewriting the path (new mtime) invalidates the entry, so a rebuilt
   state directory is never served a stale schema or stale file listing.
"""

from __future__ import annotations

import os
import time

from d3d_etl_spark.io import _PARQUET_SCHEMAS, read_parquet


def test_memo_hit_matches_plain_read(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(path)

    first = read_parquet(spark, path)  # populates the memo
    key = (os.path.abspath(path), os.path.getmtime(path))
    assert key in _PARQUET_SCHEMAS

    hit = read_parquet(spark, path)  # memo hit: schema supplied, no inference
    plain = spark.read.parquet(path)
    assert hit.schema == plain.schema == first.schema
    assert sorted(r.id for r in hit.collect()) == list(range(100))
    assert {r.v for r in hit.collect()} == {2 * i for i in range(100)}


def test_rebuild_invalidates_memo(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(10).selectExpr("id").write.parquet(path)
    read_parquet(spark, path)
    old_key = (os.path.abspath(path), os.path.getmtime(path))
    assert old_key in _PARQUET_SCHEMAS

    # rebuild with a DIFFERENT schema at the same path (the state families'
    # os.replace rebuild): the mtime key must miss, re-infer, and serve the
    # new schema + new files
    time.sleep(0.05)  # ensure a distinct mtime even on coarse filesystems
    spark.range(7).selectExpr("id", "CAST(id AS STRING) AS s").write.mode(
        "overwrite"
    ).parquet(path)
    os.utime(path)
    df = read_parquet(spark, path)
    assert "s" in df.columns
    assert df.count() == 7


def test_load_table_matches_direct_read(spark, sf_dir):
    from d3d_etl_spark.io import load_table

    lt = load_table(spark, sf_dir, "nation")
    direct = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    assert lt.schema == direct.schema
    assert sorted(map(tuple, lt.collect())) == sorted(map(tuple, direct.collect()))
