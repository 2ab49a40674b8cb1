"""Structured Streaming tests: the same pipelines run batch and streaming
(file source, availableNow) and must agree; late rows beyond the watermark
are the only permitted divergence."""

from __future__ import annotations

import os

import pytest

from d3d_etl_spark.io import load_table
from d3d_etl_spark.streaming.events import streaming_sessions, windowed_event_counts


def _run_stream_to_memory(spark, stream_df, name: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    batch = load_table(spark, sf_dir, "events")
    # stage as parquet with µs timestamps so readStream sees a plain schema
    staged = os.path.join(str(tmp_path), "events")
    batch.write.parquet(staged)
    stream_src = spark.readStream.schema(batch.schema).parquet(staged)

    _run_stream_to_memory(spark, windowed_event_counts(stream_src), "win_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in windowed_event_counts(batch).collect()
    }
    assert got == want
    assert len(want) > 0


def test_streaming_sessions_runs(spark, sf_dir, tmp_path):
    batch = load_table(spark, sf_dir, "events")
    staged = os.path.join(str(tmp_path), "events2")
    batch.write.parquet(staged)
    stream_src = spark.readStream.schema(batch.schema).parquet(staged)

    _run_stream_to_memory(spark, streaming_sessions(stream_src), "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    by_user = {}
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        by_user.setdefault(r["user_id"], 0)
        by_user[r["user_id"]] += r["n_events"]
    # every event lands in exactly one session
    assert sum(by_user.values()) == batch.count()


def test_streaming_funnel_matches_batch_fsm(spark, sf_dir, tmp_path):
    """applyInPandasWithState funnel over a stream ends with the same totals
    as the batch grouped-FSM (state carries across micro-batches: the
    source is staged as MULTIPLE files so availableNow makes several
    batches)."""
    import os

    from d3d_etl_spark.operators.fsm import FUNNEL_SCHEMA, funnel_fsm, run_grouped_fsm
    from d3d_etl_spark.streaming.stateful import streaming_funnel

    import glob
    import time

    from pyspark.sql import functions as F

    batch = load_table(spark, sf_dir, "events")
    staged = os.path.join(str(tmp_path), "events_stream")
    # stage TIME-ORDERED chunks (live ingest delivers events in event-time
    # order; an arbitrary split would feed the order-sensitive FSM shuffled
    # history). FileStreamSource processes files by modification time, so
    # stamp increasing mtimes explicitly.
    lo, hi = batch.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 4
    os.makedirs(staged)
    t0 = time.time() - 1000
    for i in range(4):
        chunk_lo = lo + i * span
        chunk_hi = hi if i == 3 else lo + (i + 1) * span
        cond = (F.col("ts") >= F.lit(chunk_lo)) & (
            F.col("ts") <= F.lit(chunk_hi) if i == 3 else F.col("ts") < F.lit(chunk_hi)
        )
        batch.where(cond).coalesce(1).write.parquet(os.path.join(staged, f"chunk{i}"))
        for f in glob.glob(os.path.join(staged, f"chunk{i}", "*.parquet")):
            os.utime(f, (t0 + i * 10, t0 + i * 10))

    stream_src = spark.readStream.option("maxFilesPerTrigger", 1).schema(
        batch.schema
    ).parquet(os.path.join(staged, "chunk*"))
    q = (
        streaming_funnel(stream_src)
        .writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode emits one row per user per trigger; last row per user wins.
    # The memory sink appends, so take the max n_funnels (monotone counters).
    got = {
        r["user_id"]: (r["n_funnels"], r["n_abandoned"])
        for r in spark.sql(
            """
            SELECT user_id, n_funnels, n_abandoned FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id
                ORDER BY n_funnels DESC, n_abandoned DESC) AS rn
              FROM funnel_stream
            ) WHERE rn = 1
            """
        ).collect()
    }
    want = {
        r["user_id"]: (r["n_funnels"], r["n_abandoned"])
        for r in run_grouped_fsm(
            batch.select("user_id", "ts", "event_id", "event_type"),
            ["user_id"], ["ts", "event_id"], funnel_fsm, FUNNEL_SCHEMA,
        ).collect()
    }
    assert got == want


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Duplicated source rows collapse to one row per key; same result as
    batch dropDuplicates on the same (in-watermark) data."""
    from pyspark.sql import functions as F

    from d3d_etl_spark.streaming.events import streaming_dedup

    batch = load_table(spark, sf_dir, "events").limit(500)
    doubled = batch.unionByName(batch)  # every row duplicated
    staged = os.path.join(str(tmp_path), "events_dup")
    doubled.write.parquet(staged)
    stream_src = spark.readStream.schema(batch.schema).parquet(staged)

    q = (
        streaming_dedup(stream_src, ["event_id"]).writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    assert len(got) == batch.count()
    assert len({r["event_id"] for r in got}) == len(got)


def test_stream_static_enrichment(spark, sf_dir, tmp_path):
    """Stream-static broadcast join: streamed events pick up dimension
    attributes; result matches the batch join."""
    from pyspark.sql import functions as F

    from d3d_etl_spark.streaming.events import enrich_events

    batch = load_table(spark, sf_dir, "events").limit(1000)
    dim = (
        batch.select("user_id").distinct()
        .withColumn("user_tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    staged = os.path.join(str(tmp_path), "events_enrich")
    batch.write.parquet(staged)
    stream_src = spark.readStream.schema(batch.schema).parquet(staged)

    q = (
        enrich_events(stream_src, dim).writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["event_id"], r["user_tier"]) for r in spark.sql("SELECT event_id, user_tier FROM enriched").collect()}
    want = {(r["event_id"], r["user_tier"]) for r in enrich_events(batch, dim).select("event_id", "user_tier").collect()}
    assert got == want and len(got) == 1000


def test_streaming_base_state_matches_batch(spark, tmp_path):
    """The streaming base-state FSM must equal the batch grouped map even
    when a game's plays arrive across MULTIPLE micro-batches (state carries
    runners over the trigger boundary)."""
    import time

    from pyspark.sql import functions as F

    from d3d_etl_spark.pbp.parser import add_metadata
    from d3d_etl_spark.pbp.state import BASE_STATE_SCHEMA, base_state_fsm
    from d3d_etl_spark.operators.fsm import run_grouped_fsm
    from d3d_etl_spark.pbp.synth import RAW_SCHEMA, generate_games
    from d3d_etl_spark.streaming.stateful import streaming_base_state

    raw = spark.createDataFrame(generate_games(6, seed=7), RAW_SCHEMA)
    plays = add_metadata(raw).select(
        "contest_id", "play_id", "inning", "half", "play_text"
    )
    batch_out = run_grouped_fsm(
        plays, key_cols=["contest_id"], order_cols=["play_id"],
        fsm=base_state_fsm, schema=BASE_STATE_SCHEMA,
    )

    # stage each game's plays as TWO files (first/second half of the play
    # sequence) and force one file per trigger -> state must carry across
    staged = os.path.join(str(tmp_path), "plays_stream")
    med = plays.agg(F.expr("percentile(play_id, 0.5)")).first()[0]
    plays.where(F.col("play_id") <= med).coalesce(1).write.parquet(
        os.path.join(staged, "f1")
    )
    time.sleep(1.1)  # file source orders by modification time
    plays.where(F.col("play_id") > med).coalesce(1).write.parquet(
        os.path.join(staged, "f2")
    )
    stream_src = (
        spark.readStream.schema(plays.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged + "/*")
    )
    q = (
        streaming_base_state(stream_src)
        .writeStream.format("memory")
        .queryName("base_state_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["contest_id"], r["play_id"]): (
            r["bases_before"], r["bases_after"], r["r1_name"], r["r2_name"], r["r3_name"]
        )
        for r in spark.sql("SELECT * FROM base_state_stream").collect()
    }
    want = {
        (r["contest_id"], r["play_id"]): (
            r["bases_before"], r["bases_after"], r["r1_name"], r["r2_name"], r["r3_name"]
        )
        for r in batch_out.collect()
    }
    assert got == want
    assert len(want) > 50


def test_streaming_pitchers_matches_batch(spark, tmp_path):
    """Streaming pitcher-queue FSM == batch cogroup FSM, with substitutions
    split ACROSS micro-batches: the narration-patched queue and advanced
    pointer must survive in state, and a later in-queue sub must still
    consume from the patched queue."""
    import os
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from d3d_etl_spark.pbp.parser import add_metadata
    from d3d_etl_spark.pbp.pitchers import fill_pitchers
    from d3d_etl_spark.streaming.stateful import streaming_pitchers

    games = {
        300: [  # sub before split; in-queue sub after split
            (1, "T", "A1 singled"),
            (1, "B", "H1 struck out swinging"),
            (2, "T", "RELIEF, R. to p for STARTER, S."),
            (2, "T", "A2 walked"),
            # ---- micro-batch split ----
            (3, "T", "A3 flied out to cf"),
            (3, "B", "H2 singled"),
            (4, "T", "CLOSER, C. to p for RELIEF, R."),
            (4, "T", "A4 grounded out to ss"),
        ],
        301: [  # narration-patched queue (sub not in lineup) before split
            (1, "T", "B1 doubled"),
            (1, "T", "SURPRISE, X. to p for OPENER, O."),
            # ---- micro-batch split ----
            (2, "T", "B2 struck out looking"),
            (2, "B", "V1 walked"),
        ],
    }
    raw_rows = []
    for cid, plays in games.items():
        for seq, (inning, h, t) in enumerate(plays):
            raw_rows.append(
                (cid, inning, t if h == "T" else None, t if h == "B" else None, seq)
            )
    raw = spark.createDataFrame(
        raw_rows,
        "contest_id long, inning int, away_text string, home_text string, source_seq long",
    )
    plays = add_metadata(raw).select("contest_id", "play_id", "half", "play_text")
    lineups = spark.createDataFrame(
        [
            (300, "home", 1, "STARTER, S."),
            (300, "home", 2, "RELIEF, R."),
            (300, "home", 3, "CLOSER, C."),
            (300, "away", 1, "AWAY1, A."),
            (301, "home", 1, "OPENER, O."),
            (301, "home", 2, "PLANNED, P."),
            (301, "away", 1, "VISIT, V."),
        ],
        "contest_id long, side string, pitch_order int, player_name string",
    )
    want = {
        (r["contest_id"], r["play_id"]): r["pitcher_name"]
        for r in fill_pitchers(plays, lineups).collect()
    }

    splits = {300: 4, 301: 2}  # first N source plays per game go to file 1
    split_col = F.when(F.col("contest_id") == 300, F.lit(4)).otherwise(F.lit(2))
    ranked = plays.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("contest_id").orderBy("play_id")),
    )
    staged = os.path.join(str(tmp_path), "pitcher_stream")
    ranked.where(F.col("rn") <= split_col).drop("rn").coalesce(1).write.parquet(
        os.path.join(staged, "f1")
    )
    time.sleep(1.1)
    ranked.where(F.col("rn") > split_col).drop("rn").coalesce(1).write.parquet(
        os.path.join(staged, "f2")
    )
    assert splits  # documents the intended per-game split sizes

    stream_src = (
        spark.readStream.schema(plays.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged + "/*")
    )
    q = (
        streaming_pitchers(stream_src, lineups)
        .writeStream.format("memory")
        .queryName("pitcher_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["contest_id"], r["play_id"]): r["pitcher_name"]
        for r in spark.sql("SELECT * FROM pitcher_stream").collect()
    }
    assert got == want
    assert want[(300, 7)] == "CLOSER, C."  # cross-batch in-queue sub
    assert want[(301, 3)] == "SURPRISE, X."  # patched queue survived the split


def test_stream_upsert_sink_idempotent(spark, tmp_path):
    """foreachBatch upsert lake sink: streamed rows land partitioned and
    deduped; replaying the same data (fresh checkpoint, same sink path)
    leaves the table unchanged — idempotence is what upgrades at-least-once
    replay to exactly-once results."""
    import os

    from pyspark.sql import functions as F

    from d3d_etl_spark.streaming.events import stream_upsert_sink

    rows = [(1, "a", 2023, 10.0), (2, "a", 2023, 20.0), (2, "a", 2023, 20.0), (3, "b", 2024, 30.0)]
    src_df = spark.createDataFrame(rows, "k long, div string, year int, v double")
    staged = os.path.join(str(tmp_path), "src")
    src_df.coalesce(1).write.parquet(staged)

    lake = os.path.join(str(tmp_path), "lake")

    def run(checkpoint: str) -> None:
        stream = (
            spark.readStream.schema(src_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        q = (
            stream_upsert_sink(
                stream, lake, checkpoint, ("year", "div"), dedup_keys=("k",)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(os.path.join(str(tmp_path), "ckpt1"))
    first = sorted(
        (r["k"], r["div"], r["year"], r["v"]) for r in spark.read.parquet(lake).collect()
    )
    assert first == [(1, "a", 2023, 10.0), (2, "a", 2023, 20.0), (3, "b", 2024, 30.0)]

    # full replay with a FRESH checkpoint: same slices rewritten, no dupes
    run(os.path.join(str(tmp_path), "ckpt2"))
    second = sorted(
        (r["k"], r["div"], r["year"], r["v"]) for r in spark.read.parquet(lake).collect()
    )
    assert second == first


def test_transform_with_state_funnel_matches_batch(spark, sf_dir, tmp_path):
    """The transformWithState funnel (modern arbitrary-state API, RocksDB
    store) ends with the same per-user totals as the batch grouped FSM —
    third implementation of the same transition function, same answer.

    The API's worker protocol needs google.protobuf (not shipped in every
    pyspark install) — skip, not fail, where it's absent."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from pyspark.sql import functions as F

    from d3d_etl_spark.operators.fsm import FUNNEL_SCHEMA, funnel_fsm, run_grouped_fsm
    from d3d_etl_spark.streaming.stateful import streaming_funnel_tws

    batch = load_table(spark, sf_dir, "events").limit(2000)
    staged = os.path.join(str(tmp_path), "events_tws")
    batch.coalesce(1).write.parquet(staged)
    stream_src = spark.readStream.schema(batch.schema).parquet(staged)

    q = (
        streaming_funnel_tws(stream_src)
        .writeStream.format("memory")
        .queryName("funnel_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"]: (r["n_funnels"], r["n_abandoned"])
        for r in spark.sql(
            """
            SELECT user_id, n_funnels, n_abandoned FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id
                ORDER BY n_funnels DESC, n_abandoned DESC) AS rn
              FROM funnel_tws
            ) WHERE rn = 1
            """
        ).collect()
    }
    want = {
        r["user_id"]: (r["n_funnels"], r["n_abandoned"])
        for r in run_grouped_fsm(
            batch.select("user_id", "ts", "event_id", "event_type"),
            ["user_id"], ["ts", "event_id"], funnel_fsm, FUNNEL_SCHEMA,
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_streaming_csv_source(spark, sf_dir, tmp_path):
    """The CSV compat dialect also works as a STREAMING source (a migrating
    user's incremental drops land as CSV files): declared schema, same
    options, windowed agg matches the batch run over the same files."""
    from d3d_etl_spark.io import CSV_OPTIONS, load_table, write_csv
    from d3d_etl_spark.streaming.events import windowed_event_counts

    batch = load_table(spark, sf_dir, "events").limit(2000)
    staged = os.path.join(str(tmp_path), "events_csv")
    write_csv(batch, staged)

    stream_src = (
        spark.readStream.schema(batch.schema).options(**CSV_OPTIONS).csv(staged)
    )
    q = (
        windowed_event_counts(stream_src)
        .writeStream.format("memory")
        .queryName("csv_win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.sql("SELECT * FROM csv_win_counts").collect()
    }
    csv_batch = (
        spark.read.schema(batch.schema).options(**CSV_OPTIONS).csv(staged)
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in windowed_event_counts(csv_batch).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    """The stateless streaming probe (inline HOF band keys + stream-static
    joins) must find exactly the batch z_corpus_incremental new-vs-old
    pairs, with identical Jaccard values — proving the inline signature
    path is bit-identical to the grouped batch signature pass."""
    import os

    from pyspark.sql import functions as F

    from d3d_etl_spark.queries.dedup import (
        _JACCARD_T,
        _NEW_MOD,
        batch1_band_state,
        z_corpus_incremental,
    )
    from d3d_etl_spark.streaming.corpus import streaming_incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.where(F.col("doc_id") % _NEW_MOD == 0).select("doc_id", "text")
    staged = os.path.join(str(tmp_path), "doc_stream")
    new_docs.write.parquet(staged)
    stream_src = spark.readStream.schema(new_docs.schema).parquet(staged)

    state = batch1_band_state(spark, sf_dir)
    old_docs = docs.where(F.col("doc_id") % _NEW_MOD != 0)

    q = (
        streaming_incremental_dedup(stream_src, state, old_docs, _JACCARD_T)
        .writeStream.format("memory")
        .queryName("inc_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # a pair sharing several bands streams once per band: dedup at read,
    # exactly as the lake sink's dedup_keys would
    got = {
        (min(r["doc_id"], r["old_id"]), max(r["doc_id"], r["old_id"])): r["jaccard"]
        for r in spark.sql(
            "SELECT doc_id, old_id, jaccard FROM inc_dedup_stream"
        ).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in z_corpus_incremental(spark, sf_dir).where(F.col("vs") == "new-old").collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v)


def test_streaming_ann_probe_matches_batch(spark, sf_dir, tmp_path):
    """The stateless streaming embedding probe must agree with the batch
    incremental-ANN query: same probed cells, and for every new vector the
    batch top-1 neighbor (when above the alert threshold) appears in the
    stream with the same similarity."""
    import os

    from pyspark.sql import functions as F

    from d3d_etl_spark.queries.simsearch import (
        _INC_NPROBE,
        ivf_index_state,
        serving_corpus,
        z_sim_incremental,
    )
    from d3d_etl_spark.streaming.vectors import streaming_ann_probe

    corp, bmod = serving_corpus(spark, sf_dir)
    new = corp.where(F.col("vec_id") % bmod == 0).select("vec_id", "embedding")
    staged = os.path.join(str(tmp_path), "vec_stream")
    new.write.parquet(staged)
    stream_src = spark.readStream.schema(new.schema).parquet(staged)

    cents, assign = ivf_index_state(spark, sf_dir)
    old = corp.where(F.col("vec_id") % bmod != 0)

    MIN_SIM = 0.2
    q = (
        streaming_ann_probe(stream_src, cents, assign, old, _INC_NPROBE, MIN_SIM)
        .writeStream.format("memory")
        .queryName("ann_probe_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["vec_id"], r["old_id"]): r["sim"]
        for r in spark.sql("SELECT * FROM ann_probe_stream").collect()
    }
    assert got, "stream produced no alerts"

    batch = {r["vec_id"]: r for r in z_sim_incremental(spark, sf_dir).collect()}
    for vid, r in batch.items():
        if r["nn_sim"] >= MIN_SIM:
            key = (vid, r["nn_id"])
            assert key in got, f"batch top-1 {key} missing from stream"
            assert got[key] == pytest.approx(r["nn_sim"], abs=2e-6)
    # and nothing in the stream beats the batch top-1 for its vector
    for (vid, _oid), s in got.items():
        if vid in batch:
            assert s <= batch[vid]["nn_sim"] + 2e-6


def test_streaming_incremental_dedup_lake_sink(spark, sf_dir, tmp_path):
    """The docstring's sink contract, executed: multi-band duplicate pairs
    from the stateless probe collapse at the lake sink (dedup_keys), and
    replaying the stream into the same sink is idempotent — the lake holds
    exactly the batch new-vs-old pair set both times."""
    import os

    from pyspark.sql import functions as F

    from d3d_etl_spark.queries.dedup import (
        _JACCARD_T,
        _NEW_MOD,
        batch1_band_state,
        z_corpus_incremental,
    )
    from d3d_etl_spark.streaming.corpus import streaming_incremental_dedup
    from d3d_etl_spark.streaming.events import stream_upsert_sink

    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.where(F.col("doc_id") % _NEW_MOD == 0).select("doc_id", "text")
    staged = os.path.join(str(tmp_path), "doc_stream")
    new_docs.write.parquet(staged)

    state = batch1_band_state(spark, sf_dir)
    old_docs = docs.where(F.col("doc_id") % _NEW_MOD != 0)
    lake = os.path.join(str(tmp_path), "lake")

    def run(checkpoint):
        stream_src = spark.readStream.schema(new_docs.schema).parquet(staged)
        alerts = streaming_incremental_dedup(stream_src, state, old_docs, _JACCARD_T)
        q = (
            stream_upsert_sink(
                alerts, lake, checkpoint,
                partition_by=(), dedup_keys=("doc_id", "old_id"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # orientation: streaming emits (new doc_id, old_id); batch pairs are
    # (min, max) — normalize to new-first (exactly one side is new)
    want = {
        (r["doc_a"], r["doc_b"]) if r["doc_a"] % _NEW_MOD == 0
        else (r["doc_b"], r["doc_a"])
        for r in z_corpus_incremental(spark, sf_dir)
        .where(F.col("vs") == "new-old")
        .collect()
    }

    run(os.path.join(str(tmp_path), "ckpt1"))
    got1 = {
        (r["doc_id"], r["old_id"])
        for r in spark.read.parquet(lake).select("doc_id", "old_id").collect()
    }
    assert got1 == want
    # replay into the same lake with a FRESH checkpoint: idempotent
    run(os.path.join(str(tmp_path), "ckpt2"))
    got2 = {
        (r["doc_id"], r["old_id"])
        for r in spark.read.parquet(lake).select("doc_id", "old_id").collect()
    }
    assert got2 == want
    # and the lake rows are unique (the sink's dedup_keys collapsed the
    # once-per-shared-band duplicates)
    n = spark.read.parquet(lake).count()
    assert n == len(want)


def test_streaming_classifier_scores_match_batch(spark, sf_dir, tmp_path):
    """Stateless streaming inference with a model TRAINED in batch: train 3
    GD steps with lr_gradient_step, freeze the weights, score the document
    stream, and pin every per-doc score against the batch quantized-margin
    computation (tolerance = the documented 1e-6 feature-quantization gap).
    The stream must also respect the zero-token eligibility rule."""
    import math
    import os

    from pyspark.sql import functions as F

    from d3d_etl_spark.operators.classifier import (
        X_SCALE,
        lr_corpus_inputs,
        lr_gradient_step,
    )
    from d3d_etl_spark.queries.textops import _LR_FEATURES, _LR_RATE
    from d3d_etl_spark.streaming.classifier import streaming_quality_scores

    docs = load_table(spark, sf_dir, "documents")
    xq, labels = lr_corpus_inputs(docs, _LR_FEATURES)
    w = spark.range(_LR_FEATURES).select(F.col("id").alias("j"), F.lit(0.0).alias("w"))
    for _ in range(3):
        w = lr_gradient_step(xq, labels, w, _LR_RATE).select("j", "w").localCheckpoint()

    staged = os.path.join(str(tmp_path), "doc_stream")
    docs.select("doc_id", "text").write.parquet(staged)
    src = spark.readStream.schema("doc_id long, text string").parquet(staged)
    q = (
        streaming_quality_scores(src, w, _LR_FEATURES)
        .writeStream.format("memory")
        .queryName("clf_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM clf_stream").collect()}
    assert len(got) == docs.count()

    # batch reference: quantized margin off the feature table
    wmap = {r["j"]: r["w"] for r in w.collect()}
    batch = (
        xq.toPandas()
        .assign(contrib=lambda d: d["x_q"] / X_SCALE * d["j"].map(wmap))
        .groupby("doc_id")["contrib"]
        .sum()
    )
    max_w = max(abs(v) for v in wmap.values())
    # combined margin bound from the module docstring: feature quantization
    # (n_features * 5e-7 * max|w|) + weight quantization (5e-7, x_j sum to 1)
    tol = _LR_FEATURES * 5e-7 * max_w + 5e-7
    for doc_id, m in batch.items():
        p = 1.0 / (1.0 + math.exp(-m))
        r = got[doc_id]
        # dsigma/dm <= 1/4 maps the margin bound onto the score
        assert abs(r["score"] - p) <= tol / 4 + 1e-12, (doc_id, r["score"], p)
        assert r["accept"] == (r["score"] >= 0.5)
    for doc_id, r in got.items():
        if r["n_tokens"] == 0:
            assert r["score"] is None and r["accept"] is False


def test_streaming_dsir_weights_match_batch(spark, sf_dir, tmp_path):
    """The streaming DSIR scorer must reproduce the batch query's EXACT
    integer importance weights: fit the log-ratio table in batch (completed
    to all B buckets with the smoothed default for never-observed ones),
    stream the documents, and compare lw_q per doc_id — integer equality,
    no tolerance."""
    import os

    from pyspark.sql import functions as F

    from d3d_etl_spark.functions.strings import md5_int
    from d3d_etl_spark.functions.text import tokens, word_shingles
    from d3d_etl_spark.queries.curation import _DSIR_B, _DSIR_Q, z_corpus_dsir
    from d3d_etl_spark.streaming.classifier import streaming_dsir_weights

    docs = load_table(spark, sf_dir, "documents")

    # batch fit (mirrors the query's stats stage), completed over range(B)
    sh = word_shingles(tokens(F.col("text")), 2)
    feat = (
        docs.select("doc_id", "lang", F.explode(sh).alias("s"))
        .withColumn("j", md5_int(F.col("s")) % _DSIR_B)
        .groupBy("doc_id", "lang", "j")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    rawc = feat.groupBy("j").agg(F.sum("c").alias("c"))
    tgtc = feat.where(F.col("lang") == "en").groupBy("j").agg(F.sum("c").alias("ct"))
    tots = rawc.agg(F.sum("c").alias("tr")).crossJoin(
        feat.where(F.col("lang") == "en").agg(F.sum("c").alias("tt"))
    )
    t_q = F.round(
        _DSIR_Q
        * (
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("tt") + _DSIR_B)
            )
            - F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("tr") + _DSIR_B))
        )
    ).cast("long")
    table = (
        spark.range(_DSIR_B)
        .select(F.col("id").alias("j"))
        .join(rawc, "j", "left")
        .join(tgtc, "j", "left")
        .crossJoin(F.broadcast(tots))
        .select("j", t_q.alias("t_q"))
    )

    staged = os.path.join(str(tmp_path), "dsir_stream")
    docs.select("doc_id", "text").write.parquet(staged)
    src = spark.readStream.schema("doc_id long, text string").parquet(staged)
    q = (
        streaming_dsir_weights(src, table, _DSIR_B)
        .writeStream.format("memory")
        .queryName("dsir_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r
        for r in spark.sql("SELECT * FROM dsir_stream").collect()
    }
    assert len(got) == docs.count()

    batch = {r["doc_id"]: r["lw_q"] for r in z_corpus_dsir(spark, sf_dir).collect()}
    assert batch, "batch produced no weights"
    for doc_id, lw in batch.items():
        assert got[doc_id]["lw_q"] == lw, doc_id  # exact integer parity
    # docs without bigrams score NULL (same eligibility as batch exclusion)
    for doc_id, r in got.items():
        if doc_id not in batch:
            assert r["n_shingles"] == 0 and r["lw_q"] is None


def test_streaming_bm25_matches_batch_exactly(spark, sf_dir, tmp_path):
    """Streaming retrieval twin: score the document stream with the FROZEN
    batch BM25 state (term-dim idf + 2 scalars as literals) and pin every
    per-doc score BIT-EXACTLY against a pure-python evaluation of the same
    integer formula over the same corpus — the all-integer contract means
    no tolerance band at all (stronger than the LR twin's quantization
    bound). Zero-hit docs score 0; the idf mixup guard fails fast."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.queries.textops import _BM_TERMS, bm25_corpus_state
    from d3d_etl_spark.streaming.retrieval import streaming_bm25_scores

    dl, tf, stats, idf = bm25_corpus_state(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")

    staged = os.path.join(str(tmp_path), "doc_stream")
    docs.select("doc_id", "text").write.parquet(staged)
    src = spark.readStream.schema("doc_id long, text string").parquet(staged)
    q = (
        streaming_bm25_scores(src, idf, stats, _BM_TERMS)
        .writeStream.format("memory")
        .queryName("bm25_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM bm25_stream").collect()}
    assert len(got) == docs.count()

    # pure-python reference off the raw corpus (independent of both plans)
    srow = stats.collect()[0]
    n_docs, t_tokens = srow["n_docs"], srow["t_tokens"]
    idf_map = {r["tok"]: r["idf_q"] for r in idf.collect()}
    n_scored = 0
    for r in docs.select("doc_id", "text").collect():
        w = [t for t in r["text"].lower().split() if t]
        g = got[r["doc_id"]]
        assert g["n_tokens"] == len(w)
        if not w:
            assert g["score_q"] is None and g["n_terms_hit"] == 0
            continue
        score, hits = 0, 0
        for t in _BM_TERMS:
            c = w.count(t)
            if c and t in idf_map:
                score += (idf_map[t] * 44 * t_tokens * c) // (
                    20 * t_tokens * c + 6 * t_tokens + 18 * len(w) * n_docs
                )
                hits += 1
        assert g["score_q"] == score, (r["doc_id"], g["score_q"], score)
        assert g["n_terms_hit"] == hits
        n_scored += 1
    assert n_scored > 0

    # frozen-state mixup guard
    bad_idf = idf.withColumn("tok", F.concat(F.lit("x_"), F.col("tok")))
    with pytest.raises(ValueError, match="non-query terms"):
        streaming_bm25_scores(src, bad_idf, stats, _BM_TERMS)

    # unsafe-term guard: terms are interpolated into column names and an
    # F.expr SQL string, so anything non-identifier must fail fast
    with pytest.raises(ValueError, match="terms must match"):
        streaming_bm25_scores(src, idf, stats, ("hash", "a b'); --"))

    # fit-fingerprint guard: idf and stats from DIFFERENT fits (same term
    # set) must not score silently
    other_stats = stats.select(
        (F.col("n_docs") + 1).alias("n_docs"), F.col("t_tokens")
    )
    with pytest.raises(ValueError, match="different fits"):
        streaming_bm25_scores(src, idf, other_stats, _BM_TERMS)
