"""Stateful-sequence queries (SURVEY.md §2.8) + multimodal plumbing.

- sessionize_events: the window-expressible stateful shape (segment keys
  from boundary flags — reference columns.py:144-159) — full SQL oracle.
- fsm_funnel: a genuine per-group FSM via applyInPandas — not
  SQL-expressible, so it carries no oracle (driver records the weaker
  rows-only check); tests/test_operators.py verifies it against a pure
  python reference implementation instead.
- multimodal_extract: binary-column decode plumbing via mapInPandas with a
  deterministic fake decoder — byte math only, so it IS oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.io import load_table
from d3d_etl_spark.operators.fsm import FUNNEL_SCHEMA, funnel_fsm, run_grouped_fsm
from d3d_etl_spark.operators.multimodal import extract_media_features
from d3d_etl_spark.operators.sessionize import session_stats, sessionize
from d3d_etl_spark.queries.registry import register

_GAP_US = 30 * 60 * 1_000_000

_SESSION_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
flags AS (
  SELECT *,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > {_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM e
),
sess AS (
  SELECT *,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS session_seq
  FROM flags
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(us)  AS start_us,
       MAX(us)  AS end_us,
       CAST(MAX(us) - MIN(us) AS DOUBLE) / 1000000.0 AS duration_sec
FROM sess
GROUP BY user_id, session_seq
"""


@register("sessionize_events", _SESSION_ORACLE, tags=("stateful", "window"), bench=True)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    with_sessions = sessionize(ev, "user_id", "ts", "event_id", gap_micros=_GAP_US)
    return session_stats(with_sessions, "user_id", "ts")


@register("fsm_funnel", None, tags=("stateful", "fsm"))
def fsm_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user conversion-funnel FSM (view->click->purchase with resets).

    applyInPandas grouped map — the same execution shape that carries the
    reference's base-state tracker (columns.py:332-529); no SQL oracle by
    design (genuinely sequential state).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return run_grouped_fsm(ev, ["user_id"], ["ts", "event_id"], funnel_fsm, FUNNEL_SCHEMA)


_MM_ORACLE = """
SELECT
  doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS content_hash,
  CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
  CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height,
  CAST(octet_length(encode(text)) % 24 + 1 AS BIGINT) AS n_frames
FROM documents
"""


@register("multimodal_extract", _MM_ORACLE, tags=("multimodal",))
def multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media-column plumbing: text bytes stand in for image payloads;
    mapInPandas runs the (stubbed) decoder over Arrow batches."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return extract_media_features(with_payload)


@register("pbp_dag", None, tags=("stateful", "domain"), bench=True)
def pbp_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The domain pipeline end-to-end: generated narration (the testdata has
    no baseball tables) -> parse (classifier + windows + base-state FSM) ->
    RE24 -> batting board. Game count scales with the SF in `sf_dir`; no
    SQL oracle (the FSM is not SQL-expressible — rows-only check), pytest
    validates the pipeline against hand-traced fixtures instead."""
    import re as _re

    from d3d_etl_spark.pbp.pipeline import run_analytics
    from d3d_etl_spark.pbp.synth import generate_games_df

    m = _re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    n_games = max(10, int(sf * 3000))
    raw = generate_games_df(spark, n_games)
    out = run_analytics(raw)
    return out.batting


_FRAMES_STRIDE = 3

_FRAMES_ORACLE = f"""
WITH d AS (
  SELECT doc_id, md5(text) AS chash,
         CAST(octet_length(encode(text)) AS BIGINT) AS n,
         CAST(octet_length(encode(text)) % 24 + 1 AS BIGINT) AS nf
  FROM documents
),
fr AS (
  SELECT doc_id, chash, n, nf, unnest(range(nf)) AS idx FROM d
)
SELECT doc_id,
       idx AS frame_idx,
       md5(chash || ':' || CAST(idx AS VARCHAR)) AS frame_hash,
       n // nf AS frame_bytes
FROM fr
WHERE idx % {_FRAMES_STRIDE} = 0
"""


@register("multimodal_frames", _FRAMES_ORACLE, tags=("multimodal",))
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (UDTF shape): every stride-th frame of each
    payload becomes a row — the video-pipeline stage ahead of per-frame
    featurization. Stubbed decode, real mapInPandas plumbing."""
    from d3d_etl_spark.operators.multimodal import sample_media_frames

    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return sample_media_frames(with_payload, _FRAMES_STRIDE)


_RESIZE_W, _RESIZE_H = 160, 120

_RESIZE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n,
         CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS w,
         CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS h
  FROM documents
),
r AS (
  SELECT doc_id, n, w, h,
         CASE
           WHEN w <= {_RESIZE_W} AND h <= {_RESIZE_H} THEN w
           WHEN w * {_RESIZE_H} <= h * {_RESIZE_W} THEN GREATEST(1, (w * {_RESIZE_H}) // h)
           ELSE {_RESIZE_W}
         END AS nw,
         CASE
           WHEN w <= {_RESIZE_W} AND h <= {_RESIZE_H} THEN h
           WHEN w * {_RESIZE_H} <= h * {_RESIZE_W} THEN {_RESIZE_H}
           ELSE GREATEST(1, (h * {_RESIZE_W}) // w)
         END AS nh
  FROM d
)
SELECT doc_id, w AS width, h AS height,
       nw AS new_width, nh AS new_height,
       LEAST(n, nw * nh * 3) AS out_bytes
FROM r
"""


@register("multimodal_resize", _RESIZE_ORACLE, tags=("multimodal",))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plumbing: exact integer fit math inside the
    Arrow-batched worker (stubbed resample, real dimension contract)."""
    from d3d_etl_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return resize_media(with_payload, _RESIZE_W, _RESIZE_H)
