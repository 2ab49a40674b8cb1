"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns and runs decode /
feature-extraction as Arrow-batched pandas over `mapInPandas`. The decode
step itself is STUBBED (no image/audio libs in this container): a
deterministic fake derives "decoded" metadata from the bytes, while the
Spark-side plumbing — schema, batch iteration, partitioning — is real and
oracle-checked (the fake is pure byte math, so DuckDB can mirror it).

Swap `_fake_decode` for a real decoder (PIL/libav) to productionize; the
mapInPandas shape, output schema and partition behavior do not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real media decoder.

    Real decode (PIL.Image.open / av.open) is unavailable in this container;
    raise if someone flips the flag expecting real decoding.
    """
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 24 + 1)


def decode_media_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (doc_id, payload binary) -> DECODED_SCHEMA rows."""
    for pdf in it:
        payloads = pdf["payload"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int64"),
                "content_hash": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )
        decoded = payloads.map(_fake_decode)
        out["width"] = decoded.map(lambda t: t[0]).astype("int64")
        out["height"] = decoded.map(lambda t: t[1]).astype("int64")
        out["n_frames"] = decoded.map(lambda t: t[2]).astype("int64")
        yield out


def extract_media_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(decode_media_batch, DECODED_SCHEMA)


def real_decode_stub(payload: bytes):  # pragma: no cover
    raise NotImplementedError(
        "real media decoding requires PIL/av which are not installed; "
        "extract_media_features uses the deterministic fake decoder"
    )
