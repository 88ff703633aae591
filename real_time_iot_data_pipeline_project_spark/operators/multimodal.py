"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json north-star).

The Spark-side plumbing — schema, Arrow batching via ``mapInPandas``,
partition-preserving transforms — is real and tested. The actual codec
work (JPEG decode, audio resample, video frame-sample) is STUBBED: the
image/audio libraries are not in this container, so ``decode_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic fake feature vector from the bytes (so tests
and oracles can run end-to-end).

Scale notes: binary payloads ride the same columnar parquet path as any
other column; ``mapInPandas`` streams Arrow batches so peak memory is
one batch of payloads per task, not the partition. Set
``spark.sql.files.maxPartitionBytes`` lower for tables with large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def binary_stats(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id") -> DataFrame:
    """Payload byte length + md5 — pure Column expressions over binary."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: dim floats in [0,1)
    derived from the payload digest."""
    out: list[float] = []
    seed = payload
    while len(out) < dim:
        seed = hashlib.md5(seed).digest()
        out.extend(b / 255.0 for b in seed)
    return out[:dim]


def extract_features(df: DataFrame, *, dim: int = 16, fake: bool = False,
                     payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    Real decode requires image/audio libs not present in this container:
    with ``fake=False`` this raises ``NotImplementedError`` at execution
    time (by design — the plumbing is the deliverable; swap
    ``_fake_features`` for a real decoder on a cluster with codecs).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _fake_features(bytes(p), dim) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
