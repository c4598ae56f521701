"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are ``binary`` columns with a metadata struct; the
decode/resize/frame-sample kernels run as Arrow-batched ``mapInPandas``
stages.  The actual codecs are NOT in this container, so the decode step is
STUBBED: ``decoder='real'`` raises NotImplementedError at the call site
(clearly marked), while ``decoder='fake'`` produces a deterministic
byte-hash-seeded feature vector so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

_FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: features derive from a
    sha256 of the payload (stable across executors/runs)."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4], dtype=np.uint32)
    return (arr.astype(np.float64) / np.iinfo(np.uint32).max).tolist()


def extract_media_features(df: DataFrame, decoder: str = "fake",
                           dim: int = _FEATURE_DIM) -> DataFrame:
    """binary payload -> feature vector (array<double>), one Arrow stage.

    ``decoder='real'`` is the production slot for PIL/ffmpeg-backed decode —
    not available in this environment (NotImplementedError by design).
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ])

    def run(batches):
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg — not in "
                    "this container; use decoder='fake' for plumbing tests")
            feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                "features": feats,
            })

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  decoder: str = "fake") -> DataFrame:
    """Video payload -> one row per sampled frame timestamp.  Frame count
    derives from meta.duration_ms; frame features from the fake decoder
    (seeded by payload + frame index)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ms", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ])

    def run(batches):
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("real frame decode not available here")
            ids, ts, feats = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                dur = (meta or {}).get("duration_ms") or 0
                for t in range(0, max(dur, 1), every_ms):
                    ids.append(mid)
                    ts.append(t)
                    feats.append(_fake_decode((payload or b"") + str(t).encode()))
            yield pd.DataFrame({"media_id": ids, "frame_ms": ts, "features": feats})

    return df.mapInPandas(run, schema=out_schema)


def make_fake_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = bytes([(i * 37 + j) % 251 for j in range(64)])
        rows.append((i, payload,
                     {"mime": "image/png" if i % 2 == 0 else "video/mp4",
                      "width": 64, "height": 64,
                      "duration_ms": 3000 if i % 2 else None}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
