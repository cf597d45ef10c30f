"""Multimodal columns for training-data pipelines: image/audio/video as
opaque `binary` payloads with typed metadata, processed by Arrow-batched
kernels over mapInPandas.

The image/audio decode libraries are NOT in this container, so the
decode step is STUBBED behind `decode_stub` — a deterministic fake
that derives pixel statistics from the payload bytes. Everything
Spark-side is real and tested: schema contracts, batch shapes,
partition-preserving plumbing, and the UDF signatures a real decoder
would drop into (replace `decode_stub` with PIL/ffmpeg calls on a
cluster that has them).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField(
        "meta",
        T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_frames", T.IntegerType(), True),
        ]),
        False,
    ),
])

FEATURE_DIM = 32


def _payload_bytes(seed: int, mid: int) -> bytes:
    """Deterministic fake payload: an md5 chain over (seed, media_id) —
    chosen over a PCG stream (round 5) precisely so a SQL oracle can
    recompute the bytes: chunk j is md5(f"{seed}:{mid}:{j}"), hex
    chunks concatenate and truncate to the target length. Any
    deterministic filler works for the decode stub; this one is
    engine-neutral."""
    need_hex = (512 + mid % 512) * 2
    parts: list[str] = []
    j = 0
    total = 0
    while total < need_hex:
        h = hashlib.md5(f"{seed}:{mid}:{j}".encode()).hexdigest()
        parts.append(h)
        total += len(h)
        j += 1
    return bytes.fromhex("".join(parts)[:need_hex])


def synthetic_media(spark: SparkSession, n: int, seed: int = 5) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function
    of (media_id, seed) — generated distributed, never on the driver."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = kinds[mid % 3]
                payload = _payload_bytes(seed, mid)
                meta = {
                    "width": 64 + (mid % 4) * 32 if kind != "audio" else None,
                    "height": 64 + (mid % 3) * 32 if kind != "audio" else None,
                    "channels": 3 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 1 + mid % 30 if kind == "video" else None,
                }
                rows.append((mid, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, numPartitions=8).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_stub(payload: bytes) -> np.ndarray:
    """STUB for the real decoder (PIL.Image.open / soundfile / ffmpeg).

    Deterministic fake: a FEATURE_DIM float32 vector from an md5 chain
    over the payload's hex rendering — word k*4+w is the w-th big-endian
    uint32 of md5(f"{payload_hex}:{k}"), scaled into [0, 1) via
    (word % 1000) / 1000 (exactly 3 decimals, so 6-decimal formatting
    is engine-stable). Content-hashed (identical payloads -> identical
    features) and SQL-recomputable, which is what lets the
    media_feature_extract driver query carry a full DuckDB oracle. A
    real deployment swaps only this function; the Spark plumbing
    (batching, schema, partitioning) is unchanged."""
    hexp = payload.hex()
    vals = []
    for k in range(FEATURE_DIM // 4):
        h = hashlib.md5(f"{hexp}:{k}".encode()).hexdigest()
        for w in range(4):
            vals.append((int(h[w * 8 : (w + 1) * 8], 16) % 1000) / 1000.0)
    return np.array(vals, dtype=np.float32)


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), False),
    T.StructField("n_bytes", T.IntegerType(), False),
])


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract each payload (Arrow-batched; the numpy
    work is vectorized per batch where the decode allows). Narrow — no
    shuffle; runs wherever the media rows live."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def feature_digests(media: DataFrame) -> DataFrame:
    """Driver/report-facing rendition of extract_features: the feature
    vector is folded to a sortable scalar digest (md5 over the
    6-decimal rendering of each component) so downstream tooling that
    sorts/hashes rows never sees a raw array column. Library users who
    need the vectors call extract_features directly."""
    feats = extract_features(media)
    digest = F.md5(
        F.concat_ws(
            ",",
            F.transform("features", lambda x: F.format_number(x.cast("double"), 6)),
        )
    )
    return feats.select(
        "media_id", "kind", "n_bytes", digest.alias("feature_digest")
    )


def frame_sample(media: DataFrame, every_k: int = 5) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (real decoder would attach the frame payload). Pure Spark —
    the index fan-out needs no Python."""
    v = media.filter(F.col("kind") == "video")
    frames = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_k)
    )
    return v.select(
        "media_id",
        F.explode(frames).alias("frame_idx"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def resize_plan(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize planning (pure metadata math in Spark): target dims
    preserving aspect ratio; the pixel work itself belongs to the
    decode stub's replacement."""
    img = media.filter(F.col("kind") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return img.select(
        "media_id",
        w.alias("src_width"),
        h.alias("src_height"),
        F.round(w * scale).cast("int").alias("dst_width"),
        F.round(h * scale).cast("int").alias("dst_height"),
    )
