"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata.

The Spark-side plumbing — schema, partition-friendly layout, Arrow batch
shapes, ``mapInPandas`` signatures — is REAL and tested; the actual
codec step is STUBBED (no image/audio libraries in this container):

- ``decode_stub(..., strict=True)`` raises NotImplementedError exactly
  where a real decoder (PIL/ffmpeg) would plug in;
- ``strict=False`` produces a clearly-marked DETERMINISTIC FAKE (features
  derived from payload bytes) so downstream plumbing can be exercised
  end-to-end.

At 100 TB: binary payloads dominate scan width — keep media in separate
parquet column chunks (columnar pruning skips them unless selected),
partition by (media_type, size bucket) so decode fan-out is balanced,
and size Arrow batches by BYTES not rows (maxRecordsPerBatch low for
video, high for thumbnails).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def wrap_as_media(
    df: DataFrame, id_col: str, bytes_col, media_type: str = "text/utf-8"
) -> DataFrame:
    """Lift an arbitrary binary column into the canonical media schema."""
    payload = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.create_map(
            F.lit("source"), F.lit("synthetic"), F.lit("codec"), F.lit("none")
        ).alias("meta"),
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """DETERMINISTIC FAKE decode: bytes → fixed-dim float vector.
    Stands in for a real image/audio feature extractor."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float32), dim)
    return np.array(
        [c.mean() / 255.0 if len(c) else 0.0 for c in chunks], dtype=np.float32
    )


def decode_features(
    media: DataFrame, strict: bool = False, dim: int = 8
) -> DataFrame:
    """Decode/feature-extract over ``mapInPandas`` — Arrow-batched, one
    output row per media row. ``strict=True`` raises where the real codec
    belongs (this container has no image/audio libs). Batch sizing is
    governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (the
    input frame is materialized per Arrow batch, so a per-call row knob
    here would bound nothing — size the session config for the payload
    width instead)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not available "
                    "in this container; use strict=False for the "
                    "deterministic fake-decode path"
                )
            feats = [
                _fake_feature(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                    "decoder": ["fake-mean-v1"] * len(pdf),
                }
            )

    media = media.repartition(
        max(int(media.sparkSession.conf.get("spark.sql.shuffle.partitions")), 1),
        "media_id",
    )
    return media.mapInPandas(gen, FEATURES_SCHEMA)


CHECKSUM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("last_byte", T.IntegerType(), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def decode_checksum(media: DataFrame) -> DataFrame:
    """EXACT-integer twin of ``decode_features``: the same mapInPandas
    decode plumbing (binary payload over Arrow into numpy and back), but
    emitting integral byte statistics — sum / first / last byte value —
    instead of float32 features. Integers are engine-portable, so this
    face is the ORACLE tier proving the payload bytes genuinely traverse
    the Arrow batch path unmangled (a DuckDB twin recomputes the same
    sums from the source column); ``decode_features`` stays the
    feature-vector face (float32 reduction order has no cross-engine
    twin, pytest-exact instead)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums, firsts, lasts = [], [], []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    sums.append(0)
                    firsts.append(-1)
                    lasts.append(-1)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                sums.append(int(arr.sum(dtype=np.int64)))
                firsts.append(int(arr[0]))
                lasts.append(int(arr[-1]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": sums,
                    "first_byte": firsts,
                    "last_byte": lasts,
                    "decoder": ["bytes-checksum-v1"] * len(pdf),
                }
            )

    media = media.repartition(
        max(int(media.sparkSession.conf.get("spark.sql.shuffle.partitions")), 1),
        "media_id",
    )
    return media.mapInPandas(gen, CHECKSUM_SCHEMA)


def frame_sample_stub(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """'Frame sampling' plumbing: emit byte-offset samples per payload
    (a real video pipeline would emit decoded frames). Demonstrates the
    one-to-many mapInPandas shape."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("byte_offset", T.LongType(), False),
            T.StructField("sample", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    off = i * every_n_bytes
                    rows.append(
                        dict(
                            media_id=mid,
                            frame_idx=i,
                            byte_offset=off,
                            sample=bytes(payload[off : off + 16]),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "byte_offset", "sample"]
            )

    return media.mapInPandas(gen, out_schema)
