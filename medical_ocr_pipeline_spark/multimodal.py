"""Multimodal column plumbing: image/audio/video payloads as opaque
binary columns with typed metadata, processed through mapInPandas.

The reference rasterizes PDF pages to PIL images and POSTs them to OCR
services (S2/S3, notebooks/01_extract_blocks.ipynb cell 4:67-73).  Our
engine keeps the same shape Spark-native: a `binary` column + a metadata
struct, decoded/feature-extracted inside Arrow batches.  The actual
decode depends on image/audio libraries that are NOT in this container,
so the decode kernels are stubbed: `deterministic_fake_decode` produces
a seeded, reproducible feature row (so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is fully real and tested), and
`decode_image`/`decode_audio` raise NotImplementedError with the exact
extension point documented.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),  # fixed dim 16
])

FEATURE_DIM = 16


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """STUB: real deployments plug PIL/opencv here (not in this
    container).  Must return (width, height, ndarray)."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire it in decode_image() and "
        "swap it into media_features(real_decode=True)"
    )


def decode_audio(payload: bytes):  # pragma: no cover - documented stub
    """STUB: real deployments plug soundfile/librosa here."""
    raise NotImplementedError("audio decode requires soundfile/librosa")


def deterministic_fake_decode(payload: bytes) -> list[float]:
    """Seeded stand-in for the decode+embed step: crc32-chained floats in
    [0, 1).  Deterministic, so golden tests of the plumbing are exact."""
    h = zlib.crc32(payload or b"")
    out = []
    for i in range(FEATURE_DIM):
        h = zlib.crc32(i.to_bytes(4, "little"), h)
        out.append((h % 10_000) / 10_000.0)
    return out


def media_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """binary payload -> fixed-dim feature vector, Arrow-batched.

    At 100 TB the binary column dominates row size: keep
    spark.sql.files.maxPartitionBytes small enough that one task's batch
    of payloads fits executor memory, and never collect this frame.
    """
    import pandas as pd

    decode = decode_image if real_decode else deterministic_fake_decode

    def run(batches):
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p or b"") for p in payloads],
                "checksum": [zlib.crc32(p or b"") for p in payloads],
                "features": [decode(p) for p in payloads],
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (the decode itself is the stubbed kernel above).  Pure Catalyst —
    posexplode of a generated sequence, no Python."""
    return (
        media.where(
            (F.col("kind") == "video") & (F.col("meta.duration_ms") > 0)
        )
        .select(
            "media_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_idx", "ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the media id."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = (f"media_{i:04d}".encode() * (8 + i % 5))
        rows.append((
            f"m{i:04d}", kind, payload,
            {"mime": f"{kind}/x-fake", "width": 64 + i, "height": 48 + i,
             "duration_ms": 5000 + 100 * i},
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 2000,
                     overlap_ms: int = 500) -> DataFrame:
    """Audio chunking plan: overlapping fixed-length windows over the
    clip duration — (chunk_idx, start_ms, end_ms) per chunk, stride =
    chunk_ms - overlap_ms.  Pure Catalyst (sequence + posexplode), no
    Python; the decode of each chunk is the stubbed kernel above.  The
    row-amplification factor is duration/stride, fixed and predictable —
    the same bounded-fanout discipline as the banded range join."""
    if overlap_ms >= chunk_ms:
        raise ValueError("overlap_ms must be < chunk_ms")
    stride = chunk_ms - overlap_ms
    return (
        # duration_ms > 0 filter: a zero-length clip yields NO chunks
        # (sequence(0, greatest(d-1,0)) would emit one empty chunk)
        media.where((F.col("kind") == "audio") & (F.col("meta.duration_ms") > 0))
        .select(
            "media_id",
            F.col("meta.duration_ms").alias("duration_ms"),
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms") - 1,
                    F.lit(stride),
                )
            ).alias("chunk_idx", "start_ms"),
        )
        .select(
            "media_id",
            "chunk_idx",
            "start_ms",
            F.least(
                F.col("start_ms") + chunk_ms, F.col("duration_ms")
            ).alias("end_ms"),
        )
    )
