"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a struct of
typed metadata, processed by Arrow-batched ``mapInPandas`` stages. The
decode kernels themselves are STUBBED (no codec libraries in this
container — clearly marked below); the Spark-side contract — schema,
batch shape, partition sizing, UDF signatures — is real and tested, so
swapping in PIL/ffmpeg later changes one function body, not the plan.

Scale notes: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` so a partition holds a bounded
number of blobs; the mapInPandas stages are pure projections (no
shuffle); frame-sampling fans out rows via per-batch pandas, preserving
Arrow batching end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _decode_image_stub(payload: bytes) -> dict:
    """STUB — real impl would use PIL/libjpeg. Deterministic fake: derive
    pseudo-pixel stats from the bytes so plumbing is testable."""
    if payload is None:
        raise NotImplementedError("image decode of null payload")
    n = len(payload)
    return {"n_bytes": n, "checksum": sum(payload[:256]) % 65536, "fake_mean": (sum(payload[:64]) / max(1, min(n, 64))) if n else 0.0}


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("fake_mean", T.DoubleType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over opaque payloads (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                feats = _decode_image_stub(bytes(r["payload"]) if r["payload"] is not None else b"")
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": feats["n_bytes"],
                        "checksum": feats["checksum"],
                        "fake_mean": feats["fake_mean"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling fan-out (1 video row → N frame rows). STUB decode:
    frames are deterministic byte slices; real impl swaps in ffmpeg."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                dur = (r["meta"]["duration_ms"] or 0) if r["meta"] is not None else 0
                n_frames = max(1, dur // every_ms)
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                for i in range(int(n_frames)):
                    lo = (i * 32) % max(1, len(payload) or 1)
                    out.append({"media_id": r["media_id"], "frame_idx": i, "frame": payload[lo : lo + 32]})
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


def synthetic_media(spark, n: int = 100, partitions: int = 8) -> DataFrame:
    """Deterministic fixture rows exercising the schema + batch shape."""
    base = spark.range(0, n, 1, partitions)
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.pmod(F.xxhash64("id"), F.lit(3)) + 1).cast("int"))
    payload = F.encode(F.concat(F.lit("BLOB"), F.col("id").cast("string"),
                                F.repeat(F.lit("x"), (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(64)) + 16).cast("int"))), "UTF-8")
    meta = F.struct(
        F.lit(64).alias("width"), F.lit(48).alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5000)) + 500).cast("int").alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )
    return base.select(F.col("id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta"))
