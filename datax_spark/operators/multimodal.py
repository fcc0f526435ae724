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

import numpy as np
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
    pseudo-pixel stats from the bytes so plumbing is testable. This is
    the scalar REFERENCE for ``_decode_batch_stub``; the hot path is the
    vectorized batch version below."""
    if payload is None:
        raise NotImplementedError("image decode of null payload")
    n = len(payload)
    return {"n_bytes": n, "checksum": sum(payload[:256]) % 65536, "fake_mean": (sum(payload[:64]) / max(1, min(n, 64))) if n else 0.0}


def _segment_sums(buf: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Per-row sums of buf[starts[i]:ends[i]] in one numpy pass
    (``np.add.reduceat`` over interleaved boundaries; empty segments → 0)."""
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.empty(2 * n, dtype=np.int64)
    idx[0::2] = starts
    idx[1::2] = ends
    # sentinel guards reduceat's "index == len" edge; [0::2] keeps row sums
    sums = np.add.reduceat(np.append(buf, np.int64(0)), idx)[0::2]
    return np.where(ends > starts, sums, 0)


def _decode_batch_stub(payloads: list[bytes]) -> dict[str, np.ndarray]:
    """Vectorized stub decode: same math as ``_decode_image_stub`` but one
    numpy pass over the whole Arrow batch — all payload bytes concatenate
    into a single uint8 buffer and the per-row reductions are reduceat
    segments (no per-row Python dispatch)."""
    n = len(payloads)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
    offs = np.zeros(n, dtype=np.int64)
    if n > 1:
        offs[1:] = np.cumsum(lens[:-1])
    checksum = _segment_sums(buf, offs, offs + np.minimum(lens, 256)) % 65536
    sum64 = _segment_sums(buf, offs, offs + np.minimum(lens, 64))
    denom = np.maximum(1, np.minimum(lens, 64))
    fake_mean = np.where(lens > 0, sum64 / denom, 0.0)
    return {"n_bytes": lens, "checksum": checksum, "fake_mean": fake_mean}


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
    """mapInPandas feature extraction over opaque payloads — fully
    vectorized per Arrow batch (numpy segment reductions, no per-row
    Python loop)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [b"" if p is None else bytes(p) for p in pdf["payload"]]
            feats = _decode_batch_stub(payloads)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": feats["n_bytes"],
                    "checksum": feats["checksum"],
                    "fake_mean": feats["fake_mean"],
                }
            )

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
    frames are deterministic byte slices; real impl swaps in ffmpeg.
    Fan-out indices are computed with numpy (repeat/arange); the only
    per-OUTPUT-row work is a C-level bytes slice for the frame payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payloads = [b"" if p is None else bytes(p) for p in pdf["payload"]]
            durs = np.fromiter(
                ((m["duration_ms"] or 0) if m is not None else 0 for m in pdf["meta"]),
                dtype=np.int64,
                count=n,
            )
            counts = np.maximum(1, durs // every_ms)
            media_ids = np.repeat(pdf["media_id"].to_numpy(), counts)
            # frame_idx = 0..count-1 within each row, flat
            frame_idx = (np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)).astype(np.int32)
            row_of = np.repeat(np.arange(n), counts)
            plens = np.fromiter((max(1, len(p)) for p in payloads), dtype=np.int64, count=n)
            lo = (frame_idx.astype(np.int64) * 32) % plens[row_of]
            frames = [payloads[r][o : o + 32] for r, o in zip(row_of, lo)]
            yield pd.DataFrame(
                {"media_id": media_ids, "frame_idx": frame_idx, "frame": frames}
            )

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
