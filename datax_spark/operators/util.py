"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_cpu(df: DataFrame, min_target: int | None = None) -> DataFrame:
    """Spread a narrow scan across the cluster before CPU-heavy per-row
    expression work (shingling, signature folds, per-token hashing).

    Spark sizes scan partitions by BYTES (``files.maxPartitionBytes``),
    which is wrong for operators whose cost is per-row compute: a 5 MB
    single-file corpus arrives as ONE partition and the whole fan-out
    runs on one core (measured: minhash pairs at sf0.1 went 13s → 1.5s
    at local[32] after spreading). No-op when the input already has at
    least ``defaultParallelism`` partitions — at real scale inputs have
    thousands of partitions and this adds nothing.
    """
    target = min_target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
