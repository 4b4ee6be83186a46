"""Shared Spark helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure ``df`` runs at cluster parallelism.

    Single-file sandbox tables scan as 1 partition, and AQE coalesces
    small-in-bytes shuffles to 1 partition — both serialize downstream
    compute-heavy (UDF/hash-heavy) stages whose per-row cost dwarfs their
    byte size. No-op when the input is already spread (the 100 TB case).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism, *cols) if cols else df.repartition(parallelism)
