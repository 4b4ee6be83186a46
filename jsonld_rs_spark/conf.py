"""Canonical SparkSession configuration for this engine.

One place for the settings the pipeline depends on, so bench, spark-submit,
tests, and ad-hoc sessions cannot drift:

* ``arrow.maxBytesPerBatch=64m`` (env-overridable) — html payloads are
  power-law sized, so batches are budgeted by TRUE BYTES (Spark 4's direct
  knob; VERDICT r7 #2/#5 closed the old 256-row proxy, whose worst case
  was 256 × 10 MB ≈ 2.5 GB in one pandas frame). The row cap returns to
  Spark's 10k default so narrow-row stages get full-size batches — the
  byte cap, not the row proxy, now bounds fat rows (A/B at sf0.1:
  extraction best-trial 1.42 s vs 1.46 s, fewer per-batch overheads);
* AQE on (skew joins, runtime coalescing for the relational stages);
* shuffle partitions scaled to 2× cores — the Python-heavy stages manage
  their own parallelism via util.spread / explicit repartition.
"""

from __future__ import annotations

import os


def session_builder(master: str = None, app_name: str = "jsonld-rs-spark"):
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    cores = os.cpu_count() or 8
    if master and master.startswith("local["):
        inner = master[6:-1]
        if inner.isdigit():
            cores = int(inner)
    max_bytes = os.environ.get("SPARK_GRAFT_ARROW_MAX_BYTES", str(64 * 1024 * 1024))
    return (
        # zstd (r8, guide §6): measured wall-NEUTRAL on the bucketed triple
        # sink at sf0.1 (warm write+sync 1.13 s vs snappy's 1.11 s) at 30 %
        # smaller files (16 vs 23 MB) — every downstream reader pays 30 %
        # less I/O, which is what matters at corpus scale.
        builder.config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", max_bytes)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
    )
