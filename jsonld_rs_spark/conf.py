"""Canonical SparkSession configuration for this engine.

One place for the settings the pipeline depends on, so bench, spark-submit,
tests, and ad-hoc sessions cannot drift:

* ``arrow.maxRecordsPerBatch=256`` — html payloads are power-law sized;
  batches are budgeted by rows as a byte proxy (SURVEY.md §4.2);
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
    return (
        builder.config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
    )
