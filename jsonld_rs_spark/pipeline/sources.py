"""Crawl-table input resolution (north rule: "Iceberg table of
Common-Crawl-style web pages").

On a real cluster the crawl lands in an Iceberg catalog table; this sandbox
has parquet files and a deterministic page synthesizer. ``read_pages``
resolves whichever exists, so pipeline code and the spark-submit CLI take
one argument and run unchanged in all three worlds:

* ``catalog.db.table`` identifier + a configured Iceberg catalog
  → ``spark.read.table`` (hidden-partition pruning, snapshot isolation);
* a directory/file path → parquet scan;
* an ``sf*`` testdata directory → synthesized pages (sandbox stand-in).

Expected schema either way (BASELINE.json input_hint):
``url string, warc_ts timestamp, html binary, text string, lang string``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .materialize import iceberg_catalog

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(spark: SparkSession, source: str, replicate: int = 1) -> DataFrame:
    """Resolve ``source`` to the crawl DataFrame (see module docstring)."""
    looks_like_table = (
        not os.path.exists(source) and "/" not in source and "." in source
    )
    if looks_like_table:
        if iceberg_catalog(spark) is None:
            raise ValueError(
                f"'{source}' looks like a catalog table identifier but no "
                "Iceberg catalog is configured on this session"
            )
        return spark.read.table(source).select(*PAGES_COLUMNS)
    if os.path.isdir(source) and os.path.exists(
        os.path.join(source, "documents.parquet")
    ):
        from .synth import synthesize_pages

        return synthesize_pages(spark, source, replicate)
    return spark.read.parquet(source).select(*PAGES_COLUMNS)
