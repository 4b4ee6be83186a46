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
    """Resolve ``source`` to the crawl DataFrame (see module docstring).

    ``replicate`` is a synthesis-only knob (it scales the synthetic page
    count); passing it with a real table/path is refused rather than
    silently ignored — a scaling bench pointed at real data must not be
    off by ×replicate."""
    if os.path.isdir(source) and os.path.exists(
        os.path.join(source, "documents.parquet")
    ):
        from .synth import synthesize_pages

        return synthesize_pages(spark, source, replicate)
    if replicate != 1:
        raise ValueError("replicate only applies to synthesized sf-dir sources")
    # explicit routing beats guessing: 'table:catalog.db.name' always goes to
    # the session catalog (works for Hive or any other configured catalog,
    # not just Iceberg — ADVICE r2: a valid non-Iceberg identifier must not
    # fall through to a misleading parquet path error)
    if source.startswith("table:"):
        return spark.read.table(source[len("table:"):]).select(*PAGES_COLUMNS)
    # otherwise a table identifier only if it cannot be a file path: existing
    # paths, slashes, and parquet suffixes all route to the file reader (a
    # typo'd relative path must surface as file-not-found, not a catalog
    # error). The bare-identifier auto-route is Iceberg-gated; other
    # catalogs use the explicit 'table:' prefix.
    looks_like_table = (
        not os.path.exists(source)
        and "/" not in source
        and "." in source
        and not source.endswith(".parquet")
        and iceberg_catalog(spark) is not None
    )
    if looks_like_table:
        return spark.read.table(source).select(*PAGES_COLUMNS)
    return spark.read.parquet(source).select(*PAGES_COLUMNS)
