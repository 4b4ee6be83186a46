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


# --------------------------------------------------------------------------- #
# N-Quads source (RDF 1.1 N-Quads, W3C REC) — quads interchange with other
# RDF systems. Line-based: Spark's text source splits on line boundaries, so
# a 100 TB dump parallelizes for free (each partition parses independently,
# no cross-line state). Malformed lines land in the quarantine channel like
# extraction errors do (rec_kind 'q'), never killing a task.
# --------------------------------------------------------------------------- #

NQ_RECORDS_SCHEMA = (
    "rec_kind string, src string, graph string, subj string, pred string, "
    "obj_kind string, obj_value string, obj_datatype string, obj_lang string, "
    "error string"
)


def read_nquads_records(spark: SparkSession, path: str, generalized: bool = False) -> DataFrame:
    """Parse N-Quads files at ``path`` into quad records.

    Output rows: rec_kind 't' carries one quad (graph '@default' for the
    default graph, matching the jsonldpy Dataset convention); rec_kind 'q'
    carries a malformed line verbatim in ``obj_value`` with the parse error
    in ``error`` — replayable per the pipeline containment rule, the same
    policy as extraction (triples.py quarantine channel). ``src`` is the
    originating file.

    ``generalized=True`` admits blank-node predicates (the engine's own
    toRDF emits them for the generalized-RDF quirk; strict mode matches the
    REC grammar)."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path).withColumn("src", F.input_file_name())

    def run(batches):
        import pandas as pd

        from jsonld_rs_spark.jsonldpy.nquads import (
            NQuadsParseError,
            parse_nquad_statement,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "rec_kind", "src", "graph", "subj", "pred",
                "obj_kind", "obj_value", "obj_datatype", "obj_lang", "error",
            )}
            for line, src in zip(pdf["value"], pdf["src"]):
                # one statement per text-source row; no fabricated line
                # numbers (Spark's splittable reader has no file position) —
                # the quarantine record's verbatim line + src locate it
                try:
                    parsed = parse_nquad_statement(line, generalized=generalized)
                except (NQuadsParseError, ValueError) as exc:
                    out["rec_kind"].append("q")
                    out["src"].append(src)
                    out["graph"].append(None)
                    out["subj"].append(None)
                    out["pred"].append(None)
                    out["obj_kind"].append(None)
                    out["obj_value"].append(line)
                    out["obj_datatype"].append(None)
                    out["obj_lang"].append(None)
                    out["error"].append(str(exc))
                    continue
                if parsed is None:
                    continue
                graph, q = parsed
                out["rec_kind"].append("t")
                out["src"].append(src)
                out["graph"].append(graph)
                out["subj"].append(q.subj)
                out["pred"].append(q.pred)
                out["obj_kind"].append(q.obj_kind)
                out["obj_value"].append(q.obj_value)
                out["obj_datatype"].append(q.obj_datatype)
                out["obj_lang"].append(q.obj_lang)
                out["error"].append(None)
            yield pd.DataFrame(out)

    return lines.mapInPandas(run, schema=NQ_RECORDS_SCHEMA)


def read_nquads(spark: SparkSession, path: str, generalized: bool = False) -> DataFrame:
    """The quads view of :func:`read_nquads_records` (parsed rows only),
    shaped like the pipeline triples table minus ``url``. Callers that need
    the malformed lines read the records and filter rec_kind 'q'."""
    from pyspark.sql import functions as F

    return (
        read_nquads_records(spark, path, generalized=generalized)
        .filter(F.col("rec_kind") == "t")
        .select("src", "graph", "subj", "pred", "obj_kind", "obj_value",
                "obj_datatype", "obj_lang")
    )
