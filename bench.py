"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

Set SPARK_GRAFT_BENCH_SCALING=1 to additionally run the KG pipeline at
local[8] and local[<cpus>] on the same input and report the two-cluster-size
throughput + scaling efficiency (BASELINE.md methodology).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_pred_counts",
    "kg_components",
    "kg_entity_links",
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "window_latest_event_per_user",
    "minhash_dup_pairs_docs",
    "simhash_docs",
    "ann_topk_cosine",
]


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jsonld-rs-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def warm_python_workers(spark, cpus: int) -> None:
    """Spin up the Python worker pool + Arrow path before timing — real
    clusters run long-lived executors; cold-start isn't the metric."""
    def _ident(batches):
        for pdf in batches:
            yield pdf

    spark.range(cpus * 4).repartition(cpus * 2).mapInPandas(_ident, "id long").count()


def _run(fn, spark, sf_dir):
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    n = df.count()
    return time.monotonic() - t0, n


def kg_throughput(spark, sf_dir):
    """Triples/sec of the extraction heart (pages → canonical triple rows)."""
    from jsonld_rs_spark.pipeline.synth import latest_pages, synthesize_pages
    from jsonld_rs_spark.pipeline.triples import extract_triples

    pages = latest_pages(synthesize_pages(spark, sf_dir)).cache()
    pages.count()  # materialize input outside the timed window
    t0 = time.monotonic()
    n_triples = extract_triples(pages).count()
    dt = time.monotonic() - t0
    pages.unpersist()
    return n_triples / dt, n_triples, dt


def main() -> None:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, CPUS)

    per_query = {}
    for name in HEADLINE:
        dt, _ = _run(queries[name], spark, SF_DIR)
        per_query[name] = round(dt, 3)

    tps, n_triples, extract_sec = kg_throughput(spark, SF_DIR)
    result = {
        "metric": "kg_pipeline_headline_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "triples_per_sec": round(tps, 1),
        "n_triples": n_triples,
        "extract_sec": round(extract_sec, 3),
        "cpus": CPUS,
    }

    if os.environ.get("SPARK_GRAFT_BENCH_SCALING") == "1":
        spark.stop()
        scaling = {}
        for cpus in (8, CPUS):
            s = make_spark(cpus)
            s.sparkContext.setLogLevel("ERROR")
            warm_python_workers(s, cpus)
            tps_c, _, _ = kg_throughput(s, SF_DIR)
            scaling[f"local[{cpus}]"] = round(tps_c, 1)
            s.stop()
        base, big = scaling[f"local[8]"], scaling[f"local[{CPUS}]"]
        result["scaling"] = scaling
        result["scaling_efficiency"] = round((big / base) / (CPUS / 8), 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
