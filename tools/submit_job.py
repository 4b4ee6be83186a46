"""spark-submit entry point (north rule: `run via spark-submit --py-files`).

    python tools/package.py
    spark-submit --master local[8] --py-files dist/jsonld_rs_spark.zip \
        tools/submit_job.py /root/testdata/sf0.001 /tmp/kg_out

Runs the full KG pipeline: synthesize → latest-crawl dedup → extract →
materialize (bucketed triples + metrics + quarantine + manifest) → CC →
canonical triple counts; prints one JSON summary line.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    from jsonld_rs_spark.pipeline.components import connected_components
    from jsonld_rs_spark.pipeline.linking import sameas_edges
    from jsonld_rs_spark.pipeline.materialize import extract_and_materialize, read_triples
    from jsonld_rs_spark.pipeline.sources import read_pages
    from jsonld_rs_spark.pipeline.synth import latest_pages
    from jsonld_rs_spark.pipeline.triples import dedup_triples

    # source: sf-style dir (synth), parquet path, or Iceberg table identifier
    source = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kg_out"

    from jsonld_rs_spark.conf import session_builder

    spark = session_builder(app_name="jsonld-rs-spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    pages = latest_pages(read_pages(spark, source))
    paths = extract_and_materialize(pages, out_dir)
    triples = dedup_triples(read_triples(spark, out_dir))
    comps = connected_components(sameas_edges(triples))

    summary = {
        "pages": pages.count(),
        "triples": triples.count(),
        "components": comps.select("component").distinct().count(),
        "tables": paths,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
