"""fromRDF assembly: triple table → JSON-LD documents, per provenance url.

The inverse of the extraction heart (reference rdf_to_jsonld,
/root/reference/src/rdf.rs:277-515): grouped ``applyInPandas`` rebuilds the
per-document RDF dataset from triple rows and serializes it back to JSON-LD
node objects (native types, list reconstruction).

Scale shape: the shuffle key is ``url`` (provenance), so each group is one
small document graph — group size is bounded by page size, never by corpus
size. This is the pattern for any per-entity re-serialization at 10^12
rows: shuffle on the bounded key, run the tree algorithm in Python on the
bounded group.
"""

from __future__ import annotations

import json
from typing import Dict, List

from pyspark.sql import DataFrame

from ..jsonldpy.rdf import Quad, rdf_to_jsonld

ASSEMBLED_SCHEMA = "url string, n_nodes int, jsonld string"


def _rows_to_dataset(pdf) -> Dict[str, List[Quad]]:
    dataset: Dict[str, List[Quad]] = {}
    for graph, subj, pred, obj_kind, obj_value, obj_datatype, obj_lang in zip(
        pdf["graph"], pdf["subj"], pdf["pred"], pdf["obj_kind"],
        pdf["obj_value"], pdf["obj_datatype"], pdf["obj_lang"],
    ):
        dataset.setdefault(graph, []).append(
            Quad(
                subj,
                pred,
                obj_kind,
                obj_value,
                None if obj_datatype is None else str(obj_datatype),
                None if obj_lang is None else str(obj_lang),
            )
        )
    return dataset


def assemble_documents(triples_df: DataFrame, use_native_types: bool = True) -> DataFrame:
    """triples → one JSON-LD document per url (sorted keys, deterministic).

    NOT ``groupBy(url).applyInPandas``: with millions of tiny groups the
    per-group pandas spin-up dominates. Instead: hash-repartition by url,
    sort within partitions, and stream Arrow batches through ONE pandas pass
    per batch — a url's rows may span batch boundaries, so the trailing
    url's rows carry over to the next batch.
    """
    import pandas as pd

    spark = triples_df.sparkSession

    def _assemble_pdf(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        for url, group in pdf.groupby("url", sort=False):
            doc = rdf_to_jsonld(_rows_to_dataset(group), use_native_types=use_native_types)
            rows.append((url, len(doc), json.dumps(doc, sort_keys=True)))
        return pd.DataFrame(rows, columns=["url", "n_nodes", "jsonld"])

    def run(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            last_url = pdf["url"].iloc[-1]
            head = pdf[pdf["url"] != last_url]
            carry = pdf[pdf["url"] == last_url]
            if len(head):
                yield _assemble_pdf(head)
        if carry is not None and len(carry):
            yield _assemble_pdf(carry)

    src = triples_df.repartition(
        spark.sparkContext.defaultParallelism, "url"
    ).sortWithinPartitions("url")
    return src.mapInPandas(run, schema=ASSEMBLED_SCHEMA)


def compact_documents(assembled_df: DataFrame, context: dict = None) -> DataFrame:
    """Assembled expanded JSON-LD → compacted JSON-LD per url against a
    target context (default: a schema.org vocab context) — the pipeline
    surface of the reference's compact API (api.rs:42-71). One narrow Arrow
    pass over the (url, jsonld) rows; compaction is per-document, so there
    is no shuffle at all."""
    import pandas as pd

    from ..jsonldpy import errors as E
    from ..jsonldpy.compact import compact_document

    # `is not None`: an explicit empty context (= keep absolute IRIs) must
    # not fall through to the schema.org default
    ctx = context if context is not None else {"@context": {"@vocab": "http://schema.org/"}}

    def run(batches):
        for pdf in batches:
            out = []
            for url, doc_json in zip(pdf["url"], pdf["jsonld"]):
                # per-document containment (CLAUDE.md): one poison doc must
                # never kill the task — it lands in the error column
                try:
                    compacted = compact_document(json.loads(doc_json), ctx, base=url)
                    out.append((url, json.dumps(compacted, sort_keys=True), None))
                except E.JsonLdError as exc:
                    out.append((url, None, exc.code))
                except (ValueError, RecursionError) as exc:
                    out.append((url, None, type(exc).__name__))
            yield pd.DataFrame(out, columns=["url", "compacted", "error"])

    return assembled_df.select("url", "jsonld").mapInPandas(
        run, schema="url string, compacted string, error string"
    )
