"""fromRDF assembly tests: Spark grouped assembly equals the pure-Python
rdf_to_jsonld on the same per-url datasets."""

import json

import pytest

from jsonld_rs_spark.jsonldpy.rdf import Quad, rdf_to_jsonld
from jsonld_rs_spark.pipeline.assemble import assemble_documents
from jsonld_rs_spark.pipeline.synth import latest_pages, synthesize_pages
from jsonld_rs_spark.pipeline.triples import extract_records, split_records


@pytest.fixture(scope="module")
def triples(spark, sf_dir):
    pages = latest_pages(synthesize_pages(spark, sf_dir))
    t, _ = split_records(extract_records(pages))
    return t.cache()


def test_assembly_matches_pure_python(spark, triples):
    assembled = {r["url"]: r for r in assemble_documents(triples).collect()}
    rows = triples.collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], {}).setdefault(r["graph"], []).append(
            Quad(r["subj"], r["pred"], r["obj_kind"], r["obj_value"],
                 r["obj_datatype"], r["obj_lang"])
        )
    checked = 0
    for url, dataset in list(by_url.items())[:50]:
        want = rdf_to_jsonld(dataset, use_native_types=True)
        got = json.loads(assembled[url]["jsonld"])
        assert got == json.loads(json.dumps(want, sort_keys=True)), url
        assert assembled[url]["n_nodes"] == len(want)
        checked += 1
    assert checked == 50
    # every url with triples got assembled
    assert set(assembled) == set(by_url)


def test_assembly_restores_native_types(spark, triples):
    sample = assemble_documents(triples).limit(200).collect()
    saw_int = saw_list = False
    for r in sample:
        doc = json.loads(r["jsonld"])
        for node in doc.values():
            for key, vals in node.items():
                if key.startswith("@"):
                    continue
                for v in vals:
                    if isinstance(v, dict) and isinstance(v.get("@value"), int):
                        saw_int = True
                    if isinstance(v, dict) and "@list" in v:
                        saw_list = True
    assert saw_int and saw_list


def test_compact_documents_lossless_under_reexpansion(spark, sf_dir):
    """compact(assembled) must re-expand to exactly the assembled expanded
    document (compaction is a view, not a transformation)."""
    import json as _json

    import __spark_entry__ as e
    from jsonld_rs_spark.jsonldpy import expand
    from jsonld_rs_spark.pipeline.assemble import assemble_documents, compact_documents

    assembled = assemble_documents(e._kg_triples(spark, sf_dir))
    joined = (
        assembled.select("url", "jsonld")
        .join(compact_documents(assembled), "url")
        .limit(60)
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        original = _json.loads(r["jsonld"])
        reexpanded = expand(_json.loads(r["compacted"]), base=r["url"])
        assert expand(original, base=r["url"]) == reexpanded, r["url"]
