"""Pipeline-level tests: per-row invariants and golden triple comparison.

The golden side runs the SAME pure-Python per-document algorithms
single-threaded on the driver (reference semantics, FIXTURES.md §4); the
Spark side must reproduce them exactly (P/R = 1.0 ≥ the 0.95 gate) under
any partitioning.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jsonld_rs_spark.extract import extract_jsonld_blocks, extract_text
from jsonld_rs_spark.pipeline.context_store import BUILTIN_CONTEXTS
from jsonld_rs_spark.pipeline.synth import latest_pages, synthesize_pages, synthesize_rows
from jsonld_rs_spark.pipeline.triples import (
    dedup_triples,
    doc_to_quad_rows,
    extract_records,
    split_records,
)


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return latest_pages(synthesize_pages(spark, sf_dir)).cache()


def _docs_pdf(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_text_extraction_byte_identical(pages, sf_dir):
    rows = pages.select("url", "html", "text").collect()
    assert len(rows) == len(_docs_pdf(sf_dir))
    for r in rows:
        assert extract_text(bytes(r["html"])) == r["text"], r["url"]


def test_latest_crawl_wins(spark, sf_dir, pages):
    all_pages = synthesize_pages(spark, sf_dir)
    assert all_pages.count() > pages.count()  # stale crawls existed
    stale = pages.filter(F.col("text").endswith("[stale]")).count()
    assert stale == 0  # and none survived the window dedup


def test_spark_triples_match_pure_python_golden(pages, sf_dir):
    # golden: single-threaded pure-Python over the same synthesized pages
    golden = set()
    for d in _docs_pdf(sf_dir).itertuples():
        crawls = list(synthesize_rows(int(d.doc_id), d.text, d.lang, d.source))
        latest = max(crawls, key=lambda r: r["warc_ts"])
        for row in doc_to_quad_rows(latest["url"], latest["html"], BUILTIN_CONTEXTS):
            golden.add(row)

    # Compare pre-dedup provenance rows exactly: precision = recall = 1.0
    spark_raw = {
        tuple(r) for r in split_records(extract_records(pages))[0].collect()
    }
    missing = golden - spark_raw
    extra = spark_raw - golden
    assert not missing, f"{len(missing)} golden triples missing, e.g. {list(missing)[:3]}"
    assert not extra, f"{len(extra)} unexpected triples, e.g. {list(extra)[:3]}"


def test_metrics_account_for_malformed_blocks(pages):
    _, metrics = split_records(extract_records(pages))
    m = metrics.groupBy().sum("docs", "blocks", "err_json", "triples").collect()[0]
    n_docs = pages.count()
    assert m["sum(docs)"] == n_docs
    assert m["sum(err_json)"] > 0  # malformed blocks exist by construction
    assert m["sum(triples)"] > m["sum(docs)"]
    # every parse error corresponds to a kind-4 (truncated) block
    golden_bad = sum(
        1
        for d in _docs_pdf("/root/testdata/sf0.001").itertuples()
        for i in range(int(d.doc_id) % 4)
        if (int(d.doc_id) + i) % 6 == 4
    )
    assert m["sum(err_json)"] == golden_bad


def test_blank_labels_globally_unique_per_url(pages):
    triples, _ = split_records(extract_records(pages))
    blanks = (
        triples.filter(F.col("subj").startswith("_:"))
        .select("url", "subj")
        .distinct()
        .groupBy("subj")
        .agg(F.countDistinct("url").alias("n_urls"))
        .filter(F.col("n_urls") > 1)
        .count()
    )
    assert blanks == 0  # url-hash namespacing keeps blank labels disjoint


def test_extraction_regex_tolerates_attribute_noise():
    html = (
        b'<SCRIPT type="application/ld+json">{"@id": "http://x.example/1"}</script>'
        b'<script type=\'application/ld+json\'>{"a": 1}</script>'
        b'<script type="text/javascript">ignored</script>'
    )
    blocks = extract_jsonld_blocks(html)
    assert len(blocks) == 2


def test_quarantine_rows_replayable(pages):
    from jsonld_rs_spark.pipeline.triples import quarantined

    records = extract_records(pages)
    q = quarantined(records).collect()
    assert len(q) > 0
    assert all(r["error"] == "json_parse_error" for r in q)
    # every quarantined (url, block_index) points at an actually-bad block
    import json as _json

    for r in q[:10]:
        page = pages.filter(F.col("url") == r["url"]).collect()[0]
        blocks = extract_jsonld_blocks(bytes(page["html"]))
        try:
            _json.loads(blocks[r["block_index"]])
            raise AssertionError(f"block {r} parsed fine")
        except ValueError:
            pass


def test_poison_document_quarantined_not_crashed(spark):
    """A URDNA2015-adversarial block (symmetric blank clique) must land in
    quarantine with the canonicalization error code — never kill the task."""
    import json as _json

    from jsonld_rs_spark.pipeline.triples import quarantined, split_records

    n = 9
    clique = [
        {"@id": f"_:n{i}", "http://e/r": [{"@id": f"_:n{j}"} for j in range(n) if j != i]}
        for i in range(n)
    ]
    html = (
        '<script type="application/ld+json">'
        + _json.dumps(clique)
        + '</script><div id="doc-text">poison</div>'
    ).encode()
    pages = spark.createDataFrame(
        [("https://poison.example/1", None, html, "poison", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    records = extract_records(pages)
    q = quarantined(records).collect()
    assert len(q) == 1
    assert q[0]["error"] == "canonicalization_too_complex"
    triples, metrics = split_records(records)
    assert triples.count() == 0
    assert metrics.groupBy().sum("err_canon").collect()[0][0] == 1


def test_schemeless_url_quarantined_not_crashed(spark):
    pages = spark.createDataFrame(
        [
            (
                "not-a-url",
                None,
                b'<script type="application/ld+json">{"@id": "x", "http://e/p": "v"}</script>',
                "t",
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    from jsonld_rs_spark.pipeline.triples import quarantined

    records = extract_records(pages)
    q = quarantined(records).collect()
    assert len(q) == 1 and q[0]["error"].startswith("value_error")


def test_latest_pages_tie_break_single_winner(spark):
    from datetime import datetime

    from jsonld_rs_spark.pipeline.synth import latest_pages

    ts = datetime(2024, 1, 1)
    rows = [
        ("https://t.example/1", ts, b"<html>old</html>", "t", "en"),
        ("https://t.example/1", ts, b"<html>new</html>", "t", "en"),  # same ts!
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = latest_pages(pages).collect()
    assert len(out) == 1  # hash tie-break picks exactly one


def test_dedup_triples_deterministic_representative(spark):
    """Identical triples from many pages must keep a deterministic provenance
    url (min), independent of partitioning/run order (ADVICE r1, medium)."""
    rows = [
        ("http://z.example/3", None, "http://s/1", "http://p/1", "iri", "http://o/1", None, None),
        ("http://a.example/1", None, "http://s/1", "http://p/1", "iri", "http://o/1", None, None),
        ("http://m.example/2", None, "http://s/1", "http://p/1", "iri", "http://o/1", None, None),
        ("http://b.example/9", None, "http://s/2", "http://p/1", "lit", "x", "http://www.w3.org/2001/XMLSchema#string", None),
    ]
    cols = ["url", "graph", "subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang"]
    schema = ", ".join(f"{c} string" for c in cols)
    for perm in (rows, rows[::-1], rows[1:] + rows[:1]):
        for nparts in (1, 3):
            df = spark.createDataFrame(perm, schema).repartition(nparts)
            got = {(r["subj"], r["url"]) for r in dedup_triples(df).collect()}
            assert got == {
                ("http://s/1", "http://a.example/1"),
                ("http://s/2", "http://b.example/9"),
            }


# --------------------------------------------------------------------- #
# Driver-gate mutation tests (VERDICT r5 #1): the rows-only kg_* queries
# are self-gating — a VALUE regression must RAISE so the driver's
# CORRECTNESS row flips to `err` instead of staying a green-looking
# no_oracle row. These prove the gates actually trip.
# --------------------------------------------------------------------- #


def test_golden_parity_green_path(spark, sf_dir):
    """Unmutated engine: the driver query passes its own gate and reports
    P = R = 1.0 over the 1-in-10 sample."""
    import __spark_entry__ as e

    row = e.kg_golden_parity(spark, sf_dir).collect()[0]
    assert row["precision"] == 1.0 and row["recall"] == 1.0
    assert row["n_ref"] == row["n_got"] > 0


def test_golden_parity_gate_trips_on_mutated_extraction(spark, sf_dir, monkeypatch):
    """Mutation: Spark-side extraction silently drops a deterministic half
    of its triples → recall collapses → the query must RAISE (not return a
    1-row DataFrame the driver would record as green)."""
    import __spark_entry__ as e
    from jsonld_rs_spark.pipeline import triples as triples_mod

    real_split = triples_mod.split_records

    def broken_split(records):
        t, m = real_split(records)
        return t.filter(F.abs(F.xxhash64("subj", "pred", "obj_value")) % 2 == 0), m

    monkeypatch.setattr(triples_mod, "split_records", broken_split)
    with pytest.raises(AssertionError, match="kg_golden_parity gate"):
        e.kg_golden_parity(spark, sf_dir)


def test_extraction_metrics_green_path(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.kg_extraction_metrics(spark, sf_dir).collect()
    assert rows and sum(r["triples"] for r in rows) > 0


def test_extraction_metrics_gate_trips_on_error_explosion(spark, sf_dir, monkeypatch):
    """Mutation: per-document expansion failures start being counted → the
    err_jsonld==0 invariant must RAISE."""
    import __spark_entry__ as e
    from jsonld_rs_spark.pipeline import triples as triples_mod

    real_split = triples_mod.split_records

    def broken_split(records):
        t, m = real_split(records)
        return t, m.withColumn("err_jsonld", F.col("err_jsonld") + F.lit(7))

    monkeypatch.setattr(triples_mod, "split_records", broken_split)
    with pytest.raises(AssertionError, match="err_jsonld"):
        e.kg_extraction_metrics(spark, sf_dir)


def test_nquads_source_parses_and_quarantines(spark, tmp_path_factory):
    """read_nquads_records: good lines become quad rows (graph-keyed),
    malformed lines land in the quarantine channel with the line verbatim —
    a bad line must never kill the scan (pipeline containment rule)."""
    from pyspark.sql import functions as F

    from jsonld_rs_spark.pipeline.sources import read_nquads, read_nquads_records

    d = tmp_path_factory.mktemp("nq")
    (d / "a.nq").write_text(
        '<http://e/s> <http://e/p> "v" .\n'
        "# comment\n"
        '<http://e/s> <http://e/p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> <http://e/g> .\n'
        "<http://e/s> <malformed line\n"
        '_:b <http://e/q> "x"@en .\n'
    )
    rec = read_nquads_records(spark, str(d))
    rows = rec.collect()
    quads = [r for r in rows if r["rec_kind"] == "t"]
    bad = [r for r in rows if r["rec_kind"] == "q"]
    assert len(quads) == 3 and len(bad) == 1
    assert bad[0]["obj_value"].startswith("<http://e/s> <malformed")
    # no fabricated line number — Spark's splittable text reader has no file
    # position; the verbatim line + src column locate the record instead
    assert "line " not in bad[0]["error"] and "malformed IRI" in bad[0]["error"]
    graphs = {r["graph"] for r in quads}
    assert graphs == {"@default", "http://e/g"}
    typed = [r for r in quads if r["obj_datatype"] and r["obj_datatype"].endswith("integer")]
    assert len(typed) == 1 and typed[0]["obj_value"] == "5"

    # quads view drops the quarantine channel and the rec_kind column
    qdf = read_nquads(spark, str(d))
    assert qdf.count() == 3
    assert "error" not in qdf.columns

    # strict mode rejects blank predicates; generalized admits them
    (d / "b.nq").write_text("_:s _:p <http://o> .\n")
    strict = read_nquads_records(spark, str(d / "b.nq"))
    assert strict.filter(F.col("rec_kind") == "q").count() == 1
    loose = read_nquads_records(spark, str(d / "b.nq"), generalized=True)
    assert loose.filter(F.col("rec_kind") == "t").count() == 1


def test_nquads_source_roundtrips_canonical_fixture(spark, tmp_path_factory):
    """Reading a committed canonical toRDF output through the Spark source
    and re-serializing reproduces the file bit-exact — the distributed scan
    agrees with the in-process parser."""
    import os

    from jsonld_rs_spark.jsonldpy import canonical_nquads
    from jsonld_rs_spark.jsonldpy.rdf import Quad
    from jsonld_rs_spark.pipeline.sources import read_nquads

    fix = os.path.join(
        os.path.dirname(__file__), "fixtures", "toRdf", "t0105-out.nq"
    )
    with open(fix) as f:
        text = f.read()
    d = tmp_path_factory.mktemp("nq_rt")
    (d / "fixture.nq").write_text(text)
    rows = read_nquads(spark, str(d)).collect()
    ds = {}
    for r in rows:
        ds.setdefault(r["graph"], []).append(
            Quad(r["subj"], r["pred"], r["obj_kind"], r["obj_value"],
                 r["obj_datatype"], r["obj_lang"])
        )
    assert canonical_nquads(ds) == text


def test_extraction_arrow_batches_are_byte_bounded(spark):
    """r8 (VERDICT r7 #2/#5): extraction batches must be bounded by BYTES,
    not a row-count proxy — a crawl partition of tail-heavy multi-MB pages
    must never materialize an unbounded pandas frame in one worker. The
    engine config (conf.session_builder) sets
    spark.sql.execution.arrow.maxBytesPerBatch; this pins that the knob
    actually splits a fat-page scan on the same (url, html) projection
    extract_records consumes."""
    import pandas as pd

    budget = 4 * 1024 * 1024
    old = spark.conf.get("spark.sql.execution.arrow.maxBytesPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxBytesPerBatch", str(budget))
    try:
        page = ("y" * (1024 * 1024)).encode()
        df = spark.createDataFrame(
            [(f"https://big.example/{i}", bytearray(page)) for i in range(16)],
            "url string, html binary",
        ).coalesce(1)

        def probe(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "rows": [len(pdf)],
                        "nbytes": [int(pdf["html"].map(len).sum())],
                    }
                )

        out = df.select("url", "html").mapInPandas(
            probe, "rows int, nbytes long"
        ).collect()
        assert len(out) > 1, "16 MB of pages in one scan partition must split"
        for r in out:
            # one-row slack: the cap closes a batch after it crosses budget
            assert r["nbytes"] <= budget + 2 * len(page)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxBytesPerBatch", old)
