"""Public API surface tests, incl. reference entry-point quirks."""

import json

from jsonld_rs_spark.jsonldpy import api, expand
from jsonld_rs_spark.pipeline.context_store import BUILTIN_CONTEXTS, make_loader
from jsonld_rs_spark.pipeline.synth import blocks_for_doc


def test_expand_uses_string_document_as_base_quirk():
    # api.rs:79-84: with no base option, a JSON-string input doubles as the
    # base IRI; a bare string is a free-floating scalar → expands to [].
    assert api.expand("https://doc.example/base") == []


def test_options_record_roundtrip():
    opts = api.JsonLdOptions(
        base="https://x.example/",
        expand_context={"@context": {"name": "http://schema.org/name"}},
    )
    out = api.expand({"@id": "a", "name": "N"}, opts)
    assert out == [
        {"@id": "https://x.example/a", "http://schema.org/name": [{"@value": "N"}]}
    ]


def test_compact_expands_first():
    doc = {"@id": "http://e/x", "http://e/p": "v"}  # not expanded shape
    out = api.compact(doc, {"@context": {"p": "http://e/p"}})
    assert out == {"@context": {"p": "http://e/p"}, "@id": "http://e/x", "p": "v"}


def test_to_rdf_from_rdf_pair():
    doc = {"@id": "http://e/x", "http://e/p": [{"@value": 7}]}
    ds = api.to_rdf(doc)
    back = api.from_rdf(ds, use_native_types=True)
    assert back["http://e/x"]["http://e/p"] == [{"@value": 7}]


def test_expansion_idempotent_on_pipeline_corpus():
    loader = make_loader(BUILTIN_CONTEXTS)
    checked = 0
    for doc_id in range(0, 90):
        for body, malformed in blocks_for_doc(
            doc_id, "the data spark merge join key row fast", "fr"
        ):
            if malformed:
                continue
            base = f"https://s{doc_id % 7}.example/{doc_id}"
            once = expand(json.loads(body), base=base, loader=loader)
            twice = expand(once, base=base, loader=loader)
            assert twice == once, doc_id
            checked += 1
    assert checked > 60


def test_expand_iri_memo_parity():
    """The memoizing expand_iri must agree with its readable single-pass
    twin (_expand_iri_uncached) on every branch: keyword, term, compact
    IRI (defined/undefined prefix, blank, //-suffix), @vocab fallback,
    base resolution, plain fall-through — both cold and after the memo is
    warm, and across a context copy sharing the memo (review r6: the twin
    existed without the parity test its comment promised)."""
    from jsonld_rs_spark.jsonldpy.context import Context

    ctx = Context(base_iri="https://b.example/dir/doc")
    ctx.process_context(
        {
            "@vocab": "http://v.example/",
            "term": "http://t.example/term",
            "ex": "http://e.example/",
        },
        {},
        lambda url: (_ for _ in ()).throw(AssertionError(url)),
    )
    values = [
        "@type", "term", "ex:suffix", "ex:", "nope:suffix", "_:b0",
        "ex://odd", "plain", "rel/path", "", "#frag", "?q",
        "http://abs.example/x", "term:suffix",
    ]
    for rounds in range(2):  # cold, then memo-warm
        for v in values:
            for dr in (False, True):
                for vocab in (False, True):
                    assert ctx.expand_iri(v, dr, vocab) == ctx._expand_iri_uncached(
                        v, dr, vocab
                    ), (rounds, v, dr, vocab)
    copy = ctx.copy()  # shares the memo dict
    for v in values:
        assert copy.expand_iri(v, True, True) == copy._expand_iri_uncached(v, True, True)
