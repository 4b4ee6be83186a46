"""Manifest-driven compact conformance tests (format of the reference
harness, /root/reference/src/bin/test_compact.rs:61-115, honoring the
``compactArrays`` option) plus an expand∘compact round-trip property over
the pipeline's synthesized JSON-LD blocks."""

import json
import os

import pytest

from jsonld_rs_spark.jsonldpy import expand
from jsonld_rs_spark.jsonldpy.compact import compact_document
from jsonld_rs_spark.pipeline.context_store import BUILTIN_CONTEXTS, make_loader
from jsonld_rs_spark.pipeline.synth import blocks_for_doc

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "compact")

with open(os.path.join(HERE, "manifest.jsonld")) as f:
    MANIFEST = json.load(f)

CASES = [
    t
    for t in MANIFEST["sequence"]
    if "jld:PositiveEvaluationTest" in t["@type"]
    and t.get("option", {}).get("specVersion") != "json-ld-1.1"
]
NEGATIVE = [
    t for t in MANIFEST["sequence"] if "jld:NegativeEvaluationTest" in t["@type"]
]


def _read(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["@id"])
def test_compact_positive(case):
    doc = _read(case["input"])
    context = _read(case["context"])
    option = case.get("option", {})
    actual = compact_document(
        doc,
        context,
        base=option.get("base", MANIFEST["baseIri"] + case["input"]),
        compact_arrays=option.get("compactArrays", True),
    )
    assert actual == _read(case["expect"]), case["name"]


# ---------------------------------------------------------------------------
# Meaning preservation (independent of the self-generated fixtures): each
# positive compact case's OUTPUT, re-expanded against its own context, must
# reproduce the input's canonical N-Quads — a compaction defect that alters
# meaning cannot hide behind a regenerated -out fixture. Complements the
# generative expand∘compact property in test_roundtrip_property.py with the
# curated corner cases.
# ---------------------------------------------------------------------------

from jsonld_rs_spark.jsonldpy import (  # noqa: E402
    DefaultNodeGenerator,
    canonical_nquads,
    jsonld_to_rdf,
)


@pytest.mark.parametrize("case", CASES, ids=lambda c: "rt" + c["@id"])
def test_compact_preserves_rdf_meaning(case):
    doc = _read(case["input"])
    context = _read(case["context"])
    option = case.get("option", {})
    base = option.get("base", MANIFEST["baseIri"] + case["input"])
    compacted = compact_document(
        doc,
        context,
        base=base,
        compact_arrays=option.get("compactArrays", True),
    )
    # the compacted document carries its @context; re-expansion restores
    # the expanded form whose RDF must match the input's
    re_expanded = expand(compacted, base=base)
    assert canonical_nquads(
        jsonld_to_rdf(re_expanded, DefaultNodeGenerator())
    ) == canonical_nquads(jsonld_to_rdf(doc, DefaultNodeGenerator())), case["name"]


@pytest.mark.parametrize("case", NEGATIVE, ids=lambda c: c["@id"])
def test_compact_negative(case):
    from jsonld_rs_spark.jsonldpy import errors as E

    doc = _read(case["input"])
    context = _read(case["context"])
    with pytest.raises(E.JsonLdError) as ei:
        compact_document(
            doc, context, base=MANIFEST["baseIri"] + case["input"]
        )
    assert ei.value.code == case["expectErrorCode"], case["name"]


def test_expand_compact_roundtrip_on_pipeline_blocks():
    """expand(compact(expand(doc))) == expand(doc) for every well-formed
    synthesized block — compaction must be lossless under re-expansion."""
    loader = make_loader(BUILTIN_CONTEXTS)
    target_context = {"@context": "https://ctx.example/v1"}
    n_checked = 0
    for doc_id in range(0, 120):
        for body, malformed in blocks_for_doc(doc_id, "the fast data spark merge join key row", "de"):
            if malformed:
                continue
            doc = json.loads(body)
            base = f"https://src{doc_id % 20}.example/{doc_id}"
            expanded = expand(doc, base=base, loader=loader)
            compacted = compact_document(doc, target_context, base=base, loader=loader)
            reexpanded = expand(compacted, base=base, loader=loader)
            assert reexpanded == expanded, f"doc {doc_id}: {json.dumps(compacted)[:200]}"
            n_checked += 1
    assert n_checked > 100


def test_compact_list_of_lists_error():
    from jsonld_rs_spark.jsonldpy import errors as E
    from jsonld_rs_spark.jsonldpy.compact import compact_core

    expanded = [
        {
            "@id": "http://e/x",
            "http://e/l": [
                {"@list": [{"@value": "a"}]},
                {"@list": [{"@value": "b"}]},
            ],
        }
    ]
    ctx = {"l": {"@id": "http://e/l", "@container": "@list"}}
    with pytest.raises(E.CompactionError) as exc:
        compact_core(ctx, expanded)
    assert exc.value.code == "compaction_to_list_of_lists"


def test_compact_with_remote_context_via_loader():
    loader = make_loader(BUILTIN_CONTEXTS)
    expanded = [
        {
            "@id": "https://s.example/1",
            "@type": ["http://schema.org/Article"],
            "http://schema.org/name": [{"@value": "N"}],
            "http://schema.org/sameAs": [{"@id": "http://kg.example/e/data"}],
        }
    ]
    from jsonld_rs_spark.jsonldpy.compact import compact_core

    out = compact_core("https://ctx.example/v1", expanded, loader=loader)
    assert out["type"] == "Article"
    assert out["name"] == "N"
    assert out["sameAs"] == "http://kg.example/e/data"
    assert out["@context"] == "https://ctx.example/v1"
    # and it round-trips through expansion
    assert expand(out, base="https://s.example/1", loader=loader) == expanded


# ---- internal malformed-expanded-input guards ---------------------------
# The public API expands first, so these branches are unreachable through
# compact_document (malformed input raises the EXPANSION code instead —
# covered by the expand negative manifest). compact_core is the reference's
# compact() over an already-expanded element (compact.rs:231-272): feed it
# hand-built malformed "expanded" documents and pin every defensive error
# code so the enum stays reference-parity.

import pytest as _pytest

from jsonld_rs_spark.jsonldpy import errors as _E
from jsonld_rs_spark.jsonldpy.compact import compact_core as _core


@_pytest.mark.parametrize(
    "name, ctx, element, code",
    [
        (
            "id as list",
            {},
            {"@id": ["http://e/a", "http://e/b"]},
            "id_not_string",
        ),
        (
            "id as int",
            {},
            {"@id": 5},
            "id_or_type_not_string",
        ),
        (
            "type array with non-string",
            {},
            {"@id": "http://e/x", "@type": ["http://e/T", 7]},
            "type_not_string",
        ),
        (
            "reverse value not a map",
            {},
            {"@id": "http://e/x", "@reverse": "oops"},
            "term_not_object",
        ),
        (
            "language tag not a string",
            {"p": {"@id": "http://e/p"}},
            {"@id": "http://e/x", "http://e/p": [{"@value": "v", "@language": 5}]},
            "language_not_string",
        ),
        (
            "index not a string under index container",
            {"p": {"@id": "http://e/p", "@container": "@index"}},
            {"@id": "http://e/x", "http://e/p": [{"@value": "v", "@index": 3}]},
            "language_or_index_not_string",
        ),
        (
            "list value not an array under list container",
            {"p": {"@id": "http://e/p", "@container": "@list"}},
            {"@id": "http://e/x", "http://e/p": [{"@list": "no"}]},
            "list_object_not_array",
        ),
        (
            "list item not an object under list container",
            {"p": {"@id": "http://e/p", "@container": "@list"}},
            {"@id": "http://e/x", "http://e/p": [{"@list": ["bare"]}]},
            "list_item_not_object",
        ),
        (
            "list item language not a string",
            {"p": {"@id": "http://e/p", "@container": "@list"}},
            {"@id": "http://e/x", "http://e/p": [{"@list": [{"@value": "v", "@language": 5}]}]},
            "language_not_string",
        ),
        (
            "list item type not a string",
            {"p": {"@id": "http://e/p", "@container": "@list"}},
            {"@id": "http://e/x", "http://e/p": [{"@list": [{"@value": "v", "@type": 5}]}]},
            "type_not_string",
        ),
        (
            "node-ref @id not a string at term selection (probe arm)",
            {"p": {"@id": "http://e/p"}},
            {"@id": "http://e/x", "http://e/p": [{"@id": 5}]},
            "id_not_string",
        ),
        (
            "value @type not a string at term selection",
            {"p": {"@id": "http://e/p"}},
            {"@id": "http://e/x", "http://e/p": [{"@value": "v", "@type": 5}]},
            "type_not_string",
        ),
        (
            "value @language not a string under a language-mapped term",
            {"p": {"@id": "http://e/p", "@language": "en"}},
            {"@id": "http://e/x", "http://e/p": [{"@value": "v", "@language": ["en"]}]},
            "language_not_string",
        ),
    ],
)
def test_compact_core_guards_malformed_expanded_input(name, ctx, element, code):
    with _pytest.raises(_E.CompactionError) as ei:
        _core(ctx, element)
    assert ei.value.code == code, name


# ---------------------------------------------------------------------------
# Arms only reachable through compact_core with hand-fed expanded input:
# expansion can never emit "@language": null or bare scalars in property
# arrays, but compact_core is public API and the reference handles both
# (Value::Null language arms compact.rs:883-900; scalar fallthrough
# compact.rs:275-280) — parity pins, not spec conformance.
# ---------------------------------------------------------------------------


def test_compact_core_null_language_value_errors_at_selection():
    """ASYMMETRY pinned from the reference: a null @language in a NON-list
    value object errors at term selection (compact.rs:741-744 uses
    as_str().ok_or(LanguageNotString)), while the same null inside a LIST
    item maps to "@null" and selects a null-language term (Value::Null arm,
    compact.rs:687). Both arms below."""
    with _pytest.raises(_E.CompactionError) as ei:
        _core(
            {"pn": {"@id": "http://e/p", "@language": None}},
            [{"@id": "http://e/x", "http://e/p": [{"@value": "x", "@language": None}]}],
        )
    assert ei.value.code == "language_not_string"


def test_compact_core_null_language_list_items_select_null_language_list_term():
    out = _core(
        {"ln": {"@id": "http://e/p", "@container": "@list", "@language": None}},
        [{"@id": "http://e/x", "http://e/p": [{"@list": [{"@value": "x", "@language": None}]}]}],
    )
    assert out["ln"] == ["x"]


def test_compact_core_bare_scalar_in_property_array_passes_through():
    out = _core(
        {"p": "http://e/p"},
        [{"@id": "http://e/x", "http://e/p": ["bare"]}],
    )
    assert out["p"] == "bare"
