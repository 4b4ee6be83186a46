"""toRDF + node-map + URDNA2015 unit tests.

Covers the branch behaviors cited in SURVEY.md §2.1 rows 26-31: literal
typing (rdf.rs:44-73), list cons chains (rdf.rs:75-120), value dedup vs node
ref non-dedup (nodemap.rs:384-387, 460), named graphs (nodemap.rs:554-569),
plus URDNA2015 label stability and the round-trip through fromRDF.
"""

import math

import pytest

from jsonld_rs_spark.jsonldpy import (
    DefaultNodeGenerator,
    Quad,
    canonical_nquads,
    canonicalize_dataset,
    expand,
    format_double,
    jsonld_to_rdf,
    rdf_to_jsonld,
)
from jsonld_rs_spark.jsonldpy import errors as E
from jsonld_rs_spark.jsonldpy.rdf import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    serialize_list,
)
from jsonld_rs_spark.jsonldpy.nodemap import PValue
from jsonld_rs_spark.jsonldpy.urdna2015 import canonical_labels


def _rdf(doc, base="https://t.example/"):
    return jsonld_to_rdf(expand(doc, base=base), DefaultNodeGenerator())


def test_literal_typing():
    doc = {
        "@id": "http://x.example/s",
        "http://x.example/str": "plain",
        "http://x.example/int": 7,
        "http://x.example/dbl": 2.5,
        "http://x.example/bool": False,
    }
    quads = {(q.pred, q.obj_value, q.obj_datatype) for q in _rdf(doc)["@default"]}
    assert ("http://x.example/str", "plain", XSD_STRING) in quads
    assert ("http://x.example/int", "7", XSD_INTEGER) in quads
    assert ("http://x.example/dbl", "2.5", XSD_DOUBLE) in quads
    assert ("http://x.example/bool", "false", XSD_BOOLEAN) in quads


def test_format_double_ryu_parity():
    # Rust ryu (serde_json Number::to_string) spellings
    assert format_double(2.5) == "2.5"
    assert format_double(9.5) == "9.5"
    assert format_double(1e100) == "1e100"
    assert format_double(1.5e-7) == "1.5e-7"
    assert format_double(0.1) == "0.1"
    assert format_double(-3.25) == "-3.25"
    with pytest.raises(ValueError):
        format_double(math.inf)


def test_list_cons_chain():
    doc = {
        "@id": "http://x.example/s",
        "http://x.example/l": {"@list": ["a", "b"]},
    }
    quads = _rdf(doc)["@default"]
    firsts = [q for q in quads if q.pred == RDF_FIRST]
    rests = [q for q in quads if q.pred == RDF_REST]
    assert [q.obj_value for q in firsts] == ["a", "b"]
    assert rests[-1].obj_value == RDF_NIL
    head = [q for q in quads if q.pred == "http://x.example/l"][0]
    assert head.obj_kind == "id" and head.obj_value.startswith("_:")


def test_empty_list_quirk_flag():
    quads = []
    gen = DefaultNodeGenerator()
    assert serialize_list([], quads, gen, compat_empty_list_nil=True) == ("id", "rdf:nil")
    assert serialize_list([], quads, gen, compat_empty_list_nil=False) == ("id", RDF_NIL)


def test_value_dedup_but_not_node_refs():
    doc = {
        "@id": "http://x.example/s",
        "http://x.example/v": ["same", "same"],
        "http://x.example/r": [
            {"@id": "http://x.example/o"},
            {"@id": "http://x.example/o"},
        ],
    }
    quads = _rdf(doc)["@default"]
    assert len([q for q in quads if q.pred == "http://x.example/v"]) == 1  # deduped
    assert len([q for q in quads if q.pred == "http://x.example/r"]) == 2  # NOT deduped


def test_value_dedup_distinguishes_json_types():
    # serde_json Number(1) != Number(1.0) and Bool(true) != Number(1)
    assert PValue(1) != PValue(1.0)
    assert PValue(True) != PValue(1)
    assert PValue("1") != PValue(1)
    assert PValue(1) == PValue(1)


def test_named_graph_emission():
    doc = {
        "@id": "http://x.example/g1",
        "@graph": [{"@id": "http://x.example/a", "http://x.example/p": "v"}],
        "http://x.example/meta": "m",
    }
    ds = _rdf(doc)
    assert set(ds.keys()) == {"@default", "http://x.example/g1"}
    assert ds["http://x.example/g1"][0].subj == "http://x.example/a"
    assert ds["@default"][0].pred == "http://x.example/meta"


def test_type_triples_from_entity_types():
    doc = {"@id": "http://x.example/s", "@type": ["http://x.example/T", "http://x.example/T"]}
    quads = _rdf(doc)["@default"]
    assert len(quads) == 1  # types deduped
    assert quads[0].pred == RDF_TYPE


def test_blank_node_relabeling_memoized():
    doc = {
        "@id": "_:a",
        "http://x.example/p": [{"@id": "_:b"}, {"@id": "_:a"}],
    }
    quads = _rdf(doc)["@default"]
    subj = quads[0].subj
    objs = {q.obj_value for q in quads}
    assert subj in objs  # _:a self-reference resolves to the same minted label


def test_urdna_stable_under_input_label_permutation():
    doc1 = {"@id": "_:x", "http://p.example/knows": {"@id": "_:y"}}
    doc2 = {"@id": "_:y", "http://p.example/knows": {"@id": "_:x"}}
    n1 = canonical_nquads(_rdf(doc1))
    n2 = canonical_nquads(_rdf(doc2))
    assert n1 == n2  # isomorphic graphs canonicalize identically


def test_urdna_symmetric_cycle_needs_ndegree():
    # Two blanks in a symmetric cycle share first-degree hashes; the
    # n-degree pass must still assign stable distinct labels.
    ds = {
        "@default": [
            Quad("_:a", "http://p.example/r", "id", "_:b"),
            Quad("_:b", "http://p.example/r", "id", "_:a"),
            Quad("_:a", "http://p.example/name", "literal", "A", XSD_STRING),
        ]
    }
    labels = canonical_labels([("@default", q) for q in ds["@default"]])
    assert set(labels.values()) == {"_:c14n0", "_:c14n1"}
    # deterministic across runs
    assert labels == canonical_labels([("@default", q) for q in ds["@default"]])


def test_urdna_poison_budget():
    # A dense fully-symmetric blank clique forces permutation search; a tiny
    # budget must raise instead of hanging.
    quads = []
    n = 6
    for i in range(n):
        for j in range(n):
            if i != j:
                quads.append(("@default", Quad(f"_:n{i}", "http://p.example/e", "id", f"_:n{j}")))
    with pytest.raises(E.CanonicalizationError):
        canonical_labels(quads, work_budget=50)


def test_fromrdf_roundtrip_basic():
    doc = {
        "@id": "http://x.example/s",
        "@type": "http://x.example/T",
        "http://x.example/p": [{"@value": 5}, {"@value": "s"}],
        "http://x.example/l": {"@list": ["a", "b"]},
        "http://x.example/langed": {"@value": "hallo", "@language": "de"},
    }
    ds = _rdf(doc)
    back = rdf_to_jsonld(ds, use_native_types=True)
    node = back["http://x.example/s"]
    assert node["@type"] == ["http://x.example/T"]
    values = {v.get("@value") for v in node["http://x.example/p"]}
    assert values == {5, "s"}
    listed = node["http://x.example/l"][0]["@list"]
    assert [v["@value"] for v in listed] == ["a", "b"]
    lang = node["http://x.example/langed"][0]
    assert lang == {"@value": "hallo", "@language": "de"}


def test_canonicalize_dataset_renames_graph_labels():
    ds = {
        "_:g": [Quad("_:s", "http://p.example/p", "literal", "v", XSD_STRING)],
    }
    canon = canonicalize_dataset(ds)
    (graph_name,) = canon.keys()
    assert graph_name.startswith("_:c14n")
    assert canon[graph_name][0].subj.startswith("_:c14n")


def test_fromrdf_nested_list():
    # list-in-list: outer list's single item is itself a list ['a', 'b']
    P = "http://e/p"
    quads = [
        Quad("http://e/x", P, "id", "_:outer"),
        Quad("_:outer", RDF_FIRST, "id", "_:i0"),
        Quad("_:outer", RDF_REST, "id", RDF_NIL),
        Quad("_:i0", RDF_FIRST, "literal", "a", XSD_STRING),
        Quad("_:i0", RDF_REST, "id", "_:i1"),
        Quad("_:i1", RDF_FIRST, "literal", "b", XSD_STRING),
        Quad("_:i1", RDF_REST, "id", RDF_NIL),
    ]
    out = rdf_to_jsonld({"@default": quads}, use_native_types=True)
    outer = out["http://e/x"][P][0]["@list"]
    assert len(outer) == 1
    inner = outer[0]["@list"]
    assert [v["@value"] for v in inner] == ["a", "b"]


def test_conflicting_index_values_error():
    doc = [
        {"@id": "http://e/x", "@index": "a", "http://e/p": [{"@value": 1}]},
        {"@id": "http://e/x", "@index": "b", "http://e/p": [{"@value": 2}]},
    ]
    from jsonld_rs_spark.jsonldpy.nodemap import generate_node_map

    with pytest.raises(E.NodeMapError) as exc:
        generate_node_map(doc, DefaultNodeGenerator())
    assert exc.value.code == E.CONFLICTING_INDEX_VALUES


def test_property_nested_named_graph():
    doc = {
        "@id": "http://e/root",
        "http://e/describes": {
            "@id": "http://e/g1",
            "@graph": [{"@id": "http://e/a", "http://e/p": "v"}],
        },
    }
    ds = _rdf(doc)
    assert ds["@default"][0].pred == "http://e/describes"
    assert [q.subj for q in ds["http://e/g1"]] == ["http://e/a"]
