"""Flattening tests (the reference's TODO, completed per JSON-LD 1.0 §8.1)."""

from jsonld_rs_spark.jsonldpy import DefaultNodeGenerator, expand, flatten


def test_flatten_nests_to_top_level():
    doc = {
        "@context": {"@vocab": "http://e/"},
        "@id": "http://e/a",
        "p": {"@id": "http://e/b", "q": "deep"},
    }
    flat = flatten(expand(doc))
    by_id = {n["@id"]: n for n in flat}
    assert set(by_id) == {"http://e/a", "http://e/b"}
    assert by_id["http://e/a"]["http://e/p"] == [{"@id": "http://e/b"}]
    assert by_id["http://e/b"]["http://e/q"] == [{"@value": "deep"}]


def test_flatten_mints_blank_ids_sequentially():
    doc = {
        "@id": "http://e/a",
        "http://e/p": [{"http://e/q": [{"@value": "x"}]}],
    }
    flat = flatten(expand(doc))
    by_id = {n["@id"]: n for n in flat}
    assert "_:b0" in by_id
    assert by_id["http://e/a"]["http://e/p"] == [{"@id": "_:b0"}]


def test_flatten_named_graphs_under_defining_node():
    doc = {
        "@id": "http://e/g",
        "http://e/meta": [{"@value": "m"}],
        "@graph": [{"@id": "http://e/inner", "http://e/p": [{"@value": "v"}]}],
    }
    flat = flatten(expand(doc))
    by_id = {n["@id"]: n for n in flat}
    g = by_id["http://e/g"]
    assert g["http://e/meta"] == [{"@value": "m"}]
    assert g["@graph"] == [
        {"@id": "http://e/inner", "http://e/p": [{"@value": "v"}]}
    ]


def test_flatten_elides_id_only_nodes():
    doc = {
        "@id": "http://e/a",
        "http://e/p": [{"@id": "http://e/ref-only"}],
    }
    flat = flatten(expand(doc))
    ids = {n["@id"] for n in flat}
    assert ids == {"http://e/a"}


def test_flatten_lists_and_types():
    doc = {
        "@id": "http://e/a",
        "@type": ["http://e/T"],
        "http://e/l": [{"@list": [{"@value": 1}, {"@id": "http://e/b"}]}],
    }
    flat = flatten(expand(doc))
    by_id = {n["@id"]: n for n in flat}
    a = by_id["http://e/a"]
    assert a["@type"] == ["http://e/T"]
    assert a["http://e/l"] == [
        {"@list": [{"@value": 1}, {"@id": "http://e/b"}]}
    ]


def test_nodemap_error_codes_on_malformed_expanded_input():
    """The remaining nodemap error variants (reference nodemap.rs:13-34) are
    unreachable through expand() (it rejects these shapes earlier with its
    own codes) but generate_node_map is public API for pre-expanded input —
    each must classify, never crash bare."""
    import pytest as _pytest

    from jsonld_rs_spark.jsonldpy import errors as E
    from jsonld_rs_spark.jsonldpy.nodemap import DefaultNodeGenerator, generate_node_map

    def run(doc):
        generate_node_map(doc, DefaultNodeGenerator())

    with _pytest.raises(E.NodeMapError) as ei:
        run([{"@id": "http://e/x", "http://e/p": [{"@value": "v", "@language": 5}]}])
    assert ei.value.code == E.EXPECTED_STRING

    with _pytest.raises(E.NodeMapError) as ei:
        run(["bare scalar at nodemap level"])
    assert ei.value.code == E.INVALID_OBJECT

    with _pytest.raises(E.NodeMapError) as ei:
        run([{"@value": "free-floating value"}])
    assert ei.value.code == E.INVALID_OBJECT

    with _pytest.raises(E.NodeMapError) as ei:
        run([{"@list": [{"@value": "x"}]}])
    assert ei.value.code == E.INVALID_OBJECT

    with _pytest.raises(E.NodeMapError) as ei:
        run([{"@id": "http://e/x", "@type": [5]}])
    assert ei.value.code == E.INVALID_TYPE_VALUE
