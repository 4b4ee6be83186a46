"""Manifest-driven toRDF conformance: input JSON-LD → canonical N-Quads
(the toRDF/canonicalization analogue of the reference's expand/compact
harnesses, which the reference repo lacks — rdf.rs is untested there)."""

import json
import os

import pytest

from jsonld_rs_spark.jsonldpy import (
    DefaultNodeGenerator,
    canonical_nquads,
    expand,
    jsonld_to_rdf,
)

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "toRdf")

with open(os.path.join(HERE, "manifest.jsonld")) as f:
    MANIFEST = json.load(f)


@pytest.mark.parametrize("case", MANIFEST["sequence"], ids=lambda c: c["@id"])
def test_tordf(case):
    with open(os.path.join(HERE, case["input"])) as f:
        doc = json.load(f)
    with open(os.path.join(HERE, case["expect"])) as f:
        expected = f.read()
    base = case.get("option", {}).get("base", MANIFEST["baseIri"] + case["input"])
    actual = canonical_nquads(jsonld_to_rdf(expand(doc, base=base), DefaultNodeGenerator()))
    assert actual == expected, case["name"]


# fromRDF roundtrip lossiness classes (each a DOCUMENTED semantic, not a
# bug): cases whose RDF → JSON-LD → RDF trip cannot reproduce the exact
# canonical N-Quads. Any case NOT listed here must roundtrip bit-exact —
# running this sweep while authoring found and fixed a real divergence
# (Python's 1 == 1.0 == True collapsed distinct literals in the node-map
# dedup; serde_json keeps them distinct).
ROUNDTRIP_LOSSY = {
    # (a) duplicate identical quad lines dedup in the fromRDF node map
    "#t0008": "dup node-ref lines dedup",
    "#t0093": "dup node-ref lines dedup",
    "#tr062": "dup node-ref lines dedup",
    # (b) named graph whose label is not a default-graph subject is DROPPED
    # by fromRDF (reference quirk rdf.rs:486-509, rdf_to_jsonld docstring)
    **{
        cid: "unreferenced named-graph label drops (rdf.rs:486-509 quirk)"
        for cid in (
            "#t0019", "#t0022", "#t0031", "#t0032", "#t0033", "#t0038",
            "#t0053", "#t0054", "#t0055", "#t0059", "#t0078", "#t0080",
            "#t0081", "#t0087", "#t0096", "#t0097", "#t0105",
            # round-5/6 spec-authored graph cases whose labels carry no
            # default-graph triples
            "#tr023", "#tr024", "#tr029", "#tr031", "#tr054", "#tr059",
        )
    },
    # (c) a relative IRI re-resolves against the test base on re-expansion
    "#t0062": "relative IRI re-resolves on re-expansion",
    # (d) useNativeTypes is lossy on non-canonical lexical forms
    "#t0064": "'007'/'3' lexicals normalize through native types",
    "#t0082": "'TRUE' lexical normalizes through native boolean",
    "#tr040": "'2.50' lexical normalizes through native double",
}


@pytest.mark.parametrize("case", MANIFEST["sequence"], ids=lambda c: c["@id"])
def test_tordf_fromrdf_roundtrip(case):
    """Every manifest case goes RDF → rdf_to_jsonld → expand → RDF again;
    outside the four documented lossiness classes the canonical N-Quads
    must be bit-identical — 83/105 structures exercise the full fromRDF
    reconstruction (lists, graphs, blanks, literals) against toRDF."""
    from jsonld_rs_spark.jsonldpy import rdf_to_jsonld

    with open(os.path.join(HERE, case["input"])) as f:
        doc = json.load(f)
    base = case.get("option", {}).get("base", MANIFEST["baseIri"] + case["input"])
    dataset = jsonld_to_rdf(expand(doc, base=base), DefaultNodeGenerator())
    original = canonical_nquads(dataset)
    back = rdf_to_jsonld(dataset, use_native_types=True)
    redone = canonical_nquads(
        jsonld_to_rdf(expand(list(back.values()), base=base), DefaultNodeGenerator())
    )
    if case["@id"] in ROUNDTRIP_LOSSY:
        if redone == original:  # pragma: no cover - lossy case became exact
            pytest.fail(
                f"{case['@id']} roundtrips exactly; remove it from "
                f"ROUNDTRIP_LOSSY ({ROUNDTRIP_LOSSY[case['@id']]})"
            )
        return
    assert redone == original, case["name"]
