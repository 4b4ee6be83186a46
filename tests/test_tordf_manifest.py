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
