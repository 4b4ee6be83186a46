"""Manifest-driven flatten conformance tests (JSON-LD 1.0 §8.1 — the
reference's README TODO, completed from its own node-map machinery)."""

import json
import os

import pytest

from jsonld_rs_spark.jsonldpy import expand, flatten

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "flatten")

with open(os.path.join(HERE, "manifest.jsonld")) as f:
    MANIFEST = json.load(f)


@pytest.mark.parametrize("case", MANIFEST["sequence"], ids=lambda c: c["@id"])
def test_flatten(case):
    with open(os.path.join(HERE, case["input"])) as f:
        doc = json.load(f)
    with open(os.path.join(HERE, case["expect"])) as f:
        expected = json.load(f)
    base = case.get("option", {}).get("base", MANIFEST["baseIri"] + case["input"])
    actual = json.loads(
        json.dumps(flatten(expand(doc, base=base)), sort_keys=True)
    )
    assert actual == expected, case["name"]
