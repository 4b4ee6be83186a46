"""Manifest-driven expand conformance tests.

Mirrors the reference harness (/root/reference/src/bin/test_expand.rs:61-124)
— manifest format, base-IRI rule `option.base else manifest.baseIri + input`,
skip of json-ld-1.1 processingMode — but *asserts* instead of printing, and
additionally runs NegativeEvaluationTest entries (the reference skips them).
"""

import json
import os

import pytest

from jsonld_rs_spark.jsonldpy import expand
from jsonld_rs_spark.jsonldpy import errors as E

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "expand")


def _load_manifest():
    with open(os.path.join(HERE, "manifest.jsonld")) as f:
        return json.load(f)


MANIFEST = _load_manifest()
POSITIVE = [
    t
    for t in MANIFEST["sequence"]
    if "jld:PositiveEvaluationTest" in t["@type"]
    and t.get("option", {}).get("processingMode") != "json-ld-1.1"
]
NEGATIVE = [t for t in MANIFEST["sequence"] if "jld:NegativeEvaluationTest" in t["@type"]]


def _read(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("case", POSITIVE, ids=lambda c: c["@id"])
def test_expand_positive(case):
    doc = _read(case["input"])
    option = case.get("option", {})
    base = option.get("base", MANIFEST["baseIri"] + case["input"])
    actual = expand(doc, base=base, expand_context=option.get("expandContext"))
    expected = _read(case["expect"])
    assert actual == expected, case["name"]


@pytest.mark.parametrize("case", NEGATIVE, ids=lambda c: c["@id"])
def test_expand_negative(case):
    doc = _read(case["input"])
    option = case.get("option", {})
    base = option.get("base", MANIFEST["baseIri"] + case["input"])
    with pytest.raises(E.JsonLdError) as exc:
        expand(doc, base=base, expand_context=option.get("expandContext"))
    assert exc.value.code == case["expectErrorCode"], case["name"]


def test_cyclic_iri_mapping_guard_code():
    """The re-entrancy guard in create_term carries the reference's
    CyclicIRIMapping code. Unreachable through expand() (the defined-map
    guard in expand_iri_mut resolves mutual recursion to invalid_iri_mapping
    first — te006/te034), so assert the guard directly."""
    from jsonld_rs_spark.jsonldpy.context import _DEFINING, Context

    ctx = Context()
    with pytest.raises(E.TermCreationError) as ei:
        ctx.create_term({"t": "http://e/t"}, "t", "http://e/t", {"t": _DEFINING})
    assert ei.value.code == E.CYCLIC_IRI_MAPPING
