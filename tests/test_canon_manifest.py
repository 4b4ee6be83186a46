"""rdf-canon conformance: jsonldpy.urdna2015 vs an INDEPENDENT clean-room
spec implementation (fixture provenance: tools/canon_independent.py — see
tests/fixtures/make_canon_fixtures.py). Also asserts the work-budget
quarantine path on a poison graph and isomorphism invariance per fixture."""

import json
import os

import pytest

from jsonld_rs_spark.jsonldpy import errors as E
from jsonld_rs_spark.jsonldpy.rdf import Quad
from jsonld_rs_spark.jsonldpy.urdna2015 import canonical_nquads

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "canon")

with open(os.path.join(HERE, "manifest.json")) as f:
    MANIFEST = json.load(f)


def _dataset(quads, relabel=None):
    ds = {}
    for g, s, p, k, v, dt, lang in quads:
        if relabel:
            g, s, p = (relabel.get(t, t) for t in (g, s, p))
            if k == "id":
                v = relabel.get(v, v)
        ds.setdefault(g, []).append(Quad(s, p, k, v, dt, lang))
    return ds


@pytest.mark.parametrize("case", MANIFEST["sequence"], ids=lambda c: c["@id"])
def test_canon_matches_independent_impl(case):
    with open(os.path.join(HERE, case["expect"])) as f:
        expected = f.read()
    quads = [tuple(q) for q in case["quads"]]
    assert canonical_nquads(_dataset(quads)) == expected, case["name"]

    # isomorphism invariance: permute every blank label, same output
    blanks = sorted(
        {t for q in quads for t in (q[0], q[1], q[4] if q[3] == "id" else "")
         if t.startswith("_:")}
    )
    relabel = {b: f"_:perm{len(blanks) - i}" for i, b in enumerate(blanks)}
    assert canonical_nquads(_dataset(quads, relabel)) == expected, case["name"]


def test_poison_clique_hits_work_budget():
    n = 8
    ds = {
        "@default": [
            Quad(f"_:n{i}", "http://e/r", "id", f"_:n{j}", None, None)
            for i in range(n)
            for j in range(n)
            if i != j
        ]
    }
    with pytest.raises(E.JsonLdError) as ei:
        canonical_nquads(ds, work_budget=20_000)
    assert ei.value.code == E.CANON_TOO_COMPLEX


def test_blank_graph_label_tie_is_relabeling_invariant():
    """r6: URDNA2015's n-degree hash ties on this NON-automorphic dataset
    (the graph-association of a node's subject-quad never enters any hash
    once graph labels are blank), and the bare spec sort then let the input
    label order pick the output — two different canonical forms for one
    dataset. The content-derived tie-break must yield ONE form over every
    input relabeling."""
    import itertools

    quads = [
        ("_:ga", "_:n1", "http://e/r", "id", "_:n2", None, None),
        ("_:gb", "_:n2", "http://e/r", "id", "_:n1", None, None),
        ("@default", "_:ga", "http://e/q", "lit", "first", None, None),
        ("@default", "_:gb", "http://e/q", "lit", "second", None, None),
    ]
    blanks = ["_:ga", "_:gb", "_:n1", "_:n2"]
    outs = set()
    for perm in itertools.permutations(["_:p1", "_:p2", "_:p3", "_:p4"]):
        relabel = dict(zip(blanks, perm))
        ds = {}
        for g, s, p, k, v, dt, lang in quads:
            g2, s2 = relabel.get(g, g), relabel.get(s, s)
            v2 = relabel.get(v, v) if k == "id" else v
            ds.setdefault(g2, []).append(Quad(s2, p, k, v2, dt, lang))
        outs.add(canonical_nquads(ds))
    assert len(outs) == 1, f"{len(outs)} distinct canonical forms"


def test_three_way_graph_tie_is_relabeling_invariant():
    """Deeper exercise of the r6 tie-break: a 3-way tie (three blank-named
    graphs in a cycle) must canonicalize identically across sampled input
    relabelings."""
    import random

    quads = [
        ("_:ga", "_:n1", "http://e/r", "id", "_:n2", None, None),
        ("_:gb", "_:n2", "http://e/r", "id", "_:n3", None, None),
        ("_:gc", "_:n3", "http://e/r", "id", "_:n1", None, None),
        ("@default", "_:ga", "http://e/q", "lit", "a", None, None),
        ("@default", "_:gb", "http://e/q", "lit", "b", None, None),
        ("@default", "_:gc", "http://e/q", "lit", "c", None, None),
    ]
    blanks = ["_:ga", "_:gb", "_:gc", "_:n1", "_:n2", "_:n3"]
    rng = random.Random(11)
    outs = set()
    for _ in range(25):
        perm = rng.sample([f"_:p{i}" for i in range(6)], 6)
        relabel = dict(zip(blanks, perm))
        ds = {}
        for g, s, p, k, v, dt, lang in quads:
            g2, s2 = relabel.get(g, g), relabel.get(s, s)
            v2 = relabel.get(v, v) if k == "id" else v
            ds.setdefault(g2, []).append(Quad(s2, p, k, v2, dt, lang))
        outs.add(canonical_nquads(ds))
    assert len(outs) == 1
