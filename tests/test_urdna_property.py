"""Property-based URDNA2015 tests: canonical labels must be invariant under
any permutation of input blank-node labels and any quad order — the exact
property the distributed pipeline relies on for cross-partition stability."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonld_rs_spark.jsonldpy import Quad, canonical_nquads
from jsonld_rs_spark.jsonldpy.rdf import XSD_STRING


def _random_dataset(rng: random.Random, n_nodes: int, n_edges: int, n_literals: int):
    nodes = []
    for i in range(n_nodes):
        # mix of blanks and IRIs
        if rng.random() < 0.6:
            nodes.append(f"_:n{i}")
        else:
            nodes.append(f"http://x.example/n{i}")
    preds = [f"http://p.example/p{i}" for i in range(3)]
    quads = []
    for _ in range(n_edges):
        s = rng.choice(nodes)
        o = rng.choice(nodes)
        if s.startswith("_:") or True:
            quads.append(Quad(s, rng.choice(preds), "id", o))
    for _ in range(n_literals):
        s = rng.choice(nodes)
        quads.append(
            Quad(s, rng.choice(preds), "literal", f"v{rng.randint(0, 4)}", XSD_STRING)
        )
    return quads


def _relabel(quads, mapping):
    def m(t):
        return mapping.get(t, t)

    return [
        Quad(
            m(q.subj),
            q.pred,
            q.obj_kind,
            m(q.obj_value) if q.obj_kind == "id" else q.obj_value,
            q.obj_datatype,
            q.obj_lang,
        )
        for q in quads
    ]


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_canonicalization_invariant_under_relabeling_and_order(seed):
    rng = random.Random(seed)
    quads = _random_dataset(rng, n_nodes=rng.randint(2, 8), n_edges=rng.randint(1, 14), n_literals=rng.randint(0, 4))

    blanks = sorted({t for q in quads for t in (q.subj, q.obj_value if q.obj_kind == "id" else None) if t and t.startswith("_:")})
    permuted = list(blanks)
    rng.shuffle(permuted)
    mapping = {b: f"_:renamed{i}_{p[2:]}" for i, (b, p) in enumerate(zip(blanks, permuted))}

    shuffled = _relabel(quads, mapping)
    rng.shuffle(shuffled)

    a = canonical_nquads({"@default": quads})
    b = canonical_nquads({"@default": shuffled})
    assert a == b


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_canonicalization_distinguishes_non_isomorphic(seed):
    rng = random.Random(seed)
    quads = _random_dataset(rng, 5, 8, 2)
    a = canonical_nquads({"@default": quads})
    # add one extra statement → different dataset → different canonical form
    extra = Quad("_:zzz", "http://p.example/extra", "literal", "unique-extra", XSD_STRING)
    b = canonical_nquads({"@default": quads + [extra]})
    assert a != b
    assert "unique-extra" in b and "unique-extra" not in a


def test_blank_predicate_labels_content_derived():
    """Generalized quads: canonical labels of NODE bnodes must not depend on
    the input label of a blank PREDICATE (ADVICE r1 — off-spec substitution
    of the predicate position in first-degree hashes)."""
    from jsonld_rs_spark.jsonldpy.rdf import Quad
    from jsonld_rs_spark.jsonldpy.urdna2015 import canonical_labels

    def labels(predlabel):
        quads = [
            ("@default", Quad("_:x", predlabel, "id", "_:y", None, None)),
            ("@default", Quad("_:y", "http://e/p", "lit", "1", None, None)),
            ("@default", Quad("_:x", "http://e/q", "lit", "2", None, None)),
        ]
        m = canonical_labels(quads)
        return (m["_:x"], m["_:y"])

    assert labels("_:p0") == labels("_:zzz9")


def test_blank_predicate_marker_in_n_degree_hashes():
    """Blank predicates must contribute a fixed marker (not their raw label)
    to hash-related / n-degree paths too: renaming a predicate-only blank
    label may not change any NODE's canonical label."""
    from jsonld_rs_spark.jsonldpy.rdf import Quad
    from jsonld_rs_spark.jsonldpy.urdna2015 import canonical_labels

    def labels(bp):
        quads = [
            ("@default", Quad("_:x", "http://e/r", "id", "_:y", None, None)),
            ("@default", Quad("_:y", "http://e/r", "id", "_:x", None, None)),
            ("@default", Quad("_:x", bp, "id", "_:z", None, None)),
            ("@default", Quad("_:y", bp, "id", "_:w", None, None)),
            ("@default", Quad("_:z", "http://e/v", "lit", "a", None, None)),
            ("@default", Quad("_:w", "http://e/v", "lit", "b", None, None)),
        ]
        m = canonical_labels(quads)
        return {k: m[k] for k in ("_:x", "_:y", "_:z", "_:w")}

    assert labels("_:bp1") == labels("_:completely9different")


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_canonicalization_invariant_with_blank_graph_labels(seed):
    """r6: the single-graph property above could never find the
    blank-graph-label tie instability (fixture c0044) because its generator
    only emitted @default quads. This generator places edges and literals
    across blank- and IRI-named graphs (graph labels may double as nodes),
    and asserts the same invariance: any input relabeling + any quad order
    → byte-identical canonical N-Quads."""
    rng = random.Random(seed)
    n_nodes = rng.randint(2, 6)
    nodes = [
        f"_:n{i}" if rng.random() < 0.7 else f"http://x.example/n{i}"
        for i in range(n_nodes)
    ]
    graphs = ["@default"]
    for i in range(rng.randint(1, 3)):
        r = rng.random()
        if r < 0.5:
            graphs.append(f"_:g{i}")
        elif r < 0.75:
            graphs.append(f"http://g.example/g{i}")
        else:
            graphs.append(rng.choice([n for n in nodes if n.startswith("_:")] or [f"_:g{i}"]))
    preds = [f"http://p.example/p{i}" for i in range(2)]
    gquads = []
    for _ in range(rng.randint(1, 10)):
        gquads.append(
            (rng.choice(graphs),
             Quad(rng.choice(nodes), rng.choice(preds), "id", rng.choice(nodes)))
        )
    for _ in range(rng.randint(0, 3)):
        subj = rng.choice(nodes + [g for g in graphs if g.startswith("_:")])
        gquads.append(
            (rng.choice(graphs),
             Quad(subj, rng.choice(preds), "literal", f"v{rng.randint(0, 3)}",
                  XSD_STRING))
        )

    blanks = sorted({
        t
        for g, q in gquads
        for t in (g, q.subj, q.obj_value if q.obj_kind == "id" else None)
        if t and t.startswith("_:")
    })
    permuted = list(blanks)
    rng.shuffle(permuted)
    mapping = {b: f"_:rn{i}_{p[2:]}" for i, (b, p) in enumerate(zip(blanks, permuted))}

    def build(quads, relabel):
        ds = {}
        for g, q in quads:
            g2 = relabel.get(g, g)
            ds.setdefault(g2, []).append(
                Quad(
                    relabel.get(q.subj, q.subj),
                    q.pred,
                    q.obj_kind,
                    relabel.get(q.obj_value, q.obj_value)
                    if q.obj_kind == "id" else q.obj_value,
                    q.obj_datatype,
                    q.obj_lang,
                )
            )
        return ds

    shuffled = list(gquads)
    rng.shuffle(shuffled)
    a = canonical_nquads(build(gquads, {}))
    b = canonical_nquads(build(shuffled, mapping))
    assert a == b


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 100_000))
def test_chained_collision_gadgets_invariance(seed):
    """r7: targeted probe of the _tie_key residual ADVICE r6 flagged as
    accepted risk (urdna2015.py:_tie_key docstring) — two c0044-style
    blank-graph collision gadgets CHAINED by cross-links, so one pair's
    candidates differ only through their connection to the OTHER pair.
    If the _:z collapse could really make non-automorphic candidates
    serialize identically, this composition is the shape that triggers it
    and the canonical form would depend on input label order. It cannot:
    hash_n_degree temp-issues every related non-canonical blank (and
    recurses transitively), so a candidate's issuance order spans its
    entire weakly-connected blank component — _:z only ever stands for
    blanks in OTHER components, and a full-label serialization over a
    whole component is a complete isomorphism invariant. This sweep
    asserts byte-identical canonical N-Quads across random relabelings
    and quad orders of the chained gadgets, with and without
    distinguishing literals on the second pair's graph labels."""
    rng = random.Random(seed)
    R = "http://p.example/r"
    L = "http://p.example/l"
    Q2 = "http://p.example/q"
    gquads = [
        # gadget 1: (n1, n2) tied through blank graph labels ga/gb
        ("_:ga", Quad("_:n1", R, "id", "_:n2")),
        ("_:gb", Quad("_:n2", R, "id", "_:n1")),
        # gadget 2: (m1, m2) tied through gc/gd
        ("_:gc", Quad("_:m1", R, "id", "_:m2")),
        ("_:gd", Quad("_:m2", R, "id", "_:m1")),
        # cross-links: n-pair's difference lives in the m-pair connection
        ("@default", Quad("_:n1", L, "id", "_:m1")),
        ("@default", Quad("_:n2", L, "id", "_:m2")),
    ]
    if rng.random() < 0.5:
        # distinguishing literals on gc/gd make (m1, m2) genuinely
        # non-automorphic — the adversarial variant from the analysis
        gquads.append(("@default", Quad("_:gc", Q2, "literal", "x", XSD_STRING)))
        gquads.append(("@default", Quad("_:gd", Q2, "literal", "y", XSD_STRING)))
    if rng.random() < 0.3:
        # anchor one n-side too: fully rigid dataset
        gquads.append(("@default", Quad("_:ga", Q2, "literal", "a", XSD_STRING)))

    blanks = sorted({
        t
        for g, q in gquads
        for t in (g, q.subj, q.obj_value if q.obj_kind == "id" else None)
        if t and t.startswith("_:")
    })
    permuted = list(blanks)
    rng.shuffle(permuted)
    mapping = {b: f"_:w{i}_{p[2:]}" for i, (b, p) in enumerate(zip(blanks, permuted))}

    def build(quads, relabel):
        ds = {}
        for g, q in quads:
            ds.setdefault(relabel.get(g, g), []).append(
                Quad(
                    relabel.get(q.subj, q.subj),
                    q.pred,
                    q.obj_kind,
                    relabel.get(q.obj_value, q.obj_value)
                    if q.obj_kind == "id" else q.obj_value,
                    q.obj_datatype,
                    q.obj_lang,
                )
            )
        return ds

    shuffled = list(gquads)
    rng.shuffle(shuffled)
    assert canonical_nquads(build(gquads, {})) == canonical_nquads(
        build(shuffled, mapping)
    )
