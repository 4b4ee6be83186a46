"""Hand derivation of the c0044 collision fixture, from first principles.

ADVICE r6: the engine (jsonldpy/urdna2015.py) and the clean-room twin
(tools/canon_independent.py) share the same *documented* tie-break rule, so
the twin-generated c0044-out.nq cannot catch a bug in that shared rule.
This module re-derives the expected canonical form a THIRD way: every spec
step is written longhand inline (fresh serialization, explicit sha256
calls per URDNA2015 / RDFC-1.0 "Hash First Degree Quads"), and the
tie-break resolution is spelled out as an explicit two-candidate
comparison computed from the dataset's content — no code shared with
either implementation. Only the *existence* of the n-degree tie is
observed via the engine (the tie is URDNA2015's own behavior, not the
disputed rule; deriving the full permutation recursion longhand would be a
fourth implementation with no added independence for the resolution step).

Dataset (tests/fixtures/make_canon_fixtures.py c0044):

    _:n1 <http://e/r> _:n2 _:ga .
    _:n2 <http://e/r> _:n1 _:gb .
    _:ga <http://e/q> "first" .
    _:gb <http://e/q> "second" .

Why it ties: hash_related for position 'g' carries only the related
graph's label, and the association "whose subject-quad lives in which
graph" never enters any first- or n-degree hash — so n1 and n2 get equal
n-degree hashes even though they are NOT interchangeable (n1 is the
subject inside the "first"-annotated graph, n2 inside "second").
"""

import hashlib
import os

from jsonld_rs_spark.jsonldpy.rdf import Quad
from jsonld_rs_spark.jsonldpy.urdna2015 import (
    IdentifierIssuer,
    _Canonicalizer,
    canonical_nquads,
)

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "canon")

R, Q = "http://e/r", "http://e/q"

# (graph, subject, predicate, object) — object "..." means a plain literal.
QUADS = [
    ("_:ga", "_:n1", R, "_:n2"),
    ("_:gb", "_:n2", R, "_:n1"),
    ("@default", "_:ga", Q, '"first"'),
    ("@default", "_:gb", Q, '"second"'),
]


def _line(g, s, p, o, subst):
    """Canonical N-Quads line, blanks substituted — written fresh here."""
    sub = lambda t: subst.get(t, t) if t.startswith("_:") else f"<{t}>"
    obj = o if o.startswith('"') else sub(o)
    graph = "" if g == "@default" else f" {sub(g)}"
    return f"{sub(s)} <{p}> {obj}{graph} .\n"


def _first_degree(ref):
    """URDNA2015 4.6 Hash First Degree Quads, longhand: serialize every
    quad mentioning `ref` with ref->_:a and every other blank ->_:z, sort,
    sha256 the concatenation."""
    lines = []
    for g, s, p, o in QUADS:
        if ref not in (g, s, o):
            continue
        subst = {
            t: ("_:a" if t == ref else "_:z")
            for t in (g, s, o)
            if t.startswith("_:")
        }
        lines.append(_line(g, s, p, o, subst))
    return hashlib.sha256("".join(sorted(lines)).encode()).hexdigest()


def test_c0044_hand_derivation_matches_fixture():
    # --- Step 1: first-degree hashes --------------------------------- #
    h = {b: _first_degree(b) for b in ("_:ga", "_:gb", "_:n1", "_:n2")}
    # ga/gb are split by their literals; n1/n2 serialize identically
    # (_:a <r> _:z _:z in one graph, _:z <r> _:a _:z in the other).
    assert h["_:ga"] != h["_:gb"]
    assert h["_:n1"] == h["_:n2"]

    # --- Step 2: canonical issuance of the unique-hash nodes --------- #
    # The main loop issues c14n labels to unique-hash bnodes in code-point
    # hash order; the n1/n2 pair is deferred to the n-degree phase.
    first, second = sorted(("_:ga", "_:gb"), key=lambda b: h[b])
    labels = {first: "_:c14n0", second: "_:c14n1"}

    # --- Step 3: the n-degree tie (observed, not derived) ------------ #
    ds = {}
    for g, s, p, o in QUADS:
        kind, val = ("lit", o.strip('"')) if o.startswith('"') else ("id", o)
        ds.setdefault(g, []).append(Quad(s, p, kind, val, None, None))
    canon = _Canonicalizer(
        [(g, q) for g, qs in ds.items() for q in qs], 1_000_000
    )
    for b in (first, second):
        canon.canonical.issue(b)
    nd = {}
    for b in ("_:n1", "_:n2"):
        issuer = IdentifierIssuer("_:b")
        issuer.issue(b)
        nd[b], _ = canon.hash_n_degree(b, issuer)
    assert nd["_:n1"] == nd["_:n2"], (
        "URDNA2015's n-degree hash is expected to tie on this "
        "non-automorphic pair (the r6 finding); if this no longer ties, "
        "the tie-break is dead code and this derivation needs a rework"
    )

    # --- Step 4: the documented tie-break, longhand ------------------ #
    # Rule (urdna2015.py run()): on equal n-degree hashes, order the
    # candidates by the sorted tuple of N-Quads lines each candidate's
    # issuance order WOULD produce, labels drawn from the canonical
    # issuer's current counter (next: c14n2). Candidate A issues n1 first,
    # candidate B issues n2 first.
    def candidate_lines(order):
        cmap = dict(labels)
        for i, b in enumerate(order):
            cmap[b] = f"_:c14n{2 + i}"
        return tuple(
            sorted(
                _line(g, s, p, o, cmap)
                for g, s, p, o in QUADS
                if "_:n1" in (g, s, o) or "_:n2" in (g, s, o)
            )
        )

    cand_a = candidate_lines(["_:n1", "_:n2"])
    cand_b = candidate_lines(["_:n2", "_:n1"])
    # The two candidates genuinely differ (non-automorphic pair) — this is
    # exactly the discrimination the bare spec sort lacks.
    assert cand_a != cand_b
    winner = ["_:n1", "_:n2"] if cand_a < cand_b else ["_:n2", "_:n1"]
    for i, b in enumerate(winner):
        labels[b] = f"_:c14n{2 + i}"

    # --- Step 5: assemble the canonical document --------------------- #
    expected = "".join(sorted(_line(g, s, p, o, labels) for g, s, p, o in QUADS))

    with open(os.path.join(HERE, "c0044-out.nq")) as f:
        fixture = f.read()
    assert expected == fixture, (
        "hand derivation disagrees with the twin-generated fixture — "
        "the shared tie-break rule has a transcription bug"
    )
    # And the engine agrees end-to-end.
    assert canonical_nquads(ds) == expected

    # --- Step 6: the content claim, concretely ------------------------ #
    # Whichever graph got c14n0, ITS subject node must be c14n2: the
    # winning candidate is the one whose c14n2-line names the smaller
    # graph label. (This is the semantic content of the tie-break.)
    g0 = first  # graph labeled c14n0
    subj_in_g0 = {"_:ga": "_:n1", "_:gb": "_:n2"}[g0]
    assert labels[subj_in_g0] == "_:c14n2"
