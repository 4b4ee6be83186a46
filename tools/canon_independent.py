"""Independent clean-room URDNA2015, used ONLY to generate/cross-check the
rdf-canon fixture expectations (tests/fixtures/canon).

Deliberately written as a separate, direct transcription of the public W3C
RDF Dataset Canonicalization spec's pseudocode — different data model and
code structure from jsonld_rs_spark.jsonldpy.urdna2015, so a bug shared by
the engine and its fixtures would have to be made twice independently
(ADVICE r1: fixture outputs must not certify the implementation with
itself). No work budget, no caching, no fast paths: clarity over speed.

Quads here are 4-tuples of N-Quads TOKENS:
    (subject, predicate, object, graph_or_None)
e.g. ("_:e0", "<http://e/p>", '"v"@en', None). Blank nodes are any token
starting with "_:".
"""

from __future__ import annotations

import hashlib
from itertools import permutations


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _serialize(quad, subst):
    """Canonical N-Quads line (newline-terminated) with blank substitution."""
    parts = []
    for tok in quad[:3]:
        parts.append(subst.get(tok, tok) if tok.startswith("_:") else tok)
    if quad[3] is not None:
        g = quad[3]
        parts.append(subst.get(g, g) if g.startswith("_:") else g)
    return " ".join(parts) + " .\n"


class _Issuer:
    def __init__(self, prefix):
        self.prefix = prefix
        self.n = 0
        self.map = {}
        self.order = []

    def issue(self, ident):
        if ident not in self.map:
            self.map[ident] = self.prefix + str(self.n)
            self.n += 1
            self.order.append(ident)
        return self.map[ident]

    def clone(self):
        c = _Issuer(self.prefix)
        c.n = self.n
        c.map = dict(self.map)
        c.order = list(self.order)
        return c


def _bnodes_of(quad):
    out = []
    for pos, tok in zip(("s", "p", "o", "g"), quad):
        if tok is not None and tok.startswith("_:"):
            out.append((pos, tok))
    return out


def hash_first_degree(state, ident):
    nquads = []
    for quad in state["b2q"][ident]:
        subst = {}
        for pos, tok in _bnodes_of(quad):
            subst[tok] = "_:a" if tok == ident else "_:z"
        nquads.append(_serialize(quad, subst))
    nquads.sort()
    return _sha256("".join(nquads))


def hash_related(state, related, quad, issuer, position):
    data = position
    if position != "g":
        # blank predicates: fixed marker, mirroring the engine's off-spec
        # generalized-RDF rule (urdna2015.hash_related)
        data += "_:p" if quad[1].startswith("_:") else quad[1]
    if related in state["canon"].map:
        data += state["canon"].map[related]
    elif related in issuer.map:
        data += issuer.map[related]
    else:
        data += hash_first_degree(state, related)
    return _sha256(data)


def hash_n_degree(state, ident, issuer):
    hn = {}
    for quad in state["b2q"][ident]:
        for pos, tok in _bnodes_of(quad):
            if pos == "p" or tok == ident:
                continue
            hn.setdefault(hash_related(state, tok, quad, issuer, pos), []).append(tok)
    data = ""
    for rh in sorted(hn):
        data += rh
        chosen_path = ""
        chosen_issuer = None
        for perm in permutations(hn[rh]):
            issuer_copy = issuer.clone()
            path = ""
            recursion = []
            skip = False
            for related in perm:
                if related in state["canon"].map:
                    path += state["canon"].map[related]
                else:
                    if related not in issuer_copy.map:
                        recursion.append(related)
                    path += issuer_copy.issue(related)
                if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            for related in recursion:
                result_hash, result_issuer = hash_n_degree(state, related, issuer_copy)
                path += issuer_copy.issue(related)
                path += "<" + result_hash + ">"
                issuer_copy = result_issuer
                if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            if not chosen_path or path < chosen_path:
                chosen_path = path
                chosen_issuer = issuer_copy
        data += chosen_path
        issuer = chosen_issuer if chosen_issuer is not None else issuer
    return _sha256(data), issuer


def _tie_key(state, result_issuer):
    """Serialize the quads touching this result's nodes under the labels its
    issuance order WOULD produce (hypothetical counter = current canonical
    state, identical for every candidate of a tie group); already-canonical
    labels kept, other blanks collapsed to _:z.

    INDEPENDENCE CAVEAT (ADVICE r6): this tie-break mirrors the engine's
    beyond-spec rule, so for the collision fixtures (c0044/c0046/c0047)
    this twin does NOT independently validate the rule — a shared bug in
    the rule itself would be invisible here. The independent check for
    those fixtures is tests/test_canon_derivation.py, which re-derives
    c0044's expected bytes longhand from spec steps + the documented rule
    with no shared code. Everything spec-covered (distinct hashes,
    genuine automorphism) IS independently validated by this twin."""
    hypo = state["canon"].clone()
    bmap = {b: hypo.issue(b) for b in result_issuer.order}
    bmap.update(state["canon"].map)
    lines = set()
    for b in result_issuer.order:
        for quad in state["b2q"].get(b, []):
            full = dict(bmap)
            for _pos, tok in _bnodes_of(quad):
                if tok not in full:
                    full[tok] = "_:z"
            lines.add(_serialize(quad, full))
    return tuple(sorted(lines))


def canonicalize(quads):
    """quads: list of token 4-tuples → canonical N-Quads document string."""
    state = {"b2q": {}, "canon": _Issuer("_:c14n")}
    for quad in quads:
        seen = set()
        for pos, tok in _bnodes_of(quad):
            if pos != "p" and tok not in seen:
                seen.add(tok)
                state["b2q"].setdefault(tok, []).append(quad)

    h2b = {}
    for b in state["b2q"]:
        h2b.setdefault(hash_first_degree(state, b), []).append(b)

    non_unique = []
    for h in sorted(h2b):
        if len(h2b[h]) == 1:
            state["canon"].issue(h2b[h][0])
        else:
            non_unique.append(h2b[h])

    for nodes in non_unique:
        results = []
        for b in nodes:
            if b in state["canon"].map:
                continue
            tmp = _Issuer("_:b")
            tmp.issue(b)
            results.append(hash_n_degree(state, b, tmp))
        # beyond-spec determinism tie-break, mirrored from
        # jsonldpy.urdna2015._tie_key (see its comment: equal n-degree
        # hashes are NOT always automorphic once blank graph labels are
        # involved; the candidate serialization — not the input labels —
        # must pick the issuance order)
        results.sort(key=lambda r: (r[0], _tie_key(state, r[1])))
        for _, result_issuer in results:
            for existing in result_issuer.order:
                state["canon"].issue(existing)

    subst = state["canon"].map
    lines = sorted(_serialize(q, subst) for q in quads)
    return "".join(lines)
