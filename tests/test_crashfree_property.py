"""Adversarial crash-freedom fuzz over the whole jsonldpy chain (round 7).

The library contract the Spark pipeline's quarantine channel relies on:
for ARBITRARY JSON input, every entry point either returns or raises a
typed ``JsonLdError`` subclass (or ``CanonicalizationError`` from the
canon stage). Any other exception class escaping — TypeError from a
shape the branch tables never considered, KeyError from a missing
keyword, RecursionError from a cycle the guards missed — would kill an
executor task instead of quarantining one document (the containment rule
in CLAUDE.md; triples.py catches ValueError/RecursionError as a LAST
line of defense, but the library's own error discipline is the first).

The generator is deliberately hostile: JSON-LD keywords in wrong
positions, @context values of every JSON shape, aliased/invalid terms,
deep nesting, empty-string keys, keyword-valued keys inside @reverse.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jsonld_rs_spark.jsonldpy import (
    DefaultNodeGenerator,
    canonical_nquads,
    expand,
    flatten,
    jsonld_to_rdf,
)
from jsonld_rs_spark.jsonldpy import errors as E

_KEYS = st.sampled_from(
    [
        "@context", "@id", "@type", "@value", "@language", "@list", "@set",
        "@reverse", "@index", "@graph", "@vocab", "@base", "@container",
        "@nest", "term", "a:b", "_:b0", "http://e/p", "", "x", "@bogus",
    ]
)
_SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-3, 3),
    st.just(1.5),
    st.sampled_from(
        ["", "x", "@id", "@none", "_:b0", "http://e/i", "rel", "#f", ":", "a:b"]
    ),
)


def _doc(depth: int):
    children = st.deferred(lambda: _doc(depth - 1)) if depth > 0 else _SCALARS
    return st.one_of(
        _SCALARS,
        st.lists(st.one_of(_SCALARS, children), max_size=3),
        st.dictionaries(_KEYS, st.one_of(_SCALARS, children), max_size=4),
    )


@given(doc=_doc(3))
@settings(
    max_examples=600,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)
def test_chain_returns_or_raises_typed_errors_only(doc):
    try:
        expanded = expand(doc, base="https://h.example/dir/doc")
    except E.JsonLdError:
        return  # typed rejection IS the contract
    # documents that expand must flow through the whole downstream chain
    # with the same discipline: return, or raise a typed JsonLdError.
    # Downstream CAN reject what expand accepted — e.g. the documented
    # null-@graph reference quirk ({"@id": "", "@graph": null} expands via
    # the keyword-branch insert, then the node map fails typed, same as
    # the pinned compact case te009) — found by this very fuzz on its
    # first run, confirming the quirk instead of a new crash.
    try:
        flattened = flatten(expanded, DefaultNodeGenerator())
        dataset = jsonld_to_rdf(expanded, DefaultNodeGenerator())
        canonical_nquads(dataset)
        jsonld_to_rdf(flattened, DefaultNodeGenerator())
    except E.JsonLdError:
        pass  # includes NodeMapError and CanonicalizationError


@given(doc=_doc(2), ctx=_doc(2))
@settings(
    max_examples=400,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)
def test_compact_returns_or_raises_typed_errors_only(doc, ctx):
    from jsonld_rs_spark.jsonldpy.compact import compact_document

    try:
        compact_document(doc, {"@context": ctx}, base="https://h.example/d")
    except E.JsonLdError:
        pass
