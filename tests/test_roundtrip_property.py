"""Property-based compaction losslessness over randomized document shapes
(nested nodes, coerced terms, list containers, blank nodes, relative IRIs,
mixed scalars): compaction must preserve MEANING — the canonical N-Quads
of ``expand(compact(doc))`` equal those of ``expand(doc)``.

The comparison is at the RDF level, not JSON array order: hypothesis found
that a mixed-type value array under a coerced term (e.g.
``{"knows": ["", 2.5]}`` with @type:@id) compacts its members onto TWO
keys — the id-string onto the term, the number onto the absolute-IRI key —
and re-expansion merges them back in sorted-key order. Expanded property
arrays are set-semantic in JSON-LD (only @list is ordered), and the
reference behaves identically, so value-array ORDER is out of the
property's scope while every triple is in it."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jsonld_rs_spark.jsonldpy import (
    DefaultNodeGenerator,
    canonical_nquads,
    expand,
    jsonld_to_rdf,
)
from jsonld_rs_spark.jsonldpy import errors as E
from jsonld_rs_spark.jsonldpy.compact import compact_document

CONTEXT = {
    "@vocab": "http://v.example/",
    "name": "http://e/name",
    "knows": {"@id": "http://e/knows", "@type": "@id"},
    "tags": {"@id": "http://e/tags", "@container": "@list"},
    "label": {"@id": "http://e/label", "@container": "@language"},
}
BASE = "https://h.example/dir/doc"

_scalars = st.one_of(
    st.text(alphabet="ab c", max_size=6),
    st.integers(-5, 5),
    st.booleans(),
    st.just(2.5),
)
_ids = st.sampled_from(["http://e/a", "http://e/b", "rel/x", "#frag", "_:b1"])
_keys = st.sampled_from(["name", "knows", "tags", "http://e/p", "plain"])


def _node(depth: int):
    children = (
        st.deferred(lambda: _node(depth - 1)) if depth > 0 else _scalars
    )
    values = st.one_of(
        _scalars,
        st.lists(_scalars, max_size=3),
        children,
        st.lists(children, max_size=2),
    )
    return st.fixed_dictionaries(
        {},
        optional={
            "@id": _ids,
            "name": values,
            "knows": values,
            "tags": st.lists(_scalars, max_size=3),
            "http://e/p": values,
            "plain": values,
            "label": st.fixed_dictionaries(
                {}, optional={"en": st.text(alphabet="xy", max_size=4)}
            ),
        },
    )


@given(doc=_node(2))
@settings(
    max_examples=500,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)
def test_expand_compact_expand_is_expand(doc):
    src = dict(doc)
    src["@context"] = CONTEXT
    try:
        expanded = expand(src, base=BASE)
    except E.JsonLdError:
        return  # documents that don't expand are out of the property's scope

    def nq(ex):
        return canonical_nquads(jsonld_to_rdf(ex, DefaultNodeGenerator()))

    compacted = compact_document(src, {"@context": CONTEXT}, base=BASE)
    assert nq(expand(compacted, base=BASE)) == nq(expanded)
