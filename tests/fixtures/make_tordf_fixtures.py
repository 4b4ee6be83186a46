"""One-time generator for toRDF conformance fixtures: input JSON-LD →
expected canonical N-Quads (URDNA2015-labeled, sorted). Inputs authored by
hand covering every literal/list/graph branch (SURVEY.md §2.1 rows 26-31);
outputs produced by jsonldpy and hand-reviewed before committing."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from jsonld_rs_spark.jsonldpy import (  # noqa: E402
    DefaultNodeGenerator,
    canonical_nquads,
    expand,
    jsonld_to_rdf,
)

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "toRdf")
BASE = "https://w3c.example/tests/"

CASES = [
    (
        "t0001",
        "native scalar typing: string/int/double/boolean",
        {
            "@id": "http://e/s",
            "http://e/str": "plain",
            "http://e/int": 42,
            "http://e/dbl": 4.25,
            "http://e/neg": -0.5,
            "http://e/bool": [True, False],
        },
    ),
    (
        "t0002",
        "language-tagged strings and explicit datatypes",
        {
            "@context": {"@language": "EN-us"},
            "@id": "http://e/s",
            "http://e/tagged": "hello",
            "http://e/dated": {
                "@value": "2020-01-02",
                "@type": "http://www.w3.org/2001/XMLSchema#date",
            },
        },
    ),
    (
        "t0003",
        "rdf:first/rest cons chains, incl. nested node in list",
        {
            "@id": "http://e/s",
            "http://e/l": {
                "@list": ["a", {"@id": "http://e/n"}, 3]
            },
        },
    ),
    (
        "t0004",
        "empty list → rdf:nil",
        {"@id": "http://e/s", "http://e/l": {"@list": []}},
    ),
    (
        "t0005",
        "named graphs keyed by containing node",
        {
            "@id": "http://e/g",
            "http://e/meta": "m",
            "@graph": [
                {"@id": "http://e/a", "http://e/p": "v"},
                {"@id": "_:inner", "http://e/p": "w"},
            ],
        },
    ),
    (
        "t0006",
        "blank subjects/objects with canonical labels",
        {
            "@id": "_:a",
            "@type": "http://e/T",
            "http://e/knows": [{"@id": "_:b"}, {"http://e/name": "anon"}],
        },
    ),
    (
        "t0007",
        "@reverse emits forward triples",
        {
            "@context": {"childOf": {"@reverse": "http://e/parentOf"}},
            "@id": "http://e/x",
            "childOf": {"@id": "http://e/y"},
        },
    ),
    (
        "t0008",
        "value dedup but node-ref duplication preserved",
        {
            "@id": "http://e/s",
            "http://e/v": ["same", "same", "other"],
            "http://e/r": [{"@id": "http://e/o"}, {"@id": "http://e/o"}],
        },
    ),
    (
        "t0009",
        "relative @id resolution against base",
        {
            "@context": {"p": {"@id": "http://e/p", "@type": "@id"}},
            "@id": "child/doc",
            "p": "../sibling",
        },
    ),
    (
        "t0010",
        "blank @type and blank predicate relabeling",
        {
            "@id": "http://e/s",
            "@type": "_:T",
            "_:pred": "via blank predicate",
        },
    ),
    (
        "t0011",
        "symmetric blank cycle requires n-degree hashing",
        [
            {"@id": "_:a", "http://e/r": {"@id": "_:b"}},
            {"@id": "_:b", "http://e/r": {"@id": "_:a"}},
        ],
    ),
    (
        "t0012",
        "language map + index container to triples",
        {
            "@context": {
                "label": {"@id": "http://e/label", "@container": "@language"},
                "post": {"@id": "http://e/post", "@container": "@index"},
            },
            "@id": "http://e/s",
            "label": {"en": "cat", "de": "Katze"},
            "post": {"x": "first", "y": "second"},
        },
    ),
]


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    sequence = []
    for tid, name, doc in CASES:
        with open(os.path.join(HERE, f"{tid}-in.jsonld"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        expanded = expand(doc, base=BASE + f"{tid}-in.jsonld")
        nquads = canonical_nquads(jsonld_to_rdf(expanded, DefaultNodeGenerator()))
        with open(os.path.join(HERE, f"{tid}-out.nq"), "w") as f:
            f.write(nquads)
        sequence.append(
            {
                "@id": f"#{tid}",
                "@type": ["jld:PositiveEvaluationTest"],
                "name": name,
                "input": f"{tid}-in.jsonld",
                "expect": f"{tid}-out.nq",
                "option": {},
            }
        )
        print(f"== {tid}: {name}")
        print(nquads)

    with open(os.path.join(HERE, "manifest.jsonld"), "w") as f:
        json.dump({"baseIri": BASE, "sequence": sequence}, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
