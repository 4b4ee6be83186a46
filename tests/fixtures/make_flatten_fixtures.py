"""One-time generator for flatten conformance fixtures (JSON-LD 1.0 §8.1
semantics; completes the reference's flattening TODO). Inputs hand-authored;
outputs produced by jsonldpy and hand-reviewed before committing."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from jsonld_rs_spark.jsonldpy import expand, flatten  # noqa: E402

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "flatten")
BASE = "https://w3c.example/tests/"

CASES = [
    (
        "t0001",
        "nested node objects hoist to top level with forward references",
        {
            "@context": {"@vocab": "http://e/"},
            "@id": "http://e/a",
            "p": {"@id": "http://e/b", "q": {"@id": "http://e/c", "r": "leaf"}},
        },
    ),
    (
        "t0002",
        "blank node ids minted sequentially in sorted-key order",
        {
            "@id": "http://e/a",
            "http://e/p": [{"http://e/x": [{"@value": 1}]}, {"http://e/y": [{"@value": 2}]}],
        },
    ),
    (
        "t0003",
        "named graph contents nest under defining node's @graph",
        {
            "@id": "http://e/g",
            "http://e/meta": "m",
            "@graph": [
                {"@id": "http://e/in1", "http://e/p": "1"},
                {"@id": "http://e/in2", "http://e/p": "2"},
            ],
        },
    ),
    (
        "t0004",
        "duplicate node descriptions merge; types accumulate deduped",
        [
            {"@id": "http://e/a", "@type": ["http://e/T"], "http://e/p": [{"@value": "x"}]},
            {"@id": "http://e/a", "@type": ["http://e/T", "http://e/U"], "http://e/p": [{"@value": "x"}, {"@value": "y"}]},
        ],
    ),
    (
        "t0005",
        "id-only referenced nodes elided from output",
        {
            "@id": "http://e/a",
            "http://e/p": [{"@id": "http://e/ghost"}],
        },
    ),
    (
        "t0006",
        "@reverse inverts into forward edges on the target node",
        {
            "@context": {"childOf": {"@reverse": "http://e/parentOf"}},
            "@id": "http://e/x",
            "childOf": {"@id": "http://e/y", "http://e/name": "Y"},
        },
    ),
    (
        "t0007",
        "lists survive flattening as @list values",
        {
            "@id": "http://e/a",
            "http://e/l": {"@list": [{"@value": 1}, {"@id": "http://e/b"}]},
            "http://e/b2": {"@id": "http://e/b", "http://e/n": "B"},
        },
    ),
    (
        "t0008",
        "@index preserved on nodes",
        {
            "@id": "http://e/a",
            "http://e/p": [{"@id": "http://e/b", "@index": "i1"}],
        },
    ),
    # Round-3 additions: graph/blank interplay and merge corners.
    (
        "t0009",
        "same subject described in default graph and a named graph stays "
        "split per graph",
        [
            {"@id": "http://e/s", "http://e/p": [{"@value": "default"}]},
            {
                "@id": "http://e/g",
                "@graph": [
                    {"@id": "http://e/s", "http://e/p": [{"@value": "named"}]}
                ],
            },
        ],
    ),
    (
        "t0010",
        "blank nodes in different named graphs get distinct minted labels",
        [
            {
                "@id": "http://e/g1",
                "@graph": [{"http://e/p": [{"@value": "a"}]}],
            },
            {
                "@id": "http://e/g2",
                "@graph": [{"http://e/p": [{"@value": "b"}]}],
            },
        ],
    ),
    (
        "t0011",
        "node listed twice at top level with different properties merges",
        [
            {"@id": "http://e/s", "http://e/p": [{"@value": "one"}]},
            {"@id": "http://e/s", "http://e/q": [{"@value": "two"}]},
        ],
    ),
    (
        "t0012",
        "list containing an anonymous node: node hoists, list keeps the ref",
        {
            "@id": "http://e/a",
            "http://e/l": [
                {"@list": [{"http://e/name": [{"@value": "inner"}]}]}
            ],
        },
    ),
    (
        "t0013",
        "reverse edges from a named graph land on targets inside that graph",
        {
            "@id": "http://e/g",
            "@graph": [
                {
                    "@id": "http://e/child",
                    "@reverse": {
                        "http://e/parentOf": [{"@id": "http://e/parent"}]
                    },
                }
            ],
        },
    ),
    (
        "t0014",
        "blank graph name: graph keyed under the minted label's node",
        {
            "@id": "_:g",
            "http://e/meta": [{"@value": "m"}],
            "@graph": [{"@id": "http://e/a", "http://e/p": [{"@value": "v"}]}],
        },
    ),
    (
        "t0015",
        "type-only node survives flattening with its @type",
        [
            {"@id": "http://e/s", "@type": ["http://e/T"]},
            {"@id": "http://e/o", "http://e/p": [{"@id": "http://e/s"}]},
        ],
    ),
    (
        "t0016",
        "deep mixed nesting: graph inside node inside graph flattens "
        "each level to its own graph entry",
        {
            "@id": "http://e/outer",
            "@graph": [
                {
                    "@id": "http://e/mid",
                    "http://e/p": [{"@value": "m"}],
                    "@graph": [
                        {"@id": "http://e/leaf", "http://e/q": [{"@value": "l"}]}
                    ],
                }
            ],
        },
    ),
]


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    sequence = []
    for tid, name, doc in CASES:
        with open(os.path.join(HERE, f"{tid}-in.jsonld"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        flat = flatten(expand(doc, base=BASE + f"{tid}-in.jsonld"))
        with open(os.path.join(HERE, f"{tid}-out.jsonld"), "w") as f:
            json.dump(flat, f, indent=1, sort_keys=True)
        sequence.append(
            {
                "@id": f"#{tid}",
                "@type": ["jld:PositiveEvaluationTest"],
                "name": name,
                "input": f"{tid}-in.jsonld",
                "expect": f"{tid}-out.jsonld",
                "option": {},
            }
        )
        print(f"== {tid}: {name}")
        print(json.dumps(flat, indent=1, sort_keys=True))

    with open(os.path.join(HERE, "manifest.jsonld"), "w") as f:
        json.dump({"baseIri": BASE, "sequence": sequence}, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
