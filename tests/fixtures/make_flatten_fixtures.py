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


# Round-4 long tail: node-map quirks (value dedup vs node-ref non-dedup),
# merge ordering, reverse/graph/list compositions, forward references.
EX = "http://e/"

CASES += [
    (
        "t0017",
        "duplicate literal values dedup during node-map merge, duplicate "
        "node refs do NOT (reference nodemap value-dedup quirk)",
        {
            "@context": {"@vocab": EX},
            "@graph": [
                {"@id": EX + "s", "p": ["v", {"@id": EX + "o"}]},
                {"@id": EX + "s", "p": ["v", {"@id": EX + "o"}]},
            ],
        },
    ),
    (
        "t0018",
        "node referenced FORWARD before its definition merges into one entry",
        {
            "@context": {"@vocab": EX},
            "@graph": [
                {"@id": EX + "a", "p": {"@id": EX + "later"}},
                {"@id": EX + "later", "q": "defined afterwards"},
            ],
        },
    ),
    (
        "t0019",
        "@type arrays accumulate across merged descriptions, deduped, "
        "in first-seen order",
        {
            "@context": {"@vocab": EX},
            "@graph": [
                {"@id": EX + "s", "@type": ["T1", "T2"]},
                {"@id": EX + "s", "@type": ["T2", "T3"]},
            ],
        },
    ),
    (
        "t0020",
        "anonymous nodes in sibling positions mint _:b labels in sorted-key "
        "document order",
        {
            "@context": {"@vocab": EX},
            "@id": EX + "s",
            "zlast": {"p": "minted second"},
            "afirst": {"p": "minted first"},
        },
    ),
    (
        "t0021",
        "reverse edge whose target is anonymous: the minted node carries "
        "the forward edge",
        {
            "@context": {"@vocab": EX, "childOf": {"@reverse": EX + "parentOf"}},
            "@id": EX + "kid",
            "childOf": {"name": "anon parent"},
        },
    ),
    (
        "t0022",
        "index map entries flatten to plain nodes keeping @index",
        {
            "@context": {"@vocab": EX, "m": {"@id": EX + "m", "@container": "@index"}},
            "@id": EX + "s",
            "m": {"k1": {"@id": EX + "n1", "p": "a"}, "k2": {"p": "b"}},
        },
    ),
    (
        "t0023",
        "the same list under two predicates keeps two separate @list values",
        {
            "@context": {"@vocab": EX},
            "@id": EX + "s",
            "l1": {"@list": ["x", "y"]},
            "l2": {"@list": ["x", "y"]},
        },
    ),
    (
        "t0024",
        "nested explicit list: the inner list reattaches to the property "
        "(same nodemap quirk the toRDF manifest pins, nodemap.rs:411-424)",
        {
            "@id": EX + "s",
            EX + "p": {"@list": [{"@list": ["inner"]}, "flat"]},
        },
    ),
    (
        "t0025",
        "graph node merging: @graph face from one description, properties "
        "from another, one merged top-level entry",
        {
            "@context": {"@vocab": EX},
            "@graph": [
                {"@id": EX + "g", "@graph": [{"@id": EX + "in", "p": "v"}]},
                {"@id": EX + "g", "meta": "m"},
            ],
        },
    ),
    (
        "t0026",
        "same blank label in default graph and inside a named graph: "
        "document-scoped identity, graph-scoped placement",
        {
            "@context": {"@vocab": EX},
            "@graph": [
                {"@id": "_:x", "p": "default face"},
                {
                    "@id": EX + "g",
                    "@graph": [{"@id": "_:x", "p": "graph face"}],
                },
            ],
        },
    ),
    (
        "t0027",
        "free-floating anonymous node survives flattening with a minted id",
        {
            "@context": {"@vocab": EX},
            "@graph": [
                {"p": "floater"},
                {"@id": EX + "s", "q": "anchored"},
            ],
        },
    ),
    (
        "t0028",
        "@graph: [] drops during expansion — the node flattens with only "
        "its ordinary properties, no @graph member",
        {
            "@context": {"@vocab": EX},
            "@id": EX + "g",
            "meta": "m",
            "@graph": [],
        },
    ),
    (
        "t0029",
        "list of node REFS to nodes that also have top-level definitions",
        {
            "@context": {"@vocab": EX},
            "@graph": [
                {"@id": EX + "s", "l": {"@list": [{"@id": EX + "a"}, {"@id": EX + "b"}]}},
                {"@id": EX + "a", "p": "first"},
                {"@id": EX + "b", "p": "second"},
            ],
        },
    ),
    (
        "t0030",
        "value-object @index is DROPPED by node-map generation (the "
        "reference's Pointer::Value keeps only value/type/language, "
        "nodemap.rs:98-113) so equal-valued entries then dedup to one",
        {
            "@id": EX + "s",
            EX + "p": [
                {"@value": "v", "@index": "i1"},
                {"@value": "v", "@index": "i2"},
                {"@value": "v", "@index": "i1"},
            ],
        },
    ),
    (
        "t0031",
        "triple-nested graphs: each level becomes its own top-level graph "
        "node; inner contents never leak upward",
        {
            "@context": {"@vocab": EX},
            "@id": EX + "outer",
            "@graph": [
                {
                    "@id": EX + "mid",
                    "meta": "mid",
                    "@graph": [
                        {"@id": EX + "leaf", "p": "deep"}
                    ],
                }
            ],
        },
    ),
    (
        "t0032",
        "language-tagged duplicates dedup only on exact (value, language)",
        {
            "@id": EX + "s",
            EX + "p": [
                {"@value": "v", "@language": "en"},
                {"@value": "v", "@language": "de"},
                {"@value": "v", "@language": "en"},
                {"@value": "v"},
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
