"""One-time generator for compact conformance fixtures (manifest format of
/root/reference/src/bin/test_compact.rs:11-41). Inputs + target contexts are
authored by hand; expected outputs produced by jsonldpy and hand-reviewed
against the JSON-LD 1.0 API spec + reference semantics before committing."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from jsonld_rs_spark.jsonldpy.compact import compact_document  # noqa: E402

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "compact")
BASE = "https://w3c.example/tests/"

CASES = [
    (
        "t0001",
        "term + @id/@type compaction with vocab",
        {
            "@id": "http://ex.example/x",
            "@type": ["http://ex.example/Type"],
            "http://ex.example/name": [{"@value": "n"}],
        },
        {"@context": {"@vocab": "http://ex.example/"}},
        {},
    ),
    (
        "t0002",
        "prefix:suffix selection picks shortest then lexicographically least",
        {
            "@id": "http://ex.example/ns#x",
            "http://ex.example/ns#prop": [{"@value": "v"}],
        },
        {"@context": {"ex": "http://ex.example/ns#", "exa": "http://ex.example/ns#"}},
        {},
    ),
    (
        "t0003",
        "@list container packs list objects",
        {
            "@id": "http://ex.example/x",
            "http://ex.example/tags": [{"@list": [{"@value": "a"}, {"@value": "b"}]}],
        },
        {"@context": {"tags": {"@id": "http://ex.example/tags", "@container": "@list"}}},
        {},
    ),
    (
        "t0004",
        "empty @list compacts onto the list term (off-spec @none patch)",
        {
            "@id": "http://ex.example/x",
            "http://ex.example/tags": [{"@list": []}],
        },
        {"@context": {"tags": {"@id": "http://ex.example/tags", "@container": "@list"}}},
        {},
    ),
    (
        "t0005",
        "@language container map rebuilt",
        {
            "@id": "http://ex.example/x",
            "http://ex.example/label": [
                {"@value": "cat", "@language": "en"},
                {"@value": "Katze", "@language": "de"},
                {"@value": "Mieze", "@language": "de"},
            ],
        },
        {"@context": {"label": {"@id": "http://ex.example/label", "@container": "@language"}}},
        {},
    ),
    (
        "t0006",
        "@index container map rebuilt and @index elided",
        {
            "@id": "http://ex.example/x",
            "http://ex.example/post": [
                {"@value": "first", "@index": "a"},
                {"@id": "http://ex.example/p2", "@index": "b"},
            ],
        },
        {"@context": {"post": {"@id": "http://ex.example/post", "@container": "@index"}}},
        {},
    ),
    (
        "t0007",
        "@reverse unfolds into reverse terms",
        {
            "@id": "http://ex.example/x",
            "@reverse": {
                "http://ex.example/parentOf": [{"@id": "http://ex.example/y"}]
            },
        },
        {"@context": {"childOf": {"@reverse": "http://ex.example/parentOf"}}},
        {},
    ),
    (
        "t0008",
        "value compaction: matching @type coercion and @language",
        {
            "@id": "http://ex.example/x",
            "http://ex.example/born": [
                {"@value": "1990-01-01", "@type": "http://www.w3.org/2001/XMLSchema#date"}
            ],
            "http://ex.example/note": [{"@value": "hallo", "@language": "de"}],
        },
        {
            "@context": {
                "born": {
                    "@id": "http://ex.example/born",
                    "@type": "http://www.w3.org/2001/XMLSchema#date",
                },
                "note": {"@id": "http://ex.example/note", "@language": "de"},
            }
        },
        {},
    ),
    (
        "t0009",
        "@id values under @type:@id coercion compact to strings",
        {
            "@id": "http://ex.example/x",
            "http://ex.example/knows": [{"@id": "http://ex.example/y"}],
        },
        {
            "@context": {
                "@vocab": "http://ex.example/",
                "knows": {"@id": "http://ex.example/knows", "@type": "@id"},
            }
        },
        {},
    ),
    (
        "t0010",
        "multiple root nodes wrap under compacted @graph",
        [
            {"@id": "http://ex.example/a", "http://ex.example/p": [{"@value": "1"}]},
            {"@id": "http://ex.example/b", "http://ex.example/p": [{"@value": "2"}]},
        ],
        {"@context": {"@vocab": "http://ex.example/"}},
        {},
    ),
    (
        "t0011",
        "compactArrays=false keeps arrays and @graph wrap",
        {
            "@id": "http://ex.example/x",
            "http://ex.example/p": [{"@value": "only"}],
        },
        {"@context": {"@vocab": "http://ex.example/"}},
        {"compactArrays": False},
    ),
    (
        "t0012",
        "default @language enables bare string reduction only when safe",
        {
            "@id": "http://ex.example/x",
            "http://ex.example/p": [{"@value": "tagged", "@language": "en"}],
            "http://ex.example/q": [{"@value": 5}],
            "http://ex.example/r": [{"@value": "untagged"}],
        },
        {"@context": {"@language": "en", "@vocab": "http://ex.example/"}},
        {},
    ),
]


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    sequence = []
    for tid, name, expanded_doc, context_doc, option in CASES:
        with open(os.path.join(HERE, f"{tid}-in.jsonld"), "w") as f:
            json.dump(expanded_doc, f, indent=1, sort_keys=True)
        with open(os.path.join(HERE, f"{tid}-context.jsonld"), "w") as f:
            json.dump(context_doc, f, indent=1, sort_keys=True)
        actual = compact_document(
            expanded_doc,
            context_doc,
            base=BASE + f"{tid}-in.jsonld",
            compact_arrays=option.get("compactArrays", True),
        )
        with open(os.path.join(HERE, f"{tid}-out.jsonld"), "w") as f:
            json.dump(actual, f, indent=1, sort_keys=True)
        sequence.append(
            {
                "@id": f"#{tid}",
                "@type": ["jld:PositiveEvaluationTest"],
                "name": name,
                "input": f"{tid}-in.jsonld",
                "context": f"{tid}-context.jsonld",
                "expect": f"{tid}-out.jsonld",
                "option": option,
            }
        )
        print(f"== {tid}: {name}")
        print(json.dumps(actual, indent=1, sort_keys=True))

    manifest = {"baseIri": BASE, "sequence": sequence}
    with open(os.path.join(HERE, "manifest.jsonld"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
