"""One-time generator for the expand conformance fixtures.

Inputs are authored by hand below (each exercising branches cited in
SURVEY.md §2.1 rows 11-13); expected outputs were produced by the jsonldpy
implementation and then hand-reviewed line-by-line against the JSON-LD 1.0
spec + reference semantics before committing. Re-run only to regenerate
after an intentional semantic change; review the diff.

Manifest format mirrors the reference harness
(/root/reference/src/bin/test_expand.rs:10-41).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from jsonld_rs_spark.jsonldpy import expand  # noqa: E402
from jsonld_rs_spark.jsonldpy import errors as E  # noqa: E402

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "expand")

BASE = "https://w3c.example/tests/"

CASES = [
    # (id, name, input_doc, option)
    (
        "t0001",
        "basic vocab expansion with native scalar typing",
        {
            "@context": {"@vocab": "http://schema.org/"},
            "@id": "http://ex.example/alice",
            "@type": "Person",
            "name": "Alice",
            "age": 30,
            "score": 9.5,
            "active": True,
        },
        {},
    ),
    (
        "t0002",
        "relative @id and @type:@id coercion resolve against base",
        {
            "@context": {
                "knows": {"@id": "http://schema.org/knows", "@type": "@id"},
                "name": "http://schema.org/name",
            },
            "@id": "people/1",
            "name": "Bob",
            "knows": "people/2",
        },
        {"base": "https://site.example/dir/page"},
    ),
    (
        "t0003",
        "@list container wraps values; explicit @list objects pass through",
        {
            "@context": {
                "tags": {"@id": "http://ex.example/tags", "@container": "@list"},
                "steps": "http://ex.example/steps",
            },
            "@id": "http://ex.example/x",
            "tags": ["a", "b"],
            "steps": {"@list": [1, 2, 3]},
        },
        {},
    ),
    (
        "t0004",
        "@language container map expands to tagged values (sorted keys)",
        {
            "@context": {
                "label": {"@id": "http://ex.example/label", "@container": "@language"}
            },
            "@id": "http://ex.example/x",
            "label": {"en": "cat", "de": ["Katze", "Mieze"], "fr": None},
        },
        {},
    ),
    (
        "t0005",
        "@index container map keeps/attaches @index",
        {
            "@context": {
                "post": {"@id": "http://ex.example/post", "@container": "@index"}
            },
            "@id": "http://ex.example/x",
            "post": {"b": {"@id": "http://ex.example/p2"}, "a": "first"},
        },
        {},
    ),
    (
        "t0006",
        "@reverse keyword builds reverse map; reverse term inside flips forward",
        {
            "@context": {
                "@vocab": "http://ex.example/",
                "childOf": {"@reverse": "http://ex.example/parentOf"},
            },
            "@id": "http://ex.example/x",
            "@reverse": {
                "parentOf": {"@id": "http://ex.example/child"},
                "childOf": {"@id": "http://ex.example/friend"},
            },
        },
        {},
    ),
    (
        "t0007",
        "reverse term routes values into @reverse",
        {
            "@context": {
                "childOf": {"@reverse": "http://ex.example/parentOf"},
            },
            "@id": "http://ex.example/x",
            "childOf": {"@id": "http://ex.example/y"},
        },
        {},
    ),
    (
        "t0008",
        "top-level @graph unwraps",
        {
            "@context": {"@vocab": "http://ex.example/"},
            "@graph": [
                {"@id": "http://ex.example/a", "p": "1"},
                {"@id": "http://ex.example/b", "p": "2"},
            ],
        },
        {},
    ),
    (
        "t0009",
        "free-floating scalars and lone-@id nodes drop at root",
        ["scalar", {"@id": "http://ex.example/lonely"}, {"@value": "v"}],
        {},
    ),
    (
        "t0010",
        "@set unwraps (with @index allowed); lone @language drops",
        {
            "@context": {"p": "http://ex.example/p"},
            "@id": "http://ex.example/x",
            "p": [{"@set": ["a", "b"], "@index": "i"}, {"@language": "en"}],
        },
        {},
    ),
    (
        "t0011",
        "inline @context null resets vocab AND base (reference quirk)",
        {
            "@context": {"@vocab": "http://v.example/"},
            "@id": "http://ex.example/outer",
            "p": {
                "@context": None,
                "@id": "http://ex.example/inner",
                "dropped": "x",
                "http://kept.example/q": "y",
            },
        },
        {"base": "https://site.example/"},
    ),
    (
        "t0012",
        "term defined as null maps to itself (reference quirk)",
        {
            "@context": {"@vocab": "http://v.example/", "selfish": None},
            "@id": "http://ex.example/x",
            "selfish": "kept-under-term-name",
        },
        {},
    ),
    (
        "t0013",
        "prefix:suffix expansion with _: and // guards",
        {
            "@context": {"ex": "http://prefix.example/ns#"},
            "@id": "http://ex.example/x",
            "ex:p": "expanded",
            "_:blankprop": "blank-predicate",
            "other:p": "unknown-prefix-kept",
        },
        {},
    ),
    (
        "t0014",
        "default @language applies to plain strings only",
        {
            "@context": {"@language": "EN", "p": "http://ex.example/p", "n": "http://ex.example/n"},
            "@id": "http://ex.example/x",
            "p": "hello",
            "n": 4,
        },
        {},
    ),
    (
        "t0015",
        "value objects: @type coercion and explicit @value pass-through",
        {
            "@context": {
                "born": {
                    "@id": "http://ex.example/born",
                    "@type": "http://www.w3.org/2001/XMLSchema#date",
                }
            },
            "@id": "http://ex.example/x",
            "born": "1990-01-01",
            "http://ex.example/note": {"@value": "text", "@language": "DE"},
        },
        {},
    ),
    (
        "t0016",
        "expandContext option seeds the active context",
        {"@id": "http://ex.example/x", "name": "Zed"},
        {"expandContext": {"@context": {"name": "http://schema.org/name"}}},
    ),
    (
        "t0017",
        "keyword aliases expand and collide",
        {
            "@context": {"id": "@id", "type": "@type"},
            "id": "http://ex.example/x",
            "type": "http://ex.example/T",
        },
        {},
    ),
    (
        "t0018",
        "nested node objects mint no ids at expansion; blanks preserved",
        {
            "@context": {"@vocab": "http://ex.example/"},
            "@id": "_:root",
            "p": {"q": "deep"},
        },
        {},
    ),
    (
        "t0019",
        "null property values and null @value drop",
        {
            "@context": {"@vocab": "http://e/"},
            "@id": "http://e/x",
            "p": None,
            "q": {"@value": None},
            "r": [None, "kept"],
        },
        {},
    ),
    (
        "t0020",
        "@list-container term receiving an explicit list object",
        {
            "@context": {"l": {"@id": "http://e/l", "@container": "@list"}},
            "@id": "http://e/x",
            "l": {"@list": ["a"]},
        },
        {},
    ),
    (
        "t0021",
        "keyword aliases for @value/@language/@list",
        {
            "@context": {
                "val": "@value",
                "lang": "@language",
                "lst": "@list",
                "p": "http://e/p",
                "l": "http://e/l",
            },
            "@id": "http://e/x",
            "p": {"val": "hola", "lang": "ES"},
            "l": {"lst": [1, 2]},
        },
        {},
    ),
    (
        "t0022",
        "float lexical forms: int-valued float stays double; exponents",
        {
            "@id": "http://e/x",
            "http://e/a": 2.0,
            "http://e/b": 1e100,
            "http://e/c": 1.5e-7,
        },
        {},
    ),
    (
        "t0023",
        "nested inline context overrides term for subtree only",
        {
            "@context": {"p": "http://outer.e/p", "q": "http://outer.e/q"},
            "@id": "http://e/x",
            "p": {
                "@context": {"q": "http://inner.e/q"},
                "@id": "http://e/y",
                "q": "inner",
            },
            "q": "outer",
        },
        {},
    ),
    (
        "t0024",
        "term with @container @set always arrays; compact_arrays-independent",
        {
            "@context": {"s": {"@id": "http://e/s", "@container": "@set"}},
            "@id": "http://e/x",
            "s": "single",
        },
        {},
    ),
    (
        "t0025",
        "blank node @type relabel preserved as-is at expansion",
        {
            "@id": "http://e/x",
            "@type": ["_:T", "http://e/T"],
        },
        {},
    ),
]

NEGATIVE_CASES = [
    (
        "te001",
        "list of lists is an error",
        {
            "@context": {"l": {"@id": "http://ex.example/l", "@container": "@list"}},
            "l": [["nested"]],
        },
        {},
        E.LIST_OF_LISTS,
    ),
    (
        "te002",
        "colliding keyword aliases error",
        {
            "@context": {"id": "@id"},
            "id": "http://ex.example/x",
            "@id": "http://ex.example/y",
        },
        {},
        E.COLLIDING_KEYWORDS,
    ),
    (
        "te003",
        "invalid value object (@value plus extra key)",
        {"http://ex.example/p": {"@value": "v", "@id": "http://ex.example/x"}},
        {},
        E.INVALID_VALUE_OBJECT,
    ),
    (
        "te004",
        "non-string @value with @language",
        {"http://ex.example/p": {"@value": 5, "@language": "en"}},
        {},
        E.INVALID_TYPED_VALUE,
    ),
    (
        "te005",
        "keyword redefinition in context",
        {"@context": {"@id": "http://ex.example/x"}, "http://ex.example/p": "v"},
        {},
        E.KEYWORD_REDEFINITION,
    ),
    (
        "te006",
        "mutually-recursive prefixes leave an unexpandable compact IRI "
        "(the defined-map guards make CyclicIRIMapping unreachable here, "
        "matching the reference's guard placement in creation.rs:139-187)",
        {"@context": {"a": "b:x", "b": "a:y"}, "a:p": "v"},
        {},
        E.INVALID_IRI_MAPPING,
    ),
]


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    sequence = []
    for tid, name, doc, option in CASES:
        with open(os.path.join(HERE, f"{tid}-in.jsonld"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        expanded = expand(
            doc,
            base=option.get("base", BASE + f"{tid}-in.jsonld"),
            expand_context=option.get("expandContext"),
        )
        with open(os.path.join(HERE, f"{tid}-out.jsonld"), "w") as f:
            json.dump(expanded, f, indent=1, sort_keys=True)
        sequence.append(
            {
                "@id": f"#{tid}",
                "@type": ["jld:PositiveEvaluationTest"],
                "name": name,
                "input": f"{tid}-in.jsonld",
                "expect": f"{tid}-out.jsonld",
                "option": option,
            }
        )
        print(f"== {tid}: {name}")
        print(json.dumps(expanded, indent=1, sort_keys=True))

    for tid, name, doc, option, code in NEGATIVE_CASES:
        with open(os.path.join(HERE, f"{tid}-in.jsonld"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        sequence.append(
            {
                "@id": f"#{tid}",
                "@type": ["jld:NegativeEvaluationTest"],
                "name": name,
                "input": f"{tid}-in.jsonld",
                "expectErrorCode": code,
                "option": option,
            }
        )

    manifest = {"baseIri": BASE, "sequence": sequence}
    with open(os.path.join(HERE, "manifest.jsonld"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
