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
    # ---- round-2 widening: @reverse/container composition, language edge
    # cases, keyword aliases, array/context normalization (VERDICT r1 #6).
    (
        "t0026",
        "@reverse term with @container @index: index map flows into @reverse",
        {
            "@context": {
                "parentOf": {
                    "@reverse": "http://e/childOf",
                    "@container": "@index",
                }
            },
            "@id": "http://e/root",
            "parentOf": {
                "a": {"@id": "http://e/kid1"},
                "b": {"@id": "http://e/kid2"},
            },
        },
        {},
    ),
    (
        "t0027",
        "reverse term used INSIDE an explicit @reverse map flips back forward",
        {
            "@context": {"childOf": {"@reverse": "http://e/parentOf"}},
            "@id": "http://e/x",
            "@reverse": {"childOf": {"@id": "http://e/y"}},
        },
        {},
    ),
    (
        "t0028",
        "term @language:null blocks the default language",
        {
            "@context": {
                "@language": "en",
                "plain": {"@id": "http://e/plain", "@language": None},
                "tagged": "http://e/tagged",
            },
            "plain": "no tag",
            "tagged": "has tag",
        },
        {},
    ),
    (
        "t0029",
        "term-specific @language overrides the default language",
        {
            "@context": {
                "@language": "en",
                "de": {"@id": "http://e/label", "@language": "de"},
            },
            "de": "Katze",
        },
        {},
    ),
    (
        "t0030",
        "@type arrays expand per-value with vocab (not base)",
        {
            "@context": {"@vocab": "http://v.example/"},
            "@id": "http://e/x",
            "@type": ["Local", "http://abs.example/T"],
        },
        {},
    ),
    (
        "t0031",
        "explicitly defined term wins over prefix:suffix decomposition",
        {
            "@context": {
                "a": "http://prefix.example/",
                "a:b": "http://whole.example/term",
            },
            "@id": "http://e/x",
            "a:b": "v",
            "a:c": "w",
        },
        {},
    ),
    (
        "t0032",
        "@vocab without trailing separator concatenates bare",
        {
            "@context": {"@vocab": "http://v.example/ns"},
            "@id": "http://e/x",
            "prop": "v",
        },
        {},
    ),
    (
        "t0033",
        "aliased @type as a property key coerces values to IRIs",
        {
            "@context": {"type": "@type", "@vocab": "http://v.example/"},
            "@id": "http://e/x",
            "type": "Thing",
        },
        {},
    ),
    (
        "t0034",
        "node with @graph and @id keeps the named-graph structure",
        {
            "@id": "http://e/g",
            "http://e/meta": "m",
            "@graph": [{"@id": "http://e/in", "http://e/p": "v"}],
        },
        {},
    ),
    (
        "t0035",
        "@set objects inside arrays unwrap and splice",
        {
            "@id": "http://e/x",
            "http://e/p": [{"@set": ["a", "b"]}, "c"],
        },
        {},
    ),
    (
        "t0036",
        "nested arrays flatten recursively outside list containers",
        {
            "@id": "http://e/x",
            "http://e/p": [["a", ["b"]], "c"],
        },
        {},
    ),
    (
        "t0037",
        "@index on a node object is preserved through expansion",
        {
            "@id": "http://e/x",
            "http://e/p": {"@id": "http://e/y", "@index": "k", "http://e/q": "v"},
        },
        {},
    ),
    (
        "t0038",
        "explicit @list containing node references",
        {
            "@id": "http://e/x",
            "http://e/p": {"@list": [{"@id": "http://e/a"}, {"@id": "http://e/b"}]},
        },
        {},
    ),
    (
        "t0039",
        "@language tags lowercase on value objects (spec 1.0 normalization)",
        {
            "http://e/p": {"@value": "HELLO", "@language": "EN-US"},
            "@id": "http://e/x",
        },
        {},
    ),
    (
        "t0040",
        "@type:@id coercion resolves values against base, arrays too",
        {
            "@context": {"see": {"@id": "http://e/see", "@type": "@id"}},
            "@id": "http://e/x",
            "see": ["other", "http://abs.example/y"],
        },
        {"base": "https://site.example/a/b"},
    ),
    (
        "t0041",
        "empty array value keeps the property with an empty object list",
        {
            "@id": "http://e/x",
            "http://e/p": [],
            "http://e/q": "kept",
        },
        {},
    ),
    (
        "t0042",
        "@language container: scalar entries normalize to arrays",
        {
            "@context": {
                "label": {"@id": "http://e/label", "@container": "@language"}
            },
            "@id": "http://e/x",
            "label": {"en": "one"},
        },
        {},
    ),
    (
        "t0043",
        "array of contexts: later member overrides @vocab of earlier",
        {
            "@context": [
                {"@vocab": "http://first.example/"},
                {"@vocab": "http://second.example/"},
            ],
            "@id": "http://e/x",
            "p": "v",
        },
        {},
    ),
    (
        "t0044",
        "null mid-array resets, following member rebuilds",
        {
            "@context": [
                {"@vocab": "http://gone.example/"},
                None,
                {"name": "http://kept.example/name"},
            ],
            "@id": "http://e/x",
            "name": "v",
            "lost": "dropped",
        },
        {},
    ),
    (
        "t0045",
        "blank-node property keys survive (generalized RDF, ref nodemap)",
        {
            "@id": "http://e/x",
            "_:p": "via blank predicate",
        },
        {},
    ),
    (
        "t0046",
        "unknown at-keyword-like keys drop silently",
        {
            "@id": "http://e/x",
            "@unknownKeyword": "dropped",
            "http://e/p": "kept",
        },
        {},
    ),
    (
        "t0047",
        "aliased @graph wraps like the keyword",
        {
            "@context": {"g": "@graph"},
            "@id": "http://e/g",
            "g": [{"@id": "http://e/in", "http://e/p": "v"}],
        },
        {},
    ),
    (
        "t0048",
        "extreme doubles keep native values at expansion",
        {
            "@id": "http://e/x",
            "http://e/big": 1e21,
            "http://e/tiny": 5e-324,
            "http://e/negzero": -0.0,
        },
        {},
    ),
    (
        "t0049",
        "@container @list composed with @type:@id coercion per item",
        {
            "@context": {
                "chain": {
                    "@id": "http://e/chain",
                    "@container": "@list",
                    "@type": "@id",
                }
            },
            "@id": "http://e/x",
            "chain": ["a", "http://abs.example/b"],
        },
        {"base": "https://site.example/dir/doc"},
    ),
    (
        "t0050",
        "top-level scalars inside @graph array drop; nodes survive",
        {
            "@graph": [
                "free floating",
                {"@id": "http://e/x", "http://e/p": "v"},
                {"@value": "also dropped"},
            ]
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
    # ---- round-2 widening: one case per reachable error variant
    # (reference expand.rs:15-63 / creation.rs:25-68; VERDICT r1 #6).
    (
        "te007",
        "@reverse value must be a map",
        {"@id": "http://e/x", "@reverse": "http://e/p"},
        {},
        E.INVALID_REVERSE_VALUE,
    ),
    (
        "te008",
        "keyword key inside a @reverse map",
        {"@id": "http://e/x", "@reverse": {"@id": "http://e/y"}},
        {},
        E.INVALID_REVERSE_PROPERTY_MAP,
    ),
    (
        "te009",
        "non-string @id",
        {"@id": 5, "http://e/p": "v"},
        {},
        E.INVALID_ID_VALUE,
    ),
    (
        "te010",
        "@type as a map",
        {"@id": "http://e/x", "@type": {"bad": 1}},
        {},
        E.INVALID_TYPE_VALUE,
    ),
    (
        "te011",
        "non-string @type on a value object",
        {"http://e/p": {"@value": "v", "@type": 5}},
        {},
        E.INVALID_TYPE_VALUE,
    ),
    (
        "te012",
        "@value must be scalar or null",
        {"http://e/p": {"@value": {"nested": 1}}},
        {},
        E.INVALID_VALUE_OBJECT_VALUE,
    ),
    (
        "te013",
        "non-string @language tag on a value object",
        {"http://e/p": {"@value": "v", "@language": 5}},
        {},
        E.INVALID_LANGUAGE_TAGGED_STRING,
    ),
    (
        "te014",
        "array @language tag on a value object",
        {"http://e/p": {"@value": "v", "@language": ["en"]}},
        {},
        E.INVALID_LANGUAGE_TAGGED_STRING,
    ),
    (
        "te015",
        "non-string @index",
        {"http://e/p": {"@value": "v", "@index": 7}},
        {},
        E.INVALID_INDEX_VALUE,
    ),
    (
        "te016",
        "value object under a reverse property",
        {"@id": "http://e/x", "@reverse": {"http://e/p": {"@value": "v"}}},
        {},
        E.INVALID_REVERSE_PROPERTY_VALUE,
    ),
    (
        "te017",
        "literal under a reverse term",
        {
            "@context": {"rev": {"@reverse": "http://e/p"}},
            "@id": "http://e/x",
            "rev": "literal",
        },
        {},
        E.INVALID_REVERSE_PROPERTY_VALUE,
    ),
    (
        "te018",
        "non-string entry in a language map",
        {
            "@context": {"l": {"@id": "http://e/l", "@container": "@language"}},
            "l": {"en": 5},
        },
        {},
        E.INVALID_LANGUAGE_MAP_VALUE,
    ),
    (
        "te019",
        "@set with an extra key",
        {"http://e/p": {"@set": [1], "@id": "http://e/x"}},
        {},
        E.INVALID_SET_OBJECT,
    ),
    (
        "te020",
        "@list with an extra key",
        {"http://e/p": {"@list": [1], "@id": "http://e/x"}},
        {},
        E.INVALID_LIST_OBJECT,
    ),
    (
        "te021",
        "non-string @type in a term definition",
        {"@context": {"t": {"@id": "http://e/t", "@type": 5}}, "t": "v"},
        {},
        E.INVALID_TYPE_MAPPING,
    ),
    (
        "te022",
        "@reverse term with a non-@index/@set container",
        {
            "@context": {
                "r": {"@reverse": "http://e/p", "@container": "@language"}
            },
            "r": {"en": "x"},
        },
        {},
        E.INVALID_REVERSE_PROPERTY,
    ),
    (
        "te023",
        "term @id maps to a non-string",
        {"@context": {"t": {"@id": 5}}, "t": "v"},
        {},
        E.INVALID_IRI_MAPPING,
    ),
    (
        "te024",
        "@context cannot be aliased",
        {"@context": {"ctx": "@context"}, "http://e/p": "v"},
        {},
        E.INVALID_KEYWORD_ALIAS,
    ),
    (
        "te025",
        "unknown @container value",
        {"@context": {"t": {"@id": "http://e/t", "@container": "@bogus"}}, "t": "v"},
        {},
        E.INVALID_CONTAINER_MAPPING,
    ),
    (
        "te026",
        "non-string @language in a term definition",
        {"@context": {"t": {"@id": "http://e/t", "@language": 5}}, "t": "v"},
        {},
        E.INVALID_LANGUAGE_MAPPING,
    ),
    (
        "te027",
        "term defined as a number",
        {"@context": {"t": 5}, "t": "v"},
        {},
        E.INVALID_TERM_DEFINITION,
    ),
    (
        "te028",
        "non-string @base",
        {"@context": {"@base": 5}, "@id": "x"},
        {},
        E.INVALID_BASE_IRI,
    ),
    (
        "te029",
        "non-string @vocab",
        {"@context": {"@vocab": 5}, "http://e/p": "v"},
        {},
        E.INVALID_VOCAB_MAPPING,
    ),
    (
        "te030",
        "scalar local context",
        {"@context": 5, "http://e/p": "v"},
        {},
        E.INVALID_LOCAL_CONTEXT,
    ),
    (
        "te031",
        "array @type on a value object",
        {"http://e/p": {"@value": "v", "@type": ["http://e/T", "http://e/U"]}},
        {},
        E.INVALID_TYPED_VALUE,
    ),
    (
        "te032",
        "@value with both @language and @type",
        {"http://e/p": {"@value": "v", "@language": "en", "@type": "http://e/T"}},
        {},
        E.INVALID_VALUE_OBJECT,
    ),
    (
        "te033",
        "@reverse cannot be redefined as a term",
        {"@context": {"@reverse": "http://e/x"}, "http://e/p": "v"},
        {},
        E.KEYWORD_REDEFINITION,
    ),
    (
        "te034",
        "object-form mutual prefix recursion also resolves to invalid IRI "
        "mapping (defined-map guard keeps CyclicIRIMapping unreachable, "
        "reference creation.rs guard placement — see te006)",
        {
            "@context": {"a": {"@id": "b:x"}, "b": {"@id": "a:y"}},
            "a:p": "v",
        },
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
