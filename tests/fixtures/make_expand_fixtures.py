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

# Round-3 long-tail additions (VERDICT r2 #3): IRI-resolution corners
# (RFC3986 dot-segments, network-path refs, query/fragment merge), container
# map × @reverse composition, exotic container combinations, and value/list/
# graph corners mirroring the genuine W3C suite's odd corners. Same review
# protocol: outputs generated by jsonldpy, then hand-checked line-by-line
# against JSON-LD 1.0 §expansion + RFC3986 §5 before committing.
CASES += [
    (
        "t0051",
        "RFC3986: ../ dot-segment resolves to parent of base directory",
        {
            "@context": {"p": {"@id": "http://e/p", "@type": "@id"}},
            "@id": "../x",
            "p": "../../y",
        },
        {"base": "https://site.example/a/b/c"},
    ),
    (
        "t0052",
        "RFC3986: ./ dot-segment resolves within base directory",
        {"@id": "./x", "http://e/p": "v"},
        {"base": "https://site.example/a/b/c"},
    ),
    (
        "t0053",
        "RFC3986: empty reference resolves to base itself (sans fragment)",
        {"@id": "", "http://e/p": "v"},
        {"base": "https://site.example/a/b/c#frag"},
    ),
    (
        "t0054",
        "RFC3986: fragment-only reference appends to full base",
        {"@id": "#frag", "http://e/p": "v"},
        {"base": "https://site.example/a/b/c?q=0"},
    ),
    (
        "t0055",
        "RFC3986: query-only reference replaces base query, keeps path",
        {"@id": "?q=1", "http://e/p": "v"},
        {"base": "https://site.example/a/b/c?old=9"},
    ),
    (
        "t0056",
        "RFC3986: network-path reference adopts base scheme only",
        {"@id": "//other.example/p", "http://e/p": "v"},
        {"base": "https://site.example/a/b/c"},
    ),
    (
        "t0057",
        "RFC3986: absolute-path reference replaces whole base path",
        {"@id": "/r/s", "http://e/p": "v"},
        {"base": "https://site.example/a/b/c"},
    ),
    (
        "t0058",
        "RFC3986: excess ../ segments clamp at root",
        {"@id": "x/../../../y", "http://e/p": "v"},
        {"base": "https://site.example/a/b/c"},
    ),
    (
        "t0059",
        "RFC3986: 'g.' and '.g' are ordinary segments, not dot-segments",
        {
            "@context": {"p": {"@id": "http://e/p", "@type": "@id"}},
            "@id": "g.",
            "p": ".g",
        },
        {"base": "https://site.example/a/b/c"},
    ),
    (
        "t0060",
        "RFC3986: authority-only base gains / before relative path",
        {"@id": "x", "http://e/p": "v"},
        {"base": "https://h.example"},
    ),
    (
        "t0061",
        "RFC3986: relative path drops base query AND fragment, keeps its own query",
        {"@id": "y?q2", "http://e/p": "v"},
        {"base": "https://s.example/d/e?bq=1#bf"},
    ),
    (
        "t0062",
        "opaque schemes (urn:, mailto:) pass through untouched",
        {
            "@context": {"p": {"@id": "http://e/p", "@type": "@id"}},
            "@id": "urn:uuid:11111111-2222-3333-4444-555555555555",
            "p": ["mailto:alice@site.example", "tag:site.example,2024:x"],
        },
        {},
    ),
    (
        "t0063",
        "percent-encoding and raw unicode in @id survive resolution",
        {"@id": "caf%C3%A9/résumé", "http://e/p": "v"},
        {"base": "https://site.example/a/"},
    ),
    (
        "t0064",
        "reverse term with @container @set keeps reverse routing",
        {
            "@context": {
                "childOf": {"@reverse": "http://e/parentOf", "@container": "@set"}
            },
            "@id": "http://e/alice",
            "childOf": [{"@id": "http://e/bob"}, {"@id": "http://e/carol"}],
        },
        {},
    ),
    (
        "t0065",
        "reverse term with @type:@id coercion turns strings into node refs",
        {
            "@context": {
                "memberOf": {"@reverse": "http://e/hasMember", "@type": "@id"}
            },
            "@id": "http://e/team",
            "memberOf": ["http://e/a", "people/b"],
        },
        {"base": "https://site.example/dir/"},
    ),
    (
        "t0066",
        "@reverse map mixing term-mapped and absolute-IRI keys",
        {
            "@context": {"knows": "http://e/knows"},
            "@id": "http://e/a",
            "@reverse": {
                "knows": {"@id": "http://e/b"},
                "http://e/likes": {"@id": "http://e/c"},
            },
        },
        {},
    ),
    (
        "t0067",
        "reverse term values carrying their own forward properties",
        {
            "@context": {"childOf": {"@reverse": "http://e/parentOf"}},
            "@id": "http://e/alice",
            "childOf": {
                "@id": "http://e/bob",
                "http://e/name": "Bob",
                "http://e/age": 7,
            },
        },
        {},
    ),
    (
        "t0068",
        "keyword alias for @reverse works as a node key",
        {
            "@context": {"rev": "@reverse"},
            "@id": "http://e/a",
            "rev": {"http://e/knows": {"@id": "http://e/b"}},
        },
        {},
    ),
    (
        "t0069",
        "language map keys normalize to lowercase",
        {
            "@context": {
                "label": {"@id": "http://e/label", "@container": "@language"}
            },
            "@id": "http://e/x",
            "label": {"EN-US": "color", "DE": "Farbe"},
        },
        {},
    ),
    (
        "t0070",
        "language map entries with array values tag each member",
        {
            "@context": {
                "label": {"@id": "http://e/label", "@container": "@language"}
            },
            "@id": "http://e/x",
            "label": {"en": ["a", "b"], "fr": "c"},
        },
        {},
    ),
    (
        "t0071",
        "datatype coercion suppresses the default language",
        {
            "@context": {
                "@language": "en",
                "plain": "http://e/plain",
                "dated": {
                    "@id": "http://e/dated",
                    "@type": "http://www.w3.org/2001/XMLSchema#date",
                },
            },
            "@id": "http://e/x",
            "plain": "hello",
            "dated": "2020-01-02",
        },
        {},
    ),
    (
        "t0072",
        "default language tags strings only — numbers and booleans stay bare",
        {
            "@context": {"@language": "en"},
            "@id": "http://e/x",
            "http://e/p": ["word", 3, True, 2.5],
        },
        {},
    ),
    (
        "t0073",
        "index map whose values are node objects with @id",
        {
            "@context": {
                "byday": {"@id": "http://e/byday", "@container": "@index"}
            },
            "@id": "http://e/x",
            "byday": {
                "mon": {"@id": "http://e/m", "http://e/n": 1},
                "tue": {"@id": "http://e/t", "http://e/n": 2},
            },
        },
        {},
    ),
    (
        "t0074",
        "index map entries with array values attach the index to each member",
        {
            "@context": {"tag": {"@id": "http://e/tag", "@container": "@index"}},
            "@id": "http://e/x",
            "tag": {"a": ["x", "y"], "b": "z"},
        },
        {},
    ),
    (
        "t0075",
        "index container composed with @type:@id coercion",
        {
            "@context": {
                "link": {
                    "@id": "http://e/link",
                    "@container": "@index",
                    "@type": "@id",
                }
            },
            "@id": "http://e/x",
            "link": {"one": "a/1", "two": ["a/2", "a/3"]},
        },
        {"base": "https://site.example/d/"},
    ),
    (
        "t0076",
        "value objects carrying @index are preserved verbatim",
        {
            "@id": "http://e/x",
            "http://e/p": {"@value": "v", "@index": "k"},
        },
        {},
    ),
    (
        "t0077",
        "empty @list stays an empty list object",
        {"@id": "http://e/x", "http://e/l": {"@list": []}},
        {},
    ),
    (
        "t0078",
        "null entries inside @list drop, list survives",
        {"@id": "http://e/x", "http://e/l": {"@list": ["a", None, "b", None]}},
        {},
    ),
    (
        "t0079",
        "@list with @index keeps both",
        {
            "@id": "http://e/x",
            "http://e/l": {"@list": [1, 2], "@index": "pos"},
        },
        {},
    ),
    (
        "t0080",
        "@container @list composed with term @language tags each item",
        {
            "@context": {
                "words": {
                    "@id": "http://e/words",
                    "@container": "@list",
                    "@language": "fr",
                }
            },
            "@id": "http://e/x",
            "words": ["un", "deux"],
        },
        {},
    ),
    (
        "t0081",
        "list inside a named-graph node inside an index map (composition)",
        {
            "@context": {"g": {"@id": "http://e/g", "@container": "@index"}},
            "@id": "http://e/x",
            "g": {
                "k": {
                    "@id": "http://e/graph1",
                    "@graph": [
                        {"@id": "http://e/n", "http://e/l": {"@list": ["a", "b"]}}
                    ],
                }
            },
        },
        {},
    ),
    (
        "t0082",
        "named-graph node with @index keeps both faces",
        {
            "@id": "http://e/g",
            "@index": "ix",
            "@graph": [{"@id": "http://e/a", "http://e/p": "v"}],
        },
        {},
    ),
    (
        "t0083",
        "named graph nested inside a named-graph member node",
        {
            "@id": "http://e/outer",
            "@graph": [
                {
                    "@id": "http://e/inner",
                    "@graph": [{"@id": "http://e/a", "http://e/p": "v"}],
                    "http://e/meta": "m",
                }
            ],
        },
        {},
    ),
    (
        "t0084",
        "aliased @graph on a node with @id forms a named graph",
        {
            "@context": {"g": "@graph", "meta": "http://e/meta"},
            "@id": "http://e/g1",
            "meta": "m",
            "g": [{"@id": "http://e/a", "http://e/p": "v"}],
        },
        {},
    ),
    (
        "t0085",
        "explicit @value with native number and custom datatype",
        {
            "@id": "http://e/x",
            "http://e/p": {"@value": 5, "@type": "http://e/dt/byte"},
        },
        {},
    ),
    (
        "t0086",
        "term datatype coercion attaches @type to string values",
        {
            "@context": {
                "born": {"@id": "http://e/born", "@type": "http://e/dt/date"}
            },
            "@id": "http://e/x",
            "born": ["1999-01-01", "2000-02-02"],
        },
        {},
    ),
    (
        "t0087",
        "explicit @value boolean with custom datatype passes through",
        {
            "@id": "http://e/x",
            "http://e/p": {"@value": True, "@type": "http://e/dt/flag"},
        },
        {},
    ),
    (
        "t0088",
        "relative @base in local context resolves against document base",
        {
            "@context": {"@base": "sub/"},
            "@id": "x",
            "http://e/p": "v",
        },
        {"base": "https://site.example/a/"},
    ),
    (
        "t0089",
        "@base: null clears the base; relative @id stays relative (reference "
        "expand_iri: unresolvable document-relative values pass through)",
        {
            "@context": {"@base": None},
            "@id": "rel/x",
            "http://e/p": "v",
        },
        {"base": "https://site.example/a/"},
    ),
    (
        "t0090",
        "vocab chaining: term defined via another term as prefix",
        {
            "@context": {"a": "http://e/ns#", "b": "a:x"},
            "@id": "http://e/s",
            "b": "v",
            "a:y": "w",
        },
        {},
    ),
    (
        "t0091",
        "@vocab of '_:' expands bare properties to blank node identifiers "
        "(generalized RDF)",
        {
            "@context": {"@vocab": "_:"},
            "@id": "http://e/s",
            "p": "v",
        },
        {},
    ),
    (
        "t0092",
        "nested context changes a term's container for the subtree only",
        {
            "@context": {"tags": {"@id": "http://e/tags", "@container": "@list"}},
            "@id": "http://e/x",
            "tags": ["a", "b"],
            "http://e/child": {
                "@context": {"tags": {"@id": "http://e/tags", "@container": "@set"}},
                "@id": "http://e/y",
                "tags": ["c", "d"],
            },
        },
        {},
    ),
    (
        "t0093",
        "array context: second member defines terms atop first's mappings",
        {
            "@context": [
                {"@vocab": "http://e/v#"},
                {"special": {"@id": "http://e/special", "@type": "@id"}},
            ],
            "@id": "http://e/x",
            "plain": "p",
            "special": "http://e/target",
        },
        {},
    ),
    (
        "t0094",
        "colon-free keys with no vocab mapping drop silently",
        {
            "@context": {"known": "http://e/known"},
            "@id": "http://e/x",
            "known": "k",
            "unknownkey": "dropped",
        },
        {},
    ),
    (
        "t0095",
        "term @id referencing another term resolves through it",
        {
            "@context": {"name": "http://e/name", "label": {"@id": "name"}},
            "@id": "http://e/x",
            "label": "v",
        },
        {},
    ),
    (
        "t0096",
        "node with only @id and @type survives at top level",
        {"@id": "http://e/x", "@type": "http://e/T"},
        {},
    ),
    (
        "t0097",
        "empty object as property value stays an (empty) node object",
        {"@id": "http://e/x", "http://e/p": {}},
        {},
    ),
    (
        "t0098",
        "node reference values resolve relative @id against base",
        {"@id": "http://e/x", "http://e/p": {"@id": "other"}},
        {"base": "https://site.example/a/"},
    ),
    (
        "t0099",
        "@type array mixes terms, prefixed names, and absolute IRIs",
        {
            "@context": {"Person": "http://e/types/Person", "ns": "http://e/ns#"},
            "@id": "http://e/x",
            "@type": ["Person", "ns:Agent", "http://e/types/Thing"],
        },
        {},
    ),
    (
        "t0100",
        "unicode literals and unicode language-map values survive raw",
        {
            "@context": {
                "label": {"@id": "http://e/label", "@container": "@language"}
            },
            "@id": "http://e/x",
            "label": {"ja": "日本語", "el": "ελλ"},
            "http://e/emoji": "😀",
        },
        {},
    ),
    (
        "t0101",
        "four levels of anonymous nested nodes expand in place",
        {
            "@id": "http://e/x",
            "http://e/a": {
                "http://e/b": {"http://e/c": {"http://e/d": {"http://e/leaf": 1}}}
            },
        },
        {},
    ),
    (
        "t0102",
        "nested arrays inside @set unwrap and splice recursively",
        {
            "@id": "http://e/x",
            "http://e/p": {"@set": [["a", "b"], "c", [["d"]]]},
        },
        {},
    ),
    (
        "t0103",
        "negative zero and denormal doubles keep native values",
        {
            "@id": "http://e/x",
            "http://e/nz": -0.0,
            "http://e/denorm": 5e-324,
        },
        {},
    ),
    (
        "t0104",
        "aliased @index works on both value and node objects",
        {
            "@context": {"ix": "@index"},
            "@id": "http://e/x",
            "http://e/v": {"@value": "v", "ix": "k1"},
            "http://e/n": {"@id": "http://e/y", "ix": "k2"},
        },
        {},
    ),
    (
        "t0105",
        "index map emission is key-sorted and deterministic",
        {
            "@context": {"m": {"@id": "http://e/m", "@container": "@index"}},
            "@id": "http://e/x",
            "m": {"z": "last", "a": "first", "k": "mid"},
        },
        {},
    ),
    (
        "t0106",
        "@type values that are terms resolve through the term definition",
        {
            "@context": {"Person": "http://e/types/Person"},
            "@id": "http://e/x",
            "@type": "Person",
        },
        {},
    ),
    (
        "t0107",
        "relative @type without vocab resolves document-relative (expand_iri "
        "vocab path falls through to base, reference context.rs expand_iri)",
        {"@id": "http://e/x", "@type": "types/T"},
        {"base": "https://site.example/a/"},
    ),
    (
        "t0108",
        "aliased @id composes with reverse terms on nested nodes",
        {
            "@context": {"iri": "@id", "childOf": {"@reverse": "http://e/parentOf"}},
            "iri": "http://e/alice",
            "childOf": {"iri": "http://e/bob"},
        },
        {},
    ),
    (
        "t0109",
        "nulls interleaved in value arrays drop; survivors keep order",
        {"@id": "http://e/x", "http://e/p": [None, "keep", None, 2, None]},
        {},
    ),
    (
        "t0110",
        "hash-namespace prefix composes with suffixes",
        {
            "@context": {"ns": "http://e/vocab#"},
            "@id": "http://e/x",
            "ns:alpha": "a",
            "ns:beta": {"@id": "ns:gamma"},
        },
        {},
    ),
    (
        "t0111",
        "slash-terminated prefix composes with multi-segment suffixes",
        {
            "@context": {"api": "http://e/api/"},
            "@id": "http://e/x",
            "api:v1/items": "listing",
        },
        {},
    ),
    (
        "t0112",
        "explicit blank node labels shared across references survive",
        {
            "@id": "http://e/x",
            "http://e/p": {"@id": "_:b0", "http://e/n": "inner"},
            "http://e/q": {"@id": "_:b0"},
        },
        {},
    ),
    (
        "t0113",
        "reverse value nodes may nest forward children (deep reverse)",
        {
            "@context": {"childOf": {"@reverse": "http://e/parentOf"}},
            "@id": "http://e/alice",
            "childOf": {
                "@id": "http://e/bob",
                "http://e/pet": {"@id": "http://e/rex", "http://e/kind": "dog"},
            },
        },
        {},
    ),
    (
        "t0114",
        "list container composed with datatype coercion types each item",
        {
            "@context": {
                "dates": {
                    "@id": "http://e/dates",
                    "@container": "@list",
                    "@type": "http://www.w3.org/2001/XMLSchema#date",
                }
            },
            "@id": "http://e/x",
            "dates": ["2020-01-01", "2020-02-02"],
        },
        {},
    ),
    (
        "t0115",
        "same property via term and via absolute IRI merges into one array",
        {
            "@context": {"p": "http://e/p"},
            "@id": "http://e/x",
            "p": "via-term",
            "http://e/p": "via-iri",
        },
        {},
    ),
    (
        "t0116",
        "inside @graph: tagged value objects drop, lone-@id nodes drop, "
        "real nodes survive",
        {
            "@graph": [
                {"@value": "free", "@language": "en"},
                {"@id": "http://e/only-id"},
                {"@id": "http://e/real", "http://e/p": "v"},
            ]
        },
        {},
    ),
]

# ---------------------------------------------------------------------------
# Round-4 long tail (VERDICT r3 #5): exotic container × @reverse
# compositions, nested @list edge cases, IRI-resolution corners, context
# machinery, and drop-rule corners — the shapes the full public W3C suite
# iterates (reference test_expand.rs:119-124) that the curated set lacked.
# Same authoring discipline: outputs generated, then hand-reviewed against
# the JSON-LD 1.0 algorithm + reference semantics before committing.
# ---------------------------------------------------------------------------

EX = "http://ex.example/"

CASES += [
    # -- container × @reverse compositions -------------------------------
    (
        "t0117",
        "reverse term with @container @index: array values per index key",
        {
            "@context": {
                "childOf": {
                    "@reverse": EX + "parentOf",
                    "@container": "@index",
                }
            },
            "@id": EX + "kid",
            "childOf": {
                "a": [{"@id": EX + "ma"}, {"@id": EX + "pa"}],
                "b": {"@id": EX + "guardian"},
            },
        },
        {},
    ),
    (
        "t0118",
        "reverse term with @container @set AND @type:@id coercion on strings",
        {
            "@context": {
                "memberOf": {
                    "@reverse": EX + "hasMember",
                    "@type": "@id",
                    "@container": "@set",
                }
            },
            "@id": EX + "alice",
            "memberOf": [EX + "choir", EX + "club"],
        },
        {},
    ),
    (
        "t0119",
        "index-container reverse term inside an explicit @reverse map",
        {
            "@context": {
                "rel": {"@id": EX + "rel", "@container": "@index"},
            },
            "@id": EX + "hub",
            "@reverse": {
                "rel": {
                    "k1": {"@id": EX + "s1"},
                    "k2": [{"@id": EX + "s2"}, {"@id": EX + "s3"}],
                }
            },
        },
        {},
    ),
    (
        "t0120",
        "double flip: reverse term inside a node that is itself a reverse value",
        {
            "@context": {
                "childOf": {"@reverse": EX + "parentOf"},
                "name": EX + "name",
            },
            "@id": EX + "x",
            "childOf": {
                "@id": EX + "mid",
                "childOf": {"@id": EX + "deep", "name": "leaf"},
            },
        },
        {},
    ),
    (
        "t0121",
        "index-container reverse term whose node values carry forward AND reverse props",
        {
            "@context": {
                "cites": {"@reverse": EX + "citedBy", "@container": "@index"},
                "title": EX + "title",
                "authorOf": {"@reverse": EX + "author"},
            },
            "@id": EX + "paper",
            "cites": {
                "sec1": {
                    "@id": EX + "other",
                    "title": "Other Paper",
                    "authorOf": {"@id": EX + "bob"},
                }
            },
        },
        {},
    ),
    (
        "t0122",
        "aliased @reverse keyword with term-mapped keys and @type:@id coercion",
        {
            "@context": {
                "rev": "@reverse",
                "knows": {"@id": EX + "knows", "@type": "@id"},
            },
            "@id": EX + "me",
            "rev": {"knows": EX + "friend"},
        },
        {},
    ),
    (
        "t0123",
        "reverse term node values resolve relative @id against base",
        {
            "@context": {"childOf": {"@reverse": EX + "parentOf"}},
            "@id": "kids/1",
            "childOf": {"@id": "parents/9"},
        },
        {"base": "https://site.example/reg/entry"},
    ),
    (
        "t0124",
        "@reverse map on a node nested inside a named graph",
        {
            "@context": {"name": EX + "name"},
            "@id": EX + "g",
            "@graph": [
                {
                    "@id": EX + "inner",
                    "name": "inner",
                    "@reverse": {EX + "points": {"@id": EX + "src"}},
                }
            ],
        },
        {},
    ),
    (
        "t0125",
        "reverse term with empty array keeps an EMPTY reverse entry (reference "
        "quirk: eager insert, expand.rs:551; the W3C algorithm creates entries "
        "lazily per item and would emit only the bare node)",
        {
            "@context": {
                "childOf": {"@reverse": EX + "parentOf"},
                "name": EX + "name",
            },
            "@id": EX + "x",
            "name": "still here",
            "childOf": [],
        },
        {},
    ),
    (
        "t0126",
        "two reverse terms mapping to the same IRI merge into one reverse entry",
        {
            "@context": {
                "childOf": {"@reverse": EX + "parentOf"},
                "kidOf": {"@reverse": EX + "parentOf"},
            },
            "@id": EX + "x",
            "childOf": {"@id": EX + "a"},
            "kidOf": {"@id": EX + "b"},
        },
        {},
    ),
    (
        "t0127",
        "same IRI used forward and reverse on one node keeps both directions",
        {
            "@context": {
                "parentOf": EX + "parentOf",
                "childOf": {"@reverse": EX + "parentOf"},
            },
            "@id": EX + "x",
            "parentOf": {"@id": EX + "down"},
            "childOf": {"@id": EX + "up"},
        },
        {},
    ),
    (
        "t0128",
        "reverse chain two deep: reverse value node containing a reverse term",
        {
            "@context": {"childOf": {"@reverse": EX + "parentOf"}},
            "@id": EX + "leaf",
            "childOf": {
                "@id": EX + "mid",
                "@reverse": {EX + "owns": {"@id": EX + "owner"}},
            },
        },
        {},
    ),
    (
        "t0129",
        "index-container reverse term with non-map value expands as plain reverse",
        {
            "@context": {
                "memberOf": {
                    "@reverse": EX + "hasMember",
                    "@type": "@id",
                    "@container": "@index",
                }
            },
            "@id": EX + "alice",
            "memberOf": EX + "choir",
        },
        {},
    ),
    (
        "t0130",
        "@reverse map whose inner nodes use an aliased @id",
        {
            "@context": {"iri": "@id", "knows": EX + "knows"},
            "iri": EX + "me",
            "@reverse": {"knows": {"iri": EX + "them"}},
        },
        {},
    ),
    (
        "t0131",
        "index map of nodes each carrying a reverse term (container inside container)",
        {
            "@context": {
                "entries": {"@id": EX + "entries", "@container": "@index"},
                "childOf": {"@reverse": EX + "parentOf"},
            },
            "@id": EX + "reg",
            "entries": {
                "e1": {"@id": EX + "n1", "childOf": {"@id": EX + "p1"}},
                "e2": {"@id": EX + "n2", "childOf": {"@id": EX + "p2"}},
            },
        },
        {},
    ),
    # -- nested @list edge cases -----------------------------------------
    (
        "t0132",
        "list container with a single scalar wraps to a one-element list",
        {
            "@context": {"l": {"@id": EX + "l", "@container": "@list"}},
            "@id": EX + "x",
            "l": "only",
        },
        {},
    ),
    (
        "t0133",
        "list container with null value: the property drops entirely",
        {
            "@context": {
                "l": {"@id": EX + "l", "@container": "@list"},
                "name": EX + "name",
            },
            "@id": EX + "x",
            "name": "kept",
            "l": None,
        },
        {},
    ),
    (
        "t0134",
        "node inside a list carrying its own list property (list→node→list)",
        {
            "@context": {"l": {"@id": EX + "l", "@container": "@list"}},
            "@id": EX + "x",
            "l": [{"@id": EX + "n", "l": ["inner1", "inner2"]}, "tail"],
        },
        {},
    ),
    (
        "t0135",
        "explicit @list of value objects with mixed datatypes and languages",
        {
            "@id": EX + "x",
            EX + "l": {
                "@list": [
                    {"@value": "2020-01-01", "@type": EX + "date"},
                    {"@value": "chat", "@language": "FR"},
                    {"@value": 7},
                    "plain",
                ]
            },
        },
        {},
    ),
    (
        "t0136",
        "explicit @list objects as index-map entry values",
        {
            "@context": {
                "m": {"@id": EX + "m", "@container": "@index"},
            },
            "@id": EX + "x",
            "m": {
                "i1": {"@list": ["a", "b"]},
                "i2": {"@list": []},
            },
        },
        {},
    ),
    (
        "t0137",
        "explicit @list with null members: nulls drop, list survives ordered",
        {
            "@context": {"l": {"@id": EX + "l", "@container": "@list"}},
            "@id": EX + "x",
            "l": {"@list": [None, "a", None, "b", None]},
        },
        {},
    ),
    (
        "t0138",
        "list container + term @language: strings tagged, numbers bare, nulls drop",
        {
            "@context": {
                "l": {"@id": EX + "l", "@container": "@list", "@language": "de"}
            },
            "@id": EX + "x",
            "l": ["wort", 5, None, "zwei"],
        },
        {},
    ),
    (
        "t0139",
        "three-level list→node→list→node nesting expands in place",
        {
            "@context": {"l": {"@id": EX + "l", "@container": "@list"}},
            "@id": EX + "top",
            "l": [
                {
                    "@id": EX + "mid",
                    "l": [{"@id": EX + "leaf", EX + "p": "v"}],
                }
            ],
        },
        {},
    ),
    (
        "t0140",
        "list under a forward property of a reverse-value node",
        {
            "@context": {
                "childOf": {"@reverse": EX + "parentOf"},
                "steps": {"@id": EX + "steps", "@container": "@list"},
            },
            "@id": EX + "x",
            "childOf": {"@id": EX + "parent", "steps": [1, 2, 3]},
        },
        {},
    ),
    (
        "t0141",
        "aliased @list keyword builds a list object",
        {
            "@context": {"lst": "@list"},
            "@id": EX + "x",
            EX + "l": {"lst": ["a", "b"]},
        },
        {},
    ),
    (
        "t0142",
        "list container + @type:@id coercion resolves relative members against base",
        {
            "@context": {
                "chain": {
                    "@id": EX + "chain",
                    "@container": "@list",
                    "@type": "@id",
                }
            },
            "@id": "root",
            "chain": ["a/1", "../up", "#frag"],
        },
        {"base": "https://site.example/dir/doc"},
    ),
    (
        "t0143",
        "@list with @index keeps both through an index-container term",
        {
            "@context": {
                "m": {"@id": EX + "m", "@container": "@index"},
            },
            "@id": EX + "x",
            "m": {"k": {"@list": ["a"], "@index": "override"}},
        },
        {},
    ),
    (
        "t0144",
        "empty-string and whitespace members survive in list order",
        {
            "@context": {"l": {"@id": EX + "l", "@container": "@list"}},
            "@id": EX + "x",
            "l": ["", " ", "\t", "end"],
        },
        {},
    ),
    (
        "t0145",
        "long mixed list preserves order across scalars, nodes, and typed values",
        {
            "@id": EX + "x",
            EX + "l": {
                "@list": [
                    1,
                    "two",
                    {"@id": EX + "three"},
                    {"@value": "4", "@type": EX + "num"},
                    True,
                    5.5,
                    {"@value": "sechs", "@language": "de"},
                ]
            },
        },
        {},
    ),
    (
        "t0146",
        "two list-container terms for the same IRI keep separate list values",
        {
            "@context": {
                "l1": {"@id": EX + "l", "@container": "@list"},
                "l2": {"@id": EX + "l", "@container": "@list"},
            },
            "@id": EX + "x",
            "l1": ["a"],
            "l2": ["b"],
        },
        {},
    ),
    # -- IRI resolution corners (RFC 3986 long tail) ---------------------
    (
        "t0147",
        "RFC3986: base with explicit port — relative refs keep host:port",
        {
            "@id": "item",
            EX + "p": {"@id": "/abs"},
        },
        {"base": "https://host.example:8443/api/v1/doc"},
    ),
    (
        "t0148",
        "RFC3986: base with userinfo — authority survives resolution intact",
        {
            "@id": "child",
            EX + "p": "v",
        },
        {"base": "ftp://user:pw@files.example/dir/f"},
    ),
    (
        "t0149",
        "RFC3986: IPv6 literal authority survives relative resolution",
        {
            "@id": "sub/item",
            EX + "p": "v",
        },
        {"base": "http://[2001:db8::1]:8080/root/doc"},
    ),
    (
        "t0150",
        "colon-containing value passes through IRI expansion UNRESOLVED: "
        "expand_iri's compact-IRI split treats any 'p:s' with unknown prefix "
        "as an absolute IRI and never reaches document-relative resolution "
        "(JSON-LD 1.0 IRI expansion; RFC3986 alone would resolve to "
        "dir/this:that)",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": "./this:that",
        },
        {"base": "https://site.example/dir/doc"},
    ),
    (
        "t0151",
        "RFC3986: lone '#' resolves to base plus empty fragment",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": "#",
        },
        {"base": "https://site.example/dir/doc?q=1"},
    ),
    (
        "t0152",
        "RFC3986: lone '?' replaces the query with an empty one, keeps path",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": "?",
        },
        {"base": "https://site.example/dir/doc?old=1"},
    ),
    (
        "t0153",
        "RFC3986: consecutive slashes inside a path are ordinary segments",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": ["a//b", "//netpath.example/c"],
        },
        {"base": "https://site.example/d1/d2/doc"},
    ),
    (
        "t0154",
        "RFC3986: query+fragment reference replaces both, keeps path",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": "?q=2#sec",
        },
        {"base": "https://site.example/dir/doc?q=1#old"},
    ),
    (
        "t0155",
        "RFC3986: trailing-slash base treats the directory itself as segment zero",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": "leaf",
            "p": ["../sib", "./same", "kid"],
        },
        {"base": "https://site.example/a/b/"},
    ),
    (
        "t0156",
        "RFC3986: percent-encoded characters in base and reference pass through",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": "sp%20ace/%C3%A9",
        },
        {"base": "https://site.example/enc%2Fdir/doc"},
    ),
    (
        "t0157",
        "RFC3986: path segments with semicolon params still honor dot-segments",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": "g;x=1/./y",
        },
        {"base": "https://site.example/dir/doc"},
    ),
    (
        "t0158",
        "RFC3986: percent-encoded '..%2F' is NOT a dot-segment",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": "..%2Fup",
        },
        {"base": "https://site.example/dir/doc"},
    ),
    (
        "t0159",
        "RFC3986: base WITH fragment — refs drop the base fragment (regression "
        "pin for the round-3 iri.resolve empty-ref bug), non-empty and empty",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": ["", "other"],
        },
        {"base": "https://site.example/dir/doc#oldfrag"},
    ),
    (
        "t0160",
        "RFC3986: scheme-relative reference with its own query and fragment",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": "//h2.example/p?q=9#f",
        },
        {"base": "https://site.example/dir/doc?q=1"},
    ),
    (
        "t0161",
        "absolute IRI values pass through resolution untouched (mixed array)",
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": EX + "x",
            "p": ["urn:isbn:0451450523", "mailto:a@b.example", "rel/ative"],
        },
        {"base": "https://site.example/dir/doc"},
    ),
    (
        "t0162",
        "same relative string: @type resolves via vocab, @id via base",
        {
            "@context": {"@vocab": "http://vocab.example/ns#"},
            "@id": "thing",
            "@type": "thing",
        },
        {"base": "https://site.example/dir/doc"},
    ),
    # -- context & term machinery ----------------------------------------
    (
        "t0163",
        "empty @context array is a no-op",
        {
            "@context": [],
            "@id": EX + "x",
            EX + "p": "v",
        },
        {},
    ),
    (
        "t0164",
        "@context array [null, {...}]: reset then rebuild in sequence",
        {
            "@context": [
                {"@vocab": "http://old.example/"},
                None,
                {"name": EX + "name"},
            ],
            "@id": EX + "x",
            "name": "built after reset",
            "orphan": "dropped (vocab was reset)",
        },
        {},
    ),
    (
        "t0165",
        "term whose @id is the keyword @type acts as a keyword alias",
        {
            "@context": {"kind": {"@id": "@type"}},
            "@id": EX + "x",
            "kind": EX + "T",
        },
        {},
    ),
    (
        "t0166",
        "three-deep prefix chaining: term via term via term",
        {
            "@context": {
                "a": "http://chain.example/base/",
                "b": "a:mid/",
                "c": "b:leaf",
            },
            "@id": EX + "x",
            "c": "v",
        },
        {},
    ),
    (
        "t0167",
        "language-map keys beat the context default language",
        {
            "@context": {
                "@language": "en",
                "label": {"@id": EX + "label", "@container": "@language"},
                "plain": EX + "plain",
            },
            "@id": EX + "x",
            "label": {"de": "Hund"},
            "plain": "dog",
        },
        {},
    ),
    (
        "t0168",
        "term @language null inside a language-defaulted context blocks tagging "
        "under @set container",
        {
            "@context": {
                "@language": "en",
                "bare": {
                    "@id": EX + "bare",
                    "@language": None,
                    "@container": "@set",
                },
            },
            "@id": EX + "x",
            "bare": "untagged",
        },
        {},
    ),
    (
        "t0169",
        "context keys process in SORTED order (serde_json BTreeMap quirk): "
        "'Z' defines after 'a' regardless of JSON order",
        {
            "@context": {
                "z": "http://late.example/",
                "a": "http://early.example/",
                "zp": {"@id": "z:prop"},
                "ap": {"@id": "a:prop"},
            },
            "@id": EX + "x",
            "zp": "v1",
            "ap": "v2",
        },
        {},
    ),
    (
        "t0170",
        "scoped override: inner context redefines a prefix used by an outer term's "
        "future uses (term IRIs resolve at definition time, not use time)",
        {
            "@context": {
                "pre": "http://one.example/",
                "p": {"@id": "pre:prop"},
            },
            "@id": EX + "x",
            "p": "outer",
            EX + "sub": {
                "@context": {"pre": "http://two.example/"},
                "@id": EX + "inner",
                "p": "inner still one.example (defined earlier)",
                "pre:direct": "two.example now",
            },
        },
        {},
    ),
    (
        "t0171",
        "term mapping to a blank-node identifier as @id",
        {
            "@context": {"secret": {"@id": "_:hidden"}},
            "@id": EX + "x",
            "secret": "v",
        },
        {},
    ),
    (
        "t0172",
        "index-map keys emit lexicographically sorted ('10' before '2')",
        {
            "@context": {"m": {"@id": EX + "m", "@container": "@index"}},
            "@id": EX + "x",
            "m": {"2": "two", "10": "ten", "1": "one"},
        },
        {},
    ),
    (
        "t0173",
        "keyword aliases for @value and @language compose in one value object",
        {
            "@context": {"val": "@value", "tongue": "@language"},
            "@id": EX + "x",
            EX + "p": {"val": "bonjour", "tongue": "FR"},
        },
        {},
    ),
    (
        "t0174",
        "aliased @set unwraps on a property value",
        {
            "@context": {"coll": "@set"},
            "@id": EX + "x",
            EX + "p": {"coll": ["a", "b"]},
        },
        {},
    ),
    (
        "t0175",
        "@type values expand through term definitions (term → absolute IRI)",
        {
            "@context": {"Creature": EX + "Creature"},
            "@id": EX + "x",
            "@type": ["Creature", EX + "Direct"],
        },
        {},
    ),
    (
        "t0176",
        "later array-context member fully REPLACES a term definition "
        "(container from the first member does not survive)",
        {
            "@context": [
                {"p": {"@id": EX + "p", "@container": "@list"}},
                {"p": {"@id": EX + "p"}},
            ],
            "@id": EX + "x",
            "p": ["a", "b"],
        },
        {},
    ),
    (
        "t0177",
        "term chains through a prefix that is itself vocab-expanded",
        {
            "@context": {
                "@vocab": "http://vocab.example/ns#",
                "shortcut": "inner",
                "deep": {"@id": "shortcut"},
            },
            "@id": EX + "x",
            "deep": "v",
            "shortcut": "w",
        },
        {},
    ),
    (
        "t0178",
        "expandContext option seeds terms; inline context overrides per doc",
        {
            "@context": {"name": EX + "override#name"},
            "@id": EX + "x",
            "name": "overridden",
            "age": 3,
        },
        {
            "expandContext": {
                "name": EX + "seed#name",
                "age": EX + "seed#age",
            }
        },
    ),
    # -- node/value drop rules & compositions ----------------------------
    (
        "t0179",
        "free-floating node with ONLY @index survives (the drop rules cover "
        "value objects, only-@id, and lone-@language — not lone-@index)",
        {"@index": "i"},
        {},
    ),
    (
        "t0180",
        "a term named like an at-keyword ('@foo') is ignored even when defined "
        "in the context; a node left with only @id drops at the root",
        {
            "@context": {"@foo": EX + "foo"},
            "@id": EX + "x",
            "@foo": "v",
        },
        {},
    ),
    (
        "t0181",
        "empty-string property key cannot expand to an IRI and drops",
        {
            "@id": EX + "x",
            "": "dropped",
            EX + "kept": "v",
        },
        {},
    ),
    (
        "t0182",
        "@value null with @type: the whole value drops, then the only-@id node drops",
        {
            "@id": EX + "x",
            EX + "p": {"@value": None, "@type": EX + "T"},
        },
        {},
    ),
    (
        "t0183",
        "duplicate identical node references are NOT deduplicated at expansion",
        {
            "@id": EX + "x",
            EX + "p": [{"@id": EX + "a"}, {"@id": EX + "a"}],
        },
        {},
    ),
    (
        "t0184",
        "exotic composition: index map → named graph member → reverse → list",
        {
            "@context": {
                "parts": {"@id": EX + "parts", "@container": "@index"},
                "childOf": {"@reverse": EX + "parentOf"},
                "steps": {"@id": EX + "steps", "@container": "@list"},
            },
            "@id": EX + "root",
            "parts": {
                "k1": {
                    "@id": EX + "g1",
                    "@graph": [
                        {
                            "@id": EX + "m",
                            "childOf": {"@id": EX + "p1", "steps": ["a", 2]},
                        }
                    ],
                }
            },
        },
        {},
    ),
    (
        "t0185",
        "@set inside an explicit @list unwraps and splices (no list-of-lists)",
        {
            "@id": EX + "x",
            EX + "l": {"@list": [{"@set": ["a", "b"]}, "c"]},
        },
        {},
    ),
    (
        "t0186",
        "index container on a term whose entry value is a named-graph node",
        {
            "@context": {"g": {"@id": EX + "g", "@container": "@index"}},
            "@id": EX + "x",
            "g": {"k": {"@graph": [{"@id": EX + "n", EX + "p": "v"}]}},
        },
        {},
    ),
    (
        "t0187",
        "term @type coercion does NOT touch explicit value objects (bare or typed)",
        {
            "@context": {"p": {"@id": EX + "p", "@type": EX + "Coerce"}},
            "@id": EX + "x",
            "p": [
                {"@value": "bare"},
                {"@value": "typed", "@type": EX + "Explicit"},
                "raw gets coerced",
            ],
        },
        {},
    ),
    (
        "t0188",
        "relative @vocab is accepted verbatim (reference quirk: no IRI "
        "validation, context.py module docstring); colon-free expanded "
        "properties then drop",
        {
            "@context": {"@vocab": "rel/"},
            "@id": EX + "x",
            "p": "dropped (expands to rel/p, not an absolute IRI)",
            EX + "kept": "v",
        },
        {},
    ),
    (
        "t0189",
        "unicode term names and unicode prefix composition expand raw",
        {
            "@context": {"prénom": EX + "name", "ü": EX + "u#"},
            "@id": EX + "x",
            "prénom": "Zoé",
            "ü:tail": "v",
        },
        {},
    ),
    (
        "t0190",
        "multi-subtag language tags lowercase wholesale (EN-Latn-US)",
        {
            "@id": EX + "x",
            EX + "p": {"@value": "v", "@language": "EN-Latn-US"},
        },
        {},
    ),
    (
        "t0191",
        "one IRI via a coerced and a plain term: node ref and literal coexist",
        {
            "@context": {
                "pa": {"@id": EX + "p", "@type": "@id"},
                "pb": EX + "p",
            },
            "@id": EX + "x",
            "pa": "rel",
            "pb": "rel",
        },
        {"base": "https://site.example/dir/doc"},
    ),
    (
        "t0192",
        "top-level array of node objects, each with its own context",
        [
            {"@context": {"n": EX + "a#n"}, "@id": EX + "one", "n": 1},
            {"@context": {"n": EX + "b#n"}, "@id": EX + "two", "n": 2},
        ],
        {},
    ),
    (
        "t0193",
        "value object with @index plus @language keeps both",
        {
            "@id": EX + "x",
            EX + "p": {"@value": "chat", "@language": "fr", "@index": "i9"},
        },
        {},
    ),
    (
        "t0194",
        "nodes under a vocab-expanded @type-less property key with @id aliasing "
        "inside an index map",
        {
            "@context": {
                "@vocab": EX,
                "iri": "@id",
                "m": {"@container": "@index"},
            },
            "iri": EX + "x",
            "m": {"z": {"iri": EX + "inner", "w": "v"}},
        },
        {},
    ),
    (
        "t0195",
        "@graph alongside ordinary properties AND @index on one node",
        {
            "@id": EX + "g",
            "@index": "gidx",
            EX + "meta": "m",
            "@graph": [{"@id": EX + "in", EX + "p": "v"}],
        },
        {},
    ),
    (
        "t0196",
        "empty top-level object expands to an empty array",
        {},
        {},
    ),
    (
        "t0197",
        "explicit @list DIRECTLY nested in @list expands (quirk shared by the "
        "reference and the 1.0 algorithm's guard placement: the array-branch "
        "list-of-lists check fires only when the ACTIVE PROPERTY is @list or "
        "has a @list container, expand.rs:162-177; the @list-branch check "
        "only catches a non-array value expanding TO a list object, "
        "expand.rs:308-311 — 1.1 later legalized nested lists)",
        {
            "@id": EX + "x",
            EX + "p": {"@list": [{"@list": ["inner"]}, "flat"]},
        },
        {},
    ),
    (
        "t0198",
        "empty-string @id resolves to the base sans fragment",
        {"@id": "", EX + "p": "v"},
        {"base": "https://b.example/d/doc#bf"},
    ),
    (
        "t0199",
        "'../' @id resolves to the parent directory IRI",
        {"@id": "../", EX + "p": "v"},
        {"base": "https://b.example/d/doc"},
    ),
    (
        "t0200",
        "compact IRI with EMPTY suffix ('pre:') expands to the bare prefix IRI",
        {
            "@context": {"pre": EX + "ns/"},
            "@id": EX + "x",
            "pre:": "v",
        },
        {},
    ),
    (
        "t0201",
        "terms named like JSON literals ('true', '1') are ordinary terms",
        {
            "@context": {"true": EX + "true", "1": EX + "one"},
            "@id": EX + "x",
            "true": "v",
            "1": "w",
        },
        {},
    ),
    (
        "t0202",
        "nested relative @base chains: each level resolves against the last",
        {
            "@context": {"@base": "sub/"},
            "@id": "leaf",
            EX + "p": {
                "@context": {"@base": "deeper/"},
                "@id": "tip",
                EX + "q": "v",
            },
        },
        {"base": "https://b.example/d/doc"},
    ),
    (
        "t0203",
        "@base null then a new absolute @base in one context array",
        {
            "@context": [{"@base": None}, {"@base": "http://new.example/root/"}],
            "@id": "item",
            EX + "p": "v",
        },
        {"base": "https://old.example/gone"},
    ),
    (
        "t0204",
        "anonymous @graph object as a property value (graph without @id)",
        {
            "@id": EX + "x",
            EX + "p": {"@graph": [{"@id": EX + "n", EX + "q": "v"}]},
        },
        {},
    ),
    (
        "t0205",
        "index-container term with default language: entries get BOTH @index "
        "and the default @language",
        {
            "@context": {
                "@language": "en",
                "m": {"@id": EX + "m", "@container": "@index"},
            },
            "@id": EX + "x",
            "m": {"k": "txt"},
        },
        {},
    ),
    (
        "t0206",
        "value object written entirely via keyword aliases (@value + @type)",
        {
            "@context": {"v": "@value", "t": "@type"},
            "@id": EX + "x",
            EX + "p": {"v": 3, "t": EX + "Num"},
        },
        {},
    ),
    (
        "t0207",
        "scalar under aliased @graph leaves a literal null @graph entry "
        "(reference quirk: the keyword-branch insert has no null guard, "
        "expand.rs result.insert after the @graph match arm — the non-keyword "
        "branch's is_null continue at expand.rs:498 does not apply)",
        {
            "@context": {"g": "@graph"},
            "@id": EX + "x",
            "g": "scalar",
        },
        {},
    ),
    (
        "t0208",
        "@type on the node and an explicitly typed value object coexist",
        {
            "@context": {"@vocab": "http://v/"},
            "@id": EX + "x",
            "@type": ["A", "B"],
            "p": {"@value": "s", "@type": "http://v/T"},
        },
        {},
    ),
    (
        "t0209",
        "integral-valued native double stays a double through expansion",
        {"@id": EX + "x", EX + "p": {"@value": 1.0}},
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


# Round-4 negative long tail: remaining reference error branches not yet
# pinned by te001-te034 (each code verified against the reference's error
# enum in expand.rs:14-67 / creation.rs:60-95).
NEGATIVE_CASES += [
    (
        "te035",
        "@list object under a reverse property (the other half of the "
        "expand.rs:542-548 check; te016 pins the @value half)",
        {
            "@context": {"r": {"@reverse": EX + "p"}},
            "@id": EX + "x",
            "r": {"@list": ["a"]},
        },
        {},
        E.INVALID_REVERSE_PROPERTY_VALUE,
    ),
    (
        "te036",
        "null @language in a value object (only string tags are valid)",
        {EX + "p": {"@value": "v", "@language": None}},
        {},
        E.INVALID_LANGUAGE_TAGGED_STRING,
    ),
    (
        "te037",
        "term mapped to the empty string is an invalid IRI mapping",
        {"@context": {"t": ""}, "t": "v"},
        {},
        E.INVALID_IRI_MAPPING,
    ),
    (
        "te038",
        "@value holding an array is an invalid value object value",
        {EX + "p": {"@value": ["a"]}},
        {},
        E.INVALID_VALUE_OBJECT_VALUE,
    ),
    (
        "te039",
        "numeric @type on a node is an invalid type value",
        {"@id": EX + "x", "@type": 7},
        {},
        E.INVALID_TYPE_VALUE,
    ),
    (
        "te040",
        "node object as a language-map entry is an invalid language map value",
        {
            "@context": {"l": {"@id": EX + "l", "@container": "@language"}},
            "l": {"en": {"@id": EX + "n"}},
        },
        {},
        E.INVALID_LANGUAGE_MAP_VALUE,
    ),
    (
        "te041",
        "a term @reverse of a keyword is an invalid IRI mapping",
        {
            "@context": {"r": {"@reverse": "@reverse"}},
            "r": {"@id": EX + "y"},
        },
        {},
        E.INVALID_IRI_MAPPING,
    ),
    (
        "te042",
        "array @container in a term definition (1.0 allows a single value)",
        {
            "@context": {"t": {"@id": EX + "t", "@container": ["@set", "@index"]}},
            "t": "v",
        },
        {},
        E.INVALID_CONTAINER_MAPPING,
    ),
    (
        "te043",
        "@reverse whose value is an array is an invalid @reverse value",
        {
            "@id": EX + "x",
            "@reverse": [{EX + "p": {"@id": EX + "y"}}],
        },
        {},
        E.INVALID_REVERSE_VALUE,
    ),
]



# ---------------------------------------------------------------------------
# Round-5 spec-authored cases (ADVICE r4 #2): for every case below the
# EXPECTED output is hand-derived from the JSON-LD 1.0 expansion algorithm
# (W3C CR 2014, §8) + RFC 3986 §5 and written literally here — it is NOT
# produced by the implementation under test. The generator ASSERTS that
# jsonldpy reproduces each authored output and aborts on any mismatch, so
# these fixtures are independent conformance evidence, not regression
# locks. Manifest entries carry "provenance": "spec-authored".
# Themes per VERDICT r4 #5: keyword-alias × container composition and
# relative-IRI resolution corners.
# ---------------------------------------------------------------------------

_RB = "https://site.example/a/b/c"  # base for the RFC 3986 corner cases

SPEC_CASES = [
    # (id, name, input_doc, option, authored_expected)
    # -- keyword aliases × containers ------------------------------------
    (
        "ts001",
        "aliases for @id and @type in a node object",
        {
            "@context": {"ID": "@id", "TYPE": "@type", "name": "http://s.example/name"},
            "ID": "http://e.example/a",
            "TYPE": "http://e.example/T",
            "name": "x",
        },
        {},
        [
            {
                "@id": "http://e.example/a",
                "@type": ["http://e.example/T"],
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts002",
        "aliases for @value and @language in a value object",
        {
            "@context": {"V": "@value", "L": "@language", "p": {"@id": "http://e.example/p"}},
            "p": {"V": "hi", "L": "en"},
        },
        {},
        [{"http://e.example/p": [{"@value": "hi", "@language": "en"}]}],
    ),
    (
        "ts003",
        "alias for @list wraps the array",
        {
            "@context": {"LIST": "@list", "p": {"@id": "http://e.example/p"}},
            "p": {"LIST": ["a", "b"]},
        },
        {},
        [{"http://e.example/p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
    ),
    (
        "ts004",
        "alias for @set unwraps",
        {
            "@context": {"SET": "@set", "p": {"@id": "http://e.example/p"}},
            "p": {"SET": ["a"]},
        },
        {},
        [{"http://e.example/p": [{"@value": "a"}]}],
    ),
    (
        "ts005",
        "alias for @index is preserved on the expanded node object",
        {
            "@context": {"IDX": "@index", "name": "http://s.example/name"},
            "@id": "http://e.example/n",
            "IDX": "i1",
            "name": "x",
        },
        {},
        [
            {
                "@id": "http://e.example/n",
                "@index": "i1",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts006",
        "alias for @graph forms a named graph",
        {
            "@context": {"G": "@graph", "name": "http://s.example/name"},
            "@id": "http://e.example/g",
            "G": [{"@id": "http://e.example/n", "name": "x"}],
        },
        {},
        [
            {
                "@id": "http://e.example/g",
                "@graph": [
                    {
                        "@id": "http://e.example/n",
                        "http://s.example/name": [{"@value": "x"}],
                    }
                ],
            }
        ],
    ),
    (
        "ts007",
        "alias for @reverse builds a reverse-property map",
        {
            "@context": {"REV": "@reverse"},
            "@id": "http://e.example/x",
            "REV": {"http://e.example/p": {"@id": "http://e.example/y"}},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "@reverse": {
                    "http://e.example/p": [{"@id": "http://e.example/y"}]
                },
            }
        ],
    ),
    (
        "ts008",
        "alias for @type composes with @type-coerced term values",
        {
            "@context": {
                "TYPE": "@type",
                "knows": {"@id": "http://s.example/knows", "@type": "@id"},
            },
            "TYPE": "http://e.example/T",
            "knows": "http://e.example/y",
        },
        {},
        [
            {
                "@type": ["http://e.example/T"],
                "http://s.example/knows": [{"@id": "http://e.example/y"}],
            }
        ],
    ),
    # -- container maps ---------------------------------------------------
    (
        "ts010",
        "language map iterates keys in sorted order",
        {
            "@context": {
                "label": {"@id": "http://s.example/label", "@container": "@language"}
            },
            "@id": "http://e.example/n",
            "label": {"en": "hi", "de": ["hallo", "servus"]},
        },
        {},
        [
            {
                "@id": "http://e.example/n",
                "http://s.example/label": [
                    {"@value": "hallo", "@language": "de"},
                    {"@value": "servus", "@language": "de"},
                    {"@value": "hi", "@language": "en"},
                ],
            }
        ],
    ),
    (
        "ts011",
        "index map mixes node and string values, sorted by index key",
        {
            "@context": {
                "item": {"@id": "http://s.example/item", "@container": "@index"},
                "name": "http://s.example/name",
            },
            "@id": "http://e.example/n",
            "item": {"b": "y", "a": {"name": "x"}},
        },
        {},
        [
            {
                "@id": "http://e.example/n",
                "http://s.example/item": [
                    {
                        "@index": "a",
                        "http://s.example/name": [{"@value": "x"}],
                    },
                    {"@value": "y", "@index": "b"},
                ],
            }
        ],
    ),
    (
        "ts012",
        "index map with @type @id coercion resolves string values against base",
        {
            "@context": {
                "link": {
                    "@id": "http://s.example/link",
                    "@type": "@id",
                    "@container": "@index",
                }
            },
            "@id": "http://e.example/n",
            "link": {"k": "rel/target"},
        },
        {"base": "https://site.example/dir/page"},
        [
            {
                "@id": "http://e.example/n",
                "http://s.example/link": [
                    {"@id": "https://site.example/dir/rel/target", "@index": "k"}
                ],
            }
        ],
    ),
    # -- RFC 3986 relative-IRI corners (base = https://site.example/a/b/c) --
    (
        "ts020",
        "empty-string @id resolves to the base itself",
        {"@context": {"name": "http://s.example/name"}, "@id": "", "name": "x"},
        {"base": _RB},
        [
            {
                "@id": "https://site.example/a/b/c",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts021",
        "fragment-only @id appends to base",
        {"@context": {"name": "http://s.example/name"}, "@id": "#f", "name": "x"},
        {"base": _RB},
        [
            {
                "@id": "https://site.example/a/b/c#f",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts022",
        "query-only @id replaces the base query",
        {"@context": {"name": "http://s.example/name"}, "@id": "?q=2", "name": "x"},
        {"base": _RB},
        [
            {
                "@id": "https://site.example/a/b/c?q=2",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts023",
        "single-dot segment resolves to the base directory",
        {"@context": {"name": "http://s.example/name"}, "@id": "./d", "name": "x"},
        {"base": _RB},
        [
            {
                "@id": "https://site.example/a/b/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts024",
        "double-dot segments climb the path",
        {"@context": {"name": "http://s.example/name"}, "@id": "../d", "name": "x"},
        {"base": _RB},
        [
            {
                "@id": "https://site.example/a/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts025",
        "dot-dot past the root clamps at the root",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "../../../../d",
            "name": "x",
        },
        {"base": _RB},
        [
            {
                "@id": "https://site.example/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts026",
        "network-path reference replaces the authority",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "//other.example/z",
            "name": "x",
        },
        {"base": _RB},
        [
            {
                "@id": "https://other.example/z",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts027",
        "absolute-path reference replaces the whole path",
        {"@context": {"name": "http://s.example/name"}, "@id": "/abs", "name": "x"},
        {"base": _RB},
        [
            {
                "@id": "https://site.example/abs",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts028",
        "scheme'd reference is not resolved against base",
        {"@context": {"name": "http://s.example/name"}, "@id": "urn:x:y", "name": "x"},
        {"base": _RB},
        [
            {
                "@id": "urn:x:y",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts029",
        "interior dot segments are removed during merge",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "d/./e/../f",
            "name": "x",
        },
        {"base": _RB},
        [
            {
                "@id": "https://site.example/a/b/d/f",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts030",
        "@base in the context overrides the document base for @id",
        {
            "@context": {"@base": "http://alt.example/dir/", "name": "http://s.example/name"},
            "@id": "leaf",
            "name": "x",
        },
        {"base": _RB},
        [
            {
                "@id": "http://alt.example/dir/leaf",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    # -- @vocab vs base asymmetry ----------------------------------------
    (
        "ts031",
        "properties expand against @vocab; @id values against base",
        {
            "@context": {"@vocab": "http://v.example/"},
            "@id": "node",
            "p": {"@id": "other"},
        },
        {"base": "https://site.example/dir/page"},
        [
            {
                "@id": "https://site.example/dir/node",
                "http://v.example/p": [
                    {"@id": "https://site.example/dir/other"}
                ],
            }
        ],
    ),
    (
        "ts032",
        "@type values expand against @vocab, not base",
        {
            "@context": {"@vocab": "http://v.example/"},
            "@id": "http://e.example/n",
            "@type": "T",
        },
        {"base": _RB},
        [{"@id": "http://e.example/n", "@type": ["http://v.example/T"]}],
    ),
    (
        "ts033",
        "compact IRI in @type expands through the prefix",
        {
            "@context": {"pfx": "http://p.example/ns#"},
            "@id": "http://e.example/n",
            "@type": "pfx:T",
        },
        {},
        [{"@id": "http://e.example/n", "@type": ["http://p.example/ns#T"]}],
    ),
    # -- value expansion: language + type coercion ------------------------
    (
        "ts034",
        "default @language applies to strings but not numbers",
        {
            "@context": {"@language": "en", "p": "http://e.example/p", "n": "http://e.example/n"},
            "@id": "http://e.example/x",
            "p": "hello",
            "n": 5,
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/n": [{"@value": 5}],
                "http://e.example/p": [{"@value": "hello", "@language": "en"}],
            }
        ],
    ),
    (
        "ts035",
        "term-scoped @language null clears the default language",
        {
            "@context": {
                "@language": "en",
                "p": {"@id": "http://e.example/p", "@language": None},
            },
            "@id": "http://e.example/x",
            "p": "plain",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": "plain"}],
            }
        ],
    ),
    (
        "ts036",
        "term-scoped @language overrides the default language",
        {
            "@context": {
                "@language": "en",
                "p": {"@id": "http://e.example/p", "@language": "fr"},
            },
            "@id": "http://e.example/x",
            "p": "bonjour",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": "bonjour", "@language": "fr"}],
            }
        ],
    ),
    (
        "ts037",
        "datatype coercion adds @type and keeps the native value",
        {
            "@context": {
                "when": {
                    "@id": "http://e.example/when",
                    "@type": "http://www.w3.org/2001/XMLSchema#dateTime",
                }
            },
            "@id": "http://e.example/x",
            "when": "2024-01-01T00:00:00Z",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/when": [
                    {
                        "@value": "2024-01-01T00:00:00Z",
                        "@type": "http://www.w3.org/2001/XMLSchema#dateTime",
                    }
                ],
            }
        ],
    ),
    # -- @reverse via term definition -------------------------------------
    (
        "ts038",
        "term defined with @reverse collects under the @reverse map",
        {
            "@context": {"childOf": {"@reverse": "http://e.example/parentOf"}},
            "@id": "http://e.example/kid",
            "childOf": {"@id": "http://e.example/ma"},
        },
        {},
        [
            {
                "@id": "http://e.example/kid",
                "@reverse": {
                    "http://e.example/parentOf": [{"@id": "http://e.example/ma"}]
                },
            }
        ],
    ),
    # -- top-level @graph unwrap + drop rules -----------------------------
    (
        "ts039",
        "top-level map containing only @graph unwraps to the node array",
        {
            "@context": {"name": "http://s.example/name"},
            "@graph": [
                {"@id": "http://e.example/a", "name": "x"},
                {"@id": "http://e.example/b", "name": "y"},
            ],
        },
        {},
        [
            {
                "@id": "http://e.example/a",
                "http://s.example/name": [{"@value": "x"}],
            },
            {
                "@id": "http://e.example/b",
                "http://s.example/name": [{"@value": "y"}],
            },
        ],
    ),
    (
        "ts040",
        "null property values are dropped; an @id-only node is dropped",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/a",
            "name": None,
        },
        {},
        [],
    ),
    (
        "ts041",
        "empty-array property values expand to empty arrays (no drop rule)",
        {
            "@context": {"name": "http://s.example/name", "tags": "http://s.example/tags"},
            "@id": "http://e.example/a",
            "name": "x",
            "tags": [],
        },
        {},
        [
            {
                "@id": "http://e.example/a",
                "http://s.example/name": [{"@value": "x"}],
                "http://s.example/tags": [],
            }
        ],
    ),
    (
        "ts042",
        "null members of a @set are dropped",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/a",
            "p": {"@set": [None, "a", None]},
        },
        {},
        [
            {
                "@id": "http://e.example/a",
                "http://e.example/p": [{"@value": "a"}],
            }
        ],
    ),
    (
        "ts043",
        "keys that map to no IRI are ignored",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/a",
            "name": "x",
            "unmapped": "dropped",
        },
        {},
        [
            {
                "@id": "http://e.example/a",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
]

SPEC_CASES += [
    # -- batch 2: lists, blank nodes, term/prefix machinery, drop rules --
    (
        "ts050",
        "@container @list with @type @id coercion builds a list of node refs",
        {
            "@context": {
                "seq": {
                    "@id": "http://e.example/seq",
                    "@type": "@id",
                    "@container": "@list",
                }
            },
            "@id": "http://e.example/x",
            "seq": ["http://e.example/a", "http://e.example/b"],
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/seq": [
                    {
                        "@list": [
                            {"@id": "http://e.example/a"},
                            {"@id": "http://e.example/b"},
                        ]
                    }
                ],
            }
        ],
    ),
    (
        "ts051",
        "@container @list wraps a single non-array value",
        {
            "@context": {
                "seq": {"@id": "http://e.example/seq", "@container": "@list"}
            },
            "@id": "http://e.example/x",
            "seq": "only",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/seq": [{"@list": [{"@value": "only"}]}],
            }
        ],
    ),
    (
        "ts052",
        "blank node identifiers pass through unresolved",
        {
            "@context": {"knows": {"@id": "http://s.example/knows", "@type": "@id"}},
            "@id": "_:b1",
            "knows": "_:b2",
        },
        {"base": "https://site.example/a/b/c"},
        [{"@id": "_:b1", "http://s.example/knows": [{"@id": "_:b2"}]}],
    ),
    (
        "ts053",
        "a term aliased to @type via an expanded definition",
        {
            "@context": {"kind": {"@id": "@type"}},
            "@id": "http://e.example/x",
            "kind": "http://e.example/T",
        },
        {},
        [{"@id": "http://e.example/x", "@type": ["http://e.example/T"]}],
    ),
    (
        "ts054",
        "an explicit term definition wins over @vocab",
        {
            "@context": {"@vocab": "http://v.example/", "p": "http://other.example/p"},
            "@id": "http://e.example/x",
            "p": "v",
            "q": "w",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://other.example/p": [{"@value": "v"}],
                "http://v.example/q": [{"@value": "w"}],
            }
        ],
    ),
    (
        "ts055",
        "a null term definition blocks the @vocab fallback",
        {
            "@context": {"@vocab": "http://v.example/", "p": None},
            "@id": "http://e.example/x",
            "p": "dropped",
            "q": "kept",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://v.example/q": [{"@value": "kept"}],
            }
        ],
    ),
    (
        "ts056",
        "an undefined prefix that forms a valid absolute IRI is kept as-is",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "ex:foo": "v",
            "name": "n",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "ex:foo": [{"@value": "v"}],
                "http://s.example/name": [{"@value": "n"}],
            }
        ],
    ),
    (
        "ts057",
        "@id-coerced compact IRI expands through the prefix, not base",
        {
            "@context": {
                "pfx": "http://p.example/ns/",
                "link": {"@id": "http://s.example/link", "@type": "@id"},
            },
            "@id": "http://e.example/x",
            "link": "pfx:leaf",
        },
        {"base": "https://site.example/a/b/c"},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/link": [{"@id": "http://p.example/ns/leaf"}],
            }
        ],
    ),
    (
        "ts058",
        "native doubles stay native in expansion",
        {
            "@context": {"score": "http://s.example/score"},
            "@id": "http://e.example/x",
            "score": 9.0,
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/score": [{"@value": 9.0}],
            }
        ],
    ),
    (
        "ts059",
        "an explicit typed @value object passes through",
        {
            "@context": {"when": "http://s.example/when"},
            "@id": "http://e.example/x",
            "when": {
                "@value": "2024",
                "@type": "http://www.w3.org/2001/XMLSchema#gYear",
            },
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/when": [
                    {
                        "@value": "2024",
                        "@type": "http://www.w3.org/2001/XMLSchema#gYear",
                    }
                ],
            }
        ],
    ),
    (
        "ts060",
        "two terms mapping to one IRI merge values in sorted key order",
        {
            "@context": {
                "name": "http://s.example/name",
                "title": "http://s.example/name",
            },
            "@id": "http://e.example/x",
            "title": "second",
            "name": "first",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/name": [
                    {"@value": "first"},
                    {"@value": "second"},
                ],
            }
        ],
    ),
    (
        "ts061",
        "@reverse and a forward property coexist on one node",
        {
            "@context": {
                "name": "http://s.example/name",
                "childOf": {"@reverse": "http://e.example/parentOf"},
            },
            "@id": "http://e.example/kid",
            "name": "k",
            "childOf": {"@id": "http://e.example/ma"},
        },
        {},
        [
            {
                "@id": "http://e.example/kid",
                "@reverse": {
                    "http://e.example/parentOf": [{"@id": "http://e.example/ma"}]
                },
                "http://s.example/name": [{"@value": "k"}],
            }
        ],
    ),
    (
        "ts062",
        "a named graph node keeps its @index",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/g",
            "@index": "gi",
            "@graph": [{"@id": "http://e.example/n", "name": "x"}],
        },
        {},
        [
            {
                "@id": "http://e.example/g",
                "@index": "gi",
                "@graph": [
                    {
                        "@id": "http://e.example/n",
                        "http://s.example/name": [{"@value": "x"}],
                    }
                ],
            }
        ],
    ),
    (
        "ts063",
        "base ending in a slash keeps its directory",
        {"@context": {"name": "http://s.example/name"}, "@id": "d", "name": "x"},
        {"base": "https://site.example/a/b/"},
        [
            {
                "@id": "https://site.example/a/b/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts064",
        "base with an empty path gains a root slash on merge",
        {"@context": {"name": "http://s.example/name"}, "@id": "d", "name": "x"},
        {"base": "https://site.example"},
        [
            {
                "@id": "https://site.example/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts065",
        "unknown keyword-like keys are dropped",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "@notakeyword": "dropped",
            "name": "x",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts066",
        "property keys are never resolved document-relative",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "rel/path": "dropped",
            "name": "x",
        },
        {"base": "https://site.example/a/b/c"},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts067",
        "an @index-container term with a non-map value expands normally",
        {
            "@context": {
                "item": {"@id": "http://s.example/item", "@container": "@index"}
            },
            "@id": "http://e.example/x",
            "item": "plain",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/item": [{"@value": "plain"}],
            }
        ],
    ),
    (
        "ts068",
        "a free-floating value object is dropped",
        {"@context": {}, "@value": "loose"},
        {},
        [],
    ),
    (
        "ts069",
        "a free-floating list is dropped",
        {"@context": {}, "@list": [{"@value": "loose"}]},
        {},
        [],
    ),
    (
        "ts070",
        "deeply embedded nodes expand at every level",
        {
            "@context": {
                "knows": "http://s.example/knows",
                "name": "http://s.example/name",
            },
            "@id": "http://e.example/a",
            "knows": {
                "@id": "http://e.example/b",
                "knows": {"@id": "http://e.example/c", "name": "C"},
            },
        },
        {},
        [
            {
                "@id": "http://e.example/a",
                "http://s.example/knows": [
                    {
                        "@id": "http://e.example/b",
                        "http://s.example/knows": [
                            {
                                "@id": "http://e.example/c",
                                "http://s.example/name": [{"@value": "C"}],
                            }
                        ],
                    }
                ],
            }
        ],
    ),
    (
        "ts071",
        "a term definition referencing another term chains prefixes",
        {
            "@context": {
                "a": "http://p.example/root/",
                "b": "a:mid/",
                "name": "b:leaf",
            },
            "@id": "http://e.example/x",
            "name": "v",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://p.example/root/mid/leaf": [{"@value": "v"}],
            }
        ],
    ),
    (
        "ts072",
        "array @context merges entries left to right",
        {
            "@context": [
                {"name": "http://s.example/name"},
                {"name": "http://other.example/name"},
            ],
            "@id": "http://e.example/x",
            "name": "v",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://other.example/name": [{"@value": "v"}],
            }
        ],
    ),
    (
        "ts073",
        "a null @context resets all terms and @vocab",
        {
            "@context": {"@vocab": "http://v.example/", "name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "name": "outer",
            "http://s.example/child": {
                "@context": None,
                "@id": "http://e.example/y",
                "name": "dropped-now-unmapped",
            },
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/child": [{"@id": "http://e.example/y"}],
                "http://s.example/name": [{"@value": "outer"}],
            }
        ],
    ),
    (
        "ts074",
        "an embedded context scopes only its subtree",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "name": "outer",
            "http://s.example/child": {
                "@context": {"name": "http://other.example/name"},
                "@id": "http://e.example/y",
                "name": "inner",
            },
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/child": [
                    {
                        "@id": "http://e.example/y",
                        "http://other.example/name": [{"@value": "inner"}],
                    }
                ],
                "http://s.example/name": [{"@value": "outer"}],
            }
        ],
    ),
    (
        "ts075",
        "arrays inside a language map flatten into the value list",
        {
            "@context": {
                "label": {"@id": "http://s.example/label", "@container": "@language"}
            },
            "@id": "http://e.example/x",
            "label": {"en": ["one", "two"]},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/label": [
                    {"@value": "one", "@language": "en"},
                    {"@value": "two", "@language": "en"},
                ],
            }
        ],
    ),
    (
        "ts076",
        "relative @id with both query and fragment resolves against base",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "d?q=1#f",
            "name": "x",
        },
        {"base": "https://site.example/a/b/c"},
        [
            {
                "@id": "https://site.example/a/b/d?q=1#f",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts077",
        "the base fragment never leaks into resolved references",
        {"@context": {"name": "http://s.example/name"}, "@id": "d", "name": "x"},
        {"base": "https://site.example/a/b/c#frag"},
        [
            {
                "@id": "https://site.example/a/b/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts078",
        "@value null yields no value object",
        {
            "@context": {"p": "http://e.example/p", "name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "p": {"@value": None},
            "name": "x",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
]

SPEC_CASES += [
    # -- batch 3: value/list objects with @index, language normalization,
    #    expandContext, @reverse map ordering, deeper RFC 3986 corners ----
    (
        "ts080",
        "language tags are lowercased during value expansion",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": {"@value": "x", "@language": "EN-US"},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": "x", "@language": "en-us"}],
            }
        ],
    ),
    (
        "ts081",
        "a default @language is lowercased when applied",
        {
            "@context": {"@language": "DE", "p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": "hallo",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": "hallo", "@language": "de"}],
            }
        ],
    ),
    (
        "ts082",
        "a value object keeps its @index",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": {"@value": "v", "@index": "i"},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": "v", "@index": "i"}],
            }
        ],
    ),
    (
        "ts083",
        "a list object keeps its @index",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": {"@list": ["a"], "@index": "i"},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [
                    {"@list": [{"@value": "a"}], "@index": "i"}
                ],
            }
        ],
    ),
    (
        "ts084",
        "expandContext applies without an inline @context",
        {"@id": "http://e.example/x", "name": "v"},
        {"expandContext": {"name": "http://s.example/name"}},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/name": [{"@value": "v"}],
            }
        ],
    ),
    (
        "ts085",
        "a term with a null @id in an expanded definition is ignored",
        {
            "@context": {"@vocab": "http://v.example/", "p": {"@id": None}},
            "@id": "http://e.example/x",
            "p": "dropped",
            "q": "kept",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://v.example/q": [{"@value": "kept"}],
            }
        ],
    ),
    (
        "ts086",
        "@container @set changes nothing in expansion",
        {
            "@context": {
                "tag": {"@id": "http://e.example/tag", "@container": "@set"}
            },
            "@id": "http://e.example/x",
            "tag": "one",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/tag": [{"@value": "one"}],
            }
        ],
    ),
    (
        "ts087",
        "nested @set objects inside an array flatten",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": [{"@set": ["a"]}, "b"],
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": "a"}, {"@value": "b"}],
            }
        ],
    ),
    (
        "ts088",
        "a named graph appears as a property value",
        {
            "@context": {"holds": "http://e.example/holds", "name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "holds": {
                "@id": "http://e.example/g",
                "@graph": [{"@id": "http://e.example/n", "name": "v"}],
            },
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/holds": [
                    {
                        "@id": "http://e.example/g",
                        "@graph": [
                            {
                                "@id": "http://e.example/n",
                                "http://s.example/name": [{"@value": "v"}],
                            }
                        ],
                    }
                ],
            }
        ],
    ),
    (
        "ts089",
        "two reverse terms collect under one @reverse map",
        {
            "@context": {
                "childOf": {"@reverse": "http://e.example/parentOf"},
                "ownedBy": {"@reverse": "http://e.example/owns"},
            },
            "@id": "http://e.example/kid",
            "childOf": {"@id": "http://e.example/ma"},
            "ownedBy": {"@id": "http://e.example/estate"},
        },
        {},
        [
            {
                "@id": "http://e.example/kid",
                "@reverse": {
                    "http://e.example/owns": [{"@id": "http://e.example/estate"}],
                    "http://e.example/parentOf": [{"@id": "http://e.example/ma"}],
                },
            }
        ],
    ),
    (
        "ts090",
        "a blank-node @type passes through",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "@type": "_:t",
            "name": "v",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "@type": ["_:t"],
                "http://s.example/name": [{"@value": "v"}],
            }
        ],
    ),
    (
        "ts091",
        "native 5.0 stays a double-valued native",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": 5.0,
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": 5.0}],
            }
        ],
    ),
    # -- RFC 3986: authority forms ----------------------------------------
    (
        "ts092",
        "an explicit port survives relative resolution",
        {"@context": {"name": "http://s.example/name"}, "@id": "../d", "name": "x"},
        {"base": "https://site.example:8443/a/b/c"},
        [
            {
                "@id": "https://site.example:8443/a/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts093",
        "userinfo in the base authority is preserved",
        {"@context": {"name": "http://s.example/name"}, "@id": "d", "name": "x"},
        {"base": "https://user@site.example/a/b"},
        [
            {
                "@id": "https://user@site.example/a/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts094",
        "an IPv6 authority is preserved through resolution",
        {"@context": {"name": "http://s.example/name"}, "@id": "d", "name": "x"},
        {"base": "http://[2001:db8::1]/a/b"},
        [
            {
                "@id": "http://[2001:db8::1]/a/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts095",
        "percent-encoded segments pass through untouched",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "seg%20ment",
            "name": "x",
        },
        {"base": "https://site.example/a/b"},
        [
            {
                "@id": "https://site.example/a/seg%20ment",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts096",
        "a lone dot resolves to the base directory",
        {"@context": {"name": "http://s.example/name"}, "@id": ".", "name": "x"},
        {"base": "https://site.example/a/b/c"},
        [
            {
                "@id": "https://site.example/a/b/",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts097",
        "a lone dot-dot resolves to the parent directory",
        {"@context": {"name": "http://s.example/name"}, "@id": "..", "name": "x"},
        {"base": "https://site.example/a/b/c"},
        [
            {
                "@id": "https://site.example/a/",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts098",
        "an empty fragment is kept distinct from no fragment",
        {"@context": {"name": "http://s.example/name"}, "@id": "d#", "name": "x"},
        {"base": "https://site.example/a/b/c"},
        [
            {
                "@id": "https://site.example/a/b/d#",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts099",
        "an empty query is kept distinct from no query",
        {"@context": {"name": "http://s.example/name"}, "@id": "d?", "name": "x"},
        {"base": "https://site.example/a/b/c"},
        [
            {
                "@id": "https://site.example/a/b/d?",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts100",
        "the base query does not leak into sibling references",
        {"@context": {"name": "http://s.example/name"}, "@id": "d", "name": "x"},
        {"base": "https://site.example/a/b/c?base=query"},
        [
            {
                "@id": "https://site.example/a/b/d",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts101",
        "@type arrays expand every member",
        {
            "@context": {"@vocab": "http://v.example/", "pfx": "http://p.example/ns#"},
            "@id": "http://e.example/x",
            "@type": ["T1", "pfx:T2", "http://a.example/T3"],
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "@type": [
                    "http://v.example/T1",
                    "http://p.example/ns#T2",
                    "http://a.example/T3",
                ],
            }
        ],
    ),
    (
        "ts102",
        "an @id-coerced term applied to a keyword-like string keeps it verbatim",
        {
            "@context": {
                "link": {"@id": "http://s.example/link", "@type": "@id"}
            },
            "@id": "http://e.example/x",
            "link": "urn:uuid:00000000-0000-0000-0000-000000000000",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/link": [
                    {"@id": "urn:uuid:00000000-0000-0000-0000-000000000000"}
                ],
            }
        ],
    ),
    (
        "ts103",
        "properties of an inner list-item node expand fully",
        {
            "@context": {
                "seq": {"@id": "http://e.example/seq", "@container": "@list"},
                "name": "http://s.example/name",
            },
            "@id": "http://e.example/x",
            "seq": [{"@id": "http://e.example/n", "name": "inner"}],
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/seq": [
                    {
                        "@list": [
                            {
                                "@id": "http://e.example/n",
                                "http://s.example/name": [{"@value": "inner"}],
                            }
                        ]
                    }
                ],
            }
        ],
    ),
]

SPEC_CASES += [
    # -- batch 4: falsy values, prefix corners, nested @reverse, arrays --
    (
        "ts110",
        "false boolean @value survives falsy-value handling",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": {"@value": False},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": False}],
            }
        ],
    ),
    (
        "ts111",
        "zero @value survives falsy-value handling",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": {"@value": 0},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": 0}],
            }
        ],
    ),
    (
        "ts112",
        "empty-string @value survives falsy-value handling",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": {"@value": ""},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [{"@value": ""}],
            }
        ],
    ),
    (
        "ts113",
        "a colon key with an undefined prefix but valid scheme stays verbatim",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/x",
            "has:colon/path": "v",
            "name": "n",
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "has:colon/path": [{"@value": "v"}],
                "http://s.example/name": [{"@value": "n"}],
            }
        ],
    ),
    (
        "ts114",
        "@reverse nested inside a reversed node expands recursively",
        {
            "@context": {},
            "@id": "http://e.example/x",
            "@reverse": {
                "http://e.example/p": {
                    "@id": "http://e.example/y",
                    "@reverse": {
                        "http://e.example/q": {"@id": "http://e.example/z"}
                    },
                }
            },
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "@reverse": {
                    "http://e.example/p": [
                        {
                            "@id": "http://e.example/y",
                            "@reverse": {
                                "http://e.example/q": [
                                    {"@id": "http://e.example/z"}
                                ]
                            },
                        }
                    ]
                },
            }
        ],
    ),
    (
        "ts115",
        "a top-level array expands each element in order",
        [
            {
                "@context": {"name": "http://s.example/name"},
                "@id": "http://e.example/b",
                "name": "B",
            },
            {
                "@context": {"name": "http://s.example/name"},
                "@id": "http://e.example/a",
                "name": "A",
            },
        ],
        {},
        [
            {
                "@id": "http://e.example/b",
                "http://s.example/name": [{"@value": "B"}],
            },
            {
                "@id": "http://e.example/a",
                "http://s.example/name": [{"@value": "A"}],
            },
        ],
    ),
    (
        "ts116",
        "top-level scalars in an array are dropped",
        [
            "loose string",
            {
                "@context": {"name": "http://s.example/name"},
                "@id": "http://e.example/a",
                "name": "A",
            },
        ],
        {},
        [
            {
                "@id": "http://e.example/a",
                "http://s.example/name": [{"@value": "A"}],
            }
        ],
    ),
    (
        "ts117",
        "index-map values preserve in-key array order",
        {
            "@context": {
                "item": {"@id": "http://s.example/item", "@container": "@index"}
            },
            "@id": "http://e.example/x",
            "item": {"k": ["second", "first-stays-first"]},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/item": [
                    {"@value": "second", "@index": "k"},
                    {"@value": "first-stays-first", "@index": "k"},
                ],
            }
        ],
    ),
    (
        "ts118",
        "a language map with a single string value per key",
        {
            "@context": {
                "label": {"@id": "http://s.example/label", "@container": "@language"}
            },
            "@id": "http://e.example/x",
            "label": {"fr": "chat"},
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://s.example/label": [{"@value": "chat", "@language": "fr"}],
            }
        ],
    ),
    (
        "ts119",
        "@type on a value object coexists with sibling untyped values",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/x",
            "p": [
                {"@value": "5", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
                "plain",
            ],
        },
        {},
        [
            {
                "@id": "http://e.example/x",
                "http://e.example/p": [
                    {
                        "@value": "5",
                        "@type": "http://www.w3.org/2001/XMLSchema#integer",
                    },
                    {"@value": "plain"},
                ],
            }
        ],
    ),
    (
        "ts120",
        "a node with @id and @type only keeps both",
        {
            "@context": {},
            "@id": "http://e.example/x",
            "@type": "http://e.example/T",
        },
        {},
        [{"@id": "http://e.example/x", "@type": ["http://e.example/T"]}],
    ),
    (
        "ts121",
        "a nested node under a reverse term hangs its own children forward",
        {
            "@context": {
                "childOf": {"@reverse": "http://e.example/parentOf"},
                "name": "http://s.example/name",
            },
            "@id": "http://e.example/kid",
            "childOf": {
                "@id": "http://e.example/ma",
                "name": "M",
            },
        },
        {},
        [
            {
                "@id": "http://e.example/kid",
                "@reverse": {
                    "http://e.example/parentOf": [
                        {
                            "@id": "http://e.example/ma",
                            "http://s.example/name": [{"@value": "M"}],
                        }
                    ]
                },
            }
        ],
    ),
]


# ---------------------------------------------------------------------------
# Round-6 spec-authored cases (VERDICT r5 #3): same provenance discipline as
# the round-5 block above — every EXPECTED output below is hand-derived from
# the JSON-LD 1.0 expansion algorithm (W3C CR 2014, §8: IRI expansion §8.2,
# value expansion §8.7, container handling §8.4 steps 7.5-7.7, @reverse
# §8.4 steps 7.4.11/7.4.13) and RFC 3986 §5.2-§5.4, written literally, and
# asserted against the implementation at generation time. Themes: the
# remaining public-manifest shapes — @type:@vocab coercion, native-value ×
# datatype coercion, index/language-map corners, authority-less (urn:) and
# query-carrying base resolution, context reset/override sequences, @reverse
# composition, idempotence of expanded input, duplicate preservation.
# ---------------------------------------------------------------------------

_XSD = "http://www.w3.org/2001/XMLSchema#"

SPEC_CASES += [
    # -- @type: @vocab coercion (spec §8.7 step 2, IRI expansion vocab path) --
    (
        "ts201",
        "@vocab coercion resolves a defined term before the vocab mapping",
        {
            "@context": {
                "@vocab": "http://v.example/",
                "p": {"@id": "http://e.example/p", "@type": "@vocab"},
                "Friend": "http://f.example/Friend",
            },
            "p": ["Friend", "Other"],
        },
        {},
        [
            {
                "http://e.example/p": [
                    {"@id": "http://f.example/Friend"},
                    {"@id": "http://v.example/Other"},
                ]
            }
        ],
    ),
    (
        "ts202",
        "@vocab coercion keeps an absolute IRI untouched",
        {
            "@context": {
                "@vocab": "http://v.example/",
                "p": {"@id": "http://e.example/p", "@type": "@vocab"},
            },
            "p": "http://x.example/abs",
        },
        {},
        [{"http://e.example/p": [{"@id": "http://x.example/abs"}]}],
    ),
    (
        "ts203",
        "@vocab coercion without a vocab mapping falls back to document-relative",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@type": "@vocab"}},
            "p": "other",
        },
        {},
        # no term, no @vocab: IRI expansion ends at the document-relative
        # step and resolves against the test's base IRI
        [{"http://e.example/p": [{"@id": "https://w3c.example/tests/other"}]}],
    ),
    (
        "ts204",
        "@vocab coercion applies only to strings; a number stays a plain value",
        {
            "@context": {
                "@vocab": "http://v.example/",
                "p": {"@id": "http://e.example/p", "@type": "@vocab"},
            },
            "p": 5,
        },
        {},
        [{"http://e.example/p": [{"@value": 5}]}],
    ),
    # -- native values x datatype coercion (value expansion §8.7 step 4) ----
    (
        "ts205",
        "boolean with a datatype coercion keeps the native value and adds @type",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@type": _XSD + "boolean"}},
            "p": True,
        },
        {},
        [{"http://e.example/p": [{"@value": True, "@type": _XSD + "boolean"}]}],
    ),
    (
        "ts206",
        "@id coercion applies only to strings; a number stays a plain value",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}},
            "p": 5,
        },
        {},
        [{"http://e.example/p": [{"@value": 5}]}],
    ),
    (
        "ts207",
        "a large double stays native in expansion (canonical form is toRDF's job)",
        {"@context": {"p": "http://e.example/p"}, "p": 1e21},
        {},
        [{"http://e.example/p": [{"@value": 1e21}]}],
    ),
    (
        "ts208",
        "datatype coercion does not validate: xsd:integer on a double keeps 1.1",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@type": _XSD + "integer"}},
            "p": 1.1,
        },
        {},
        [{"http://e.example/p": [{"@value": 1.1, "@type": _XSD + "integer"}]}],
    ),
    (
        "ts209",
        "datatype coercion applies to a native integer",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@type": _XSD + "decimal"}},
            "p": 5,
        },
        {},
        [{"http://e.example/p": [{"@value": 5, "@type": _XSD + "decimal"}]}],
    ),
    # -- index containers (§8.4 step 7.6) ----------------------------------
    (
        "ts210",
        "index map adds the key as @index to a node value that lacks one",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@container": "@index"}},
            "p": {"i1": {"@id": "http://e.example/n"}},
        },
        {},
        [{"http://e.example/p": [{"@id": "http://e.example/n", "@index": "i1"}]}],
    ),
    (
        "ts211",
        "index map keeps a value's own @index over the map key",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@container": "@index"}},
            "p": {"i1": {"@id": "http://e.example/n", "@index": "own"}},
        },
        {},
        [{"http://e.example/p": [{"@id": "http://e.example/n", "@index": "own"}]}],
    ),
    (
        "ts212",
        "index map stamps every element of an array value with the key",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@container": "@index"}},
            "p": {"i1": [{"@id": "http://e.example/n1"}, {"@id": "http://e.example/n2"}]},
        },
        {},
        [
            {
                "http://e.example/p": [
                    {"@id": "http://e.example/n1", "@index": "i1"},
                    {"@id": "http://e.example/n2", "@index": "i1"},
                ]
            }
        ],
    ),
    (
        "ts213",
        "index map value that is a list object carries the key as @index",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@container": "@index"}},
            "p": {"i1": {"@list": ["a"]}},
        },
        {},
        [
            {
                "http://e.example/p": [
                    {"@list": [{"@value": "a"}], "@index": "i1"}
                ]
            }
        ],
    ),
    # -- language maps (§8.4 step 7.5; BCP47 case-insensitivity) ------------
    (
        "ts214",
        "language map keys are lowercased on the emitted @language",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@container": "@language"}},
            "p": {"EN": "hi", "de-DE": "hallo"},
        },
        {},
        # sorted key iteration: "EN" < "de-DE" by code point
        [
            {
                "http://e.example/p": [
                    {"@value": "hi", "@language": "en"},
                    {"@value": "hallo", "@language": "de-de"},
                ]
            }
        ],
    ),
    (
        "ts215",
        "a context default @language does not leak into language-map entries",
        {
            "@context": {
                "@language": "fr",
                "p": {"@id": "http://e.example/p", "@container": "@language"},
            },
            "p": {"en": "hi"},
        },
        {},
        [{"http://e.example/p": [{"@value": "hi", "@language": "en"}]}],
    ),
    # -- RFC 3986 §5.4 corners over the round-5 base ------------------------
    (
        "ts216",
        "merge keeps a semicolon path segment and removes an interior single dot",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": "g;x=1/./y"},
        {"base": _RB},
        [{"http://e.example/p": [{"@id": "https://site.example/a/b/g;x=1/y"}]}],
    ),
    (
        "ts217",
        "an interior dot-dot collapses the segment before it",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": "g;x=1/../y"},
        {"base": _RB},
        [{"http://e.example/p": [{"@id": "https://site.example/a/b/y"}]}],
    ),
    (
        "ts218",
        "dot segments in the QUERY are not removed",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": "g?y/./x"},
        {"base": _RB},
        [{"http://e.example/p": [{"@id": "https://site.example/a/b/g?y/./x"}]}],
    ),
    (
        "ts219",
        "dot segments in the FRAGMENT are not removed",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": "#s/../x"},
        {"base": _RB},
        [{"http://e.example/p": [{"@id": "https://site.example/a/b/c#s/../x"}]}],
    ),
    (
        "ts220",
        "an empty reference returns the base INCLUDING its query",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": ""},
        {"base": "https://site.example/a/b?bq"},
        [{"http://e.example/p": [{"@id": "https://site.example/a/b?bq"}]}],
    ),
    (
        "ts221",
        "a fragment reference against an authority-less (urn) base appends",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": "#f"},
        {"base": "urn:a:b"},
        [{"http://e.example/p": [{"@id": "urn:a:b#f"}]}],
    ),
    (
        "ts222",
        "relative merge against an authority-less base with no slash replaces the path",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": "g"},
        {"base": "urn:a:b"},
        # RFC 3986 §5.3 merge: no authority, base path has no "/": result is
        # just the reference, keeping only the scheme
        [{"http://e.example/p": [{"@id": "urn:g"}]}],
    ),
    (
        "ts223",
        "a query reference against a query-carrying base replaces the query",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": "?n"},
        {"base": "https://site.example/a/b?bq"},
        [{"http://e.example/p": [{"@id": "https://site.example/a/b?n"}]}],
    ),
    # -- context reset / override sequences (§7.1) --------------------------
    (
        "ts224",
        "a null inside an array context wipes earlier terms before later ones load",
        {
            "@context": [{"a": "http://e.example/a"}, None, {"b": "http://e.example/b"}],
            "a": "x",
            "b": "y",
        },
        {},
        # "a" is no longer a term (and there is no @vocab), so its entry drops
        [{"http://e.example/b": [{"@value": "y"}]}],
    ),
    (
        "ts225",
        "a later context redefines a term in place",
        {
            "@context": [{"p": "http://old.example/p"}, {"p": "http://new.example/p"}],
            "p": "x",
        },
        {},
        [{"http://new.example/p": [{"@value": "x"}]}],
    ),
    (
        "ts226",
        "@vocab null in a later context clears the fallback for undefined keys",
        {
            "@context": [{"@vocab": "http://v.example/"}, {"@vocab": None}],
            "k": "x",
            "http://e.example/p": "y",
        },
        {},
        [{"http://e.example/p": [{"@value": "y"}]}],
    ),
    (
        "ts227",
        "@base null leaves relative @id references unresolved",
        {
            "@context": {"@base": None, "p": {"@id": "http://e.example/p", "@type": "@id"}},
            "@id": "rel/x",
            "p": "also/rel",
        },
        {},
        [{"@id": "rel/x", "http://e.example/p": [{"@id": "also/rel"}]}],
    ),
    (
        "ts228",
        "a relative @base resolves against the document base first",
        {
            "@context": {"@base": "sub/dir/", "name": "http://s.example/name"},
            "@id": "item",
            "name": "x",
        },
        {},
        # document base is https://w3c.example/tests/ts128-in.jsonld; @base
        # "sub/dir/" resolves there, then @id "item" resolves against that
        [
            {
                "@id": "https://w3c.example/tests/sub/dir/item",
                "http://s.example/name": [{"@value": "x"}],
            }
        ],
    ),
    (
        "ts229",
        "a later @base chains onto the one the previous context set",
        {
            "@context": [{"@base": "https://h.example/x/"}, {"@base": "y/"}],
            "@id": "item",
            "http://e.example/p": "v",
        },
        {},
        [
            {
                "@id": "https://h.example/x/y/item",
                "http://e.example/p": [{"@value": "v"}],
            }
        ],
    ),
    # -- @reverse composition (§8.4 steps 7.4.11/7.4.13) --------------------
    (
        "ts230",
        "@reverse of a reverse term cancels back to a forward property",
        {
            "@context": {"children": {"@reverse": "http://e.example/parent"}},
            "@id": "http://e.example/root",
            "@reverse": {"children": {"@id": "http://e.example/k"}},
        },
        {},
        [
            {
                "@id": "http://e.example/root",
                "http://e.example/parent": [{"@id": "http://e.example/k"}],
            }
        ],
    ),
    (
        "ts231",
        "a reverse term with @container @set still lands under @reverse",
        {
            "@context": {
                "kids": {"@reverse": "http://e.example/parent", "@container": "@set"}
            },
            "@id": "http://e.example/r",
            "kids": [{"@id": "http://e.example/k"}],
        },
        {},
        [
            {
                "@id": "http://e.example/r",
                "@reverse": {"http://e.example/parent": [{"@id": "http://e.example/k"}]},
            }
        ],
    ),
    (
        "ts232",
        "compact-IRI keys inside an explicit @reverse map expand",
        {
            "@context": {"ex": "http://e.example/"},
            "@id": "http://e.example/r",
            "@reverse": {"ex:parent": {"@id": "http://e.example/k"}},
        },
        {},
        [
            {
                "@id": "http://e.example/r",
                "@reverse": {"http://e.example/parent": [{"@id": "http://e.example/k"}]},
            }
        ],
    ),
    (
        "ts233",
        "two properties inside one @reverse map each collect their nodes",
        {
            "@context": {"ex": "http://e.example/"},
            "@id": "http://e.example/r",
            "@reverse": {
                "ex:a": [{"@id": "http://e.example/n1"}, {"@id": "http://e.example/n2"}],
                "ex:b": {"@id": "http://e.example/n3"},
            },
        },
        {},
        [
            {
                "@id": "http://e.example/r",
                "@reverse": {
                    "http://e.example/a": [
                        {"@id": "http://e.example/n1"},
                        {"@id": "http://e.example/n2"},
                    ],
                    "http://e.example/b": [{"@id": "http://e.example/n3"}],
                },
            }
        ],
    ),
    # -- idempotence of expanded input --------------------------------------
    (
        "ts234",
        "expanding an already-expanded node array is the identity",
        [{"@id": "http://e.example/a", "http://e.example/p": [{"@value": "x"}]}],
        {},
        [{"@id": "http://e.example/a", "http://e.example/p": [{"@value": "x"}]}],
    ),
    (
        "ts235",
        "an expanded typed value object passes through unchanged",
        [
            {
                "@id": "http://e.example/a",
                "http://e.example/p": [{"@value": "5", "@type": _XSD + "gYear"}],
            }
        ],
        {},
        [
            {
                "@id": "http://e.example/a",
                "http://e.example/p": [{"@value": "5", "@type": _XSD + "gYear"}],
            }
        ],
    ),
    # -- duplicates, empties, pass-throughs ---------------------------------
    (
        "ts236",
        "duplicate literal values are preserved (expansion never dedups)",
        {"@context": {"p": "http://e.example/p"}, "p": ["x", "x"]},
        {},
        [{"http://e.example/p": [{"@value": "x"}, {"@value": "x"}]}],
    ),
    (
        "ts237",
        "an empty @list stays an empty list object",
        {"@context": {"p": "http://e.example/p"}, "p": {"@list": []}},
        {},
        [{"http://e.example/p": [{"@list": []}]}],
    ),
    (
        "ts238",
        "a value object carries @type and @index together",
        {
            "@context": {"p": "http://e.example/p"},
            "p": {"@value": "5", "@type": "http://t.example/T", "@index": "i"},
        },
        {},
        [
            {
                "http://e.example/p": [
                    {"@value": "5", "@type": "http://t.example/T", "@index": "i"}
                ]
            }
        ],
    ),
    (
        "ts239",
        "a null value for a @container @list term drops the entry entirely",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@container": "@list"}},
            "@id": "http://e.example/n",
            "p": None,
        },
        {},
        # the node then has only @id and is NOT free-floating-dropped here
        # because it sits at the top level as the only result: a node with
        # only @id IS dropped per §8.4 step 8.3
        [],
    ),
    (
        "ts240",
        "a @container @list term wraps node references after @id coercion",
        {
            "@context": {
                "p": {"@id": "http://e.example/p", "@container": "@list", "@type": "@id"}
            },
            "@id": "http://e.example/n",
            "p": ["a", "http://x.example/b"],
        },
        {"base": "https://site.example/dir/doc"},
        [
            {
                "@id": "http://e.example/n",
                "http://e.example/p": [
                    {
                        "@list": [
                            {"@id": "https://site.example/dir/a"},
                            {"@id": "http://x.example/b"},
                        ]
                    }
                ],
            }
        ],
    ),
]




SPEC_CASES += [
    # -- batch 2: keyword/value pass-throughs, generalized RDF, ordering ----
    (
        "ts241",
        "an empty @type array is preserved",
        {"@context": {}, "@id": "http://e.example/n", "@type": [], "http://e.example/p": "v"},
        {},
        [{"@id": "http://e.example/n", "@type": [], "http://e.example/p": [{"@value": "v"}]}],
    ),
    (
        "ts242",
        "a blank-node property key survives (generalized RDF)",
        {"@context": {}, "@id": "http://e.example/n", "_:bp": "v"},
        {},
        [{"@id": "http://e.example/n", "_:bp": [{"@value": "v"}]}],
    ),
    (
        "ts243",
        "a compact IRI with an empty suffix expands to the prefix IRI itself",
        {"@context": {"ex": "http://e.example/"}, "@id": "http://e.example/n", "ex:": "v"},
        {},
        [{"@id": "http://e.example/n", "http://e.example/": [{"@value": "v"}]}],
    ),
    (
        "ts244",
        "a compact IRI splits on the FIRST colon only",
        {"@context": {"a": "http://e.example/"}, "@id": "http://e.example/n", "a:b:c": "v"},
        {},
        [{"@id": "http://e.example/n", "http://e.example/b:c": [{"@value": "v"}]}],
    ),
    (
        "ts245",
        "an empty object under a property survives as an empty node object",
        {"@context": {"p": "http://e.example/p"}, "@id": "http://e.example/n", "p": {}},
        {},
        # the free-floating drop rules apply at the top level only; an
        # embedded node object with zero members is kept
        [{"@id": "http://e.example/n", "http://e.example/p": [{}]}],
    ),
    (
        "ts246",
        "a default @language stamps every string of an array value",
        {"@context": {"@language": "en", "p": "http://e.example/p"}, "p": ["a", "b"]},
        {},
        [
            {
                "http://e.example/p": [
                    {"@value": "a", "@language": "en"},
                    {"@value": "b", "@language": "en"},
                ]
            }
        ],
    ),
    (
        "ts247",
        "an explicit @language in a value object beats the context default",
        {
            "@context": {"@language": "en", "p": "http://e.example/p"},
            "p": {"@value": "x", "@language": "de"},
        },
        {},
        [{"http://e.example/p": [{"@value": "x", "@language": "de"}]}],
    ),
    (
        "ts248",
        "a term-scoped @language is not applied to numbers",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@language": "de"}},
            "p": 5,
        },
        {},
        [{"http://e.example/p": [{"@value": 5}]}],
    ),
    (
        "ts249",
        "@type array mixing a term, a compact IRI and an absolute IRI",
        {
            "@context": {"ex": "http://e.example/", "T": "http://t.example/T"},
            "@id": "http://e.example/n",
            "@type": ["T", "ex:U", "http://v.example/W"],
        },
        {},
        [
            {
                "@id": "http://e.example/n",
                "@type": ["http://t.example/T", "http://e.example/U", "http://v.example/W"],
            }
        ],
    ),
    (
        "ts250",
        "a @set object's @index is dropped when the set unwraps",
        {"@context": {"p": "http://e.example/p"}, "p": {"@set": ["a"], "@index": "i"}},
        {},
        [{"http://e.example/p": [{"@value": "a"}]}],
    ),
    (
        "ts251",
        "a node reference (only @id) under a property is NOT dropped",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/n",
            "p": [{"@id": "http://e.example/other"}],
        },
        {},
        [{"@id": "http://e.example/n", "http://e.example/p": [{"@id": "http://e.example/other"}]}],
    ),
    (
        "ts252",
        "an embedded graph object keeps @id and @index alongside @graph",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/n",
            "p": {
                "@id": "http://e.example/g",
                "@graph": [{"@id": "http://e.example/m", "http://e.example/q": "v"}],
                "@index": "gi",
            },
        },
        {},
        [
            {
                "@id": "http://e.example/n",
                "http://e.example/p": [
                    {
                        "@id": "http://e.example/g",
                        "@index": "gi",
                        "@graph": [
                            {
                                "@id": "http://e.example/m",
                                "http://e.example/q": [{"@value": "v"}],
                            }
                        ],
                    }
                ],
            }
        ],
    ),
    (
        "ts253",
        "colon keys with undefined prefixes stay verbatim whatever the scheme chars",
        {"@context": {}, "@id": "http://e.example/n", "not+ok:foo": "v", "weird:foo": "w"},
        {},
        [
            {
                "@id": "http://e.example/n",
                "not+ok:foo": [{"@value": "v"}],
                "weird:foo": [{"@value": "w"}],
            }
        ],
    ),
    (
        "ts254",
        "datatype coercion does not touch an explicit value object",
        {
            "@context": {"p": {"@id": "http://e.example/p", "@type": "http://t.example/T"}},
            "p": {"@value": "x"},
        },
        {},
        # value expansion's coercion step applies to scalars; an explicit
        # value object passes through the map branch untouched
        [{"http://e.example/p": [{"@value": "x"}]}],
    ),
    (
        "ts255",
        "a single-string @type normalizes to an array",
        {"@context": {"T": "http://t.example/T"}, "@id": "http://e.example/n", "@type": "T"},
        {},
        [{"@id": "http://e.example/n", "@type": ["http://t.example/T"]}],
    ),
    (
        "ts256",
        "a mixed array value preserves order and flattens nested arrays in place",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/n",
            "p": ["s", {"@id": "http://e.example/m"}, {"@value": 5}, ["nested", "deeper"]],
        },
        {},
        [
            {
                "@id": "http://e.example/n",
                "http://e.example/p": [
                    {"@value": "s"},
                    {"@id": "http://e.example/m"},
                    {"@value": 5},
                    {"@value": "nested"},
                    {"@value": "deeper"},
                ],
            }
        ],
    ),
    (
        "ts257",
        "a named graph node carries sibling properties alongside @graph",
        {
            "@context": {"name": "http://s.example/name"},
            "@id": "http://e.example/g",
            "@graph": [{"@id": "http://e.example/n", "name": "x"}],
            "name": "the graph",
        },
        {},
        [
            {
                "@id": "http://e.example/g",
                "@graph": [
                    {"@id": "http://e.example/n", "http://s.example/name": [{"@value": "x"}]}
                ],
                "http://s.example/name": [{"@value": "the graph"}],
            }
        ],
    ),
    (
        "ts258",
        "null members inside a @list are dropped",
        {"@context": {"p": "http://e.example/p"}, "p": {"@list": ["a", None, "b"]}},
        {},
        [{"http://e.example/p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
    ),
    (
        "ts259",
        "a relative @type with no vocab mapping resolves document-relative",
        {
            "@context": {"p": "http://e.example/p"},
            "@id": "http://e.example/n",
            "@type": "T",
            "p": "v",
        },
        {},
        # IRI expansion for @type values sets document-relative=true; with
        # no term and no @vocab the base (this test's input IRI dir) applies
        [
            {
                "@id": "http://e.example/n",
                "@type": ["https://w3c.example/tests/T"],
                "http://e.example/p": [{"@value": "v"}],
            }
        ],
    ),
    (
        "ts260",
        "a lone '#' resolves to the base plus an empty fragment",
        {"@context": {"p": {"@id": "http://e.example/p", "@type": "@id"}}, "p": "#"},
        {"base": _RB},
        [{"http://e.example/p": [{"@id": "https://site.example/a/b/c#"}]}],
    ),
    (
        "ts261",
        "expanded input with @reverse survives re-expansion unchanged",
        [
            {
                "@id": "http://e.example/r",
                "@reverse": {"http://e.example/parent": [{"@id": "http://e.example/k"}]},
            }
        ],
        {},
        [
            {
                "@id": "http://e.example/r",
                "@reverse": {"http://e.example/parent": [{"@id": "http://e.example/k"}]},
            }
        ],
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

    for tid, name, doc, option, authored in SPEC_CASES:
        with open(os.path.join(HERE, f"{tid}-in.jsonld"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        actual = expand(
            doc,
            base=option.get("base", BASE + f"{tid}-in.jsonld"),
            expand_context=option.get("expandContext"),
        )
        if actual != authored:
            print(f"!! SPEC MISMATCH {tid}: {name}")
            print("-- authored expectation:")
            print(json.dumps(authored, indent=1, sort_keys=True))
            print("-- implementation output:")
            print(json.dumps(actual, indent=1, sort_keys=True))
            raise SystemExit(1)
        # the AUTHORED value is written (not the implementation output) —
        # byte-level provenance stays with the spec derivation
        with open(os.path.join(HERE, f"{tid}-out.jsonld"), "w") as f:
            json.dump(authored, f, indent=1, sort_keys=True)
        sequence.append(
            {
                "@id": f"#{tid}",
                "@type": ["jld:PositiveEvaluationTest"],
                "name": name,
                "input": f"{tid}-in.jsonld",
                "expect": f"{tid}-out.jsonld",
                "option": option,
                "provenance": "spec-authored",
            }
        )
        print(f"== {tid} (spec-authored): {name}")

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
