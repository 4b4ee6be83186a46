"""One-time generator for fromRDF conformance fixtures (the direction the
reference implements at rdf.rs:277-515 but never tests — SURVEY.md §5).
Inputs are authored N-Quads documents; expected outputs are hand-derived
from the JSON-LD 1.0 §10.5 "Serialize RDF as JSON-LD" algorithm plus the
implementation's documented deviations (rdf.py rdf_to_jsonld docstring:
spec-correct list-node size checks where the reference's are buggy, and the
reference's named-graph drop quirk). The generator ASSERTS the authored
expectation against the implementation before committing; a mismatch aborts.

Comparison is on json.dumps(sort_keys=True) strings, not Python ==, because
Python's 1 == 1.0 == True would mask native-type conversion bugs the
type-sensitive dedup exists to prevent.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from jsonld_rs_spark.jsonldpy import parse_nquads, rdf_to_jsonld  # noqa: E402

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fromRdf")

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XSD = "http://www.w3.org/2001/XMLSchema#"
_NIL = _RDF + "nil"
_FIRST = _RDF + "first"
_REST = _RDF + "rest"

# (id, name, nquads_text, {useNativeTypes?, useRdfType?}, authored_output)
CASES = [
    (
        "fr001",
        "plain, typed, and language-tagged literals (native types off)",
        '<http://e/s> <http://e/plain> "plain" .\n'
        f'<http://e/s> <http://e/num> "5"^^<{_XSD}integer> .\n'
        '<http://e/s> <http://e/tag> "x"@en .\n',
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/plain": [{"@value": "plain"}],
                "http://e/num": [{"@value": "5", "@type": _XSD + "integer"}],
                "http://e/tag": [{"@value": "x", "@language": "en"}],
            }
        },
    ),
    (
        "fr002",
        "useNativeTypes converts well-formed integer/double/boolean; "
        "non-JSON lexicals (incl. leading-zero integers) stay typed strings",
        f'<http://e/s> <http://e/a> "5"^^<{_XSD}integer> .\n'
        f'<http://e/s> <http://e/b> "2.5"^^<{_XSD}double> .\n'
        f'<http://e/s> <http://e/c> "true"^^<{_XSD}boolean> .\n'
        f'<http://e/s> <http://e/d> "bogus"^^<{_XSD}integer> .\n'
        f'<http://e/s> <http://e/e> "07"^^<{_XSD}integer> .\n'
        f'<http://e/s> <http://e/f> "NaN"^^<{_XSD}double> .\n',
        {"useNativeTypes": True},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/a": [{"@value": 5}],
                "http://e/b": [{"@value": 2.5}],
                "http://e/c": [{"@value": True}],
                # json.loads rejects "bogus" and "07" (leading zero), and
                # NaN is not representable in a JSON-LD value — all three
                # keep their typed-string form
                "http://e/d": [{"@value": "bogus", "@type": _XSD + "integer"}],
                "http://e/e": [{"@value": "07", "@type": _XSD + "integer"}],
                "http://e/f": [{"@value": "NaN", "@type": _XSD + "double"}],
            }
        },
    ),
    (
        "fr003",
        "rdf:type aggregates into @type, deduped, in quad order",
        f'<http://e/s> <{_RDF}type> <http://e/T1> .\n'
        f'<http://e/s> <{_RDF}type> <http://e/T2> .\n'
        f'<http://e/s> <{_RDF}type> <http://e/T1> .\n'
        '<http://e/s> <http://e/p> "v" .\n',
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "@type": ["http://e/T1", "http://e/T2"],
                "http://e/p": [{"@value": "v"}],
            }
        },
    ),
    (
        "fr004",
        "useRdfType keeps rdf:type as an ordinary property of node refs",
        f'<http://e/s> <{_RDF}type> <http://e/T1> .\n'
        f'<http://e/s> <{_RDF}type> <http://e/T2> .\n',
        {"useRdfType": True},
        {
            "http://e/s": {
                "@id": "http://e/s",
                _RDF + "type": [{"@id": "http://e/T1"}, {"@id": "http://e/T2"}],
            }
        },
    ),
    (
        "fr005",
        "a one-item rdf:first/rest chain reconstructs as @list",
        f'_:b0 <{_FIRST}> "a" .\n'
        f'_:b0 <{_REST}> <{_NIL}> .\n'
        "<http://e/s> <http://e/p> _:b0 .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@list": [{"@value": "a"}]}],
            }
        },
    ),
    (
        "fr006",
        "a three-item chain with mixed member kinds (native types on)",
        f'_:b0 <{_FIRST}> "a" .\n'
        "_:b0 <" + _REST + "> _:b1 .\n"
        f'_:b1 <{_FIRST}> "2"^^<{_XSD}integer> .\n'
        "_:b1 <" + _REST + "> _:b2 .\n"
        "_:b2 <" + _FIRST + "> <http://e/o> .\n"
        f'_:b2 <{_REST}> <{_NIL}> .\n'
        "<http://e/s> <http://e/p> _:b0 .\n",
        {"useNativeTypes": True},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [
                    {"@list": [{"@value": "a"}, {"@value": 2}, {"@id": "http://e/o"}]}
                ],
            }
        },
    ),
    (
        "fr007",
        "a nested list: the inner chain reconstructs inside the outer's "
        "rdf:first via the shared value dict",
        f'_:i0 <{_FIRST}> "x" .\n'
        f'_:i0 <{_REST}> <{_NIL}> .\n'
        "_:o0 <" + _FIRST + "> _:i0 .\n"
        f'_:o0 <{_REST}> <{_NIL}> .\n'
        "<http://e/s> <http://e/p> _:o0 .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@list": [{"@list": [{"@value": "x"}]}]}],
            }
        },
    ),
    (
        "fr008",
        "a list node with an extra property breaks reconstruction; the "
        "trailing nil reference still converts to an empty @list (spec "
        "§10.5 semantics on malformed chains)",
        f'_:b0 <{_FIRST}> "a" .\n'
        f'_:b0 <{_REST}> <{_NIL}> .\n'
        '_:b0 <http://e/x> "extra" .\n'
        "<http://e/s> <http://e/p> _:b0 .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "_:b0"}],
            },
            "_:b0": {
                "@id": "_:b0",
                _FIRST: [{"@value": "a"}],
                _REST: [{"@list": []}],
                "http://e/x": [{"@value": "extra"}],
            },
        },
    ),
    (
        "fr009",
        "an rdf:type rdf:List annotation on a chain node is tolerated "
        "(the 4-member well-formed shape)",
        f'_:b0 <{_FIRST}> "a" .\n'
        f'_:b0 <{_REST}> <{_NIL}> .\n'
        f'_:b0 <{_RDF}type> <{_RDF}List> .\n'
        "<http://e/s> <http://e/p> _:b0 .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@list": [{"@value": "a"}]}],
            }
        },
    ),
    (
        "fr010",
        "a chain head referenced twice cannot reconstruct (usage not "
        "unique); the nil tail still becomes an empty @list",
        f'_:b0 <{_FIRST}> "a" .\n'
        f'_:b0 <{_REST}> <{_NIL}> .\n'
        "<http://e/s> <http://e/p> _:b0 .\n"
        "<http://e/s> <http://e/q> _:b0 .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "_:b0"}],
                "http://e/q": [{"@id": "_:b0"}],
            },
            "_:b0": {
                "@id": "_:b0",
                _FIRST: [{"@value": "a"}],
                _REST: [{"@list": []}],
            },
        },
    ),
    (
        "fr011",
        "a direct rdf:nil object is an empty @list",
        f'<http://e/s> <http://e/p> <{_NIL}> .\n',
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@list": []}],
            }
        },
    ),
    (
        "fr012",
        "rdf:nil under rdf:first stays a node reference (an empty list "
        "nested in a list cannot convert — its usage is not unique)",
        f'_:b0 <{_FIRST}> <{_NIL}> .\n'
        f'_:b0 <{_REST}> <{_NIL}> .\n'
        "<http://e/s> <http://e/p> _:b0 .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@list": [{"@id": _NIL}]}],
            }
        },
    ),
    (
        "fr013",
        "a named graph attaches as @graph under the default-graph node "
        "bearing its name",
        '<http://e/g> <http://e/about> "graph one" .\n'
        '<http://e/s2> <http://e/q> "in-graph" <http://e/g> .\n',
        {},
        {
            "http://e/g": {
                "@id": "http://e/g",
                "http://e/about": [{"@value": "graph one"}],
                "@graph": [
                    {"@id": "http://e/s2", "http://e/q": [{"@value": "in-graph"}]}
                ],
            }
        },
    ),
    (
        "fr014",
        "reference quirk (rdf.rs:486-509): a graph whose name is never a "
        "default-graph subject is DROPPED (the spec would hoist a stub)",
        '<http://e/s> <http://e/p> "v" .\n'
        '<http://e/s2> <http://e/q> "w" <http://e/g> .\n',
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@value": "v"}],
            }
        },
    ),
    (
        "fr015",
        "type-sensitive dedup: duplicate integers collapse; 1, 1.0 and "
        "true stay three distinct native values",
        f'<http://e/s> <http://e/p> "1"^^<{_XSD}integer> .\n'
        f'<http://e/s> <http://e/p> "1"^^<{_XSD}integer> .\n'
        f'<http://e/s> <http://e/p> "1.0"^^<{_XSD}double> .\n'
        f'<http://e/s> <http://e/p> "true"^^<{_XSD}boolean> .\n',
        {"useNativeTypes": True},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@value": 1}, {"@value": 1.0}, {"@value": True}],
            }
        },
    ),
    (
        "fr016",
        "blank subjects and objects keep their input labels",
        "_:alice <http://e/knows> _:bob .\n"
        '_:bob <http://e/name> "Bob" .\n',
        {},
        {
            "_:alice": {
                "@id": "_:alice",
                "http://e/knows": [{"@id": "_:bob"}],
            },
            "_:bob": {
                "@id": "_:bob",
                "http://e/name": [{"@value": "Bob"}],
            },
        },
    ),
    (
        "fr017",
        "an object-only node (no properties of its own) is elided",
        "<http://e/s> <http://e/p> <http://e/o> .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "http://e/o"}],
            }
        },
    ),
    (
        "fr018",
        "string escapes resolve: newline, quote, \\u and \\U forms",
        '<http://e/s> <http://e/p> "line1\\nline2 \\"q\\" \\u00e9 \\U0001F600" .\n',
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@value": 'line1\nline2 "q" é \U0001F600'}],
            }
        },
    ),
    (
        "fr019",
        "list reconstruction is graph-scoped: a chain inside a named graph "
        "rebuilds within that graph's @graph array",
        '<http://e/g> <http://e/meta> "m" .\n'
        f'_:b0 <{_FIRST}> "a" <http://e/g> .\n'
        f'_:b0 <{_REST}> <{_NIL}> <http://e/g> .\n'
        "<http://e/s> <http://e/p> _:b0 <http://e/g> .\n",
        {},
        {
            "http://e/g": {
                "@id": "http://e/g",
                "http://e/meta": [{"@value": "m"}],
                "@graph": [
                    {
                        "@id": "http://e/s",
                        "http://e/p": [{"@list": [{"@value": "a"}]}],
                    }
                ],
            }
        },
    ),
    (
        "fr020",
        "a chain ending at a non-nil IRI is no list at all (no rdf:nil "
        "usage, nothing reconstructs); the object-only tail node is elided",
        "<http://e/s> <http://e/p> _:l1 .\n"
        f'_:l1 <{_FIRST}> "a" .\n'
        f"_:l1 <{_REST}> <http://e/tail> .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "_:l1"}],
            },
            "_:l1": {
                "@id": "_:l1",
                _FIRST: [{"@value": "a"}],
                _REST: [{"@id": "http://e/tail"}],
            },
        },
    ),
    (
        "fr021",
        "two rdf:first values make the node non-well-formed (§10.5): the "
        "chain stays unreconstructed, only the nil reference becomes an "
        "empty @list",
        "<http://e/s> <http://e/p> _:l1 .\n"
        f'_:l1 <{_FIRST}> "a" .\n'
        f'_:l1 <{_FIRST}> "b" .\n'
        f"_:l1 <{_REST}> <{_NIL}> .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "_:l1"}],
            },
            "_:l1": {
                "@id": "_:l1",
                _FIRST: [{"@value": "a"}, {"@value": "b"}],
                _REST: [{"@list": []}],
            },
        },
    ),
    (
        "fr022",
        "two rdf:rest values make the node non-well-formed (§10.5 demands "
        "exactly one of EACH): before the r7 rest-arity fix this node "
        "reconstructed anyway and the second branch's member vanished "
        "from the output entirely; now the fork is preserved and only the "
        "well-formed inner chain converts",
        "<http://e/s> <http://e/p> _:l1 .\n"
        f'_:l1 <{_FIRST}> "a" .\n'
        f"_:l1 <{_REST}> <{_NIL}> .\n"
        f"_:l1 <{_REST}> _:l2 .\n"
        f'_:l2 <{_FIRST}> "b" .\n'
        f"_:l2 <{_REST}> <{_NIL}> .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "_:l1"}],
            },
            "_:l1": {
                "@id": "_:l1",
                _FIRST: [{"@value": "a"}],
                _REST: [{"@list": []}, {"@list": [{"@value": "b"}]}],
            },
        },
    ),
    (
        "fr023",
        "an IRI-headed chain is no list (list nodes must be blank): the "
        "nil reference still converts to an empty @list",
        "<http://e/s> <http://e/p> <http://e/l1> .\n"
        f'<http://e/l1> <{_FIRST}> "a" .\n'
        f"<http://e/l1> <{_REST}> <{_NIL}> .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "http://e/l1"}],
            },
            "http://e/l1": {
                "@id": "http://e/l1",
                _FIRST: [{"@value": "a"}],
                _REST: [{"@list": []}],
            },
        },
    ),
    (
        "fr024",
        "language-tagged members survive list reconstruction with their "
        "tags",
        "<http://e/s> <http://e/p> _:l1 .\n"
        f'_:l1 <{_FIRST}> "hola"@es .\n'
        f"_:l1 <{_REST}> _:l2 .\n"
        f'_:l2 <{_FIRST}> "hello"@en .\n'
        f"_:l2 <{_REST}> <{_NIL}> .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [
                    {
                        "@list": [
                            {"@value": "hola", "@language": "es"},
                            {"@value": "hello", "@language": "en"},
                        ]
                    }
                ],
            }
        },
    ),
    (
        "fr025",
        "a BLANK graph label attaches @graph under the default-graph blank "
        "node bearing it (same rule as IRI labels)",
        '_:g <http://e/anchor> "in-default" .\n'
        "<http://e/s> <http://e/p> _:g .\n"
        '<http://e/a> <http://e/b> "x" _:g .\n',
        {},
        {
            "_:g": {
                "@id": "_:g",
                "http://e/anchor": [{"@value": "in-default"}],
                "@graph": [
                    {"@id": "http://e/a", "http://e/b": [{"@value": "x"}]}
                ],
            },
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "_:g"}],
            },
        },
    ),
    (
        "fr026",
        "rdf:type with a blank-node object aggregates into @type like an "
        "IRI object",
        f"<http://e/s> <{_RDF}type> _:t .\n"
        '_:t <http://e/q> "y" .\n',
        {},
        {
            "http://e/s": {"@id": "http://e/s", "@type": ["_:t"]},
            "_:t": {"@id": "_:t", "http://e/q": [{"@value": "y"}]},
        },
    ),
    (
        "fr027",
        "rdf:type with a LITERAL object bypasses @type aggregation (the "
        "step applies to IRI/blank objects only) and stays an ordinary "
        "property",
        f'<http://e/s> <{_RDF}type> "Person" .\n',
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                _RDF + "type": [{"@value": "Person"}],
            }
        },
    ),
    (
        "fr028",
        "a graph whose name is a subject INSIDE its own graph: the inner "
        "node appears under @graph with the same @id as its carrier",
        '<http://e/g> <http://e/p> "anchor" .\n'
        '<http://e/g> <http://e/q> "inner" <http://e/g> .\n',
        {},
        {
            "http://e/g": {
                "@id": "http://e/g",
                "http://e/p": [{"@value": "anchor"}],
                "@graph": [
                    {"@id": "http://e/g", "http://e/q": [{"@value": "inner"}]}
                ],
            }
        },
    ),
    (
        "fr029",
        "two chains sharing a tail: the shared node's usage is not unique, "
        "so neither list reconstructs and the fork stays explicit",
        "<http://e/s> <http://e/p> _:a .\n"
        "<http://e/s> <http://e/q> _:b .\n"
        f'_:a <{_FIRST}> "x" .\n'
        f"_:a <{_REST}> _:t .\n"
        f'_:b <{_FIRST}> "y" .\n'
        f"_:b <{_REST}> _:t .\n"
        f'_:t <{_FIRST}> "z" .\n'
        f"_:t <{_REST}> <{_NIL}> .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "_:a"}],
                "http://e/q": [{"@id": "_:b"}],
            },
            "_:a": {
                "@id": "_:a",
                _FIRST: [{"@value": "x"}],
                _REST: [{"@id": "_:t"}],
            },
            "_:b": {
                "@id": "_:b",
                _FIRST: [{"@value": "y"}],
                _REST: [{"@id": "_:t"}],
            },
            "_:t": {
                "@id": "_:t",
                _FIRST: [{"@value": "z"}],
                _REST: [{"@list": []}],
            },
        },
    ),
    (
        "fr030",
        "native doubles: exponent lexicals parse as JSON numbers; "
        '"1"^^xsd:double natively converts to JSON INTEGER 1 (reference '
        "parity, rdf.rs:215-267 — doubleness is lost and a re-serialization "
        "would emit xsd:integer); xsd:decimal is never converted",
        f'<http://e/s> <http://e/a> "1.0E0"^^<{_XSD}double> .\n'
        f'<http://e/s> <http://e/b> "1.5"^^<{_XSD}decimal> .\n'
        f'<http://e/s> <http://e/c> "1"^^<{_XSD}double> .\n',
        {"useNativeTypes": True},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/a": [{"@value": 1.0}],
                "http://e/b": [{"@value": "1.5", "@type": _XSD + "decimal"}],
                "http://e/c": [{"@value": 1}],
            }
        },
    ),
    (
        "fr031",
        "a blank-node cycle keeps both nodes at top level with mutual "
        "references (no inlining in the node-map form)",
        "<http://e/s> <http://e/p> _:a .\n"
        "_:a <http://e/p> _:b .\n"
        "_:b <http://e/p> _:a .\n",
        {},
        {
            "http://e/s": {
                "@id": "http://e/s",
                "http://e/p": [{"@id": "_:a"}],
            },
            "_:a": {"@id": "_:a", "http://e/p": [{"@id": "_:b"}]},
            "_:b": {"@id": "_:b", "http://e/p": [{"@id": "_:a"}]},
        },
    ),
]


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    sequence = []
    for tid, name, nquads, option, authored in CASES:
        with open(os.path.join(HERE, f"{tid}-in.nq"), "w") as f:
            f.write(nquads)
        ds = parse_nquads(nquads)
        actual = rdf_to_jsonld(
            ds,
            use_native_types=option.get("useNativeTypes", False),
            use_rdf_type=option.get("useRdfType", False),
        )
        a_s = json.dumps(actual, indent=1, sort_keys=True)
        e_s = json.dumps(authored, indent=1, sort_keys=True)
        if a_s != e_s:
            print(f"!! SPEC MISMATCH {tid}: {name}")
            print("-- authored expectation:")
            print(e_s)
            print("-- implementation output:")
            print(a_s)
            raise SystemExit(1)
        with open(os.path.join(HERE, f"{tid}-out.jsonld"), "w") as f:
            f.write(e_s)
        sequence.append(
            {
                "@id": f"#{tid}",
                "@type": ["jld:PositiveEvaluationTest"],
                "name": name,
                "input": f"{tid}-in.nq",
                "expect": f"{tid}-out.jsonld",
                "option": option,
                "provenance": "spec-authored",
            }
        )
        print(f"== {tid} (spec-authored): {name}")

    manifest = {"sequence": sequence}
    with open(os.path.join(HERE, "manifest.jsonld"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
