"""Manifest-driven fromRDF conformance: N-Quads input → JSON-LD node map
(the reference's rdf.rs:277-515 direction, untested in-repo there —
SURVEY.md §5). Expectations are hand-derived from JSON-LD 1.0 §10.5 plus
the documented deviations (see rdf_to_jsonld docstring), asserted at
generation time by make_fromrdf_fixtures.py.

Comparison is on json.dumps(sort_keys=True) strings: Python's
1 == 1.0 == True would otherwise mask native-type conversion bugs.
"""

import glob
import json
import os

import pytest

from jsonld_rs_spark.jsonldpy import (
    NQuadsParseError,
    canonical_nquads,
    parse_nquads,
    rdf_to_jsonld,
)

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "fromRdf")

with open(os.path.join(HERE, "manifest.jsonld")) as f:
    MANIFEST = json.load(f)


@pytest.mark.parametrize("case", MANIFEST["sequence"], ids=lambda c: c["@id"])
def test_fromrdf(case):
    with open(os.path.join(HERE, case["input"])) as f:
        ds = parse_nquads(f.read())
    with open(os.path.join(HERE, case["expect"])) as f:
        expected = json.load(f)
    opt = case.get("option", {})
    actual = rdf_to_jsonld(
        ds,
        use_native_types=opt.get("useNativeTypes", False),
        use_rdf_type=opt.get("useRdfType", False),
    )
    assert json.dumps(actual, sort_keys=True) == json.dumps(expected, sort_keys=True), (
        case["name"]
    )


# ---------------------------------------------------------------------------
# Parser validation independent of the authored cases: every committed
# canonical toRDF output must round-trip parse → canonicalize BIT-EXACT
# (165 files covering escapes, graphs, blanks, datatypes, langs). This ties
# the parser to the serializer the same way the toRDF manifest ties the
# serializer to the spec.
# ---------------------------------------------------------------------------

_TORDF_OUTS = sorted(
    glob.glob(os.path.join(os.path.dirname(HERE), "toRdf", "*-out.nq"))
)


@pytest.mark.parametrize("path", _TORDF_OUTS, ids=os.path.basename)
def test_parse_roundtrips_canonical_output(path):
    with open(path) as f:
        text = f.read()
    # generalized=True: two fixtures carry blank-node predicates (the
    # engine's generalized-RDF quirk, t0010/tr053)
    assert canonical_nquads(parse_nquads(text, generalized=True)) == text


def test_parser_rejects_blank_predicate_in_strict_mode():
    with pytest.raises(NQuadsParseError):
        parse_nquads("_:s _:p <http://o> .")
    ds = parse_nquads("_:s _:p <http://o> .", generalized=True)
    assert ds["@default"][0].pred == "_:p"


@pytest.mark.parametrize(
    "bad",
    [
        "<http://a> <http://b>",  # missing object + dot
        '<http://a> <http://b> "x" <http://g> <http://h> .',  # 5 terms
        '<http://a> "lit" <http://c> .',  # literal predicate
        '"lit" <http://b> <http://c> .',  # literal subject
        '<http://a> <http://b> "\\q" .',  # invalid escape
        '<http://a> <http://b> "x"@ .',  # empty language tag
        '<http://a> <http://b> "x"^^<http://d',  # unterminated datatype IRI
        '<http://a> <http://b> "x" extra .',  # junk where graph label goes
        '<http://a> <http://b> "x" . trailing',  # content after the dot
        "<http://a> <http://b> <http://c> ",  # missing dot
        '<http://a> <http://b> "x\\U00110000" .',  # beyond U+10FFFF
    ],
    ids=lambda s: s[:30],
)
def test_parser_rejects_malformed_lines(bad):
    with pytest.raises(NQuadsParseError):
        parse_nquads(bad)


def test_parser_reports_line_numbers():
    with pytest.raises(NQuadsParseError) as ei:
        parse_nquads('<http://a> <http://b> "ok" .\n<http://a> <oops .\n')
    assert ei.value.line_no == 2


def test_parser_accepts_uchar_in_iris():
    """IRIREF ::= '<' ([^...] | UCHAR)* '>' — \\u/\\U escapes are part of the
    REC grammar; a third-party dump that escapes non-ASCII IRI characters
    must parse, not quarantine (r7 review finding: the old char class
    excluded backslash, making _unescape_iri unreachable)."""
    ds = parse_nquads('<http://ex/\\u00E9> <http://p> "x"^^<http://t\\U0001F600> .')
    q = ds["@default"][0]
    assert q.subj == "http://ex/é"
    assert q.obj_datatype == "http://t\U0001F600"
    # a backslash NOT forming a UCHAR is still malformed
    with pytest.raises(NQuadsParseError):
        parse_nquads('<http://ex/\\n> <http://p> "x" .')


def test_parser_blank_label_grammar():
    """BLANK_NODE_LABEL per the REC: PN_CHARS_U ('_', ':') may lead, interior
    dots are legal but the label must end on PN_CHARS — so the statement
    terminator '.' abutting a label is never swallowed (r7 review finding)."""
    ds = parse_nquads("_:_u <http://p> _:a.b .")
    assert ds["@default"][0].subj == "_:_u"
    assert ds["@default"][0].obj_value == "_:a.b"
    # label directly against the terminating dot, no space
    ds = parse_nquads("<http://s> <http://p> _:o.")
    assert ds["@default"][0].obj_value == "_:o"
    # non-ASCII PN_CHARS_BASE leading char
    ds = parse_nquads("_:éx <http://p> \"v\" .")
    assert ds["@default"][0].subj == "_:éx"


def test_parser_rejects_lone_surrogates():
    """A lone surrogate in a UCHAR escape would produce a Python str that
    Arrow cannot serialize — killing the whole Spark task instead of
    quarantining the line. Reject at parse so containment holds (r7 review
    finding)."""
    for bad in (
        '<http://s> <http://p> "\\uD800" .',
        '<http://s> <http://p> "\\UDFFF0000" .',
        '<http://s\\uDC00> <http://p> "x" .',
    ):
        with pytest.raises(NQuadsParseError):
            parse_nquads(bad)


def test_parse_nquad_statement_single_line():
    """The Spark source's per-row entry point: no fabricated line numbers,
    None for blank/comment rows."""
    from jsonld_rs_spark.jsonldpy.nquads import parse_nquad_statement

    assert parse_nquad_statement("  # c") is None
    assert parse_nquad_statement("") is None
    graph, q = parse_nquad_statement('<http://s> <http://p> "v" <http://g> .')
    assert graph == "http://g" and q.obj_value == "v"
    with pytest.raises(NQuadsParseError) as ei:
        parse_nquad_statement("<http://s> <bad")
    assert "line " not in str(ei.value)


def test_parser_accepts_comments_blanks_and_crlf():
    ds = parse_nquads(
        "# leading comment\r\n"
        "\r\n"
        '   <http://a> <http://b> "x"@en-Latn-GB _:g1 . # trailing\r\n'
        "_:s <http://b> <http://o> .\n"
    )
    assert ds["_:g1"][0].obj_lang == "en-Latn-GB"
    assert ds["@default"][0].subj == "_:s"
