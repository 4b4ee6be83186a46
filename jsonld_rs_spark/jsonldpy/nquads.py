"""RDF 1.1 N-Quads parser (W3C REC, https://www.w3.org/TR/n-quads/ grammar).

The inverse of ``nquad_line`` (urdna2015.py): parses the line-based N-Quads
syntax into the ``Dataset`` shape ``rdf_to_jsonld`` consumes, completing the
fromRDF direction the reference implements at rdf.rs:277-515 (whose own test
surface never feeds it — rdf.rs is untested in-repo, SURVEY.md §5). Kept
strict: a malformed line raises ``NQuadsParseError`` with the line number,
so the Spark N-Quads source can quarantine bad lines per the pipeline's
containment rule instead of silently dropping data.

Grammar notes (all public, from the REC):
- statement ::= subject predicate object graphLabel? '.'
- subject/graphLabel: IRIREF | BLANK_NODE_LABEL; predicate: IRIREF
- object: IRIREF | BLANK_NODE_LABEL | literal
- literal: STRING_LITERAL_QUOTE ('^^' IRIREF | LANGTAG)?
- ECHAR escapes: tbnrf"'\\ ; UCHAR: \\uXXXX and \\UXXXXXXXX
- comments: '#' to end of line (outside a statement's tokens)
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from .rdf import Dataset, Quad

RDF_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


class NQuadsParseError(ValueError):
    def __init__(self, message: str, line_no: Optional[int] = None) -> None:
        # line_no None = caller parses one statement in isolation (the Spark
        # source, where Spark's splittable text reader has no absolute line
        # position) — embed no fabricated number.
        super().__init__(f"line {line_no}: {message}" if line_no else message)
        self.line_no = line_no


_ECHAR = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}

# one token: IRIREF, blank node label, or quoted string (with escapes)
# IRIREF ::= '<' ([^#x00-#x20<>"{}|^`\] | UCHAR)* '>'  — backslash is only
# legal as part of a UCHAR escape, which the alternation encodes directly.
_IRIREF = re.compile(
    r'<((?:[^<>"{}|^`\\\x00-\x20]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*)>'
)
# BLANK_NODE_LABEL ::= '_:' (PN_CHARS_U | [0-9]) ((PN_CHARS | '.')* PN_CHARS)?
# PN_CHARS_U includes '_' and ':'; the label may contain interior dots but
# must END on PN_CHARS, so the statement terminator '.' is never swallowed.
_PN_CHARS_BASE = (
    "A-Za-z"
    "\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D\u037F-\u1FFF"
    "\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF\uF900-\uFDCF"
    "\uFDF0-\uFFFD\U00010000-\U000EFFFF"
)
_PN_CHARS_U = _PN_CHARS_BASE + "_:"
_PN_CHARS = _PN_CHARS_U + "0-9\\-\u00B7\u0300-\u036F\u203F-\u2040"
_BLANK = re.compile(
    "_:([" + _PN_CHARS_U + "0-9](?:[" + _PN_CHARS + ".]*[" + _PN_CHARS + "])?)"
)
_STRING = re.compile(r'"((?:[^"\\\n\r]|\\.)*)"')
_LANGTAG = re.compile(r"@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)")
_UCHAR = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")


def _check_scalar(cp: int, line_no: Optional[int]) -> int:
    """UCHAR must denote a Unicode scalar value: RDF strings are scalar
    sequences, and a lone surrogate (U+D800-U+DFFF) cannot cross the Arrow
    serialization boundary — it would kill the whole Spark task instead of
    quarantining the one line (pipeline containment rule, CLAUDE.md)."""
    if 0xD800 <= cp <= 0xDFFF:
        raise NQuadsParseError(f"surrogate code point U+{cp:04X} in escape", line_no)
    if cp > 0x10FFFF:
        raise NQuadsParseError("escape beyond U+10FFFF", line_no)
    return cp


def _unescape_string(raw: str, line_no: Optional[int]) -> str:
    """Resolve ECHAR + UCHAR escapes in a STRING_LITERAL_QUOTE body."""
    if "\\" not in raw:
        return raw
    out: List[str] = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise NQuadsParseError("dangling backslash in literal", line_no)
        nxt = raw[i + 1]
        if nxt in _ECHAR:
            out.append(_ECHAR[nxt])
            i += 2
        elif nxt == "u":
            hexs = raw[i + 2 : i + 6]
            if len(hexs) != 4 or not re.fullmatch(r"[0-9A-Fa-f]{4}", hexs):
                raise NQuadsParseError(f"bad \\u escape at {i}", line_no)
            out.append(chr(_check_scalar(int(hexs, 16), line_no)))
            i += 6
        elif nxt == "U":
            hexs = raw[i + 2 : i + 10]
            if len(hexs) != 8 or not re.fullmatch(r"[0-9A-Fa-f]{8}", hexs):
                raise NQuadsParseError(f"bad \\U escape at {i}", line_no)
            out.append(chr(_check_scalar(int(hexs, 16), line_no)))
            i += 10
        else:
            raise NQuadsParseError(f"invalid escape \\{nxt}", line_no)
    return "".join(out)


def _unescape_iri(raw: str, line_no: Optional[int]) -> str:
    """IRIREF allows only UCHAR escapes (no ECHAR)."""
    if "\\" not in raw:
        return raw

    def sub(m: "re.Match[str]") -> str:
        cp = int(m.group(1) or m.group(2), 16)
        return chr(_check_scalar(cp, line_no))

    out, count = _UCHAR.subn(sub, raw)
    if "\\" in _UCHAR.sub("", raw):
        raise NQuadsParseError("invalid escape in IRI", line_no)
    return out


def _take_term(
    line: str, pos: int, line_no: Optional[int], *, allow_literal: bool
) -> Tuple[str, str, Optional[str], Optional[str], int]:
    """Parse one term at ``pos``. Returns (kind, value, datatype, lang, end)
    with kind 'id' | 'literal' (matching Quad.obj_kind)."""
    if line.startswith("<", pos):
        m = _IRIREF.match(line, pos)
        if not m:
            raise NQuadsParseError(f"malformed IRI at col {pos}", line_no)
        return ("id", _unescape_iri(m.group(1), line_no), None, None, m.end())
    if line.startswith("_:", pos):
        m = _BLANK.match(line, pos)
        if not m:
            raise NQuadsParseError(f"malformed blank node at col {pos}", line_no)
        return ("id", "_:" + m.group(1), None, None, m.end())
    if line.startswith('"', pos):
        if not allow_literal:
            raise NQuadsParseError(
                f"literal not allowed in this position (col {pos})", line_no
            )
        m = _STRING.match(line, pos)
        if not m:
            raise NQuadsParseError(f"malformed string literal at col {pos}", line_no)
        value = _unescape_string(m.group(1), line_no)
        end = m.end()
        if line.startswith("^^", end):
            dm = _IRIREF.match(line, end + 2)
            if not dm:
                raise NQuadsParseError(f"malformed datatype IRI at col {end}", line_no)
            return ("literal", value, _unescape_iri(dm.group(1), line_no), None, dm.end())
        if line.startswith("@", end):
            lm = _LANGTAG.match(line, end)
            if not lm:
                raise NQuadsParseError(f"malformed language tag at col {end}", line_no)
            return ("literal", value, RDF_LANG_STRING, lm.group(1), lm.end())
        return ("literal", value, XSD_STRING, None, end)
    raise NQuadsParseError(f"expected term at col {pos}", line_no)


def _skip_ws(line: str, pos: int) -> int:
    while pos < len(line) and line[pos] in " \t":
        pos += 1
    return pos


def parse_nquads(text: str, generalized: bool = False) -> Dataset:
    """Parse an N-Quads document into ``{graph_name: [Quad, ...]}`` with
    ``'@default'`` for the default graph — the shape ``rdf_to_jsonld`` and
    ``canonical_nquads`` consume. Quad order within a graph is document
    order (callers needing canonical order re-sort via canonical_nquads).

    ``generalized=True`` additionally accepts blank-node predicates — not
    valid N-Quads, but the engine's toRDF emits them (generalized-RDF
    quirk, tr053) so its own serialized output can round-trip."""
    dataset: Dataset = {}
    for line_no, raw_line in enumerate(text.split("\n"), start=1):
        parsed = parse_nquad_statement(raw_line, generalized=generalized, line_no=line_no)
        if parsed is None:
            continue
        graph, quad = parsed
        dataset.setdefault(graph, []).append(quad)
    return dataset


def parse_nquad_statement(
    raw_line: str, generalized: bool = False, line_no: Optional[int] = None
) -> Optional[Tuple[str, Quad]]:
    """Parse ONE N-Quads statement; ``None`` for blank/comment-only lines.

    The Spark source calls this per text-source row — Spark's splittable
    reader has no absolute file position, so ``line_no`` stays ``None`` and
    errors carry no fabricated line number (the quarantine record holds the
    verbatim line + source file instead)."""
    line = raw_line.strip("\r")
    pos = _skip_ws(line, 0)
    if pos >= len(line) or line[pos] == "#":
        return None
    kind, subj, _, _, pos = _take_term(line, pos, line_no, allow_literal=False)
    pos = _skip_ws(line, pos)
    pkind, pred, _, _, pos = _take_term(line, pos, line_no, allow_literal=False)
    if pred.startswith("_:") and not generalized:
        # predicate must be an IRIREF per the REC grammar
        raise NQuadsParseError("blank node predicate not allowed", line_no)
    pos = _skip_ws(line, pos)
    okind, ovalue, odt, olang, pos = _take_term(line, pos, line_no, allow_literal=True)
    pos = _skip_ws(line, pos)
    graph = "@default"
    if pos < len(line) and line[pos] != ".":
        gkind, graph, _, _, pos = _take_term(line, pos, line_no, allow_literal=False)
        pos = _skip_ws(line, pos)
    if pos >= len(line) or line[pos] != ".":
        raise NQuadsParseError("missing terminating '.'", line_no)
    tail = _skip_ws(line, pos + 1)
    if tail < len(line) and line[tail] != "#":
        raise NQuadsParseError(f"trailing content at col {tail}", line_no)
    # in-memory convention (object_to_rdf): plain strings carry xsd:string
    # explicitly, matching what _take_term already assigns — round-trips
    # through nquad_line are exact
    return graph, Quad(subj, pred, okind, ovalue, odt if okind == "literal" else None, olang)
