"""Property test: iri.resolve vs an RFC 3986 §5 reference resolver
transcribed directly from the spec's pseudocode (§5.2.2 transform
references, §5.2.3 merge, §5.2.4 remove_dot_segments, §5.3 recomposition,
appendix-B component regex).

History: four real resolver bugs came out of this area — base-fragment
retention on empty refs (round 3), defined-but-empty query/fragment
components dropped, a lone '.' escaping the fast path's dot-segment
guard, and urljoin collapsing empty path segments ('a//b' → 'a/b') /
keeping dot-segments in network-path references (all round 4; the last
two were found BY this test). The production resolver now implements the
RFC algorithm directly, so this comparison is between two separately
written transcriptions of the same public pseudocode — its remaining
teeth are the FAST PATH vs full-algorithm consistency (independent logic)
and regression pinning of the whole algebra.

Scope: RELATIVE references only (no scheme). The engine deliberately
returns scheme-bearing values verbatim (JSON-LD's expand_iri treats any
colon-bearing value as an absolute IRI and never resolves it — see expand
fixture t0150), so absolute-ref normalization is out of contract.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonld_rs_spark.jsonldpy import iri

# scheme group is ALPHA-led (the RFC `scheme` rule, not appendix B's
# permissive form): '1:2' is a path, not scheme '1' — see iri._COMPONENT_RE
_COMPONENT_RE = re.compile(
    r"^(([A-Za-z][A-Za-z0-9+.\-]*):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"
)


def _split(ref: str):
    m = _COMPONENT_RE.match(ref)
    return (
        m.group(2),  # scheme (None if absent)
        m.group(4),  # authority (None if absent)
        m.group(5) or "",  # path
        m.group(7),  # query (None if absent; "" if bare '?')
        m.group(9),  # fragment (None if absent; "" if bare '#')
    )


def _remove_dot_segments(path: str) -> str:
    out = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            seg, path = (path[:i], path[i:]) if i >= 0 else (path, "")
            out.append(seg)
    return "".join(out)


def _merge(base_auth, base_path: str, ref_path: str) -> str:
    if base_auth is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    return (base_path[: i + 1] if i >= 0 else "") + ref_path


def rfc3986_resolve(base: str, ref: str) -> str:
    """Strict-mode reference resolution per RFC 3986 §5.2.2 + §5.3."""
    b_scheme, b_auth, b_path, b_query, _b_frag = _split(base)
    r_scheme, r_auth, r_path, r_query, r_frag = _split(ref)
    assert r_scheme is None, "property scope is relative references"
    if r_auth is not None:
        t_auth, t_path, t_query = r_auth, _remove_dot_segments(r_path), r_query
    elif r_path == "":
        t_auth, t_path = b_auth, b_path
        t_query = r_query if r_query is not None else b_query
    else:
        t_auth = b_auth
        if r_path.startswith("/"):
            t_path = _remove_dot_segments(r_path)
        else:
            t_path = _remove_dot_segments(_merge(b_auth, b_path, r_path))
        t_query = r_query
    out = b_scheme + ":"
    if t_auth is not None:
        out += "//" + t_auth
    out += t_path
    if t_query is not None:
        out += "?" + t_query
    if r_frag is not None:
        out += "#" + r_frag
    return out


# Letter-led colon segments are excluded (has_scheme treats them as
# absolute — JSON-LD never resolves those, expand fixture t0150) but
# NON-letter-led colon segments like '1:2' are in scope: they are plain
# path segments (review r4b found the permissive appendix-B scheme group
# silently dropping their '1:' prefix).
_SEG = st.sampled_from(
    ["a", "b", "g.x", ".g", "..", ".", "seg;p=1", "%C3%A9", "", "1:2", "2024:x"]
)
_BASES = st.sampled_from(
    [
        "https://site.example/a/b/doc",
        "https://site.example/a/b/",
        "https://h.example",
        "https://host.example:8443/api/v1/doc?q=1",
        "http://[2001:db8::1]:8080/root/doc",
        "ftp://user:pw@files.example/dir/f#frag",
        "https://site.example/enc%2Fdir/doc?old=1#of",
    ]
)


@st.composite
def _relative_refs(draw) -> str:
    kind = draw(st.sampled_from(["path", "abs-path", "net-path", "empty"]))
    if kind == "empty":
        path = ""
    else:
        segs = draw(st.lists(_SEG, min_size=1, max_size=4))
        path = "/".join(segs)
        if kind == "abs-path":
            path = "/" + path
        elif kind == "net-path":
            path = "//h2.example/" + path
        elif path.startswith("//"):  # path-kind must not look like net-path
            path = "a" + path
    q = draw(st.sampled_from([None, "", "q=2", "a?b"]))
    f = draw(st.sampled_from([None, "", "frag"]))
    ref = path
    if q is not None:
        ref += "?" + q
    if f is not None:
        ref += "#" + f
    return ref


@settings(max_examples=400, deadline=None)
@given(base=_BASES, ref=_relative_refs())
def test_resolve_matches_rfc3986(base, ref):
    if iri.has_scheme(ref):  # a "a:…"-shaped draw would be out of scope
        return
    got = iri.resolve(iri.parse_base(base), ref)
    want = rfc3986_resolve(iri.parse_base(base), ref)
    assert got == want, f"base={base!r} ref={ref!r}: {got!r} != {want!r}"


def test_digit_led_colon_segment_is_a_path():
    """Regression (review r4b): '1:2' is not scheme '1' — the full-
    algorithm path must keep the colon segment intact, agreeing with the
    fast path, urljoin, and the url crate."""
    assert (
        iri.resolve("http://a.example/b/c?q=1", "1:2")
        == "http://a.example/b/1:2"
    )
    assert iri.resolve("http://a.example/b/c", "1:2") == "http://a.example/b/1:2"
    assert (
        iri.resolve("http://a.example/b/c?q=1", "2024:doc#f")
        == "http://a.example/b/2024:doc#f"
    )
