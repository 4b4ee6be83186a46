"""IRI parsing/resolution helpers.

The reference uses the Rust ``url`` crate (``Url::parse`` + RFC 3986
``join``, see /root/reference/src/creation.rs:524-535 and 179-212). Earlier
rounds re-expressed ``join`` on top of ``urllib.parse.urljoin`` plus shims,
but a property test against the spec pseudocode
(tests/test_iri_property.py) kept finding urljoin deviations — base
fragments kept on empty refs, defined-but-empty query/fragment components
dropped, dot-segments surviving in network-path references, EMPTY PATH
SEGMENTS COLLAPSED ('a//b' → 'a/b') — so ``resolve`` now implements
RFC 3986 §5.2.2/§5.2.3/§5.2.4/§5.3 directly (appendix-B component regex,
merge, remove_dot_segments, recomposition) with no urljoin dependency.
This also removes the old global-scheme-registration shim urljoin needed
for non-http schemes.

* ``parse_base`` validates that a base IRI is absolute (has a scheme) and
  normalizes "authority-only" hierarchical URLs to carry a "/" path,
  matching ``Url::parse("http://x.test")`` → ``http://x.test/``.
* ``resolve`` keeps a fast path for plain relative-path references (the
  overwhelming majority of per-document @id values at 10^12 docs) and
  falls back to the full RFC algorithm otherwise.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit, urlunsplit

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

# RFC 3986 appendix B component regex, with the scheme group tightened to
# the grammar's actual `scheme` rule (ALPHA-led). Appendix B's permissive
# `[^:/?#]+` would read '1:2' as scheme '1' — but a non-letter-led prefix
# is not a scheme, and a relative reference like '1:2' (itself outside the
# path-noscheme grammar) is treated as a plain path by urljoin and the url
# crate alike; the permissive form made resolve() silently DROP the '1:'
# (found by review r4b). has_scheme uses the same ALPHA-led rule, so the
# two can never disagree about what counts as absolute.
_COMPONENT_RE = re.compile(
    r"^(([A-Za-z][A-Za-z0-9+.\-]*):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?",
    re.S,
)


def has_scheme(value: str) -> bool:
    return bool(_SCHEME_RE.match(value))


def parse_base(value: str) -> str:
    """Validate + normalize an absolute base IRI; raises ValueError."""
    if not has_scheme(value):
        raise ValueError(f"relative URL without a base: {value!r}")
    # fast path: authority-form URL that already has a path — the common
    # shape of every crawl url; urlsplit costs show up at 10^12 docs.
    # Bail to the slow path when '?'/'#' exist (a '/' may live inside the
    # query/fragment) or dot-segments need normalizing.
    i = value.find("://")
    if (
        i > 0
        and "?" not in value
        and "#" not in value
        and "/." not in value
        and value.find("/", i + 3) != -1
    ):
        return value
    scheme, netloc, path, query, frag = urlsplit(value)
    if netloc and not path:
        path = "/"
    return urlunsplit((scheme, netloc, path, query, frag))


def _split_components(value: str):
    """(scheme, authority, path, query, fragment); absent components are
    None, defined-but-empty ones are '' — the distinction §5.3 keeps."""
    m = _COMPONENT_RE.match(value)
    return m.group(2), m.group(4), m.group(5) or "", m.group(7), m.group(9)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, transcribed from the spec's pseudocode."""
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


def _merge_paths(base_authority, base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.2.3 merge."""
    if base_authority is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    return (base_path[: i + 1] if i >= 0 else "") + ref_path


@lru_cache(maxsize=16384)
def resolve(base: str, reference: str) -> str:
    """RFC 3986 §5 resolution of ``reference`` against absolute ``base``.
    Memoized, plus a fast path for plain relative-path references: merge =
    base up to its last '/' + reference (no dot-segments, no query/fragment
    on either side — the overwhelmingly common per-document @id shape)."""
    if has_scheme(reference):
        # JSON-LD's expand_iri routes every colon-bearing value here only
        # after the compact-IRI split; scheme-bearing references are
        # returned verbatim (the url-crate parse path never merges them)
        return reference
    if reference == "":
        # §5.2.2: T.fragment = R.fragment = undefined — the empty reference
        # is the base WITHOUT its fragment (the round-3 fixture-found bug)
        return base.split("#", 1)[0]
    if (
        "?" not in base
        and "#" not in base
        and "/." not in base  # dot-segments in base must normalize
        and not reference.startswith(("/", "?", "#"))
        # no dot-segments anywhere in the reference: '/.' against the
        # '/'-prefixed form catches leading '.'/'..', interior '/./' and
        # '/../', AND trailing '/.' or '/..' (a lone '.' slipped an earlier
        # substring guard — found by tests/test_iri_property.py).
        # Conservative: segments merely STARTING with a dot ('.g') also
        # bail to the full algorithm, which resolves them correctly.
        and "/." not in "/" + reference
        and "?" not in reference
        and "#" not in reference
    ):
        i = base.find("://")
        if i > 0:
            slash = base.rfind("/")
            if slash > i + 2:  # a '/' after the authority
                return base[: slash + 1] + reference

    # full §5.2.2 transform-references (strict mode; R.scheme is absent)
    b_scheme, b_auth, b_path, b_query, _b_frag = _split_components(base)
    _r_scheme, r_auth, r_path, r_query, r_frag = _split_components(reference)
    if r_auth is not None:
        t_auth = r_auth
        t_path = _remove_dot_segments(r_path)
        t_query = r_query
    elif r_path == "":
        t_auth, t_path = b_auth, b_path
        t_query = r_query if r_query is not None else b_query
    else:
        t_auth = b_auth
        if r_path.startswith("/"):
            t_path = _remove_dot_segments(r_path)
        else:
            t_path = _remove_dot_segments(_merge_paths(b_auth, b_path, r_path))
        t_query = r_query

    # §5.3 recomposition: defined-but-empty query/fragment keep their bare
    # separator (the round-4 fixture-found bug class)
    out = (b_scheme + ":") if b_scheme is not None else ""
    if t_auth is not None:
        out += "//" + t_auth
    out += t_path
    if t_query is not None:
        out += "?" + t_query
    if r_frag is not None:
        out += "#" + r_frag
    return out
