"""IRI parsing/resolution helpers.

The reference uses the Rust ``url`` crate (``Url::parse`` + RFC 3986 ``join``,
see /root/reference/src/creation.rs:524-535 and 179-212). We re-express the
same observable behavior on top of ``urllib.parse`` with two shims:

* ``parse_base`` validates that a base IRI is absolute (has a scheme) and
  normalizes "authority-only" hierarchical URLs to carry a "/" path, matching
  ``Url::parse("http://x.test")`` → ``http://x.test/``.
* ``resolve`` performs RFC 3986 reference resolution for arbitrary schemes
  (``urljoin`` refuses unknown schemes, so we temporarily register them).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit, uses_netloc, uses_relative

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


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


_REGISTERED_SCHEMES = set(uses_relative) & set(uses_netloc)
_MAX_CUSTOM_SCHEMES = 64


def _ensure_scheme_registered(scheme: str) -> None:
    # urljoin only resolves relative refs for schemes it knows; JSON-LD test
    # suites use http(s) plus the occasional custom scheme. Registration is
    # capped: urllib's scheme lists are process-global and linear-scanned,
    # so unbounded adversarial schemes would degrade every urljoin in the
    # worker. Past the cap, unknown-scheme refs resolve as urljoin defaults.
    if not scheme or scheme in _REGISTERED_SCHEMES:
        return
    if len(_REGISTERED_SCHEMES) >= _MAX_CUSTOM_SCHEMES:
        return
    _REGISTERED_SCHEMES.add(scheme)
    if scheme not in uses_relative:
        uses_relative.append(scheme)
    if scheme not in uses_netloc:
        uses_netloc.append(scheme)


from functools import lru_cache


@lru_cache(maxsize=16384)
def resolve(base: str, reference: str) -> str:
    """RFC 3986 resolution of ``reference`` against absolute ``base``.
    Memoized, plus a fast path for plain relative-path references (the
    overwhelmingly common case for per-document @id values): merge = base
    up to its last '/' + reference (RFC 3986 §5.3, no dot-segments)."""
    if has_scheme(reference):
        return reference
    if reference == "":
        # RFC 3986 §5.2.2: T.fragment = R.fragment = undefined — the empty
        # reference is the base WITHOUT its fragment. urljoin('x#f', '')
        # returns base unchanged (urllib quirk); the reference's url crate
        # (WHATWG parser) drops the fragment, as the RFC does.
        return base.split("#", 1)[0]
    if reference.startswith("#"):
        # Fragment-only reference: T = base sans fragment + R (§5.2.2 keeps
        # Base.path/query verbatim, R.fragment may be DEFINED-EMPTY — a lone
        # '#' keeps its '#' in recomposition §5.3; urljoin drops it).
        return base.split("#", 1)[0] + reference
    if reference.startswith("?"):
        # Query-only reference: T.query = R.query even when defined-empty.
        # urljoin('http://a/doc?old=1', '?') wrongly KEEPS the old query;
        # per §5.2.2/§5.3 (and the url crate) the result is 'http://a/doc?'.
        return base.split("#", 1)[0].split("?", 1)[0] + reference
    if (
        reference
        and "?" not in base
        and "#" not in base
        and "/." not in base  # dot-segments in base must normalize (RFC §5.3)
        and not reference.startswith(("/", "?", "#"))
        and "./" not in reference
        and ".." not in reference
        and "#" not in reference
    ):
        i = base.find("://")
        if i > 0:
            slash = base.rfind("/")
            if slash > i + 2:  # a '/' after the authority
                return base[: slash + 1] + reference
    scheme = base.split(":", 1)[0].lower()
    _ensure_scheme_registered(scheme)
    result = urljoin(base, reference)
    # Defined-but-empty TRAILING components ('path?' / 'path#'): §5.3
    # recomposition emits the bare separator when the component is defined,
    # urljoin silently drops it. Queries may legally contain '?', so
    # defined-empty means nothing after the FIRST '?' of the pre-fragment
    # part; fragment defined-empty means nothing after the first '#'.
    before_frag, frag_sep, frag = reference.partition("#")
    if frag_sep and frag == "" and not result.endswith("#"):
        result += "#"
    _, q_sep, q = before_frag.partition("?")
    if q_sep and q == "":
        head, h_sep, tail = result.partition("#")
        if "?" not in head:
            result = head + "?" + h_sep + tail
    return result
