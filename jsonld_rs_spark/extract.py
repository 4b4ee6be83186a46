"""HTML → JSON-LD blocks + text extraction (pure functions, UDF-safe).

The reference library has no HTML layer (its inputs are bare JSON files,
/root/reference/src/bin/test_expand.rs:55-59); this module supplies the
Common-Crawl-style front end demanded by the north rule. The extraction
contract is exact and deterministic so the per-row invariant
("byte-identical extracted text per url", BASELINE.json input_hint) is
testable: page text lives HTML-escaped inside ``<div id="doc-text">`` and
JSON-LD blocks inside ``<script type="application/ld+json">``.
"""

from __future__ import annotations

import html as _html
import re
from typing import List, Optional

_LDJSON_RE = re.compile(
    rb'<script\s+type\s*=\s*["\']application/ld\+json["\']\s*>(.*?)</script>',
    re.IGNORECASE | re.DOTALL,
)
_TEXT_RE = re.compile(rb'<div id="doc-text">(.*?)</div>', re.DOTALL)


def extract_jsonld_blocks(page: bytes) -> List[str]:
    """All embedded JSON-LD block bodies, decoded as UTF-8 (replacement on
    invalid bytes — real crawl data is dirty)."""
    return [m.decode("utf-8", "replace").strip() for m in _LDJSON_RE.findall(page)]


def extract_text(page: bytes) -> Optional[str]:
    """The page's main text; byte-identical to the text the page was
    authored with (HTML-unescape of the doc-text div). None when absent."""
    m = _TEXT_RE.search(page)
    if m is None:
        return None
    return _html.unescape(m.group(1).decode("utf-8", "replace"))
