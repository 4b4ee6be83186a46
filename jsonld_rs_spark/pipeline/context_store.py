"""Offline broadcast context store.

Replaces the reference's async ``RemoteContextLoader``
(/root/reference/src/lib.rs:23-29): the driver resolves every context URL a
job may touch into a plain dict, broadcasts it once, and executors look
contexts up locally — no network I/O on the hot path, strictly better than
the reference's per-process fetch+memo cache (creation.rs:484-513), whose
recursion-guard and ≤5-remote-context semantics are preserved by
``Context.process_context``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from ..jsonldpy import errors as E

# A schema.org-flavored vocabulary context, plus fixture URLs exercising the
# recursion / chain-limit code paths (FIXTURES.md §2).
BUILTIN_CONTEXTS: Dict[str, Any] = {
    "https://ctx.example/v1": {
        "@context": {
            "@vocab": "http://schema.org/",
            "id": "@id",
            "type": "@type",
            "sameAs": {"@id": "http://schema.org/sameAs", "@type": "@id"},
            "author": {"@id": "http://schema.org/author"},
            "mentions": {"@id": "http://schema.org/mentions", "@type": "@id"},
            "steps": {"@id": "http://schema.org/step", "@container": "@list"},
            "label": {"@id": "http://schema.org/name", "@container": "@language"},
            "reviewedBy": {"@reverse": "http://schema.org/itemReviewed"},
        }
    },
    "https://ctx.example/chained": {"@context": ["https://ctx.example/v1", {"extra": "http://ex.example/extra"}]},
    # cyclic pair → RecursiveContextInclusion when referenced
    "https://ctx.example/cycle-a": {"@context": "https://ctx.example/cycle-b"},
    "https://ctx.example/cycle-b": {"@context": "https://ctx.example/cycle-a"},
    # >5-deep chain → TooManyContexts
    "https://ctx.example/deep-0": {"@context": "https://ctx.example/deep-1"},
    "https://ctx.example/deep-1": {"@context": "https://ctx.example/deep-2"},
    "https://ctx.example/deep-2": {"@context": "https://ctx.example/deep-3"},
    "https://ctx.example/deep-3": {"@context": "https://ctx.example/deep-4"},
    "https://ctx.example/deep-4": {"@context": "https://ctx.example/deep-5"},
    "https://ctx.example/deep-5": {"@context": {"p": "http://deep.example/p"}},
}


def make_loader(store: Dict[str, Any]) -> Callable[[str], Any]:
    def loader(url: str) -> Any:
        try:
            return store[url]
        except KeyError:
            raise E.ContextError(E.REMOTE_CONTEXT_ERROR, f"not in offline store: {url}")

    return loader
