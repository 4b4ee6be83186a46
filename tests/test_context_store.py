"""Offline context store: chain resolution, recursion guard, depth cap —
semantics of the reference's remote-context handling (creation.rs:484-513)
against the broadcastable store."""

import pytest

from jsonld_rs_spark.jsonldpy import expand
from jsonld_rs_spark.jsonldpy import errors as E
from jsonld_rs_spark.jsonldpy.context import Context
from jsonld_rs_spark.pipeline.context_store import BUILTIN_CONTEXTS, make_loader

LOADER = make_loader(BUILTIN_CONTEXTS)


def test_chained_context_resolves():
    ctx = Context()
    ctx.process_context("https://ctx.example/chained", {}, LOADER)
    assert ctx.terms["extra"].iri_mapping == "http://ex.example/extra"
    assert ctx.vocabulary_mapping == "http://schema.org/"


def test_cyclic_contexts_error():
    ctx = Context()
    with pytest.raises(E.ContextError) as exc:
        ctx.process_context("https://ctx.example/cycle-a", {}, LOADER)
    assert exc.value.code == E.RECURSIVE_CONTEXT_INCLUSION


def test_deep_chain_hits_context_cap():
    ctx = Context()
    with pytest.raises(E.ContextError) as exc:
        ctx.process_context("https://ctx.example/deep-0", {}, LOADER)
    assert exc.value.code == E.TOO_MANY_CONTEXTS


def test_missing_remote_context_is_remote_error():
    ctx = Context()
    with pytest.raises(E.ContextError) as exc:
        ctx.process_context("https://nowhere.example/ctx", {}, LOADER)
    assert exc.value.code == E.REMOTE_CONTEXT_ERROR


def test_document_with_bad_context_skipped_not_crashed():
    doc = {"@context": "https://ctx.example/cycle-a", "http://e/p": "v"}
    with pytest.raises(E.JsonLdError):
        expand(doc, base="https://x.example/", loader=LOADER)


def test_non_object_remote_context_classified():
    """A remote document that dereferences to a non-object (e.g. an array)
    must raise the dedicated code, not a bare crash."""
    from jsonld_rs_spark.jsonldpy.context import Context

    def loader(url):
        return ["not", "an", "object"]

    ctx = Context()
    with pytest.raises(E.ContextError) as exc:
        ctx.process_context("https://ctx.example/array-doc", {}, loader)
    assert exc.value.code == E.REMOTE_CONTEXT_NO_OBJECT
