"""JSON-LD 1.0 context processing (term creation, IRI expansion).

A fresh Python implementation of the context algorithms with the same
observable semantics as the reference implementation
(/root/reference/src/creation.rs:127-583, context.rs:5-19), including its
deliberate quirks:

* term defined as ``null`` / ``{"@id": null}`` maps the term to itself
  (creation.rs:249-280) instead of the spec's "decline to expand";
* a ``null`` entry in the context array resets the *entire* context,
  including the base IRI (creation.rs:478-481 — the ``base_iri``
  self-assignment there is a no-op after the reset);
* ``@vocab`` values are accepted verbatim with no IRI validation
  (creation.rs:545-555);
* object keys are processed in **sorted order** (serde_json's default map is
  a BTreeMap — context.rs:18), which we reproduce with ``sorted()``.

The reference's async ``RemoteContextLoader`` (lib.rs:23-29) is replaced by a
synchronous ``loader`` callable backed by an offline, broadcastable context
store: executors never perform network I/O.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

from . import errors as E
from . import iri

KEYWORDS = frozenset(
    {
        "@context",
        "@id",
        "@value",
        "@language",
        "@type",
        "@container",
        "@list",
        "@set",
        "@reverse",
        "@index",
        "@base",
        "@vocab",
        "@graph",
    }
)

# States for the `defined` bookkeeping map during term creation.
_DEFINING = "defining"
_DEFINED = "defined"
_INVALID = "invalid"

ContextLoader = Callable[[str], Any]


def no_remote_contexts(url: str) -> Any:
    raise E.ContextError(E.REMOTE_CONTEXT_ERROR, f"remote contexts disabled: {url}")


@dataclass
class Term:
    iri_mapping: str
    type_mapping: Optional[str] = None
    reverse: bool = False
    container_mapping: Optional[str] = None
    language_mapping: Optional[str] = None


@dataclass
class Context:
    base_iri: Optional[str] = None
    vocabulary_mapping: Optional[str] = None
    language: Optional[str] = None
    terms: Dict[str, Term] = field(default_factory=dict)
    # memo for vocab-mode, non-document-relative expand_iri: depends only on
    # terms + vocabulary_mapping. Shared across copies (base-independent);
    # REBOUND to a fresh dict on any mutation so sharers are unaffected.
    _vocab_memo: Dict[str, str] = field(
        default_factory=dict, repr=False, compare=False
    )

    def copy(self) -> "Context":
        return Context(
            base_iri=self.base_iri,
            vocabulary_mapping=self.vocabulary_mapping,
            language=self.language,
            terms=dict(self.terms),
            _vocab_memo=self._vocab_memo,
        )

    # ------------------------------------------------------------------ #
    # IRI expansion
    # ------------------------------------------------------------------ #

    def expand_iri(self, value: str, document_relative: bool, vocab: bool) -> str:
        """Expand ``value`` to an IRI under this context.

        Branch order mirrors the reference (creation.rs:189-216): keyword
        passthrough; vocab term lookup; prefix:suffix with blank-node and
        ``//`` guards; ``@vocab`` concatenation; base-IRI resolution.

        Memoization (r6): every vocab=True resolution that ends BEFORE the
        base-IRI step is base-independent — term lookups, compact IRIs,
        @vocab concatenation, verbatim colon'd values — so one shared memo
        serves both document_relative variants (@type values repeat across
        millions of documents). The base fall-through is never memoized; the
        memo dict is rebound (not cleared) whenever a term or @vocab changes,
        so copies sharing it can never see stale entries. A memoized hit for
        (vocab, docRel=False) is identical for (vocab, docRel=True) because
        the two only diverge at the unmemoized base step."""
        if vocab:
            hit = self._vocab_memo.get(value)
            if hit is not None:
                return hit
        if value.startswith("@"):
            return value
        if vocab and value in self.terms:
            result = self.terms[value].iri_mapping
            self._vocab_memo[value] = result
            return result
        loc = value.find(":")
        if loc != -1:
            prefix, suffix = value[:loc], value[loc + 1 :]
            if prefix == "_" or suffix.startswith("//"):
                result = value
            else:
                term = self.terms.get(prefix)
                result = term.iri_mapping + suffix if term is not None else value
            if vocab:
                self._vocab_memo[value] = result
            return result
        if vocab and self.vocabulary_mapping is not None:
            result = self.vocabulary_mapping + value
            self._vocab_memo[value] = result
            return result
        if document_relative and self.base_iri is not None:
            return iri.resolve(self.base_iri, value)
        return value

    # the readable single-pass twin of expand_iri's memoizing inline; its
    # only caller is tests/test_api.py::test_expand_iri_memo_parity, which
    # pins the two against each other across every branch × memo-state
    # combination so an edit to one copy cannot silently diverge
    def _expand_iri_uncached(
        self, value: str, document_relative: bool, vocab: bool
    ) -> str:
        if value.startswith("@"):
            return value
        if vocab and value in self.terms:
            return self.terms[value].iri_mapping
        loc = value.find(":")
        if loc != -1:
            prefix, suffix = value[:loc], value[loc + 1 :]
            if prefix == "_" or suffix.startswith("//"):
                return value
            term = self.terms.get(prefix)
            if term is not None:
                return term.iri_mapping + suffix
            return value
        if vocab and self.vocabulary_mapping is not None:
            return self.vocabulary_mapping + value
        if document_relative and self.base_iri is not None:
            return iri.resolve(self.base_iri, value)
        return value

    def _expand_iri_mut(
        self,
        value: str,
        document_relative: bool,
        vocab: bool,
        defined: Dict[str, str],
        local_context: Dict[str, Any],
    ) -> str:
        """``expand_iri`` during context processing: lazily defines terms that
        are referenced before their own definition (creation.rs:139-187)."""
        if value.startswith("@"):
            return value
        if value in local_context and value not in defined:
            self.create_term(local_context, value, local_context[value], defined)
        if vocab and value in self.terms:
            return self.terms[value].iri_mapping
        loc = value.find(":")
        if loc != -1:
            prefix, suffix = value[:loc], value[loc + 1 :]
            if prefix == "_" or suffix.startswith("//"):
                return value
            if prefix in local_context and prefix not in defined:
                self.create_term(local_context, prefix, local_context[prefix], defined)
            term = self.terms.get(prefix)
            if term is not None:
                return term.iri_mapping + suffix
            return value
        if vocab and self.vocabulary_mapping is not None:
            return self.vocabulary_mapping + value
        if document_relative and self.base_iri is not None:
            return iri.resolve(self.base_iri, value)
        return value

    # ------------------------------------------------------------------ #
    # Term creation
    # ------------------------------------------------------------------ #

    def create_term(
        self,
        local_context: Dict[str, Any],
        term: str,
        value: Any,
        defined: Dict[str, str],
    ) -> None:
        status = defined.get(term)
        if status == _DEFINING:
            raise E.TermCreationError(E.CYCLIC_IRI_MAPPING, term)
        if status in (_DEFINED, _INVALID):
            return

        defined[term] = _DEFINING
        if term in KEYWORDS:
            raise E.TermCreationError(E.KEYWORD_REDEFINITION, term)
        self.terms.pop(term, None)
        self._vocab_memo = {}  # rebind, not clear: copies may share the old one

        if isinstance(value, str):
            value = {"@id": value}

        if value is None or (
            isinstance(value, dict) and len(value) == 1 and value.get("@id", "") is None
        ):
            # Reference quirk: term maps to itself (creation.rs:249-280).
            self.terms[term] = Term(iri_mapping=term)
            defined[term] = _DEFINED
            return

        if not isinstance(value, dict):
            raise E.TermCreationError(E.INVALID_TERM_DEFINITION, term)

        type_mapping: Optional[str] = None
        if "@type" in value:
            at_type = value["@type"]
            if not isinstance(at_type, str):
                raise E.TermCreationError(E.INVALID_TYPE_MAPPING, term)
            expanded = self._expand_iri_mut(at_type, False, True, defined, local_context)
            if ":" not in expanded and expanded not in ("@id", "@vocab"):
                raise E.TermCreationError(E.INVALID_TYPE_MAPPING, term)
            type_mapping = expanded

        if "@reverse" in value:
            if "@id" in value:
                raise E.TermCreationError(E.INVALID_REVERSE_PROPERTY, term)
            at_reverse = value["@reverse"]
            if not isinstance(at_reverse, str):
                raise E.TermCreationError(E.INVALID_IRI_MAPPING, term)
            reverse_iri = self._expand_iri_mut(at_reverse, False, True, defined, local_context)
            if ":" not in reverse_iri:
                raise E.TermCreationError(E.INVALID_IRI_MAPPING, term)

            container_mapping: Optional[str] = None
            if "@container" in value:
                at_container = value["@container"]
                if isinstance(at_container, str):
                    if at_container in ("@set", "@index"):
                        container_mapping = at_container
                    else:
                        raise E.TermCreationError(E.INVALID_REVERSE_PROPERTY, term)
                elif at_container is None:
                    container_mapping = None
                else:
                    raise E.TermCreationError(E.INVALID_REVERSE_PROPERTY, term)

            defined[term] = _DEFINED
            self.terms[term] = Term(
                iri_mapping=reverse_iri,
                type_mapping=type_mapping,
                reverse=True,
                container_mapping=container_mapping,
            )
            return

        iri_mapping: Optional[str] = None
        if "@id" in value:
            at_id = value["@id"]
            if isinstance(at_id, str):
                if at_id != term:
                    expanded = self._expand_iri_mut(at_id, False, True, defined, local_context)
                    if expanded == "@context":
                        raise E.TermCreationError(E.INVALID_KEYWORD_ALIAS, term)
                    if (
                        not expanded.startswith("@")
                        and not expanded.startswith("_:")
                        and "://" not in expanded
                    ):
                        raise E.TermCreationError(E.INVALID_IRI_MAPPING, term)
                    iri_mapping = expanded
            elif at_id is None:
                iri_mapping = term
            else:
                raise E.TermCreationError(E.INVALID_IRI_MAPPING, term)

        if iri_mapping is None and ":" in term:
            loc = term.find(":")
            prefix, suffix = term[:loc], term[loc + 1 :]
            if prefix in local_context:
                self.create_term(local_context, prefix, local_context[prefix], defined)
            if prefix in self.terms:
                iri_mapping = self.terms[prefix].iri_mapping + suffix
            else:
                iri_mapping = term

        if iri_mapping is None:
            if self.vocabulary_mapping is not None:
                iri_mapping = self.vocabulary_mapping + term
            else:
                raise E.TermCreationError(E.INVALID_IRI_MAPPING, term)

        container_mapping = None
        if "@container" in value:
            at_container = value["@container"]
            if isinstance(at_container, str) and at_container in (
                "@list",
                "@set",
                "@index",
                "@language",
            ):
                container_mapping = at_container
            else:
                raise E.TermCreationError(E.INVALID_CONTAINER_MAPPING, term)

        language_mapping: Optional[str] = None
        if type_mapping is None and "@language" in value:
            language = value["@language"]
            if isinstance(language, str):
                language_mapping = language.lower()
            elif language is None:
                language_mapping = "@null"
            else:
                raise E.TermCreationError(E.INVALID_LANGUAGE_MAPPING, term)

        defined[term] = _DEFINED
        self.terms[term] = Term(
            iri_mapping=iri_mapping,
            type_mapping=type_mapping,
            reverse=False,
            container_mapping=container_mapping,
            language_mapping=language_mapping,
        )

    # ------------------------------------------------------------------ #
    # Context processing
    # ------------------------------------------------------------------ #

    def process_context(
        self,
        local_context: Any,
        remote_contexts: Optional[Dict[str, Optional[Any]]] = None,
        loader: ContextLoader = no_remote_contexts,
    ) -> None:
        """Process ``local_context`` into this context (creation.rs:457-583).

        ``remote_contexts`` doubles as the in-progress marker map (url → None
        while loading) and memo cache (url → context JSON once loaded); at
        most 5 remote contexts may participate (TooManyContexts).
        """
        if remote_contexts is None:
            remote_contexts = {}

        contexts = local_context if isinstance(local_context, list) else [local_context]
        for context in contexts:
            if context is None:
                # Full reset, base IRI included (reference quirk).
                self.base_iri = None
                self.vocabulary_mapping = None
                self.language = None
                self.terms = {}
                self._vocab_memo = {}
            elif isinstance(context, str):
                if len(remote_contexts) > 4:
                    raise E.ContextError(E.TOO_MANY_CONTEXTS, context)
                if context in remote_contexts:
                    cached = remote_contexts[context]
                    if cached is None:
                        raise E.ContextError(E.RECURSIVE_CONTEXT_INCLUSION, context)
                    self.process_context(cached, remote_contexts, loader)
                else:
                    try:
                        dereferenced = loader(context)
                    except E.JsonLdError:
                        raise
                    except Exception as exc:  # loader misses → remote error
                        raise E.ContextError(E.REMOTE_CONTEXT_ERROR, str(exc))
                    remote_contexts[context] = None
                    if isinstance(dereferenced, dict):
                        inner = dereferenced.get("@context", {})
                        self.process_context(inner, remote_contexts, loader)
                        remote_contexts[context] = inner
                    else:
                        raise E.ContextError(E.REMOTE_CONTEXT_NO_OBJECT, context)
            elif isinstance(context, dict):
                defined: Dict[str, str] = {}

                if "@base" in context:
                    # @base only applies in the top-level (non-remote) context
                    # (creation.rs:519-543).
                    if not remote_contexts:
                        base = context["@base"]
                        if base is None:
                            self.base_iri = None
                        elif isinstance(base, str):
                            try:
                                if self.base_iri is not None:
                                    self.base_iri = iri.resolve(self.base_iri, base)
                                else:
                                    self.base_iri = iri.parse_base(base)
                            except ValueError:
                                raise E.ContextError(E.INVALID_BASE_IRI, base)
                        else:
                            raise E.ContextError(E.INVALID_BASE_IRI, str(base))
                    defined["@base"] = _INVALID

                if "@vocab" in context:
                    vocab = context["@vocab"]
                    if vocab is None:
                        self.vocabulary_mapping = None
                    elif isinstance(vocab, str):
                        self.vocabulary_mapping = vocab
                    else:
                        raise E.ContextError(E.INVALID_VOCAB_MAPPING, str(vocab))
                    self._vocab_memo = {}
                    defined["@vocab"] = _INVALID

                if "@language" in context:
                    language = context["@language"]
                    if language is None:
                        self.language = None
                    elif isinstance(language, str):
                        self.language = language.lower()
                    else:
                        raise E.ContextError(E.INVALID_LANGUAGE_MAPPING, str(language))
                    defined["@language"] = _INVALID

                # Sorted iteration = serde_json BTreeMap order; create_term
                # may define dependencies ahead of the scan, hence the skip.
                for key in sorted(context):
                    if key not in defined:
                        self.create_term(context, key, context[key], defined)
            else:
                raise E.ContextError(E.INVALID_LOCAL_CONTEXT, str(type(context)))
