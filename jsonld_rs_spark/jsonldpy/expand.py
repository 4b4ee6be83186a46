"""JSON-LD 1.0 expansion.

Fresh Python implementation with the same observable semantics as the
reference (/root/reference/src/expand.rs:106-675), including:

* object keys processed in sorted order (serde_json BTreeMap);
* the root-level ``@list`` member is silently dropped (expand.rs:300-302);
* ``{"@language": ...}``-only results expand to null (expand.rs:627-628);
* ``@set`` objects may carry only ``@index`` besides ``@set``
  (expand.rs:614-620);
* free-floating scalars and lone-``@id`` objects drop at the root
  (expand.rs:629-647).

Recursion is bounded by ``MAX_DEPTH`` (the reference heap-boxes unbounded
recursion; real web JSON-LD is shallow, and a depth cap turns adversarial
documents into per-document errors instead of worker crashes).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

from . import errors as E
from .context import Context, ContextLoader, no_remote_contexts

MAX_DEPTH = 200

_CACHE_PROBE_BASE = "urn:jsonldpy:cache-probe:"


def _safe_ctx(v: Any) -> bool:
    """Cacheable @context shape: no null reset, no inline @base (either
    would make the processed template depend on the pre-existing base)."""
    if v is None:
        return False
    if isinstance(v, str):
        return True
    if isinstance(v, list):
        return all(_safe_ctx(x) for x in v)
    if isinstance(v, dict):
        return "@base" not in v
    return False


def _cache_key(ctxval: Any) -> Optional[str]:
    """Serialized cache key for a document-level @context value, or None if
    the value shape cannot be cached (see _safe_ctx).

    Fast path (r6 profile: _cache_key was ~19% of the expand stage): the
    overwhelmingly common shape is a plain remote-context URL string — keyed
    directly (tagged so a string can never collide with a JSON-serialized
    composite, whose serialization always starts with a quote/brace/bracket,
    never ``s:``)."""
    if isinstance(ctxval, str):
        return "s:" + ctxval
    if not _safe_ctx(ctxval):
        return None
    try:
        return json.dumps(ctxval, sort_keys=True)
    except (TypeError, ValueError):
        return None


def _context_via_cache(
    active_context: Context, ctxval: Any, loader: ContextLoader, cache: dict
) -> Optional[Context]:
    """Resolve a document-level @context through the per-worker cache.

    Valid only when the active context is 'fresh' (base IRI only): the
    processed template is then independent of the document, except for a
    possible null-reset hidden inside a remote context — detected with a
    probe base and marked uncacheable. Saves re-running create_term for the
    handful of contexts shared by millions of pages.
    """
    if (
        active_context.terms
        or active_context.vocabulary_mapping is not None
        or active_context.language is not None
    ):
        return None
    key = _cache_key(ctxval)
    if key is None:
        return None
    template = cache.get(key)
    if template is None:
        template = Context(base_iri=_CACHE_PROBE_BASE)
        template.process_context(ctxval, {}, loader)
        if template.base_iri != _CACHE_PROBE_BASE:
            cache[key] = False  # hidden reset → never cache this value
            return None
        cache[key] = template
    elif template is False:
        return None
    ctx = template.copy()
    ctx.base_iri = active_context.base_iri
    return ctx


def _expand_value(ctx: Context, active_property: str, elem: Any) -> Any:
    """Scalar expansion under a term (expand.rs:106-146)."""
    result: Dict[str, Any] = {}
    set_language = False

    term = ctx.terms.get(active_property)
    if term is not None:
        if term.type_mapping is not None:
            if term.type_mapping in ("@id", "@vocab"):
                if isinstance(elem, str):
                    return {
                        "@id": ctx.expand_iri(elem, True, term.type_mapping == "@vocab")
                    }
                # Non-string under @id/@vocab coercion: falls through with no
                # @type, matching the reference's untyped wrap.
            else:
                result["@type"] = term.type_mapping
        elif isinstance(elem, str):
            if term.language_mapping is not None:
                if term.language_mapping != "@null":
                    result["@language"] = term.language_mapping
            else:
                set_language = True
    elif isinstance(elem, str):
        set_language = True

    if set_language and ctx.language is not None:
        result["@language"] = ctx.language

    result["@value"] = elem
    return result


def _is_list_object(value: Any) -> bool:
    return isinstance(value, dict) and "@list" in value


def _expand(
    active_context: Context,
    active_property: Optional[str],
    elem: Any,
    loader: ContextLoader,
    depth: int = 0,
    context_cache: Optional[dict] = None,
) -> Any:
    if depth > MAX_DEPTH:
        raise E.ExpansionError("max_depth_exceeded", f"depth>{MAX_DEPTH}")

    if elem is None:
        return None

    if isinstance(elem, list):
        res: List[Any] = []
        for item in elem:
            expanded_item = _expand(active_context, active_property, item, loader, depth + 1, context_cache)
            if isinstance(expanded_item, list) or _is_list_object(expanded_item):
                if active_property is not None:
                    if active_property == "@list":
                        raise E.ExpansionError(E.LIST_OF_LISTS)
                    term = active_context.terms.get(active_property)
                    if term is not None and term.container_mapping == "@list":
                        raise E.ExpansionError(E.LIST_OF_LISTS)
            if isinstance(expanded_item, list):
                res.extend(expanded_item)
            elif expanded_item is not None:
                res.append(expanded_item)
        return res

    if isinstance(elem, dict):
        if "@context" in elem:
            cached = (
                _context_via_cache(active_context, elem["@context"], loader, context_cache)
                if context_cache is not None
                else None
            )
            if cached is not None:
                active_context = cached
            else:
                ctx = active_context.copy()
                ctx.process_context(elem["@context"], {}, loader)
                active_context = ctx

        result: Dict[str, Any] = {}

        # bound-method/dict hoists: this loop body runs once per key of every
        # object in the corpus — the attribute chases were measurable (r6
        # profile: _expand tottime is the largest single expand-stage cost)
        expand_iri = active_context.expand_iri
        terms = active_context.terms
        vocab_memo = active_context._vocab_memo

        for key in sorted(elem):
            if key == "@context":
                continue
            value = elem[key]
            # inline memo probe: property keys are the hottest expand_iri
            # call shape and nearly always repeat (memo misses fall through
            # to the full branch walk, which also populates the memo)
            prop = vocab_memo.get(key)
            if prop is None:
                prop = expand_iri(key, False, True)

            if ":" not in prop and prop[:1] != "@":
                continue  # no IRI mapping, not a keyword → drop

            if prop[:1] == "@":
                if active_property == "@reverse":
                    raise E.ExpansionError(E.INVALID_REVERSE_PROPERTY_MAP, key)
                if prop in result:
                    raise E.ExpansionError(E.COLLIDING_KEYWORDS, prop)

                if prop == "@id":
                    if not isinstance(value, str):
                        raise E.ExpansionError(E.INVALID_ID_VALUE, key)
                    expanded_value: Any = expand_iri(value, True, False)
                elif prop == "@type":
                    if isinstance(value, str):
                        expanded_value = expand_iri(value, True, True)
                    elif isinstance(value, list):
                        typed = []
                        for item in value:
                            if not isinstance(item, str):
                                raise E.ExpansionError(E.INVALID_TYPE_VALUE, key)
                            typed.append(expand_iri(item, True, True))
                        expanded_value = typed
                    else:
                        raise E.ExpansionError(E.INVALID_TYPE_VALUE, key)
                elif prop == "@graph":
                    expanded_value = _expand(active_context, "@graph", value, loader, depth + 1, context_cache)
                elif prop == "@value":
                    if isinstance(value, (dict, list)):
                        raise E.ExpansionError(E.INVALID_VALUE_OBJECT_VALUE, key)
                    expanded_value = value
                elif prop == "@language":
                    if not isinstance(value, str):
                        raise E.ExpansionError(E.INVALID_LANGUAGE_TAGGED_STRING, key)
                    expanded_value = value.lower()
                elif prop == "@index":
                    if not isinstance(value, str):
                        raise E.ExpansionError(E.INVALID_INDEX_VALUE, key)
                    expanded_value = value
                elif prop == "@list":
                    if active_property is None or active_property == "@graph":
                        continue  # dropped at root (expand.rs:300-302)
                    tex = _expand(active_context, active_property, value, loader, depth + 1, context_cache)
                    if _is_list_object(tex):
                        raise E.ExpansionError(E.LIST_OF_LISTS)
                    expanded_value = tex if isinstance(tex, list) else [tex]
                elif prop == "@set":
                    expanded_value = _expand(
                        active_context, active_property, value, loader, depth + 1, context_cache
                    )
                elif prop == "@reverse":
                    if not isinstance(value, dict):
                        raise E.ExpansionError(E.INVALID_REVERSE_VALUE, key)
                    rev = _expand(active_context, "@reverse", value, loader, depth + 1, context_cache)
                    if not isinstance(rev, dict):
                        rev = {}
                    inner_reverse = rev.pop("@reverse", None)
                    if inner_reverse is not None:
                        # properties reversed twice are forward properties
                        for rprop, item in inner_reverse.items():
                            arr = result.setdefault(rprop, [])
                            if isinstance(item, list):
                                arr.extend(item)
                            else:
                                arr.append(item)
                    if rev:
                        reverse_map = result.setdefault("@reverse", {})
                        for rprop, items in rev.items():
                            for item in items:
                                if isinstance(item, dict) and (
                                    "@value" in item or "@list" in item
                                ):
                                    raise E.ExpansionError(
                                        E.INVALID_REVERSE_PROPERTY_VALUE, rprop
                                    )
                                reverse_map.setdefault(rprop, []).append(item)
                    continue
                else:
                    continue  # unhandled keyword (e.g. @base alias) → skip

                result[prop] = expanded_value
                continue

            # --- non-keyword property ---
            term = terms.get(key)
            container = term.container_mapping if term is not None else None

            if container == "@language" and isinstance(value, dict):
                lang_items: List[Any] = []
                for language in sorted(value):
                    language_value = value[language]
                    lang = language.lower()
                    if isinstance(language_value, str):
                        language_values = [language_value]
                    elif isinstance(language_value, list):
                        language_values = language_value
                    elif language_value is None:
                        continue
                    else:
                        raise E.ExpansionError(E.INVALID_LANGUAGE_MAP_VALUE, key)
                    for val in language_values:
                        if val is None:
                            continue
                        if not isinstance(val, str):
                            raise E.ExpansionError(E.INVALID_LANGUAGE_MAP_VALUE, key)
                        lang_items.append({"@value": val, "@language": lang})
                expanded_value = lang_items
            elif container == "@index" and isinstance(value, dict):
                idx_items: List[Any] = []
                for index in sorted(value):
                    index_value = value[index]
                    if not isinstance(index_value, list):
                        index_value = [index_value]
                    expanded_index = _expand(active_context, key, index_value, loader, depth + 1, context_cache)
                    for item in expanded_index:
                        if "@index" not in item:
                            item["@index"] = index
                        idx_items.append(item)
                expanded_value = idx_items
            else:
                expanded_value = _expand(active_context, key, value, loader, depth + 1, context_cache)

            if expanded_value is None:
                continue

            if term is not None:
                if term.container_mapping == "@list" and not _is_list_object(expanded_value):
                    if not isinstance(expanded_value, list):
                        expanded_value = [expanded_value]
                    expanded_value = {"@list": expanded_value}

                if term.reverse:
                    reverse_map = result.setdefault("@reverse", {})
                    items = (
                        expanded_value
                        if isinstance(expanded_value, list)
                        else [expanded_value]
                    )
                    for item in items:
                        if isinstance(item, dict) and ("@value" in item or "@list" in item):
                            raise E.ExpansionError(E.INVALID_REVERSE_PROPERTY_VALUE, key)
                    reverse_map.setdefault(prop, []).extend(items)
                    continue

            if not isinstance(expanded_value, list):
                expanded_value = [expanded_value]
            result.setdefault(prop, []).extend(expanded_value)

        # --- post-loop validation (expand.rs:577-647) ---
        if "@value" in result:
            for rkey in result:
                if rkey not in ("@value", "@language", "@type", "@index"):
                    raise E.ExpansionError(E.INVALID_VALUE_OBJECT)
            if "@type" in result and "@language" in result:
                raise E.ExpansionError(E.INVALID_VALUE_OBJECT)
            val = result["@value"]
            if val is None:
                return None
            if not isinstance(val, str) and "@language" in result:
                raise E.ExpansionError(E.INVALID_TYPED_VALUE)
            if "@type" in result and not isinstance(result["@type"], str):
                raise E.ExpansionError(E.INVALID_TYPED_VALUE)
        elif "@type" in result:
            if isinstance(result["@type"], str):
                result["@type"] = [result["@type"]]
        elif "@set" in result:
            sset = result.pop("@set")
            if len(result) > 1 or (len(result) == 1 and "@index" not in result):
                raise E.ExpansionError(E.INVALID_SET_OBJECT)
            return sset
        elif "@list" in result and (
            len(result) > 2 or (len(result) == 2 and "@index" not in result)
        ):
            raise E.ExpansionError(E.INVALID_LIST_OBJECT)

        if len(result) == 1 and "@language" in result:
            return None
        if active_property is None or active_property == "@graph":
            if (
                not result
                or "@value" in result
                or "@list" in result
                or (len(result) == 1 and "@id" in result)
            ):
                return None
            return result
        return result

    # scalar
    if active_property is None or active_property == "@graph":
        return None
    return _expand_value(active_context, active_property, elem)


def expand_core(
    ctx: Context,
    elem: Any,
    loader: ContextLoader = no_remote_contexts,
    context_cache: Optional[dict] = None,
) -> List[Any]:
    """Core expand + post-processing (expand.rs:652-675).

    ``context_cache`` (optional, per-worker dict) memoizes processing of
    document-level ``@context`` values shared across documents.
    """
    val = _expand(ctx, None, elem, loader, 0, context_cache)
    if isinstance(val, dict) and len(val) == 1 and "@graph" in val:
        val = val["@graph"]
    if val is None:
        return []
    if not isinstance(val, list):
        return [val]
    return val


def expand(
    document: Any,
    base: Optional[str] = None,
    expand_context: Any = None,
    loader: ContextLoader = no_remote_contexts,
) -> List[Any]:
    """Public expand entry (reference api.rs:74-93).

    Reference quirk preserved: when ``base`` is unset and the *document*
    itself is a JSON string, it is used as the base IRI (api.rs:79-84).
    """
    from . import iri

    ctx = Context()
    base_candidate = base if base is not None else (
        document if isinstance(document, str) else None
    )
    if base_candidate is not None:
        try:
            ctx.base_iri = iri.parse_base(base_candidate)
        except ValueError:
            ctx.base_iri = None
    if expand_context is not None:
        inner = (
            expand_context.get("@context", expand_context)
            if isinstance(expand_context, dict)
            else expand_context
        )
        ctx.process_context(inner, {}, loader)
    return expand_core(ctx, document, loader)
