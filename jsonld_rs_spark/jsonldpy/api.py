"""Public JSON-LD API surface mirroring the reference's api.rs.

``JsonLdOptions`` is the options record (reference api.rs:12-24; its
``processing_mode`` is accepted-but-unused there, same here). The functions
wire the option defaults exactly like the reference entries:

* ``expand``: base = options.base, else the document itself when it is a
  JSON string (api.rs:79-84 quirk);
* ``compact``: expands the input first (api.rs:61-63), unwraps the target
  context's ``@context`` member (api.rs:65-68), honors ``compact_arrays``;
* ``to_rdf`` / ``from_rdf``: the dataset translation pair (rdf.rs);
* ``flatten``: completes the reference's README TODO.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .compact import compact_core
from .context import ContextLoader, no_remote_contexts
from .expand import expand as _expand_entry
from .flatten import flatten as _flatten
from .nodemap import BlankNodeGenerator, DefaultNodeGenerator
from .rdf import Dataset, jsonld_to_rdf, rdf_to_jsonld


@dataclass
class JsonLdOptions:
    base: Optional[str] = None
    compact_arrays: bool = True
    expand_context: Any = None
    processing_mode: Optional[str] = None  # accepted, unused (api.rs:22-23)
    loader: ContextLoader = field(default=no_remote_contexts)


def expand(document: Any, options: Optional[JsonLdOptions] = None) -> List[Any]:
    options = options or JsonLdOptions()
    return _expand_entry(
        document,
        base=options.base,
        expand_context=options.expand_context,
        loader=options.loader,
    )


def compact(document: Any, context: Any, options: Optional[JsonLdOptions] = None) -> Any:
    options = options or JsonLdOptions()
    expanded = expand(document, options)
    ctx_value = (
        context.get("@context", context) if isinstance(context, dict) else context
    )
    return compact_core(ctx_value, expanded, options.compact_arrays, options.loader)


def flatten(document: Any, options: Optional[JsonLdOptions] = None) -> List[Any]:
    return _flatten(expand(document, options))


def to_rdf(
    document: Any,
    options: Optional[JsonLdOptions] = None,
    generator: Optional[BlankNodeGenerator] = None,
) -> Dataset:
    expanded = expand(document, options)
    return jsonld_to_rdf(expanded, generator or DefaultNodeGenerator())


def from_rdf(
    dataset: Dataset, use_native_types: bool = False, use_rdf_type: bool = False
) -> Dict[str, Any]:
    return rdf_to_jsonld(dataset, use_native_types, use_rdf_type)
