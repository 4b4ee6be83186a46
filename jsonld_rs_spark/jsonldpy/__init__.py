"""jsonldpy — pure-Python JSON-LD 1.0 core (no Spark dependencies).

Re-derivation of the reference semantics (/root/reference, kroeg/jsonld-rs)
for use inside vectorized Spark UDFs; see SURVEY.md §2.1 for the full
function-level parity map.
"""

from . import api, errors
from .context import Context, Term
from .expand import expand, expand_core
from .nodemap import (
    BlankNodeGenerator,
    DefaultNodeGenerator,
    Entity,
    PId,
    PList,
    PValue,
    generate_node_map,
)
from .rdf import (
    Dataset,
    Quad,
    format_double,
    jsonld_to_rdf,
    literal_to_json,
    rdf_to_jsonld,
)
from .compact import compact_core, compact_document
from .flatten import flatten
from .nquads import NQuadsParseError, parse_nquads
from .urdna2015 import canonical_labels, canonical_nquads, canonicalize_dataset, nquad_line

__all__ = [
    "api",
    "errors",
    "Context",
    "Term",
    "expand",
    "expand_core",
    "BlankNodeGenerator",
    "DefaultNodeGenerator",
    "Entity",
    "PId",
    "PList",
    "PValue",
    "generate_node_map",
    "Dataset",
    "Quad",
    "format_double",
    "jsonld_to_rdf",
    "literal_to_json",
    "rdf_to_jsonld",
    "compact_core",
    "compact_document",
    "flatten",
    "canonical_labels",
    "canonical_nquads",
    "canonicalize_dataset",
    "nquad_line",
    "NQuadsParseError",
    "parse_nquads",
]
