"""Error taxonomy for the jsonldpy core.

Mirrors the ~30 structural error variants of the reference
(/root/reference/src/expand.rs:15-63, creation.rs:25-68, nodemap.rs:13-34,
compact.rs:15-40) as Python exceptions with a stable ``code`` string so the
Spark pipeline can count them per-partition in the metrics table.
"""

from __future__ import annotations


class JsonLdError(Exception):
    """Base class; ``code`` is a stable machine-readable error name."""

    def __init__(self, code: str, detail: str = "") -> None:
        self.code = code
        self.detail = detail
        super().__init__(f"{code}{': ' + detail if detail else ''}")


class TermCreationError(JsonLdError):
    """Term definition failures (reference creation.rs:25-35)."""


class ContextError(JsonLdError):
    """Context processing failures (reference creation.rs:56-68)."""


class ExpansionError(JsonLdError):
    """Expansion failures (reference expand.rs:15-63)."""


class NodeMapError(JsonLdError):
    """Node-map generation failures (reference nodemap.rs:13-34)."""


class CompactionError(JsonLdError):
    """Compaction failures (reference compact.rs:15-40)."""


class CanonicalizationError(JsonLdError):
    """URDNA2015 resource-limit breach (poison document guard)."""


# Stable code constants (subset actually raised; kept exhaustive for parity).
CYCLIC_IRI_MAPPING = "cyclic_iri_mapping"
KEYWORD_REDEFINITION = "keyword_redefinition"
INVALID_TYPE_MAPPING = "invalid_type_mapping"
INVALID_REVERSE_PROPERTY = "invalid_reverse_property"
INVALID_IRI_MAPPING = "invalid_iri_mapping"
INVALID_KEYWORD_ALIAS = "invalid_keyword_alias"
INVALID_CONTAINER_MAPPING = "invalid_container_mapping"
INVALID_LANGUAGE_MAPPING = "invalid_language_mapping"
INVALID_TERM_DEFINITION = "invalid_term_definition"

TOO_MANY_CONTEXTS = "too_many_contexts"
RECURSIVE_CONTEXT_INCLUSION = "recursive_context_inclusion"
REMOTE_CONTEXT_ERROR = "remote_context_error"
REMOTE_CONTEXT_NO_OBJECT = "remote_context_no_object"
INVALID_BASE_IRI = "invalid_base_iri"
INVALID_VOCAB_MAPPING = "invalid_vocab_mapping"
INVALID_LOCAL_CONTEXT = "invalid_local_context"

LIST_OF_LISTS = "list_of_lists"
INVALID_REVERSE_PROPERTY_MAP = "invalid_reverse_property_map"
COLLIDING_KEYWORDS = "colliding_keywords"
INVALID_ID_VALUE = "invalid_id_value"
INVALID_TYPE_VALUE = "invalid_type_value"
INVALID_VALUE_OBJECT_VALUE = "invalid_value_object_value"
INVALID_LANGUAGE_TAGGED_STRING = "invalid_language_tagged_string"
INVALID_INDEX_VALUE = "invalid_index_value"
INVALID_REVERSE_VALUE = "invalid_reverse_value"
INVALID_REVERSE_PROPERTY_VALUE = "invalid_reverse_property_value"
INVALID_LANGUAGE_MAP_VALUE = "invalid_language_map_value"
INVALID_VALUE_OBJECT = "invalid_value_object"
INVALID_TYPED_VALUE = "invalid_typed_value"
INVALID_SET_OBJECT = "invalid_set_object"
INVALID_LIST_OBJECT = "invalid_list_object"

EXPECTED_STRING = "expected_string"
CONFLICTING_INDEX_VALUES = "conflicting_index_values"
INVALID_OBJECT = "invalid_object"

COMPACTION_TO_LIST_OF_LISTS = "compaction_to_list_of_lists"

CANON_TOO_COMPLEX = "canonicalization_too_complex"
JSON_PARSE_ERROR = "json_parse_error"
