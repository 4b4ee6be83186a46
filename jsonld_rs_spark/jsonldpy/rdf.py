"""JSON-LD ⇄ RDF quads.

Fresh Python implementation matching the reference
(/root/reference/src/rdf.rs:15-515):

* literal typing: string→xsd:string, bool→xsd:boolean, int→xsd:integer,
  float→xsd:double (rdf.rs:44-73); language-tagged strings→rdf:langString;
* list serialization to rdf:first/rdf:rest cons chains; the reference emits
  the *compact string* ``"rdf:nil"`` for an empty list (rdf.rs:84) — we emit
  the full IRI by default and keep ``compat_empty_list_nil=True`` to
  reproduce the quirk byte-for-byte when comparing against the reference;
* fromRDF with native-type round-tripping and backwards list reconstruction.

Quad emission iterates graphs/nodes/predicates in **sorted order** so output
is deterministic (the reference iterates std HashMaps, which is not).
"""

from __future__ import annotations

import json
import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

from .nodemap import (
    BlankNodeGenerator,
    Entity,
    NodeMap,
    PId,
    PList,
    Pointer,
    PValue,
    generate_node_map,
)

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"
RDF_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
RDF_LIST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#List"


def format_double(value: float) -> str:
    """Shortest round-trip decimal for f64, normalized to the formatting of
    Rust's ryu (used by serde_json's Number::to_string, rdf.rs:68): Python's
    ``repr`` produces the same shortest digits; only the exponent spelling
    differs (``1e+100``/``1e-05`` vs ``1e100``/``1e-5``)."""
    if math.isnan(value) or math.isinf(value):
        # serde_json numbers cannot hold non-finite values; mirror JSON.
        raise ValueError("non-finite double")
    s = repr(value)
    if "e" in s:
        mantissa, exp = s.split("e")
        sign = "-" if exp.startswith("-") else ""
        digits = exp.lstrip("+-").lstrip("0") or "0"
        s = f"{mantissa}e{sign}{digits}"
    return s


class Quad(NamedTuple):
    """One RDF statement. ``obj_kind`` is 'id' for IRIs/blank nodes and
    'literal' otherwise (reference StringQuad/QuadContents, rdf.rs:15-30).
    NamedTuple, not dataclass: quads are constructed per emitted triple on
    the hot path, and frozen-dataclass __init__ costs ~6 object.__setattr__
    calls each."""

    subj: str
    pred: str
    obj_kind: str  # 'id' | 'literal'
    obj_value: str
    obj_datatype: Optional[str] = None  # None for obj_kind == 'id'
    obj_lang: Optional[str] = None


Dataset = Dict[str, List[Quad]]  # graph name ('@default' for default) → quads


def object_to_rdf(type_id: Optional[str], value: Any) -> Tuple[str, str, Optional[str]]:
    """Literal typing (rdf.rs:44-73) → (datatype, lexical, lang=None)."""
    if isinstance(value, str):
        return (type_id or XSD_STRING, value, None)
    if isinstance(value, bool):  # bool before int: bool subclasses int
        return (type_id or XSD_BOOLEAN, "true" if value else "false", None)
    if isinstance(value, float):
        return (XSD_DOUBLE, format_double(value), None)
    if isinstance(value, int):
        return (XSD_INTEGER, str(value), None)
    raise ValueError(f"unreachable literal value: {value!r}")


def serialize_list(
    items: List[Pointer],
    quads: List[Quad],
    generator: BlankNodeGenerator,
    compat_empty_list_nil: bool = False,
) -> Tuple[str, str]:
    """List → rdf:first/rest cons chain; returns (obj_kind, obj_value) of the
    list head. Reference quirk: empty list yields the literal string
    ``"rdf:nil"`` instead of the full IRI (rdf.rs:84)."""
    if not items:
        return ("id", "rdf:nil" if compat_empty_list_nil else RDF_NIL)
    labels = [generator.generate_blank_node(None) for _ in items]
    for i, (label, item) in enumerate(zip(labels, items)):
        kind, value, datatype, lang = translate_reference(
            item, quads, generator, compat_empty_list_nil
        )
        quads.append(Quad(label, RDF_FIRST, kind, value, datatype, lang))
        rest = labels[i + 1] if i + 1 < len(labels) else RDF_NIL
        quads.append(Quad(label, RDF_REST, "id", rest, None, None))
    return ("id", labels[0])


def translate_reference(
    pointer: Pointer,
    quads: List[Quad],
    generator: BlankNodeGenerator,
    compat_empty_list_nil: bool = False,
) -> Tuple[str, str, Optional[str], Optional[str]]:
    """Pointer → (obj_kind, obj_value, obj_datatype, obj_lang)."""
    if isinstance(pointer, PList):
        kind, value = serialize_list(pointer.items, quads, generator, compat_empty_list_nil)
        return (kind, value, None, None)
    if isinstance(pointer, PId):
        return ("id", pointer.id, None, None)
    if isinstance(pointer, PValue):
        if pointer.language is not None and isinstance(pointer.value, str):
            return ("literal", pointer.value, RDF_LANG_STRING, pointer.language)
        datatype, lexical, _ = object_to_rdf(pointer.type_id, pointer.value)
        return ("literal", lexical, datatype, None)
    raise ValueError("unreachable pointer kind")


def node_map_to_rdf(
    node_map: NodeMap,
    generator: BlankNodeGenerator,
    compat_empty_list_nil: bool = False,
) -> Dataset:
    """Node map → per-graph quads (rdf.rs:157-213), deterministic order."""
    dataset: Dataset = {}
    for graph_name in sorted(node_map):
        quads: List[Quad] = []
        graph = node_map[graph_name]
        for node_id in sorted(graph):
            node = graph[node_id]
            for typ in node.types:
                quads.append(Quad(node.id, RDF_TYPE, "id", typ, None, None))
            for prop in sorted(node.data):
                if prop == "@type":
                    for value in node.data[prop]:
                        assert isinstance(value, PId)
                        quads.append(Quad(node.id, RDF_TYPE, "id", value.id, None, None))
                elif prop.startswith("@"):
                    continue
                else:
                    for item in node.data[prop]:
                        kind, value, datatype, lang = translate_reference(
                            item, quads, generator, compat_empty_list_nil
                        )
                        quads.append(Quad(node.id, prop, kind, value, datatype, lang))
        dataset[graph_name] = quads
    return dataset


def jsonld_to_rdf(
    element: Any,
    generator: BlankNodeGenerator,
    compat_empty_list_nil: bool = False,
) -> Dataset:
    """toRDF: expanded JSON-LD → RDF dataset (rdf.rs:157-213)."""
    node_map = generate_node_map(element, generator)
    return node_map_to_rdf(node_map, generator, compat_empty_list_nil)


# --------------------------------------------------------------------- #
# fromRDF (rdf.rs:215-515) — conformance parity; per-document scale only.
# --------------------------------------------------------------------- #


def literal_to_json(quad: Quad, use_native_types: bool) -> Dict[str, Any]:
    if quad.obj_kind == "id":
        return {"@id": quad.obj_value}
    obj: Dict[str, Any] = {}
    typeval: Optional[str] = quad.obj_datatype
    value: Any = quad.obj_value
    if use_native_types and typeval == XSD_STRING:
        typeval = None
    elif use_native_types and typeval == XSD_BOOLEAN:
        if value == "true":
            typeval, value = None, True
        elif value == "false":
            typeval, value = None, False
    elif use_native_types and typeval in (XSD_INTEGER, XSD_DOUBLE):
        try:
            parsed = json.loads(value)
            # json.loads accepts NaN/Infinity, which are not representable
            # in JSON-LD values — keep those as typed strings
            if (
                isinstance(parsed, (int, float))
                and not isinstance(parsed, bool)
                and (isinstance(parsed, int) or math.isfinite(parsed))
            ):
                typeval, value = None, parsed
        except ValueError:
            pass
    elif typeval == RDF_LANG_STRING:
        if quad.obj_lang is not None:
            obj["@language"] = quad.obj_lang
        typeval = None
    elif typeval == XSD_STRING:
        typeval = None
    obj["@value"] = value
    if typeval is not None:
        obj["@type"] = typeval
    return obj


def _json_eq_types(a: Any, b: Any) -> bool:
    """True when two ==-equal JSON values also agree on scalar TYPES at
    every position (serde_json semantics: Number(1) ≠ Number(1.0) ≠
    Bool(true); Python's == says they're equal). Called only on values
    that already compare ==, so structures are parallel."""
    if isinstance(a, dict) and isinstance(b, dict):
        return all(_json_eq_types(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return all(_json_eq_types(x, y) for x, y in zip(a, b))
    return type(a) is type(b)


def rdf_to_jsonld(
    graphs: Dataset, use_native_types: bool = False, use_rdf_type: bool = False
) -> Dict[str, Any]:
    """fromRDF: RDF dataset → JSON-LD node objects (rdf.rs:277-515).

    Deliberate deviation: the reference's list-reconstruction node-size
    checks (rdf.rs:389-404) don't account for the ``@id`` member its own
    node map inserts, so list chains never reconstruct there (rdf.rs is
    untested in-repo, SURVEY.md §5). This implementation follows the
    JSON-LD 1.0 fromRDF algorithm: a list node is {@id, rdf:first,
    rdf:rest} (len 3) or the same plus @type=[rdf:List] (len 4).

    Reference quirk preserved (rdf.rs:486-509): a named graph is attached
    only when its name appears as a default-graph subject; a graph whose
    name never occurs in the default graph is DROPPED from the output
    (the spec would hoist an {@id: name} entry into the default graph).
    Per-document toRDF output always names graphs from a containing node,
    so the pipeline never hits this; callers feeding arbitrary datasets
    should add the {@id} stub themselves if they need those graphs.
    """
    graph_map: Dict[str, Dict[str, Any]] = {}
    usages: Dict[str, Dict[str, List[Tuple[str, str, str]]]] = {}

    for graph_name in sorted(graphs):
        node_map: Dict[str, Any] = {}
        for quad in graphs[graph_name]:
            node_map.setdefault(quad.subj, {"@id": quad.subj})
            if quad.obj_kind == "id":
                node_map.setdefault(quad.obj_value, {"@id": quad.obj_value})
                if quad.pred == RDF_TYPE and not use_rdf_type:
                    types = node_map[quad.subj].setdefault("@type", [])
                    if quad.obj_value not in types:
                        types.append(quad.obj_value)
                    continue
            node = node_map[quad.subj]
            value = literal_to_json(quad, use_native_types)
            arr = node.setdefault(quad.pred, [])
            # type-sensitive equality: Python's 1 == 1.0 == True would
            # collapse distinct literals ("1"^^xsd:integer, "1.0"^^xsd:double,
            # "true"^^xsd:boolean all reach here as native values); the
            # reference's serde_json keeps i64/f64/bool values distinct, so
            # the dedup must too (found by the round-4 manifest roundtrip)
            existing = next(
                (v for v in arr if v == value and _json_eq_types(v, value)), None
            )
            if existing is None:
                arr.append(value)
                existing = value
            if quad.obj_kind == "id":
                # usages reference the SHARED value dict (spec §10.5): list
                # reconstruction mutates it in place, which keeps nested
                # lists correct regardless of processing order.
                usages.setdefault(graph_name, {}).setdefault(quad.obj_value, []).append(
                    (quad.subj, quad.pred, existing)
                )
        graph_map[graph_name] = node_map

    for name in sorted(usages):
        graph_object = usages[name]
        if RDF_NIL not in graph_object:
            continue
        node_map = graph_map[name]
        nil_usages = graph_object.pop(RDF_NIL)
        for node_id, prop, head in nil_usages:
            if prop == RDF_FIRST:
                # empty list nested in another list: rdf:nil cannot convert
                # (its usage is not unique) — JSON-LD 1.0 §10.5 4.3.3.1
                continue
            chain: List[Any] = []
            list_nodes: List[str] = []
            while (
                prop == RDF_REST
                and node_id.startswith("_:")
                and len(graph_object.get(node_id, ())) == 1
            ):
                node = node_map.get(node_id)
                if node is None or RDF_REST not in node or RDF_FIRST not in node:
                    break
                # well-formed list node: {@id, rdf:first, rdf:rest} or the
                # same plus @type == [rdf:List]
                type_arr = node.get("@type")
                if type_arr is not None:
                    if len(node) != 4 or type_arr != [RDF_LIST]:
                        break
                elif len(node) > 3:
                    break
                first_values = node[RDF_FIRST]
                # §10.5: a well-formed list node has exactly ONE value for
                # BOTH rdf:first and rdf:rest. The rest-arity check is
                # load-bearing: without it a node carrying two rdf:rest
                # arcs (malformed crawl RDF) reconstructed as a list and
                # the non-walked branch's members vanished from the output
                # entirely (found by the r7 fromRDF fixture authoring).
                if len(first_values) != 1 or len(node[RDF_REST]) != 1:
                    break
                chain.append(first_values[0])
                list_nodes.append(node_id)
                node_id, prop, head = graph_object[node_id][0]
            # attach the list at the final reference by mutating the shared
            # value dict; works for ordinary properties AND rdf:first of a
            # parent list node (nested lists)
            if isinstance(head, dict):
                head.pop("@id", None)
                chain.reverse()
                head["@list"] = chain
            for ln in list_nodes:
                node_map.pop(ln, None)

    result: Dict[str, Any] = {}
    default_graph = graph_map.pop("@default", {})
    for subject in sorted(default_graph):
        node = default_graph[subject]
        if subject in graph_map:
            named = graph_map.pop(subject)
            arr = [
                n
                for _, n in sorted(named.items())
                if len(n) > 1 or "@id" not in n
            ]
            node["@graph"] = arr
        if len(node) > 1 or "@id" not in node:
            result[subject] = node
    return result
