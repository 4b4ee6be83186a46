"""Node-map generation: expanded JSON-LD → graph of entities.

Fresh Python implementation matching the reference
(/root/reference/src/nodemap.rs:54-609) observable behavior:

* ``@value`` pointers are deduplicated per predicate, node references are
  deliberately **not** (nodemap.rs:384-387 vs 460 ``// XXX dedupe``);
* reverse edges and ``@type`` entries are deduplicated (nodemap.rs:481-512);
* blank ``@type``/``@id``/predicate labels are re-minted through the
  generator (same-input ⇒ same-output contract, nodemap.rs:206-210);
* object keys iterate in sorted order (serde_json BTreeMap), which fixes the
  sequential label assignment order.

The ``BlankNodeGenerator`` protocol is the designed extension point where the
pipeline plugs URDNA2015-canonical labels in place of ``_:bN``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from . import errors as E


class Pointer:
    """Tagged union: node reference | literal | ordered list."""

    __slots__ = ()


class PId(Pointer):
    __slots__ = ("id",)

    def __init__(self, id: str) -> None:
        self.id = id

    def __eq__(self, other: object) -> bool:
        return isinstance(other, PId) and other.id == self.id

    def __hash__(self) -> int:
        return hash(("PId", self.id))

    def __repr__(self) -> str:
        return f"PId({self.id!r})"


class PValue(Pointer):
    # `value` is a JSON scalar (str/bool/int/float); type_id and language are
    # mutually exclusive (reference nodemap.rs:99-113).
    __slots__ = ("value", "type_id", "language")

    def __init__(self, value: Any, type_id: Optional[str] = None, language: Optional[str] = None) -> None:
        self.value = value
        self.type_id = type_id
        self.language = language

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, PValue):
            return NotImplemented
        # JSON equality: 1 != 1.0 in serde_json Value (int vs float), and
        # True != 1. Compare type identity of scalars first.
        return (
            type(self.value) is type(other.value)
            and self.value == other.value
            and self.type_id == other.type_id
            and self.language == other.language
        )

    def __hash__(self) -> int:
        return hash((type(self.value).__name__, self.value, self.type_id, self.language))

    def __repr__(self) -> str:
        return f"PValue({self.value!r}, {self.type_id!r}, {self.language!r})"


@dataclass
class PList(Pointer):
    items: List[Pointer] = field(default_factory=list)


@dataclass
class Entity:
    id: str
    index: Optional[str] = None
    types: List[str] = field(default_factory=list)
    data: Dict[str, List[Pointer]] = field(default_factory=dict)


# {graph_name: {node_id: Entity}}
NodeMap = Dict[str, Dict[str, Entity]]


class BlankNodeGenerator:
    def generate_blank_node(self, id: Optional[str] = None) -> str:
        raise NotImplementedError


class DefaultNodeGenerator(BlankNodeGenerator):
    """Spec generator: fresh sequential ``_:bN``; memoized relabeling of
    input blank ids (reference nodemap.rs:213-243)."""

    def __init__(self) -> None:
        self.i = 0
        self.data: Dict[str, str] = {}

    def generate_blank_node(self, id: Optional[str] = None) -> str:
        if id is not None:
            if id not in self.data:
                self.data[id] = f"_:b{self.i}"
                self.i += 1
            return self.data[id]
        label = f"_:b{self.i}"
        self.i += 1
        return label


def _expect_string(val: Any) -> str:
    if not isinstance(val, str):
        raise E.NodeMapError(E.EXPECTED_STRING, repr(val))
    return val


def _make_reference(element: Dict[str, Any], typeval: Any) -> PValue:
    value = element["@value"]
    language = element.get("@language")
    return PValue(
        value=value,
        type_id=_expect_string(typeval) if typeval is not None else None,
        language=_expect_string(language) if language is not None else None,
    )


# active_subject encodings
_NONE: Tuple = ("none",)


def generate_node_map(element: Any, generator: BlankNodeGenerator) -> NodeMap:
    node_map: NodeMap = {}
    _generate_node_map(element, node_map, "@default", _NONE, None, generator)
    return node_map


def _relabel_if_blank(item: str, generator: BlankNodeGenerator) -> str:
    return generator.generate_blank_node(item) if item.startswith("_:") else item


def _generate_node_map(
    element: Any,
    node_map: NodeMap,
    active_graph: str,
    active_subject: Tuple,
    list_acc: Optional[List[Pointer]],
    generator: BlankNodeGenerator,
) -> None:
    if isinstance(element, list):
        for item in element:
            _generate_node_map(item, node_map, active_graph, active_subject, list_acc, generator)
        return

    if not isinstance(element, dict):
        raise E.NodeMapError(E.INVALID_OBJECT, repr(element)[:80])

    # Relabel blank @type ids; validate @type shape.
    type_data: Any = None
    if "@type" in element:
        raw = element["@type"]
        if isinstance(raw, list):
            relabeled = []
            for item in raw:
                if not isinstance(item, str):
                    raise E.NodeMapError(E.INVALID_TYPE_VALUE)
                relabeled.append(_relabel_if_blank(item, generator))
            type_data = relabeled
        elif isinstance(raw, str):
            type_data = _relabel_if_blank(raw, generator)
        else:
            raise E.NodeMapError(E.INVALID_TYPE_VALUE)

    if "@value" in element:
        reference = _make_reference(element, type_data)
        if list_acc is not None:
            list_acc.append(reference)
        else:
            if active_subject[0] == "none":
                # unreachable from valid expanded input (the reference marks
                # it unreachable!), but flatten() is public API — classify
                raise E.NodeMapError(E.INVALID_OBJECT, "@value at document root")
            kind, subj, prop = active_subject
            node = node_map[active_graph][subj]
            existing = node.data.get(prop)
            if existing is not None:
                if reference not in existing:  # value dedup (nodemap.rs:384-387)
                    existing.append(reference)
            else:
                node.data[prop] = [reference]
        return

    if "@list" in element:
        result: List[Pointer] = []
        _generate_node_map(
            element["@list"], node_map, active_graph, active_subject, result, generator
        )
        if active_subject[0] == "none":
            raise E.NodeMapError(E.INVALID_OBJECT, "@list at document root")
        kind, subj, prop = active_subject
        node = node_map[active_graph][subj]
        node.data.setdefault(prop, []).append(PList(result))
        return

    # --- node object ---
    # the graph entry is only needed from here on; creating it above cost a
    # setdefault on every @value/@list call too (r6 profile: this walk is
    # the largest toRDF-stage cost)
    graph = node_map.setdefault(active_graph, {})

    if "@id" in element:
        raw_id = element["@id"]
        if not isinstance(raw_id, str):
            raise E.NodeMapError(E.INVALID_ID_VALUE)
        node_id = _relabel_if_blank(raw_id, generator)
    else:
        node_id = generator.generate_blank_node(None)

    if active_subject[0] == "normal":
        _, active_id, active_property = active_subject
        reference = PId(node_id)
        if list_acc is not None:
            list_acc.append(reference)
        else:
            node = node_map[active_graph][active_id]
            # node refs deliberately NOT deduped (nodemap.rs:460)
            node.data.setdefault(active_property, []).append(reference)

    node = graph.get(node_id)
    if node is None:
        node = Entity(id=node_id)
        graph[node_id] = node

    if active_subject[0] == "reverse":
        _, rev_id, rev_property = active_subject
        reference = PId(rev_id)
        existing = node.data.get(rev_property)
        if existing is not None:
            if reference not in existing:  # reverse edges deduped
                existing.append(reference)
        else:
            node.data[rev_property] = [reference]

    if "@type" in element:
        types = element["@type"]
        if not isinstance(types, list):
            raise E.NodeMapError(E.INVALID_TYPE_VALUE)
        for item in types:
            if not isinstance(item, str):
                raise E.NodeMapError(E.INVALID_TYPE_VALUE)
            item = _relabel_if_blank(item, generator)
            if item not in node.types:
                node.types.append(item)

    if "@index" in element:
        index = element["@index"]
        if not isinstance(index, str):
            raise E.NodeMapError(E.INVALID_INDEX_VALUE)
        if node.index is not None and node.index != index:
            raise E.NodeMapError(E.CONFLICTING_INDEX_VALUES, node_id)
        node.index = index

    if "@reverse" in element:
        reverse = element["@reverse"]
        if not isinstance(reverse, dict):
            raise E.NodeMapError(E.INVALID_REVERSE_VALUE)
        for prop in sorted(reverse):
            values = reverse[prop]
            if isinstance(values, list):
                refsubj = ("reverse", node_id, prop)
                for value in values:
                    _generate_node_map(value, node_map, active_graph, refsubj, None, generator)

    if "@graph" in element:
        _generate_node_map(element["@graph"], node_map, node_id, _NONE, None, generator)

    # `node` is stable across the loop: the entity object for (graph,
    # node_id) is created once above and only ever mutated in place — the
    # per-property re-lookup the reference does is a borrow-checker
    # necessity, not semantics
    node = graph[node_id]
    for prop in sorted(element):
        if prop[:1] == "@":
            continue
        value = element[prop]
        prop_label = _relabel_if_blank(prop, generator)
        if prop_label not in node.data:
            node.data[prop_label] = []
        _generate_node_map(
            value, node_map, active_graph, ("normal", node_id, prop_label), None, generator
        )
