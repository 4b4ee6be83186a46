"""JSON-LD flattening.

The reference leaves flattening as an unchecked TODO
(/root/reference/README.md:6) but contains its whole substance: the node
map (nodemap.rs:285-609) plus ``Entity/Pointer.into_json``
(nodemap.rs:67-94, 155-176). This module completes the public API by
serializing the node map per the JSON-LD 1.0 flattening algorithm:
default-graph nodes in sorted id order, named-graph contents under the
``@graph`` of their defining node, id-only nodes elided.
"""

from __future__ import annotations

from typing import Any, Dict, List

from .nodemap import BlankNodeGenerator, DefaultNodeGenerator, Entity, PId, PList, Pointer, PValue, generate_node_map


def pointer_to_json(p: Pointer) -> Any:
    """Pointer → expanded JSON value (reference nodemap.rs:67-94)."""
    if isinstance(p, PId):
        return {"@id": p.id}
    if isinstance(p, PValue):
        out: Dict[str, Any] = {"@value": p.value}
        if p.type_id is not None:
            out["@type"] = p.type_id
        if p.language is not None:
            out["@language"] = p.language
        return out
    if isinstance(p, PList):
        return {"@list": [pointer_to_json(i) for i in p.items]}
    raise ValueError("unreachable pointer kind")


def entity_to_json(e: Entity) -> Dict[str, Any]:
    """Entity → expanded node object (reference nodemap.rs:155-176)."""
    out: Dict[str, Any] = {"@id": e.id}
    if e.types:
        out["@type"] = list(e.types)
    if e.index is not None:
        out["@index"] = e.index
    for prop in sorted(e.data):
        out[prop] = [pointer_to_json(p) for p in e.data[prop]]
    return out


def flatten(expanded: Any, generator: BlankNodeGenerator = None) -> List[Any]:
    """Expanded JSON-LD → flattened array (JSON-LD 1.0 §8.1 semantics)."""
    gen = generator if generator is not None else DefaultNodeGenerator()
    node_map = generate_node_map(expanded, gen)

    default_graph = dict(node_map.get("@default", {}))
    # named graphs attach under the @graph of their defining node
    subgraphs: Dict[str, List[Any]] = {}
    for graph_name in sorted(node_map):
        if graph_name == "@default":
            continue
        if graph_name not in default_graph:
            default_graph[graph_name] = Entity(id=graph_name)
        graph_nodes = node_map[graph_name]
        subgraphs[graph_name] = [
            entity_to_json(graph_nodes[nid])
            for nid in sorted(graph_nodes)
            if len(graph_nodes[nid].data) > 0
            or graph_nodes[nid].types
            or graph_nodes[nid].index is not None
        ]

    result = []
    for nid in sorted(default_graph):
        json_node = entity_to_json(default_graph[nid])
        sub = subgraphs.get(nid)
        if sub is not None:
            json_node["@graph"] = sub
        if len(json_node) > 1:
            result.append(json_node)
    return result
