"""jsonld_rs_spark — PySpark-native knowledge-graph construction engine.

Layers:
* ``jsonldpy``  — pure-Python JSON-LD 1.0 core (reference-parity semantics).
* ``pipeline``  — Spark DataFrame stages: page synthesis, triple extraction,
  entity linking, connected-components canonicalization, materialization.
* ``ops``       — large-scale training-data operators (dedup, similarity,
  text analysis, multimodal plumbing) over the driver test tables.
"""

__version__ = "0.1.0"
