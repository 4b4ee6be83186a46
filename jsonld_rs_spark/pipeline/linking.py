"""Entity mention detection + link scoring (SURVEY.md §2.2 'Hash join').

Mentions are detected in page text with vectorized pandas string ops (the
dictionary is small and ships inside the broadcast join anyway — at real
scale the surface-form set is a broadcast trie; here regex word-boundary
counts per form are exact and fully vectorized, no per-row Python).

Link scoring is a **broadcast hash join**: mentions ⨝ broadcast(dictionary)
on surface_form — no shuffle of the big side. "data" is the deliberate
hub key (~30% of documents) so the skew path is actually exercised.
"""

from __future__ import annotations

import re
from typing import Dict, Iterator, List, Tuple

from .synth import ENTITY_WORDS, _entity_iri

MENTIONS_SCHEMA = "url string, surface_form string, tf int"


def default_dictionary() -> List[Tuple[str, str, float]]:
    """(surface_form, entity_id, prior) rows — FIXTURES.md §5."""
    rows = []
    for i, word in enumerate(ENTITY_WORDS):
        rows.append((word, _entity_iri(word), round(0.95 - 0.04 * i, 4)))
    # second-sense candidates to make scoring non-trivial
    rows.append(("data", "http://kg.example/e/data-plural", 0.05))
    rows.append(("table", "http://kg.example/e/furniture-table", 0.10))
    return rows


def dictionary_df(spark):
    return spark.createDataFrame(
        default_dictionary(), "surface_form string, entity_id string, prior double"
    )


def detect_mentions(pages_df, surface_forms: List[str] = None):
    """pages(url, text) → (url, surface_form, tf). Narrow stage, no shuffle.

    Pass a PERSISTED (or scan-rooted) pages_df: ``spread`` probes partition
    counts, which on an unpersisted post-shuffle plan makes AQE execute the
    upstream once before the real job (see util.spread / CLAUDE.md)."""
    import pandas as pd

    from ..util import spread

    forms = surface_forms or sorted({r[0] for r in default_dictionary()})
    patterns = {f: re.compile(rf"\b{re.escape(f)}\b") for f in forms}
    src = spread(pages_df.select("url", "text"), "url")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            text = pdf["text"].fillna("")
            for form, pat in patterns.items():
                counts = text.str.count(pat)
                hits = counts > 0
                if hits.any():
                    for url, tf in zip(pdf["url"][hits], counts[hits]):
                        out.append((url, form, int(tf)))
            yield pd.DataFrame(out, columns=["url", "surface_form", "tf"])

    return src.mapInPandas(run, schema=MENTIONS_SCHEMA)


def score_links(mentions_df, dict_df, threshold: float = 0.2):
    """mentions ⨝ broadcast(dictionary) → scored links above threshold.

    score = prior * (1 + log10(tf)); winner-per-(url, surface_form) chosen
    with a window so each mention links to at most one entity.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scored = mentions_df.join(F.broadcast(dict_df), "surface_form").withColumn(
        "score", F.round(F.col("prior") * (1.0 + F.log10(F.col("tf"))), 6)
    )
    w = Window.partitionBy("url", "surface_form").orderBy(
        F.desc("score"), F.asc("entity_id")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter((F.col("__rk") == 1) & (F.col("score") >= threshold))
        .drop("__rk")
        .select("url", "surface_form", "entity_id", "tf", "score")
    )


def sameas_edges(triples_df):
    """sameAs edge list from the triple table (input to CC)."""
    from pyspark.sql import functions as F

    return (
        triples_df.filter(
            (F.col("pred") == "http://schema.org/sameAs") & (F.col("obj_kind") == "id")
        )
        .select(F.col("subj").alias("src"), F.col("obj_value").alias("dst"))
        .distinct()
    )
