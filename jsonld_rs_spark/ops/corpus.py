"""Corpus filtering endpoint: the kept-document set a training-data build
actually emits (SURVEY.md §2 'training-data pipeline ops' composition).

A 100 TB corpus build doesn't run language-ID, quality scoring, and dedup
as separate jobs over separate scans — it composes them into one plan:
the scalar filters are computed as columns in ONE projection over a single
scan of the corpus (they fuse into one codegen span — VERDICT r3 #3 closed
the earlier per-filter re-join shape), and only the dedup path (MinHash →
verified pairs → connected components) adds shuffles. The output is the
final decision table: one row per KEPT document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MINHASH_BANDS, dup_clusters, ngram_jaccard_pairs
from .text import lang_guess_col, quality_col

DEFAULT_QUALITY_FLOOR = 0.3
DEFAULT_JACCARD = 0.5


def corpus_filter(
    docs: DataFrame,
    quality_floor: float = DEFAULT_QUALITY_FLOOR,
    jaccard_threshold: float = DEFAULT_JACCARD,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Kept documents: language-consistent (the n-gram guess agrees with the
    declared lang), quality ≥ ``quality_floor``, and the document is the
    min-id representative of its duplicate cluster AMONG FILTER-PASSING
    documents. Returns (doc_id, lang, lang_guess, quality) — O(kept) rows.

    Order of decisions (ADVICE r3): scalar filters FIRST, dedup among the
    survivors. Clustering before filtering would let a cluster whose min-id
    member is low-quality contribute zero documents even when other members
    pass; filtering first guarantees every near-dup cluster with at least
    one passing member keeps exactly one document. It is also the cheaper
    plan — shingling/MinHash (the expensive map) runs over the filtered
    slice only.

    The dedup decision clusters VERIFIED near-duplicates — MinHash
    candidates filtered by exact shingle Jaccard ≥ ``jaccard_threshold``
    (ngram_jaccard_pairs) — not raw LSH candidates: candidate pairs are a
    recall device, and clustering them directly over-merges (on the
    sandbox corpus the raw candidate graph collapses 500 docs into 2
    components; the verified graph keeps real near-dup groups only).

    Plan shape: ONE scan of ``docs`` computes lang_guess + quality as
    columns in a single projection (whole-stage codegen, no joins); the
    passing slice is lazily checkpointed (it feeds the shingle pass, the
    CC map, and the final kept filter — written once, read three times,
    exactly what a warehouse build does with its decision table); the
    verified-pair CC path owns all the shuffles.
    """
    from ..util import spread

    # spread BEFORE the scalar scoring (r8): the sandbox corpus scans as one
    # partition, and the lang/quality column algebra (several full-text
    # scans per document) otherwise runs in a single task before
    # shingle_table's own spread can help. No-op at crawl scale where the
    # scan is already wide.
    passing = (
        spread(docs.select("doc_id", "lang", "text"))
        .select(
            "doc_id",
            "lang",
            "text",
            lang_guess_col().alias("lang_guess"),
            quality_col().alias("quality"),
        )
        .filter(
            (F.col("lang_guess") == F.col("lang"))
            & (F.col("quality") >= quality_floor)
        )
        .localCheckpoint(eager=False)
    )
    verified = ngram_jaccard_pairs(passing, threshold=jaccard_threshold, bands=bands)
    rep = dup_clusters(passing, pairs=verified)
    return (
        passing.join(rep, "doc_id")
        .filter(F.col("doc_id") == F.col("representative"))
        .select("doc_id", "lang", "lang_guess", "quality")
    )
