"""Corpus filtering endpoint: the kept-document set a training-data build
actually emits (SURVEY.md §2 'training-data pipeline ops' composition).

A 100 TB corpus build doesn't run language-ID, quality scoring, and dedup
as separate jobs over separate scans — it composes them into one plan so
Catalyst shares the scan and the narrow column-algebra stages fuse into
the same codegen span, with only the dedup path (MinHash → star edges →
connected components) adding shuffles. The output is the final decision
table: one row per KEPT document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MINHASH_BANDS, dup_clusters, ngram_jaccard_pairs
from .text import lang_id, quality_score

DEFAULT_QUALITY_FLOOR = 0.3
DEFAULT_JACCARD = 0.5


def corpus_filter(
    docs: DataFrame,
    quality_floor: float = DEFAULT_QUALITY_FLOOR,
    jaccard_threshold: float = DEFAULT_JACCARD,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Kept documents: language-consistent (the n-gram guess agrees with the
    declared lang), quality ≥ ``quality_floor``, and the document is its
    duplicate cluster's min-id representative. Returns
    (doc_id, lang, lang_guess, quality) for the kept set — O(kept) rows.

    The dedup decision clusters VERIFIED near-duplicates — MinHash
    candidates filtered by exact shingle Jaccard ≥ ``jaccard_threshold``
    (ngram_jaccard_pairs) — not raw LSH candidates: candidate pairs are a
    recall device, and clustering them directly over-merges (on the
    sandbox corpus the raw candidate graph collapses 500 docs into 2
    components; the verified graph keeps real near-dup groups only).

    Plan shape: lang_id and quality_score are pure column algebra over ONE
    shared scan (they fuse); the verified-pair CC path adds the shuffles;
    the three decisions meet in doc_id equi-joins (AQE-eligible).
    """
    li = lang_id(docs).select("doc_id", "lang_guess")
    qs = quality_score(docs).select("doc_id", "quality")
    verified = ngram_jaccard_pairs(docs, threshold=jaccard_threshold, bands=bands)
    rep = dup_clusters(docs, pairs=verified)
    return (
        docs.select("doc_id", "lang")
        .join(li, "doc_id")
        .join(qs, "doc_id")
        .join(rep, "doc_id")
        .filter(
            (F.col("lang_guess") == F.col("lang"))
            & (F.col("quality") >= quality_floor)
            & (F.col("doc_id") == F.col("representative"))
        )
        .select("doc_id", "lang", "lang_guess", F.round("quality", 6).alias("quality"))
    )
