"""Benchmark decontamination: flag training documents sharing long word
n-grams with an evaluation set (SURVEY.md §2 'training-data pipeline ops'
— the decontamination sweep every serious corpus build runs before
training, shaped after the n-gram-overlap checks described in public LLM
reports).

Scale design (100 TB train side, small eval side):
* the join key is the k-gram itself, so the shuffle carries (id, gram)
  pairs — never document text;
* grams that occur in more than ``df_cap`` TRAINING documents are excluded
  before the join (broadcast anti-join): ubiquitous phrases are not
  contamination evidence, and at web scale a stopword gram would
  concentrate a quadratic bucket in one task — the same guardrail as the
  MinHash degenerate-bucket cap (ops/dedup.py);
* the eval side is small by definition; after the gram join the result
  aggregates per (train_id, eval_id) with a distinct count — map-side
  partial aggregation applies.

The operator is deterministic and has an exact DuckDB twin
(``__spark_entry__.oracle_sql``): the k-gram construction reuses the
shingle algebra proven equivalent across both engines for the dedup
operators (ops/dedup._shingles / the oracle's list_transform CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles

NGRAM_K = 5
MIN_SHARED = 2
DF_CAP = 1000


def contamination_pairs(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = NGRAM_K,
    min_shared: int = MIN_SHARED,
    df_cap: int = DF_CAP,
) -> DataFrame:
    """(train_id, eval_id, n_shared): training docs sharing at least
    ``min_shared`` distinct word ``k``-grams with an eval doc. A corpus
    build anti-joins its kept set against the distinct train_ids here.

    ``df_cap`` excludes grams present in more than that many TRAINING
    documents (boilerplate; see module docstring). ``df_cap=0`` disables
    the cap (exact semantics — the sandbox oracle runs with the cap ON and
    mirrors it).
    """
    from ..util import spread

    src = train.select("doc_id", "text")
    try:
        # spread a raw scan so the shingle map isn't serialized by an
        # AQE-coalesced single partition (sandbox single-file parquet)
        src = spread(src)
    except ValueError:
        # already-shuffled inputs (e.g. a limit/join upstream) carry their
        # own partitioning, and spread's structural guard refuses to probe
        # them (util.spread AQE rule) — use them as-is
        pass
    # the gram table feeds BOTH the hot-gram pre-count and the pair join:
    # lazily checkpoint it so the expensive shingle map over the train side
    # runs once, not once per consumer (the shingle_table rule, VERDICT r2
    # #4 — review r4b caught this op re-deriving it twice)
    tg = src.select(
        F.col("doc_id").alias("train_id"),
        F.explode(F.array_distinct(_shingles(k=k))).alias("gram"),
    ).localCheckpoint(eager=False)
    eg = eval_docs.select(
        F.col("doc_id").alias("eval_id"),
        F.explode(F.array_distinct(_shingles(k=k))).alias("gram"),
    )
    if df_cap > 0:
        hot = (
            tg.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > df_cap)
            .select("gram")
        )
        # broadcast: over-cap grams are rare by construction (the MinHash
        # degenerate-bucket trade, ops/dedup.py minhash_dup_pairs docstring)
        tg = tg.join(F.broadcast(hot), "gram", "left_anti")
    return (
        tg.join(eg, "gram")
        .groupBy("train_id", "eval_id")
        .agg(F.count_distinct("gram").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
