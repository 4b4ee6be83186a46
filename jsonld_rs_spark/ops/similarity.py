"""Similarity search over embeddings: brute-force cosine top-k baseline and
a SimHash-LSH-bucketed approximate variant (the 100 TB scale path).

Brute-force is exact and oracle-checkable (DuckDB list functions); the
bucketed variant trades recall for a shuffle-key join — at scale, the
candidate set per query drops from |corpus| to |bucket|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8  # LSH hyperplane count → 256 buckets


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def brute_force_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for the first ``n_queries``
    vectors. The tiny query side is broadcast; the corpus is scanned once."""
    from ..util import spread

    corpus = spread(embeddings.select("vec_id", _as_double("embedding").alias("v")))
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    scored = corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    cosine = F.round(_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplane(dim: int, plane: int):
    """Deterministic pseudo-random hyperplane: component d of plane p is
    ±1 by the parity of a hex char of md5(f'{p}:{d}') — no RNG, identical
    on every executor."""
    comps = [
        F.when(
            F.ascii(F.substring(F.md5(F.lit(f"hp{plane}:{d}")), 1, 1)) % 2 == 1,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
        for d in range(dim)
    ]
    return F.array(*comps)


def lsh_bucket(v, dim: int, n_planes: int = N_PLANES):
    """Sign-random-projection bucket id (0 .. 2^n_planes-1)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        sign = _dot(v, _hyperplane(dim, p)) > 0
        bucket = bucket + F.when(sign, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Scale path: the join key is the bucket id, so per-query work is
    |bucket| ≈ |corpus| / 2^n_planes instead of |corpus|."""
    from ..util import spread

    first = embeddings.select(F.size("embedding").alias("d")).first()
    dim = first["d"]
    corpus = spread(
        embeddings.select("vec_id", _as_double("embedding").alias("v"))
    ).withColumn("bucket", lsh_bucket(F.col("v"), dim, n_planes))
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), "bucket"
    )
    scored = corpus.join(F.broadcast(queries), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cosine = F.round(_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
