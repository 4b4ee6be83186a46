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


N_TABLES = 4  # independent plane sets: near-twin miss prob per table p →
# p^L overall; one table alone misses ~11% of cosine-0.999 twins at 8 planes


def hyperplanes(dim: int, n_planes: int = N_PLANES, table: int = 0):
    """Deterministic ±1 hyperplanes, identical on every executor (seeded
    numpy, no per-process RNG state). ``table`` selects an independent
    plane set for multi-table LSH; table 0 keeps the original seed so
    single-table callers (and their SQL oracles) are unchanged."""
    import numpy as np

    seed = 0x5EED if table == 0 else 0x5EED ^ (table * 0x9E3779B9)
    rng = np.random.default_rng(seed)
    return rng.choice([-1.0, 1.0], size=(n_planes, dim))


def with_lsh_bucket(df, vec_col: str, dim: int, n_planes: int = N_PLANES):
    """Add a sign-random-projection bucket column via one Arrow-batched
    pandas pass (an expression-tree formulation of dim×planes sign dots
    explodes codegen; numpy does the projection as one matmul)."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    planes = hyperplanes(dim, n_planes)
    weights = (1 << np.arange(n_planes)).astype("int64")

    def project(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy())  # (rows, dim)
            signs = (m @ planes.T) > 0  # (rows, n_planes)
            pdf = pdf.copy()
            pdf["bucket"] = (signs @ weights).astype("int64")
            yield pdf

    # fresh StructType: StructType.add would MUTATE the df's cached schema
    schema = StructType(list(df.schema.fields) + [StructField("bucket", LongType())])
    return df.mapInPandas(project, schema=schema)


def with_lsh_buckets(
    df, vec_col: str, dim: int, n_planes: int = N_PLANES, n_tables: int = N_TABLES
):
    """Multi-table variant: one pandas pass adds ``buckets`` (array<long>,
    one id per table). All L projections happen in the same Arrow batch —
    the vector is read once, not L times."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    planes = [hyperplanes(dim, n_planes, t) for t in range(n_tables)]
    weights = (1 << np.arange(n_planes)).astype("int64")

    def project(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy())
            cols = [(((m @ p.T) > 0) @ weights).astype("int64") for p in planes]
            pdf = pdf.copy()
            pdf["buckets"] = list(np.stack(cols, axis=1))
            yield pdf

    schema = StructType(
        list(df.schema.fields) + [StructField("buckets", ArrayType(LongType()))]
    )
    return df.mapInPandas(project, schema=schema)


def lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing the
    query's LSH bucket in ANY of ``n_tables`` independent plane sets.
    Scale path: the join key is (table, bucket), so per-query work is
    ≈ L·|corpus|/2^n_planes instead of |corpus|; candidate keys are
    deduplicated BEFORE vectors are re-attached, so the wide shuffle
    carries only (query_id, vec_id) ids."""
    from ..util import spread

    # dimension probe must skip NULL embeddings (a null first row would
    # otherwise silently empty the result)
    embeddings = embeddings.filter(F.col("embedding").isNotNull())
    first = embeddings.select(F.size("embedding").alias("d")).first()
    if first is None:
        spark = embeddings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int"
        )
    dim = first["d"]
    # materialize once: query side, candidate side, and scoring all read it
    corpus = with_lsh_buckets(
        spread(embeddings.select("vec_id", _as_double("embedding").alias("v"))),
        "v",
        dim,
        n_planes,
        n_tables,
    ).localCheckpoint()
    exploded = corpus.select(
        "vec_id", F.posexplode("buckets").alias("t", "bucket")
    )
    q_exploded = (
        corpus.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.posexplode("buckets").alias("t", "bucket"))
    )
    cand = (
        exploded.join(F.broadcast(q_exploded), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = cand.join(corpus, "vec_id").join(
        F.broadcast(
            corpus.filter(F.col("vec_id") < n_queries).select(
                F.col("vec_id").alias("query_id"), F.col("v").alias("q")
            )
        ),
        "query_id",
    )
    cosine = F.round(_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


N_PROBE_CELLS = 4
# Parameter-scaling rules (VERDICT r2 #6) — encoded, not just documented, so
# a 100× corpus doesn't silently inherit a sandbox constant:
# * n_centroids ≈ ⌈√n⌉ (classic IVF-flat balance: cell scan cost n/k vs
#   codebook compare cost k — √n minimizes the sum), capped so the
#   driver-side codebook stays O(thousands) rows;
# * probe cells ≈ max(4, ⌈√n_centroids⌉) — probed fraction shrinks as the
#   index grows instead of scanning a constant fraction of the corpus.
IVF_MAX_CENTROIDS = 4096


def derived_n_centroids(n: int) -> int:
    import math

    return max(1, min(IVF_MAX_CENTROIDS, math.ceil(math.sqrt(n))))


def derived_probe_cells(n_centroids: int) -> int:
    import math

    return min(n_centroids, max(N_PROBE_CELLS, math.ceil(math.sqrt(n_centroids))))


def _ivf_centroids(corpus: DataFrame, n_centroids: int = None):
    """Deterministic codebook: the ``n_centroids`` corpus vectors with the
    smallest md5(vec_id) — a uniform hash-sample that is (a) reproducible in
    plain SQL (no k-means iterations, so the DuckDB twin rebuilds the
    identical codebook), (b) independent of vec_id density (the earlier
    vec_id-modulus stride under-selected on sparse/filtered ids, ADVICE r2),
    and (c) a distributed TakeOrdered — no full sort, no single-partition
    window. cid = rank in hash order. Returns (cids, matrix, n_centroids)."""
    import numpy as np

    if n_centroids is None:
        n_centroids = derived_n_centroids(corpus.count())
    rows = (
        corpus.select("vec_id", "v")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_centroids)
        .collect()
    )
    cids = np.arange(len(rows), dtype="int64")
    mat = np.array([r["v"] for r in rows], dtype="float64")
    return cids, mat, n_centroids


def with_ivf_cell(df, vec_col: str, cids, centroids):
    """Assign each vector to its max-cosine centroid in one Arrow pass
    (ties broken by smallest cid — the SQL twin orders identically)."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    inv_norms = 1.0 / np.linalg.norm(centroids, axis=1)

    def assign(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy())
            # row norms cancel in argmax; scale columns by centroid norms
            sims = (m @ centroids.T) * inv_norms
            pdf = pdf.copy()
            pdf["cell"] = cids[np.argmax(sims, axis=1)]
            yield pdf

    schema = StructType(list(df.schema.fields) + [StructField("cell", LongType())])
    return df.mapInPandas(assign, schema=schema)


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = None,
    n_probe_cells: int = None,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors are inverted-listed by
    nearest centroid; each query probes its ``n_probe_cells`` nearest cells
    and exact cosine re-ranks only those candidates. Scale shape: the wide
    join key is the cell id, per-query work is ≈ probe_cells/|cells| of the
    corpus, and candidates travel as bare ids until re-rank.

    Defaults derive from the corpus size (n_centroids ≈ √n capped at
    IVF_MAX_CENTROIDS, probe ≈ √n_centroids floored at 4) so the index
    keeps its shape as the corpus grows — pass explicit values to pin."""
    import numpy as np

    from ..util import spread

    embeddings = embeddings.filter(F.col("embedding").isNotNull())
    first = embeddings.select(F.size("embedding").alias("d")).first()
    if first is None:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int"
        )
    base = spread(embeddings.select("vec_id", _as_double("embedding").alias("v")))
    cids, cents, n_centroids = _ivf_centroids(base, n_centroids)
    if n_probe_cells is None:
        n_probe_cells = derived_probe_cells(n_centroids)
    corpus = with_ivf_cell(base, "v", cids, cents).localCheckpoint()

    # query probe cells: top-n_probe_cells centroids by cosine (driver-side
    # on the tiny query set — n_queries × n_centroids scalars)
    inv_norms = 1.0 / np.linalg.norm(cents, axis=1)
    q_rows = corpus.filter(F.col("vec_id") < n_queries).select("vec_id", "v").collect()
    probe = []
    for r in q_rows:
        qv = np.asarray(r["v"], dtype="float64")
        sims = (cents @ qv) * inv_norms / np.linalg.norm(qv)
        order = sorted(range(len(cids)), key=lambda i: (-sims[i], cids[i]))
        probe.extend((int(r["vec_id"]), int(cids[i])) for i in order[:n_probe_cells])
    spark = embeddings.sparkSession
    probe_df = spark.createDataFrame(probe, "query_id long, cell long")

    cand = (
        corpus.join(F.broadcast(probe_df), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = cand.join(corpus.select("vec_id", "v"), "vec_id").join(
        F.broadcast(
            corpus.filter(F.col("vec_id") < n_queries).select(
                F.col("vec_id").alias("query_id"), F.col("v").alias("q")
            )
        ),
        "query_id",
    )
    cosine = F.round(_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
