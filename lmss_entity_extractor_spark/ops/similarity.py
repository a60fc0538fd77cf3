"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (crossJoin against a
broadcast query set — fine when |queries| is small); sign-bit LSH
bucketing is the scale path (candidate set shrinks ~2^bits, join on the
bucket key instead of a crossJoin).  Dot products use the built-in
higher-order functions ``zip_with``/``aggregate`` — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine with the reference's zero-norm guard -> 0
    (/root/reference/app/lmss_search.py:106-110)."""
    na, nb = norm_expr(a), norm_expr(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot_expr(a, b) / (na * nb))


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query: (query_id, rank, neighbor_id).

    ``queries`` is broadcast (small side); ranking window ties break on
    neighbor id for determinism.  Self-matches excluded."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def sign_bucket_expr(vec_col: Column, bits: int = 4) -> Column:
    """Sign-LSH bucket id from the first ``bits`` dimensions: bit i set
    iff vec[i] > 0.  A random-hyperplane LSH would rotate first; for
    pre-normalized embeddings the leading-dims variant is deterministic
    and engine-portable."""
    b = F.lit(0)
    for i in range(bits):
        b = b + F.when(vec_col.getItem(i) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


def assign_ivf_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: tag each vector with the id of its
    nearest centroid (max cosine, asc centroid-id tiebreak).

    Centroids are a tiny broadcast side; assignment is a narrow
    crossJoin + per-vector argmax — at 100 TB this is one pass over the
    vectors with no keyed shuffle (the window partitions by the vector's
    own id, which the crossJoin already co-locates per input row)."""
    c = centroids.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_ccos"), F.asc("centroid_id"))
    return (
        vectors.crossJoin(F.broadcast(c))
        .withColumn("_ccos", cosine_expr(F.col(vec_col), F.col("cvec")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_ccos", "_rn", "cvec")
    )


def knn_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: vectors are bucketed by nearest coarse
    centroid (deterministic seeds = the first ``n_centroids`` vectors by
    id), and each query probes only its own cell (nprobe=1).

    The scale path beyond ``knn_lsh``: candidate count per query is
    ~N/n_centroids regardless of embedding geometry, and the cell join is
    an equi-join on ``centroid_id`` (broadcastable query side).  Same
    output shape as ``knn_bruteforce``: (query_id, rank, neighbor_id)."""
    # seeds = the n_centroids smallest ids (NOT `id < n`, which silently
    # yields zero centroids when ids are sparse or offset); a TakeOrdered
    # over the id column, deterministic for any id space
    seeds = embeddings.orderBy(F.asc(id_col)).limit(n_centroids)
    cells = assign_ivf_cells(embeddings, seeds, id_col, vec_col)
    q = assign_ivf_cells(queries, seeds, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "centroid_id"
    )
    e = cells.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"), "centroid_id"
    )
    scored = (
        e.join(F.broadcast(q), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def knn_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: neighbors searched only within the
    query's sign bucket.  Same output shape as ``knn_bruteforce``."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket"),
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
