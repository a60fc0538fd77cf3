"""General Euclidean k-means (L155): Lloyd's algorithm as the repo's
deterministic train-small/apply-wide shape — the clustering operator a
training-data pipeline uses for corpus bucketing, diversity sampling
and coreset selection (the IVF coarse quantizer in `ops/similarity.py`
is its spherical cousin; this one clusters on DISTANCE, not
direction, so magnitudes matter — e.g. doc-length-scaled features).

Training (driver-side numpy over the shared deterministic hash-sample
contract, `collect_training_sample`): init = k evenly spaced rows of
the id-sorted sample; per iteration assignments use

    argmin_j ‖x−c_j‖² = argmax_j (x·c_j − ‖c_j‖²/2)

via a fixed-order einsum (no BLAS reassociation — the 1-ulp lesson at
`similarity.py:166`), ties to the lowest centroid id; empty clusters
keep their previous centroid; means over members in id-sorted order.
Same input → bit-identical centroids at any parallelism.

Assignment at scale: the trained (c_j, ‖c_j‖²/2) pairs fold into ONE
generated column expression (the `_dot_sql` machinery) — a narrow,
JVM-side, zero-shuffle projection over 100 TB of vectors; no
crossJoin, no window, no UDF.  The score tree (left-fold dot minus a
half-norm literal) is mirrored term-for-term by the DuckDB oracle
from the frozen fixture centroids, so cluster labels are checked
bit-for-bit.

No reference counterpart; ANN/clustering family per SURVEY §2.11
(shares its training-sample and literal-expression discipline with
L9 IVF and L34 PQ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _dlit, _dot_sql, collect_training_sample
from .validate import validation_enabled


def train_kmeans_local(X, k: int = 8, n_iters: int = 5):
    """Euclidean Lloyd over an id-sorted float64 sample.  Returns
    ``[(cid, center, half_sqnorm)]`` — plain driver-side data."""
    import numpy as np

    if len(X) == 0:
        raise ValueError("train_kmeans_local: empty training sample")
    n = len(X)
    k = min(k, n)
    C = X[np.linspace(0, n - 1, k).astype(int)].copy()
    for _ in range(max(n_iters, 0)):
        # fixed-order dot (see module docstring); score = x·c − ‖c‖²/2
        dots = np.einsum("nd,kd->nk", X, C)
        halfn = 0.5 * np.einsum("kd,kd->k", C, C)
        assign = np.argmax(dots - halfn, axis=1)  # ties -> lowest index
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    halfn = 0.5 * np.einsum("kd,kd->k", C, C)
    return [(j, C[j].tolist(), float(halfn[j])) for j in range(k)]


def train_kmeans(
    embeddings: DataFrame,
    k: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
):
    """Deterministic k-means trainer over the shared capped/sampled
    collect (see `collect_training_sample` for the 100 TB contract)."""
    X = collect_training_sample(embeddings, id_col, vec_col, sample_mod, "train_kmeans")
    return train_kmeans_local(X, k, n_iters)


def kmeans_cluster_expr(
    vec_name: str, centroids: list[tuple[int, list[float], float]]
) -> Column:
    """Nearest-centroid (squared-L2) id as one generated column
    expression: argmax over (dot − half_sqnorm, −cid) structs — ties
    break to the lowest centroid id."""
    entries = ", ".join(
        f"named_struct('d', ({_dot_sql(vec_name, cvec)} - {_dlit(h)}), "
        f"'nid', {-cid})"
        for cid, cvec, h in centroids
    )
    return F.expr(f"-(array_max(array({entries})).nid)")


def assign_kmeans(
    df: DataFrame,
    centroids: list[tuple[int, list[float], float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Tag each row with its nearest trained centroid — one narrow
    zero-shuffle projection."""
    return df.withColumn(out_col, kmeans_cluster_expr(vec_col, centroids))


def geometric_median(
    df: DataFrame,
    by: list[str],
    vec_col: str,
    iters: int = 16,
    max_points: int = 4096,
    eps: float = 1e-12,
) -> DataFrame:
    """Geometric median / Weiszfeld (L408): ``(by..., n, dim, k, c,
    objective)`` — one row per dimension ``k`` carrying the robust
    center coordinate ``c``, plus the final L1-of-L2 objective
    Σ‖xᵢ−y‖ repeated per row.  The MULTI-dimensional robust center
    the scalar median family can't give (component-wise medians are
    not rotation-equivariant and can sit far from the data): the
    minimizer of the summed Euclidean distance, the standard robust
    prototype for embedding clusters (50% breakdown — one corrupted
    shard cannot drag it, unlike the centroid L80/L155 machinery
    uses).

    Weiszfeld 1937 iterations from the centroid:

        wᵢ = 1/max(‖xᵢ−y‖, eps),   y ← Σwᵢxᵢ / Σwᵢ

    with the classic on-a-data-point singularity handled by the eps
    clamp (epsilon-regularized Weiszfeld — deterministic, the same
    fixed tree both engines).  FIXED ``iters`` (no float stopping
    rule — the L28/L347 discipline); per-group points collapse to ONE
    lexicographically sorted array (``max_points`` REFUSED loudly —
    the bounded-collect contract; hash-sample upstream), every fold
    — distances, weights, weighted sums, the objective — runs in
    pinned sorted-point, ascending-dimension order, so the result is
    bit-identical across engines and partitionings.  Ragged
    dimensions are REFUSED; NULL vectors refused.  Float32 inputs
    widen to double (exact).

    Scale shape: one keyed exchange packing each bounded group + one
    in-row fold; groups parallelize — 100 TB of embeddings is many
    clusters, never one giant one.

    No reference counterpart; robust analytics per SURVEY §2.11."""
    if iters < 1:
        raise ValueError("geometric_median: iters must be >= 1")
    if validation_enabled():
        n_null = df.filter(F.col(vec_col).isNull()).count()
        if n_null:
            raise ValueError(f"geometric_median: {n_null} NULL vector(s)")
    base = df.select(
        *by,
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "_v"
        ),
    )
    if validation_enabled():
        n_dims = base.select(F.size("_v").alias("_d")).distinct().count()
        if n_dims > 1:
            raise ValueError(
                "geometric_median: ragged vector dimensions — normalize "
                "upstream"
            )
    sizes = base.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_points).count()
        if over:
            raise ValueError(
                f"geometric_median: a group exceeds max_points="
                f"{max_points} — hash-sample upstream (the median "
                "stabilizes long before 10^4 points)"
            )
    packed = base.groupBy(*by).agg(
        F.sort_array(F.collect_list("_v")).alias("_pts"),
        F.count(F.lit(1)).alias("n"),
    )
    d = F.size(F.element_at(F.col("_pts"), 1))
    nd = F.col("n").cast("double")
    centroid = F.transform(
        F.sequence(F.lit(1), d),
        lambda k: F.aggregate(
            F.col("_pts"), F.lit(0.0), lambda s, p: s + F.element_at(p, k)
        )
        / nd,
    )

    def dist(p, y):
        return F.sqrt(
            F.aggregate(
                F.zip_with(p, y, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda s, t: s + t,
            )
        )

    epsl = F.lit(float(eps))

    def _step(acc, _i):
        ws = F.transform(
            F.col("_pts"),
            lambda p: F.lit(1.0) / F.greatest(dist(p, acc), epsl),
        )
        den = F.aggregate(ws, F.lit(0.0), lambda s, w: s + w)
        scaled = F.zip_with(
            F.col("_pts"), ws, lambda p, w: F.transform(p, lambda x: x * w)
        )
        sumv = F.aggregate(
            scaled,
            F.transform(acc, lambda _: F.lit(0.0)),
            lambda accv, p: F.zip_with(accv, p, lambda a, b: a + b),
        )
        return F.transform(sumv, lambda v: v / den)

    folded = packed.select(
        *by,
        "n",
        d.alias("dim"),
        F.aggregate(
            F.sequence(F.lit(1), F.lit(int(iters))), centroid, _step
        ).alias("_y"),
        F.col("_pts"),
    )
    obj = F.aggregate(
        F.col("_pts"),
        F.lit(0.0),
        lambda s, p: s + dist(p, F.col("_y")),
    )
    staged = folded.select(
        *by, "n", "dim", obj.alias("objective"), F.col("_y")
    )
    ex = staged.select(
        *by,
        "n",
        "dim",
        "objective",
        F.posexplode("_y").alias("_k0", "c"),
    )
    return ex.select(
        *by,
        "n",
        "dim",
        (F.col("_k0") + 1).alias("k"),
        "c",
        "objective",
    )
