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
