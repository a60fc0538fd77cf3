"""Distributed PCA / whitening for embedding columns — the
dimensionality-reduction step an LLM data pipeline runs before
SemDeDup-style clustering or to shrink ANN index footprints (whitening
is also the standard pre-step for embedding similarity calibration).

The 100 TB shape is the MLlib linear-model one: the only thing that
ever crosses the cluster is PER-PARTITION MOMENT MATRICES —

- ``partition_moments`` maps each partition to ONE row
  ``(n, s[d], g[d*d])`` with s = Σx and g = Σ x xᵀ (Arrow-batched
  numpy; float32 inputs widened to float64 BEFORE any product, so
  each product is exact — only summation order is inexact);
- the driver combines the ≤#partitions partial rows (sorted by a
  content key first, so the combine order — and hence the result — is
  deterministic for a FIXED partitioning) and eigendecomposes the d×d
  covariance with ``numpy.linalg.eigh`` — d is the embedding width
  (tens to low thousands): driver work is O(d³), independent of row
  count;
- eigenvector SIGN is pinned (largest-|component| coordinate made
  positive) — eigh's sign freedom would otherwise flip projections
  between runs;
- ``pca_project`` broadcasts the (k×d) component matrix and projects
  with one Arrow-batched matmul per batch — no shuffle at all.

Honest float caveat (stated, not hidden): changing the PARTITIONING
changes partial-sum grouping, so moments drift at the 1e-15 relative
level across parallelism — tests bound it; the contract query
therefore oracles the COVARIANCE on the half-up 1e-6 grid (the
repo-standard cross-engine float discipline) and never oracles eigh.

Reference counterpart: none — the reference consumes fixed MiniLM
vectors (`app/entity_extraction.py`); embedding-space reduction is
part of the beyond-reference LLM-pipeline mandate (SURVEY §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_moments(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One row per non-empty partition: (n, s array<double>, g
    array<double> row-major d×d).  Null/empty vectors are rejected
    loudly inside the kernel — a silent skip would bias the mean."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        n, s, g = 0, None, None
        for pdf in batches:
            col = pdf[vec_col]
            if col.isnull().any():
                raise ValueError(f"partition_moments: NULL {vec_col} row")
            x = np.array([np.asarray(v, dtype=np.float64) for v in col])
            if x.size == 0:
                continue
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [list(s)], "g": [list(g.ravel())]}
            )

    return df.select(vec_col).mapInPandas(
        kernel, "n long, s array<double>, g array<double>"
    )


def collect_moments(df: DataFrame, vec_col: str = "embedding"):
    """Combine the partial moments on the driver → (n, mean[d],
    cov[d,d]) with population covariance cov = G/n − mean meanᵀ.
    Partials are combined in sorted-content order (deterministic for a
    fixed partitioning)."""
    import numpy as np

    rows = partition_moments(df, vec_col).collect()
    if not rows:
        raise ValueError("collect_moments: no vectors")
    rows.sort(key=lambda r: (r["n"], tuple(r["s"])))
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


@dataclass(frozen=True)
class PcaModel:
    mean: "object"        # np.ndarray (d,)
    components: "object"  # np.ndarray (k, d) — rows are eigenvectors
    eigvals: "object"     # np.ndarray (k,) descending


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding") -> PcaModel:
    """Fit the top-k principal components.  Eigenvector signs pinned:
    the largest-|x| coordinate of each component is made positive."""
    import numpy as np

    n, mean, cov = collect_moments(df, vec_col)
    d = mean.shape[0]
    if not (0 < k <= d):
        raise ValueError(f"pca_fit: k={k} out of range for d={d}")
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T               # (k, d)
    for i in range(k):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(mean=mean, components=comps, eigvals=w[order])


def pca_project(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    *,
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project ``vec_col`` onto the model's components (appended as
    ``out_col``); ``whiten=True`` scales each coordinate by
    1/sqrt(eigval) so projected covariance ≈ I.  Broadcast matrices,
    zero shuffle."""
    import numpy as np

    spark = df.sparkSession
    scale = (
        1.0 / np.sqrt(np.maximum(model.eigvals, eps)) if whiten else None
    )
    b = spark.sparkContext.broadcast(
        (
            np.asarray(model.mean),
            np.asarray(model.components),
            None if scale is None else np.asarray(scale),
        )
    )

    def kernel(batches):
        import numpy as np

        mean, comps, sc = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            y = (x - mean) @ comps.T
            if sc is not None:
                y = y * sc
            pdf = pdf.copy()
            pdf[out_col] = [list(row) for row in y]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(kernel, f"{schema}, {out_col} array<double>")
