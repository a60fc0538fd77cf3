"""Farthest-point sampling / k-center coreset (L158): pick k
maximally-diverse rows from an embedding table — the diversity-
sampling primitive of training-data curation (seed selection,
coverage probes, k-center clustering init; Gonzalez 1985 gives the
greedy a 2-approximation to the k-center optimum).

Greedy: start from the LOWEST id (deterministic, not random); each
round select the row with the LARGEST squared distance to its nearest
already-selected center (ties → lowest id).  Squared L2 keeps every
comparison an exact fixed tree (no sqrt needed — monotone), and each
center's vector folds into literal expressions, so a round is

    one narrow projection (min over ≤k generated distance columns)
    + one TakeOrdered(1)

over the full table — no shuffle beyond the top-1 reduction, k·scan
total work, nothing quadratic.  The selected ids and the per-round
coverage radius (the distance of the freshly-picked point — the
k-center objective after the previous round) come back as plain
driver-side data plus a DataFrame tagging every row with its nearest
center (`cover_assign`).

Determinism: distances are left-fold dots over float64 literals (the
L155 discipline), argmax tiebreaks on id — same input → the same
selection on any parallelism, re-derivable round-for-round in SQL
(the `fps` oracle unrolls the k rounds as CTEs).

No reference counterpart; curation/sampling family per SURVEY §2.11
(composes with L155 k-means as a deterministic init and with L16/L115
sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dlit, _dot_sql


def _sqnorm(vec) -> float:
    """Left-fold ‖v‖² in plain Python — bit-matches the SQL/zip_with
    left-assoc fold (np.dot may reassociate via BLAS; the 1-ulp lesson
    at similarity.py:166)."""
    s = 0.0
    for x in vec:
        s += float(x) * float(x)
    return s


def _sqdist_sql(vec_col: str, cvec: list[float], sqnorm: float) -> str:
    """‖x − c‖² = (x·x − 2·x·c) + ‖c‖² with pinned operand order; the
    x·x term cancels in comparisons but is kept so the value IS the
    squared distance (the coverage radius users read)."""
    self_dot = (
        f"aggregate(zip_with(`{vec_col}`, `{vec_col}`, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, v) -> acc + v)"
    )
    return (
        f"greatest(0D, (({self_dot} - (2.0D * {_dot_sql(vec_col, cvec)}))"
        f" + {_dlit(sqnorm)}))"
    )


def farthest_point_sample(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Returns ``[(round, id, sq_radius)]`` — the k selected rows in
    pick order; ``sq_radius`` is the squared distance of the pick to
    the previously-selected set (0.0 for the seed row).  k must be
    small (each round folds all previous centers into one expression —
    tens, not thousands)."""
    import numpy as np

    if k < 1:
        raise ValueError("farthest_point_sample: k must be >= 1")
    if k > 64:
        raise ValueError(
            "farthest_point_sample: k > 64 would generate pathological "
            "plans (k literal distance columns per row) — cluster with "
            "ops.kmeans at that scale instead"
        )
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    seed = base.orderBy("_id").limit(1).collect()
    if not seed:
        raise ValueError("farthest_point_sample: empty input")
    picks = [(0, seed[0]["_id"], 0.0)]
    centers = [np.asarray(seed[0]["_v"], dtype=np.float64)]
    for rnd in range(1, k):
        dist_exprs = [
            _sqdist_sql("_v", c.tolist(), _sqnorm(c)) for c in centers
        ]
        mind = (
            f"least({', '.join(dist_exprs)})" if len(dist_exprs) > 1 else dist_exprs[0]
        )
        row = (
            base.withColumn("_d", F.expr(mind))
            .orderBy(F.col("_d").desc(), F.col("_id").asc())
            .limit(1)
            .collect()
        )
        r = row[0]
        if r["_d"] == 0.0:
            break  # every remaining row duplicates a center
        picks.append((rnd, r["_id"], float(r["_d"])))
        centers.append(np.asarray(r["_v"], dtype=np.float64))
    return picks


def cover_assign(
    df: DataFrame,
    picks_vectors: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "center",
) -> DataFrame:
    """Tag every row with the id of its nearest selected center
    (squared L2, lowest-id ties) — one zero-shuffle projection."""
    entries = ", ".join(
        "named_struct('d', {d}, 'nid', {nid})".format(
            d=_sqdist_sql(vec_col, list(map(float, v)), _sqnorm(v)),
            nid=int(pid),
        )
        for pid, v in picks_vectors
    )
    # struct min = (smallest distance, then smallest center id)
    return df.withColumn(out_col, F.expr(f"array_min(array({entries})).nid"))
