"""Rich-club coefficient (L168): do the hubs of this KG preferentially
connect to each other?  φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k counts
nodes of degree > k and E_k counts edges with BOTH endpoints of degree
> k — the densification diagnostic that, with the power-law fit (L145)
and assortativity (L149), tells you whether hub-aware partitioning
will see a dense hub core (shuffle hotspot) or a star forest.

Exactness: degrees, N_k, E_k are exact integers (an edge survives at
k iff min(deg_u, deg_v) > k, so E_k is one bounded suffix count);
φ(k) = one IEEE division of exact integers — bit-identical, no grid.
N_k < 2 → NULL φ.

Scale shape: one degree groupBy + two keyed joins against the node-
sized degree table; the k-grid is the DISTINCT-DEGREE set (bounded —
thousands at worst, the L145 argument), and the suffix counts are a
bounded grid×grid θ-join.  The 100 TB edge list is scanned a constant
number of times.

No reference counterpart; graph diagnostics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rich_club(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(k, n_k, e_k, phi)`` — one row per distinct degree k (the
    natural evaluation grid).  Self-loops count 2 toward degree (the
    L145 multigraph convention) but never toward E_k (an edge needs
    two distinct endpoints above k)."""
    ends = edges.select(F.col(src).alias("node")).unionAll(
        edges.select(F.col(dst).alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    grid = deg.select(F.col("deg").alias("k")).distinct()
    # per-edge min endpoint degree (self-loops excluded from E_k)
    du = deg.select(F.col("node").alias("_u"), F.col("deg").alias("_da"))
    dv = deg.select(F.col("node").alias("_v"), F.col("deg").alias("_db"))
    em = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .join(du, "_u")
        .join(dv, "_v")
        .select(F.least(F.col("_da"), F.col("_db")).alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("em"))
    )
    nk = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nd"))
    n_k = (
        grid.join(nk, grid["k"] < nk["deg"])
        .groupBy("k")
        .agg(F.sum("nd").alias("n_k"))
    )
    e_k = (
        grid.join(em, grid["k"] < em["m"])
        .groupBy("k")
        .agg(F.sum("em").alias("e_k"))
    )
    out = grid.join(n_k, "k", "left").join(e_k, "k", "left")
    nn = F.coalesce(F.col("n_k"), F.lit(0))
    ee = F.coalesce(F.col("e_k"), F.lit(0))
    return out.select(
        "k",
        nn.alias("n_k"),
        ee.alias("e_k"),
        F.when(
            nn > 1,
            (F.lit(2) * ee).cast("double")
            / (nn * (nn - F.lit(1))).cast("double"),
        ).alias("phi"),
    )
