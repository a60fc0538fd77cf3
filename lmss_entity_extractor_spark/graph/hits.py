"""Fixed-iteration HITS (Kleinberg, JACM'99) over an edge list — the
hubs-and-authorities companion to graph/pagerank.py: on a KG built from
10^12 turns, authorities surface the entities many mentions point AT
(canonical IRIs, shared tools) and hubs the entities that point at many
good authorities (index conversations, router turns).

Recurrence (synchronous, authorities first — the classic order):

    auth_i(v) = Σ_{u→v} hub_{i-1}(u)   then normalized
    hub_i(u)  = Σ_{u→v} auth_i(v)      then normalized

Normalization is BY THE GLOBAL MAX, not the L2 norm: HITS converges to
the principal-eigenvector direction under any positive rescaling, and
max is order-independent (no global float sum whose association order
differs between engines), so the DuckDB oracle running the identical
unrolled recurrence agrees to ulps.  The max itself is a map-side-
combinable 1-row aggregate, applied via a broadcast cross join — no
single-partition window.

Spark shape per iteration: two keyed shuffles (contributions grouped by
dst, then by src) + two 1-row max aggregates; lineage flattened with
``localCheckpoint`` (the closure/pagerank discipline).  Determinism: a
FIXED iteration count, no float-tolerance stopping rule.

No reference counterpart (the reference never ranks graph nodes);
extends the KG analytics family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    n_iters: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) -> (node, hub, auth) after ``n_iters`` synchronous
    max-normalized HITS iterations from hub_0 = 1.0 everywhere.

    Nodes with no in-edges hold authority 0; nodes with no out-edges
    hold hub score 0 (both mirrored exactly by the oracle)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if nodes.limit(1).count() == 0:
        # empty edge list -> empty, correctly-typed result
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).localCheckpoint()
    state = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(0.0).alias("auth")
    ).localCheckpoint()

    def _normalized(raw: DataFrame, col: str) -> DataFrame:
        # 1-row max -> broadcast cross join; max(col) > 0 whenever the
        # edge list is non-empty (hub_0 = 1 seeds every authority sum)
        mx = raw.agg(F.max(col).alias("_mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node", (F.col(col) / F.col("_mx")).alias(col)
        )

    for _ in range(n_iters):
        auth = _normalized(
            state.join(e, state["node"] == e["_src"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("hub").alias("auth")),
            "auth",
        )
        hub = _normalized(
            auth.join(e, auth["node"] == e["_dst"])
            .groupBy(F.col("_src").alias("node"))
            .agg(F.sum("auth").alias("hub")),
            "hub",
        )
        state = (
            nodes.join(hub, "node", "left")
            .join(auth, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
                F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
            )
            .localCheckpoint()
        )
    return state.select("node", "hub", "auth")
