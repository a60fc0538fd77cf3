"""Fixed-iteration PageRank over an edge list — the iterative graph
workload beyond transitive closure (graph/closure.py): rank mass flows
along out-edges under damping, converging toward the stationary
distribution.

Spark shape: ranks and out-degrees are keyed DataFrames; each iteration
is one join (ranks -> edges, keyed shuffle) + one aggregation
(contributions by destination) + a left join back onto the node set so
dangling and source-only nodes keep receiving the teleport term.
Lineage is flattened per iteration with ``localCheckpoint`` (the same
discipline as closure/components — an unrolled 10-iteration plan
otherwise grows exponentially under self-joins).

Determinism: a FIXED iteration count (no float-tolerance stopping rule),
so any engine that runs the same recurrence produces the same values up
to floating-point associativity — the DuckDB oracle runs the identical
unrolled recurrence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) -> (node, rank) after ``n_iters`` synchronous
    iterations of rank = (1-d)/N + d * Σ rank(in)/outdeg(in).

    Dangling nodes (no out-edges) keep their rank out of circulation
    (the simple variant — no dangling-mass redistribution — mirrored
    exactly by the oracle)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # empty edge list -> empty, correctly-typed result (not a
        # ZeroDivisionError from 1/n)
        return nodes.withColumn("rank", F.lit(0.0)).select("node", "rank")
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(F.count(F.lit(1)).alias("outdeg"))
    # keep (node, outdeg, rank) co-partitioned across iterations
    state = nodes.join(outdeg, "node", "left").select(
        "node", "outdeg", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()

    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst")).localCheckpoint()
    for _ in range(n_iters):
        contrib = (
            e.join(state.filter(F.col("outdeg").isNotNull()), "node")
            .select(F.col("_dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        state = (
            state.join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return state.select("node", "rank")


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame | Sequence,
    n_iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank: the teleport term restarts at the SOURCE
    set instead of uniformly — rank(v) = (1-d)*restart(v) + d * inflow,
    restart = 1/|S| on sources, 0 elsewhere.  The result measures
    proximity to the source set (Jeh & Widom, WWW'03) — on a KG this
    ranks candidate entities by graph context ("which IRIs sit close to
    the other entities this conversation linked?").

    Same fixed-iteration, same-recurrence-on-both-engines discipline as
    ``pagerank``; dangling mass leaks (simple variant, mirrored by the
    oracle).  Sources absent from the edge list still hold restart mass
    (they join the node set).  With sources = ALL nodes this reduces
    exactly to ``pagerank`` (uniform restart) — pinned by test."""
    if isinstance(sources, DataFrame):
        if len(sources.columns) != 1:
            raise ValueError("sources DataFrame must have exactly one column")
        srcs = sources.select(F.col(sources.columns[0]).alias("node")).distinct()
    else:
        spark = edges.sparkSession
        srcs = spark.createDataFrame(
            [(s,) for s in sources],
            schema=edges.select(F.col(src).alias("node")).schema,
        ).distinct()
    srcs = srcs.localCheckpoint()
    ns = srcs.count()
    if ns == 0:
        raise ValueError("personalized_pagerank needs at least one source node")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .union(srcs)
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    restart = F.when(F.col("_is_src"), F.lit(1.0 / ns)).otherwise(F.lit(0.0))
    state = (
        nodes.join(outdeg, "node", "left")
        .join(srcs.withColumn("_is_src", F.lit(True)), "node", "left")
        .select(
            "node",
            "outdeg",
            restart.alias("restart"),
            restart.alias("rank"),
        )
        .localCheckpoint()
    )
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst")).localCheckpoint()
    for _ in range(n_iters):
        contrib = (
            e.join(state.filter(F.col("outdeg").isNotNull()), "node")
            .select(F.col("_dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        state = (
            state.join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                "restart",
                (
                    F.lit(1.0 - damping) * F.col("restart")
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return state.select("node", "rank")


def pagerank_weighted(
    edges: DataFrame,
    n_iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Weighted PageRank (L129): rank flows in proportion to edge
    weight — rank = (1-d)/N + d · Σ_in rank(u) · w(u,v) / W_out(u),
    the natural centrality over PMI/co-occurrence/confidence-weighted
    KG edges (compose with `graph/cooccur.py`: salience = weighted
    rank over association strength, not raw link counts).

    Same discipline as :func:`pagerank`: synchronous iterations, one
    join + one combinable sum per round, localCheckpoint-flattened
    lineage, dangling nodes keep their mass out of circulation, and
    the oracle unrolls the identical recurrence (weights enter as
    fixed per-edge ratios, so the float story is unchanged —
    floor-1e6 grid).

    Weights must be strictly positive and non-null (zero-weight edges
    are a modeling error, not a 0-contribution edge — drop them
    upstream); refused loudly with a bounded sample.
    """
    bad = (
        edges.filter(F.col(weight).isNull() | (F.col(weight) <= 0))
        .limit(5)
        .collect()
    )
    if bad:
        raise ValueError(
            f"pagerank_weighted: non-positive/NULL weights on {len(bad)}+ edges "
            f"(sample src/dst: {[(r[src], r[dst]) for r in bad]})"
        )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0)).select("node", "rank")
    outw = edges.groupBy(F.col(src).alias("node")).agg(
        F.sum(F.col(weight).cast("double")).alias("outw")
    )
    state = nodes.join(outw, "node", "left").select(
        "node", "outw", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()

    e = edges.select(
        F.col(src).alias("node"),
        F.col(dst).alias("_dst"),
        F.col(weight).cast("double").alias("_w"),
    ).localCheckpoint()
    for _ in range(n_iters):
        contrib = (
            e.join(state.filter(F.col("outw").isNotNull()), "node")
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") * F.col("_w") / F.col("outw")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        state = (
            state.join(contrib, "node", "left")
            .select(
                "node",
                "outw",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return state.select("node", "rank")


def katz_centrality(
    edges: DataFrame,
    n_iters: int = 8,
    alpha: str = "0.05",
    beta: str = "1",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Katz centrality (L409): ``(node, katz)`` — attenuated path
    counting (Katz 1953), the influence measure completing the
    centrality family (PageRank L28 normalizes by out-degree — a hub
    donating to millions passes little to each; Katz counts ALL
    inbound walks damped by length, so prolific sources still
    matter; HITS L63 is the bipartite view):

        x ← β·1 + α·Aᵀx        (synchronous, x₀ = β·1)

    After K fixed iterations this IS the truncated Katz sum
    Σ_{k≤K} αᵏ·(Aᵀ)ᵏ·β1 — well-defined for ANY α (for convergence to
    the classical fixpoint the caller keeps α < 1/λ_max; the
    truncated-sum semantics are the contract, documented — no float
    stopping rule, the L28 discipline).  Parallel edges each
    contribute a walk (multigraph convention); self-loops allowed.

    Unlike L28/L63 (float inflows, floor-1e6-gridded contract), the
    whole recurrence runs in EXACT DECIMAL: α and β are decimal
    STRINGS, each iteration deepens the true scale by α's scale, and
    the state rides a DECIMAL(20,16) container — so the inflow sums
    are ORDER-FREE and the result is bit-identical ungridded.  That
    bounds the contract loudly: n_iters · scale(α) ≤ 16 and node
    values < 10⁴ (ANSI overflow is loud, not silent).  ``katz`` is
    emitted as the one terminal double cast.

    Scale shape: identical to L28 — one keyed join + one combinable
    sum per iteration over co-partitioned state.

    No reference counterpart; graph analytics per SURVEY §2.11."""
    from decimal import Decimal

    if n_iters < 1:
        raise ValueError("katz_centrality: n_iters must be >= 1")
    a_dec = Decimal(alpha)
    a_scale = max(0, -a_dec.as_tuple().exponent)
    if n_iters * a_scale > 16:
        raise ValueError(
            "katz_centrality: n_iters * scale(alpha) ="
            f" {n_iters * a_scale} > 16 — the exact-decimal "
            "recurrence would overflow its scale; coarsen alpha or "
            "lower n_iters"
        )
    cont = "decimal(20,16)"
    a_lit = F.lit(str(a_dec)).cast(f"decimal({max(a_scale + 2, 3)},{max(a_scale, 1)})")
    b_lit = F.lit(str(Decimal(beta))).cast(cont)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = edges.select(
        F.col(src).alias("_u"), F.col(dst).alias("node")
    ).localCheckpoint()
    state = nodes.select("node", b_lit.alias("katz"))
    for _ in range(n_iters):
        inflow = (
            e.join(
                state.select(
                    F.col("node").alias("_u"), F.col("katz").alias("_k")
                ),
                "_u",
            )
            .groupBy("node")
            .agg(F.sum("_k").alias("_inflow"))
        )
        state = nodes.join(inflow, "node", "left").select(
            "node",
            (
                b_lit
                + a_lit
                * F.coalesce(F.col("_inflow"), F.lit(0).cast(cont))
            )
            .cast(cont)
            .alias("katz"),
        )
    return state.select("node", F.col("katz").cast("double").alias("katz"))
