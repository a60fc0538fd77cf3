"""HyperBall (L111): neighborhood-function and harmonic-centrality
estimation at graph scale via mergeable HLL sketch COLUMNS — Boldi &
Vigna, "In-Core Computation of Geometric Centralities with HyperBall"
(WSDM 2013 / arXiv:1308.2144), re-expressed as DataFrame aggregation.

Exact all-pairs distances on a web-scale graph are quadratic; HyperBall
replaces each node's ball B(v, t) = {u : d(v, u) <= t} with an HLL
sketch and grows it by the rule

    B(v, t) = {v}  ∪  ⋃_{(v,u) ∈ E} B(u, t-1)

Because HLL union is register-wise max (associative, commutative,
IDEMPOTENT — Agarwal et al. PODS'12, same foundation as ops/sketches),
the union over in-ball duplicates costs nothing and each radius step is
ONE join + ONE map-side-combinable ``hll_union_agg``:

    balls_t = (edges ⋈ balls_{t-1} on dst → keyed by src) ∪ balls_{t-1}
              groupBy(node) → hll_union_agg(sketch)

Per-node state is a few KB regardless of ball size, rounds = radius —
the per-iteration shape of PageRank with sketch state instead of rank.
``localCheckpoint`` per round keeps lineage flat (the closure/PageRank
discipline).  From the per-radius ball-size estimates |B(v,t)| the
classic derived quantities fall out arithmetically:

* neighborhood function  N(t) = Σ_v |B(v,t)|;
* harmonic centrality    H(v) ≈ Σ_t (|B(v,t)| - |B(v,t-1)|) / t
  (each newly reached node enters at its exact distance t, so the
  telescoping sum is Σ_u 1/d(v,u) up to sketch error).

Estimates are approximate at scale (~2% at lg_k=12) but EXACT in the
datasketches sparse regime (ball sizes up to a few hundred at the
default lg_k) — the contract query pins integer equality against a
recursive-CTE BFS oracle at test scale and publishes the estimate
rounded; tests also pin the sparse-regime exactness boundary.

Determinism: for a fixed plan on fixed input the sketches and
estimates are deterministic; across merge topologies the estimate may
move within the error bound (same caveat as ops/sketches — pinned
there, inherited here).

No reference counterpart; this is the scale path for "how central is
this entity" questions the reference answers only implicitly via
per-class mention counts (`app/main.py` stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_MAX_RADIUS = 64


def hyperball(edges: DataFrame, max_t: int, lg_k: int = 12) -> DataFrame:
    """Ball-size estimates for every node and radius: ``(node, t,
    ball_est)`` with t in 0..max_t and ball_est = estimated
    |{u : d(node, u) <= t}| along OUT-edges (including node itself).

    ``edges`` must have ``src``/``dst`` string columns; self-loops and
    duplicate edges are harmless (idempotent union).
    """
    if not 1 <= max_t <= _MAX_RADIUS:
        raise ValueError(f"max_t must be in [1, {_MAX_RADIUS}], got {max_t}")
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    for c in ("src", "dst"):
        if c not in edges.columns:
            raise ValueError(f"edges must have column {c!r}")

    e = edges.select("src", "dst").filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # radius 0: each ball is the node itself
    balls = nodes.groupBy("node").agg(
        F.expr(f"hll_sketch_agg(node, {lg_k})").alias("sketch")
    ).localCheckpoint(eager=True)

    est = F.expr("round(hll_sketch_estimate(sketch))").cast("long").alias("ball_est")
    out = balls.select("node", F.lit(0).alias("t"), est)

    for t in range(1, max_t + 1):
        contrib = e.join(balls, e.dst == balls.node).select(
            F.col("src").alias("node"), "sketch"
        )
        balls = (
            contrib.unionByName(balls)
            .groupBy("node")
            .agg(F.expr("hll_union_agg(sketch)").alias("sketch"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(balls.select("node", F.lit(t).alias("t"), est))
    return out


def harmonic_centrality(edges: DataFrame, max_t: int, lg_k: int = 12) -> DataFrame:
    """Truncated harmonic centrality per node from the HyperBall
    radius sweep: ``(node, harmonic)`` with

        harmonic = Σ_{t=1..max_t} (|B(t)| - |B(t-1)|) / t

    — each node reached at distance t contributes 1/t (nodes beyond
    ``max_t`` hops contribute 0; pick max_t >= diameter for the exact
    definition).  Exact up to sketch error, and exactly Σ 1/d in the
    sparse regime."""
    balls = hyperball(edges, max_t, lg_k=lg_k)
    w = (
        F.when(F.col("t") == 0, F.lit(0.0))
        .otherwise(F.col("ball_est") / F.col("t"))
    )
    prev_w = (
        F.when(F.col("t") == max_t, F.lit(0.0))
        .otherwise(F.col("ball_est") / (F.col("t") + 1))
    )
    # Σ (B_t - B_{t-1})/t  =  Σ_t B_t/t - Σ_t B_{t-1}/t
    #                      =  Σ_t B_t * (1/t - 1/(t+1))  + B_max/max_t-ish
    # — folded per row: each radius-t row contributes B_t/t - B_t/(t+1),
    # except t=0 (no 1/t term) and t=max_t (no outgoing term beyond).
    return (
        balls.select("node", (w - prev_w).alias("c"))
        .groupBy("node")
        .agg(F.round(F.sum("c"), 6).alias("harmonic"))
    )


def neighborhood_function(
    edges: DataFrame, max_t: int, lg_k: int = 12
) -> DataFrame:
    """HyperANF's global distance profile (Boldi-Vigna-Rosa WWW'11):
    ``(t, n_pairs, frac)`` where n_pairs = N(t) = Σ_v |B(v,t)| counts
    reachable (source, dest) pairs within t hops and frac = N(t) /
    N(max_t).  One combinable sum over the radius sweep — the graph's
    distance distribution for the price of ``hyperball``."""
    balls = hyperball(edges, max_t, lg_k=lg_k)
    n = balls.groupBy("t").agg(F.sum("ball_est").alias("n_pairs"))
    total = Window.partitionBy()
    return n.select(
        "t",
        "n_pairs",
        F.round(F.col("n_pairs") / F.max("n_pairs").over(total), 6).alias("frac"),
    )


def effective_diameter(
    edges: DataFrame, max_t: int, q: float = 0.9, lg_k: int = 12
) -> DataFrame:
    """One-row ``(effective_diameter double)``: the smallest t where
    N(t) >= q·N(max_t), linearly interpolated between the straddling
    radii (the HyperANF convention).  ``max_t`` must exceed the true
    diameter for the textbook definition (N(max_t) = N(∞)); with a
    smaller horizon this is the q-quantile of the TRUNCATED profile
    (documented, same stance as harmonic_centrality truncation)."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    nf = neighborhood_function(edges, max_t, lg_k=lg_k)
    w = Window.partitionBy()
    target = F.lit(q) * F.max("n_pairs").over(w)
    lagw = Window.partitionBy().orderBy("t")
    prev = F.lag("n_pairs").over(lagw)
    # first t where N(t) >= target; interpolate inside the (t-1, t] step
    hit = (
        nf.select("t", "n_pairs", target.alias("target"), prev.alias("prev_pairs"))
        .filter(F.col("n_pairs") >= F.col("target"))
        .orderBy("t")
        .limit(1)
    )
    interp = F.when(
        F.col("prev_pairs").isNull() | (F.col("n_pairs") == F.col("prev_pairs")),
        F.col("t").cast("double"),
    ).otherwise(
        F.col("t") - 1
        + (F.col("target") - F.col("prev_pairs"))
        / (F.col("n_pairs") - F.col("prev_pairs"))
    )
    return hit.select(F.round(interp, 6).alias("effective_diameter"))
