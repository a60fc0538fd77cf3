"""Empirical Markov chains over keyed event sequences (L132): the
per-sequence transition matrix and its stationary distribution — the
"where do user journeys settle" analytic (session flow modeling,
next-event prediction baselines, absorbing-state detection over agent
tool-call traces).

Two operators:

* ``markov_transitions`` — per-sequence consecutive-pair mint (one lag
  window), global (src, dst) counts, and row-normalized probabilities
  as exact count ratios.  One keyed exchange for the window + one
  map-side-combinable groupBy; the result is state-space-sized (tiny)
  no matter how large the input.
* ``stationary_distribution`` — fixed-iteration power method
  x_{t+1} = Pᵀ x_t from the uniform start, the pagerank discipline
  (graph/pagerank.py): deterministic iteration count, localCheckpoint
  lineage flattening, no float-tolerance stopping rule — so the DuckDB
  oracle can run the identical unrolled recurrence.

Chain-closure guard: the power method assumes a row-stochastic matrix
over a closed state set.  States that appear only as a transition
TARGET (never as a source) would silently leak probability mass every
iteration, so ``stationary_distribution`` refuses them loudly — the
caller either feeds a closed chain or drops the absorbing tail
explicitly.  (Observed-data chains over large windows are closed in
practice: every event type both precedes and follows something.)

Float discipline: transition probabilities are single IEEE divisions of
exact integer counts (bit-identical across engines); iterated sums
compare on the floor-1e6 grid, the L129 convention.

Scale: the input is scanned once (window + count); every iteration
thereafter joins two state-space-sized tables — at 100 TB of events
with a 1e3-state alphabet, the iterations are effectively free and the
single input pass dominates.

No reference counterpart; sequence analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def markov_transitions(
    df: DataFrame,
    key: str,
    state: str,
    order_by: str | list[str],
) -> DataFrame:
    """``(src, dst, n, prob)`` — empirical first-order transition
    probabilities between consecutive ``state`` values within each
    ``key`` sequence, ordered by ``order_by`` (pass a unique (or
    tie-broken) ordering: ties under ``lead`` would make the mint
    nondeterministic).

    ``prob`` = n / Σ_dst n — each src row normalized to 1 by exact
    integer ratio.

    NULL states break the chain (mint-then-drop): a pair touching a
    NULL on either side is discarded and no pair bridges the gap —
    an unobserved state is not evidence of a transition."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.select(
            F.col(state).alias("src"),
            F.lead(F.col(state)).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & F.col("src").isNotNull())
    )
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    row_total = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        (F.col("n") / F.sum("n").over(row_total)).alias("prob"),
    )


def stationary_distribution(
    transitions: DataFrame,
    n_iters: int = 12,
    src: str = "src",
    dst: str = "dst",
    prob: str = "prob",
) -> DataFrame:
    """``(state, pi)`` after ``n_iters`` synchronous power iterations of
    pi' = Pᵀ pi from the uniform start over the source-state set.

    Raises ``ValueError`` if any destination state never appears as a
    source (an open chain — mass would leak; see module docstring) or
    if any row's probabilities do not sum to 1 within 1e-9 (not a
    stochastic matrix)."""
    t = transitions.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(prob).alias("prob")
    ).localCheckpoint()

    dangling = (
        t.select(F.col("dst").alias("state"))
        .subtract(t.select(F.col("src").alias("state")))
        .limit(20)
        .collect()
    )
    if dangling:
        names = sorted(r["state"] for r in dangling)
        raise ValueError(
            "open chain: states appear as transition targets but never as "
            f"sources (showing <=20): {names} — drop the absorbing tail or "
            "close the chain before calling stationary_distribution"
        )
    if validation_enabled():
        bad_rows = (
            t.groupBy("src")
            .agg(F.sum("prob").alias("s"))
            .filter(F.abs(F.col("s") - 1.0) > 1e-9)
            .limit(5)
            .collect()
        )
        if bad_rows:
            raise ValueError(
                "not row-stochastic: "
                + ", ".join(f"{r['src']}: sum={r['s']!r}" for r in bad_rows)
            )

    states = t.select(F.col("src").alias("state")).distinct().localCheckpoint()
    n = states.count()
    if n == 0:
        return states.withColumn("pi", F.lit(0.0))
    x = states.select("state", F.lit(1.0 / n).alias("pi")).localCheckpoint()
    for _ in range(n_iters):
        x = (
            t.join(x.withColumnRenamed("state", "src"), "src")
            .select(F.col("dst").alias("state"), (F.col("pi") * F.col("prob")).alias("m"))
            .groupBy("state")
            .agg(F.sum("m").alias("pi"))
            .localCheckpoint()
        )
    return x


def markov_entropy_rate(
    df: DataFrame,
    key: str,
    state: str,
    order_by: str | list[str],
) -> DataFrame:
    """One row ``(n_pairs, n_states, h_rate, h_norm)`` — the
    empirical entropy rate of the first-order chain (L292): how
    PREDICTABLE is the next state given the current one —
    H(X_{t+1}|X_t) under the empirical joint, i.e. the per-step
    information content of session flows / tool-call sequences (the
    sequence-level companion to the per-symbol Shannon panel L257):

        H = −Σ_{ij} (n_ij/N) · ln(n_ij / n_i·),
        h_norm = H / ln(k)   (k = distinct source states; 0 = fully
                              deterministic chain, 1 = uniform)

    Pair counts come from the L153 transition mint (NULL states break
    the chain; ties in ``order_by`` are the caller's contract); every
    count is an exact integer and each term is a fixed tree folded
    over the BOUNDED sorted (src, dst) cell list (the L140/L257
    discipline) — no stationary-distribution iteration, no float
    accumulation across rows.  k < 2 → NULL h_norm; no pairs → NULL
    h_rate.

    Scale shape: one keyed window pass + one combinable cell count +
    one bounded fold — one scan of 100 TB.

    No reference counterpart; sequence analytics per SURVEY §2.11.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    pairs = df.select(
        F.col(state).alias("src"),
        F.lead(F.col(state)).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull() & F.col("src").isNotNull())
    cells = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("c")
    )
    margins = cells.groupBy("src").agg(F.sum("c").alias("ni"))
    joined = cells.join(margins, "src")
    packed = joined.groupBy().agg(
        F.sum("c").alias("n_pairs"),
        F.countDistinct("src").alias("n_states"),
        F.sort_array(
            F.collect_list(F.struct("src", "dst", "c", "ni"))
        ).alias("_lv"),
    )
    nd = F.col("n_pairs").cast("double")
    h = -F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a
        + (e["c"].cast("double") / nd)
        * F.log(e["c"].cast("double") / e["ni"].cast("double")),
    )
    kd = F.col("n_states").cast("double")
    return packed.select(
        "n_pairs",
        "n_states",
        F.when(F.col("n_pairs") > 0, h).alias("h_rate"),
        F.when(
            (F.col("n_pairs") > 0) & (F.col("n_states") >= 2),
            h / F.log(kd),
        ).alias("h_norm"),
    )
