"""Deterministic weighted sampling without replacement (L115):
Efraimidis–Spirakis A-ES ("Weighted random sampling with a reservoir",
IPL 2006) with the randomness replaced by the repo's shared
cross-engine Knuth hash — the sample is a pure function of the key
set, so it is reproducible at any parallelism, verifiable by any SQL
engine, and auditable row-by-row.

A-ES: each row draws u ~ U(0,1) and gets priority p = -ln(u)/w; the k
SMALLEST priorities form a weighted sample without replacement (the
exponential race: p is an Exp(w) variate, and the minimum of
exponentials lands on item i with probability w_i/Σw).  Here
u = (knuth_hash(key) + 0.5) / 2^32 — mid-bucket so u is never 0 or 1,
and the SAME hash definition as stratified/mixture sampling
(`ops/textprep.knuth_hash`), keeping one auditable randomness source
across the sampling family.

Selection shape (the 100 TB part):

* grouped — one window ``row_number`` per group key: single keyed
  exchange, no driver involvement, group count unbounded;
* global (``group_cols=None``) — ``orderBy(priority).limit(k)``:
  Spark plans TakeOrderedAndProject (per-partition top-k heaps + one
  k-row merge), never a full sort.

Weights must be strictly positive; NULL/non-positive weights are a
rule violation surfaced LOUDLY (raise_error in the plan), not silently
dropped — a silent drop would bias the sample.

Cross-engine caveat (same stance as the PMI log-tree, L50): priorities
pass through ``ln``, so DuckDB-vs-JVM agreement relies on both libms
rounding ln within 1 ulp of each other at the same inputs; the oracle
computes the identical formula and the deterministic tie-break
(priority, key) pins the order everywhere else.  On the frozen test
tables this is bit-stable; at a rank boundary closer than ~1e-15
relative, an oracle flip would indicate libm divergence, not a
sampling bug.

No reference counterpart; sampling-for-training-mixtures is SURVEY
§2.11 territory (extends L16 stratified / L36 mixture to weighted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textprep import knuth_hash
from .validate import validation_enabled


def sample_priority(key_col: str, weight_col: str):
    """The A-ES priority column: -ln((knuth_hash(key)+0.5)/2^32) / w,
    with a loud guard on non-positive or NULL weights."""
    u = (knuth_hash(key_col) + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    guarded_w = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.concat(
                F.lit(f"weighted_sample: non-positive or NULL weight in {weight_col!r} at key "),
                F.col(key_col).cast("string"),
            )
        ).cast("double"),
    ).otherwise(w)
    return -F.log(u) / guarded_w


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the ``k`` rows with smallest A-ES priority — per group if
    ``group_cols`` is given, else globally — a weighted sample without
    replacement (inclusion odds proportional to weight).  Input columns
    pass through unchanged; deterministic for a fixed key set."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    for c in [key_col, weight_col] + list(group_cols or []):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    pri = sample_priority(key_col, weight_col)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            pri.asc(), F.col(key_col).asc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    # global: TakeOrderedAndProject — per-partition heaps, k-row merge
    return (
        df.withColumn("__pri", pri)
        .orderBy(F.col("__pri").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__pri")
    )


def ht_estimator(
    df: DataFrame,
    by: list[str],
    value_col: str,
    prob_col: str,
    scale: int = 2,
    max_probs: int = 10_000,
) -> DataFrame:
    """``(by..., n, total_ht, var_ht)`` — the Horvitz-Thompson
    estimator (L323): the unbiased population total from a sample
    with KNOWN inclusion probabilities π — the estimator that makes
    deterministic weighted sampling (the L120-era A-ES machinery)
    actually usable for totals, with the Poisson-sampling variance:

        T̂ = Σ yᵢ/πᵢ,   V̂ = Σ (1−πᵢ)·(yᵢ/πᵢ)²

    EXACTNESS: per-row y/π float sums would be order-sensitive, so
    the op requires the DESIGN property that π takes boundedly many
    distinct values (stratified/fixed-rate designs — refused beyond
    ``max_probs`` distinct π per group): Σy and Σy² are exact
    decimals PER π-CELL, and the estimator folds the bounded sorted
    cell list with one fixed tree per cell.  π outside (0, 1]
    refused.

    Scale shape: one combinable (keys, π) cell agg + one bounded
    fold — one scan of 100 TB.

    No reference counterpart; survey-sampling analytics per SURVEY
    §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(value_col).isNotNull() & F.col(prob_col).isNotNull()
    )
    if validation_enabled():
        n_bad = flt.filter(
            (F.col(prob_col) <= 0) | (F.col(prob_col) > 1)
        ).count()
        if n_bad:
            raise ValueError(
                f"ht_estimator: {n_bad} inclusion prob(s) outside (0, 1]"
            )
    yd = F.col(value_col).cast(dec)
    cells = flt.groupBy(
        *by, F.col(prob_col).cast("double").alias("_pi")
    ).agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum(yd).alias("_s"),
        F.sum(yd * yd).alias("_q"),
    )
    sizes = cells.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_probs).count()
        if over:
            raise ValueError(
                f"ht_estimator: a group exceeds max_probs={max_probs} "
                "distinct inclusion probabilities — HT needs a bounded "
                "design grid for order-pinned folds"
            )
    packed = cells.groupBy(*by).agg(
        F.sum("_c").alias("n"),
        F.sort_array(
            F.collect_list(F.struct("_pi", "_s", "_q"))
        ).alias("_lv"),
    )
    total = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a + e["_s"].cast("double") / e["_pi"],
    )
    var = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a
        + (F.lit(1.0) - e["_pi"])
        * e["_q"].cast("double")
        / (e["_pi"] * e["_pi"]),
    )
    return packed.select(
        *by,
        "n",
        total.alias("total_ht"),
        var.alias("var_ht"),
    )


def p_chart(
    df: DataFrame,
    by: list[str],
    subgroup_col: str,
    defect_col: str,
) -> DataFrame:
    """``(by..., subgroup, n_i, x_i, p_i, p_bar, ucl, lcl,
    out_of_control)`` — the p-chart (L324, Shewhart attribute
    control chart): is a defect/error RATE in statistical control
    across subgroups (days, batches, hosts), with per-subgroup 3σ
    binomial limits that widen for small subgroups:

        p̄ = Σx/Σn,   UCL/LCL_i = p̄ ± 3·sqrt(p̄(1−p̄)/nᵢ)
        (LCL clamps at 0, UCL at 1)

    Subgroup counts are exact integers from one combinable agg; the
    centre line joins back broadcast (fit-small/apply-wide) and every
    limit is one fixed tree.  Degenerate centre (p̄ = 0 or 1) → NULL
    limits (no binomial spread to control against).

    Scale shape: one combinable (keys, subgroup) agg + one broadcast
    join — one scan of 100 TB.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(subgroup_col).isNotNull() & F.col(defect_col).isNotNull()
    )
    dv = F.col(defect_col).cast("int")
    cells = flt.groupBy(
        *by, F.col(subgroup_col).alias("subgroup")
    ).agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum(dv).alias("x_i"),
    )
    centre = cells.groupBy(*by).agg(
        F.sum("x_i").alias("_tx"), F.sum("n_i").alias("_tn")
    )
    joined = (
        cells.join(F.broadcast(centre), by)
        if by
        else cells.crossJoin(F.broadcast(centre))
    )
    pbar = F.col("_tx").cast("double") / F.col("_tn").cast("double")
    ni = F.col("n_i").cast("double")
    spread = F.lit(3.0) * F.sqrt(
        pbar * (F.lit(1.0) - pbar) / ni
    )
    p_i = F.col("x_i").cast("double") / ni
    ok = (pbar > 0.0) & (pbar < 1.0)
    ucl = F.least(F.lit(1.0), pbar + spread)
    lcl = F.greatest(F.lit(0.0), pbar - spread)
    return joined.select(
        *by,
        "subgroup",
        "n_i",
        "x_i",
        p_i.alias("p_i"),
        pbar.alias("p_bar"),
        F.when(ok, ucl).alias("ucl"),
        F.when(ok, lcl).alias("lcl"),
        F.when(ok, (p_i > ucl) | (p_i < lcl)).alias(
            "out_of_control"
        ),
    )
