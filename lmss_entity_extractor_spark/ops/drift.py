"""Distribution-drift detection (L131): Population Stability Index
between a REFERENCE table and a CURRENT table — the ML-ops monitor
("did this column's distribution move since training") as two
aggregates and a fixed-expression score.

    PSI = Σ_buckets (p_cur − p_ref) · ln(p_cur / p_ref)

* numeric columns — buckets come from the L124 equi-depth fit ON THE
  REFERENCE (frozen boundaries applied to both sides: drift must be
  measured on the reference's own grid, not a per-side re-fit that
  hides the movement);
* categorical columns — buckets are the observed category union.

Empty buckets are Laplace-floored (configurable ``epsilon`` fraction)
before the log — the standard finite-PSI convention, documented
rather than silently clamped.  Conventional reading: < 0.1 stable,
0.1–0.25 moderate shift, > 0.25 major shift; published as ``verdict``
next to the number.

Float discipline (the L50 stance): counts are exact integers; the
score is a FIXED expression tree per bucket folded by a sum over
bucket index order… which Spark cannot pin across partitions — so the
contract query publishes the PER-BUCKET terms on the half-up 1e-6
grid (exact comparison) plus the total rounded to 4 decimals (the
drift decision needs one digit; 1-ulp summation wiggle is 12 orders
of magnitude below the verdict thresholds).

Scale: one combinable count per side (map-side combinable), a
buckets-sized join, a buckets-sized score — the 100 TB tables are
each scanned once.

No reference counterpart; pipeline monitoring per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .binning import bin_expr, fit_equidepth_bins
from .validate import validation_enabled


def _bucket_shares(df: DataFrame, bucket, name: str) -> DataFrame:
    counts = (
        df.select(bucket.alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(f"n_{name}"))
    )
    return counts


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    categorical: bool = False,
    epsilon: float = 1e-4,
) -> DataFrame:
    """Per-bucket PSI terms + the total: ``(bucket, n_ref, n_cur,
    p_ref, p_cur, term, psi_total, verdict)`` — bucket is the bin id
    (numeric) or the category value cast to string (categorical)."""
    if col not in ref.columns or col not in cur.columns:
        raise ValueError(f"column {col!r} must exist in both tables")
    if not 0 < epsilon < 0.1:
        raise ValueError(f"epsilon must be in (0, 0.1), got {epsilon}")

    if categorical:
        bucket = F.col(col).cast("string")
    else:
        bounds = fit_equidepth_bins(ref, col, n_bins)
        bucket = bin_expr(F.col(col), bounds).cast("string")

    r = _bucket_shares(ref, bucket, "ref")
    c = _bucket_shares(cur, bucket, "cur")
    j = r.join(c, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = j.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    w = j.crossJoin(F.broadcast(tot))
    p_ref = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(epsilon))
    p_cur = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(epsilon))
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    scored = w.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        (F.floor(term * 1e6 + F.lit(0.5)) / 1e6).alias("term"),
    )
    total = F.round(F.sum("term").over(Window.partitionBy()), 4)
    verdict = (
        F.when(total < 0.1, "stable")
        .when(total < 0.25, "moderate_shift")
        .otherwise("major_shift")
    )
    return scored.select(
        "bucket",
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        "term",
        total.alias("psi_total"),
        verdict.alias("verdict"),
    )


def term_burst(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    term_col: str,
    split_ts: str,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Emerging-term burst screen (L420): ``(by..., term, n_recent,
    n_baseline, rate_recent, rate_baseline, lift, log2_fc, rank)`` —
    WHICH terms are surging: the term-level member of the drift
    family (PSI L131 and JSD L153 give one corpus-drift number; the
    burst screen names the terms driving it — topic emergence,
    prompt-injection phrases, spam campaigns):

        rate = (c + ½)/(N + ½)   per window (Haldane-style smoothing
                                  — dyadic, exact in doubles, keeps
                                  never-seen-before terms finite)
        lift = rate_recent / rate_baseline,  log2_fc = log2(lift)

    The split point is a timestamp STRING pinned into the plan (no
    wall-clock "now" — deterministic forever); occurrence and window
    totals are exact integers; lift is one fixed tree per term, so
    ranking by (lift DESC, term ASC) cannot knife-edge (identical
    doubles both engines; log2 is a per-ROW output transcendental —
    ulps absorbed by the 9-digit compare, never summed).  Terms
    below ``min_count`` total occurrences are dropped (exact integer
    filter); NULL terms/timestamps refused.

    Scale shape: one combinable (keys, term, window) groupBy + one
    tiny totals join + one bounded top-k window.

    No reference counterpart; drift analytics per SURVEY §2.11."""
    if top_k < 1 or min_count < 1:
        raise ValueError(
            "term_burst: top_k and min_count must be >= 1"
        )
    if validation_enabled():
        n_null = df.filter(
            F.col(ts_col).isNull() | F.col(term_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"term_burst: {n_null} NULL term/ts row(s)")
    recent = F.col(ts_col).cast("timestamp") >= F.lit(split_ts).cast(
        "timestamp"
    )
    cells = df.groupBy(*by, F.col(term_col).alias("term")).agg(
        F.sum(F.when(recent, 1).otherwise(0)).alias("n_recent"),
        F.sum(F.when(~recent, 1).otherwise(0)).alias("n_baseline"),
    )
    totals = cells.groupBy(*by).agg(
        F.sum("n_recent").alias("_nr"),
        F.sum("n_baseline").alias("_nb"),
    )
    joined = (
        cells.join(totals, list(by))
        if by
        else cells.crossJoin(F.broadcast(totals))
    )
    rr = (F.col("n_recent").cast("double") + F.lit(0.5)) / (
        F.col("_nr").cast("double") + F.lit(0.5)
    )
    rb = (F.col("n_baseline").cast("double") + F.lit(0.5)) / (
        F.col("_nb").cast("double") + F.lit(0.5)
    )
    lift = rr / rb
    flt = joined.filter(
        (F.col("n_recent") + F.col("n_baseline")) >= min_count
    )
    scored = flt.select(
        *by,
        "term",
        "n_recent",
        "n_baseline",
        rr.alias("rate_recent"),
        rb.alias("rate_baseline"),
        lift.alias("lift"),
        F.log2(lift).alias("log2_fc"),
    )
    w = Window.partitionBy(*by).orderBy(
        F.col("lift").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
