"""Extreme-value analytics (L309/L310): Gumbel block-maxima fitting
with return levels — "what daily load should we expect once per 100
days" — and the Hill tail-index estimator — "how heavy is this
distribution's tail" — the two capacity-planning questions that means
and quantiles of the BULK cannot answer.

L309 — Gumbel method-of-moments fit (the classic EVI-0 case): from
exact decimal sufficient statistics (n, Σx, Σx²),

    β = s·√6/π,   μ = x̄ − γ·β      (γ = Euler-Mascheroni)
    level(T) = μ − β·ln(−ln(1 − 1/T))

one fixed IEEE tree per requested return period T (a literal list).
MoM is deterministic where ML is iterative — the honest trade
documented here: MoM is less efficient but exactly reproducible.

L310 — Hill estimator over the top k order statistics:

    H = (1/k)·Σ_{i=1..k} ln(x₍ᵢ₎ / x₍ₖ₊₁₎),   α̂ = 1/H

(x₍₁₎ ≥ x₍₂₎ ≥ …).  The top-(k+1) set comes from one descending
row_number window; the ln sum is an order-pinned fold over the
sorted bounded top list.  Nonpositive values inside the top set are
REFUSED (the tail model is for positive heavy tails); groups with
fewer than k+1 rows emit NULL.

Scale shape: L309 = ONE combinable aggregation.  L310 = one keyed
window pass (top-k filter) + one bounded fold — the fact table is
scanned once; only k+1 rows per key survive the filter.

No reference counterpart; capacity-planning analytics per SURVEY
§2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

_EULER = 0.5772156649015329
_SQRT6_OVER_PI = 0.7796968012336793  # sqrt(6)/pi to double precision


def gumbel_fit(
    df: DataFrame,
    by: list[str],
    value_col: str,
    return_periods: tuple = (10, 100),
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, mu, beta, t_return, level)`` — one row per
    requested return period; see module docstring."""
    if any(int(t) < 2 for t in return_periods) or not return_periods:
        raise ValueError(
            "gumbel_fit: return periods must all be >= 2"
        )
    dec = f"decimal(18,{scale})"
    xd = F.col(value_col).cast(dec)
    agg = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("_s"),
            F.sum(xd * xd).alias("_q"),
        )
    )
    nd = F.col("n").cast("double")
    sd_ = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    mean = sd_ / nd
    var = (nd * qd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    beta = F.sqrt(var) * F.lit(_SQRT6_OVER_PI)
    mu = mean - F.lit(_EULER) * beta
    s1 = agg.select(
        *by,
        "n",
        F.when((F.col("n") >= 2) & (var > 0.0), mu).alias("mu"),
        F.when((F.col("n") >= 2) & (var > 0.0), beta).alias("beta"),
    )
    wide = s1.select(
        *by,
        "n",
        "mu",
        "beta",
        F.explode(
            F.array(*[F.lit(int(t)) for t in return_periods])
        ).alias("t_return"),
    )
    td = F.col("t_return").cast("double")
    level = F.col("mu") - F.col("beta") * F.log(
        -F.log(F.lit(1.0) - F.lit(1.0) / td)
    )
    return wide.select(
        *by, "n", "mu", "beta", "t_return", level.alias("level")
    )


def hill_estimator(
    df: DataFrame,
    by: list[str],
    value_col: str,
    k: int = 50,
) -> DataFrame:
    """``(by..., k, x_tail, hill, alpha)`` — Hill tail index over the
    top k order statistics; see module docstring."""
    if k < 2:
        raise ValueError("hill_estimator: k must be >= 2")
    flt = df.filter(F.col(value_col).isNotNull())
    # ties at the top-k boundary are value-deterministic: swapping
    # equal values between ranks k and k+1 leaves the ln-sum unchanged
    wd = Window.partitionBy(*by).orderBy(F.desc(value_col))
    top = flt.select(
        *by,
        F.col(value_col).cast("double").alias("_x"),
        F.row_number().over(wd).alias("_r"),
    ).filter(F.col("_r") <= k + 1)
    if validation_enabled():
        n_bad = top.filter(F.col("_x") <= 0).count()
        if n_bad:
            raise ValueError(
                f"hill_estimator: {n_bad} nonpositive value(s) inside "
                "the top-(k+1) set — the Hill tail model needs positive "
                "values; shift or filter first"
            )
    packed = top.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_m"),
        F.min(F.when(F.col("_r") == k + 1, F.col("_x"))).alias(
            "_xk1"
        ),
        F.sort_array(
            F.collect_list(
                F.when(F.col("_r") <= k, F.struct("_r", "_x"))
            )
        ).alias("_lv"),
    )
    h = (
        F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a, e: a + F.log(e["_x"] / F.col("_xk1")),
        )
        / F.lit(float(k))
    )
    ok = (F.col("_m") == k + 1) & F.col("_xk1").isNotNull() & (
        F.col("_xk1") > 0.0
    )
    return packed.select(
        *by,
        F.lit(int(k)).alias("k"),
        F.when(ok, F.col("_xk1")).alias("x_tail"),
        F.when(ok, h).alias("hill"),
        F.when(ok & (h > 0.0), F.lit(1.0) / h).alias("alpha"),
    )


def gpd_pot(
    df: DataFrame,
    by: list[str],
    value_col: str,
    threshold: float,
    return_periods: tuple = (1000, 10000),
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, n_exc, rate, xi, sigma, t_return, level)`` —
    generalized Pareto peaks-over-threshold fit (L311, MoM): model
    EXCEEDANCES over a high threshold u instead of block maxima
    (L309) — uses every extreme observation, the statistically
    efficient way to ask "what level do we cross once per T
    observations":

        y = x − u (x > u);   m = ȳ, v = s²_y
        ξ = ½·(1 − m²/v),   σ = ½·m·(1 + m²/v)
        level(T) = u + (σ/ξ)·((T·ζ_u)^ξ − 1),  ζ_u = n_exc/n

    Exceedance sums are exact decimals; ξ/σ/levels are fixed IEEE
    trees per requested T (pow is the libm reliance).  The MoM fit
    needs ξ < ½ (finite variance) — v ≤ 0, fewer than 2 exceedances,
    or ξ = 0 → NULL levels (ξ = 0 is the exponential limit; use the
    L309 Gumbel path).  The threshold is the caller's modelling
    choice (a literal, not data).

    Scale shape: ONE combinable aggregation over the fact table.

    No reference counterpart; capacity-planning analytics per SURVEY
    §2.11.
    """
    if any(int(t) < 2 for t in return_periods) or not return_periods:
        raise ValueError("gpd_pot: return periods must all be >= 2")
    dec = f"decimal(18,{scale})"
    u = F.lit(float(threshold))
    xd = F.col(value_col).cast(dec)
    exc = F.when(
        F.col(value_col).cast("double") > u,
        xd - F.lit(float(threshold)).cast(dec),
    )
    agg = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(exc).alias("n_exc"),
            F.sum(exc).alias("_s"),
            F.sum(exc * exc).alias("_q"),
        )
    )
    ne = F.col("n_exc").cast("double")
    sd_ = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    m = sd_ / ne
    v = (ne * qd - sd_ * sd_) / (ne * (ne - F.lit(1.0)))
    r = m * m / v
    xi = F.lit(0.5) * (F.lit(1.0) - r)
    sigma = F.lit(0.5) * m * (F.lit(1.0) + r)
    ok = (F.col("n_exc") >= 2) & (v > 0.0)
    s1 = agg.select(
        *by,
        "n",
        "n_exc",
        (ne / F.col("n").cast("double")).alias("rate"),
        F.when(ok, xi).alias("xi"),
        F.when(ok, sigma).alias("sigma"),
    )
    wide = s1.select(
        *by,
        "n",
        "n_exc",
        "rate",
        "xi",
        "sigma",
        F.explode(
            F.array(*[F.lit(int(t)) for t in return_periods])
        ).alias("t_return"),
    )
    td = F.col("t_return").cast("double")
    level = u + (F.col("sigma") / F.col("xi")) * (
        F.pow(td * F.col("rate"), F.col("xi")) - F.lit(1.0)
    )
    return wide.select(
        *by,
        "n",
        "n_exc",
        "rate",
        "xi",
        "sigma",
        "t_return",
        F.when(F.col("xi") != 0.0, level).alias("level"),
    )


def hist_var_es(
    df: DataFrame,
    by: list[str],
    value_col: str,
    q_pct: int = 95,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, k_tail, var_level, es)`` — historical upper-tail
    VaR and expected shortfall (L312): the (100−q)% worst
    observations' THRESHOLD (VaR, an exact order statistic — what the
    L291 backtest audits) and their MEAN (ES/CVaR — the coherent risk
    measure that sees how bad the tail is beyond the threshold):

        k = max(1, ⌊n·(100−q)/100⌋)   (exact integer tail size)
        VaR = k-th largest value;  ES = mean of the top k

    One descending window pass: the k-th order statistic and the
    exact decimal cumulative sum at rank k — ES is ONE division.
    Ties are value-deterministic (equal values at the boundary give
    the same VaR and the same top-k sum).  q_pct outside 50..99
    refused.

    Scale shape: one keyed window sort + one positional filter.

    No reference counterpart; capacity-planning analytics per SURVEY
    §2.11.
    """
    if not 50 <= int(q_pct) <= 99:
        raise ValueError("hist_var_es: q_pct must be in 50..99")
    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(value_col).isNotNull())
    wd = Window.partitionBy(*by).orderBy(F.desc(value_col))
    wdp = wd.rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = flt.select(
        *by,
        F.col(value_col).cast(dec).alias("_x"),
        F.row_number().over(wd).alias("_r"),
        F.sum(F.col(value_col).cast(dec)).over(wdp).alias("_cum"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    k = F.greatest(
        F.lit(1),
        F.floor(
            F.col("_n") * F.lit(100 - int(q_pct)) / F.lit(100)
        ),
    )
    at_k = ranked.filter(F.col("_r") == k)
    return at_k.select(
        *by,
        F.col("_n").alias("n"),
        F.col("_r").alias("k_tail"),
        F.col("_x").cast("double").alias("var_level"),
        (
            F.col("_cum").cast("double") / F.col("_r").cast("double")
        ).alias("es"),
    )
