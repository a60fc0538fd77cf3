"""CUPED variance reduction (L178, Deng et al. WSDM'13): the standard
experimentation trick — adjust each unit's metric by its PRE-experiment
covariate, y' = y − θ·(x − x̄) with θ = cov(x,y)/var(x), shrinking
metric variance by the squared correlation without biasing the
treatment effect (E[x − x̄] = 0).  The follow-up to the Welch test
(L139): same experiment, tighter confidence.

Determinism: θ and x̄ come from EXACT DECIMAL sufficient statistics
(the L135 grouped-OLS discipline — θ is literally the OLS slope:
θ = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²), both sides exact integers/decimals,
one IEEE division each), and the per-row adjustment is a fixed tree —
bit-identical, ungridded.  Zero covariate variance → θ NULL and y' = y
(adjustment degenerates, documented).

Scale shape: one combinable fit aggregation + a broadcast join back +
a narrow per-row projection — the fit-small/apply-wide shape (L143);
100 TB scanned twice, shuffled never.

No reference counterpart; experimentation family per SURVEY §2.11
(composes with L139 Welch and the SRM check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def cuped_adjust(
    df: DataFrame,
    by: list[str],
    metric_col: str,
    covariate_col: str,
    scale: int = 2,
    out_col: str = "metric_adj",
) -> DataFrame:
    """Adds ``theta`` and ``out_col`` (= y − θ·(x − x̄)) per row; rows
    with NULL metric/covariate pass through with NULL ``out_col``.
    Metric and covariate must be exactly representable at
    DECIMAL(18, scale)."""
    dec = f"decimal(18,{scale})"
    y = F.col(metric_col).cast(dec)
    x = F.col(covariate_col).cast(dec)
    flt = df.filter(
        F.col(metric_col).isNotNull() & F.col(covariate_col).isNotNull()
    )
    fit = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x.cast(_DEC) * x.cast(_DEC)).alias("_sxx"),
        F.sum(x.cast(_DEC) * y.cast(_DEC)).alias("_sxy"),
    )
    nd = F.col("_n").cast(_DEC)
    covn = nd * F.col("_sxy") - F.col("_sx").cast(_DEC) * F.col("_sy").cast(_DEC)
    varn = nd * F.col("_sxx") - F.col("_sx").cast(_DEC) * F.col("_sx").cast(_DEC)
    stats = fit.select(
        *by,
        F.when(
            varn != F.lit(0).cast(_DEC),
            covn.cast("double") / varn.cast("double"),
        ).alias("theta"),
        (F.col("_sx").cast("double") / F.col("_n").cast("double")).alias(
            "_xbar"
        ),
    )
    out = df.join(F.broadcast(stats), by, "left")
    xd = F.col(covariate_col).cast("double")
    yd = F.col(metric_col).cast("double")
    adj = F.when(
        F.col(metric_col).isNotNull()
        & F.col(covariate_col).isNotNull()
        & F.col("theta").isNotNull(),
        yd - F.col("theta") * (xd - F.col("_xbar")),
    ).otherwise(
        F.when(F.col(metric_col).isNotNull(), yd)  # degenerate: y' = y
    )
    return out.withColumn(out_col, adj).drop("_xbar")
