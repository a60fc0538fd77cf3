"""Probability calibration diagnostics (L166): the Brier score and the
reliability (calibration-bin) table — is a model's 0.8 actually an 80%
event rate?  The standard companion to the ROC-AUC (L146) scoreboard:
AUC measures ranking, calibration measures the probabilities
themselves.

Exactness contract: probabilities must be exactly representable at
DECIMAL(12, scale) (callers emitting float scores quantize first —
a calibration table is bucketed anyway, so the quantization IS the
analysis grid).  Then every accumulated quantity is exact decimal —
(p − y)² per row, per-bin Σp and Σy — and each output value is ONE
IEEE division:

    brier = Σ(p−y)² / n,   bin  = min(⌊p·B⌋, B−1)
    mean_pred = Σp/n_b,    frac_pos = Σy/n_b

Out-of-range probabilities are REFUSED (a silent clamp would hide a
broken score pipeline).  Scale shape: one combinable groupBy (bins
are bounded); 100 TB scanned once.

No reference counterpart; evaluation analytics per SURVEY §2.11
(composes with L146 ROC-AUC and L165 classification report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prepared(df, prob_col, label_col, scale):
    dec = f"decimal(12,{scale})"
    flt = df.filter(F.col(prob_col).isNotNull() & F.col(label_col).isNotNull())
    p = F.col(prob_col).cast(dec)
    out = flt.select(p.alias("_p"), F.col(label_col).cast("int").alias("_y"))
    n_bad = out.filter(
        (F.col("_p") < 0) | (F.col("_p") > 1) | ~F.col("_y").isin([0, 1])
    ).count()
    if n_bad:
        raise ValueError(
            f"calibration: {n_bad} row(s) with probability outside [0,1] "
            "or non-binary label — fix the score pipeline; clamping "
            "silently would hide it"
        )
    return out


def brier_score(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    scale: int = 4,
) -> DataFrame:
    """One row ``(n, brier)`` — mean squared probability error, the
    numerator an exact decimal sum, ONE division."""
    base = _prepared(df, prob_col, label_col, scale)
    diff = F.col("_p") - F.col("_y").cast(f"decimal(12,{scale})")
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(diff * diff).alias("_ss"),
    )
    return agg.select(
        "n",
        F.when(
            F.col("n") > 0,
            F.col("_ss").cast("double") / F.col("n").cast("double"),
        ).alias("brier"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 4,
) -> DataFrame:
    """``(bin, n, mean_pred, frac_pos)`` — the reliability table; a
    well-calibrated model has mean_pred ≈ frac_pos per bin."""
    if n_bins < 1:
        raise ValueError("calibration_bins: n_bins must be >= 1")
    base = _prepared(df, prob_col, label_col, scale)
    bin_ = F.least(
        F.floor(F.col("_p") * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    agg = base.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_p").alias("_sp"),
        F.sum("_y").alias("_sy"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        (F.col("_sp").cast("double") / nd).alias("mean_pred"),
        (F.col("_sy").cast("double") / nd).alias("frac_pos"),
    )
