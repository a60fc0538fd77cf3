"""Leave-one-out target encoding (L138): the feature-engineering
workhorse for high-cardinality categoricals — each row's category is
replaced by the mean target of the OTHER rows in that category
(Micci-Barreca 2001, the LOO variant), so the encoding never leaks the
row's own label:

    te_i = (S_c − y_i) / (n_c − 1)          when n_c > 1
    te_i = S / n   (global target mean)     when n_c = 1

Exactness discipline (the L135 stance): S_c and S are EXACT DECIMAL
sums (order-insensitive — float SUM is not), the numerator subtraction
stays decimal (exact), and only the final single division runs in
IEEE doubles — so every encoded value is bit-identical across engines
and partitionings with no rounding grid.

Scale shape: one combinable groupBy(category) + one equi-join back on
the category + a 1-row global aggregate folded in as a broadcast —
two keyed shuffles on the same key; stat tables are bounded by
category cardinality.

No reference counterpart; feature-engineering per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "te",
    scale: int = 2,
) -> DataFrame:
    """``(df.*, te)`` — leave-one-out target encoding of ``cat_col``
    against ``target_col``.  The target must be exactly representable
    at ``DECIMAL(18, scale)`` (cents-style data at the default);
    NULL targets/categories are excluded from the sums and encode to
    the global mean / NULL respectively."""
    dec = f"decimal(18,{scale})"
    yd = F.col(target_col).cast(dec)
    vals = df.filter(
        F.col(cat_col).isNotNull() & F.col(target_col).isNotNull()
    )
    stats = vals.groupBy(F.col(cat_col).alias("_cat")).agg(
        F.sum(yd).alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    glob = vals.agg(
        F.sum(yd).alias("_gs"), F.count(F.lit(1)).alias("_gn")
    )
    enc = (
        df.join(
            stats, F.col(cat_col).eqNullSafe(F.col("_cat")), "left"
        )
        .drop("_cat")
        .crossJoin(F.broadcast(glob))
    )
    loo = (F.col("_s") - yd).cast("double") / (
        (F.col("_n") - F.lit(1)).cast("double")
    )
    global_mean = F.col("_gs").cast("double") / F.col("_gn").cast("double")
    te = (
        F.when(F.col(target_col).isNull() | F.col(cat_col).isNull(), None)
        .when(F.col("_n") > 1, loo)
        .otherwise(global_mean)
    )
    return enc.withColumn(out_col, te).drop("_s", "_n", "_gs", "_gn")
