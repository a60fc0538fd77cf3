"""Embedding quantization — int8 storage for vector columns.

At 100 TB the embedding column IS the table: float32 x 768 dims is
3 KB/row, and symmetric int8 quantization cuts storage and scan bytes
4x while keeping cosine rankings nearly intact (the standard trade in
large-scale retrieval indexes).  Everything here is JVM higher-order
column expressions — no UDF — and every step (scale, rounding, packed
values) is exact integer/float math reproducible in ANSI SQL, so the
quantized arrays themselves are value-checkable by the DuckDB oracle,
not just spot-tested.

Rounding is ``floor(x + 0.5)`` (half-up, explicitly) rather than an
engine ``round()`` — Spark rounds half-up, DuckDB half-even; an implicit
round would diverge on exact .5 grid points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _absmax(vec: Column) -> Column:
    return F.aggregate(
        F.transform(vec, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_prefix: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = absmax/127,
    q[i] = floor(v[i]/scale + 0.5) clamped to [-127, 127].

    Appends ``{out_prefix}_scale`` (double) and ``{out_prefix}_vec``
    (array<tinyint>).  All-zero vectors get scale 0 and an all-zero
    code array (dequantizes back to exact zeros)."""
    vec = F.col(vec_col)
    scale_col = f"{out_prefix}_scale"
    # Two chained projections, codes referencing the scale COLUMN: the
    # scale is an O(dim) aggregate, and inlining it into the per-element
    # transform lambda would re-evaluate it per element — O(dim^2) per
    # row.  CollapseProject leaves the split alone because the alias is
    # non-cheap and referenced more than once (when-guard + lambda), so
    # the aggregate runs once per row.
    with_scale = df.withColumn(scale_col, _absmax(vec) / F.lit(127.0))
    scale = F.col(scale_col)
    qvec = F.when(scale == 0, F.transform(vec, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            vec,
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(F.lit(127.0), F.floor(x.cast("double") / scale + F.lit(0.5)).cast("double")),
            ).cast("tinyint"),
        )
    )
    return with_scale.withColumn(f"{out_prefix}_vec", qvec)


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """array<tinyint> + scale -> array<double> reconstruction."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)
