"""Z-order (Morton) interleave keys for multi-dimensional data
clustering — the data-skipping layout trick (Delta/Iceberg OPTIMIZE
ZORDER BY): sort/range-partition on the interleaved key and rows close
in EVERY dimension land in the same files, so min/max file stats prune
scans for predicates on ANY prefix-free subset of the dimensions.
At 100 TB this is the difference between "read 3 files" and "read the
table" for a 2-D selective query.

``zorder_key`` is a single JVM expression tree (shift/and/or over
longs) — Catalyst folds it into the projection, whole-stage codegen
executes it, nothing leaves the JVM and nothing shuffles.  The shuffle
(ONE range exchange) happens only in ``zorder_repartition``, which is
the point: you pay one exchange at layout time to prune forever after.

Columns must already be non-negative ints on a bounded range; the
caller picks ``bits`` so every value fits (values >= 2^bits raise
loudly via an ANSI-mode guard rather than silently aliasing distant
rows into the same bucket).

Reference counterpart: none — the reference has no storage-layout
layer; this is part of the beyond-reference 100-TB mandate (SURVEY
§2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column in
    ``cols`` (column i contributes bit b to output position
    b*len(cols) + i).  len(cols) * bits must fit a signed long."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if not (0 < bits * k <= 63):
        raise ValueError(f"bits*len(cols) = {bits * k} must be in (0, 63]")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        x = F.col(c).cast("long")
        bad = (x < 0) | (F.shiftright(x, bits) != 0)
        x = F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit(f"zorder_key: column {c} out of [0, 2^{bits}): "),
                    F.col(c).cast("string"),
                )
            ).cast("long"),
        ).otherwise(x)
        for b in range(bits):
            bit = F.shiftright(x, b).bitwiseAND(F.lit(1).cast("long"))
            out = out.bitwiseOR(F.shiftleft(bit, b * k + i))
    return out


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "_zkey",
) -> DataFrame:
    """Range-partition + sort by the Morton key — the write-side layout
    pass.  Keeps ``key_col`` so callers can assert per-file bounds; drop
    it before persisting if undesired."""
    keyed = df.withColumn(key_col, zorder_key(cols, bits=bits))
    parts = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(parts, key_col).sortWithinPartitions(key_col)
