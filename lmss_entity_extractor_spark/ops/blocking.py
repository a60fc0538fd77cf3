"""Blocked sorted-neighborhood candidate generation (L177): the other
classic entity-resolution blocking strategy (Hernández & Stolfo '95)
next to the equi-key blocking `graph/er.py` uses — sort entities by a
fuzzy key and pair everything within a sliding window of w positions,
which catches near-misses (typos early in the key) that hash blocking
splits apart.

Distributed shape: a GLOBAL sorted row_number is a single-partition
window, so this is the BLOCKED variant (the standard scale fix):
entities are first partitioned by a caller-supplied block expression
(e.g. the key's first token/char), sorted WITHIN blocks, and windowed
there — one keyed exchange, no global sort.  Pairs that straddle a
block boundary are missed by construction; the standard mitigation
(also standard practice) is multi-pass SN with a second key, which is
just calling this again with different ``block/key`` columns and
unioning.  Everything is deterministic: total order (key, id), exact
integer positions.

Output one row per candidate pair with the position distance — feed
into `ops/fuzzyjoin`/`graph/er.py` scoring.

No reference counterpart; ER/blocking family per SURVEY §2.11
(complements L57 equi-key blocking and L83 edit-distance join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    block_col: str,
    key_col: str,
    id_col: str,
    window: int = 3,
) -> DataFrame:
    """``(id_a, id_b, block, dist)`` — all pairs within ``window``
    positions of the (key, id)-sorted order inside each block;
    dist ∈ [1, window−1].  ``window`` ≥ 2; ids must be distinct."""
    if window < 2:
        raise ValueError("sorted_neighborhood_pairs: window must be >= 2")
    base = df.select(
        F.col(block_col).alias("_b"),
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
    ).withColumn("_rn", F.row_number().over(
        Window.partitionBy("_b").orderBy(F.col("_k"), F.col("_id"))
    ))
    offsets = F.explode(
        F.array(*[F.lit(k) for k in range(1, window)])
    ).alias("_d")
    left = base.select("_b", "_rn", F.col("_id").alias("id_a"), offsets)
    right = base.select(
        "_b", F.col("_rn").alias("_rn2"), F.col("_id").alias("id_b")
    )
    return (
        left.join(
            right,
            (left["_b"] == right["_b"])
            & (F.col("_rn2") == F.col("_rn") + F.col("_d")),
        )
        .select(
            "id_a",
            "id_b",
            left["_b"].alias("block"),
            F.col("_d").alias("dist"),
        )
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    field_params: dict[str, tuple[float, float]],
    agree_prefix: str = "agree_",
) -> DataFrame:
    """Adds ``fs_weight`` — the Fellegi-Sunter (1969) match score
    (L241): the probabilistic record-linkage log-likelihood over a
    candidate-pair table with per-field BOOLEAN agreement columns
    (``agree_<field>``, e.g. from the L83/L197 fuzzy joins or the
    L177 window pairs):

        w = Σ_fields  agree ? ln(m/u) : ln((1−m)/(1−u))

    ``field_params`` maps field → (m, u): m = P(agree | match),
    u = P(agree | non-match) — caller-supplied (EM-estimated offline
    or hand-set), validated to lie strictly inside (0, 1) with m > u.
    The per-field log-weights are computed ONCE in Python and embedded
    as double literals (the L200/L221/L231 discipline — no cross-
    engine ln on the hot path at all), so the score is a fixed chain
    of literal-weight CASEs in field order — bit-identical, and the
    whole scorer is a NARROW projection: zero shuffles over 100 TB of
    candidate pairs.  NULL agreement (field missing on either side)
    contributes 0 by convention (documented — the standard "no
    information" treatment).

    No reference counterpart; ER/linkage analytics per SURVEY §2.11
    (composes with L57/L177 blocking and L83/L197 similarity joins).
    """
    import math

    if not field_params:
        raise ValueError("fellegi_sunter_score: field_params is empty")
    w = F.lit(0.0)
    for field in field_params:  # caller-supplied dict order = chain order
        m, u = field_params[field]
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"fellegi_sunter_score: field {field!r} needs "
                f"0 < u < m < 1 (got m={m}, u={u})"
            )
        col = F.col(f"{agree_prefix}{field}")
        w = w + (
            F.when(col.isNull(), F.lit(0.0))
            .when(col.cast("boolean"), F.lit(math.log(m / u)))
            .otherwise(F.lit(math.log((1.0 - m) / (1.0 - u))))
        )
    return pairs.withColumn("fs_weight", w)
