"""Generic salted skew join (L102): spread a hot join key over R
reducers by salting the probe side and replicating the build side.

The 100 TB failure mode: an equi-join shuffles both sides on the key,
so every row carrying the hottest key lands on ONE reducer — the
`skew_stats` diagnosis query (L94) exists precisely to catch this
before launch.  When the hot side is far too large for its key's
reducer but the other side is mid-sized (too big to broadcast whole,
cheap to replicate R times), the classic fix is:

* probe side gets a salt in [0, R) — assignment is IRRELEVANT to the
  result (any distribution of a key's rows over salts joins against an
  identical replica set), so we use a deterministic full-row hash
  rather than ``rand()`` (reproducible plans; caveat: byte-identical
  duplicate rows share a salt, so pathological all-duplicate inputs
  keep their skew — documented, detectable via skew_stats);
* build side is replicated R times (explode over ``sequence(0, R-1)``)
  — R·|build| extra shuffle bytes, the price paid to split the hot
  reducer R ways;
* the join key becomes ``(key, salt)`` — the hot key now hashes to R
  distinct reducers.

Semantics are EXACTLY the plain join's (multiplicities included), which
is what the DuckDB oracle checks; only the physical distribution
changes.  This generalizes the 3-phase salted canonicalization
(`graph/canonicalize.py:39`) from aggregation to joins.

The pipeline's own skew handling stays structural (canonicalization
bounds fan-in by SALT); this operator is the reusable form a user
reaches for when `skew_stats` flags a join they wrote themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__skewjoin_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """``left.join(right, on, how)`` with the key salted R ways.

    ``left`` is the (possibly skewed) probe side — each row gets one
    deterministic salt.  ``right`` is the replicated build side — it
    pays a ``salt``-fold shuffle-size multiplier, so it must be the
    smaller relation.  Only ``inner`` and ``left`` joins are defined
    (the build side is replicated, so right/full-outer would need
    replica dedup on the null-extension path — refuse loudly rather
    than emit R copies of unmatched right rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"join column {on!r} must exist on both sides")
    if _SALT in left.columns or _SALT in right.columns:
        raise ValueError(f"reserved column {_SALT!r} already present")
    probe = left.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(salt)
        ).cast("int"),
    )
    build = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return probe.join(build, [on, _SALT], how).drop(_SALT)
