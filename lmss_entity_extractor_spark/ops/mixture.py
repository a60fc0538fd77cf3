"""Domain-mixture sampling (L36): select rows so the output hits TARGET
stratum proportions exactly — the data-mixing step of a training
pipeline (e.g. "50% en / 25% es / 25% fr" from whatever the crawl
delivered), at the largest total the inventory allows.

Selection is deterministic and engine-reproducible: per-stratum quotas
are derived driver-side from the stratum counts (one map-side-combinable
aggregation over a bounded stratum set), and each stratum keeps its
quota of rows with the SMALLEST Knuth multiplicative hashes of the key
(ties by key) — the same pure-integer hash family stratified_sample
uses, so DuckDB re-derives the exact row set (contract query
``mixture_sample``).

Scale note: exact quotas need one per-stratum ranking window, which
shuffles the kept strata on the stratum key — a handful of huge
partitions at corpus scale.  When approximate proportions are enough,
``ops/textprep.stratified_sample``'s O(1) per-row rate filter is the
petabyte path; this operator is the exact-mixture form for when the
recipe is a contract (and its quota math tells you the rate to feed the
approximate form: ``quota_s / n_s``).
"""

from __future__ import annotations

from fractions import Fraction
from math import lcm

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textprep import knuth_hash


def mixture_quotas(counts: dict, targets: dict) -> dict:
    """Per-stratum quotas hitting ``targets`` proportions EXACTLY at the
    largest feasible total.

    Exact rational arithmetic throughout: weights are read as decimal
    rationals (``Fraction(str(v))`` — 0.25 means 1/4, 0.29 means
    29/100), normalized to fractions of the output, and the total is
    the largest T <= min_s(floor(n_s / frac_s)) divisible by the lcm of
    the fraction denominators — so every quota_s = frac_s * T is an
    integer and the output shares equal the targets exactly, not
    floor-approximately.  Raises if a targeted stratum has no rows, or
    if no positive exact total exists (pathological denominators — use
    ops/textprep.stratified_sample when approximate shares suffice)."""
    if not targets:
        raise ValueError("empty target mixture")
    weights = {s: Fraction(str(v)) for s, v in targets.items()}
    if any(v <= 0 for v in weights.values()):
        raise ValueError(f"non-positive target fraction in {targets}")
    total = sum(weights.values())
    missing = sorted(s for s in targets if not counts.get(s))
    if missing:
        raise ValueError(f"targeted strata with zero rows: {missing}")
    fracs = {s: v / total for s, v in weights.items()}
    feasible = min(int(Fraction(counts[s]) / fracs[s]) for s in targets)
    step = lcm(*(f.denominator for f in fracs.values()))
    exact_total = (feasible // step) * step
    if exact_total <= 0:
        raise ValueError(
            f"no positive total hits {targets} exactly (needs a multiple "
            f"of {step} <= {feasible}); use stratified_sample for "
            "approximate shares"
        )
    return {s: int(fracs[s] * exact_total) for s in targets}


def mixture_sample(
    df: DataFrame,
    targets: dict,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Rows selected to hit the target mixture exactly (see module
    docstring).  ``targets`` maps stratum value -> desired share (any
    positive weights; normalized internally).  Untargeted strata are
    dropped.  Output keeps the input columns."""
    counts = {
        r[0]: r[1] for r in df.groupBy(stratum_col).count().collect()
    }
    quotas = mixture_quotas(counts, targets)
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(s, int(k)) for s, k in sorted(quotas.items())], [stratum_col, "_quota"]
    )
    w = Window.partitionBy(stratum_col).orderBy(
        knuth_hash(key_col).asc(), F.col(key_col).asc()
    )
    return (
        df.join(F.broadcast(qdf), stratum_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )
