"""Deterministic weighted sampling without replacement (L115):
Efraimidis–Spirakis A-ES ("Weighted random sampling with a reservoir",
IPL 2006) with the randomness replaced by the repo's shared
cross-engine Knuth hash — the sample is a pure function of the key
set, so it is reproducible at any parallelism, verifiable by any SQL
engine, and auditable row-by-row.

A-ES: each row draws u ~ U(0,1) and gets priority p = -ln(u)/w; the k
SMALLEST priorities form a weighted sample without replacement (the
exponential race: p is an Exp(w) variate, and the minimum of
exponentials lands on item i with probability w_i/Σw).  Here
u = (knuth_hash(key) + 0.5) / 2^32 — mid-bucket so u is never 0 or 1,
and the SAME hash definition as stratified/mixture sampling
(`ops/textprep.knuth_hash`), keeping one auditable randomness source
across the sampling family.

Selection shape (the 100 TB part):

* grouped — one window ``row_number`` per group key: single keyed
  exchange, no driver involvement, group count unbounded;
* global (``group_cols=None``) — ``orderBy(priority).limit(k)``:
  Spark plans TakeOrderedAndProject (per-partition top-k heaps + one
  k-row merge), never a full sort.

Weights must be strictly positive; NULL/non-positive weights are a
rule violation surfaced LOUDLY (raise_error in the plan), not silently
dropped — a silent drop would bias the sample.

Cross-engine caveat (same stance as the PMI log-tree, L50): priorities
pass through ``ln``, so DuckDB-vs-JVM agreement relies on both libms
rounding ln within 1 ulp of each other at the same inputs; the oracle
computes the identical formula and the deterministic tie-break
(priority, key) pins the order everywhere else.  On the frozen test
tables this is bit-stable; at a rank boundary closer than ~1e-15
relative, an oracle flip would indicate libm divergence, not a
sampling bug.

No reference counterpart; sampling-for-training-mixtures is SURVEY
§2.11 territory (extends L16 stratified / L36 mixture to weighted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textprep import knuth_hash


def sample_priority(key_col: str, weight_col: str):
    """The A-ES priority column: -ln((knuth_hash(key)+0.5)/2^32) / w,
    with a loud guard on non-positive or NULL weights."""
    u = (knuth_hash(key_col) + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    guarded_w = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.concat(
                F.lit(f"weighted_sample: non-positive or NULL weight in {weight_col!r} at key "),
                F.col(key_col).cast("string"),
            )
        ).cast("double"),
    ).otherwise(w)
    return -F.log(u) / guarded_w


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the ``k`` rows with smallest A-ES priority — per group if
    ``group_cols`` is given, else globally — a weighted sample without
    replacement (inclusion odds proportional to weight).  Input columns
    pass through unchanged; deterministic for a fixed key set."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    for c in [key_col, weight_col] + list(group_cols or []):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    pri = sample_priority(key_col, weight_col)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            pri.asc(), F.col(key_col).asc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    # global: TakeOrderedAndProject — per-partition heaps, k-row merge
    return (
        df.withColumn("__pri", pri)
        .orderBy(F.col("__pri").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__pri")
    )
