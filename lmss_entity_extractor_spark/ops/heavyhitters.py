"""Distributed exact heavy hitters (L101): the two-pass Misra-Gries
candidate + exact-verification scheme.

The 100 TB problem: "which tokens exceed phi of the corpus?" as a plain
``groupBy(term).count()`` shuffles the ENTIRE vocabulary — billions of
distinct keys, almost all of which are light.  The classic fix (Misra &
Gries 1982; mergeable-summaries form Agarwal et al. PODS'12) prunes the
shuffle domain first:

* **pass 1 (candidates)** — each partition folds its rows through a
  Misra-Gries summary of ``k`` counters (one Arrow batch at a time:
  add the batch's value counts, then if more than ``k`` counters remain
  subtract the (size-k)-th smallest count and drop the non-positive
  ones — the batched MG merge).  An item evicted from a partition's
  summary has a local count of at most N_p/(k+1), so an item evicted
  from EVERY partition has a global count of at most N/(k+1).  With
  ``k + 1 >= den/num`` (k chosen from the threshold, with 2x slack),
  any item whose global count exceeds ``N * num/den`` MUST survive in
  at least one partition — the candidate union is a guaranteed
  superset of the answer, independent of how rows were batched.
* **pass 2 (exact)** — a broadcast semi-join on the (tiny: at most
  partitions x k rows) candidate set filters the corpus scan, an exact
  count runs over the candidate domain only, and the threshold
  ``n * den > N * num`` is applied in INTEGER arithmetic (phi is a
  rational, never a float) — so the final output is exact and
  deterministic no matter what the racy per-partition summaries kept.

Both passes are full scans, but neither shuffles the vocabulary: pass 1
moves at most ``partitions * k`` candidate rows, pass 2 shuffles only
candidate-matching tokens.  That is the shape that survives a
heavy-tailed 100 TB token stream.

No reference counterpart (the reference has no frequency mining); this
generalizes the TF channel at `app/entity_extraction.py:128-140` from
per-document top-k to corpus-scale threshold mining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_CAND_SCHEMA = StructType(
    [
        StructField("item", StringType()),
        StructField("part_rows", LongType()),
    ]
)


def _mg_partition_fold(k: int, col: str):
    """The per-partition pass-1 kernel: fold Arrow batches through a
    k-counter Misra-Gries summary; emit surviving items plus ONE
    row-count row (item NULL) so the caller gets N from the same scan."""

    def fold(batches):
        import numpy as np
        import pandas as pd

        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            n_rows += len(pdf)
            for item, c in vals.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                # batched MG merge (Agarwal et al. PODS'12 §3.1): subtract
                # the (size-k)-th smallest count; >= size-k counters hit
                # zero and drop, leaving <= k survivors
                cnts = np.fromiter(counters.values(), dtype=np.int64)
                m = np.partition(cnts, len(cnts) - k - 1)[len(cnts) - k - 1]
                counters = {i: c - m for i, c in counters.items() if c - m > 0}
        out = pd.DataFrame(
            {"item": list(counters.keys()) + [None], "part_rows": 0}
        )
        out.loc[len(out) - 1, "part_rows"] = n_rows
        yield out

    return fold


def heavy_hitters(
    df: DataFrame,
    col: str,
    num: int,
    den: int,
    candidate_k: int | None = None,
) -> DataFrame:
    """All values of ``col`` occurring in strictly more than ``num/den``
    of the non-null rows, with their EXACT counts — ``(item, n)``.

    ``num/den`` is the threshold as an exact rational (never a float:
    the pass-2 predicate is ``n * den > N * num`` in 64-bit integers,
    so the cut is reproducible bit-for-bit by any engine).
    ``candidate_k`` (default ``2 * ceil(den/num)``) is the pass-1
    summary width; any value ``>= den/num - 1`` preserves the superset
    guarantee, larger only reduces pass-2 work on near-threshold items.
    """
    if num <= 0 or den <= 0:
        raise ValueError(f"threshold must be a positive rational, got {num}/{den}")
    k = candidate_k if candidate_k is not None else 2 * ((den + num - 1) // num)
    if k < (den + num - 1) // num - 1:
        raise ValueError(
            f"candidate_k={k} breaks the superset guarantee for phi={num}/{den} "
            f"(needs >= {(den + num - 1) // num - 1})"
        )
    src = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    pass1 = src.mapInPandas(_mg_partition_fold(k, "item"), _CAND_SCHEMA)
    pass1 = pass1.localCheckpoint(eager=True)  # one scan feeds both reads below
    total = pass1.agg(F.sum("part_rows").alias("n")).collect()[0]["n"] or 0
    if total == 0:
        return src.groupBy("item").agg(F.count(F.lit(1)).alias("n")).limit(0)
    cands = pass1.filter(F.col("item").isNotNull()).select("item").distinct()
    return (
        src.join(F.broadcast(cands), "item", "leftsemi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * F.lit(int(den)) > F.lit(int(total)) * F.lit(int(num)))
    )
