"""Distributed skyline / Pareto frontier (L130): the multi-criteria
"best trade-offs" query — keep rows no other row dominates (>= in
every criterion, > in at least one) — via the classic two-phase
distributed scheme (Börzsönyi et al. ICDE'01 BNL kernel; partition-
then-merge as in parallel-skyline literature):

    phase 1: LOCAL skyline per partition (a row dominated by a
             partition-mate is dominated globally — safe prune);
    phase 2: skyline of the unioned local skylines (one narrow
             repartition(1) pass over the survivors).

The dominance kernel is an Arrow-batched ``applyInPandas`` BNL over
numpy (the documented non-relational seam: dominance is a quadratic
predicate with no equi-join form; the SQL NOT-EXISTS twin IS the
oracle, and is exactly what this operator exists to avoid running on
the full table).  Phase-1 input is partition-sized; phase-2 input is
the union of local skylines — usually tiny (skylines grow ~log^{d-1} n
under independence) but NOT guaranteed, so a LOUD cap refuses the
anti-correlated blowup case instead of silently OOMing the merge
(raise the cap or reduce criteria — documented trade).

Determinism: the skyline SET is input-order-independent by definition
(dominance is a pure predicate); duplicate criterion-vectors all
survive together (none dominates its twin — ties require a strict >
somewhere).

No reference counterpart; multi-criteria curation ("longest AND
highest-quality AND least-duplicated documents") per SURVEY §2.11.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from .validate import validation_enabled

_DEFAULT_MERGE_CAP = 200_000


def _local_skyline(pdf: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """BNL dominance filter over one in-memory block (numpy, O(n·s))."""
    import numpy as np

    vals = pdf[list(cols)].to_numpy(dtype=float)
    n = len(vals)
    keep_idx: list[int] = []
    kept: list = []
    for i in range(n):
        v = vals[i]
        dominated = False
        if kept:
            k = np.vstack(kept)
            ge = (k >= v).all(axis=1)
            gt = (k > v).any(axis=1)
            dominated = bool((ge & gt).any())
        if not dominated:
            # evict previously-kept rows the new row dominates
            if kept:
                k = np.vstack(kept)
                dom = ((v >= k).all(axis=1)) & ((v > k).any(axis=1))
                if dom.any():
                    kept = [k[j] for j in range(len(kept)) if not dom[j]]
                    keep_idx = [keep_idx[j] for j in range(len(keep_idx)) if not dom[j]]
            kept.append(v)
            keep_idx.append(i)
    return pdf.iloc[keep_idx]


def skyline(
    df: DataFrame,
    cols: list[str],
    maximize: bool = True,
    merge_cap: int = _DEFAULT_MERGE_CAP,
) -> DataFrame:
    """Rows not dominated on ``cols`` (all >=, one >, under
    ``maximize``; set ``maximize=False`` for minimization).  Rows with
    a NULL criterion are excluded (NULL cannot be compared).  All
    input columns pass through."""
    if not cols or len(set(cols)) != len(cols):
        raise ValueError("cols must be a non-empty list of distinct columns")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    if merge_cap < 1:
        raise ValueError("merge_cap must be positive")

    clean = df
    for c in cols:
        clean = clean.filter(F.col(c).isNotNull())
    work = clean
    flipped = []
    if not maximize:
        # negate criteria once so the kernel is always maximizing
        flipped = [f"__neg_{c}" for c in cols]
        for c, fc in zip(cols, flipped):
            work = work.withColumn(fc, -F.col(c).cast("double"))
    crit = flipped or list(cols)

    schema = work.schema

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(pdf, crit)

    def kernel_iter(batches):
        # per-Arrow-batch prune: a batch-mate-dominated row is globally
        # dominated, so pruning per batch (subset of per partition) is
        # safe — and phase 1 stays zero-shuffle
        for pdf in batches:
            out = kernel(pdf)
            if len(out):
                yield out

    local = work.mapInPandas(kernel_iter, schema)
    if validation_enabled():
        n_candidates = local.localCheckpoint(eager=True).count()
        if n_candidates > merge_cap:
            raise ValueError(
                f"skyline merge phase would see {n_candidates} local-skyline "
                f"candidates (> merge_cap={merge_cap}) — anti-correlated "
                "criteria; raise merge_cap or reduce criteria"
            )
    merged = local.groupBy(F.lit("all")).applyInPandas(
        lambda pdf: kernel(pdf), schema
    )
    return merged.drop(*flipped) if flipped else merged
