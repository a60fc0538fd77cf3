"""Shared input validators for the statistics operators: the loud-
refusal discipline (a silently dropped or truncated row corrupts a
test statistic with no error — worse than failing).

``assert_binary`` checks the RAW column, not an int cast: a double
0.9 truncates to 0 and a string 'yes' casts to NULL, so a cast-based
check would wave both through (found by review r4-2).

The ``skip_validation()`` escape hatch (r4 VERDICT depth ask): every
eager validation guard is a full input scan — 2–3 extra Spark
actions per op call.  At test/interactive scale that cost is the
right default; at 100 TB a caller who has ALREADY validated the
input upstream (e.g. the same frame feeds ten panel ops) pays the
scan once and disables the guards for the rest of the pipeline:

    with skip_validation():
        detect_peaks(df, ...); streak_panel(df, ...)

The flag is process-global and re-entrant; guards consult it via
``validation_enabled()``.  Semantics with validation off are
caller-beware by contract: the op computes exactly what it computes
on whatever rows arrive (the same discipline as Spark's own
ansi-off arithmetic).

Coverage: every guard routed through this module (``assert_binary``)
plus the inline guards of the flagship-path ops (``detect_peaks``,
``rrf_fusion``, ``rank_biased_precision``, ``highest_averages``).
The long tail of per-op inline guards adopts the same
``if validation_enabled():`` gate as each op is next touched — new
guards MUST be written gated."""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_state = threading.local()


def validation_enabled() -> bool:
    """True unless inside a ``skip_validation()`` block (per thread)."""
    return getattr(_state, "depth", 0) == 0


@contextmanager
def skip_validation():
    """Disable eager validation scans for the enclosed op calls."""
    _state.depth = getattr(_state, "depth", 0) + 1
    try:
        yield
    finally:
        _state.depth -= 1


def assert_binary(df: DataFrame, col: str, opname: str) -> None:
    """Raise ValueError unless every non-NULL value of ``col`` is
    exactly 0 or 1 (numerically — ints, longs, doubles 0.0/1.0 and
    booleans all pass; 0.9, 2, 'yes' all refuse)."""
    if not validation_enabled():
        return
    d = F.col(col).try_cast("double")
    n_bad = df.filter(
        F.col(col).isNotNull() & (d.isNull() | ~d.isin([0.0, 1.0]))
    ).count()
    if n_bad:
        raise ValueError(
            f"{opname}: {n_bad} row(s) with non-binary value in "
            f"{col!r} — values must be exactly 0 or 1"
        )
