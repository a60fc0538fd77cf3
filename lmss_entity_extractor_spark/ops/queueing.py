"""Erlang capacity panel (L395): blocking and queueing probabilities
for offered load — the capacity-planning analytics (trunk sizing,
worker-pool sizing, GPU-slot provisioning) that turn the arrival
statistics the rest of the engine computes (rates, TWAP, dispersion)
into a provisioning decision:

    Erlang B (loss system M/M/s/s):   B(s, a) via the exact
    recurrence  B₀ = 1,  Bₖ = a·Bₖ₋₁ / (k + a·Bₖ₋₁)
    Erlang C (queueing M/M/s):        C = s·B / (s − a·(1 − B)),
    defined only for a < s (otherwise the queue is unstable → NULL)

with offered load ``a`` in Erlangs (arrival rate × mean holding
time).  The recurrence is numerically stable (each Bₖ ∈ (0,1]) and
is evaluated as ONE bounded in-row fold over ``sequence(1, s)`` —
per-row, zero-shuffle, embarrassingly parallel; ``s`` is bounded by
``max_servers`` (REFUSED loudly beyond — the bounded-fold contract).
Every step is the same two-op IEEE tree in both engines, so results
are bit-identical and ungridded.  Utilization ρ = a/s rides along.

Refusals: NULL or non-positive load, NULL or non-integer-positive
server counts (a capacity scenario with a missing side is a bug).

No reference counterpart; analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .validate import validation_enabled


def erlang_panel(
    df: DataFrame,
    load_col: str,
    servers_col: str,
    max_servers: int = 10_000,
) -> DataFrame:
    """Input columns preserved plus ``(blocking, delay_prob,
    utilization)`` — see module docstring."""
    if validation_enabled():
        bad = df.filter(
            F.col(load_col).isNull()
            | (F.col(load_col) <= 0)
            | F.col(servers_col).isNull()
            | (F.col(servers_col) < 1)
        ).count()
        if bad:
            raise ValueError(
                f"erlang_panel: {bad} row(s) with NULL/non-positive "
                f"{load_col!r} or invalid {servers_col!r}"
            )
    if validation_enabled():
        wide = df.filter(F.col(servers_col) > max_servers).count()
        if wide:
            raise ValueError(
                f"erlang_panel: {wide} row(s) with {servers_col!r} > "
                f"max_servers={max_servers} — the per-row fold is O(s); "
                "raise the cap deliberately"
            )
    a = F.col(load_col).cast("double")
    s = F.col(servers_col).cast("int")
    sd = F.col(servers_col).cast("double")
    b = F.aggregate(
        F.sequence(F.lit(1), s),
        F.lit(1.0),
        lambda acc, k: (a * acc) / (k.cast("double") + a * acc),
    )
    c = F.when(
        a < sd, (sd * b) / (sd - a * (F.lit(1.0) - b))
    )
    return df.select(
        "*",
        b.alias("blocking"),
        c.alias("delay_prob"),
        (a / sd).alias("utilization"),
    )
