"""Survey-weighting calibration (L321/L322): iterative proportional
fitting (raking) — adjust cell weights until both marginal totals
match population targets — and Kish's effective sample size — how
many "real" observations a weighted sample is worth.

L321 — IPF/raking (Deming & Stephan 1940): given seed cell weights
w_rc and target row/column margins R_r, C_c, alternate

    w_rc ← w_rc · R_r / Σ_c w_rc       (row scaling)
    w_rc ← w_rc · C_c / Σ_r w_rc       (column scaling)

for a FIXED iteration count (deterministic — convergence tolerance
checks would make the plan data-dependent; the caller picks iters,
and the emitted ``row_gap``/``col_gap`` report how converged it is).
The bounded cell grid folds ITERATION steps inside the packed array:
the accumulator is the cell-weight LIST, and each step's margin sums
are in-array transforms (O(cells²) per iteration — bounded by
``max_cells``, refused beyond).  Zero margins in the seed where the
target is nonzero make the problem infeasible — refused loudly.

L322 — Kish ESS / design effect:

    ESS = (Σw)² / Σw²,   deff = n / ESS

exact decimal sums, two divisions — the one-line answer to "our
10⁶-row weighted sample behaves like how many unweighted rows".

Scale shape: L321 = three joins to assemble the bounded grid + one
in-array iteration fold.  L322 = ONE combinable aggregation.

No reference counterpart; survey-calibration analytics per SURVEY
§2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .validate import validation_enabled


def ipf_raking(
    cells: DataFrame,
    by: list[str],
    row_col: str,
    col_col: str,
    seed_col: str,
    row_targets: DataFrame,
    col_targets: DataFrame,
    target_col: str = "target",
    iters: int = 10,
    max_cells: int = 10_000,
) -> DataFrame:
    """``(by..., r, c, seed, weight, row_gap, col_gap)`` — raked cell
    weights after ``iters`` row/column scaling passes; see module
    docstring.  ``row_targets``/``col_targets`` carry (by..., key,
    target) rows keyed by the same ``row_col``/``col_col`` names."""
    if iters < 1:
        raise ValueError("ipf_raking: iters must be >= 1")
    flt = cells.filter(
        F.col(row_col).isNotNull()
        & F.col(col_col).isNotNull()
        & F.col(seed_col).isNotNull()
    )
    if validation_enabled():
        n_bad = flt.filter(F.col(seed_col) < 0).count()
        if n_bad:
            raise ValueError(f"ipf_raking: {n_bad} negative seed(s)")
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_cells).count()
        if over:
            raise ValueError(
                f"ipf_raking: a group exceeds max_cells={max_cells}"
            )
    rt = row_targets.select(
        *by,
        F.col(row_col).alias("_r"),
        F.col(target_col).cast("double").alias("_rt"),
    )
    ct = col_targets.select(
        *by,
        F.col(col_col).alias("_c"),
        F.col(target_col).cast("double").alias("_ct"),
    )
    base = flt.select(
        *by,
        F.col(row_col).alias("_r"),
        F.col(col_col).alias("_c"),
        F.col(seed_col).cast("double").alias("_w0"),
    )
    joined = base.join(rt, [*by, "_r"]).join(ct, [*by, "_c"])
    if validation_enabled():
        infeasible = (
            joined.groupBy(*by, "_r", "_rt")
            .agg(F.sum("_w0").alias("_rowsum"))
            .filter((F.col("_rowsum") <= 0) & (F.col("_rt") > 0))
            .count()
        )
        if infeasible:
            raise ValueError(
                f"ipf_raking: {infeasible} row(s) with zero seed mass "
                "but a nonzero target — infeasible; fix the seed"
            )
    packed = joined.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(
                F.struct("_r", "_c", "_w0", "_rt", "_ct")
            )
        ).alias("_lv")
    )

    def row_sum(lv, e):
        return F.aggregate(
            lv,
            F.lit(0.0),
            lambda a, o: a
            + F.when(o["_r"] == e["_r"], o["_w"]).otherwise(
                F.lit(0.0)
            ),
        )

    def col_sum(lv, e):
        return F.aggregate(
            lv,
            F.lit(0.0),
            lambda a, o: a
            + F.when(o["_c"] == e["_c"], o["_w"]).otherwise(
                F.lit(0.0)
            ),
        )

    init = F.transform(
        F.col("_lv"),
        lambda s: F.struct(
            s["_r"].alias("_r"),
            s["_c"].alias("_c"),
            s["_w0"].alias("_w"),
            s["_rt"].alias("_rt"),
            s["_ct"].alias("_ct"),
        ),
    )

    def step(lv, _i):
        rowscaled = F.transform(
            lv,
            lambda e: F.struct(
                e["_r"].alias("_r"),
                e["_c"].alias("_c"),
                (
                    e["_w"] * e["_rt"] / row_sum(lv, e)
                ).alias("_w"),
                e["_rt"].alias("_rt"),
                e["_ct"].alias("_ct"),
            ),
        )
        return F.transform(
            rowscaled,
            lambda e: F.struct(
                e["_r"].alias("_r"),
                e["_c"].alias("_c"),
                (
                    e["_w"] * e["_ct"] / col_sum(rowscaled, e)
                ).alias("_w"),
                e["_rt"].alias("_rt"),
                e["_ct"].alias("_ct"),
            ),
        )

    final = F.aggregate(
        F.sequence(F.lit(1), F.lit(int(iters))), init, step
    )
    staged = packed.select(*by, "_lv", final.alias("_fv"))
    # convergence diagnostics are computed on the FINAL grid
    out = staged.select(
        *by, "_fv", F.explode("_fv").alias("_e")
    ).select(
        *by,
        F.col("_e")["_r"].alias("r"),
        F.col("_e")["_c"].alias("c"),
        F.col("_e")["_w"].alias("weight"),
        F.abs(
            F.aggregate(
                F.col("_fv"),
                F.lit(0.0),
                lambda a, o: a
                + F.when(
                    o["_r"] == F.col("_e")["_r"], o["_w"]
                ).otherwise(F.lit(0.0)),
            )
            - F.col("_e")["_rt"]
        ).alias("row_gap"),
        F.abs(
            F.aggregate(
                F.col("_fv"),
                F.lit(0.0),
                lambda a, o: a
                + F.when(
                    o["_c"] == F.col("_e")["_c"], o["_w"]
                ).otherwise(F.lit(0.0)),
            )
            - F.col("_e")["_ct"]
        ).alias("col_gap"),
    )
    seeds = joined.select(
        *by,
        F.col("_r").alias("r"),
        F.col("_c").alias("c"),
        F.col("_w0").alias("seed"),
    )
    return seeds.join(out, [*by, "r", "c"]).select(
        *by, "r", "c", "seed", "weight", "row_gap", "col_gap"
    )


def kish_ess(
    df: DataFrame,
    by: list[str],
    weight_col: str,
    scale: int = 6,
) -> DataFrame:
    """``(by..., n, ess, deff)`` — Kish effective sample size and
    design effect; see module docstring.  Nonpositive weights
    refused; zero weight mass → NULL."""
    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(weight_col).isNotNull())
    if validation_enabled():
        n_bad = flt.filter(F.col(weight_col) <= 0).count()
        if n_bad:
            raise ValueError(f"kish_ess: {n_bad} nonpositive weight(s)")
    wd = F.col(weight_col).cast(dec)
    agg = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(wd).alias("_s"),
        F.sum(wd * wd).alias("_q"),
    )
    sd_ = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    ess = sd_ * sd_ / qd
    ok = qd > 0.0
    return agg.select(
        *by,
        "n",
        F.when(ok, ess).alias("ess"),
        F.when(ok, F.col("n").cast("double") / ess).alias("deff"),
    )
