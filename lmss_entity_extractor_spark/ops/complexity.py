"""Series-complexity diagnostics (L297/L298): rescaled-range (R/S)
analysis — the Hurst-exponent workhorse asking whether a series is
mean-reverting (H < ½), a random walk (H = ½), or long-range
persistent (H > ½) — and permutation entropy, the ordinal-pattern
complexity score that is invariant to any monotone transform of the
values.

L297 — R/S (Hurst 1951, Mandelbrot-Wallis form): for each block size
m in a fixed ladder, split the series into ⌊n/m⌋ consecutive blocks;
per block compute the range of cumulative mean-deviations R and the
population std S, average R/S over blocks.  H is then the slope of
ln(R/S) on ln(m) — deliberately NOT computed here: the (m, rs_mean)
table composes with the L135 grouped OLS (see the `hurst` contract
query), keeping each op one job.

Every per-block quantity is an order-pinned LEFT FOLD inside the
packed bounded series (the L180 discipline): mean fold, std fold, and
a (cum, max, min) struct-accumulator scan for R.  Blocks with S = 0
are skipped (their R/S is undefined); a size with zero usable blocks
emits NULL rs_mean.

L298 — permutation entropy (Bandt & Pompe 2002), embedding dim 3:
every consecutive triple maps to its ordinal pattern via the three
pairwise comparisons (each in {<, =, >} — tie patterns are counted as
their own symbols rather than silently merged, documented); pattern
counts are exact integers and the Shannon entropy folds over the
bounded sorted pattern cells (≤27), normalized by ln(3!) = ln 6 (the
no-ties pattern count, the standard normalizer).

Scale shape: one (keys) groupBy packing the bounded series (L297) /
two lead windows + one bounded cell fold (L298) — one scan each.

No reference counterpart; forecasting analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def rs_analysis(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    block_sizes: tuple = (8, 16, 32, 64),
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., m, n_blocks, rs_mean)`` — mean rescaled range per
    block size; see module docstring."""
    if any(int(m) < 4 for m in block_sizes) or not block_sizes:
        raise ValueError("rs_analysis: block sizes must all be >= 4")
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"rs_analysis: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(f"rs_analysis: {dups} duplicate order key(s)")
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    staged = packed.select(*by, xs.alias("_xs"))
    n = F.size(F.col("_xs"))

    def _rs_for(m: int):
        mi = F.lit(int(m))
        nb = F.floor(n / mi).cast("int")
        md = F.lit(float(m))

        def _block_rs(b):
            block = F.slice(F.col("_xs"), b * mi + 1, mi)
            mean = (
                F.aggregate(block, F.lit(0.0), lambda a, x: a + x)
                / md
            )
            var = (
                F.aggregate(
                    block,
                    F.lit(0.0),
                    lambda a, x: a + (x - mean) * (x - mean),
                )
                / md
            )
            scan = F.aggregate(
                block,
                F.struct(
                    F.lit(0.0).alias("cum"),
                    F.lit(float("-inf")).alias("mx"),
                    F.lit(float("inf")).alias("mn"),
                ),
                lambda acc, x: F.struct(
                    (acc["cum"] + (x - mean)).alias("cum"),
                    F.greatest(
                        acc["mx"], acc["cum"] + (x - mean)
                    ).alias("mx"),
                    F.least(acc["mn"], acc["cum"] + (x - mean)).alias(
                        "mn"
                    ),
                ),
            )
            return F.when(
                var > 0.0,
                (scan["mx"] - scan["mn"]) / F.sqrt(var),
            )

        rss = F.transform(
            F.sequence(F.lit(0), nb - 1), lambda b: _block_rs(b)
        )
        used = F.filter(rss, lambda v: v.isNotNull())
        k = F.size(used)
        mean_rs = F.when(
            k > 0,
            F.aggregate(used, F.lit(0.0), lambda a, v: a + v)
            / k.cast("double"),
        )
        return F.struct(
            mi.alias("m"), nb.alias("n_blocks"), mean_rs.alias("rs_mean")
        )

    rows = staged.select(
        *by,
        F.explode(
            F.array(*[_rs_for(int(m)) for m in block_sizes])
        ).alias("_r"),
    ).filter(F.col("_r")["n_blocks"] >= 1)
    return rows.select(
        *by,
        F.col("_r")["m"].alias("m"),
        F.col("_r")["n_blocks"].alias("n_blocks"),
        F.col("_r")["rs_mean"].alias("rs_mean"),
    )


def permutation_entropy(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """``(by..., n_windows, k_patterns, h, h_norm)`` — dim-3 ordinal
    pattern entropy; see module docstring."""
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"permutation_entropy: {n_null} NULL value(s)"
            )
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    x0 = F.col("_x0")
    x1 = F.col("_x1")
    x2 = F.col("_x2")
    tri = df.select(
        *by,
        F.col(value_col).alias("_x0"),
        F.lead(value_col, 1).over(wt).alias("_x1"),
        F.lead(value_col, 2).over(wt).alias("_x2"),
    ).filter(x1.isNotNull() & x2.isNotNull())

    def cmp(a, b):
        return (
            F.when(a < b, F.lit(0))
            .when(a == b, F.lit(1))
            .otherwise(F.lit(2))
        )

    pat = (
        cmp(x0, x1) * F.lit(9) + cmp(x0, x2) * F.lit(3) + cmp(x1, x2)
    )
    cells = tri.groupBy(*by, pat.alias("_p")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = cells.groupBy(*by).agg(
        F.sum("_c").alias("n_windows"),
        F.count(F.lit(1)).alias("k_patterns"),
        F.sort_array(F.collect_list(F.struct("_p", "_c"))).alias(
            "_lv"
        ),
    )
    nd = F.col("n_windows").cast("double")
    h = -F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a
        + (e["_c"].cast("double") / nd)
        * F.log(e["_c"].cast("double") / nd),
    )
    return agg.select(
        *by,
        "n_windows",
        "k_patterns",
        F.when(F.col("n_windows") > 0, h).alias("h"),
        F.when(
            F.col("n_windows") > 0,
            h / F.log(F.lit(6.0)),
        ).alias("h_norm"),
    )


def dtw_distance(
    df: DataFrame,
    by: list[str],
    series_col: str,
    series_a: str,
    series_b: str,
    order_col: str,
    value_col: str,
    band: int | None = None,
    max_len: int = 500,
) -> DataFrame:
    """``(by..., n_a, n_b, dtw, dtw_norm)`` — dynamic time warping
    distance (L303, Sakoe-Chiba banded): how far apart are two series
    ALLOWING elastic time shifts — the series-similarity measure for
    comparing usage curves / rollout cohorts whose features happen at
    different speeds, where a pointwise L2 sees only phase error:

        D(i,j) = |aᵢ − bⱼ| + min(D(i−1,j), D(i,j−1), D(i−1,j−1))
        dtw = D(n,m),   dtw_norm = dtw/(n+m)

    The DP table never materializes: the recurrence is a LEFT FOLD
    over rows i with the PREVIOUS DP ROW as a LIST accumulator, and
    each row is itself a left fold over j APPENDING cells (the cell
    needs its left neighbour — exactly what a fold's accumulator
    provides).  An optional Sakoe-Chiba band sets |i−j| > band cells
    to +inf (and the classic +inf borders handle the first row and
    column).  Bounded by ``max_len`` per side (the DP is O(n·m) by
    definition — resample first).  Empty side → NULL.

    Scale shape: one keyed collect (bounded) → in-array DP folds —
    one scan, one shuffle on the group keys.

    No reference counterpart; series-similarity analytics per SURVEY
    §2.11.
    """
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(series_col).isin([series_a, series_b])
    )
    sizes = flt.groupBy(*by, series_col).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"dtw_distance: a series exceeds max_len={max_len} — the "
                "DP is O(n*m); resample first"
            )
    xd = F.col(value_col).cast("double")
    od = F.col(order_col).cast("double")
    packed = flt.groupBy(*by).agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col(series_col) == series_a,
                        F.struct(od.alias("o"), xd.alias("x")),
                    )
                )
            ),
            lambda s: s["x"],
        ).alias("_xa"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col(series_col) == series_b,
                        F.struct(od.alias("o"), xd.alias("x")),
                    )
                )
            ),
            lambda s: s["x"],
        ).alias("_xb"),
    )
    n = F.size("_xa")
    m = F.size("_xb")
    inf = F.lit(float("inf"))
    bandl = F.lit(int(band)) if band is not None else None
    row0 = F.transform(
        F.sequence(F.lit(0), m),
        lambda j: F.when(j == 0, F.lit(0.0)).otherwise(inf),
    )

    def step(prev, i):
        def cell(acc2, j):
            cost = F.abs(
                F.element_at(F.col("_xa"), i)
                - F.element_at(F.col("_xb"), j)
            )
            best = F.least(
                F.element_at(prev, j),
                F.element_at(prev, j + 1),
                F.element_at(acc2, F.size(acc2)),
            )
            val = cost + best
            if bandl is not None:
                val = F.when(
                    F.abs(i - j) > bandl, inf
                ).otherwise(val)
            return F.concat(acc2, F.array(val))

        return F.aggregate(
            F.sequence(F.lit(1), m), F.array(inf), cell
        )

    final_row = F.aggregate(F.sequence(F.lit(1), n), row0, step)
    dtw = F.element_at(final_row, m + 1)
    ok = (n > 0) & (m > 0) & (dtw != inf)
    out = packed.select(
        *by,
        n.alias("n_a"),
        m.alias("n_b"),
        F.when(ok, dtw).alias("dtw"),
        F.when(ok, dtw / (n + m).cast("double")).alias("dtw_norm"),
    )
    return out


def sample_entropy(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    r: float,
    max_len: int = 1000,
) -> DataFrame:
    """``(by..., n, b_matches, a_matches, sampen)`` — sample entropy
    (L313, Richman & Moorman 2000), m = 2: the regularity measure on
    the VALUE scale (permutation entropy L298 is its ordinal sibling)
    — low SampEn = new patterns repeat old ones (regular), high =
    every new window is a surprise:

        B = #{i<j : both 2-templates match within r}
        A = #{i<j : both 3-templates match within r}
        SampEn = −ln(A/B)

    (template match = every aligned |difference| ≤ r; the tolerance r
    is the caller's literal, classically 0.2·σ).  Convention: length-m
    templates start at i ≤ n−m for EACH m (the common implementation
    variant; Richman-Moorman's original caps both counts at n−2 —
    documented so the oracle and tests pin one choice).  Match counts
    are
    EXACT integers from nested in-array index folds over the packed
    bounded series (the L161 ``max_len`` contract — SampEn is O(n²)
    by definition); comparisons are plain double comparisons, no
    accumulation.  A = 0 or B = 0 → NULL sampen.

    Scale shape: one keyed collect (bounded) → in-array pair folds.

    No reference counterpart; series-complexity analytics per SURVEY
    §2.11.
    """
    if not r > 0:
        raise ValueError("sample_entropy: r must be > 0")
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"sample_entropy: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"sample_entropy: {dups} duplicate order key(s)"
            )
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    staged = packed.select(*by, xs.alias("_xs"))
    n = F.size(F.col("_xs"))
    rl = F.lit(float(r))

    def _near(i, j, off):
        return (
            F.abs(
                F.element_at(F.col("_xs"), i + off)
                - F.element_at(F.col("_xs"), j + off)
            )
            <= rl
        )

    def _count(m):
        last = n - m
        return F.aggregate(
            F.sequence(F.lit(1), last - 1),
            F.lit(0).cast("long"),
            lambda a, i: a
            + F.aggregate(
                F.sequence(i + 1, last),
                F.lit(0).cast("long"),
                lambda a2, j: a2
                + F.when(
                    # all m aligned offsets within r
                    (
                        _near(i, j, 0)
                        if m == 2
                        else (_near(i, j, 0) & _near(i, j, 1))
                    )
                    & _near(i, j, m - 1),
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
        )

    b = _count(2)
    a = _count(3)
    s1 = staged.select(
        *by,
        n.alias("n"),
        F.when(n >= 3, b).alias("b_matches"),
        F.when(n >= 4, a).alias("a_matches"),
    )
    ok = (F.col("b_matches") > 0) & (F.col("a_matches") > 0)
    return s1.select(
        *by,
        "n",
        "b_matches",
        "a_matches",
        F.when(
            ok,
            -F.log(
                F.col("a_matches").cast("double")
                / F.col("b_matches").cast("double")
            ),
        ).alias("sampen"),
    )


def hjorth_parameters(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """Hjorth parameters (L381): ``(by..., n, activity, mobility,
    complexity)`` — the classic three-number time-domain signal
    summary (Hjorth 1970, the EEG standard; the cheap screening
    companion to the L299/L313 entropy family):

        activity   = Var(x)                      (the power)
        mobility   = √(Var(Δx)/Var(x))           (the mean frequency)
        complexity = √(Var(Δ²x)/Var(Δx)) / mobility
                                                 (bandwidth vs a pure
                                                  sine, which scores 1)

    Variances are POPULATION variances (pinned — Hjorth's original
    moment definition), each from exact DECIMAL sufficient statistics
    over the respective series (x on n points, Δx on n−1, Δ²x on
    n−2): differences of DECIMAL(18,scale) values are exact, re-cast
    to (18,scale) before squaring per the 8fe91f8 product-width
    discipline, so every sum is order-insensitive and each parameter
    is one fixed IEEE tree.  ``order_col`` must totally order each
    series (the L374 contract — ties would make Δx partition-
    dependent).  NULL mobility when n < 2 or Var(x) = 0 (a constant
    signal has no frequency); NULL complexity when n < 3 or
    Var(Δx) = 0.

    Scale shape: ONE keyed window pass (two lags ride the same sort)
    + one combinable aggregation; 100 TB scanned once, no wide rows.

    No reference counterpart; series analytics per SURVEY §2.11."""
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    )
    xd = F.col(value_col).cast(dec)
    # both lags ride one window sort; Δ²x spelled x − 2·x₋₁ + x₋₂ so it
    # exists from the third point on without a second window pass
    base = flt.select(*by, F.col(order_col).alias("_o"), xd.alias("_x"))
    w2 = Window.partitionBy(*by).orderBy("_o")
    diffed = base.select(
        *by,
        "_x",
        (F.col("_x") - F.lag("_x", 1).over(w2)).cast(dec).alias("_dx"),
        (
            F.col("_x")
            - F.lit(2) * F.lag("_x", 1).over(w2)
            + F.lag("_x", 2).over(w2)
        )
        .cast(dec)
        .alias("_ddx"),
    )
    agg = diffed.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.count("_dx").alias("_n1"),
        F.sum("_dx").alias("_sdx"),
        F.sum(F.col("_dx") * F.col("_dx")).alias("_sdxx"),
        F.count("_ddx").alias("_n2"),
        F.sum("_ddx").alias("_sddx"),
        F.sum(F.col("_ddx") * F.col("_ddx")).alias("_sddxx"),
    )

    def _pvar(n, s, q):
        nd = n.cast("double")
        return (nd * q.cast("double") - s.cast("double") * s.cast("double")) / (
            nd * nd
        )

    act = _pvar(F.col("n"), F.col("_sx"), F.col("_sxx"))
    vdx = _pvar(F.col("_n1"), F.col("_sdx"), F.col("_sdxx"))
    vddx = _pvar(F.col("_n2"), F.col("_sddx"), F.col("_sddxx"))
    mob_ok = (F.col("n") >= 2) & (act > F.lit(0.0))
    cpx_ok = mob_ok & (F.col("n") >= 3) & (vdx > F.lit(0.0))
    return agg.select(
        *by,
        "n",
        act.alias("activity"),
        F.when(mob_ok, F.sqrt(vdx / act)).alias("mobility"),
        F.when(cpx_ok, F.sqrt(vddx / vdx) / F.sqrt(vdx / act)).alias(
            "complexity"
        ),
    )


def lz_complexity(
    df: DataFrame,
    by: list[str],
    order_col: str,
    symbol_col: str,
    max_len: int = 2048,
) -> DataFrame:
    """Lempel-Ziv (LZ76) complexity (L382): ``(by..., n, k, c_lz,
    c_norm)`` — how many distinct phrases an exhaustive left-to-right
    parse of the symbol sequence needs: the compressibility-based
    complexity score (Lempel & Ziv 1976; the standard EEG/ECG and
    repetitive-text diagnostic, the value-free companion to L299's
    ordinal and L313's amplitude entropies).  Parsing convention
    (pinned, the simple exhaustive variant): grow the current phrase
    one symbol at a time; if the grown phrase occurs in the text seen
    so far MINUS its final symbol, keep growing, else close the
    phrase (c += 1) and start a new one; a non-empty trailing phrase
    counts.  Random sequences approach c ≈ n/log_k(n), so

        c_norm = c·ln(n) / (n·ln(k))    → ~1 for noise, →0 for
                                          highly repetitive input

    (NULL when the alphabet has k < 2 symbols).  Symbols must be
    SINGLE characters (REFUSED otherwise — multi-char symbols would
    let phrase boundaries fall inside a symbol; SAX-symbolize L192
    first), ``order_col`` integer and unique per key (the L374
    contract), series beyond ``max_len`` REFUSED (the parse is one
    sequential fold — the L180 bounded-series discipline).

    Scale shape: one combinable collect per key over the bounded
    series, then a per-key in-row fold; 100 TB of keys parallelize
    across the cluster while each key's parse stays sequential by
    mathematical necessity (each step reads the text the previous
    steps built).

    No reference counterpart; series analytics per SURVEY §2.11."""
    flt = df.filter(
        F.col(order_col).isNotNull() & F.col(symbol_col).isNotNull()
    ).select(
        *by,
        F.col(order_col).cast("long").alias("_o"),
        F.col(symbol_col).cast("string").alias("_s"),
    )
    if validation_enabled():
        n_bad = flt.filter(F.length("_s") != 1).count()
        if n_bad:
            raise ValueError(
                f"lz_complexity: {n_bad} symbol(s) are not single "
                "characters — symbolize first (e.g. L192 SAX)"
            )
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"lz_complexity: a series exceeds max_len={max_len} — "
                "the parse is a sequential fold; chunk or sample first"
            )
    packed = flt.groupBy(*by).agg(
        F.sort_array(F.collect_list(F.struct("_o", "_s"))).alias("_a")
    )
    init = F.struct(
        F.lit("").alias("pre"),
        F.lit("").alias("cur"),
        F.lit(0).alias("c"),
    )

    def _step(acc, x):
        cur2 = F.concat(acc["cur"], x["_s"])
        t = F.concat(acc["pre"], cur2)
        body = F.substring(t, 1, F.length(t) - F.lit(1))
        hit = F.contains(body, cur2)
        return F.struct(
            F.when(hit, acc["pre"]).otherwise(t).alias("pre"),
            F.when(hit, cur2).otherwise(F.lit("")).alias("cur"),
            F.when(hit, acc["c"]).otherwise(acc["c"] + F.lit(1)).alias(
                "c"
            ),
        )

    folded = packed.select(
        *by,
        F.size("_a").cast("long").alias("n"),
        F.size(
            F.array_distinct(F.transform("_a", lambda x: x["_s"]))
        ).cast("long").alias("k"),
        F.aggregate(F.col("_a"), init, _step).alias("_acc"),
    )
    c_total = (
        F.col("_acc")["c"]
        + F.when(F.col("_acc")["cur"] != "", F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    return folded.select(
        *by,
        "n",
        "k",
        c_total.alias("c_lz"),
        F.when(
            (F.col("k") >= 2) & (F.col("n") >= 2),
            c_total.cast("double") * F.log(nd) / (nd * F.log(kd)),
        ).alias("c_norm"),
    )
