"""Benford's-law conformance test (L144): the forensic data-quality
check — do leading digits of a naturally-occurring numeric column
follow log10(1 + 1/d)?  Fabricated, truncated, or unit-capped data
visibly deviates (Nigrini's fraud/auditing standard); on a pipeline it
flags synthetic or clipped columns before they poison downstream
statistics.

Semantics: leading digit of |x| for rows with |x| ≥ 1 (values in
(0, 1) have a leading significant digit too, but extracting it needs
log10/pow on every row; the ≥ 1 convention keeps the digit a pure
STRING operation — documented, and the oracle mirrors it).  Output is
one row per digit 1..9: observed count, observed share, expected
Benford share, and the absolute deviation; plus the chi-squared
statistic per row (identical value repeated would be redundant — the
caller sums (o−e)²/e terms if wanted; we emit the per-digit term).

Exactness: counts are exact integers; the digit is a substring (no
float path); shares are single IEEE divisions; expected = log10(1 +
1/d) on literal d (libm, same both engines); the (o−e)²/e term is a
fixed tree.  Ungridded.

Scale: leading-digit extraction is one narrow projection; the tally
is a combinable 9-bucket groupBy — the cheapest possible shape.

No reference counterpart; data-quality forensics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_digits(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """``(digit, n, share, expected, abs_dev, chi2_term)`` for digits
    1..9 over rows with |value| ≥ 1 (NULLs excluded).  Digits absent
    from the data still appear (n = 0) — a missing digit is the
    strongest possible deviation, not an absent row."""
    spark = df.sparkSession
    digits = F.broadcast(
        spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    )
    lead = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.abs(F.col(value_col)).alias("v"))
        .filter(F.col("v") >= 1)
        .select(
            # floor-then-string: a decimal CAST would ROUND (9.5 -> 10,
            # leading digit read as 1); floor(double) -> LONG is loud
            # on overflow under ANSI and never prints scientific form
            F.substring(F.floor(F.col("v")).cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    counts = lead.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    out = (
        digits.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            "total",
        )
    )
    share = F.col("n").cast("double") / F.col("total").cast("double")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    dev = F.abs(share - expected)
    e_cnt = expected * F.col("total").cast("double")
    chi2_term = (
        (F.col("n").cast("double") - e_cnt)
        * (F.col("n").cast("double") - e_cnt)
        / e_cnt
    )
    return out.select(
        "digit",
        "n",
        share.alias("share"),
        expected.alias("expected"),
        dev.alias("abs_dev"),
        chi2_term.alias("chi2_term"),
    )


# second-digit Benford probabilities: sum_k log10(1 + 1/(10k + d)),
# k = 1..9 — pinned double literals (the repr of the python sum; the
# oracle spells the identical values)
_BENFORD2 = (
    0.11967926859688073,
    0.1138901034075564,
    0.10882149900550823,
    0.10432956023095939,
    0.10030820226757937,
    0.09667723580232243,
    0.09337473578303615,
    0.09035198926960332,
    0.08757005357886138,
    0.08499735205769224,
)


def digit_forensics(
    df: DataFrame,
    by: list[str],
    value_col: str,
) -> DataFrame:
    """Digit-forensics panel (L439): ``(by..., n, n2, chi2_second,
    chi2_last, max_dev_last)`` — the fabrication screens BEYOND the
    first-digit Benford test (L144): fabricated numbers drift toward
    uniform FIRST digits but cluster on favorite SECOND digits, and
    invented integers heap on round LAST digits (Nigrini's forensic
    accounting standards):

        chi2_second: observed second-digit counts vs the Benford
        second-digit law (probabilities as pinned double literals —
        Σ_k log10(1+1/(10k+d)); values need ≥ 2 significant digits,
        counted in ``n2``)
        chi2_last: last-digit counts vs UNIFORM(1/10) — the last
        digit of genuine multi-digit measurements is uniform
        max_dev_last: the largest |observed − expected|/n share
        deviation, naming the heaped digit's size

    Digits are extracted from the EXACT decimal string of the
    absolute integer part (the L144 discipline — no float log10
    wobble): second digit = 2nd char when length ≥ 2; last digit =
    final char.  Counts exact integers; each χ² a fixed tree folded
    over the pinned 0..9 digit order.  Values with |x| < 10 are
    excluded from BOTH tests — the single-digit "last" digit is the
    first digit, which follows Benford rather than uniform, so
    including 1..9 would false-flag genuine small-integer-rich data
    (trailing zeros of round multi-digit amounts stay — they ARE the
    signal); NULLs ignored; n2 = 0 → NULL chi2_second.

    No reference counterpart; forensic analytics per SURVEY §2.11."""
    # integer part via explicit floor(abs(.)) — a decimal cast would
    # ROUND, and Spark rounds half-up while DuckDB rounds half-even
    x = F.floor(F.abs(F.col(value_col))).cast("long")
    s = x.cast("string")
    flt = df.filter(F.col(value_col).isNotNull()).select(
        *by, s.alias("_s"), x.alias("_x")
    )
    second = F.when(
        F.length("_s") >= 2, F.substring("_s", 2, 1).cast("int")
    )
    # last-digit uniformity holds for MULTI-digit measurements only: for
    # 1..9 the "last" digit IS the first digit (Benford-distributed), so
    # genuine small-integer-rich data would false-flag — gate on |x| ≥ 10
    # exactly like the second-digit test (r4 ADVICE)
    last = F.when(
        F.length("_s") >= 2, F.substring("_s", -1, 1).cast("int")
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for d in range(10):
        aggs.append(
            F.sum(F.when(second == d, 1).otherwise(0)).alias(f"_s{d}")
        )
        aggs.append(
            F.sum(F.when(last == d, 1).otherwise(0)).alias(f"_l{d}")
        )
    agg = flt.groupBy(*by).agg(*aggs)
    n2 = None
    nl = None
    for d in range(10):
        n2 = F.col(f"_s{d}") if n2 is None else n2 + F.col(f"_s{d}")
        nl = F.col(f"_l{d}") if nl is None else nl + F.col(f"_l{d}")
    n2d = n2.cast("double")
    nld = nl.cast("double")
    chi2_s = None
    for d in range(10):
        e = F.lit(_BENFORD2[d]) * n2d
        t = (F.col(f"_s{d}").cast("double") - e) * (
            F.col(f"_s{d}").cast("double") - e
        ) / e
        chi2_s = t if chi2_s is None else chi2_s + t
    chi2_l = None
    maxdev = None
    for d in range(10):
        e = nld / F.lit(10.0)
        t = (F.col(f"_l{d}").cast("double") - e) * (
            F.col(f"_l{d}").cast("double") - e
        ) / e
        chi2_l = t if chi2_l is None else chi2_l + t
        dev = F.abs(F.col(f"_l{d}").cast("double") / nld - F.lit(0.1))
        maxdev = dev if maxdev is None else F.greatest(maxdev, dev)
    return agg.select(
        *by,
        "n",
        n2.alias("n2"),
        F.when(n2 > 0, chi2_s).alias("chi2_second"),
        F.when(nl > 0, chi2_l).alias("chi2_last"),
        F.when(nl > 0, maxdev).alias("max_dev_last"),
    )


def heaping_panel(
    df: DataFrame,
    by: list[str],
    value_col: str,
) -> DataFrame:
    """Round-number heaping panel (L440): ``(by..., n, n_subunit,
    share_mult5, share_mult10, share_mult100, excess5, excess10,
    excess100)`` — the heaping detector completing the L439 digit
    screens: human-entered and negotiated quantities pile on round
    numbers (self-reported ages, haggled prices, estimated
    durations), and the EXCESS over the uniform-residue expectation
    (1/5, 1/10, 1/100) measures it:

        share_multK = #(x mod K = 0)/n_int,  excessK = share − 1/K

    Multiplicity via EXACT integer modulus on the absolute integer
    part (the L439 digit discipline).  Sub-unit values (|x| < 1)
    floor to 0 and 0 mod K = 0 for every K — a column of rates or
    probabilities would report maximal heaping, the opposite of
    truth — so they are EXCLUDED from the tallies and reported in
    ``n_subunit`` instead; a group that is entirely sub-unit gets
    NULL shares (the screen is inapplicable, and says so) (r4
    ADVICE).  Counts exact, one division per share, excesses fixed
    trees.  NULLs ignored; n = 0 groups absent.  A genuinely
    continuous quantity ≥ 1 shows excess ≈ 0; heaped data shows the
    ladder excess100 < excess10 < excess5 breaking.

    No reference counterpart; forensic analytics per SURVEY §2.11."""
    x = F.floor(F.abs(F.col(value_col))).cast("long")
    flt = df.filter(F.col(value_col).isNotNull()).select(
        *by, x.alias("_x")
    )
    m = F.col("_x") >= 1
    agg = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(~m, 1).otherwise(0)).alias("n_subunit"),
        F.sum(F.when(m, 1).otherwise(0)).alias("_ni"),
        F.sum(F.when(m & (F.col("_x") % 5 == 0), 1).otherwise(0)).alias(
            "_m5"
        ),
        F.sum(
            F.when(m & (F.col("_x") % 10 == 0), 1).otherwise(0)
        ).alias("_m10"),
        F.sum(
            F.when(m & (F.col("_x") % 100 == 0), 1).otherwise(0)
        ).alias("_m100"),
    )
    nd = F.col("_ni").cast("double")
    s5 = F.col("_m5").cast("double") / nd
    s10 = F.col("_m10").cast("double") / nd
    s100 = F.col("_m100").cast("double") / nd
    ok = F.col("_ni") > 0
    return agg.select(
        *by,
        "n",
        "n_subunit",
        F.when(ok, s5).alias("share_mult5"),
        F.when(ok, s10).alias("share_mult10"),
        F.when(ok, s100).alias("share_mult100"),
        F.when(ok, s5 - F.lit(0.2)).alias("excess5"),
        F.when(ok, s10 - F.lit(0.1)).alias("excess10"),
        F.when(ok, s100 - F.lit(0.01)).alias("excess100"),
    )
