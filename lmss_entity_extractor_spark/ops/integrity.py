"""Cross-table integrity audits: referential-integrity (FK orphan)
checks and functional-dependency violation discovery.

The expectations module (L113) validates ROW-LOCAL rules; these two
operators audit the properties a single row can never witness — does a
key exist in another table, and does one column set determine another
across the whole table.  Both are the audits a pipeline runs before
trusting a join or a dedup key at 100 TB: an orphaned foreign key
silently drops rows from inner joins, and a broken A→B dependency means
"group by A, take any B" is nondeterministic.

Scale shape: fk_orphans is ONE anti join (broadcast when the parent key
set is small, shuffle-hash otherwise — Catalyst's choice) + one bounded
deterministic sample; fd_violations is two cascaded combinable groupBys
(det+dep, then det) — no windows, no collects beyond the sample cap.

No reference counterpart; data-quality extension per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .validate import validation_enabled


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk_cols: list[str],
    pk_cols: list[str],
    sample: int = 5,
) -> DataFrame:
    """``(n_child, n_fk_nonnull, n_orphan_rows, n_orphan_keys,
    orphan_rate, sample_keys)`` — referential-integrity audit (L343):
    which child rows point at a parent key that does not exist.

    Standard FK semantics: a child row with ANY NULL fk column is
    exempt (not checked, not an orphan) — that is what SQL FOREIGN KEY
    does.  Orphans come from one LEFT ANTI join on the key equality;
    ``sample_keys`` is the ``sample`` LEXICALLY SMALLEST distinct
    orphan key strings ('|'-joined), so the audit row is deterministic
    and safely collectible at any scale.  ``orphan_rate`` is one
    double division over exact counts; 0 checked rows → NULL rate.
    """
    if len(fk_cols) != len(pk_cols) or not fk_cols:
        raise ValueError(
            "fk_orphans: fk_cols and pk_cols must be same-length, non-empty"
        )
    if int(sample) < 0:
        raise ValueError("fk_orphans: sample must be >= 0")
    nonnull = child.filter(
        F.lit(True)
        & F.expr(
            " AND ".join(f"`{c}` IS NOT NULL" for c in fk_cols)
        )
    )
    keyed = nonnull.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(fk_cols)]
    )
    pkeys = parent.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(pk_cols)]
    ).dropDuplicates()
    orphans = keyed.join(
        pkeys, [f"_k{i}" for i in range(len(fk_cols))], "left_anti"
    )
    okey = F.concat_ws(
        "|", *[F.col(f"_k{i}").cast("string") for i in range(len(fk_cols))]
    )
    orphan_stats = orphans.agg(
        F.count(F.lit(1)).alias("n_orphan_rows"),
        F.count_distinct(
            *[F.col(f"_k{i}") for i in range(len(fk_cols))]
        ).alias("n_orphan_keys"),
    )
    sample_df = (
        orphans.select(okey.alias("_key"))
        .distinct()
        .orderBy("_key")
        .limit(int(sample))
        .agg(F.sort_array(F.collect_list("_key")).alias("sample_keys"))
    )
    totals = child.agg(
        F.count(F.lit(1)).alias("n_child"),
    )
    nn = nonnull.agg(F.count(F.lit(1)).alias("n_fk_nonnull"))
    row = (
        totals.crossJoin(nn)
        .crossJoin(orphan_stats)
        .crossJoin(sample_df)
    )
    rate = F.when(
        F.col("n_fk_nonnull") > 0,
        F.col("n_orphan_rows").cast("double")
        / F.col("n_fk_nonnull").cast("double"),
    )
    return row.select(
        "n_child",
        "n_fk_nonnull",
        "n_orphan_rows",
        "n_orphan_keys",
        rate.alias("orphan_rate"),
        "sample_keys",
    )


def fd_violations(
    df: DataFrame,
    det_cols: list[str],
    dep_cols: list[str],
) -> DataFrame:
    """``(det..., n_rows, n_dep)`` — functional-dependency audit
    (L344): every determinant group where ``det_cols → dep_cols``
    FAILS, i.e. the group maps to more than one distinct dependent
    tuple.  The check a survivorship/dedup key must pass before
    "group by A, take the B" is deterministic.

    NULL is a VALUE here (two NULL-dep rows agree; NULL vs 'x' is a
    violation) — achieved by grouping rather than count(distinct),
    which would silently drop NULL tuples.  Two cascaded combinable
    aggregations; violating groups only (an empty result IS the
    pass signal).
    """
    if not det_cols or not dep_cols:
        raise ValueError(
            "fd_violations: det_cols and dep_cols must be non-empty"
        )
    overlap = set(det_cols) & set(dep_cols)
    if overlap:
        raise ValueError(
            f"fd_violations: columns {sorted(overlap)} on both sides"
        )
    pairs = df.groupBy(*det_cols, *dep_cols).agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_det = pairs.groupBy(*det_cols).agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_dep"),
    )
    return per_det.filter(F.col("n_dep") > 1)


def sequence_audit(
    df: DataFrame,
    by: list[str],
    idx_col: str,
    base: int = 0,
) -> DataFrame:
    """``(by..., n, min_idx, max_idx, n_dupes, n_gaps, contiguous)``
    — per-key sequence-integrity audit (L345): is an index column a
    clean ``base, base+1, …`` run — the invariant every ordered
    ingest (conversation turn_idx, changelog LSN, page number) is
    supposed to hold and silently breaks under retries, loss, or
    reordering:

        n_dupes = n − n_distinct          (repeated indices)
        n_gaps  = (max−min+1) − n_distinct (missing indices in-range)
        contiguous = min==base ∧ n_dupes==0 ∧ n_gaps==0

    Exact integer arithmetic over one combinable agg (count-distinct
    is the only shuffle-widening piece, and it is exact — no sketch).
    NULL indices refused loudly: an ordering column with NULLs has no
    defined audit.
    """
    if validation_enabled():
        n_null = df.filter(F.col(idx_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"sequence_audit: {n_null} NULL index value(s) — an "
                "ordering column must be NULL-free"
            )
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(idx_col)).alias("_nd"),
        F.min(idx_col).cast("long").alias("min_idx"),
        F.max(idx_col).cast("long").alias("max_idx"),
    )
    n_dupes = F.col("n") - F.col("_nd")
    n_gaps = (
        F.col("max_idx") - F.col("min_idx") + F.lit(1) - F.col("_nd")
    )
    return agg.select(
        *by,
        "n",
        "min_idx",
        "max_idx",
        n_dupes.alias("n_dupes"),
        n_gaps.alias("n_gaps"),
        (
            (F.col("min_idx") == F.lit(int(base)))
            & (n_dupes == 0)
            & (n_gaps == 0)
        ).alias("contiguous"),
    )


def inclusion_audit(
    left: DataFrame,
    right: DataFrame,
    pairs: list[tuple[str, str]],
    max_pairs: int = 64,
) -> DataFrame:
    """Inclusion-dependency audit (L385): ``(lhs_col, rhs_col, n_lhs,
    n_missing, containment, holds, sample_missing)`` — for each
    candidate (lhs ⊆ rhs) column pair, does every distinct non-NULL
    value of ``left.lhs`` appear in ``right.rhs``?  The schema-
    discovery primitive behind "which column is secretly a foreign
    key" (Bauckmann et al., SPIDER) — where L343 AUDITS a declared FK,
    this DISCOVERS candidates by measuring containment:

        containment = (n_lhs − n_missing) / n_lhs
        holds       = (n_missing = 0)

    NULLs are exempt on both sides (SQL IND semantics, as in L343).
    ``sample_missing`` is the lexically-smallest missing value as a
    string — a deterministic, collectible witness (the L343 sample
    discipline).  Column pairs must be same-typed (engine-dependent
    implicit coercions are REFUSED — cast explicitly upstream);
    ``pairs`` is bounded by ``max_pairs`` (each pair costs a distinct
    + an anti join — a bounded audit, not an unbounded n² sweep).

    Scale shape: per pair, distinct-shrink BOTH sides first (the
    anti join runs on the distinct value sets, which are the small
    relations), then one anti join; pairs are independent jobs.

    No reference counterpart; data-quality analytics per SURVEY §2.11
    (composes with L343 fk_orphans and L103 profile_table)."""
    if not pairs:
        raise ValueError("inclusion_audit: pairs must be non-empty")
    if len(pairs) > max_pairs:
        raise ValueError(
            f"inclusion_audit: {len(pairs)} pairs > max_pairs="
            f"{max_pairs} — audit in bounded batches"
        )
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    out = None
    for lhs, rhs in pairs:
        if ltypes[lhs] != rtypes[rhs]:
            raise ValueError(
                f"inclusion_audit: {lhs} ({ltypes[lhs]}) and {rhs} "
                f"({rtypes[rhs]}) differ in type — cast explicitly "
                "(implicit coercion is engine-dependent)"
            )
        dl = (
            left.filter(F.col(lhs).isNotNull())
            .select(F.col(lhs).alias("_v"))
            .distinct()
        )
        dr = (
            right.filter(F.col(rhs).isNotNull())
            .select(F.col(rhs).alias("_v"))
            .distinct()
        )
        missing = dl.join(dr, "_v", "left_anti")
        a = dl.agg(F.count(F.lit(1)).alias("n_lhs"))
        b = missing.agg(
            F.count(F.lit(1)).alias("n_missing"),
            F.min(F.col("_v").cast("string")).alias("sample_missing"),
        )
        row = a.crossJoin(b).select(
            F.lit(lhs).alias("lhs_col"),
            F.lit(rhs).alias("rhs_col"),
            F.col("n_lhs"),
            F.col("n_missing"),
            F.when(
                F.col("n_lhs") > 0,
                (F.col("n_lhs") - F.col("n_missing")).cast("double")
                / F.col("n_lhs").cast("double"),
            ).alias("containment"),
            (F.col("n_missing") == 0).alias("holds"),
            F.col("sample_missing"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def candidate_keys(
    df: DataFrame,
    candidates: list[list[str]],
    max_candidates: int = 64,
) -> DataFrame:
    """Candidate-key audit (L386): ``(key_cols, n_rows, n_null_rows,
    n_distinct, n_dup_groups, max_group_rows, uniqueness, is_key)`` —
    for each candidate column COMBINATION, is it a key?  The combo-
    level question L103's per-column distinct counts can't answer
    (two 99%-unique columns may or may not be unique together), and
    the discovery complement of L344's FD check:

        uniqueness = n_distinct / (n_rows − n_null_rows)
        is_key     = no NULLs anywhere AND every group has one row

    SQL key semantics: a row with ANY NULL in the combo disqualifies
    it as a key row (counted in ``n_null_rows``, excluded from the
    uniqueness ratio — NULLs can't be PRIMARY KEY values).  All
    counts are exact; ``uniqueness`` is one division (NULL when no
    non-NULL rows).  ``candidates`` is bounded by ``max_candidates``
    (each costs one keyed shuffle — a bounded audit, not the 2^k
    lattice sweep; callers walk the lattice level by level).

    Scale shape: per candidate, ONE combinable groupBy on the combo
    followed by a tiny aggregate-of-groups; candidates are
    independent jobs over one cached scan.

    No reference counterpart; data-quality analytics per SURVEY
    §2.11."""
    if not candidates:
        raise ValueError("candidate_keys: candidates must be non-empty")
    if len(candidates) > max_candidates:
        raise ValueError(
            f"candidate_keys: {len(candidates)} candidates > "
            f"max_candidates={max_candidates} — audit level by level"
        )
    out = None
    for combo in candidates:
        if not combo:
            raise ValueError("candidate_keys: empty column combo")
        has_null = None
        for c in combo:
            t = F.col(c).isNull()
            has_null = t if has_null is None else (has_null | t)
        grouped = df.groupBy(*combo).agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.max(has_null.cast("int")).alias("_isnull"),
        )
        nn = F.col("_isnull") == 0
        row = grouped.agg(
            F.sum("_cnt").alias("n_rows"),
            F.sum(F.when(~nn, F.col("_cnt")).otherwise(F.lit(0))).alias(
                "n_null_rows"
            ),
            F.sum(F.when(nn, F.lit(1)).otherwise(F.lit(0))).alias(
                "n_distinct"
            ),
            F.sum(
                F.when(nn & (F.col("_cnt") >= 2), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_dup_groups"),
            F.max(F.when(nn, F.col("_cnt"))).alias("max_group_rows"),
        ).select(
            F.lit(",".join(combo)).alias("key_cols"),
            "n_rows",
            "n_null_rows",
            "n_distinct",
            "n_dup_groups",
            "max_group_rows",
            F.when(
                (F.col("n_rows") - F.col("n_null_rows")) > 0,
                F.col("n_distinct").cast("double")
                / (F.col("n_rows") - F.col("n_null_rows")).cast(
                    "double"
                ),
            ).alias("uniqueness"),
            (
                (F.col("n_null_rows") == 0)
                & (F.col("n_distinct") == F.col("n_rows"))
            ).alias("is_key"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def checksum_audit(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scheme: str = "luhn",
    sample: int = 5,
) -> DataFrame:
    """Checksum-validation audit (L397): ``(by..., n, n_null,
    n_malformed, n_valid, n_invalid, valid_rate, sample_invalid)`` —
    do identifier columns carry their own integrity proof?  Card
    numbers, IMEIs, national IDs (Luhn mod-10) and ISO 7064
    MOD 97-10 reference numbers validate algorithmically; a rising
    invalid rate is a pipeline-corruption alarm no FK join (L343)
    can see.  Schemes (pinned):

      ``luhn``   — after stripping spaces and dashes the value must
                   be all digits, length ≥ 2 (else MALFORMED); from
                   the RIGHT, every second digit doubles with digit
                   sum (2d − 9 when 2d > 9); valid ⇔ total % 10 = 0.
      ``mod97``  — digits-only, length ≥ 3; the running fold
                   acc = (acc·10 + d) mod 97 over the string left to
                   right; valid ⇔ acc = 1 (ISO 7064 MOD 97-10 pure
                   form; IBAN's letter substitution is upstream
                   normalization, documented out of scope).

    Both checks run INSIDE the row as a bounded fold over the
    character positions (JVM higher-order functions, no UDF, zero
    shuffle before one combinable agg).  NULLs count separately
    (``n_null``); ``valid_rate`` = n_valid/(n_valid+n_invalid) — the
    one IEEE division, NULL when no well-formed rows.
    ``sample_invalid`` is the ``sample`` lexically-smallest invalid
    values (the L343 bounded witness discipline; malformed included).

    Scale shape: one narrow projection + one combinable groupBy.

    No reference counterpart; data-quality analytics per SURVEY
    §2.11 (completes L343/L344/L345/L385/L386)."""
    if scheme not in ("luhn", "mod97"):
        raise ValueError(f"checksum_audit: unknown scheme {scheme!r}")
    if sample < 0:
        raise ValueError("checksum_audit: sample must be >= 0")
    raw = F.col(value_col).cast("string")
    s = F.regexp_replace(raw, r"[ -]", "")
    n_ = F.length(s)
    min_len = 2 if scheme == "luhn" else 3
    well = raw.isNotNull() & s.rlike(r"^[0-9]+$") & (n_ >= min_len)
    # per-position digit: ascii(substr) - 48, folded over 1..len
    if scheme == "luhn":
        total = F.aggregate(
            F.sequence(F.lit(1), n_),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                ((n_ - i + 1) % 2) == 0,
                F.when(
                    (F.ascii(F.substring(s, i, 1)) - 48) * 2 > 9,
                    (F.ascii(F.substring(s, i, 1)) - 48) * 2 - 9,
                ).otherwise((F.ascii(F.substring(s, i, 1)) - 48) * 2),
            ).otherwise(F.ascii(F.substring(s, i, 1)) - 48),
        )
        valid = well & ((total % 10) == 0)
    else:
        acc97 = F.aggregate(
            F.sequence(F.lit(1), n_),
            F.lit(0),
            lambda acc, i: (
                acc * 10 + (F.ascii(F.substring(s, i, 1)) - 48)
            ) % 97,
        )
        valid = well & (acc97 == 1)
    staged = df.select(
        *by,
        raw.alias("_raw"),
        well.alias("_well"),
        F.when(raw.isNotNull() & ~well, True)
        .otherwise(False)
        .alias("_malformed"),
        F.coalesce(valid, F.lit(False)).alias("_valid"),
    )
    agg = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_raw").isNull(), 1).otherwise(0)).alias(
            "n_null"
        ),
        F.sum(F.when(F.col("_malformed"), 1).otherwise(0)).alias(
            "n_malformed"
        ),
        F.sum(
            F.when(F.col("_well") & F.col("_valid"), 1).otherwise(0)
        ).alias("n_valid"),
        F.sum(
            F.when(F.col("_well") & ~F.col("_valid"), 1).otherwise(0)
        ).alias("n_invalid"),
        F.slice(
            F.array_sort(
                F.collect_set(
                    F.when(
                        F.col("_raw").isNotNull() & ~F.col("_valid"),
                        F.col("_raw"),
                    )
                )
            ),
            1,
            sample,
        ).alias("sample_invalid"),
    )
    return agg.select(
        *by,
        "n",
        "n_null",
        "n_malformed",
        "n_valid",
        "n_invalid",
        F.when(
            (F.col("n_valid") + F.col("n_invalid")) > 0,
            F.col("n_valid").cast("double")
            / (F.col("n_valid") + F.col("n_invalid")).cast("double"),
        ).alias("valid_rate"),
        "sample_invalid",
    )
