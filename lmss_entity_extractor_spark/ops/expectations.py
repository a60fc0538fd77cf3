"""Declarative data-quality expectations (L113): the Delta-Live-Tables
/ Great-Expectations contract surface — a rule list evaluated over a
table in as few passes as the rule mix allows, producing an auditable
violation summary and a row-level quarantine split.

Rule grammar (plain tuples — serializable, diffable, no DSL):

    ("not_null", col)                  NULL is the violation
    ("in_range", col, lo, hi)          inclusive; NULL passes (compose
                                       with not_null to forbid it)
    ("regex", col, pattern)            full-match; NULL passes
    ("in_set", col, [v, ...])          NULL passes
    ("unique", [col, ...])             every row of a key group with
                                       count > 1 is a violation
    ("ref", col, dim_df, dim_col)      referential integrity; NULL
                                       passes (SQL FK semantics)

Execution shape — the 100 TB discipline is pass-fusion:

* ALL row-local rules (not_null / in_range / regex / in_set) fold into
  ONE aggregation over ONE scan: each rule is a ``sum(cast(violated as
  long))`` column, map-side combinable, whole-stage codegen.
* each ``unique`` rule is one keyed count (map-side combinable) —
  unavoidable shuffle, one per rule;
* each ``ref`` rule is one broadcast left-anti count against the
  DISTINCT dim keys (dims are broadcastable by definition here; a
  fact×fact referential check should be a bloom_semi_join (L110)
  pre-screen instead — documented trade).

``quarantine`` applies the same rules row-wise and splits the input:
rows with an empty ``violated`` array are clean.  Group rules mark via
a window count (unique) and a broadcast left join flag (ref) — no
second scan of the fact.

No reference counterpart; the reference validates nothing (its index
is trusted input, `app/lmss_classification.py` assumes well-formed
embeddings) — at pipeline scale, trust is a rule list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_ROW_LOCAL = ("not_null", "in_range", "regex", "in_set")


def _rule_id(i: int, rule: tuple) -> str:
    kind = rule[0]
    target = rule[1]
    if isinstance(target, (list, tuple)):
        target = ",".join(target)
    return f"r{i:02d}_{kind}_{target}"


def _validate_rules(df: DataFrame, rules: list[tuple]) -> None:
    if not rules:
        raise ValueError("rules must be a non-empty list")
    for rule in rules:
        kind = rule[0]
        if kind in _ROW_LOCAL:
            col = rule[1]
            if col not in df.columns:
                raise ValueError(f"rule {rule!r}: column {col!r} not in DataFrame")
            if kind == "in_range" and len(rule) != 4:
                raise ValueError(f"in_range needs (kind, col, lo, hi), got {rule!r}")
            if kind == "regex" and (len(rule) != 3 or not isinstance(rule[2], str)):
                raise ValueError(f"regex needs (kind, col, pattern), got {rule!r}")
            if kind == "in_set" and (len(rule) != 3 or not rule[2]):
                raise ValueError(f"in_set needs (kind, col, non-empty values), got {rule!r}")
        elif kind == "unique":
            cols = rule[1]
            if not cols or any(c not in df.columns for c in cols):
                raise ValueError(f"rule {rule!r}: key columns must exist")
        elif kind == "ref":
            if len(rule) != 4 or not isinstance(rule[2], DataFrame):
                raise ValueError(f"ref needs (kind, col, dim_df, dim_col), got {rule!r}")
            col, dim, dim_col = rule[1], rule[2], rule[3]
            if col not in df.columns:
                raise ValueError(f"rule {rule!r}: column {col!r} not in DataFrame")
            if dim_col not in dim.columns:
                raise ValueError(f"rule {rule!r}: column {dim_col!r} not in dim")
        else:
            raise ValueError(f"unknown rule kind {kind!r}")


def _row_violation(rule: tuple) -> Column:
    """Boolean column: this row violates this row-local rule."""
    kind, col = rule[0], F.col(rule[1])
    if kind == "not_null":
        return col.isNull()
    if kind == "in_range":
        return col.isNotNull() & ~col.between(F.lit(rule[2]), F.lit(rule[3]))
    if kind == "regex":
        return col.isNotNull() & ~col.rlike(rule[2])
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(list(rule[2]))
    raise AssertionError(kind)


def validate_expectations(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Violation summary: one row per rule — ``(rule_id, kind, target,
    n_violations)`` — with all row-local rules fused into a single
    scan."""
    _validate_rules(df, rules)
    parts: list[DataFrame] = []

    row_rules = [(i, r) for i, r in enumerate(rules) if r[0] in _ROW_LOCAL]
    if row_rules:
        aggs = [
            F.sum(_row_violation(r).cast("long")).alias(_rule_id(i, r))
            for i, r in row_rules
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{_rule_id(i, r)}', {_rule_id(i, r)}" for i, r in row_rules
        )
        long = wide.selectExpr(
            f"stack({len(row_rules)}, {stack}) AS (rule_id, n_violations)"
        )
        parts.append(long)

    for i, r in enumerate(rules):
        if r[0] == "unique":
            cols = list(r[1])
            viol = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_violations"))
                .select(F.lit(_rule_id(i, r)).alias("rule_id"), "n_violations")
            )
            parts.append(viol)
        elif r[0] == "ref":
            col, dim, dim_col = r[1], r[2], r[3]
            keys = dim.select(F.col(dim_col).alias(col)).distinct()
            viol = (
                df.filter(F.col(col).isNotNull())
                .join(F.broadcast(keys), on=col, how="left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(_rule_id(i, r)).alias("rule_id"), "n_violations")
            )
            parts.append(viol)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    meta = [
        (
            _rule_id(i, r),
            r[0],
            ",".join(r[1]) if isinstance(r[1], (list, tuple)) else r[1],
        )
        for i, r in enumerate(rules)
    ]
    meta_df = df.sparkSession.createDataFrame(
        meta, "rule_id string, kind string, target string"
    )
    return out.join(F.broadcast(meta_df), "rule_id").select(
        "rule_id", "kind", "target", "n_violations"
    )


def quarantine(df: DataFrame, rules: list[tuple]) -> tuple[DataFrame, DataFrame]:
    """Row-level split: ``(clean, quarantined)`` where quarantined rows
    carry a sorted ``violated`` array of rule ids.  All input columns
    pass through unchanged."""
    _validate_rules(df, rules)
    flagged = df
    flag_cols: list[str] = []
    for i, r in enumerate(rules):
        rid = _rule_id(i, r)
        fc = f"__viol_{rid}"
        if r[0] in _ROW_LOCAL:
            flagged = flagged.withColumn(fc, _row_violation(r))
        elif r[0] == "unique":
            w = Window.partitionBy(*[F.col(c) for c in r[1]])
            flagged = flagged.withColumn(fc, F.count(F.lit(1)).over(w) > 1)
        else:  # ref
            col, dim, dim_col = r[1], r[2], r[3]
            keys = dim.select(F.col(dim_col).alias(col)).distinct().withColumn(
                "__ref_hit", F.lit(True)
            )
            flagged = flagged.join(F.broadcast(keys), on=col, how="left").withColumn(
                fc, F.col(col).isNotNull() & F.col("__ref_hit").isNull()
            ).drop("__ref_hit")
        flag_cols.append(fc)

    violated = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(F.col(fc), F.lit(_rule_id(i, r)))
                    for (i, r), fc in zip(enumerate(rules), flag_cols)
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    tagged = flagged.withColumn("violated", violated)
    clean = tagged.filter(F.size("violated") == 0).select(*df.columns)
    bad = tagged.filter(F.size("violated") > 0).select(*df.columns, "violated")
    return clean, bad
