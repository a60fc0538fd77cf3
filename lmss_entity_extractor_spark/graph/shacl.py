"""SHACL-lite shape validation: check a triple table against a set of
node shapes and emit a violations report — the data-quality gate a
KG-construction pipeline runs before publishing a graph (W3C SHACL
core, restricted to the constraints that matter at bulk-load time).

Shape model (one DataFrame row per (shape, path) constraint group):

    shapes(shape_id, target_class, path,
           min_count, max_count, pattern, value_class)

- focus nodes of a shape = subjects with ``rdf:type target_class``.
- ``min_count`` / ``max_count``: bounds on the number of ``path``
  triples per focus node (sh:minCount / sh:maxCount).
- ``pattern``: every value of ``path`` must match the regex
  (sh:pattern; Java regex semantics — evaluated JVM-side by
  ``rlike``, so contract oracles must stick to the portable subset).
- ``value_class``: every value of ``path`` must itself be typed
  ``rdf:type value_class`` (sh:class, non-transitive — run
  graph/rdfs.py first if subclass semantics are wanted; documented).
- any constraint column may be null = unconstrained.

Violations output, one row per violation:

    (focus, shape_id, path, constraint, actual)

``constraint`` ∈ {minCount, maxCount, pattern, class};
``actual`` = the observed cardinality (as a string) for count
constraints, the offending value for pattern/class — deterministic
and engine-comparable.

Scale shape (100 TB triples, shapes are human-written and tiny): the
shapes table is broadcast everywhere.  Cardinality checks ride ONE
``groupBy(s, p).count()`` over the focus-relevant slice of the
instance table (map-side combinable); pattern/class checks are
narrow joins of the (focus, path) slice against the broadcast shape
rows, plus one left-anti join against the type table for sh:class.
Nothing is quadratic; the only wide shuffles are the count groupBy
and the anti-join, both on natural keys.

Reference counterpart: none — the reference trusts its own extractor
output (`app/kg_generation.py` writes triples unvalidated); this is
part of the beyond-reference KG-construction mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rdfs import TYPE_PRED

_SHAPE_COLS = (
    "shape_id",
    "target_class",
    "path",
    "min_count",
    "max_count",
    "pattern",
    "value_class",
)

_VIOLATION_COLS = ("focus", "shape_id", "path", "constraint", "actual")


def _violation(df: DataFrame, constraint: str, actual) -> DataFrame:
    return df.select(
        "focus",
        "shape_id",
        "path",
        F.lit(constraint).alias("constraint"),
        actual.cast("string").alias("actual"),
    )


def validate_shapes(
    triples: DataFrame,
    shapes: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    type_pred: str = TYPE_PRED,
) -> DataFrame:
    """Validate ``triples`` against ``shapes``; returns the violations
    table (empty = conformant).  ``distinct`` is NOT applied — each
    (focus, shape, path, constraint, value) violation appears once by
    construction (count checks emit one row per focus×constraint,
    value checks one row per distinct offending value)."""
    missing = [c for c in _SHAPE_COLS if c not in shapes.columns]
    if missing:
        raise ValueError(f"shapes table missing columns: {missing}")

    g = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    sh = F.broadcast(shapes.select(*_SHAPE_COLS))

    # focus nodes per shape: one broadcast join against the type slice
    types = g.filter(F.col("p") == type_pred).select(
        F.col("s").alias("node"), F.col("o").alias("cls")
    )
    focus = types.join(sh, types["cls"] == sh["target_class"], "inner").select(
        F.col("node").alias("focus"),
        "shape_id",
        "path",
        "min_count",
        "max_count",
        "pattern",
        "value_class",
    )

    # one combinable count per (subject, predicate), over ONLY the
    # shape-referenced predicates (broadcast semi-join keeps the 100 TB
    # aggregate proportional to the validated slice; zero-counts still
    # come from the left join below) — shared by both cardinality
    # constraints
    shape_paths = F.broadcast(shapes.select(F.col("path")).distinct())
    counts = (
        g.join(shape_paths, g["p"] == shape_paths["path"], "left_semi")
        .groupBy(F.col("s").alias("focus"), F.col("p").alias("path"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    carded = (
        focus.filter(F.col("min_count").isNotNull() | F.col("max_count").isNotNull())
        .join(counts, ["focus", "path"], "left")
        .withColumn("_n", F.coalesce(F.col("_n"), F.lit(0)))
    )
    viol_min = _violation(
        carded.filter(F.col("min_count").isNotNull() & (F.col("_n") < F.col("min_count"))),
        "minCount",
        F.col("_n"),
    )
    viol_max = _violation(
        carded.filter(F.col("max_count").isNotNull() & (F.col("_n") > F.col("max_count"))),
        "maxCount",
        F.col("_n"),
    )

    # value-level checks: the (focus, path) slice, one row per distinct
    # offending value
    vals = (
        focus.filter(F.col("pattern").isNotNull() | F.col("value_class").isNotNull())
        .join(
            g.select(F.col("s").alias("focus"), F.col("p").alias("path"), "o"),
            ["focus", "path"],
            "inner",
        )
        .distinct()
    )
    viol_pat = _violation(
        # function form: Column.rlike only takes a literal pattern
        vals.filter(F.col("pattern").isNotNull() & ~F.expr("rlike(o, pattern)")),
        "pattern",
        F.col("o"),
    )
    typed = types.select(F.col("node").alias("o"), F.col("cls").alias("value_class"))
    viol_cls = _violation(
        vals.filter(F.col("value_class").isNotNull()).join(
            typed, ["o", "value_class"], "left_anti"
        ),
        "class",
        F.col("o"),
    )

    out = viol_min.unionByName(viol_max).unionByName(viol_pat).unionByName(viol_cls)
    return out.select(*_VIOLATION_COLS)
