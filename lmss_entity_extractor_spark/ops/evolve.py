"""Schema-drift union / schema evolution (L119): combine table
increments written at different points of a schema's life — columns
added over time, numeric types widened — into one frame with the
EVOLVED schema, refusing real conflicts loudly.

This is the read-side half of schema evolution every long-lived table
needs (Iceberg/Delta write it into metadata; a parquet-increment table
like `streaming/incremental.py`'s meets it as drift between increment
directories).  ``spark.read.option("mergeSchema", ...)`` solves only
the easy case and silently fails the rest; this operator pins the
semantics:

* missing columns → typed NULLs (the only sound default: a column
  that did not exist carries no information);
* numeric widening along the SQL promotion lattice
  (byte→short→int→long, float→double, and integral→double when mixed
  with fractional) — lossless-by-construction promotions only;
* anything else (string vs int, long vs float both "widenable" ways,
  struct reshape) is a REFUSED conflict naming the column and both
  types — silent coercion is how tables rot;
* column order = first-seen order across the increments (stable,
  deterministic).

Shape: pure metadata work + one ``select`` of casts per input +
``unionByName`` — no shuffle at all; the union is a narrow plan node.

Reference counterpart: none (the reference rewrites its JSON index
wholesale, `app/lmss_parser.py` save_to_json); drift handling is
100 TB table hygiene (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
)

_INTEGRAL = [ByteType(), ShortType(), IntegerType(), LongType()]
_FRACTIONAL = [FloatType(), DoubleType()]


def _widen(a: DataType, b: DataType) -> DataType | None:
    """The widened type of two column types, or None if incompatible."""
    if a == b:
        return a
    if a in _INTEGRAL and b in _INTEGRAL:
        return _INTEGRAL[max(_INTEGRAL.index(a), _INTEGRAL.index(b))]
    if a in _FRACTIONAL and b in _FRACTIONAL:
        return _FRACTIONAL[max(_FRACTIONAL.index(a), _FRACTIONAL.index(b))]
    if (a in _INTEGRAL and b in _FRACTIONAL) or (a in _FRACTIONAL and b in _INTEGRAL):
        # mixed integral/fractional promotes to double (SQL rule); a
        # long→double cast can lose ulps past 2^53 — documented trade,
        # same as every SQL engine's implicit promotion
        return DoubleType()
    return None


def evolved_schema(dfs: list[DataFrame]) -> list[tuple[str, DataType]]:
    """The merged (name, type) list in first-seen column order, or a
    loud ValueError naming the first conflicting column."""
    if not dfs:
        raise ValueError("need at least one DataFrame")
    merged: dict[str, DataType] = {}
    order: list[str] = []
    for i, df in enumerate(dfs):
        for f in df.schema.fields:
            if f.name not in merged:
                merged[f.name] = f.dataType
                order.append(f.name)
            else:
                w = _widen(merged[f.name], f.dataType)
                if w is None:
                    raise ValueError(
                        f"schema conflict on column {f.name!r}: "
                        f"{merged[f.name].simpleString()} (earlier inputs) vs "
                        f"{f.dataType.simpleString()} (input {i}) — not a "
                        "lossless widening; resolve upstream"
                    )
                merged[f.name] = w
    return [(name, merged[name]) for name in order]


def union_evolved(dfs: list[DataFrame]) -> DataFrame:
    """Union increments under the evolved schema: missing columns as
    typed NULLs, widenable numerics cast up, conflicts refused."""
    target = evolved_schema(dfs)
    aligned = []
    for df in dfs:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = [
            (
                F.col(name).cast(dtype)
                if name in have
                else F.lit(None).cast(dtype)
            ).alias(name)
            for name, dtype in target
        ]
        aligned.append(df.select(*cols))
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out
