"""Local pre-flight of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the
same sf dir, compare row count, column names, and the order-insensitive
row multiset (floats normalized to 9 significant decimals).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return repr(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


# DuckDB dtypes Spark can never produce: the driver's arrow value-hash is
# dtype-sensitive (unlike _norm above, which strftime's tz-aware timestamps
# identically to naive ones — exactly how r2's time_rollup passed locally
# and went red at the driver). Oracles must CAST these away.
ODD_ORACLE_DTYPES = frozenset(
    (
        "HUGEINT",
        "UHUGEINT",
        "UBIGINT",
        "UINTEGER",
        "USMALLINT",
        "UTINYINT",
        "TIMESTAMP WITH TIME ZONE",
        "TIME WITH TIME ZONE",
    )
)

# r5 extension (the class behind all 6 round-4 driver reds): any nested or
# decimal dtype on EITHER side.  Spark DecimalType reaches pandas as
# object-dtype Decimal while DuckDB DECIMAL reaches .df() as float64 —
# equal values, different hash; array/map/struct crash the driver's pandas
# canonicalization ("unhashable type: 'list'").  Contract queries must
# cast decimals to DOUBLE and serialize nested types to strings on BOTH
# sides (see __spark_entry__._contract_out).
ODD_ORACLE_PREFIXES = ("DECIMAL", "STRUCT", "MAP", "UNION")


def odd_oracle_dtypes(rel):
    """(column, dtype) pairs in a DuckDB relation whose dtype can never
    hash-match a Spark result under the driver's arrow compare."""
    out = []
    for c, t in zip(rel.columns, rel.types):
        s = str(t)
        if s in ODD_ORACLE_DTYPES or s.startswith(ODD_ORACLE_PREFIXES) or s.endswith("[]"):
            out.append((c, s))
    return out


def odd_spark_dtypes(df):
    """(column, dtype) pairs in a Spark result the driver's pandas
    canonicalization renders as unhashable objects or object-Decimals."""
    from pyspark.sql import types as T

    return [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(
            f.dataType,
            (T.DecimalType, T.ArrayType, T.MapType, T.StructType, T.DateType),
        )
    ]


def main():
    import duckdb

    import __spark_entry__ as entry
    from lmss_entity_extractor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="check-entry")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    unknown = only - set(queries)
    if unknown:
        # a typo'd name silently matching nothing would exit 0 having
        # checked nothing — fail loudly instead
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        failures.extend(sorted(unknown))
    pinned = getattr(entry, "FIXTURE_PINNED_SF001", frozenset())
    off_pin_sf = Path(sf_dir.rstrip("/")).name != "sf0.01"
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if off_pin_sf and name in pinned:
            print(f"skip  {name}: oracle fixture pinned to sf0.01 (mismatch by design here)")
            continue
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            odd_s = odd_spark_dtypes(df)
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if odd_s:
            failures.append(name)
            print(
                f"FAIL  {name}: spark output dtype(s) the driver hash can't "
                f"survive: {odd_s} — cast decimal to double / serialize nested"
            )
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (rows-only, no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            odd = odd_oracle_dtypes(rel)
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        if odd:
            failures.append(name)
            print(f"FAIL  {name}: oracle dtype(s) Spark can't hash-match: {odd} — add CASTs")
            continue

        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ok_count = len(spark_rows) == len(duck_rows)
        s_set = _rowset(spark_cols, spark_rows)
        d_set = _rowset(duck_cols, duck_rows)
        ok_vals = s_set == d_set
        if ok_cols and ok_count and ok_vals:
            print(f"OK    {name}: {len(spark_rows)} rows")
        else:
            failures.append(name)
            print(f"FAIL  {name}: cols={ok_cols} count={ok_count} ({len(spark_rows)} vs {len(duck_rows)}) vals={ok_vals}")
            if not ok_cols:
                print(f"      spark cols: {sorted(spark_cols)}")
                print(f"      duck  cols: {sorted(duck_cols)}")
            if not ok_vals:
                only_s = list((s_set - d_set).items())[:3]
                only_d = list((d_set - s_set).items())[:3]
                print(f"      only-spark: {only_s}")
                print(f"      only-duck : {only_d}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
