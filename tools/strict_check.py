"""Driver-replica STRICT comparison: full-precision values + pandas
dtypes, the exact basis the driver's arrow value-hash uses.

``tools/check_entry.py`` normalizes floats to 9 significant digits —
right for catching wrong math, too loose for the driver's bit-exact
hash (round 4's ``detect_peaks`` passed the 9-digit check locally and
went red at the driver over a 1e-12 oracle divergence).  This tool runs
each contract query AND its oracle, canonicalizes both sides the way
the driver does (sort columns by name, sort rows, reset index), and
requires dtype equality plus exact value equality (NaN == NaN).

Usage: python tools/strict_check.py [sf_dir] [query ...]
Exit 1 if any checked query is not bit-exact.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    df = df[sorted(df.columns)]
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
            pd.testing.assert_frame_equal(s, d, check_exact=True)
            val_ok = True
            detail = ""
        except Exception as e:
            val_ok = False
            detail = str(e).splitlines()[0][:160]
        if dt_ok and val_ok:
            print(f"OK    {name}: {len(s)} rows bit-exact")
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
