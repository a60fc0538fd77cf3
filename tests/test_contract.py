"""Driver-contract and deployment-packaging invariants.

The driver runs ``__spark_entry__.queries()`` against ``oracle_sql()``
per-round; these tests catch contract drift (an oracle without a query,
a query whose callable is broken at import time) and verify the
``--py-files`` zip (tools/make_pyfiles.py) is self-contained.
"""

from __future__ import annotations

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    # every callable is a real function taking (spark, sf_dir)
    for name, fn in q.items():
        assert callable(fn), name


def test_oracle_fixtures_match_fresh_loop_oracle():
    """The committed fixtures/oracle/sf0.01 parquet (read by oracle_sql()
    for the UDF-pipeline queries) must equal a fresh derivation from the
    single-process loop oracle — a drifted or stale fixture fails here
    before it reaches the driver."""
    import pyarrow.parquet as pq

    from tools.make_oracle_fixtures import FIXTURE_ROOT, compute_fixture_tables

    fresh = compute_fixture_tables("/root/testdata/sf0.01")
    for name, table in fresh.items():
        committed = pq.read_table(FIXTURE_ROOT / "sf0.01" / f"{name}.parquet")
        assert committed.equals(table), f"{name}: committed fixture != fresh loop oracle"


def test_check_entry_odd_dtype_guard():
    """The local pre-flight must flag oracle dtypes whose arrow hash can
    never match Spark — including TIMESTAMPTZ, the class that slipped
    through in round 2 (time_rollup) because the normalized compare
    strftime's tz-aware and naive timestamps identically."""
    import duckdb

    from tools.check_entry import odd_oracle_dtypes

    con = duckdb.connect()
    flagged = odd_oracle_dtypes(
        con.sql(
            "SELECT sum(x) AS s, to_timestamp(x) AS tz,"
            "       CAST(to_timestamp(x) AS TIMESTAMP) AS naive,"
            "       CAST(sum(x) AS BIGINT) AS ok_sum"
            " FROM (SELECT 1::INTEGER AS x) GROUP BY x"
        )
    )
    assert ("s", "HUGEINT") in flagged
    assert ("tz", "TIMESTAMP WITH TIME ZONE") in flagged
    names = [c for c, _ in flagged]
    assert "naive" not in names and "ok_sum" not in names


def test_all_oracles_free_of_odd_dtypes():
    """Every committed oracle, executed on sf0.001, must emit only dtypes
    the driver's arrow hash can match — closes the whole class, not just
    the one query that rotted."""
    import duckdb

    import __spark_entry__ as e
    from tools.check_entry import TABLES, odd_oracle_dtypes

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = {}
    for name, sql in e.oracle_sql().items():
        # every oracle must PARSE AND BIND here — the fixture-backed ones
        # use absolute repo paths, so nothing is exempt; an oracle that
        # errors would otherwise drop out of the dtype sweep silently
        odd = odd_oracle_dtypes(con.sql(sql))
        if odd:
            bad[name] = odd
    assert not bad, bad


def test_pyfiles_zip_self_contained(tmp_path):
    out = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_pyfiles.py"), str(out)],
        check=True,
        capture_output=True,
    )
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
    # the frozen stop-word fixture must ship inside the zip (textproc's
    # zip-aware loader depends on this exact member path)
    assert "fixtures/stopwords.txt" in names
    pkg_files = {n for n in names if n.startswith("lmss_entity_extractor_spark/")}
    on_disk = {
        str(p.relative_to(REPO))
        for p in (REPO / "lmss_entity_extractor_spark").rglob("*.py")
    }
    assert pkg_files == on_disk


def test_no_duplicate_definitions_in_entry_module():
    """Duplicate top-level defs (or duplicate dict keys built from
    them) silently shadow earlier ones — a later q_x would replace an
    earlier q_x in queries()/oracle_sql() with no error anywhere."""
    import ast
    import collections
    from pathlib import Path

    import __spark_entry__ as entry

    src = Path(entry.__file__).read_text()
    tree = ast.parse(src)
    names = [n.name for n in tree.body if isinstance(n, ast.FunctionDef)]
    dupes = [k for k, v in collections.Counter(names).items() if v > 1]
    assert not dupes, f"duplicate top-level defs shadow each other: {dupes}"

    # dict-literal keys inside queries() and repeated oracles["k"]
    # assignments shadow just as silently — count every string key.
    keys = collections.Counter()
    for fn in tree.body:
        if not (isinstance(fn, ast.FunctionDef) and fn.name in ("queries", "oracle_sql")):
            continue
        for node in ast.walk(fn):
            if isinstance(node, ast.Dict):
                for k in node.keys:
                    if isinstance(k, ast.Constant) and isinstance(k.value, str):
                        keys[(fn.name, k.value)] += 1
            if (
                isinstance(node, ast.Assign)
                and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Subscript)
                and isinstance(node.targets[0].slice, ast.Constant)
                and isinstance(node.targets[0].slice.value, str)
            ):
                keys[(fn.name, node.targets[0].slice.value)] += 1
    key_dupes = [k for k, v in keys.items() if v > 1]
    assert not key_dupes, f"duplicate contract keys shadow each other: {key_dupes}"
