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
