"""Materialize the single-process loop oracle's pipeline aggregates as
parquet fixtures the driver's DuckDB can read.

The UDF-backed contract queries ``mention_type_counts`` and
``kg_edge_counts`` run the real Arrow/broadcast pipeline; their oracle
side cannot be expressed in SQL over the raw tables (extraction and
linking are not relational).  Instead, the independent loop-shaped
oracle (lmss_entity_extractor_spark/oracle/reference_oracle.py — the
same straight-line semantics the P/R parity gate uses) is run here over
the identical derived transcripts and its aggregates are frozen to
``fixtures/oracle/<sf>/*.parquet``; ``oracle_sql()`` reads them with
``read_parquet``.  The testdata is deterministic (seed=42, read-only:
TESTDATA.md), so the fixtures are stable; regenerate with:

    python tools/make_oracle_fixtures.py [sf_dir ...]

tests/test_contract.py re-derives the sf0.01 fixture from the loop
oracle on every run, so a drifted fixture fails CI before it reaches
the driver.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURE_ROOT = REPO / "fixtures" / "oracle"


def transcript_rows_from_documents(sf_dir: str | Path, convs: int = 64) -> list[tuple[str, int, str]]:
    """Pure-Python twin of datagen.transcripts.transcripts_from_documents
    (same conv/turn derivation, no Spark): (conv_id, turn_idx, text)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{Path(sf_dir)}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    return [
        (f"conv-{doc_id % convs:06d}", doc_id // convs, text)
        for doc_id, text in rows
    ]


def compute_fixture_tables(sf_dir: str | Path) -> dict[str, "object"]:
    """Run the loop oracle over the derived transcripts; return pyarrow
    tables keyed by fixture name (column types pinned to what Spark's
    count()/sum() produce, so the driver's dtype-sensitive hash agrees)."""
    import pyarrow as pa

    from lmss_entity_extractor_spark.datagen import write_fixture_owl
    from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes
    from lmss_entity_extractor_spark.oracle.reference_oracle import (
        oracle_edge_counts,
        oracle_mention_type_counts,
    )

    owl = Path(tempfile.mkdtemp(prefix="lmss_oracle_fix_")) / "fixture.owl"
    write_fixture_owl(owl)
    artifacts = build_artifacts(parse_owl_classes(owl))
    rows = transcript_rows_from_documents(sf_dir)

    mtype_counts = oracle_mention_type_counts(rows, artifacts)
    edge_counts = oracle_edge_counts(rows, artifacts)  # API profile (0.7/0.9)

    return {
        "mention_type_counts": pa.table(
            {
                "mtype": pa.array([m for m, _ in mtype_counts], pa.string()),
                "n_mentions": pa.array([n for _, n in mtype_counts], pa.int64()),
            }
        ),
        "kg_edge_counts": pa.table(
            {
                "pred": pa.array([p for p, _, _ in edge_counts], pa.string()),
                "n_edges": pa.array([e for _, e, _ in edge_counts], pa.int64()),
                "n_provenances": pa.array([n for _, _, n in edge_counts], pa.int64()),
            }
        ),
    }


def write_fixtures(sf_dir: str | Path) -> Path:
    import pyarrow.parquet as pq

    out_dir = FIXTURE_ROOT / Path(sf_dir).name
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, table in compute_fixture_tables(sf_dir).items():
        pq.write_table(table, out_dir / f"{name}.parquet")
        print(f"wrote {out_dir / f'{name}.parquet'} ({table.num_rows} rows)")
    return out_dir


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    for d in dirs:
        write_fixtures(d)
