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


def curated_transcript_rows(sf_dir: str | Path, convs: int = 64) -> list[tuple[str, int, str]]:
    """DuckDB twin of the curation front-end of q_kg_curated_scoreboard:
    the same transcripts derivation, the deterministic duplicate seeding
    (every 17th doc re-keyed into a 'dup-' conversation), the L14-style
    quality gate at 0.6 (identical floor-truncated score tree to the
    proven quality_stats oracle), and the fingerprint keep-first dedup.
    Returns the surviving (conv_id, turn_idx, text) rows the loop oracle
    then extracts/links — so the FIXTURE freezes only the non-relational
    extraction stage while the curation funnel stays SQL-checked."""
    import duckdb

    con = duckdb.connect()
    sql = f"""
    WITH base AS (
        SELECT doc_id, text,
               'conv-' || lpad(CAST(doc_id % {convs} AS VARCHAR), 6, '0') AS conv_id,
               CAST(doc_id // {convs} AS INTEGER) AS turn_idx
        FROM read_parquet('{Path(sf_dir)}/documents.parquet')
    ),
    seeded AS (
        SELECT conv_id, turn_idx, text FROM base
        UNION ALL
        SELECT 'dup-' || conv_id, turn_idx, text FROM base WHERE doc_id % 17 = 0
    ),
    scored AS (
        SELECT *, floor((least(len(string_split_regex(trim(text), '\\s+')) / 64.0, 1.0) * 0.4
               + len(list_distinct(string_split_regex(trim(text), '\\s+'))) * 1.0
                 / len(string_split_regex(trim(text), '\\s+')) * 0.4
               + (1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) * 4.0
                              / greatest(length(text), 1), 1.0)) * 0.2) * 10000) / 10000 AS score
        FROM seeded
    ),
    gated AS (SELECT * FROM scored WHERE score >= 0.6),
    kept AS (
        SELECT conv_id, turn_idx, text,
               row_number() OVER (
                   PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                   ORDER BY conv_id, turn_idx) AS rn
        FROM gated
    )
    SELECT conv_id, turn_idx, text FROM kept WHERE rn = 1
    ORDER BY conv_id, turn_idx
    """
    return [(c, t, x) for c, t, x in con.execute(sql).fetchall()]


HYBRID_QUERY = "patent litigation counsel"  # pinned to q_hybrid_search
from __spark_entry__ import CHANGELOG_CUT  # noqa: E402  (one constant, no drift)


def _fold_dot(a, b) -> float:
    """Sequential left-fold double dot product — the exact accumulation
    order of similarity.dot_expr's JVM ``aggregate``, so the frozen cosine
    bit-matches the Spark column expression."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def compute_hybrid_terms(artifacts) -> list[tuple[str, str, int, int, float]]:
    """Per-(query, entity) score terms for the hybrid_search oracle:
    (iri, label, token_set_ratio, partial_ratio, cosine).

    The three terms are the non-SQL pieces of the reference's
    0.3/0.3/0.4 blend (/root/reference/app/lmss_search.py:88-104); they
    are computed here by the same straight-line functions the parity gate
    trusts (textproc ratios: hand-computed cases in
    tests/test_textproc.py) and frozen to parquet, leaving DuckDB to
    check what IS relational: the weighted blend, the score>0 filter,
    and the top-10 ranking with the iri tiebreak."""
    import math

    from lmss_entity_extractor_spark.encoder import get_encoder
    from lmss_entity_extractor_spark.textproc import partial_ratio, token_set_ratio

    qvec = get_encoder(artifacts.encoder_spec).encode(HYBRID_QUERY).astype("float64")
    q_lower = HYBRID_QUERY.lower()
    out = []
    for r in artifacts.index_rows:
        label = r["rdfs_label"]
        ll = (label or "").lower()
        mv = artifacts.mean_matrix[r["index_pos"]]  # float32, cast per-element
        na = math.sqrt(_fold_dot(qvec, qvec))
        nb = math.sqrt(_fold_dot(mv, mv))
        cos = 0.0 if (na == 0 or nb == 0) else _fold_dot(qvec, mv) / (na * nb)
        out.append((r["rdf_about"], label, token_set_ratio(q_lower, ll), partial_ratio(q_lower, ll), cos))
    return out


def compute_ann_codebooks(sf_dir: str | Path):
    """Train the PQ codebooks AND the IVF centroids for the knn_pq /
    knn_ivfpq oracles through the SAME numpy cores the Spark operators
    use, from the same id-sorted float64 rows — bit-identical by
    construction; DuckDB then re-derives codes, cells, probes and the
    ADC ranking from the frozen values alone."""
    import duckdb
    import numpy as np

    from lmss_entity_extractor_spark.ops.pq import (
        train_pq_codebooks_local,
        train_pq_codebooks_residual_local,
    )
    from lmss_entity_extractor_spark.ops.similarity import train_ivf_centroids_local

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{Path(sf_dir)}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    cents = train_ivf_centroids_local(X, 10)
    res_books, cell_means = train_pq_codebooks_residual_local(X, cents, m=8, k=16)
    from lmss_entity_extractor_spark.ops.kmeans import train_kmeans_local

    km_cents = train_kmeans_local(X, k=6, n_iters=5)
    return (
        train_pq_codebooks_local(X, m=8, k=16),
        cents,
        res_books,
        cell_means,
        km_cents,
    )


def compute_fixture_tables(sf_dir: str | Path) -> dict[str, "object"]:
    """Run the loop oracle over the derived transcripts; return pyarrow
    tables keyed by fixture name (column types pinned to what Spark's
    count()/sum() produce, so the driver's dtype-sensitive hash agrees)."""
    import pyarrow as pa

    from lmss_entity_extractor_spark.datagen import write_fixture_owl
    from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes
    from lmss_entity_extractor_spark.oracle.reference_oracle import (
        oracle_edge_counts,
        oracle_edge_rows,
        oracle_mention_type_counts,
    )

    owl = Path(tempfile.mkdtemp(prefix="lmss_oracle_fix_")) / "fixture.owl"
    write_fixture_owl(owl)
    artifacts = build_artifacts(parse_owl_classes(owl))
    rows = transcript_rows_from_documents(sf_dir)

    mtype_counts = oracle_mention_type_counts(rows, artifacts)
    edge_counts = oracle_edge_counts(rows, artifacts)  # API profile (0.7/0.9)
    # composed curation demo (q_kg_curated_scoreboard): loop oracle over
    # the SQL-curated survivors — quality gate + dedup stay SQL-side and
    # DuckDB re-derives counts + SHACL tallies from the frozen edge ROWS
    curated_edges = oracle_edge_rows(curated_transcript_rows(sf_dir), artifacts)
    hybrid_terms = compute_hybrid_terms(artifacts)
    # changelog fixtures: canonical edge ROWS for the doc_id < CHANGELOG_CUT
    # prefix (v1) and the full table (v2) — DuckDB diffs them to oracle the
    # Spark-side run_incremental + edges_diff machinery (q_edges_changelog)
    # doc_ids are dense 0..N-1 and rows are ordered by doc_id, so the
    # prefix slice IS the doc_id < CHANGELOG_CUT filter
    edges_v1 = oracle_edge_rows(rows[:CHANGELOG_CUT], artifacts)
    edges_v2 = oracle_edge_rows(rows, artifacts)
    pq_books, ivf_cents, pq_books_res, cell_means, km_cents = compute_ann_codebooks(
        sf_dir
    )

    def _codebook_table(books):
        return pa.table(
            {
                "j": pa.array([j for j, book in enumerate(books) for _ in book], pa.int32()),
                "code": pa.array([code for book in books for code, _ in book], pa.int32()),
                "cent": pa.array(
                    [cent for book in books for _, cent in book], pa.list_(pa.float64())
                ),
            }
        )

    def _edges_table(er):
        return pa.table(
            {
                "subj": pa.array([r[0] for r in er], pa.string()),
                "pred": pa.array([r[1] for r in er], pa.string()),
                "obj": pa.array([r[2] for r in er], pa.string()),
                "n_provenances": pa.array([r[3] for r in er], pa.int64()),
            }
        )

    return {
        "ivf_centroids": pa.table(
            {
                "cid": pa.array([c for c, _ in ivf_cents], pa.int32()),
                "cent": pa.array([v for _, v in ivf_cents], pa.list_(pa.float64())),
            }
        ),
        "pq_codebook": _codebook_table(pq_books),
        # residual IVFADC (Jegou §IV proper): same trainer over residuals
        # vs the assigned cell's MEAN — q_knn_ivfpq_residual's oracle
        "pq_codebook_residual": _codebook_table(pq_books_res),
        "ivf_cell_means": pa.table(
            {
                "cid": pa.array([c for c, _ in cell_means], pa.int32()),
                "cent": pa.array([v for _, v in cell_means], pa.list_(pa.float64())),
            }
        ),
        # Euclidean k-means (L155, q_kmeans): frozen (center, ‖c‖²/2) —
        # DuckDB re-derives the cluster labels bit-for-bit
        "kmeans_centroids": pa.table(
            {
                "cid": pa.array([c for c, _, _ in km_cents], pa.int32()),
                "cent": pa.array([v for _, v, _ in km_cents], pa.list_(pa.float64())),
                "halfn": pa.array([h for _, _, h in km_cents], pa.float64()),
            }
        ),
        "kg_edges_v1": _edges_table(edges_v1),
        "kg_edges_v2": _edges_table(edges_v2),
        # sf-independent (hybrid_search ignores sf_dir) but written per-sf
        # so one regeneration + freshness-test path covers every fixture
        "hybrid_search_terms": pa.table(
            {
                "iri": pa.array([t[0] for t in hybrid_terms], pa.string()),
                "label": pa.array([t[1] for t in hybrid_terms], pa.string()),
                "ts_ratio": pa.array([t[2] for t in hybrid_terms], pa.int32()),
                "p_ratio": pa.array([t[3] for t in hybrid_terms], pa.int32()),
                "cos": pa.array([t[4] for t in hybrid_terms], pa.float64()),
            }
        ),
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
        "kg_curated_edges": _edges_table(curated_edges),
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
