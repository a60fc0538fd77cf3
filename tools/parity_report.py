"""Measure the north-rule parity criterion and write BENCH/PARITY.md.

Runs the full Spark pipeline and the single-process reference-semantics
oracle over seeded fixture corpora at both reference threshold profiles
(API 0.7 / CLI 0.3), compares canonical triple sets, and reports
precision/recall per (corpus, profile).  The gate is P/R >= 0.95; with
the pinned deterministic encoder both sides are expected to be exact.

Usage: python tools/parity_report.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PROFILES = {
    "api(0.7/0.9)": dict(similarity_threshold=0.7, high_confidence_threshold=0.9),
    "cli(0.3/0.9)": dict(similarity_threshold=0.3, high_confidence_threshold=0.9),
}

CORPORA = {
    "tiny(8 convs, skewed)": dict(n_convs=8, seed=42, hot_frac=0.125, hot_multiplier=10),
    "small(60 convs)": dict(n_convs=60, seed=7),
    "skewed(40 convs, 1 hot x50)": dict(n_convs=40, seed=13, hot_frac=0.025, hot_multiplier=50),
}


def _organic_rows():
    """Turns built from REAL testdata document text (not template-
    generated): organic whitespace/punctuation shapes catch semantics
    drift that clean fixtures miss (e.g. the word-join whitespace
    renormalization of the stop-word strip), with ontology surfaces
    spliced in so the linker has work to do."""
    import datetime as dt

    import duckdb

    from lmss_entity_extractor_spark.datagen.ontology_fixture import FIXTURE_CLASSES

    surfaces = [label for _, label, _, alts in FIXTURE_CLASSES if not label.startswith("ZZZ")]
    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.01/documents.parquet' LIMIT 400"
        ).fetchall()
    ]
    epoch = dt.datetime(2026, 1, 1)
    rows = []
    for i, t in enumerate(texts):
        surf = surfaces[i % len(surfaces)]
        # splice a known surface mid-text with adversarial whitespace
        text = f"{t[:120]} {surf}  {surf.lower()}\n{t[120:360]}"
        rows.append((f"conv-{i % 40:06d}", i // 40, "user", text, None, epoch))
    return rows


def main() -> None:
    from lmss_entity_extractor_spark.datagen import gen_transcript_rows, write_fixture_owl
    from lmss_entity_extractor_spark.datagen.transcripts import rows_to_pandas
    from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes
    from lmss_entity_extractor_spark.oracle import oracle_triples
    from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig
    from lmss_entity_extractor_spark.session import get_spark

    owl = write_fixture_owl("/tmp/parity_fixture.owl")
    artifacts = build_artifacts(parse_owl_classes(owl))
    spark = get_spark(app_name="parity-report", master="local[8]", shuffle_partitions=8)

    lines = [
        "# BENCH/PARITY — measured reference-parity (north rule: P/R >= 0.95)",
        "",
        "Spark pipeline canonical triples vs the single-process oracle of the",
        "reference semantics (same candidate rules, merge scan, fuzzy ratios,",
        "deterministic encoder pinned on both sides — SURVEY.md §5.2, §7).",
        "Reproduce: `python tools/parity_report.py`.",
        "",
        "| corpus | profile | spark triples | oracle triples | precision | recall |",
        "|---|---|---|---|---|---|",
    ]
    worst = 1.0
    all_corpora = {name: gen_transcript_rows(**kw) for name, kw in CORPORA.items()}
    all_corpora["organic(400 real docs + spliced surfaces)"] = _organic_rows()
    for cname, rows in all_corpora.items():
        tdf = spark.createDataFrame(rows_to_pandas(rows))
        for pname, profile in PROFILES.items():
            pipe = KGPipeline(
                spark, owl, tempfile.mkdtemp(prefix="parity_"),
                PipelineConfig(**profile, output_partitions=8, materialize_intermediate=False),
            )
            got = {
                (r.subj, r.pred, r.obj)
                for r in pipe.dataflow(tdf)["edges"].select("subj", "pred", "obj").collect()
            }
            want = oracle_triples([(c, t, x) for c, t, _, x, _, _ in rows], artifacts, **profile)
            tp = len(got & want)
            p = tp / len(got) if got else 0.0
            r = tp / len(want) if want else 0.0
            worst = min(worst, p, r)
            lines.append(
                f"| {cname} | {pname} | {len(got)} | {len(want)} | {p:.4f} | {r:.4f} |"
            )
            print(lines[-1], file=sys.stderr)

    lines += [
        "",
        f"**Worst-case precision/recall across all cells: {worst:.4f}** "
        f"({'PASS' if worst >= 0.95 else 'FAIL'} vs the 0.95 gate).",
        "",
        "The per-stage parity tests (`tests/test_parity.py`) additionally check",
        "per-turn mention-row equality and stable (conv_id, turn_idx, start)",
        "ordering of the materialized tables.",
    ]
    out = REPO / "BENCH" / "PARITY.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()
    sys.exit(0 if worst >= 0.95 else 1)


if __name__ == "__main__":
    main()
