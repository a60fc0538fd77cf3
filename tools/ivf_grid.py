"""Emit BENCH/IVF.md: the IVF index's recall/latency grid vs exact
brute force (VERDICT r2 item 7) — the quality-cost tradeoff a real user
needs before picking (n_centroids, nprobe).

Two corpora over the sf0.1 embeddings (2000 x 64, unit-norm-ish random):

* clustered — the label-indexed +6.0 lift (same space as the knn_ivf
  contract query): the regime real embedding corpora are in, where a
  coarse quantizer's cells align with neighbor structure;
* random    — the raw vectors: no cluster structure, the worst case for
  ANY coarse quantizer (documented as the adversarial bound, not a
  target).

Recall@10 = |ivf top-10 ∩ exact top-10| / 10 averaged over 50 queries
(deterministic vec_id % 40 == 0 set, self-matches excluded both sides).
Latency is split into train (driver k-means on the full 2000-row table)
and query (cell assignment + probe join + top-k collect), each measured
around a full collect.

Run in isolation (bench-noise memo): python tools/ivf_grid.py [sf_dir]
Exits nonzero if the default IVF config (n_centroids=10, nprobe=2) OR
the default IVFADC+rerank serving config recalls < 0.9 on the clustered
corpus (the latter is VERDICT r3 #1's done-gate).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GRID_CENTROIDS = [4, 10, 16]
GRID_NPROBE = [1, 2, 4]
DEFAULT = (10, 2)
K = 10


def _recall(approx_rows, exact: dict[int, set]) -> float:
    got: dict[int, set] = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return sum(len(got.get(q, set()) & nb) / len(nb) for q, nb in exact.items()) / len(exact)


def run_grid(sf_dir: str) -> str:
    from pyspark.sql import functions as F

    from lmss_entity_extractor_spark.ops.similarity import (
        knn_bruteforce,
        knn_ivf,
        train_ivf_centroids,
    )
    from lmss_entity_extractor_spark.session import get_spark

    spark = get_spark(app_name="ivf-grid")
    e0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lifted = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double")
        + F.when(i == F.col("label"), F.lit(6.0)).otherwise(F.lit(0.0)),
    )
    corpora = {
        "clustered": e0.select("vec_id", lifted.alias("embedding")).cache(),
        "random": e0.select("vec_id", "embedding").cache(),
    }
    lines = [
        "# IVF recall / latency grid",
        "",
        f"Corpus: `{sf_dir}/embeddings.parquet` "
        f"({e0.count()} x 64), 50 queries (`vec_id % 40 == 0`), recall@{K} vs "
        "exact brute force, times are single-run wall clock on this host "
        "(±15-40% epoch noise — see BENCH/BASELINE.md).",
        "",
    ]
    default_clustered_recall = None
    default_rerank_recall = None
    for name, corpus in corpora.items():
        corpus.count()  # materialize the cache outside the timings
        queries = corpus.filter(F.col("vec_id") % 40 == 0)
        exact: dict[int, set] = {}
        for r in knn_bruteforce(corpus, queries, k=K).collect():
            exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        lines += [
            f"## {name} corpus",
            "",
            "| n_centroids | nprobe | recall@10 | train s | query s | scanned candidates/query |",
            "|---|---|---|---|---|---|",
        ]
        for nc in GRID_CENTROIDS:
            t0 = time.monotonic()
            cents = train_ivf_centroids(corpus, n_centroids=nc)
            t_train = time.monotonic() - t0
            for npb in GRID_NPROBE:
                if npb > nc:
                    continue
                t0 = time.monotonic()
                rows = knn_ivf(
                    corpus, queries, k=K, n_centroids=nc, nprobe=npb
                ).collect()
                t_query = time.monotonic() - t0
                rec = _recall(rows, exact)
                # candidate volume ~ nprobe/n_centroids of the corpus —
                # the knob's cost side, stated instead of implied
                frac = min(1.0, npb / nc)
                lines.append(
                    f"| {nc} | {npb} | {rec:.3f} | {t_train:.2f} | {t_query:.2f} "
                    f"| ~{frac * 100:.0f}% of corpus |"
                )
                if name == "clustered" and (nc, npb) == DEFAULT:
                    default_clustered_recall = rec
        lines.append("")
        del cents
    # PQ / IVFADC section: the memory-bound half — recall vs EXACT-L2
    # (ADC approximates squared L2; cosine and L2 rank differently on the
    # unnormalized lifted vectors, so the fair exact reference changes)
    from pyspark.sql import Window

    import tempfile

    from lmss_entity_extractor_spark.ops.pq import (
        encode_pq,
        knn_ivfpq_indexed,
        knn_pq,
        train_pq_codebooks,
        write_ivfpq_index,
    )

    lines += ["## PQ / IVFADC (memory-bound half; exact-L2 reference)", ""]
    lines += [
        "| corpus | op | recall@10 vs exact L2 | build s | query s | stored bytes/vec |",
        "|---|---|---|---|---|---|",
    ]
    for name, corpus in corpora.items():
        queries = corpus.filter(F.col("vec_id") % 40 == 0)
        d2 = F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.col("nv"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        qq = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        ee = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
        w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
        exact_l2: dict[int, set] = {}
        for r in (
            ee.crossJoin(F.broadcast(qq))
            .filter("neighbor_id != query_id")
            .withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(f"rank <= {K}")
            .collect()
        ):
            exact_l2.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # code-budget grid (VERDICT r3 #1): pure-ADC recall as the budget
        # grows — k>16 auto-escalates to the Arrow/numpy encoder
        for m, pq_k in [(8, 16), (4, 64), (8, 64), (8, 256)]:
            t0 = time.monotonic()
            books = train_pq_codebooks(corpus, m=m, k=pq_k)
            codes = encode_pq(corpus, books).cache()
            codes.count()
            t_pq_build = time.monotonic() - t0
            t0 = time.monotonic()
            pq_rows = knn_pq(codes, queries, books, k=K).collect()
            t_pq = time.monotonic() - t0
            lines.append(
                f"| {name} | knn_pq ADC, m={m} x k={pq_k} (full code scan) "
                f"| {_recall(pq_rows, exact_l2):.3f} | {t_pq_build:.2f} | {t_pq:.2f} "
                f"| {m} codes vs 256 float |"
            )
            codes.unpersist()
        # IVFADC through the SERVING path so build (train both quantizers
        # + write partitioned codes + floats) and query are timed
        # separately — the inline knn_ivfpq's wall time is
        # training-dominated and would mislabel the query column
        # two IDENTICAL index builds so each probe variant reads files no
        # prior probe has pulled into the page cache — probing adc then
        # rerank on ONE dir would hand rerank a warm read of exactly the
        # float bytes its cost story is about
        idx = tempfile.mkdtemp(prefix=f"ivfpq_grid_{name}_")
        idx_rr = tempfile.mkdtemp(prefix=f"ivfpq_grid_rr_{name}_")
        t0 = time.monotonic()
        write_ivfpq_index(corpus, idx, n_centroids=10, m=8, pq_k=16)
        t_ivfpq_build = time.monotonic() - t0
        write_ivfpq_index(corpus, idx_rr, n_centroids=10, m=8, pq_k=16)
        t0 = time.monotonic()
        adc_rows = knn_ivfpq_indexed(spark, idx, queries, k=K, nprobe=2, rerank=0).collect()
        t_adc = time.monotonic() - t0
        t0 = time.monotonic()
        rr_rows = knn_ivfpq_indexed(spark, idx_rr, queries, k=K, nprobe=2).collect()
        t_rr = time.monotonic() - t0
        lines.append(
            f"| {name} | IVFADC COLD probe (2/10 cells), rerank=0 | {_recall(adc_rows, exact_l2):.3f} | {t_ivfpq_build:.2f} | {t_adc:.2f} | 32 + cell id |"
        )
        rr_rec = _recall(rr_rows, exact_l2)
        lines.append(
            f"| {name} | **IVFADC + exact re-rank (k'=100, DEFAULT), COLD probe** | {rr_rec:.3f} | {t_ivfpq_build:.2f} | {t_rr:.2f} | 32 + cell id + pruned floats |"
        )
        if name == "clustered":
            default_rerank_recall = rr_rec
        # residual coding (Jegou §IV proper): same storage, ADC spends
        # the code budget on in-cluster structure
        idx_res = tempfile.mkdtemp(prefix=f"ivfpq_grid_res_{name}_")
        idx_res_rr = tempfile.mkdtemp(prefix=f"ivfpq_grid_resrr_{name}_")
        t0 = time.monotonic()
        write_ivfpq_index(corpus, idx_res, n_centroids=10, m=8, pq_k=16, residual=True)
        t_res_build = time.monotonic() - t0
        write_ivfpq_index(corpus, idx_res_rr, n_centroids=10, m=8, pq_k=16, residual=True)
        t0 = time.monotonic()
        res_rows = knn_ivfpq_indexed(spark, idx_res, queries, k=K, nprobe=2, rerank=0).collect()
        t_res = time.monotonic() - t0
        t0 = time.monotonic()
        res_rr_rows = knn_ivfpq_indexed(spark, idx_res_rr, queries, k=K, nprobe=2).collect()
        t_res_rr = time.monotonic() - t0
        lines.append(
            f"| {name} | residual IVFADC COLD probe (2/10 cells), rerank=0 | {_recall(res_rows, exact_l2):.3f} | {t_res_build:.2f} | {t_res:.2f} | 32 + cell id |"
        )
        lines.append(
            f"| {name} | residual IVFADC + exact re-rank (k'=100), COLD probe | {_recall(res_rr_rows, exact_l2):.3f} | {t_res_build:.2f} | {t_res_rr:.2f} | 32 + cell id + pruned floats |"
        )
    lines += [
        "",
        "PQ trades fine-grained ranking for a much smaller stored table: "
        "pure ADC preserves COARSE geometry (cluster membership — pinned in "
        "tests) but blurs in-cluster noise ordering, which is what recall@10 "
        "against exact L2 measures; the grid shows recall rising with the "
        "code budget (k>16 auto-escalates encoding to the Arrow/numpy "
        "kernel; the literal-SQL form stays the bit-oracle contract for "
        "small k).  The closing move is the DEFAULT serving config "
        "(Jegou §V): ADC shortlists k'=100 candidates, then exact L2 "
        "re-ranks them via a broadcast-shortlist join against the float "
        "column stored in the SAME probed partitions — float reads stay "
        "partition-pruned to nprobe cells and bounded by the shortlist "
        "join, never a full float scan.  IVFADC rows are measured through "
        "the serving path (`write_ivfpq_index` + cold `knn_ivfpq_indexed` "
        "probe).  The residual rows are Jegou §IV's actual encoding — PQ "
        "quantizes (x - assigned cell MEAN), so the code budget resolves "
        "in-cluster structure instead of re-encoding cluster position; "
        "same storage, same scan shape, and it composes with the re-rank. "
        "On THESE corpora it is measured neutral — the clustered lift is "
        "one dimension on an otherwise full-magnitude random vector, so "
        "the residual is essentially the raw vector; the regime where it "
        "wins (cluster position dominating vector magnitude) is pinned by "
        "test instead — recall improvement and a >2x reconstruction-MSE "
        "reduction asserted on scattered centers, with 28.3 -> 5.9 MSE "
        "and 8x recall the measured point values "
        "(test_residual_coding_improves_adc_and_roundtrips).  The ADC math is pinned by oracle (contract queries "
        "`knn_pq`, `knn_ivfpq`, `knn_ivfpq_residual`); the re-ranked "
        "default by `knn_ivfpq_rerank`.",
        "",
    ]
    lines += [
        "Reading: on the clustered corpus (the regime embeddings corpora are "
        "in) the default (10, 2) keeps recall >= 0.9 while scanning ~20% of "
        "the corpus per query; raising nprobe buys recall linearly in scan "
        "cost.  On the random corpus no coarse quantizer can do well "
        "(neighbors are spread uniformly across cells) — recall there is the "
        "documented adversarial floor, and brute force / LSH with wider "
        "buckets is the right tool.  `knn_ivf` trains per call (timed "
        "separately above); the production path amortizes it via "
        "`write_ivf_index` + partition-pruned `knn_ivf_indexed` probes "
        "(cold-probe table in BENCH/BASELINE.md).",
        "",
    ]
    spark.stop()
    md = "\n".join(lines)
    assert default_clustered_recall is not None
    if default_clustered_recall < 0.9:
        print(md)
        raise SystemExit(
            f"default config recall {default_clustered_recall:.3f} < 0.9 on the clustered corpus"
        )
    if default_rerank_recall < 0.9:
        print(md)
        raise SystemExit(
            f"default IVFADC+rerank recall {default_rerank_recall:.3f} < 0.9 "
            "on the clustered corpus (VERDICT r3 #1 gate)"
        )
    return md


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = REPO / "BENCH" / "IVF.md"
    out.write_text(run_grid(sf))
    print(f"wrote {out}")
