"""Tests for training-data pipeline operators: dedup family, similarity
search, text stats, multimodal plumbing — on the driver-provided
sf0.001 tables plus crafted frames."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops import (
    asof_join,
    cosine_expr,
    knn_ivf,
    doc_fingerprint,
    embedding_neardup_pairs,
    exact_duplicates,
    knn_bruteforce,
    knn_lsh,
    language_id,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_stats,
    simhash_signatures,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),        # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),          # near dup of 1
        (4, "totally different content here entirely now"),
        (5, "ALPHA beta GAMMA delta epsilon zeta"),         # case-variant
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
class TestDedup:
    def test_exact(self, dup_docs):
        groups = exact_duplicates(dup_docs).collect()
        assert len(groups) == 1
        assert groups[0].n_docs == 2 and groups[0].canonical_id == 1

    def test_ngram_jaccard(self, dup_docs):
        pairs = {
            (r.doc_a, r.doc_b)
            for r in ngram_jaccard_pairs(dup_docs, n=2, threshold=0.5).collect()
        }
        assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
        # shingling lowercases -> case variant is a jaccard-1 pair
        assert (1, 5) in pairs
        assert not any(4 in p for p in pairs)

    def test_minhash_candidates_superset_of_exact(self, dup_docs):
        pairs = {
            (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(dup_docs, n=2).collect()
        }
        assert (1, 2) in pairs  # identical docs always collide in every band
        assert not any(4 in p for p in pairs)

    def test_simhash(self, dup_docs):
        sigs = {r.doc_id: r.simhash for r in simhash_signatures(dup_docs).collect()}
        assert sigs[1] == sigs[2]  # identical text -> identical signature
        ham_13 = bin((sigs[1] ^ sigs[3]) & ((1 << 64) - 1)).count("1")
        ham_14 = bin((sigs[1] ^ sigs[4]) & ((1 << 64) - 1)).count("1")
        assert ham_13 < ham_14  # near-dup closer than unrelated

    def test_embedding_neardup_bucketed(self, spark):
        rows = [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.99, 0.1, 0.0], 0),
            (3, [0.0, 1.0, 0.0], 0),
            (4, [1.0, 0.0, 0.0], 1),  # same vec as 1, different bucket
        ]
        e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        pairs = {
            (r.id_a, r.id_b)
            for r in embedding_neardup_pairs(e, threshold=0.95, bucket_col="label").collect()
        }
        assert pairs == {(1, 2)}
        pairs_all = {
            (r.id_a, r.id_b)
            for r in embedding_neardup_pairs(e, threshold=0.95).collect()
        }
        assert (1, 4) in pairs_all


@pytest.mark.spark
class TestDecontam:
    def _corpus(self, spark):
        rows = [
            # shares the benchmark's exact 5-gram run
            (1, "the quick brown fox jumps over the lazy dog today"),
            # 4-token overlap only -> no shared FULL 5-gram
            (2, "quick brown fox jumps somewhere else entirely new text"),
            # disjoint
            (3, "completely unrelated content about spark physical plans"),
            # under 5 tokens: has NO n-grams at all
            (4, "four tokens only here"),
        ]
        bench = [(100, "benchmark asks the quick brown fox jumps over a fence")]
        return (
            spark.createDataFrame(rows, "doc_id long, text string"),
            spark.createDataFrame(bench, "doc_id long, text string"),
        )

    def test_flags_and_removes_known_overlap(self, spark):
        from lmss_entity_extractor_spark.ops.decontam import (
            contaminated_docs,
            remove_contaminated,
        )

        docs, bench = self._corpus(spark)
        flagged = {r.doc_id: (r.n_hits, r.n_doc_shingles) for r in
                   contaminated_docs(docs, bench, n=5).collect()}
        # doc 1 shares exactly "the quick brown fox jumps" and
        # "quick brown fox jumps over"; docs 2-4 share no full 5-gram
        assert set(flagged) == {1}, flagged
        assert flagged[1] == (2, 6), flagged
        kept = {r.doc_id for r in remove_contaminated(docs, bench, n=5).collect()}
        assert kept == {2, 3, 4}

    def test_short_docs_have_no_ngrams(self, spark):
        """A sub-n-token doc must produce zero n-grams (full windows
        only — the property the DuckDB oracle depends on), even as the
        BENCHMARK side."""
        from lmss_entity_extractor_spark.ops.decontam import contaminated_docs

        docs, _ = self._corpus(spark)
        tiny_bench = docs.filter("doc_id = 4")
        assert contaminated_docs(docs, tiny_bench, n=5).count() == 0

    def test_benchmark_broadcasts(self, spark):
        """The corpus-side scan must broadcast the benchmark n-gram set
        (the corpus is the 100 TB side; a shuffle there is the failure
        mode), unless explicitly disabled."""
        from lmss_entity_extractor_spark.ops.decontam import contaminated_docs

        docs, bench = self._corpus(spark)
        plan = contaminated_docs(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan


@pytest.mark.spark
class TestMixture:
    def _docs(self, spark):
        rows = [(i, "en" if i < 60 else ("es" if i < 80 else "fr")) for i in range(100)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_exact_proportions_at_max_total(self, spark):
        from lmss_entity_extractor_spark.ops.mixture import mixture_quotas, mixture_sample

        docs = self._docs(spark)  # en 60, es 20, fr 20
        # targets 50/25/25: T = min(60/.5=120, 20/.25=80, 20/.25=80) = 80
        q = mixture_quotas({"en": 60, "es": 20, "fr": 20}, {"en": 0.5, "es": 0.25, "fr": 0.25})
        assert q == {"en": 40, "es": 20, "fr": 20}
        out = mixture_sample(docs, {"en": 0.5, "es": 0.25, "fr": 0.25}).collect()
        by = {}
        for r in out:
            by.setdefault(r.lang, set()).add(r.doc_id)
        assert {k: len(v) for k, v in by.items()} == {"en": 40, "es": 20, "fr": 20}
        # weights need not sum to 1 (normalized internally)
        from lmss_entity_extractor_spark.ops.mixture import mixture_quotas as mq

        assert mq({"en": 60, "es": 20, "fr": 20}, {"en": 2, "es": 1, "fr": 1}) == q

    def test_deterministic_across_parallelism_and_appends(self, spark):
        """Same selected ids at any partitioning, and appending rows to
        an untargeted stratum never changes the selection (the Knuth-
        hash ranking is a pure function of key and stratum counts)."""
        from lmss_entity_extractor_spark.ops.mixture import mixture_sample

        docs = self._docs(spark)
        t = {"en": 0.5, "es": 0.25, "fr": 0.25}
        a = {r.doc_id for r in mixture_sample(docs.repartition(1), t).collect()}
        b = {r.doc_id for r in mixture_sample(docs.repartition(17), t).collect()}
        assert a == b and len(a) == 80
        extra = spark.createDataFrame([(1000 + i, "zh") for i in range(50)], "doc_id long, lang string")
        c = {r.doc_id for r in mixture_sample(docs.unionByName(extra), t).collect()}
        assert c == a

    def test_unsatisfiable_mixture_raises(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.ops.mixture import mixture_sample

        docs = self._docs(spark)
        with _pytest.raises(ValueError, match="zero rows"):
            mixture_sample(docs, {"en": 0.5, "zh": 0.5})
        with _pytest.raises(ValueError, match="non-positive"):
            mixture_sample(docs, {"en": 0.5, "es": -0.1})


@pytest.mark.spark
class TestSimilarity:
    def test_cosine_expr_matches_numpy(self, spark, embeddings):
        rows = embeddings.limit(10).collect()
        df = spark.createDataFrame(
            [(a.vec_id, a.embedding, b.vec_id, b.embedding) for a in rows[:3] for b in rows],
            "ida long, va array<float>, idb long, vb array<float>",
        ).withColumn("cos", cosine_expr(F.col("va"), F.col("vb")))
        for r in df.collect():
            va, vb = np.array(r.va), np.array(r.vb)
            want = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            assert r.cos == pytest.approx(want, rel=1e-6)

    def test_knn_bruteforce_topk(self, embeddings):
        queries = embeddings.filter(F.col("vec_id") < 3)
        out = knn_bruteforce(embeddings, queries, k=5).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
        assert set(by_q) == {0, 1, 2}
        for q, lst in by_q.items():
            assert sorted(r for r, _ in lst) == [1, 2, 3, 4, 5]
            assert all(n != q for _, n in lst)

    def test_knn_ivf_single_cell_equals_bruteforce(self, embeddings):
        # with one centroid every vector lands in the same cell, so IVF
        # degenerates to exact brute-force search
        queries = embeddings.filter(F.col("vec_id") < 3)
        ivf = sorted(map(tuple, knn_ivf(embeddings, queries, k=5, n_centroids=1).collect()))
        bf = sorted(map(tuple, knn_bruteforce(embeddings, queries, k=5).collect()))
        assert ivf == bf

    def test_knn_ivf_cells_partition_vectors(self, embeddings):
        from lmss_entity_extractor_spark.ops.similarity import assign_ivf_cells

        seeds = embeddings.filter(F.col("vec_id") < 4)
        cells = assign_ivf_cells(embeddings, seeds)
        assert cells.count() == embeddings.count()  # exactly one cell each
        # a seed vector is its own nearest centroid
        own = {r.vec_id: r.centroid_id for r in cells.filter(F.col("vec_id") < 4).collect()}
        assert own == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_knn_ivf_sparse_ids(self, spark):
        # regression: seed selection must be "n smallest ids", not
        # `id < n` (which yields zero centroids for offset/sparse ids)
        rows = [(1000 + i * 7, [float(i == j) for j in range(4)]) for i in range(4)]
        rows += [(2000 + i, [1.0, float(i) * 0.01, 0.0, 0.0]) for i in range(6)]
        e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = knn_ivf(e, e.filter(F.col("vec_id") >= 2000), k=2, n_centroids=4).collect()
        assert len(out) > 0
        assert all(r.neighbor_id != r.query_id for r in out)

    def test_ivf_trained_recall_on_clustered_data(self, spark):
        # IVF's contract regime: clustered vectors.  Trained k-means must
        # recover the blobs, giving >=0.9 recall@5 at nprobe=1 and
        # monotone recall in nprobe (VERDICT r1 item 4).
        rng = np.random.default_rng(7)
        rows = []
        for c in range(8):
            center = rng.normal(size=16)
            center /= np.linalg.norm(center)
            for i in range(40):
                v = center + 0.15 * rng.normal(size=16)
                rows.append((c * 40 + i, [float(x) for x in v]))
        e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = e.filter(F.col("vec_id") % 40 == 0)  # one query per blob
        bf = set(map(tuple, knn_bruteforce(e, q, k=5).collect()))
        recalls = {}
        for nprobe in (1, 2):
            ivf = set(map(tuple, knn_ivf(e, q, k=5, n_centroids=8, nprobe=nprobe).collect()))
            recalls[nprobe] = len(ivf & bf) / len(bf)
        assert recalls[1] >= 0.9, recalls
        assert recalls[2] >= recalls[1], recalls

    def test_ivf_full_probe_equals_bruteforce(self, embeddings):
        # probing every cell covers every candidate: exact by construction,
        # even on unclustered vectors
        q = embeddings.filter(F.col("vec_id") < 3)
        ivf = sorted(map(tuple, knn_ivf(embeddings, q, k=5, n_centroids=4, nprobe=4).collect()))
        bf = sorted(map(tuple, knn_bruteforce(embeddings, q, k=5).collect()))
        assert ivf == bf

    def test_ivf_persisted_index_matches_and_prunes(self, spark, embeddings, tmp_path):
        """write_ivf_index + knn_ivf_indexed: identical results to the
        in-line knn_ivf with the same codebook params, and the probe scan
        is PARTITION-PRUNED to the probed cells only."""
        from lmss_entity_extractor_spark.ops.similarity import (
            knn_ivf_indexed,
            write_ivf_index,
        )

        idx = str(tmp_path / "ivf_idx")
        write_ivf_index(embeddings, idx, n_centroids=6, n_iters=5)
        q = embeddings.filter(F.col("vec_id") < 4)
        got = sorted(map(tuple, knn_ivf_indexed(spark, idx, q, k=3, nprobe=2).collect()))
        want = sorted(
            map(tuple, knn_ivf(embeddings, q, k=3, n_centroids=6, nprobe=2).collect())
        )
        assert got == want and len(got) > 0

        # pruning: the scan carries a static IN partition filter over the
        # probed cells (inputFiles() reports the pre-pruning FileIndex, so
        # the plan text is the observable), and the on-disk layout is
        # actually split by cell so the filter has partitions to skip
        probed = knn_ivf_indexed(spark, idx, q, k=3, nprobe=1)
        plan = probed._sc._jvm.PythonSQLUtils.explainString(
            probed._jdf.queryExecution(), "formatted"
        )
        import re

        assert re.search(r"PartitionFilters: \[centroid_id#\d+ IN \(", plan), plan
        from pathlib import Path

        cell_dirs = {p.name for p in Path(idx, "cells").glob("centroid_id=*")}
        assert len(cell_dirs) > 1, cell_dirs

    def test_ivf_index_add_matches_rebuild(self, spark, embeddings, tmp_path):
        """ivf_index_add: appending vectors through the FROZEN codebook
        must answer queries exactly like a fresh index whose cells were
        assigned by the same centroids over old ∪ new — and the append
        must not disturb results for pre-existing vectors' cells."""
        import json
        from pathlib import Path

        from lmss_entity_extractor_spark.ops.similarity import (
            ivf_cell_expr,
            ivf_index_add,
            knn_ivf_indexed,
            write_ivf_index,
        )

        old = embeddings.filter(F.col("vec_id") % 3 != 0)
        new = embeddings.filter(F.col("vec_id") % 3 == 0)
        idx = str(tmp_path / "ivf_grow")
        write_ivf_index(old, idx, n_centroids=6, n_iters=5)
        ivf_index_add(new, idx)

        # reference: same frozen centroids, fresh single-shot layout
        cents = [
            (int(c), v)
            for c, v in json.loads((Path(idx) / "centroids.json").read_text())
        ]
        ref = str(tmp_path / "ivf_ref")
        (
            embeddings.withColumn("centroid_id", ivf_cell_expr("embedding", cents))
            .write.partitionBy("centroid_id")
            .parquet(f"{ref}/cells")
        )
        (Path(ref) / "centroids.json").write_text(json.dumps(cents))

        q = embeddings.filter(F.col("vec_id") < 6)
        got = sorted(map(tuple, knn_ivf_indexed(spark, idx, q, k=3, nprobe=2).collect()))
        want = sorted(map(tuple, knn_ivf_indexed(spark, ref, q, k=3, nprobe=2).collect()))
        assert got == want and len(got) > 0

    def test_ivf_training_deterministic(self, embeddings):
        from lmss_entity_extractor_spark.ops.similarity import train_ivf_centroids

        c1 = train_ivf_centroids(embeddings, n_centroids=8, n_iters=5)
        c2 = train_ivf_centroids(embeddings, n_centroids=8, n_iters=5)
        assert c1 == c2  # bit-identical across runs
        # hash-sampled training (the 100 TB path) is deterministic too and
        # yields unit-norm centroids
        c3 = train_ivf_centroids(embeddings, n_centroids=4, n_iters=3, sample_mod=2)
        c4 = train_ivf_centroids(embeddings, n_centroids=4, n_iters=3, sample_mod=2)
        assert c3 == c4
        for _, v in c3:
            assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9

    def test_knn_lsh_subset_of_bucket(self, embeddings):
        queries = embeddings.filter(F.col("vec_id") < 3)
        out = knn_lsh(embeddings, queries, k=5, bits=2).collect()
        assert len(out) > 0
        # every returned neighbor shares the query's sign bucket
        vecs = {r.vec_id: r.embedding for r in embeddings.collect()}

        def bucket(v, bits=2):
            return sum((1 << i) for i in range(bits) if v[i] > 0)

        for r in out:
            assert bucket(vecs[r.query_id]) == bucket(vecs[r.neighbor_id])


@pytest.mark.spark
class TestRangeAndComponents:
    def test_range_join_matches_theta_join(self, spark):
        from lmss_entity_extractor_spark.ops.interval import range_join

        pts = spark.createDataFrame(
            [(i, float(i * 7 % 100)) for i in range(50)], "pid long, v double"
        )
        iv = spark.createDataFrame(
            [(0, 0.0, 30.0), (1, 25.0, 60.0), (2, 90.0, 99.0), (3, 50.0, 10.0)],
            "iid long, lo double, hi double",  # iid=3 inverted -> no matches
        )
        got = sorted(
            (r.pid, r.iid)
            for r in range_join(pts, iv, "v", "lo", "hi", bucket_width=8.0).collect()
        )
        want = sorted(
            (r.pid, r.iid)
            for r in pts.crossJoin(iv)
            .filter((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
            .collect()
        )
        assert got == want and len(got) > 0
        # overlapping intervals may both match a point; no duplicates ever
        assert len(got) == len(set(got))
        # equi-key restriction filters cross-key matches
        pts_k = pts.withColumn("k", F.col("pid") % 2)
        iv_k = iv.withColumn("k", F.col("iid") % 2)
        keyed = range_join(pts_k, iv_k, "v", "lo", "hi", on=["k"], bucket_width=8.0)
        for r in keyed.collect():
            assert r.pid % 2 == r.iid % 2

    def test_connected_components_chain_and_islands(self, spark):
        from lmss_entity_extractor_spark.ops.components import connected_components

        # a 6-node chain (diameter 5 > one propagation round) + a 2-clique
        edges = [(i, i + 1) for i in range(5)] + [(10, 11), (11, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 10: 10, 11: 10}

    def test_dedup_clusters_transitive(self, spark, dup_docs):
        from lmss_entity_extractor_spark.ops.components import dedup_clusters

        # pairs (1,2), (2,5), (1,3): transitive closure -> one cluster of 4
        pairs = spark.createDataFrame([(1, 2), (2, 5), (1, 3)], "doc_a long, doc_b long")
        got = {r.doc_id: r.canonical_id for r in dedup_clusters(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 5: 1}

    def test_star_long_chain_converges_in_log_rounds(self, spark):
        """VERDICT r2 item 8 / r6 halving: a 256-hop chain used to need
        256 pure-propagation rounds (raising at max_iter=25); with path
        halving the propagation variant now collapses it within the same
        25-round budget, and the large-star/small-star variant still
        finishes in O(log d) rounds — all with identical labels."""
        from lmss_entity_extractor_spark.ops.components import (
            connected_components,
            connected_components_star,
        )

        n = 256
        df = spark.createDataFrame([(i, i + 1) for i in range(n)], "src long, dst long")
        got_prop = {
            r.node: r.component for r in connected_components(df, max_iter=25).collect()
        }
        assert got_prop == {i: 0 for i in range(n + 1)}

        stats = {}
        got = {
            r.node: r.component
            for r in connected_components_star(df, stats=stats).collect()
        }
        assert got == {i: 0 for i in range(n + 1)}
        assert stats["rounds"] <= 12, f"{stats['rounds']} rounds for a {n}-hop chain"

    def test_star_matches_propagation_on_random_graphs(self, spark):
        """Both algorithms agree label-for-label on seeded random graphs
        (mixed components, string ids, duplicate + self edges)."""
        import random

        from lmss_entity_extractor_spark.ops.components import connected_components

        rng = random.Random(7)
        for trial in range(3):
            edges = [
                (f"n{rng.randrange(40):02d}", f"n{rng.randrange(40):02d}")
                for _ in range(45)
            ]
            df = spark.createDataFrame(edges, "src string, dst string")
            prop = {r.node: r.component for r in connected_components(df).collect()}
            star = {
                r.node: r.component
                for r in connected_components(df, algorithm="star").collect()
            }
            assert prop == star and len(star) > 0


@pytest.mark.spark
class TestBM25:
    def test_bm25_matches_hand_computation(self, spark):
        import math

        from lmss_entity_extractor_spark.ops.bm25 import bm25_topk

        corpus = [
            (1, "spark shuffle spark join"),
            (2, "spark memory"),
            (3, "pandas loop loop loop"),
            (4, "shuffle"),
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {r.doc_id: (r.score, r.n_hits) for r in bm25_topk(df, "spark shuffle", k=10).collect()}

        # hand BM25 (k1=1.2, b=0.75): N=4, avgdl=(4+2+4+1)/4
        def idf(dfreq, n=4):
            return math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)

        def term(tf, dl, dfreq, avgdl=11 / 4):
            return idf(dfreq) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

        want = {
            1: round(term(2, 4, 2) + term(1, 4, 2), 6),  # spark x2, shuffle x1
            2: round(term(1, 2, 2), 6),                   # spark
            4: round(term(1, 1, 2), 6),                   # shuffle
        }
        assert set(got) == set(want)
        for d in want:
            assert got[d][0] == pytest.approx(want[d], abs=2e-6), d
        assert got[1][1] == 2 and got[2][1] == 1 and got[4][1] == 1
        # doc 1 hits both terms and must rank first
        top = bm25_topk(df, "spark shuffle", k=1).collect()[0]
        assert top.doc_id == 1

    def test_bm25_indexed_matches_inline_and_prunes(self, spark, tmp_path):
        import re

        from lmss_entity_extractor_spark.ops.bm25 import (
            bm25_topk,
            bm25_topk_indexed,
            write_bm25_index,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        idx = str(tmp_path / "bm25_idx")
        write_bm25_index(docs, idx, n_buckets=8)
        q = "spark shuffle partition memory"
        got = [tuple(r) for r in bm25_topk_indexed(spark, idx, q, k=10).collect()]
        want = [tuple(r) for r in bm25_topk(docs, q, k=10).collect()]
        assert got == want and len(got) == 10
        # probe is partition-pruned to the query terms' buckets
        df = bm25_topk_indexed(spark, idx, q, k=10)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        assert re.search(r"PartitionFilters: \[bucket#\d+ IN \(", plan), plan

    def test_bm25_index_add_matches_rebuild_bit_identically(self, spark, tmp_path):
        """bm25_index_add: grown index == fresh build over old ∪ new,
        score-bit-for-score-bit — the exact-integer stats (n_docs,
        sum_dl) make avgdl one identical division in both paths."""
        from lmss_entity_extractor_spark.ops.bm25 import (
            bm25_index_add,
            bm25_topk_indexed,
            write_bm25_index,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        old = docs.filter(F.col("doc_id") % 4 != 0)
        new = docs.filter(F.col("doc_id") % 4 == 0)
        grown = str(tmp_path / "bm25_grown")
        write_bm25_index(old, grown, n_buckets=8)
        bm25_index_add(new, grown)
        fresh = str(tmp_path / "bm25_fresh")
        write_bm25_index(docs, fresh, n_buckets=8)
        q = "spark shuffle partition memory"
        got = [tuple(r) for r in bm25_topk_indexed(spark, grown, q, k=10).collect()]
        want = [tuple(r) for r in bm25_topk_indexed(spark, fresh, q, k=10).collect()]
        assert got == want and len(got) == 10
        # legacy index without integer stats refuses loudly
        import json
        from pathlib import Path

        meta = json.loads(Path(fresh, "stats.json").read_text())
        del meta["sum_dl"]
        Path(fresh, "stats.json").write_text(json.dumps(meta))
        with pytest.raises(ValueError, match="sum_dl"):
            bm25_index_add(new, fresh)
        # ...but still serves reads via the stored avgdl fallback
        assert [tuple(r) for r in bm25_topk_indexed(spark, fresh, q, k=10).collect()] == want

    def test_bm25_empty_query_raises(self, spark):
        from lmss_entity_extractor_spark.ops.bm25 import bm25_topk

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bm25_topk(df, "   ")


@pytest.mark.spark
class TestTextPrep:
    def test_chunk_documents_overlap_and_tail(self, spark):
        from lmss_entity_extractor_spark.ops.textprep import chunk_documents

        toks = [f"t{i}" for i in range(10)]
        df = spark.createDataFrame(
            [(1, " ".join(toks)), (2, "one"), (3, ""), (4, "   ")],
            "doc_id long, text string",
        )
        rows = {
            (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_tokens)
            for r in chunk_documents(df, chunk_tokens=4, stride=3).collect()
        }
        # doc 1: 10 tokens, chunk 4, stride 3 -> 1 + ceil((10-4)/3) = 3
        # chunks; windows overlap by 1 and the last reaches the final
        # token.  NO 4th chunk: its window ('t9') would be fully
        # contained in chunk 2 — shipping duplicate text (review finding)
        assert rows[(1, 0)] == ("t0 t1 t2 t3", 4)
        assert rows[(1, 1)] == ("t3 t4 t5 t6", 4)
        assert rows[(1, 2)] == ("t6 t7 t8 t9", 4)
        assert (1, 3) not in rows
        assert rows[(2, 0)] == ("one", 1)
        # empty / whitespace-only docs emit exactly one empty chunk with
        # ZERO tokens (split('') yields [''] — the phantom must not count,
        # or pack_chunks' bin accounting shifts)
        assert rows[(3, 0)] == ("", 0) and rows[(4, 0)] == ("", 0)
        assert {k[0] for k in rows} == {1, 2, 3, 4}

    def test_scrub_pii_categories_and_order(self, spark):
        from lmss_entity_extractor_spark.ops.textprep import scrub_pii

        df = spark.createDataFrame(
            [
                (1, "mail a.b+c@x-corp.io or p_2@a.b.co, call 415-555-0199, SSN 123-45-6789"),
                (2, "clean text, no pii at all"),
                (3, "edge 999-99-9999 vs 999-999-9999"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in scrub_pii(df).collect()}
        assert got[1].scrubbed_text == "mail <EMAIL> or <EMAIL>, call <PHONE>, SSN <SSN>"
        assert (got[1].n_email, got[1].n_phone, got[1].n_ssn) == (2, 1, 1)
        assert got[2].scrubbed_text == "clean text, no pii at all"
        assert (got[2].n_email, got[2].n_phone, got[2].n_ssn) == (0, 0, 0)
        # SSN must not eat the phone's 3-3-4 shape
        assert got[3].scrubbed_text == "edge <SSN> vs <PHONE>"

    def test_scrub_pii_email_with_digit_run_redacts_whole(self, spark):
        # review finding: email runs FIRST — an address whose local part
        # contains a phone-shaped digit run must redact as ONE email,
        # not leak 'john.'/'@mail.com' around a spliced <PHONE>
        from lmss_entity_extractor_spark.ops.textprep import scrub_pii

        df = spark.createDataFrame(
            [(1, "reach john.555-123-4567@mail.com today")], "doc_id long, text string"
        )
        r = scrub_pii(df).collect()[0]
        assert r.scrubbed_text == "reach <EMAIL> today"
        assert (r.n_email, r.n_phone, r.n_ssn) == (1, 0, 0)

    def test_quantize_roundtrip_fidelity(self, spark, embeddings):
        from lmss_entity_extractor_spark.ops.quantize import (
            dequantize_expr,
            quantize_embeddings,
        )
        from lmss_entity_extractor_spark.ops.similarity import cosine_expr

        qd = quantize_embeddings(embeddings.limit(50))
        rows = qd.select(
            "embedding",
            "q_scale",
            "q_vec",
            cosine_expr(dequantize_expr(F.col("q_vec"), F.col("q_scale")), F.col("embedding")).alias("fid"),
        ).collect()
        assert rows
        for r in rows:
            assert all(-127 <= c <= 127 for c in r.q_vec)
            assert r.fid > 0.999  # int8 keeps cosine geometry
            # scale reproduces absmax within one quantization step
            assert abs(max(abs(x) for x in r.embedding) - r.q_scale * 127.0) < 1e-6

    def test_quantized_knn_preserves_neighbors(self, spark, embeddings):
        """Retrieval over the int8 codes: symmetric quantization cancels
        the per-vector scale out of cosine (cos(q_a*s_a, q_b*s_b) ==
        cos(q_a, q_b)), so knn_bruteforce runs DIRECTLY on the code
        arrays — 4x less scan/broadcast bytes — and must keep high
        recall vs the float path."""
        from lmss_entity_extractor_spark.ops.quantize import quantize_embeddings
        from lmss_entity_extractor_spark.ops.similarity import knn_bruteforce

        qd = quantize_embeddings(embeddings).select("vec_id", "q_vec")
        q = qd.filter(F.col("vec_id") < 5)
        # neighbor-SET recall: int8 rounding may swap ranks among the
        # near-tie cosines of random vectors; what matters is that the
        # retrieved set survives quantization
        got = {
            (r.query_id, r.neighbor_id)
            for r in knn_bruteforce(qd, q, k=5, vec_col="q_vec").collect()
        }
        want = {
            (r.query_id, r.neighbor_id)
            for r in knn_bruteforce(
                embeddings, embeddings.filter(F.col("vec_id") < 5), k=5
            ).collect()
        }
        recall = len(got & want) / len(want)
        assert recall >= 0.85, recall

    def test_quantize_zero_vector(self, spark):
        from lmss_entity_extractor_spark.ops.quantize import quantize_embeddings

        df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>")
        r = quantize_embeddings(df).collect()[0]
        assert r.q_scale == 0.0 and list(r.q_vec) == [0, 0, 0]

    def test_pack_chunks_bins_and_offsets(self, spark):
        from lmss_entity_extractor_spark.ops.textprep import pack_chunks

        rows = [
            # shard 0: token lengths 40, 40, 10 -> offsets 0, 40, 80
            (1, 0, 0, 40), (1, 1, 0, 40), (2, 0, 0, 10),
            # shard 1: 64, 1 -> offsets 0, 64
            (3, 0, 1, 64), (3, 1, 1, 1),
        ]
        df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, shard int, n_chunk_tokens int")
        got = {
            (r.doc_id, r.chunk_idx): (r.tok_offset, r.bin_id)
            for r in pack_chunks(df, 64, "shard", ["doc_id", "chunk_idx"]).collect()
        }
        assert got[(1, 0)] == (0, 0)
        assert got[(1, 1)] == (40, 0)   # starts inside bin 0, straddles into 1
        assert got[(2, 0)] == (80, 1)
        assert got[(3, 0)] == (0, 0)
        assert got[(3, 1)] == (64, 1)   # exactly at the boundary -> next bin

    def test_stratified_sample_deterministic_and_append_stable(self, spark):
        from lmss_entity_extractor_spark.ops.textprep import stratified_sample

        df = spark.createDataFrame(
            [(i, i % 4) for i in range(2000)], "vec_id long, label int"
        )
        rate = F.lit(100) + F.col("label") * F.lit(100)  # 10%/20%/30%/40%
        a = {r.vec_id for r in stratified_sample(df, "vec_id", "label", rate).collect()}
        b = {r.vec_id for r in stratified_sample(df.repartition(13), "vec_id", "label", rate).collect()}
        assert a == b and a  # parallelism-independent
        # per-stratum rates land near target (hash uniformity)
        per = {lab: sum(1 for v in a if v % 4 == lab) / 500 for lab in range(4)}
        for lab in range(4):
            assert abs(per[lab] - (lab + 1) * 0.1) < 0.06, per
        # append-stability: sampling a superset keeps the same original rows
        bigger = spark.createDataFrame(
            [(i, i % 4) for i in range(3000)], "vec_id long, label int"
        )
        c = {r.vec_id for r in stratified_sample(bigger, "vec_id", "label", rate).collect()}
        assert {v for v in c if v < 2000} == a


@pytest.mark.spark
class TestTextStats:
    def test_quality_stats(self, spark):
        df = spark.createDataFrame(
            [(1, "one two three four"), (2, "dup dup dup dup"), (3, "!!! ??? ...")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in quality_stats(df).collect()}
        assert rows[1].n_tokens == 4 and rows[1].uniq_token_ratio == 1.0
        assert rows[2].uniq_token_ratio == 0.25
        assert rows[3].punct_ratio > 0.5
        assert rows[1].quality_score > rows[3].quality_score

    def test_language_id(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat and the dog sat in the yard of the house"),
                (2, "el gato y la casa de los perros que viven"),
                (3, "xyzzy plugh"),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r.lang_guess for r in language_id(df).collect()}
        assert rows[1] == "en" and rows[2] == "es" and rows[3] == "und"

    def test_fingerprint_formatting_invariant(self, spark):
        df = spark.createDataFrame(
            [(1, "Patent Law!"), (2, "patent  LAW"), (3, "different")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r.fingerprint for r in doc_fingerprint(df).collect()}
        assert rows[1] == rows[2] != rows[3]

    def test_on_real_documents(self, docs):
        out = quality_stats(docs)
        assert out.count() == docs.count()
        assert out.filter(F.col("quality_score").between(0, 1)).count() == out.count()

    def test_token_counts(self, spark):
        from lmss_entity_extractor_spark.ops.textstats import token_counts

        df = spark.createDataFrame(
            [(1, "plain words here"), (2, "df.filter(x==3)"), (3, "a b-c 12,000")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in token_counts(df).collect()}
        assert rows[1].n_ws_tokens == 3 and rows[1].n_bpe_tokens == 3
        # df . filter ( x = = 3 ) -> 1 ws token, 9 bpe tokens
        # (punctuation is tokenized one char at a time)
        assert rows[2].n_ws_tokens == 1 and rows[2].n_bpe_tokens == 9
        # a | b - c | 12 , 000 -> 3 ws, 7 bpe
        assert rows[3].n_bpe_tokens == 7
        assert rows[2].bpe_per_word > rows[1].bpe_per_word


@pytest.mark.spark
class TestMultimodal:
    def test_feature_plumbing(self, spark, docs):
        from lmss_entity_extractor_spark.ops.multimodal import (
            extract_media_features,
            make_media_table,
            sample_frames,
        )

        media = make_media_table(docs.limit(20))
        feats = extract_media_features(media).collect()
        assert len(feats) == 20
        for r in feats:
            assert r.feat_dim == 16 and len(r.features) == 16
            assert abs(sum(v * v for v in r.features) - 1.0) < 1e-4
        # determinism across runs
        feats2 = extract_media_features(make_media_table(docs.limit(20))).collect()
        assert {r.media_id: tuple(r.features) for r in feats} == {
            r.media_id: tuple(r.features) for r in feats2
        }
        frames = sample_frames(media)
        assert frames.count() >= 20
        assert frames.groupBy("media_id").count().count() == 20

    def test_real_decode_is_stubbed(self, spark, docs):
        from lmss_entity_extractor_spark.ops.multimodal import (
            extract_media_features,
            make_media_table,
        )

        media = make_media_table(docs.limit(1))
        with pytest.raises(Exception) as exc_info:
            extract_media_features(media, decode_stub=False).collect()
        assert "NotImplementedError" in str(exc_info.value) or isinstance(
            exc_info.value, NotImplementedError
        )


@pytest.mark.spark
class TestHybridSearch:
    def test_search_matches_loop_oracle(self, spark, artifacts):
        from lmss_entity_extractor_spark.encoder import encode, cosine
        from lmss_entity_extractor_spark.search import hybrid_search
        from lmss_entity_extractor_spark.textproc import partial_ratio, token_set_ratio

        query = "patent law"
        got = [(r.iri, r.score) for r in hybrid_search(spark, artifacts, query).collect()]

        qv = encode(query)
        scored = []
        for pos, iri in enumerate(artifacts.iris):
            lbl = artifacts.labels[pos].lower()
            s = (
                0.3 * token_set_ratio(query, lbl) / 100
                + 0.3 * partial_ratio(query, lbl) / 100
                + 0.4 * cosine(qv, artifacts.mean_matrix[pos])
            )
            if s > 0:
                scored.append((iri, s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        want = [(i, round(s, 6)) for i, s in scored[:10]]
        assert [i for i, _ in got] == [i for i, _ in want]
        for (_, g), (_, w) in zip(got, want):
            assert g == pytest.approx(w, abs=1e-4)

    def test_branch_filter_restricts_results(self, spark, artifacts):
        from lmss_entity_extractor_spark.datagen.ontology_fixture import BASE
        from lmss_entity_extractor_spark.search import hybrid_search

        got = hybrid_search(
            spark, artifacts, "law", selected_branches=[BASE + "Location"]
        ).collect()
        location_members = {
            d for d, a, _ in artifacts.closure if a == BASE + "Location"
        }
        assert got and all(r.iri in location_members for r in got)


@pytest.mark.spark
class TestAsofJoin:
    def test_backward_inclusive_with_ties(self, spark):
        clicks = spark.createDataFrame(
            [(1, 10, 100), (1, 30, 101), (1, 30, 102), (2, 50, 200)],
            "user_id long, t long, event_id long",
        )
        purchases = spark.createDataFrame(
            [(1, 5, 900), (1, 20, 901), (1, 30, 902), (2, 60, 903), (3, 70, 904)],
            "user_id long, t long, event_id long",
        )
        out = {
            r.event_id: r.asof_event_id
            for r in asof_join(
                purchases, clicks, on=["user_id"], ts_col="t",
                right_cols=["event_id"], tie_col="event_id",
            ).collect()
        }
        assert out == {
            900: None,   # nothing before t=5
            901: 100,    # latest click <= 20
            902: 102,    # equal-ts click matches (inclusive); max event_id wins the tie
            903: 200,
            904: None,   # user 3 never clicked
        }

    def test_left_rows_all_preserved(self, spark):
        e = spark.read.parquet(f"{SF}/events.parquet")
        purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
        clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
        joined = asof_join(purchases, clicks, on=["user_id"], ts_col="ts",
                           right_cols=["event_id", "ts"], tie_col="event_id")
        assert joined.count() == purchases.count()
        # every match really is <= the purchase ts
        bad = joined.filter(F.col("asof_ts") > F.col("ts")).count()
        assert bad == 0


@pytest.mark.spark
class TestReviewRegressions:
    def test_sample_frames_emits_trailing_partial(self, spark):
        from lmss_entity_extractor_spark.ops.multimodal import sample_frames

        media = spark.createDataFrame(
            [("m1", "text/plain", b"x" * 65, 65), ("m2", "text/plain", b"y" * 63, 63)],
            "media_id string, mime string, payload binary, n_bytes long",
        )
        counts = {r.media_id: r.n for r in sample_frames(media, every_n_bytes=64)
                  .groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"m1": 2, "m2": 1}  # 65 bytes -> full + partial frame

    def test_sample_frames_binary_exact_slices(self, spark):
        """Frame bytes must be EXACT slices of the original payload for
        non-UTF8 media (real images/audio are not valid UTF-8; a string
        cast mangles them).  Random bytes round-trip byte-for-byte."""
        import random

        from pyspark.sql.types import BinaryType

        from lmss_entity_extractor_spark.ops.multimodal import sample_frames

        rng = random.Random(7)
        payloads = {
            "m1": bytes(rng.randrange(256) for _ in range(150)),  # 2 full + partial
            "m2": bytes([0xFF, 0xFE, 0x00, 0x80] * 5),            # invalid UTF-8
            "m3": b"",                                            # empty payload
        }
        media = spark.createDataFrame(
            [(k, "image/png", v, len(v)) for k, v in payloads.items()],
            "media_id string, mime string, payload binary, n_bytes long",
        )
        frames = sample_frames(media, every_n_bytes=64)
        assert isinstance(frames.schema["frame_bytes"].dataType, BinaryType)
        got = {}
        for r in frames.collect():
            got.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame_bytes)
        for mid, payload in payloads.items():
            rebuilt = b"".join(got[mid][i] for i in sorted(got[mid]))
            assert rebuilt == payload, mid
            for i, chunk in sorted(got[mid].items()):
                assert chunk == payload[i * 64 : (i + 1) * 64]

    def test_detect_mentions_vector_without_context(self, spark):
        from lmss_entity_extractor_spark.datagen import gen_transcript_rows, write_fixture_owl
        from lmss_entity_extractor_spark.datagen.transcripts import rows_to_pandas
        from lmss_entity_extractor_spark.extraction.stage import detect_mentions
        from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes

        owl = write_fixture_owl("/tmp/ops_fixture.owl")
        bc = spark.sparkContext.broadcast(build_artifacts(parse_owl_classes(owl)))
        tdf = spark.createDataFrame(rows_to_pandas(gen_transcript_rows(n_convs=2, seed=5)))
        out = detect_mentions(tdf, bc, with_vector=True, with_context=False)
        assert "vector" in out.columns and "context" not in out.columns
        row = out.first()
        assert row is not None and len(row.vector) > 0


@pytest.mark.spark
class TestPagerank:
    def test_pagerank_known_graphs(self, spark):
        from lmss_entity_extractor_spark.graph.pagerank import pagerank

        # 2-cycle: symmetric stationary distribution -> exactly 1/2 each
        e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
        ranks = {r.node: r.rank for r in pagerank(e, n_iters=25).collect()}
        assert abs(ranks["a"] - 0.5) < 1e-9 and abs(ranks["b"] - 0.5) < 1e-9

        # star into a sink: the center accumulates, leaves stay at the
        # teleport floor and equal each other; total mass <= 1 (dangling
        # center absorbs, simple variant)
        e2 = spark.createDataFrame(
            [("l1", "c"), ("l2", "c"), ("l3", "c")], "src string, dst string"
        )
        r2 = {r.node: r.rank for r in pagerank(e2, n_iters=10).collect()}
        assert r2["c"] > r2["l1"] > 0
        assert abs(r2["l1"] - r2["l2"]) < 1e-12
        assert sum(r2.values()) <= 1.0 + 1e-9

    def test_ppr_matches_numpy_twin(self, spark):
        """Personalized PageRank agrees with a dense numpy power
        iteration of the identical recurrence on a seeded digraph."""
        import random

        import numpy as np

        from lmss_entity_extractor_spark.graph.pagerank import personalized_pagerank

        rng = random.Random(3)
        n = 12
        edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(40)
                        if True})
        edges = [(a, b) for a, b in edges if a != b]
        e = spark.createDataFrame(edges, "src long, dst long")
        sources = [0, 5]
        got = {r.node: r.rank
               for r in personalized_pagerank(e, sources, n_iters=15).collect()}

        outdeg = np.zeros(n)
        for a, _ in edges:
            outdeg[a] += 1
        restart = np.zeros(n)
        restart[sources] = 1 / len(sources)
        rank = restart.copy()
        for _ in range(15):
            inflow = np.zeros(n)
            for a, b in edges:
                inflow[b] += rank[a] / outdeg[a]
            rank = 0.15 * restart + 0.85 * inflow
        present = {i for a, b in edges for i in (a, b)} | set(sources)
        for i in present:
            assert abs(got[i] - rank[i]) < 1e-9, (i, got[i], rank[i])

    def test_ppr_proximity_and_isolated_source(self, spark):
        """On a directed chain from the source, rank decays with
        distance; a source absent from the edge list keeps its restart
        mass and nothing else."""
        from lmss_entity_extractor_spark.graph.pagerank import personalized_pagerank

        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "src long, dst long"
        )
        got = {r.node: r.rank
               for r in personalized_pagerank(e, [0, 99], n_iters=20).collect()}
        assert got[0] > got[1] > got[2] > got[3] > 0
        # node 99 has no edges: it holds exactly its restart share
        assert abs(got[99] - 0.15 * 0.5) < 1e-12

    def test_ppr_uniform_sources_reduces_to_pagerank(self, spark):
        """Sources = all nodes -> uniform restart -> bit-for-bit the
        standard pagerank recurrence."""
        from lmss_entity_extractor_spark.graph.pagerank import (
            pagerank,
            personalized_pagerank,
        )

        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)], "src long, dst long"
        )
        pr = {r.node: r.rank for r in pagerank(e, n_iters=8).collect()}
        ppr = {r.node: r.rank
               for r in personalized_pagerank(e, [0, 1, 2, 3], n_iters=8).collect()}
        assert ppr == pr

    def test_ppr_validation(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.graph.pagerank import personalized_pagerank

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        with _pytest.raises(ValueError):
            personalized_pagerank(e, [])
        with _pytest.raises(ValueError):
            personalized_pagerank(e, e)


@pytest.mark.spark
class TestPQ:
    def _clustered(self, spark, n=300, dim=32, seed=5):
        import random

        rng = random.Random(seed)
        rows = []
        for i in range(n):
            label = i % 4
            v = [rng.gauss(0.0, 0.3) + (6.0 if d == label else 0.0) for d in range(dim)]
            rows.append((i, v))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_codes_match_numpy_twin_and_are_deterministic(self, spark):
        import numpy as np

        from lmss_entity_extractor_spark.ops.pq import (
            encode_pq,
            train_pq_codebooks,
        )

        e = self._clustered(spark)
        books = train_pq_codebooks(e, m=4, k=8)
        assert books == train_pq_codebooks(e, m=4, k=8)  # bit-identical retrain
        got = {r.vec_id: r.codes for r in encode_pq(e, books).collect()}
        sub = 32 // 4
        for r in e.collect():
            want = []
            for j, book in enumerate(books):
                best = None
                for code, cent in book:
                    acc = 0.0
                    for x, c in zip(r.embedding[j * sub : (j + 1) * sub], cent):
                        dd = float(x) - c
                        acc = acc + dd * dd
                    if best is None or (acc, code) < best:
                        best = (acc, code)
                want.append(best[1])
            assert got[r.vec_id] == want, r.vec_id

    def test_adc_preserves_cluster_geometry(self, spark):
        """PQ's quality contract at a 16-code budget is COARSE geometry:
        every ADC top-k neighbor must come from the query's true cluster
        (fine in-cluster ranking is below quantization resolution by
        design — exactness of the ADC math itself is value-checked by the
        knn_pq DuckDB oracle, and a duplicate vector must rank first)."""
        from lmss_entity_extractor_spark.ops.pq import encode_pq, knn_pq, train_pq_codebooks

        e = self._clustered(spark)
        books = train_pq_codebooks(e, m=4, k=16)
        codes = encode_pq(e, books)
        q = e.filter(F.col("vec_id") < 5)
        out = knn_pq(codes, q, books, k=5).collect()
        assert {r.query_id for r in out} == {0, 1, 2, 3, 4}
        for r in out:
            assert r.neighbor_id % 4 == r.query_id % 4, (r.query_id, r.neighbor_id)
        # an exact duplicate codes identically -> ADC distance equal to the
        # query's own reconstruction -> it must appear at rank 1 (id tiebreak)
        dup = e.filter(F.col("vec_id") == 0).select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        )
        codes2 = encode_pq(e.unionByName(dup), books)
        top = [
            r
            for r in knn_pq(codes2, q, books, k=3).collect()
            if r.query_id == 0 and r.rank == 1
        ]
        assert len(top) == 1 and top[0].neighbor_id % 1000 == 0

    def test_train_rejects_bad_dim_and_empty(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.ops.pq import train_pq_codebooks

        e = self._clustered(spark)
        with _pytest.raises(ValueError, match="not divisible"):
            train_pq_codebooks(e, m=5)
        with _pytest.raises(ValueError, match="empty"):
            train_pq_codebooks(e.filter("vec_id < 0"), m=4)

    def test_ivfpq_full_probe_equals_pq(self, spark):
        """Probing every IVF cell covers every candidate, so IVFADC
        degenerates to plain ADC over all codes — equality pins the
        composition (cell pruning never changes scores, only candidates)."""
        from lmss_entity_extractor_spark.ops.pq import (
            encode_pq,
            knn_ivfpq,
            knn_pq,
            train_pq_codebooks,
        )

        e = self._clustered(spark)
        q = e.filter(F.col("vec_id") < 4)
        books = train_pq_codebooks(e, m=4, k=16)
        plain = sorted(map(tuple, knn_pq(encode_pq(e, books), q, books, k=5).collect()))
        full = sorted(
            map(
                tuple,
                knn_ivfpq(
                    e, q, k=5, n_centroids=4, nprobe=4, m=4, pq_k=16, rerank=0
                ).collect(),
            )
        )
        assert plain == full
        # pruned probe stays within the query's cluster on this geometry
        pruned = knn_ivfpq(
            e, q, k=5, n_centroids=4, nprobe=1, m=4, pq_k=16, rerank=0
        ).collect()
        assert {r.query_id for r in pruned} == {0, 1, 2, 3}
        for r in pruned:
            assert r.neighbor_id % 4 == r.query_id % 4

    def test_empty_query_set_returns_empty_frame(self, spark):
        from lmss_entity_extractor_spark.ops.pq import (
            encode_pq,
            knn_ivfpq,
            knn_pq,
            train_pq_codebooks,
        )

        e = self._clustered(spark)
        books = train_pq_codebooks(e, m=4, k=8)
        none = e.filter("vec_id < 0")
        out = knn_pq(encode_pq(e, books), none, books, k=3)
        assert out.columns == ["query_id", "rank", "neighbor_id"] and out.count() == 0
        out2 = knn_ivfpq(e, none, k=3, n_centroids=4, m=4)
        assert out2.columns == ["query_id", "rank", "neighbor_id"] and out2.count() == 0

    def test_ivfpq_indexed_equals_inline_and_prunes(self, spark, tmp_path):
        """Persisted IVFADC: probes equal the inline composition (same
        deterministic training from the same sample) and the cell scan
        carries a static IN partition filter over real cell dirs."""
        import re
        from pathlib import Path

        from lmss_entity_extractor_spark.ops.pq import (
            knn_ivfpq,
            knn_ivfpq_indexed,
            write_ivfpq_index,
        )

        e = self._clustered(spark)
        q = e.filter(F.col("vec_id") < 4)
        idx = str(tmp_path / "ivfpq")
        write_ivfpq_index(e, idx, n_centroids=4, m=4, pq_k=16)
        got = sorted(
            map(tuple, knn_ivfpq_indexed(spark, idx, q, k=5, nprobe=2).collect())
        )
        want = sorted(
            map(
                tuple,
                knn_ivfpq(e, q, k=5, n_centroids=4, nprobe=2, m=4, pq_k=16).collect(),
            )
        )
        assert got == want and len(got) > 0

        probed = knn_ivfpq_indexed(spark, idx, q, k=5, nprobe=1)
        plan = probed._sc._jvm.PythonSQLUtils.explainString(
            probed._jdf.queryExecution(), "formatted"
        )
        assert re.search(r"PartitionFilters: \[centroid_id#\d+ IN \(", plan), plan
        assert len({p.name for p in Path(idx, "cells").glob("centroid_id=*")}) > 1

    def _exact_l2_topk(self, e_rows, q_ids, k):
        """Driver-side exact squared-L2 reference ranking (float64,
        deterministic (dist, id) tiebreak)."""
        vecs = {r.vec_id: [float(x) for x in r.embedding] for r in e_rows}
        out = set()
        for qid in q_ids:
            qv = vecs[qid]
            scored = sorted(
                (sum((x - y) * (x - y) for x, y in zip(v, qv)), nid)
                for nid, v in vecs.items()
                if nid != qid
            )
            out.update((qid, rank + 1, nid) for rank, (_d, nid) in enumerate(scored[:k]))
        return out

    def test_rerank_recovers_exact_ranking(self, spark):
        """Jegou §V: with every cell probed and the shortlist covering
        all candidates, the exact-L2 re-rank must reproduce the EXACT
        top-k bit-for-bit (pins the re-rank fold itself); the default
        auto shortlist must strictly improve on pure ADC — the
        recall-closing property the r3 VERDICT asked for."""
        from lmss_entity_extractor_spark.ops.pq import knn_ivfpq

        e = self._clustered(spark)
        q = e.filter(F.col("vec_id") < 4)
        exact = self._exact_l2_topk(e.collect(), range(4), 5)
        full = {
            tuple(r)
            for r in knn_ivfpq(
                e, q, k=5, n_centroids=4, nprobe=4, m=4, pq_k=16, rerank=300
            ).collect()
        }
        assert full == exact

        def recall(rerank):
            got = {
                tuple(r)
                for r in knn_ivfpq(
                    e, q, k=5, n_centroids=4, nprobe=4, m=4, pq_k=16, rerank=rerank
                ).collect()
            }
            hit = {(a, c) for a, _b, c in got} & {(a, c) for a, _b, c in exact}
            return len(hit) / len(exact)

        r_adc, r_default = recall(0), recall(None)
        assert r_default > r_adc, (r_adc, r_default)
        assert r_default >= 0.9, r_default

    def test_rerank_indexed_reads_floats_from_probed_cells(self, spark, tmp_path):
        """The persisted re-rank path: identical results to the inline
        form, and a vectorless index refuses re-rank loudly instead of
        mis-ranking (pure ADC still served via rerank=0)."""
        import pytest as _pytest

        from lmss_entity_extractor_spark.ops.pq import (
            knn_ivfpq,
            knn_ivfpq_indexed,
            write_ivfpq_index,
        )

        e = self._clustered(spark)
        q = e.filter(F.col("vec_id") < 4)
        idx = str(tmp_path / "ivfpq_vec")
        write_ivfpq_index(e, idx, n_centroids=4, m=4, pq_k=16)
        got = sorted(
            map(tuple, knn_ivfpq_indexed(spark, idx, q, k=5, nprobe=2).collect())
        )
        want = sorted(
            map(
                tuple,
                knn_ivfpq(e, q, k=5, n_centroids=4, nprobe=2, m=4, pq_k=16).collect(),
            )
        )
        assert got == want and len(got) > 0

        bare = str(tmp_path / "ivfpq_bare")
        write_ivfpq_index(e, bare, n_centroids=4, m=4, pq_k=16, store_vectors=False)
        with _pytest.raises(ValueError, match="store_vectors"):
            knn_ivfpq_indexed(spark, bare, q, k=5, nprobe=2)
        adc_only = knn_ivfpq_indexed(spark, bare, q, k=5, nprobe=2, rerank=0)
        assert adc_only.count() > 0

    def test_knn_pq_rerank_needs_embeddings_and_recovers_exact(self, spark):
        from lmss_entity_extractor_spark.ops.pq import (
            encode_pq,
            knn_pq,
            train_pq_codebooks,
        )

        e = self._clustered(spark)
        q = e.filter(F.col("vec_id") < 3)
        books = train_pq_codebooks(e, m=4, k=16)
        codes = encode_pq(e, books)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="embeddings"):
            knn_pq(codes, q, books, k=5, rerank=50)
        got = {
            tuple(r)
            for r in knn_pq(codes, q, books, k=5, rerank=300, embeddings=e).collect()
        }
        assert got == self._exact_l2_topk(e.collect(), range(3), 5)

    def _scattered(self, spark, n=300, dim=32, seed=13):
        """Clusters whose CENTERS spread across every dimension — the
        regime where raw-vector PQ wastes its code budget covering
        distant cluster positions and residual coding (Jegou §IV) wins.
        (_clustered's single-dim +6 lift touches one subspace only, so
        residual is a no-op there — measured, not assumed.)"""
        import random

        rng = random.Random(seed)
        centers = [[rng.gauss(0.0, 4.0) for _ in range(dim)] for _ in range(4)]
        rows = []
        for i in range(n):
            c = centers[i % 4]
            rows.append((i, [x + rng.gauss(0.0, 0.3) for x in c]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_residual_coding_improves_adc_and_roundtrips(self, spark, tmp_path):
        """Jegou §IV residual coding on scattered cluster centers: at the
        same code budget, pure-ADC recall must beat raw-vector coding
        (the budget resolves in-cluster noise instead of re-encoding
        cluster position); the persisted index stores the residual flag
        and probes honor it automatically; residual + full-coverage
        re-rank is still the exact ranking."""
        from lmss_entity_extractor_spark.ops.pq import (
            knn_ivfpq,
            knn_ivfpq_indexed,
            write_ivfpq_index,
        )

        e = self._scattered(spark)
        q = e.filter(F.col("vec_id") < 4)
        exact = self._exact_l2_topk(e.collect(), range(4), 5)

        def adc_recall(res):
            got = {
                tuple(r)
                for r in knn_ivfpq(
                    e, q, k=5, n_centroids=4, nprobe=4, m=4, pq_k=16,
                    rerank=0, residual=res,
                ).collect()
            }
            hit = {(a, c) for a, _b, c in got} & {(a, c) for a, _b, c in exact}
            return len(hit) / len(exact)

        r_raw, r_res = adc_recall(False), adc_recall(True)
        assert r_res > r_raw, (r_raw, r_res)

        # the distortion contract behind the recall win (the number the
        # docs cite): residual reconstruction MSE must be at least 2x
        # below raw at the same code budget — numpy twins, no Spark
        import numpy as np

        from lmss_entity_extractor_spark.ops.pq import (
            assign_cells_np,
            train_pq_codebooks_local,
            train_pq_codebooks_residual_local,
        )
        from lmss_entity_extractor_spark.ops.similarity import train_ivf_centroids_local

        X = np.asarray(
            [r.embedding for r in e.orderBy("vec_id").collect()], dtype=np.float64
        )
        cents = train_ivf_centroids_local(X, 4)
        cells = assign_cells_np(X, cents)

        def mse(Xin, books):
            m, sub = len(books), Xin.shape[1] // len(books)
            err = 0.0
            for j, book in enumerate(books):
                C = np.asarray([c for _, c in book])
                S = Xin[:, j * sub : (j + 1) * sub]
                d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                err += d2.min(axis=1).sum()
            return err / len(Xin)

        raw_mse = mse(X, train_pq_codebooks_local(X, m=4, k=16))
        res_books, means = train_pq_codebooks_residual_local(X, cents, m=4, k=16)
        M = np.asarray([v for _, v in means])
        res_mse = mse(X - M[cells], res_books)
        assert res_mse < raw_mse / 2, (raw_mse, res_mse)

        # persisted residual index: flag read from metadata, probes equal
        # the inline residual composition
        idx = str(tmp_path / "ivfpq_res")
        write_ivfpq_index(e, idx, n_centroids=4, m=4, pq_k=16, residual=True)
        got = sorted(
            map(tuple, knn_ivfpq_indexed(spark, idx, q, k=5, nprobe=2, rerank=0).collect())
        )
        want = sorted(
            map(
                tuple,
                knn_ivfpq(
                    e, q, k=5, n_centroids=4, nprobe=2, m=4, pq_k=16,
                    rerank=0, residual=True,
                ).collect(),
            )
        )
        assert got == want and len(got) > 0

        # re-rank is coding-independent: full probe + full shortlist over
        # residual codes reproduces the exact ranking bit-for-bit
        full = {
            tuple(r)
            for r in knn_ivfpq(
                e, q, k=5, n_centroids=4, nprobe=4, m=4, pq_k=16,
                rerank=300, residual=True,
            ).collect()
        }
        assert full == exact

        # a residual index whose metadata lost its means must REFUSE to
        # probe (raw-query ADC over residual codes would silently
        # mis-rank every result)
        import json as _json
        from pathlib import Path as _Path

        import pytest as _pytest

        meta_path = _Path(idx) / "codebooks.json"
        meta = _json.loads(meta_path.read_text())
        del meta["means"]
        meta_path.write_text(_json.dumps(meta))
        with _pytest.raises(ValueError, match="residual-coded but carries no cell"):
            knn_ivfpq_indexed(spark, idx, q, k=5, nprobe=2, rerank=0)

    def test_numpy_encoder_matches_sql_encoder(self, spark):
        """The Arrow/numpy encoder (the large-k escalation path) assigns
        the same codes as the literal-SQL bit-contract form on the same
        codebooks — tie-free real-float geometry, so the two summation
        orders agree."""
        from lmss_entity_extractor_spark.ops.pq import encode_pq, train_pq_codebooks

        e = self._clustered(spark)
        books = train_pq_codebooks(e, m=4, k=16)
        sql_codes = {r.vec_id: list(r.codes) for r in encode_pq(e, books, encoder="sql").collect()}
        np_codes = {r.vec_id: list(r.codes) for r in encode_pq(e, books, encoder="numpy").collect()}
        assert sql_codes == np_codes
        # auto policy: small k -> the sql bit-contract path; large k -> numpy
        from lmss_entity_extractor_spark.ops import pq as pq_mod

        assert pq_mod._SQL_ENCODER_MAX_K == 16
        big_books = train_pq_codebooks(e, m=4, k=32)
        big = {r.vec_id: list(r.codes) for r in encode_pq(e, big_books).collect()}
        assert big == {
            r.vec_id: list(r.codes)
            for r in encode_pq(e, big_books, encoder="numpy").collect()
        }


class TestRepetition:
    def _docs(self, spark):
        rows = [
            # 19 chars; toks = a b a b c d a b; lines (blank/ws dropped):
            # [a b, a b, c d, a b]
            (1, "a b\na b\nc d\n\n  \na b"),
            # two 2-grams tie at count 2 ("z y", "a b") -> lexicographically
            # smallest must win
            (2, "z y z y a b a b"),
            # single token: no 2-grams at all
            (3, "solo"),
            # whitespace-only text: zero tokens, zero lines
            (4, "   "),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_computed_metrics(self, spark):
        from lmss_entity_extractor_spark.ops.repetition import repetition_stats

        out = {r.doc_id: r for r in repetition_stats(self._docs(spark)).collect()}
        r1 = out[1]
        assert (r1.n_tokens, r1.n_distinct_tokens) == (8, 4)
        assert r1.dup_token_frac == 0.5
        # 2-grams: a b, b a, a b, b c, c d, d a, a b -> "a b" x3; len("a b")=3
        assert (r1.top_gram, r1.top_gram_count) == ("a b", 3)
        assert r1.top_gram_char_frac == 3 * 3 / 19
        # all six 3-grams distinct
        assert r1.dup_gram_frac == 0.0
        # 4 non-blank lines, 2 distinct; "a b" x3 = 9 of 12 line chars
        assert r1.dup_line_frac == 0.5
        assert r1.dup_line_char_frac == 0.75

    def test_top_gram_tiebreak_is_lexicographic(self, spark):
        from lmss_entity_extractor_spark.ops.repetition import repetition_stats

        out = {r.doc_id: r for r in repetition_stats(self._docs(spark)).collect()}
        assert (out[2].top_gram, out[2].top_gram_count) == ("a b", 2)

    def test_degenerate_docs(self, spark):
        from lmss_entity_extractor_spark.ops.repetition import repetition_stats

        out = {r.doc_id: r for r in repetition_stats(self._docs(spark)).collect()}
        assert out[3].top_gram is None and out[3].top_gram_count == 0
        assert out[3].top_gram_char_frac == 0.0 and out[3].dup_gram_frac == 0.0
        assert out[4].n_tokens == 0 and out[4].dup_token_frac == 0.0
        assert out[4].dup_line_frac == 0.0 and out[4].dup_line_char_frac == 0.0

    def test_filter_drops_repetitive_keeps_clean(self, spark):
        from lmss_entity_extractor_spark.ops.repetition import repetition_filter

        rows = [
            (1, "spam spam spam spam spam spam", "en"),          # top-2-gram coverage ~1
            # clean: all grams count 1, top-2-gram coverage 10/62 ~ 0.16
            (2, "one two three four five six seven eight nine ten eleven twelve", "en"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        kept = repetition_filter(docs).collect()
        assert [r.doc_id for r in kept] == [2]
        # pass-through of original columns (it is a same-row filter)
        assert set(kept[0].asDict()) == {"doc_id", "text", "lang"}

    def test_stats_plan_has_no_shuffle(self, spark):
        """The whole operator must ride the scan: per-row folds only —
        zero Exchange nodes in the physical plan (the 100 TB claim)."""
        from lmss_entity_extractor_spark.ops.repetition import repetition_stats

        plan = repetition_stats(self._docs(spark))._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


class TestLineDedup:
    def _docs(self, spark):
        rows = [
            (1, "alpha beta\nboiler plate\ngamma"),
            (2, "boiler plate\ndelta"),
            (3, "epsilon\nboiler plate"),
            (4, "zeta eta\n\n   \ntheta"),      # blanks never count
            (5, "boiler plate"),                  # every line frequent -> ''
            (6, "   \n  "),                       # no non-blank lines at all
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_drop_all_removes_every_occurrence(self, spark):
        from lmss_entity_extractor_spark.ops.linededup import corpus_line_dedup

        out = {r.doc_id: r for r in corpus_line_dedup(self._docs(spark), min_count=3).collect()}
        assert len(out) == 6  # one row per input doc, always
        assert out[1].text == "alpha beta\ngamma"
        assert (out[1].n_lines_kept, out[1].n_lines_removed) == (2, 1)
        assert out[2].text == "delta"
        assert out[3].text == "epsilon"
        assert out[4].text == "zeta eta\ntheta"  # blank lines dropped, order kept
        assert (out[4].n_lines_kept, out[4].n_lines_removed) == (2, 0)
        assert out[5].text == "" and out[5].n_lines_removed == 1
        assert out[6].text == "" and (out[6].n_lines_kept, out[6].n_lines_removed) == (0, 0)

    def test_keep_first_keeps_global_first_occurrence(self, spark):
        from lmss_entity_extractor_spark.ops.linededup import corpus_line_dedup

        out = {
            r.doc_id: r
            for r in corpus_line_dedup(self._docs(spark), min_count=3, keep_first=True).collect()
        }
        # first occurrence = smallest (doc_id, pos) -> doc 1 keeps it
        assert out[1].text == "alpha beta\nboiler plate\ngamma"
        assert out[2].text == "delta" and out[2].n_lines_removed == 1
        assert out[5].text == "" and out[5].n_lines_removed == 1

    def test_below_threshold_lines_untouched(self, spark):
        from lmss_entity_extractor_spark.ops.linededup import corpus_line_dedup

        rows = [(1, "dup\nx"), (2, "dup\ny")]  # count 2 < min_count 3
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in corpus_line_dedup(docs, min_count=3).collect()}
        assert out[1].text == "dup\nx" and out[1].n_lines_removed == 0
        assert out[2].text == "dup\ny"

    def test_min_count_validation(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.ops.linededup import corpus_line_dedup

        with _pytest.raises(ValueError):
            corpus_line_dedup(self._docs(spark), min_count=1)

    def test_drop_all_plan_is_agg_join_not_window(self, spark):
        """Boilerplate mode must use the combinable groupBy+join shape —
        a Window over the full corpus would forfeit map-side combine."""
        from lmss_entity_extractor_spark.ops.linededup import corpus_line_dedup

        plan = (
            corpus_line_dedup(self._docs(spark), min_count=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan, plan

    def test_frequent_lines_audit(self, spark):
        from lmss_entity_extractor_spark.ops.linededup import frequent_lines

        rows = [(1, "b\nb\nu"), (2, "b\nv")]  # 'b': 3 occurrences in 2 docs
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = frequent_lines(docs, min_count=3).collect()
        assert len(out) == 1
        assert (out[0].line, out[0].n_occurrences, out[0].n_docs) == ("b", 3, 2)


class TestLMQuality:
    def _expected(self, per_doc_counts, vocab, alpha=0.5):
        """Hand/numpy twin: per_doc_counts = {doc: {tok: m}}, vocab = {tok: c}."""
        import math

        N, V = sum(vocab.values()), len(vocab)
        denom = math.log(N + alpha * (V + 1))
        out = {}
        for doc, toks in per_doc_counts.items():
            lp = 0.0
            for tok in sorted(toks):  # same fold order as the operator
                m = toks[tok]
                logp = (math.log(vocab[tok] + alpha) if tok in vocab else math.log(alpha)) - denom
                lp += float(m) * logp
            n = sum(toks.values())
            h = -lp / n if n else 0.0
            out[doc] = (n, sum(m for t, m in toks.items() if t not in vocab), h, math.exp(h) if n else 1.0)
        return out

    def test_self_scoring_matches_numpy_twin(self, spark):
        from lmss_entity_extractor_spark.ops.lmscore import lm_quality_score

        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "b c"), (3, "   ")], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in lm_quality_score(docs).collect()}
        want = self._expected(
            {1: {"a": 2, "b": 1}, 2: {"b": 1, "c": 1}, 3: {}},
            {"a": 2, "b": 2, "c": 1},
        )
        import math

        for d, (n, oov, h, ppl) in want.items():
            r = got[d]
            assert (r.n_tokens, r.n_oov) == (n, oov)
            # fold order is pinned so cross_entropy matches bit-for-bit;
            # perplexity goes through exp(), where JVM and libm may
            # differ in the last ulp
            assert math.isclose(r.cross_entropy, h, rel_tol=1e-12)
            assert math.isclose(r.perplexity, ppl, rel_tol=1e-12)
        assert got[3].perplexity == 1.0  # empty doc resurfaces with the identity score

    def test_oov_against_external_lm(self, spark):
        from lmss_entity_extractor_spark.ops.lmscore import lm_quality_score, train_unigram_lm

        ref = spark.createDataFrame([(10, "x x y")], "doc_id long, text string")
        lm = train_unigram_lm(ref)
        docs = spark.createDataFrame([(1, "x z z")], "doc_id long, text string")
        r = lm_quality_score(docs, lm=lm).collect()[0]
        assert (r.n_tokens, r.n_oov) == (3, 2)
        import math

        want = self._expected({1: {"x": 1, "z": 2}}, {"x": 2, "y": 1})
        assert math.isclose(r.cross_entropy, want[1][2], rel_tol=1e-12)

    def test_vocab_cap_is_deterministic_and_oovs_the_tail(self, spark):
        from lmss_entity_extractor_spark.ops.lmscore import lm_quality_score, train_unigram_lm

        docs = spark.createDataFrame([(1, "a a b b c")], "doc_id long, text string")
        lm = train_unigram_lm(docs, vocab_size=2)
        assert sorted((r.token, r.c) for r in lm.collect()) == [("a", 2), ("b", 2)]
        r = lm_quality_score(docs, lm=lm).collect()[0]
        assert r.n_oov == 1  # 'c' fell outside the cap
        import math

        want = self._expected({1: {"a": 2, "b": 2, "c": 1}}, {"a": 2, "b": 2})
        assert math.isclose(r.cross_entropy, want[1][2], rel_tol=1e-12)

    def test_filter_passthrough_and_threshold(self, spark):
        from lmss_entity_extractor_spark.ops.lmscore import lm_quality_filter, train_unigram_lm

        ref = spark.createDataFrame([(10, "a a a b")], "doc_id long, text string")
        lm = train_unigram_lm(ref)
        docs = spark.createDataFrame(
            [(1, "a a b", "en"), (2, "zz qq ww", "en")], "doc_id long, text string, lang string"
        )
        kept = lm_quality_filter(docs, max_perplexity=6.0, lm=lm).collect()
        assert [r.doc_id for r in kept] == [1]  # all-OOV doc 2 is high-ppl
        assert set(kept[0].asDict()) == {"doc_id", "text", "lang"}


class TestSemDeDup:
    """SemDeDup (L40, ops/semdedup.py): within-cell near-dup flagging
    with the keep-the-least-prototypical rule (centroid_sim ASC, id ASC
    keep order; the later member of every >= threshold pair drops)."""

    CENTS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]

    def _vecs(self, spark):
        from lmss_entity_extractor_spark.ops.semdedup import semdedup  # noqa: F401

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),   # cell 0, sim 1.0
            (2, [0.8, 0.6, 0.0, 0.0]),   # cell 0, sim 0.8; cos(1,2)=0.8
            (3, [0.0, 1.0, 0.0, 0.0]),   # cell 1, alone
            (4, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 1
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_hand_computed_keep_flags(self, spark):
        from lmss_entity_extractor_spark.ops.semdedup import semdedup

        out = {
            r.vec_id: r
            for r in semdedup(self._vecs(spark), centroids=self.CENTS, threshold=0.75).collect()
        }
        assert {i: out[i].cell for i in (1, 2, 3, 4)} == {1: 0, 2: 0, 3: 1, 4: 0}
        assert out[2].centroid_sim == pytest.approx(0.8)
        # keep order in cell 0 is 2 (0.8) -> 1 (1.0, id) -> 4; both 1 and
        # 4 pair with 2 at cos 0.8 >= 0.75, so only 2 survives cell 0
        assert {i: out[i].keep for i in (1, 2, 3, 4)} == {1: False, 2: True, 3: True, 4: False}

    def test_tie_drops_larger_id(self, spark):
        from lmss_entity_extractor_spark.ops.semdedup import semdedup

        out = {
            r.vec_id: r.keep
            for r in semdedup(self._vecs(spark), centroids=self.CENTS, threshold=0.9).collect()
        }
        # only the exact-dup pair (1,4) clears 0.9; equal sims tie-break
        # on id, so 4 (the larger) drops
        assert out == {1: True, 2: True, 3: True, 4: False}

    def test_trained_path_drops_exactly_the_injected_dups(self, spark, embeddings):
        from lmss_entity_extractor_spark.ops.semdedup import semdedup

        base = embeddings.select("vec_id", "embedding").limit(60)
        dups = base.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
        out = semdedup(base.unionByName(dups), threshold=0.9999, n_centroids=4)
        dropped = sorted(r.vec_id for r in out.filter(~F.col("keep")).collect())
        # identical vectors share a cell and tie on centroid_sim, so the
        # larger id of each injected pair drops -- and nothing else does
        assert dropped == [100000 + i for i in range(10)]

    def test_centroid_df_and_list_agree(self, spark):
        from lmss_entity_extractor_spark.ops.semdedup import semdedup

        cdf = spark.createDataFrame(self.CENTS, "cid long, cent array<double>")
        a = sorted(map(tuple, semdedup(self._vecs(spark), centroids=self.CENTS).collect()))
        b = sorted(map(tuple, semdedup(self._vecs(spark), centroids=cdf).collect()))
        assert a == b


class TestDSIR:
    """DSIR importance resampling (L41, ops/dsir.py): hashed uni+bigram
    bucket models, per-doc log importance weights, deterministic top-k."""

    @staticmethod
    def _np_logweight(text, target_texts, raw_texts, m=64, alpha=1.0):
        import hashlib
        from collections import Counter

        def buckets(t):
            toks = [w for w in t.strip().lower().split() if w]
            grams = list(toks)
            grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            return [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % m for g in grams]

        p = Counter(b for t in target_texts for b in buckets(t))
        q = Counter(b for t in raw_texts for b in buckets(t))
        pt, qt = float(sum(p.values())), float(sum(q.values()))
        cb = Counter(buckets(text))
        import math

        acc = 0.0
        for b in sorted(cb):
            lam = (math.log(p.get(b, 0) + alpha) - math.log(pt + alpha * m)) - (
                math.log(q.get(b, 0) + alpha) - math.log(qt + alpha * m)
            )
            acc += cb[b] * lam
        return acc

    def _corpora(self, spark):
        raw = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "le chat noir dort sur le tapis"),
                (3, "the dog barked at the mailman"),
                (4, "le chien noir dort sur le lit"),
                (5, ""),
            ],
            "doc_id long, text string",
        )
        target = spark.createDataFrame(
            [(100, "le chat et le chien dorment"), (101, "le tapis noir du chat")],
            "doc_id long, text string",
        )
        return raw, target

    def test_logweights_match_numpy_twin(self, spark):
        from lmss_entity_extractor_spark.ops.dsir import (
            dsir_logweights,
            train_hashed_ngram_counts,
        )

        raw, target = self._corpora(spark)
        out = {
            r.doc_id: r
            for r in dsir_logweights(
                raw,
                train_hashed_ngram_counts(target, m=64),
                train_hashed_ngram_counts(raw, m=64),
                m=64,
            ).collect()
        }
        raw_texts = [r.text for r in raw.orderBy("doc_id").collect()]
        tgt_texts = [r.text for r in target.orderBy("doc_id").collect()]
        for r in raw.collect():
            want = self._np_logweight(r.text, tgt_texts, raw_texts, m=64)
            # the op snaps to the 1e-9 grid (libm ln wobble) — grid the
            # twin identically before the exact-ish compare
            want = math.floor(want * 1e9 + 0.5) / 1e9
            assert out[r.doc_id].log_weight == pytest.approx(want, rel=1e-12, abs=1e-12)
        # empty doc: no grams, weight exactly 0
        assert out[5].n_grams == 0 and out[5].log_weight == 0.0

    def test_select_prefers_target_like_docs(self, spark):
        from lmss_entity_extractor_spark.ops.dsir import dsir_logweights, dsir_select, train_hashed_ngram_counts

        raw, target = self._corpora(spark)
        w = {
            r.doc_id: r.log_weight
            for r in dsir_logweights(
                raw,
                train_hashed_ngram_counts(target, m=64),
                train_hashed_ngram_counts(raw, m=64),
                m=64,
            ).collect()
        }
        # both French docs outrank both English docs (the paper's core
        # claim at toy scale); the zero-gram doc sits at exactly 0.0 —
        # between mildly-negative off-target docs and positive on-target
        # ones, the documented short-doc artifact
        assert min(w[2], w[4]) > max(w[1], w[3])
        # select over the non-degenerate corpus: the two French docs are
        # the top-2 (the empty doc's exact-0.0 weight would outrank the
        # self-penalized toy-scale weights, so it is excluded here; the
        # twin test above pins its 0.0)
        nonempty = raw.filter(F.length("text") > 0)
        top2 = dsir_select(nonempty, target, k=2, m=64).collect()
        assert sorted(r.doc_id for r in top2) == [2, 4]
        assert set(top2[0].asDict()) == {"doc_id", "text", "n_grams", "log_weight"}

    def test_duplicate_texts_tie_and_select_validates(self, spark):
        from lmss_entity_extractor_spark.ops.dsir import dsir_logweights, dsir_select, train_hashed_ngram_counts

        raw, target = self._corpora(spark)
        dup = raw.unionByName(
            spark.createDataFrame([(6, "le chat noir dort sur le tapis")], "doc_id long, text string")
        )
        w = {
            r.doc_id: r.log_weight
            for r in dsir_logweights(
                dup,
                train_hashed_ngram_counts(target, m=64),
                train_hashed_ngram_counts(dup, m=64),
                m=64,
            ).collect()
        }
        assert w[2] == w[6]  # identical text -> identical weight, bit-for-bit
        with pytest.raises(ValueError):
            dsir_select(raw, target, k=0)

    def test_scoring_plan_broadcasts_the_models(self, spark):
        from lmss_entity_extractor_spark.ops.dsir import dsir_logweights, train_hashed_ngram_counts

        raw, target = self._corpora(spark)
        plan = dsir_logweights(
            raw,
            train_hashed_ngram_counts(target, m=64),
            train_hashed_ngram_counts(raw, m=64),
            m=64,
        )._jdf.queryExecution().executedPlan().toString()
        # both <=m-row count tables must come in as broadcasts; the only
        # allowed sort-merge join is the final corpus-sized id reattach
        # (per_doc is already hash-partitioned on doc_id by its groupBy)
        assert plan.count("BroadcastHashJoin") >= 2
        assert plan.count("SortMergeJoin") <= 1


class TestExactSubstr:
    """Exact-substring dedup (L42, ops/substr.py): duplicated-window
    covering spans + removal."""

    def _docs(self, spark):
        shared = "one two three four five six seven eight"  # 8-token shared run
        return spark.createDataFrame(
            [
                (1, f"intro alpha {shared} outro beta", "en"),
                (2, f"prefix gamma delta {shared} suffix", "en"),
                (3, "totally unique words nothing here repeats at all", "en"),
            ],
            "doc_id long, text string, lang string",
        )

    def test_shared_run_spans_merge_windows(self, spark):
        from lmss_entity_extractor_spark.ops.substr import duplicated_substring_spans

        spans = {
            r.doc_id: (r.tok_start, r.tok_end, r.n_windows)
            for r in duplicated_substring_spans(self._docs(spark), min_len=4).collect()
        }
        # doc 1: shared run at tokens 2..10; 5 overlapping 4-windows merge
        assert spans[1] == (2, 10, 5)
        # doc 2: same run at tokens 3..11
        assert spans[2] == (3, 11, 5)
        assert 3 not in spans

    def test_self_repetition_counts(self, spark):
        from lmss_entity_extractor_spark.ops.substr import duplicated_substring_spans

        docs = spark.createDataFrame(
            [(1, "a b c d x y z a b c d")], "doc_id long, text string"
        )
        spans = sorted(
            (r.tok_start, r.tok_end)
            for r in duplicated_substring_spans(docs, min_len=4).collect()
        )
        assert spans == [(0, 4), (7, 11)]  # the repeated 'a b c d', both sites

    def test_min_count_threshold(self, spark):
        from lmss_entity_extractor_spark.ops.substr import duplicated_substring_spans

        out = duplicated_substring_spans(self._docs(spark), min_len=4, min_count=3)
        assert out.count() == 0  # the run only occurs twice

    def test_removal_cuts_runs_and_passes_columns(self, spark):
        from lmss_entity_extractor_spark.ops.substr import remove_duplicated_substrings

        out = {
            r.doc_id: r
            for r in remove_duplicated_substrings(self._docs(spark), min_len=4).collect()
        }
        assert out[1].text == "intro alpha outro beta"
        assert out[2].text == "prefix gamma delta suffix"
        assert out[3].text == self._docs(spark).collect()[2].text  # untouched
        assert out[1].lang == "en"
        # a doc that IS a duplicated run comes back empty, not dropped
        twin = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
        )
        cleaned = {r.doc_id: r.text for r in remove_duplicated_substrings(twin, min_len=5).collect()}
        assert cleaned == {1: "", 2: ""}

    def test_validation(self, spark):
        from lmss_entity_extractor_spark.ops.substr import duplicated_substring_spans

        with pytest.raises(ValueError):
            duplicated_substring_spans(self._docs(spark), min_len=0)
        with pytest.raises(ValueError):
            duplicated_substring_spans(self._docs(spark), min_count=1)


class TestLeakageSplit:
    """Leakage-safe split (L43, ops/split.py): near-dup clusters never
    straddle the train/val boundary."""

    def test_clusters_share_a_side_and_singletons_self_key(self, spark, dup_docs):
        from lmss_entity_extractor_spark.ops.dedup import minhash_lsh_pairs
        from lmss_entity_extractor_spark.ops.split import leakage_safe_split

        pairs = minhash_lsh_pairs(dup_docs, n=3, num_hashes=8, bands=4)
        out = leakage_safe_split(dup_docs, pairs, val_per_mille=500).collect()
        rows = {r.doc_id: r for r in out}
        assert len(rows) == dup_docs.count()
        pair_rows = pairs.collect()
        assert pair_rows  # fixture must actually produce near-dup pairs
        for p in pair_rows:
            assert rows[p.doc_a].split_key == rows[p.doc_b].split_key
            assert rows[p.doc_a].split == rows[p.doc_b].split
        clustered = {p.doc_a for p in pair_rows} | {p.doc_b for p in pair_rows}
        for d, r in rows.items():
            if d not in clustered:
                assert r.split_key == d
            assert r.split in ("val", "train")

    def test_append_stability(self, spark, dup_docs):
        from lmss_entity_extractor_spark.ops.dedup import minhash_lsh_pairs
        from lmss_entity_extractor_spark.ops.split import leakage_safe_split

        pairs = minhash_lsh_pairs(dup_docs, n=3, num_hashes=8, bands=4)
        before = {
            r.doc_id: r.split
            for r in leakage_safe_split(dup_docs, pairs, val_per_mille=300).collect()
        }
        extra = spark.createDataFrame(
            [(999, "an entirely new never seen document body")],
            "doc_id long, text string",
        )
        bigger = dup_docs.select("doc_id", "text").unionByName(extra)
        after = {
            r.doc_id: r.split
            for r in leakage_safe_split(bigger, pairs, val_per_mille=300).collect()
        }
        # appending an unclustered doc flips no existing assignment
        assert all(after[d] == s for d, s in before.items())

    def test_validation(self, spark, dup_docs):
        from lmss_entity_extractor_spark.ops.dedup import minhash_lsh_pairs
        from lmss_entity_extractor_spark.ops.split import leakage_safe_split

        pairs = minhash_lsh_pairs(dup_docs)
        with pytest.raises(ValueError):
            leakage_safe_split(dup_docs, pairs, val_per_mille=1001)


class TestTriangles:
    def test_hand_computed_k4_plus_pendant(self, spark):
        """K4 on {0,1,2,3} (4 triangles, clustering 1.0 inside) plus a
        pendant node 5 hanging off 0 (deg(0) -> 4, clustering 0.5)."""
        from lmss_entity_extractor_spark.graph.triangles import (
            triangle_counts,
            triangles,
        )

        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        df = spark.createDataFrame(k4 + [(0, 5)], "src long, dst long")
        tris = {(r.a, r.b, r.c) for r in triangles(df).collect()}
        assert tris == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}
        got = {r.node: (r.deg, r.n_triangles, r.clustering) for r in triangle_counts(df).collect()}
        assert got == {
            0: (4, 3, 0.5),
            1: (3, 3, 1.0),
            2: (3, 3, 1.0),
            3: (3, 3, 1.0),
            5: (1, 0, 0.0),
        }

    def test_direction_duplicate_selfloop_invariance(self, spark):
        """Triangles of the induced SIMPLE undirected graph: reversed
        duplicates and self-loops change nothing."""
        from lmss_entity_extractor_spark.graph.triangles import triangle_counts

        clean = spark.createDataFrame(
            [(0, 1), (1, 2), (0, 2)], "src long, dst long"
        )
        noisy = spark.createDataFrame(
            [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (2, 2)],
            "src long, dst long",
        )
        want = sorted(map(tuple, triangle_counts(clean).collect()))
        got = sorted(map(tuple, triangle_counts(noisy).collect()))
        assert got == want == [(0, 2, 1, 1.0), (1, 2, 1, 1.0), (2, 2, 1, 1.0)]

    def test_triangle_free_cycle(self, spark):
        from lmss_entity_extractor_spark.graph.triangles import triangle_counts, triangles

        cyc = spark.createDataFrame(
            [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
        )
        assert triangles(cyc).count() == 0
        got = {r.node: (r.deg, r.n_triangles, r.clustering) for r in triangle_counts(cyc).collect()}
        assert got == {i: (2, 0, 0.0) for i in range(5)}

    def test_matches_bruteforce_on_random_graph(self, spark):
        """Degree-oriented enumeration agrees with itertools brute force
        on a seeded random graph (skewed: node 0 is a hub)."""
        import itertools
        import random

        from lmss_entity_extractor_spark.graph.triangles import triangle_counts

        rng = random.Random(7)
        nodes = list(range(24))
        # hub: the "last reducer" shape the orientation exists for
        edges = {(0, n) for n in nodes[1:18]}
        for _ in range(80):
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
        adj = {n: set() for n in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want_tri = {
            frozenset(t)
            for t in itertools.combinations(nodes, 3)
            if t[1] in adj[t[0]] and t[2] in adj[t[0]] and t[2] in adj[t[1]]
        }
        per_node = {n: sum(1 for t in want_tri if n in t) for n in nodes}
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
        want = {n: c for n, c in per_node.items() if adj[n]}
        assert got == want


class TestShortestHops:
    def test_directed_chain_and_bound(self, spark):
        from lmss_entity_extractor_spark.graph.paths import shortest_hops

        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "src long, dst long"
        )
        got = {r.node: r.hops for r in shortest_hops(e, [0], max_hops=3).collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}
        # the hop budget truncates the wave; direction is respected
        assert {r.node: r.hops for r in shortest_hops(e, [0], max_hops=2).collect()} == {
            0: 0, 1: 1, 2: 2
        }
        assert {r.node: r.hops for r in shortest_hops(e, [3], max_hops=3).collect()} == {3: 0}

    def test_undirected_cycle_min_of_both_ways(self, spark):
        from lmss_entity_extractor_spark.graph.paths import shortest_hops

        e = spark.createDataFrame(
            [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
        )
        got = {
            r.node: r.hops
            for r in shortest_hops(e, [0], max_hops=5, directed=False).collect()
        }
        assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1}

    def test_multi_source_and_isolated_source(self, spark):
        from lmss_entity_extractor_spark.graph.paths import shortest_hops

        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
        # node 99 touches no edge but is contractually present at hops 0
        got = {r.node: r.hops for r in shortest_hops(e, [0, 3, 99], max_hops=9).collect()}
        assert got == {0: 0, 3: 0, 99: 0, 1: 1, 4: 1, 2: 2}

    def test_matches_bruteforce_bfs_on_random_digraph(self, spark):
        import random
        from collections import deque

        from lmss_entity_extractor_spark.graph.paths import shortest_hops

        rng = random.Random(11)
        edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
        edges = {(a, b) for a, b in edges if a != b}
        adj = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
        dist = {5: 0}
        q = deque([5])
        while q:
            u = q.popleft()
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        want = {n: d for n, d in dist.items() if d <= 4}
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {r.node: r.hops for r in shortest_hops(df, [5], max_hops=4).collect()}
        assert got == want

    def test_validation(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.graph.paths import shortest_hops

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        with _pytest.raises(ValueError):
            shortest_hops(e, [0], max_hops=-1)
        with _pytest.raises(ValueError):
            shortest_hops(e, e, max_hops=1)


class TestLinkPrediction:
    def test_hand_computed_square(self, spark):
        """4-cycle 0-1-2-3-0: the two diagonals are the only predicted
        links, each with both opposite corners as common neighbors."""
        from lmss_entity_extractor_spark.graph.linkpred import link_prediction_scores

        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
        )
        got = {(r.a, r.b): (r.common, r.deg_a, r.deg_b, r.jaccard)
               for r in link_prediction_scores(e).collect()}
        assert got == {(0, 2): (2, 2, 2, 1.0), (1, 3): (2, 2, 2, 1.0)}

    def test_include_existing_triangle(self, spark):
        """In a triangle every pair is adjacent: the prediction set is
        empty, the similarity view scores each edge 1/(2+2-1)."""
        from lmss_entity_extractor_spark.graph.linkpred import link_prediction_scores

        e = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
        assert link_prediction_scores(e).count() == 0
        got = {(r.a, r.b): (r.common, r.jaccard)
               for r in link_prediction_scores(e, include_existing=True).collect()}
        assert got == {(0, 1): (1, 1 / 3), (0, 2): (1, 1 / 3), (1, 2): (1, 1 / 3)}

    def test_hub_cap_drops_wedges_through_hubs(self, spark):
        """A degree-5 star center excluded by max_degree stops producing
        wedges; pairs seen only through it disappear, others survive."""
        from lmss_entity_extractor_spark.graph.linkpred import link_prediction_scores

        star = [(0, n) for n in range(1, 6)] + [(1, 2)]
        e = spark.createDataFrame(star, "src long, dst long")
        exact = {(r.a, r.b) for r in link_prediction_scores(e).collect()}
        assert (3, 4) in exact and (1, 3) in exact
        # with hub 0 dropped the only wedges run through nodes 1 and 2,
        # and those close existing edges — the prediction set empties
        capped = {(r.a, r.b)
                  for r in link_prediction_scores(e, max_degree=3).collect()}
        assert capped == set()
        got = {(r.a, r.b): r.common
               for r in link_prediction_scores(e, max_degree=3, include_existing=True).collect()}
        assert got == {(0, 2): 1, (0, 1): 1}

    def test_matches_bruteforce_on_random_graph(self, spark):
        import itertools
        import random

        from lmss_entity_extractor_spark.graph.linkpred import link_prediction_scores

        rng = random.Random(13)
        nodes = list(range(20))
        edges = set()
        for _ in range(60):
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
        adj = {n: set() for n in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        for a, b in itertools.combinations(nodes, 2):
            cn = len(adj[a] & adj[b])
            if cn >= 1 and (a, b) not in edges:
                want[(a, b)] = (cn, len(adj[a]), len(adj[b]),
                                cn / (len(adj[a]) + len(adj[b]) - cn))
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {(r.a, r.b): (r.common, r.deg_a, r.deg_b, r.jaccard)
               for r in link_prediction_scores(df).collect()}
        assert got == want

    def test_validation(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.graph.linkpred import link_prediction_scores

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        with _pytest.raises(ValueError):
            link_prediction_scores(e, min_common=0)


class TestWinnow:
    @staticmethod
    def _h(gram):
        import hashlib

        return int(hashlib.md5(gram.encode()).hexdigest()[:12], 16)

    def test_hand_computed_fingerprints(self, spark):
        """k=2, window=2 over 'a b c d e f': five 2-gram hashes, four
        windows, fingerprints = distinct window minima with the first
        selecting window — recomputed in pure Python."""
        from lmss_entity_extractor_spark.ops.winnow import winnow_fingerprints

        text = "a b c d e f"
        toks = text.split()
        hs = [self._h(" ".join(toks[i:i + 2])) for i in range(5)]
        want = {}
        for s in range(4):
            m = min(hs[s:s + 2])
            if m not in want:
                want[m] = s
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = {r.fingerprint: r.first_window
               for r in winnow_fingerprints(docs, k=2, window=2).collect()}
        assert got == want

    def test_short_and_empty_docs(self, spark):
        """< k tokens -> no rows; 1..window-1 grams -> exactly the
        global-min fingerprint at window 0."""
        from lmss_entity_extractor_spark.ops.winnow import winnow_fingerprints

        docs = spark.createDataFrame(
            [(1, ""), (2, "only four little words"), (3, "a b c d e f g")],
            "doc_id long, text string",
        )
        rows = winnow_fingerprints(docs, k=5, window=4).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append((r.fingerprint, r.first_window))
        assert 1 not in by_doc and 2 not in by_doc  # 0 and 0 grams
        # doc 3: three 5-grams, one truncated window -> min of all three
        toks = "a b c d e f g".split()
        hs = [self._h(" ".join(toks[i:i + 5])) for i in range(3)]
        assert by_doc[3] == [(min(hs), 0)]

    def test_shared_run_guarantee_and_overlap_pairs(self, spark):
        """Winnowing guarantee: a shared run of >= window + k - 1 tokens
        forces >= 1 shared fingerprint; overlap pairs surface it."""
        from lmss_entity_extractor_spark.ops.winnow import (
            fingerprint_overlap_pairs,
            winnow_fingerprints,
        )

        shared = "the quick brown fox jumps over the lazy dog tonight"
        docs = spark.createDataFrame(
            [
                (1, "alpha beta " + shared + " gamma delta"),
                (2, "omega " + shared + " psi chi phi"),
                (3, "completely different words about unrelated things here now"),
            ],
            "doc_id long, text string",
        )
        fp = winnow_fingerprints(docs, k=3, window=4)
        pairs = {(r.doc_a, r.doc_b): r.n_shared
                 for r in fingerprint_overlap_pairs(fp).collect()}
        assert (1, 2) in pairs and pairs[(1, 2)] >= 1
        assert all(p == (1, 2) for p in pairs)

    def test_fingerprints_plan_has_no_shuffle(self, spark):
        """Selection is per-row folds riding the scan: zero Exchange
        nodes (the 100 TB claim; the pair join is the only shuffle)."""
        from lmss_entity_extractor_spark.ops.winnow import winnow_fingerprints

        docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
        plan = winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

    def test_validation(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.ops.winnow import (
            fingerprint_overlap_pairs,
            winnow_fingerprints,
        )

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            winnow_fingerprints(docs, k=0)
        with _pytest.raises(ValueError):
            fingerprint_overlap_pairs(winnow_fingerprints(docs), min_shared=0)


class TestRandomWalks:
    @staticmethod
    def _pick(cur, step, walk, seed, deg):
        import hashlib

        key = f"{cur}:{step}:{walk}:{seed}"
        return int(hashlib.md5(key.encode()).hexdigest()[:12], 16) % deg

    def test_matches_python_twin(self, spark):
        """Walks equal a pure-Python replay of the identical hash
        recurrence on a seeded digraph (with a dangling sink)."""
        import random

        from lmss_entity_extractor_spark.graph.walks import random_walks

        rng = random.Random(5)
        edges = sorted({(rng.randrange(10), rng.randrange(10)) for _ in range(25)})
        edges = [(a, b) for a, b in edges if a != b and a != 9]  # 9 dangles
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {(r.start_node, r.walk, r.step): r.node
               for r in random_walks(df, walk_len=4, walks_per_node=2, seed=7).collect()}

        adj = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
        for a in adj:
            adj[a].sort()
        nodes = {n for e in edges for n in e}
        want = {}
        for start in nodes:
            for w in range(2):
                cur = start
                want[(start, w, 0)] = cur
                for step in range(1, 5):
                    if cur not in adj:
                        break
                    cur = adj[cur][self._pick(cur, step, w, 7, len(adj[cur]))]
                    want[(start, w, step)] = cur
        assert got == want

    def test_deterministic_and_seed_sensitive(self, spark):
        from lmss_entity_extractor_spark.graph.walks import random_walks

        e = spark.createDataFrame(
            [(a, b) for a in range(5) for b in range(5) if a != b],
            "src long, dst long",
        )
        r1 = sorted(map(tuple, random_walks(e, walk_len=3, seed=1).collect()))
        r2 = sorted(map(tuple, random_walks(e, walk_len=3, seed=1).collect()))
        r3 = sorted(map(tuple, random_walks(e, walk_len=3, seed=2).collect()))
        assert r1 == r2
        assert r1 != r3  # K5 has real choices, a different seed must diverge

    def test_dangling_and_validation(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.graph.walks import random_walks

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        got = {(r.start_node, r.step): r.node for r in random_walks(e, walk_len=3).collect()}
        # 0 -> 1 then stop (1 dangles); 1 contributes only its step-0 row
        assert got == {(0, 0): 0, (0, 1): 1, (1, 0): 1}
        with _pytest.raises(ValueError):
            random_walks(e, walk_len=-1)
        with _pytest.raises(ValueError):
            random_walks(e, walks_per_node=0)


class TestCooccurrence:
    def test_hand_computed_pmi(self, spark):
        """3 groups: {x,y}, {x,y}, {x,z}.  n(x)=3, n(y)=2, n(z)=1,
        co(x,y)=2, co(x,z)=1 — PMI/NPMI recomputed in pure Python with
        the identical expression tree."""
        import math

        from lmss_entity_extractor_spark.graph.cooccur import cooccurrence_edges

        rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")]
        obs = spark.createDataFrame(rows, "g long, item string")
        got = {(r.item_a, r.item_b): r for r in cooccurrence_edges(obs, "g", "item").collect()}

        def tree(n_co, n, n_a, n_b):
            return (math.log(n_co) + math.log(n)) - math.log(n_a) - math.log(n_b)

        assert set(got) == {("x", "y"), ("x", "z")}
        xy = got[("x", "y")]
        assert (xy.n_co, xy.n_a, xy.n_b) == (2, 3, 2)
        # JVM Math.log and libm may disagree by 1 ulp per term (measured
        # here: pmi +-1.1e-16 around the true 0) — tolerance, not ==
        assert abs(xy.pmi - tree(2, 3.0, 3, 2)) < 1e-12
        assert abs(xy.npmi - tree(2, 3.0, 3, 2) / (math.log(3.0) - math.log(2.0))) < 1e-12
        xz = got[("x", "z")]
        assert (xz.n_co, xz.n_a, xz.n_b) == (1, 3, 1)
        assert xz.pmi == 0.0  # (ln1 + ln3) - ln3 - ln1 is exact in any libm

    def test_perfect_cooccurrence_npmi_is_one(self, spark):
        from lmss_entity_extractor_spark.graph.cooccur import cooccurrence_edges

        rows = [(g, i) for g in (1, 2) for i in ("a", "b")]
        obs = spark.createDataFrame(rows, "g long, item string")
        r = cooccurrence_edges(obs, "g", "item").collect()[0]
        assert r.n_co == 2 and r.npmi == 1.0

    def test_set_semantics_min_count_and_group_cap(self, spark):
        from lmss_entity_extractor_spark.graph.cooccur import cooccurrence_edges

        rows = [(1, "x"), (1, "x"), (1, "y"),          # dup membership collapses
                (2, "x"), (2, "y"),
                (3, "p"), (3, "q"), (3, "r")]           # size-3 group
        obs = spark.createDataFrame(rows, "g long, item string")
        got = {(r.item_a, r.item_b): r.n_co
               for r in cooccurrence_edges(obs, "g", "item", min_count=2).collect()}
        assert got == {("x", "y"): 2}
        capped = {(r.item_a, r.item_b)
                  for r in cooccurrence_edges(obs, "g", "item", max_group_size=2).collect()}
        # the size-3 group's pairs are dropped; x-y survives
        assert capped == {("x", "y")}
        # but item counts stay GLOBAL: n_a for x is still 2
        rows2 = cooccurrence_edges(obs, "g", "item", max_group_size=2).collect()
        assert {r.n_a for r in rows2} == {2}

    def test_validation(self, spark):
        import pytest as _pytest

        from lmss_entity_extractor_spark.graph.cooccur import cooccurrence_edges

        obs = spark.createDataFrame([(1, "x")], "g long, item string")
        with _pytest.raises(ValueError):
            cooccurrence_edges(obs, "g", "item", min_count=0)
        with _pytest.raises(ValueError):
            cooccurrence_edges(obs.filter("g < 0"), "g", "item")


class TestDotSqlEquivalence:
    def test_case_null_matches_fold_on_every_length_class(self, spark):
        """r6: _dot_sql's else branch is a NULL literal — exactly the
        fold's value for ANY length mismatch (zip_with null-pads, the
        null product poisons the left fold), while matching lengths take
        the unrolled sum with identical left-associated IEEE additions.
        Pinned over matching/short/long/empty/null arrays, null
        elements, signed zeros, NaN and Inf."""
        import math

        from pyspark.sql import functions as F

        from lmss_entity_extractor_spark.ops.similarity import _dlit, _dot_sql, _qcol

        cvec = [0.5, -1.25, 3.0]

        def fold_sql(vec, cv):
            arr = ", ".join(_dlit(x) for x in cv)
            return (
                f"aggregate(zip_with({_qcol(vec)}, array({arr}), "
                "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "0D, (acc, v) -> acc + v)"
            )

        rows = [
            ([1.0, 2.0, 3.0],),
            ([1.0, 2.0],),
            ([1.0, 2.0, 3.0, 4.0],),
            ([],),
            (None,),
            ([None, 2.0, 3.0],),
            ([0.0, -0.0, 5.5],),
            ([float("nan"), 1.0, 2.0],),
            ([float("inf"), 1.0, 2.0],),
        ]
        df = spark.createDataFrame(rows, "v array<double>")
        got = df.select(
            F.expr(fold_sql("v", cvec)).alias("fold"),
            F.expr(_dot_sql("v", cvec)).alias("case_null"),
        ).collect()
        for r in got:
            a, b = r["fold"], r["case_null"]
            if a is None or b is None:
                assert a is None and b is None
            elif math.isnan(a) or math.isnan(b):
                assert math.isnan(a) and math.isnan(b)
            else:
                assert a == b
