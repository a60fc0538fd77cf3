"""Negative sampling (graph/negsample.py, L58): determinism, both
filter rules, side selection, and a python twin of the hash pick."""

import hashlib

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.negsample import negative_samples


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _rows(df):
    cols = ["s", "p", "o", "neg_idx", "corrupted"]
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _py_pick(s, p, o, i, side, seed, pool_sorted):
    h = int(hashlib.md5(f"{s}:{p}:{o}:{i}:{side}:{seed}".encode()).hexdigest()[:12], 16)
    return pool_sorted[h % len(pool_sorted)]


@pytest.fixture(scope="module")
def graph(spark):
    return _triples(
        spark,
        [
            ("a", "likes", "b"),
            ("b", "likes", "c"),
            ("c", "knows", "a"),
        ],
    )


def _pool(rows):
    ents = sorted(
        {r[0] for r in rows} | {r[2] for r in rows},
        key=lambda e: (hashlib.md5(e.encode()).hexdigest(), e),
    )
    return ents


class TestNegativeSamples:
    def test_matches_python_twin(self, spark, graph):
        rows = [("a", "likes", "b"), ("b", "likes", "c"), ("c", "knows", "a")]
        pool = _pool(rows)
        expect = set()
        for s, p, o in rows:
            for i in range(2):
                repl = _py_pick(s, p, o, i, "object", 7, pool)
                if repl == o:
                    continue
                if (s, p, repl) in set(rows):
                    continue
                expect.add((s, p, repl, i, "object"))
        got = _rows(negative_samples(graph, k=2, seed=7))
        assert got == expect

    def test_deterministic_across_runs(self, spark, graph):
        a = _rows(negative_samples(graph, k=3, seed=1))
        b = _rows(negative_samples(graph, k=3, seed=1))
        assert a == b and a

    def test_seed_sensitivity(self, spark, graph):
        union = _rows(negative_samples(graph, k=3, seed=1)) | _rows(
            negative_samples(graph, k=3, seed=2)
        )
        assert len(union) > len(_rows(negative_samples(graph, k=3, seed=1)))

    def test_never_regenerates_positives_when_filtered(self, spark, graph):
        pos = {(r["s"], r["p"], r["o"]) for r in graph.collect()}
        got = _rows(negative_samples(graph, k=5, corrupt="both"))
        assert got
        assert all((s, p, o) not in pos for s, p, o, _, _ in got)

    def test_raw_mode_may_keep_positives(self, spark, graph):
        filtered = _rows(negative_samples(graph, k=5, corrupt="both"))
        raw = _rows(negative_samples(graph, k=5, corrupt="both", filtered=False))
        assert filtered <= raw and len(raw) >= len(filtered)

    def test_sides(self, spark, graph):
        subj = _rows(negative_samples(graph, k=2, corrupt="subject"))
        assert subj and all(c == "subject" for *_, c in subj)
        both = _rows(negative_samples(graph, k=2, corrupt="both"))
        assert {c for *_, c in both} <= {"subject", "object"}

    def test_original_entity_never_sampled(self, spark):
        # pool of exactly 2: a corruption can only be "the other one",
        # so no output row keeps its original object
        g = _triples(spark, [("a", "p", "b"), ("b", "p", "a")])
        got = _rows(negative_samples(g, k=4, filtered=False))
        assert all(
            (o != "b") if s == "a" else (o != "a") for s, p, o, _, _ in got
        )

    def test_validation(self, spark, graph):
        with pytest.raises(ValueError, match="k must be"):
            negative_samples(graph, k=0)
        with pytest.raises(ValueError, match="corrupt must be"):
            negative_samples(graph, corrupt="predicate")
        with pytest.raises(ValueError, match="at least 2"):
            negative_samples(_triples(spark, [("a", "p", "a")]))

    def test_rank_parallelism_independent(self, spark, graph):
        """r6: the entity-pool dense rank is built with the dictenc
        range-exchange pattern (no single-partition global window);
        negatives must be byte-identical at any shuffle width because
        the global (md5, ent) order is slice order x in-slice order."""
        key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(key)
        try:
            spark.conf.set(key, "3")
            a = sorted(_rows(negative_samples(graph, k=3, corrupt="both", seed=7)))
            spark.conf.set(key, "17")
            b = sorted(_rows(negative_samples(graph, k=3, corrupt="both", seed=7)))
        finally:
            spark.conf.set(key, prev)
        assert a == b and a
