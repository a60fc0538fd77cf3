"""Weighted critical path (L411) and Burrows' Delta (L412)."""

import pytest

from lmss_entity_extractor_spark.graph.toposort import critical_path
from lmss_entity_extractor_spark.ops.textstats import burrows_delta


class TestCriticalPath:
    def _run(self, spark, edges):
        df = spark.createDataFrame(
            edges, "src string, dst string, weight double"
        )
        return {r["node"]: r for r in critical_path(df).collect()}

    def test_diamond(self, spark):
        out = self._run(
            spark,
            [("a", "b", 3.0), ("a", "c", 1.0), ("b", "d", 2.0),
             ("c", "d", 10.0)],
        )
        assert float(out["d"]["es"]) == 11.0
        assert float(out["b"]["es"]) == 3.0
        assert float(out["a"]["es"]) == 0.0
        assert float(out["a"]["critical_len"]) == 11.0

    def test_chain_sums_durations(self, spark):
        out = self._run(
            spark, [("a", "b", 1.5), ("b", "c", 2.25), ("c", "d", 3.0)]
        )
        assert float(out["d"]["es"]) == pytest.approx(6.75)

    def test_parallel_edge_max_wins(self, spark):
        out = self._run(spark, [("a", "b", 1.0), ("a", "b", 5.0)])
        assert float(out["b"]["es"]) == 5.0

    def test_cycle_raises(self, spark):
        df = spark.createDataFrame(
            [("a", "b", 1.0), ("b", "a", 1.0)],
            "src string, dst string, weight double",
        )
        with pytest.raises(RuntimeError, match="cycle"):
            critical_path(df, max_rounds=6)

    def test_negative_refused(self, spark):
        df = spark.createDataFrame(
            [("a", "b", -1.0)], "src string, dst string, weight double"
        )
        with pytest.raises(ValueError, match="negative"):
            critical_path(df)


class TestBurrowsDelta:
    def _run(self, spark, docs, **kw):
        df = spark.createDataFrame(
            [("g", d, t) for d, t in docs], "grp string, doc string, text string"
        )
        return {
            r["doc"]: r
            for r in burrows_delta(df, ["grp"], "doc", "text", **kw).collect()
        }

    DOCS = [
        ("d1", "the cat sat on the mat the end"),
        ("d2", "the dog sat on the rug the end"),
        ("d3", "zzz qqq xxx yyy www vvv uuu ttt"),
    ]

    def test_outlier_scores_highest(self, spark):
        out = self._run(spark, self.DOCS, top_k=5)
        assert out["d3"]["delta"] > out["d1"]["delta"]
        assert out["d3"]["delta"] > out["d2"]["delta"]

    def test_python_reference(self, spark):
        import math

        docs = {d: t.split() for d, t in self.DOCS}
        k = 5
        tot = {}
        for t in docs.values():
            for w in t:
                tot[w] = tot.get(w, 0) + 1
        topk = sorted(tot, key=lambda w: (-tot[w], w))[:k]
        q = lambda x: math.floor(x * 1e9 + 0.5)  # noqa: E731
        f = {
            (d, w): q(t.count(w) / len(t)) for d, t in docs.items()
            for w in topk
        }
        ref = {}
        for d in docs:
            tot_z, eff = 0, 0
            for w in topk:
                vals = [f[(dd, w)] for dd in docs]
                n = len(vals)
                mu = sum(vals) / n / 1e9
                var = (n * sum(v * v for v in vals) - sum(vals) ** 2) / (n * n) / 1e18
                sd = math.sqrt(var)
                if sd > 0:
                    tot_z += q(abs((f[(d, w)] / 1e9 - mu) / sd))
                    eff += 1
            ref[d] = tot_z / 1e9 / eff
        out = self._run(spark, self.DOCS, top_k=5)
        for d in docs:
            assert out[d]["delta"] == pytest.approx(ref[d], abs=1e-9)

    def test_identical_docs_zero_variance(self, spark):
        out = self._run(
            spark, [("a", "x y z"), ("b", "x y z")], top_k=3
        )
        # every word has zero variance -> k_eff 0 -> NULL delta
        assert out["a"]["k_eff"] == 0
        assert out["a"]["delta"] is None

    def test_case_folding(self, spark):
        out = self._run(
            spark, [("a", "The THE the"), ("b", "the x y")], top_k=1
        )
        assert out["a"]["n_tokens"] == 3

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", "d", None)], "grp string, doc string, text string"
        )
        with pytest.raises(ValueError, match="NULL"):
            burrows_delta(df, ["grp"], "doc", "text")

    def test_bad_k_refused(self, spark):
        with pytest.raises(ValueError, match="top_k"):
            self._run(spark, self.DOCS, top_k=0)
