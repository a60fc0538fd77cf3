"""IV / Wald estimator (L405) and attribute assortativity (L406)."""

import pytest

from lmss_entity_extractor_spark.graph.metrics import (
    attribute_assortativity,
)
from lmss_entity_extractor_spark.ops.regression import iv_wald


class TestIvWald:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [("g", *r) for r in rows], "grp string, y double, x double, z double"
        )

    def test_recovers_structural_slope(self, spark):
        # x = 3z + u, y = 2x + v where u,v correlate (endogeneity);
        # z orthogonal to both by construction over the full cycles
        rows = []
        for i in range(60):
            z = float(i % 5)
            u = float((i % 4) - 1.5)
            x = 3 * z + u
            y = 2 * x + 5 * u       # OLS of y on x would be biased up
            rows.append((y, x, z))
        r = iv_wald(self._df(spark, rows), ["grp"], "y", "x", "z").collect()[0]
        assert r["beta_iv"] == pytest.approx(2.0, abs=1e-9)
        assert r["first_stage_slope"] == pytest.approx(3.0, abs=1e-9)
        assert r["first_stage_f"] > 100

    def test_python_reference(self, spark):
        rows = [(3.0, 1.0, 2.0), (5.0, 2.0, 3.0), (9.0, 4.0, 5.0), (6.0, 3.0, 3.0)]
        n = len(rows)
        sy = sum(r[0] for r in rows); sx = sum(r[1] for r in rows)
        sz = sum(r[2] for r in rows)
        szy = sum(r[2] * r[0] for r in rows)
        szx = sum(r[2] * r[1] for r in rows)
        beta = (n * szy - sz * sy) / (n * szx - sz * sx)
        r = iv_wald(self._df(spark, rows), ["grp"], "y", "x", "z").collect()[0]
        assert r["beta_iv"] == pytest.approx(beta, rel=1e-12)
        assert r["alpha_iv"] == pytest.approx((sy - beta * sx) / n, rel=1e-9)

    def test_irrelevant_instrument_null(self, spark):
        # z constant within... z varies but Cov(z,x) = 0 by symmetry
        rows = [(1.0, 1.0, 0.0), (2.0, 2.0, 1.0), (3.0, 1.0, 2.0)]
        r = iv_wald(self._df(spark, rows), ["grp"], "y", "x", "z").collect()[0]
        assert r["beta_iv"] is None and r["alpha_iv"] is None

    def test_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0, 1.0, 1.0), ("g", None, 2.0, 2.0), ("g", 3.0, 3.0, 3.0)],
            "grp string, y double, x double, z double",
        )
        assert iv_wald(df, ["grp"], "y", "x", "z").collect()[0]["n"] == 2


class TestAttributeAssortativity:
    def _run(self, spark, edges, attrs):
        e = spark.createDataFrame(edges, "src string, dst string")
        nds = spark.createDataFrame(
            list(attrs.items()), "node string, attr string"
        )
        return attribute_assortativity(e, nds).collect()[0]

    def test_two_cliques_hand_value(self, spark):
        edges = [
            ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
            ("b1", "b2"), ("b2", "b3"), ("b1", "b3"), ("a1", "b1"),
        ]
        attrs = {n: n[0] for n in "a1 a2 a3 b1 b2 b3".split()}
        r = self._run(spark, edges, attrs)
        # M=14, tr=12, margins 7/7 -> r = (14*12-98)/(196-98)
        assert r["r"] == pytest.approx(70 / 98)
        assert r["m"] == 7 and r["n_classes"] == 2

    def test_perfect_assortative_one(self, spark):
        edges = [("a1", "a2"), ("b1", "b2")]
        attrs = {"a1": "a", "a2": "a", "b1": "b", "b2": "b"}
        assert self._run(spark, edges, attrs)["r"] == pytest.approx(1.0)

    def test_perfect_disassortative(self, spark):
        # complete bipartite K2,2 between classes -> r = -1
        edges = [("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2")]
        attrs = {"a1": "a", "a2": "a", "b1": "b", "b2": "b"}
        assert self._run(spark, edges, attrs)["r"] == pytest.approx(-1.0)

    def test_single_class_null(self, spark):
        r = self._run(spark, [("a1", "a2")], {"a1": "x", "a2": "x"})
        assert r["r"] is None

    def test_self_loop_two_same_ends(self, spark):
        r = self._run(
            spark, [("a1", "a1"), ("a1", "b1")], {"a1": "a", "b1": "b"}
        )
        # ends: loop gives (a,a)x2; cross gives (a,b),(b,a)
        # M=4, tr=2, margins a=3,b=1 -> r=(8-10)/(16-10)
        assert r["r"] == pytest.approx(-2 / 6)

    def test_missing_attr_refused(self, spark):
        with pytest.raises(ValueError, match="missing from the attribute"):
            self._run(spark, [("a1", "zz")], {"a1": "a"})
