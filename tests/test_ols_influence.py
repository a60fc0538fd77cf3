"""OLS influence diagnostics (L220)."""


class TestOlsInfluence:
    def _df(self, spark, pts):
        return spark.createDataFrame(
            [("g", i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
            "g string, id int, x double, y double",
        )

    @staticmethod
    def _ref(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        syy = sum(y * y for _, y in pts)
        xbar = sx / n
        sxx_c = sxx - sx * sx / n
        sxy_c = sxy - sx * sy / n
        syy_c = syy - sy * sy / n
        b = sxy_c / sxx_c
        a = (sy - b * sx) / n
        s2 = (syy_c - b * sxy_c) / (n - 2)
        out = []
        for x, y in pts:
            h = 1 / n + (x - xbar) ** 2 / sxx_c
            e = y - (a + b * x)
            d = e * e / (2 * s2) * (h / (1 - h) ** 2)
            out.append((h, e, d))
        return out

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.regression import ols_influence

        pts = [(1, 2.1), (2, 3.9), (3, 6.2), (4, 7.8), (5, 10.3), (10, 30.0)]
        ref = self._ref(pts)
        rows = sorted(
            ols_influence(self._df(spark, pts), ["g"], "id", "x", "y").collect(),
            key=lambda r: r["id"],
        )
        for r, (h, e, d) in zip(rows, ref):
            assert abs(r["leverage"] - h) < 1e-9
            assert abs(r["resid"] - e) < 1e-9
            assert abs(r["cooks_d"] - d) < 1e-9

    def test_outlier_dominates(self, spark):
        from lmss_entity_extractor_spark.ops.regression import ols_influence

        pts = [(float(i), 2.0 * i) for i in range(10)] + [(20.0, 0.0)]
        rows = ols_influence(
            self._df(spark, pts), ["g"], "id", "x", "y"
        ).collect()
        worst = max(rows, key=lambda r: r["cooks_d"])
        assert worst["x"] == 20.0

    def test_degenerate_null(self, spark):
        from lmss_entity_extractor_spark.ops.regression import ols_influence

        pts = [(1.0, 1.0), (2.0, 2.0)]  # n = 2 -> s2 undefined
        for r in ols_influence(
            self._df(spark, pts), ["g"], "id", "x", "y"
        ).collect():
            assert r["leverage"] is None and r["cooks_d"] is None
