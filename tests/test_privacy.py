

class TestTCloseness:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "q string, v int")

    @staticmethod
    def _ref(rows):
        import collections

        total = collections.Counter(v for _, v in rows)
        vals = sorted(total)
        n_tot = len(rows)
        m = len(vals)
        out = {}
        for q in sorted({q for q, _ in rows}):
            cls = collections.Counter(v for qq, v in rows if qq == q)
            n = sum(cls.values())
            cum_d = 0.0
            emd = 0.0
            tvd = 0.0
            for v in vals:
                p = cls.get(v, 0) / n
                g = total[v] / n_tot
                cum_d += p - g
                emd += abs(cum_d)
                tvd += abs(p - g)
            out[q] = (n, emd / (m - 1) if m > 1 else None, tvd / 2.0)
        return out, m

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.privacy import t_closeness

        rows = (
            [("a", 1)] * 5 + [("a", 2)] * 3 + [("a", 3)] * 2
            + [("b", 1)] * 1 + [("b", 3)] * 9
            + [("c", 2)] * 4 + [("c", 4)] * 4
        )
        ref, m = self._ref(rows)
        got = {
            r["q"]: r
            for r in t_closeness(self._df(spark, rows), ["q"], "v").collect()
        }
        assert all(got[q]["m"] == m for q in got)
        for q, (n, emd, tvd) in ref.items():
            assert got[q]["n"] == n
            assert abs(got[q]["emd_ordered"] - emd) < 1e-9, q
            assert abs(got[q]["tvd"] - tvd) < 1e-12, q

    def test_single_class_zero(self, spark):
        from lmss_entity_extractor_spark.ops.privacy import t_closeness

        rows = [("a", 1)] * 3 + [("a", 2)] * 7
        r = t_closeness(self._df(spark, rows), ["q"], "v").collect()[0]
        assert r["emd_ordered"] == 0.0 and r["tvd"] == 0.0

    def test_single_value_null_emd(self, spark):
        from lmss_entity_extractor_spark.ops.privacy import t_closeness

        rows = [("a", 5)] * 3 + [("b", 5)] * 2
        for r in t_closeness(self._df(spark, rows), ["q"], "v").collect():
            assert r["emd_ordered"] is None and r["tvd"] == 0.0

    def test_disjoint_classes_max_distance(self, spark):
        from lmss_entity_extractor_spark.ops.privacy import t_closeness

        # two equal classes on opposite values: tvd = 1/2 each
        rows = [("a", 0)] * 5 + [("b", 1)] * 5
        for r in t_closeness(self._df(spark, rows), ["q"], "v").collect():
            assert abs(r["tvd"] - 0.5) < 1e-12
            assert abs(r["emd_ordered"] - 0.5) < 1e-12
