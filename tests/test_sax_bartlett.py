"""SAX symbolization (L231) and Bartlett's variance test (L232)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.stattests import bartlett
from lmss_entity_extractor_spark.ops.timeseries import sax_symbolize


def _sax_py(xs, w, bps):
    n = len(xs)
    m = sum(xs) / n
    var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
    sd = math.sqrt(var)
    segs = {}
    for i, x in enumerate(xs):
        segs.setdefault(i * w // n, []).append(x)
    out = {}
    for s, vs in segs.items():
        paa = sum(vs) / len(vs)
        z = (paa - m) / sd
        sym = sum(1 for b in bps if z > b)
        out[s] = (len(vs), paa, z, sym)
    return out


BP4 = [-0.6744897501960817, 0.0, 0.6744897501960817]


class TestSax:
    def _df(self, spark, xs, g="s1"):
        return spark.createDataFrame(
            [(g, i, float(x)) for i, x in enumerate(xs)],
            "g string, t int, x double",
        )

    def test_matches_python_reference(self, spark):
        xs = [1.0, 2.0, 3.0, 10.0, 11.0, 12.0, 5.0, 6.0, 7.25, 1.5]
        rows = sax_symbolize(
            self._df(spark, xs), ["g"], ["t"], "x", n_segments=4
        ).collect()
        ref = _sax_py(xs, 4, BP4)
        assert len(rows) == 4
        for r in rows:
            np, paa, z, sym = ref[r["segment"]]
            assert r["n_points"] == np and r["paa"] == paa
            assert r["z"] == z and r["symbol"] == sym

    def test_word_shape(self, spark):
        # low half then high half -> low symbols then high symbols
        xs = [0.0] * 8 + [100.0] * 8
        rows = sorted(
            sax_symbolize(
                self._df(spark, xs), ["g"], ["t"], "x", n_segments=2
            ).collect(),
            key=lambda r: r["segment"],
        )
        assert rows[0]["symbol"] == 0 and rows[1]["symbol"] == 3

    def test_constant_series_null_symbol(self, spark):
        rows = sax_symbolize(
            self._df(spark, [5.0] * 6), ["g"], ["t"], "x", n_segments=2
        ).collect()
        assert all(r["symbol"] is None and r["z"] is None for r in rows)
        assert all(r["paa"] == 5.0 for r in rows)

    def test_null_refused_and_bad_params(self, spark):
        df = spark.createDataFrame(
            [("g", 1, None), ("g", 2, 1.0)], "g string, t int, x double"
        )
        with pytest.raises(ValueError, match="NULL"):
            sax_symbolize(df, ["g"], ["t"], "x", 2)
        good = self._df(spark, [1.0, 2.0])
        with pytest.raises(ValueError, match="n_segments"):
            sax_symbolize(good, ["g"], ["t"], "x", 0)
        with pytest.raises(ValueError, match="alphabet"):
            sax_symbolize(good, ["g"], ["t"], "x", 2, alphabet=26)

    def test_parallelism_invariance(self, spark):
        xs = [float((i * 7) % 13) for i in range(40)]
        df = self._df(spark, xs)
        a = sorted(map(tuple, sax_symbolize(df.repartition(1), ["g"], ["t"], "x", 8).collect()))
        b = sorted(map(tuple, sax_symbolize(df.repartition(8), ["g"], ["t"], "x", 8).collect()))
        assert a == b


def _bartlett_py(groups):
    k = len(groups)
    N = sum(len(g) for g in groups.values())
    s2 = {}
    for g, vs in groups.items():
        n = len(vs)
        s2[g] = (n * sum(v * v for v in vs) - sum(vs) ** 2) / (n * (n - 1))
    sp_num = sum((len(groups[g]) - 1) * s2[g] for g in sorted(groups))
    sp2 = sp_num / (N - k)
    t = (N - k) * math.log(sp2) - sum(
        (len(groups[g]) - 1) * math.log(s2[g]) for g in sorted(groups)
    )
    c = 1 + (
        sum(1 / (len(groups[g]) - 1) for g in sorted(groups)) - 1 / (N - k)
    ) / (3 * (k - 1))
    return t, c, t / c


class TestBartlett:
    def _df(self, spark, groups):
        rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
        return spark.createDataFrame(rows, "lvl string, v double")

    def test_matches_python_reference(self, spark):
        groups = {
            "a": [1.0, 2.0, 3.0, 4.0, 5.0],
            "b": [10.0, 30.0, 50.0, 70.0],
            "c": [5.0, 5.5, 6.0, 6.25, 7.0, 5.75],
        }
        out = bartlett(self._df(spark, groups), [], "lvl", "v").collect()[0]
        t, c, stat = _bartlett_py(groups)
        assert out["t"] == pytest.approx(t, rel=1e-12)
        assert out["c"] == pytest.approx(c, rel=1e-12)
        assert out["stat"] == pytest.approx(stat, rel=1e-12)
        assert out["k"] == 3 and out["n"] == 15

    def test_equal_variances_small_stat(self, spark):
        groups = {"a": [1.0, 2.0, 3.0], "b": [11.0, 12.0, 13.0]}
        out = bartlett(self._df(spark, groups), [], "lvl", "v").collect()[0]
        assert abs(out["stat"]) < 1e-9

    def test_constant_level_null(self, spark):
        groups = {"a": [1.0, 1.0, 1.0], "b": [1.0, 2.0, 3.0]}
        out = bartlett(self._df(spark, groups), [], "lvl", "v").collect()[0]
        assert out["stat"] is None and out["k"] == 2

    def test_single_level_null(self, spark):
        out = bartlett(
            self._df(spark, {"a": [1.0, 2.0, 3.0]}), [], "lvl", "v"
        ).collect()[0]
        assert out["stat"] is None
