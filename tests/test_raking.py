"""IPF raking (L321) and Kish ESS (L322)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.raking import ipf_raking, kish_ess


def _ipf_py(cells, row_t, col_t, iters):
    w = dict(cells)
    for _ in range(iters):
        rs = {}
        for (r, c), v in w.items():
            rs[r] = rs.get(r, 0.0) + v
        w = {(r, c): v * row_t[r] / rs[r] for (r, c), v in w.items()}
        cs = {}
        for (r, c), v in w.items():
            cs[c] = cs.get(c, 0.0) + v
        w = {(r, c): v * col_t[c] / cs[c] for (r, c), v in w.items()}
    return w


CELLS = {("a", "x"): 10.0, ("a", "y"): 20.0,
         ("b", "x"): 30.0, ("b", "y"): 40.0}
ROW_T = {"a": 50.0, "b": 50.0}
COL_T = {"x": 60.0, "y": 40.0}


def _dfs(spark, g="g1"):
    cells = spark.createDataFrame(
        [(g, r, c, v) for (r, c), v in CELLS.items()],
        "g string, r string, c string, w double",
    )
    rt = spark.createDataFrame(
        [(g, r, v) for r, v in ROW_T.items()],
        "g string, r string, target double",
    )
    ct = spark.createDataFrame(
        [(g, c, v) for c, v in COL_T.items()],
        "g string, c string, target double",
    )
    return cells, rt, ct


class TestIpf:
    def test_matches_python_reference(self, spark):
        cells, rt, ct = _dfs(spark)
        rows = ipf_raking(
            cells, ["g"], "r", "c", "w", rt, ct, iters=8
        ).collect()
        ref = _ipf_py(CELLS, ROW_T, COL_T, 8)
        assert len(rows) == 4
        for row in rows:
            assert row["weight"] == pytest.approx(
                ref[(row["r"], row["c"])], rel=1e-9
            )

    def test_margins_converge(self, spark):
        cells, rt, ct = _dfs(spark)
        rows = ipf_raking(
            cells, ["g"], "r", "c", "w", rt, ct, iters=20
        ).collect()
        for row in rows:
            assert row["row_gap"] < 1e-6
            assert row["col_gap"] < 1e-6
        # raked total mass equals the target total
        assert sum(r["weight"] for r in rows) == pytest.approx(100.0)

    def test_infeasible_refused(self, spark):
        cells, rt, ct = _dfs(spark)
        bad = cells.withColumn(
            "w",
            (
                cells.w
                * (cells.r != "a").cast("double")
            ),
        )
        with pytest.raises(ValueError, match="infeasible"):
            ipf_raking(bad, ["g"], "r", "c", "w", rt, ct)

    def test_negative_seed_refused(self, spark):
        cells, rt, ct = _dfs(spark)
        with pytest.raises(ValueError, match="negative"):
            ipf_raking(
                cells.withColumn("w", cells.w - 25.0),
                ["g"], "r", "c", "w", rt, ct,
            )


class TestKishEss:
    def _df(self, spark, ws, g="g1"):
        return spark.createDataFrame(
            [(g, float(w)) for w in ws], "g string, w double"
        )

    def test_uniform_weights_full_ess(self, spark):
        row = kish_ess(self._df(spark, [2.0] * 10), ["g"], "w").collect()[0]
        assert row["ess"] == pytest.approx(10.0, rel=1e-12)
        assert row["deff"] == pytest.approx(1.0, rel=1e-12)

    def test_matches_formula(self, spark):
        ws = [1, 2, 3, 4, 10]
        row = kish_ess(self._df(spark, ws), ["g"], "w").collect()[0]
        ess = sum(ws) ** 2 / sum(w * w for w in ws)
        assert row["ess"] == pytest.approx(ess, rel=1e-12)
        assert row["deff"] == pytest.approx(5 / ess, rel=1e-12)

    def test_nonpositive_refused(self, spark):
        with pytest.raises(ValueError, match="nonpositive"):
            kish_ess(self._df(spark, [1.0, 0.0]), ["g"], "w")
