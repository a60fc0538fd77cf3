"""Brunner-Munzel test (L268) and Ansari-Bradley scale test (L269)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.rankeval import (
    ansari_bradley,
    brunner_munzel,
)


def _midranks(pooled_sorted):
    """value -> midrank (1-based, tie-averaged) in the sorted list."""
    out, i = {}, 0
    while i < len(pooled_sorted):
        j = i
        while j < len(pooled_sorted) and pooled_sorted[j] == pooled_sorted[i]:
            j += 1
        out[pooled_sorted[i]] = (i + 1 + j) / 2.0
        i = j
    return out


def _bm_py(a, b):
    pooled = sorted(a + b)
    rc = _midranks(pooled)
    ra_map, rb_map = _midranks(sorted(a)), _midranks(sorted(b))
    nx, ny = len(a), len(b)
    rca, rcb = [rc[x] for x in a], [rc[y] for y in b]
    ma, mb = sum(rca) / nx, sum(rcb) / ny
    sx = sum(
        (rc[x] - ra_map[x] - ma + (nx + 1) / 2.0) ** 2 for x in a
    ) / (nx - 1)
    sy = sum(
        (rc[y] - rb_map[y] - mb + (ny + 1) / 2.0) ** 2 for y in b
    ) / (ny - 1)
    pooled_v = nx * sx + ny * sy
    w = nx * ny * (mb - ma) / ((nx + ny) * math.sqrt(pooled_v))
    dfb = pooled_v**2 / (
        (nx * sx) ** 2 / (nx - 1) + (ny * sy) ** 2 / (ny - 1)
    )
    p_hat = (mb - (ny + 1) / 2.0) / nx
    return p_hat, w, dfb


def _ab_py(a, b):
    pooled = sorted(a + b)
    n_ = len(pooled)
    pos_scores = [min(r, n_ + 1 - r) for r in range(1, n_ + 1)]
    avg, i = {}, 0
    while i < n_:
        j = i
        while j < n_ and pooled[j] == pooled[i]:
            j += 1
        avg[pooled[i]] = sum(pos_scores[i:j]) / (j - i)
        i = j
    na = len(a)
    ab = sum(avg[x] for x in a)
    scores = [avg[x] for x in pooled]
    sbar = sum(scores) / n_
    e = na * sbar
    var = (
        na
        * (n_ - na)
        / (n_ * (n_ - 1.0))
        * (sum(s * s for s in scores) - n_ * sbar * sbar)
    )
    return ab, e, var, (ab - e) / math.sqrt(var)


def _df(spark, a, b, g="g1"):
    rows = [(g, "A", float(v)) for v in a] + [(g, "B", float(v)) for v in b]
    return spark.createDataFrame(rows, "g string, s string, x double")


class TestBrunnerMunzel:
    def test_matches_python_reference(self, spark):
        a = [1, 2, 2, 3, 5, 8, 8, 13]
        b = [2, 3, 3, 4, 6, 7, 9, 9, 21]
        out = brunner_munzel(
            _df(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        p_hat, w, dfb = _bm_py(a, b)
        assert out["n_a"] == 8 and out["n_b"] == 9
        assert out["p_hat"] == pytest.approx(p_hat, rel=1e-12)
        assert out["w"] == pytest.approx(w, rel=1e-12)
        assert out["df_bm"] == pytest.approx(dfb, rel=1e-12)

    def test_identical_samples(self, spark):
        a = [1.0, 2.0, 3.0, 4.0, 5.0]
        out = brunner_munzel(
            _df(spark, a, a), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["p_hat"] == 0.5
        assert out["w"] == 0.0

    def test_b_stochastically_larger(self, spark):
        a = [1, 2, 3, 4, 5, 6]
        b = [4, 5, 6, 7, 8, 9]
        out = brunner_munzel(
            _df(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["p_hat"] > 0.5
        assert out["w"] > 1.0

    def test_degenerate_null(self, spark):
        out = brunner_munzel(
            _df(spark, [1.0], [2.0, 3.0]), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["w"] is None and out["df_bm"] is None


class TestAnsariBradley:
    def test_matches_python_reference(self, spark):
        a = [10, 12, 12, 14, 20, 11]
        b = [5, 13, 13, 25, 30, 1, 13]
        out = ansari_bradley(
            _df(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        ab, e, var, z = _ab_py(a, b)
        assert out["ab"] == pytest.approx(ab, rel=1e-12)
        assert out["e_ab"] == pytest.approx(e, rel=1e-12)
        assert out["var_ab"] == pytest.approx(var, rel=1e-12)
        assert out["z"] == pytest.approx(z, rel=1e-12)

    def test_tight_sample_scores_high(self, spark):
        a = [9.9, 10.0, 10.0, 10.1, 10.05, 9.95]
        b = [1, 4, 8, 12, 16, 20]
        out = ansari_bradley(
            _df(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["z"] > 1.5

    def test_no_ties_exact_scores(self, spark):
        # N=6, scores 1,2,3,3,2,1; A holds ranks 1,3,5 -> 1+3+2 = 6
        out = ansari_bradley(
            _df(spark, [1, 30, 50], [20, 40, 60]), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["ab"] == 6.0
        assert out["e_ab"] == pytest.approx(6.0)

    def test_all_tied_null_z(self, spark):
        out = ansari_bradley(
            _df(spark, [5.0, 5.0], [5.0, 5.0]), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["z"] is None
