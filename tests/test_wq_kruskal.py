"""Weighted quantiles (L173) + Kruskal-Wallis (L174)."""

import pytest

from lmss_entity_extractor_spark.ops.rankeval import (
    kruskal_wallis,
    weighted_quantiles,
)


def _wdf(spark, rows, grp="g"):
    return spark.createDataFrame(
        [(grp, float(v), float(w)) for v, w in rows],
        "g string, v double, w double",
    )


class TestWeightedQuantiles:
    def test_hand_computed(self, spark):
        # values 1..4 with weights 1,1,6,2 (W=10):
        # q=.5 -> cumW at v=3 is 8 >= 5 and v=2 is 2 < 5 -> 3
        rows = [(1, 1), (2, 1), (3, 6), (4, 2)]
        out = {
            r["q"]: r["value"]
            for r in weighted_quantiles(
                _wdf(spark, rows), ["g"], "v", "w", ["0.25", "0.5", "0.9"]
            ).collect()
        }
        assert out["0.25"] == 3.0  # cum 2 < 2.5, cum 8 >= 2.5
        assert out["0.5"] == 3.0
        assert out["0.9"] == 4.0  # cum 8 < 9, cum 10 >= 9

    def test_exact_boundary_hit(self, spark):
        # W=4, q=0.5 -> threshold exactly 2: decimal comparison must
        # include the boundary row, not skip to the next value
        rows = [(10, 2), (20, 2)]
        out = {
            r["q"]: r["value"]
            for r in weighted_quantiles(
                _wdf(spark, rows), ["g"], "v", "w", ["0.5"]
            ).collect()
        }
        assert out["0.5"] == 10.0

    def test_unit_weights_match_lower_quantile(self, spark):
        rows = [(v, 1) for v in range(1, 11)]
        out = {
            r["q"]: r["value"]
            for r in weighted_quantiles(
                _wdf(spark, rows), ["g"], "v", "w", ["0.5", "1.0"]
            ).collect()
        }
        assert out["0.5"] == 5.0 and out["1.0"] == 10.0

    def test_negative_weight_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            weighted_quantiles(
                _wdf(spark, [(1, -1)]), ["g"], "v", "w", ["0.5"]
            ).collect()


def _kdf(spark, groups):
    rows = [(g, float(v)) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "g string, v double")


def _kw_py(groups):
    """scipy-free Kruskal reference with tie correction."""
    pooled = sorted(
        (v, g) for g, vals in groups.items() for v in vals
    )
    n = len(pooled)
    # average ranks
    ranks, i = {}, 0
    rank_of = []
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        rank_of += [avg] * (j - i)
        i = j
    rsum = {g: 0.0 for g in groups}
    for (v, g), r in zip(pooled, rank_of):
        rsum[g] += r
    h = 12.0 / (n * (n + 1)) * sum(
        rsum[g] ** 2 / len(vals) for g, vals in groups.items()
    ) - 3.0 * (n + 1)
    from collections import Counter

    ties = Counter(v for v, _ in pooled)
    tt = sum(t**3 - t for t in ties.values())
    return h, h / (1 - tt / (n**3 - n))


class TestKruskalWallis:
    def test_matches_python(self, spark):
        groups = {
            "a": [1.0, 2.0, 3.0, 7.0],
            "b": [2.0, 4.0, 6.0, 8.0, 8.0],
            "c": [5.0, 9.0, 10.0],
        }
        r = kruskal_wallis(_kdf(spark, groups), "g", "v").collect()[0]
        h, h_tc = _kw_py(groups)
        assert r["n"] == 12 and r["n_groups"] == 3
        assert r["h"] == pytest.approx(h, rel=1e-12)
        assert r["h_tie_corrected"] == pytest.approx(h_tc, rel=1e-12)

    def test_identical_groups_near_zero(self, spark):
        groups = {"a": [1.0, 2.0, 3.0], "b": [1.0, 2.0, 3.0]}
        r = kruskal_wallis(_kdf(spark, groups), "g", "v").collect()[0]
        assert abs(r["h_tie_corrected"]) < 1e-9

    def test_all_tied_null(self, spark):
        groups = {"a": [5.0, 5.0], "b": [5.0, 5.0]}
        r = kruskal_wallis(_kdf(spark, groups), "g", "v").collect()[0]
        assert r["h"] is None  # tie-correction denominator is 0

    def test_single_group_null(self, spark):
        r = kruskal_wallis(
            _kdf(spark, {"a": [1.0, 2.0]}), "g", "v"
        ).collect()[0]
        assert r["h"] is None
