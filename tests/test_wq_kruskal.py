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


class TestWilcoxonSignedRank:
    def _df(self, spark, pairs, grp="g"):
        return spark.createDataFrame(
            [(grp, float(x), float(y)) for x, y in pairs],
            "g string, x double, y double",
        )

    def test_no_ties_hand_computed(self, spark):
        # d = 1,-2,3,-4,5 -> ranks of |d| 1..5, W+ = 1+3+5 = 9,
        # z = (9 - 7.5)/sqrt(5*6*11/24) = 0.4045199...
        from lmss_entity_extractor_spark.ops.rankeval import (
            wilcoxon_signed_rank,
        )

        pairs = [(1, 0), (0, 2), (3, 0), (0, 4), (5, 0)]
        row = wilcoxon_signed_rank(
            self._df(spark, pairs), ["g"], "x", "y"
        ).collect()[0]
        assert row["n"] == 5
        assert row["w_plus"] == 9.0
        assert abs(row["z"] - 1.5 / 13.75**0.5) < 1e-12

    def test_ties_average_ranks(self, spark):
        # d = 1,1,-1,2: |d|=1 avg rank 2 (x3), |d|=2 rank 4
        # W+ = 2+2+4 = 8; Var = 4*5*9/24 - 24/48 = 7; z = 3/sqrt(7)
        from lmss_entity_extractor_spark.ops.rankeval import (
            wilcoxon_signed_rank,
        )

        pairs = [(1, 0), (1, 0), (0, 1), (2, 0)]
        row = wilcoxon_signed_rank(
            self._df(spark, pairs), ["g"], "x", "y"
        ).collect()[0]
        assert row["n"] == 4
        assert row["w_plus"] == 8.0
        assert abs(row["z"] - 3.0 / 7**0.5) < 1e-12

    def test_zero_diffs_dropped(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import (
            wilcoxon_signed_rank,
        )

        pairs = [(2, 2), (3, 3), (4, 1)]
        row = wilcoxon_signed_rank(
            self._df(spark, pairs), ["g"], "x", "y"
        ).collect()[0]
        assert row["n"] == 1 and row["w_plus"] == 1.0

    def test_all_zero_group_vanishes(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import (
            wilcoxon_signed_rank,
        )

        pairs = [(2, 2), (5, 5)]
        assert (
            wilcoxon_signed_rank(
                self._df(spark, pairs), ["g"], "x", "y"
            ).count()
            == 0
        )

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import (
            wilcoxon_signed_rank,
        )

        # deterministic pseudo-random pairs with many ties
        pairs = [
            (((7 * i) % 11) / 4.0, ((5 * i) % 9) / 4.0) for i in range(60)
        ]
        diffs = [
            round(x * 4) / 4 - round(y * 4) / 4 for x, y in pairs
        ]
        diffs = [d for d in diffs if d != 0]
        n = len(diffs)
        sa = sorted(abs(d) for d in diffs)
        # average ranks
        rank = {}
        i = 0
        while i < len(sa):
            j = i
            while j < len(sa) and sa[j] == sa[i]:
                j += 1
            rank[sa[i]] = (i + 1 + j) / 2.0
            i = j
        w_plus = sum(rank[abs(d)] for d in diffs if d > 0)
        tie = sum(
            c**3 - c
            for c in __import__("collections")
            .Counter(sa)
            .values()
        )
        var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
        z_ref = (w_plus - n * (n + 1) / 4.0) / var**0.5
        row = wilcoxon_signed_rank(
            self._df(spark, pairs), ["g"], "x", "y"
        ).collect()[0]
        assert row["n"] == n
        assert row["w_plus"] == w_plus
        assert abs(row["z"] - z_ref) < 1e-9
