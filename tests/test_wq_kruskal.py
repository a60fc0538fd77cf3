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


class TestFriedman:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [("g", b, t, float(v)) for b, t, v in rows],
            "g string, b string, t string, v double",
        )

    def test_classical_no_ties(self, spark):
        # 2 complete blocks, ranks a<b<c in both -> Q = 4 (hand-derived
        # both via the doubled-rank form and the classical
        # 12/(nk(k+1))*sum(R^2) - 3n(k+1) formula)
        from lmss_entity_extractor_spark.ops.rankeval import friedman

        rows = [
            ("b1", "a", 1), ("b1", "b", 2), ("b1", "c", 3),
            ("b2", "a", 10), ("b2", "b", 20), ("b2", "c", 30),
        ]
        r = friedman(self._df(spark, rows), ["g"], "b", "t", "v").collect()[0]
        assert r["k"] == 3 and r["n_blocks"] == 2
        assert abs(r["q"] - 4.0) < 1e-12

    def test_ties_hand_computed(self, spark):
        # block1 values (1,1,2): 2r = 3,3,6; block2 (1,2,3): 2r=2,4,6
        # 2R = (5,7,12); num = 2*26 = 52; den = 110-96 = 14; Q = 26/7
        from lmss_entity_extractor_spark.ops.rankeval import friedman

        rows = [
            ("b1", "a", 1), ("b1", "b", 1), ("b1", "c", 2),
            ("b2", "a", 1), ("b2", "b", 2), ("b2", "c", 3),
        ]
        r = friedman(self._df(spark, rows), ["g"], "b", "t", "v").collect()[0]
        assert abs(r["q"] - 26.0 / 7.0) < 1e-12

    def test_incomplete_block_dropped(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import friedman

        rows = [
            ("b1", "a", 1), ("b1", "b", 2), ("b1", "c", 3),
            ("b2", "a", 10), ("b2", "b", 20), ("b2", "c", 30),
            ("b3", "a", 5), ("b3", "b", 6),  # incomplete
        ]
        r = friedman(self._df(spark, rows), ["g"], "b", "t", "v").collect()[0]
        assert r["n_blocks"] == 2
        assert abs(r["q"] - 4.0) < 1e-12

    def test_all_tied_null_q(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import friedman

        rows = [
            ("b1", "a", 7), ("b1", "b", 7), ("b1", "c", 7),
            ("b2", "a", 1), ("b2", "b", 1), ("b2", "c", 1),
        ]
        r = friedman(self._df(spark, rows), ["g"], "b", "t", "v").collect()[0]
        assert r["q"] is None

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import friedman

        # 12 complete blocks x 4 treatments, deterministic values with
        # plenty of within-block ties
        k, n = 4, 12
        rows = [
            (f"b{b}", f"t{t}", ((3 * b + 5 * t + b * t) % 7) / 2.0)
            for b in range(n)
            for t in range(k)
        ]
        # python reference: average ranks per block
        import collections

        two_rj = collections.Counter()
        sumsq = 0
        for b in range(n):
            vals = sorted(
                (((3 * b + 5 * t + b * t) % 7) / 2.0, t) for t in range(k)
            )
            i = 0
            while i < k:
                j = i
                while j < k and vals[j][0] == vals[i][0]:
                    j += 1
                r2 = (i + 1) + j  # 2*avg rank = min_rank + max_rank
                for m in range(i, j):
                    two_rj[vals[m][1]] += r2
                    sumsq += r2 * r2
                i = j
        num = (k - 1) * sum(
            (two_rj[t] - n * (k + 1)) ** 2 for t in range(k)
        )
        den = sumsq - n * k * (k + 1) ** 2
        q_ref = num / den
        r = friedman(self._df(spark, rows), ["g"], "b", "t", "v").collect()[0]
        assert r["k"] == k and r["n_blocks"] == n
        assert abs(r["q"] - q_ref) < 1e-12


class TestJonckheereTerpstra:
    def _df(self, spark, groups):
        rows = [
            ("g", lvl, float(v)) for lvl, vals in groups.items() for v in vals
        ]
        return spark.createDataFrame(rows, "g string, lvl string, v double")

    @staticmethod
    def _brute_jt(groups):
        keys = sorted(groups)
        jt = 0.0
        for i, ki in enumerate(keys):
            for kj in keys[i + 1:]:
                for a in groups[ki]:
                    for b in groups[kj]:
                        jt += (a < b) + 0.5 * (a == b)
        return jt

    @staticmethod
    def _ref_z(groups):
        import collections

        keys = sorted(groups)
        ns = [len(groups[k]) for k in keys]
        n = sum(ns)
        allv = [v for k in keys for v in groups[k]]
        tv = list(collections.Counter(allv).values())
        jt = TestJonckheereTerpstra._brute_jt(groups)
        mean = (n * n - sum(x * x for x in ns)) / 4.0
        a = (
            n * (n - 1) * (2 * n + 5)
            - sum(x * (x - 1) * (2 * x + 5) for x in ns)
            - sum(t * (t - 1) * (2 * t + 5) for t in tv)
        )
        b = sum(x * (x - 1) * (x - 2) for x in ns) * sum(
            t * (t - 1) * (t - 2) for t in tv
        )
        c = sum(x * (x - 1) for x in ns) * sum(t * (t - 1) for t in tv)
        var = (
            a / 72.0
            + b / (36.0 * n * (n - 1) * (n - 2))
            + c / (8.0 * n * (n - 1))
        )
        return jt, (jt - mean) / var**0.5

    def test_brute_force_with_ties(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import (
            jonckheere_terpstra,
        )

        groups = {
            "a": [1, 2, 2, 3, 5],
            "b": [2, 3, 3, 4, 6, 6],
            "c": [3, 5, 6, 7, 7, 8, 9],
        }
        jt_ref, z_ref = self._ref_z(groups)
        r = jonckheere_terpstra(
            self._df(spark, groups), ["g"], "lvl", "v"
        ).collect()[0]
        assert r["n"] == 18 and r["k"] == 3
        assert abs(r["jt"] - jt_ref) < 1e-12
        assert abs(r["z"] - z_ref) < 1e-9

    def test_no_ties_classical_variance(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import (
            jonckheere_terpstra,
        )

        groups = {
            "a": [1, 4, 7, 10],
            "b": [2, 5, 8, 11, 13],
            "c": [3, 6, 9, 12, 14, 15],
        }
        jt_ref = self._brute_jt(groups)
        ns = [4, 5, 6]
        n = 15
        mean = (n * n - sum(x * x for x in ns)) / 4.0
        var0 = (
            n * n * (2 * n + 3) - sum(x * x * (2 * x + 3) for x in ns)
        ) / 72.0
        r = jonckheere_terpstra(
            self._df(spark, groups), ["g"], "lvl", "v"
        ).collect()[0]
        assert abs(r["jt"] - jt_ref) < 1e-12
        assert abs(r["z"] - (jt_ref - mean) / var0**0.5) < 1e-9

    def test_trend_sign(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import (
            jonckheere_terpstra,
        )

        up = {"a": [1, 2, 3], "b": [4, 5, 6], "c": [7, 8, 9]}
        down = {"a": [7, 8, 9], "b": [4, 5, 6], "c": [1, 2, 3]}
        ru = jonckheere_terpstra(
            self._df(spark, up), ["g"], "lvl", "v"
        ).collect()[0]
        rd = jonckheere_terpstra(
            self._df(spark, down), ["g"], "lvl", "v"
        ).collect()[0]
        assert ru["z"] >= 3 and rd["z"] <= -3
        assert abs(ru["z"] + rd["z"]) < 1e-12

    def test_single_group_null(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import (
            jonckheere_terpstra,
        )

        r = jonckheere_terpstra(
            self._df(spark, {"a": [1, 2, 3]}), ["g"], "lvl", "v"
        ).collect()[0]
        assert r["z"] is None


class TestTrimmedStats:
    def _df(self, spark, vals):
        return spark.createDataFrame(
            [("g", float(v)) for v in vals], "g string, v double"
        )

    def test_hand_computed(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import trimmed_stats

        # n=10, trim=0.1 -> g=1: drop 1 and 100
        vals = [100, 1, 5, 6, 7, 8, 9, 10, 11, 12]
        r = trimmed_stats(
            self._df(spark, vals), ["g"], "v", trim="0.1"
        ).collect()[0]
        kept = [5, 6, 7, 8, 9, 10, 11, 12]
        assert r["n"] == 10 and r["n_used"] == 8
        assert abs(r["trimmed_mean"] - sum(kept) / 8) < 1e-12
        # winsorized: 1 -> 5, 100 -> 12
        wref = (sum(kept) + 5 + 12) / 10
        assert abs(r["winsorized_mean"] - wref) < 1e-12

    def test_no_trim_equals_mean(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import trimmed_stats

        vals = [1, 2, 3, 4]
        r = trimmed_stats(
            self._df(spark, vals), ["g"], "v", trim="0.0"
        ).collect()[0]
        assert r["trimmed_mean"] == 2.5 and r["winsorized_mean"] == 2.5

    def test_exact_multiple_boundary(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import trimmed_stats

        # n=20, trim=0.05 -> g = floor(1.0) = 1 EXACTLY (decimal)
        vals = list(range(1, 21))
        r = trimmed_stats(
            self._df(spark, vals), ["g"], "v", trim="0.05"
        ).collect()[0]
        assert r["n_used"] == 18
        assert abs(r["trimmed_mean"] - sum(range(2, 20)) / 18) < 1e-12

    def test_half_trim_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.rankeval import trimmed_stats

        with pytest.raises(ValueError, match="trim must be"):
            trimmed_stats(self._df(spark, [1, 2]), ["g"], "v", trim="0.5")
        with pytest.raises(ValueError, match="unparseable"):
            trimmed_stats(self._df(spark, [1, 2]), ["g"], "v", trim="5%")
