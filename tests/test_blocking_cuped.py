"""Sorted-neighborhood blocking (L177) + CUPED (L178)."""

import pytest

from lmss_entity_extractor_spark.ops.blocking import sorted_neighborhood_pairs
from lmss_entity_extractor_spark.ops.cuped import cuped_adjust


def _ents(spark, rows):
    return spark.createDataFrame(rows, "pid bigint, name string, blk string")


class TestSortedNeighborhood:
    def test_window_pairs(self, spark):
        rows = [
            (1, "smith john", "s"), (2, "smith jon", "s"),
            (3, "smyth john", "s"), (4, "adams x", "a"),
        ]
        pairs = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in sorted_neighborhood_pairs(
                _ents(spark, rows), "blk", "name", "pid", window=3
            ).collect()
        }
        # sorted in block s: smith john(1), smith jon(2)? 'smith john' <
        # 'smith jon' (h < n at pos 9) -> order 1,2,3
        assert (1, 2, 1) in pairs and (2, 3, 1) in pairs and (1, 3, 2) in pairs
        assert not any(4 in (a, b) for a, b, _ in pairs)  # other block

    def test_blocks_isolate(self, spark):
        rows = [(1, "aa", "a"), (2, "bb", "b")]
        assert (
            sorted_neighborhood_pairs(
                _ents(spark, rows), "blk", "name", "pid", 3
            ).count()
            == 0
        )

    def test_window_guard(self, spark):
        with pytest.raises(ValueError, match="window"):
            sorted_neighborhood_pairs(
                _ents(spark, [(1, "a", "a")]), "blk", "name", "pid", 1
            )

    def test_pair_count_formula(self, spark):
        # n entities in one block, window w: pairs = (n-1)+(n-2)+...
        rows = [(i, f"k{i:02d}", "x") for i in range(6)]
        cnt = sorted_neighborhood_pairs(
            _ents(spark, rows), "blk", "name", "pid", window=3
        ).count()
        assert cnt == 5 + 4


def _exp(spark, rows):
    return spark.createDataFrame(rows, "g string, id int, y double, x double")


class TestCuped:
    def test_matches_python(self, spark):
        rows = [
            ("g", i, 10.0 + 2.0 * x + noise, float(x))
            for i, (x, noise) in enumerate(
                [(1, 0.5), (2, -0.25), (3, 0.75), (4, 0.0), (5, -1.0)]
            )
        ]
        out = {
            r["id"]: r
            for r in cuped_adjust(_exp(spark, rows), ["g"], "y", "x").collect()
        }
        xs = [r[3] for r in rows]
        ys = [r[2] for r in rows]
        n = len(xs)
        covn = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        varn = n * sum(a * a for a in xs) - sum(xs) ** 2
        theta = covn / varn
        xbar = sum(xs) / n
        for _, i, y, x in rows:
            assert out[i]["theta"] == pytest.approx(theta, rel=1e-12)
            assert out[i]["metric_adj"] == pytest.approx(
                y - theta * (x - xbar), rel=1e-12
            )

    def test_variance_reduced(self, spark):
        rows = [
            ("g", i, 5.0 + 3.0 * (i % 7) + (i % 3) * 0.5, float(i % 7))
            for i in range(50)
        ]
        out = cuped_adjust(_exp(spark, rows), ["g"], "y", "x").collect()
        ys = [r["y"] for r in out]
        adj = [r["metric_adj"] for r in out]

        def var(v):
            m = sum(v) / len(v)
            return sum((a - m) ** 2 for a in v)

        assert var(adj) < 0.2 * var(ys)  # strong covariate -> big shrink

    def test_mean_preserved(self, spark):
        rows = [("g", i, float(i), float((i * 3) % 5)) for i in range(10)]
        out = cuped_adjust(_exp(spark, rows), ["g"], "y", "x").collect()
        assert sum(r["metric_adj"] for r in out) == pytest.approx(
            sum(r["y"] for r in out), rel=1e-9
        )

    def test_zero_variance_passthrough(self, spark):
        rows = [("g", i, float(i), 7.0) for i in range(4)]
        out = cuped_adjust(_exp(spark, rows), ["g"], "y", "x").collect()
        assert all(r["theta"] is None for r in out)
        assert all(r["metric_adj"] == r["y"] for r in out)
