"""Sweep-line interval analytics (L127/L128)."""

import pytest

from lmss_entity_extractor_spark.ops.sweep import (
    concurrency,
    interval_intersect,
    max_concurrency,
)


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k string, s long, e long")


@pytest.fixture(scope="module")
def sessions(spark):
    # key 'a': [0,10) [5,15) [5,8) [20,25) — peak 3 on [5,8)
    rows = [("a", 0, 10), ("a", 5, 15), ("a", 5, 8), ("a", 20, 25), ("b", 1, 2)]
    return _iv(spark, rows)


class TestConcurrency:
    def test_step_function(self, spark, sessions):
        got = {
            (r["k"], r["t"]): r["n_active"]
            for r in concurrency(sessions, "k", "s", "e").collect()
        }
        assert got[("a", 0)] == 1
        assert got[("a", 5)] == 3
        assert got[("a", 8)] == 2
        assert got[("a", 10)] == 1
        assert got[("a", 15)] == 0
        assert got[("a", 20)] == 1
        assert got[("a", 25)] == 0
        assert got[("b", 1)] == 1 and got[("b", 2)] == 0

    def test_half_open_touching_intervals(self, spark):
        df = _iv(spark, [("a", 0, 5), ("a", 5, 10)])
        got = {r["t"]: r["n_active"] for r in concurrency(df, "k", "s", "e").collect()}
        assert got[5] == 1  # end at 5 and start at 5 net to 1, never 2

    def test_zero_length_and_null_dropped(self, spark):
        df = _iv(spark, [("a", 3, 3), ("a", None, 5), ("a", 1, 2)])
        got = concurrency(df, "k", "s", "e").collect()
        assert {(r["t"], r["n_active"]) for r in got} == {(1, 1), (2, 0)}

    def test_max_concurrency_earliest_peak(self, spark, sessions):
        got = {r["k"]: (r["peak"], r["at_t"]) for r in
               max_concurrency(sessions, "k", "s", "e").collect()}
        assert got["a"] == (3, 5)
        assert got["b"] == (1, 1)

    def test_validation(self, spark, sessions):
        with pytest.raises(ValueError, match="not in DataFrame"):
            concurrency(sessions, "k", "nope", "e")


class TestIntersect:
    def test_basic_overlap(self, spark):
        a = _iv(spark, [("k", 0, 10), ("k", 20, 30)])
        b = _iv(spark, [("k", 5, 25)])
        got = sorted(
            (r["s"], r["e"])
            for r in interval_intersect(a, b, "k", "s", "e").collect()
        )
        assert got == [(5, 10), (20, 25)]

    def test_coverage_not_multiplicity(self, spark):
        # overlapping intervals within ONE set count once
        a = _iv(spark, [("k", 0, 10), ("k", 2, 6)])
        b = _iv(spark, [("k", 4, 8)])
        got = [(r["s"], r["e"]) for r in interval_intersect(a, b, "k", "s", "e").collect()]
        assert got == [(4, 8)]

    def test_adjacent_segments_merge(self, spark):
        # b's two touching intervals act as one continuous cover
        a = _iv(spark, [("k", 0, 10)])
        b = _iv(spark, [("k", 2, 5), ("k", 5, 9)])
        got = [(r["s"], r["e"]) for r in interval_intersect(a, b, "k", "s", "e").collect()]
        assert got == [(2, 9)]

    def test_disjoint_yields_empty(self, spark):
        a = _iv(spark, [("k", 0, 5)])
        b = _iv(spark, [("k", 5, 10)])  # touching, half-open -> empty
        assert interval_intersect(a, b, "k", "s", "e").count() == 0

    def test_keys_isolated(self, spark):
        a = _iv(spark, [("k1", 0, 10)])
        b = _iv(spark, [("k2", 0, 10)])
        assert interval_intersect(a, b, "k", "s", "e").count() == 0
