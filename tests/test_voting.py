"""Borda count (L391) and Copeland/Condorcet pairwise (L392)."""

import pytest

from lmss_entity_extractor_spark.ops.voting import (
    borda_count,
    copeland_pairwise,
)


def _ballots(spark, profile):
    """profile: list of (voter, 'abc') meaning a > b > c."""
    rows = []
    for v, order in profile:
        for pos, it in enumerate(order):
            rows.append(("g", v, it, float(len(order) - pos)))
    return spark.createDataFrame(
        rows, "grp string, voter string, item string, v double"
    )


class TestBorda:
    def test_unanimous(self, spark):
        df = _ballots(spark, [("v1", "abc"), ("v2", "abc")])
        out = {r["item"]: r for r in borda_count(
            df, ["grp"], "voter", "item", "v").collect()}
        assert out["a"]["borda"] == 4.0   # 2 points x 2 voters
        assert out["b"]["borda"] == 2.0
        assert out["c"]["borda"] == 0.0
        assert [out[i]["rank"] for i in "abc"] == [1, 2, 3]
        assert out["a"]["n_voters"] == 2

    def test_condorcet_cycle_all_tie(self, spark):
        df = _ballots(spark, [("v1", "abc"), ("v2", "bca"), ("v3", "cab")])
        out = borda_count(df, ["grp"], "voter", "item", "v").collect()
        assert all(r["borda"] == 3.0 for r in out)
        # deterministic tiebreak: item ascending
        assert [r["item"] for r in sorted(out, key=lambda r: r["rank"])] \
            == ["a", "b", "c"]

    def test_ties_average_points(self, spark):
        df = spark.createDataFrame(
            [("g", "v", "a", 2.0), ("g", "v", "b", 1.0), ("g", "v", "c", 1.0)],
            "grp string, voter string, item string, v double",
        )
        out = {r["item"]: r["borda"] for r in borda_count(
            df, ["grp"], "voter", "item", "v").collect()}
        assert out["a"] == 2.0
        assert out["b"] == 0.5   # average of 0 and 1
        assert out["c"] == 0.5

    def test_incomplete_ballots_dropped(self, spark):
        df = _ballots(spark, [("v1", "abc"), ("v2", "ab")])
        out = {r["item"]: r for r in borda_count(
            df, ["grp"], "voter", "item", "v").collect()}
        assert out["a"]["n_voters"] == 1   # v2 incomplete -> dropped
        assert out["a"]["borda"] == 2.0

    def test_duplicate_cell_collapses_max(self, spark):
        df = spark.createDataFrame(
            [("g", "v", "a", 1.0), ("g", "v", "a", 3.0), ("g", "v", "b", 2.0)],
            "grp string, voter string, item string, v double",
        )
        out = {r["item"]: r["borda"] for r in borda_count(
            df, ["grp"], "voter", "item", "v").collect()}
        assert out["a"] == 1.0   # max(1,3)=3 beats 2


class TestCopeland:
    def test_clear_winner(self, spark):
        df = _ballots(spark, [("v1", "abc"), ("v2", "acb"), ("v3", "bac")])
        out = {r["item"]: r for r in copeland_pairwise(
            df, ["grp"], "voter", "item", "v").collect()}
        # a beats b 2-1 and c 3-0 -> Condorcet winner
        assert out["a"]["beats"] == 2
        assert out["a"]["copeland"] == 2
        assert out["a"]["is_condorcet"] is True
        assert out["c"]["is_condorcet"] is False

    def test_cycle_no_winner(self, spark):
        df = _ballots(spark, [("v1", "abc"), ("v2", "bca"), ("v3", "cab")])
        out = copeland_pairwise(df, ["grp"], "voter", "item", "v").collect()
        assert all(r["copeland"] == 0 for r in out)
        assert not any(r["is_condorcet"] for r in out)

    def test_partial_ballots_participate(self, spark):
        # v2 only ranked (a, b) -> still scores that pair
        df = _ballots(spark, [("v1", "abc"), ("v2", "ba")])
        out = {r["item"]: r for r in copeland_pairwise(
            df, ["grp"], "voter", "item", "v").collect()}
        # a vs b: v1 says a, v2 says b -> pairwise tie
        assert out["a"]["ties_pw"] == 1
        assert out["b"]["ties_pw"] == 1
        # a vs c and b vs c: only v1 -> a and b beat c
        assert out["c"]["losses"] == 2
        assert out["c"]["copeland"] == -2

    def test_within_ballot_tie_counts_for_neither(self, spark):
        df = spark.createDataFrame(
            [("g", "v", "a", 1.0), ("g", "v", "b", 1.0)],
            "grp string, voter string, item string, v double",
        )
        out = copeland_pairwise(df, ["grp"], "voter", "item", "v").collect()
        assert all(r["ties_pw"] == 1 and r["beats"] == 0 for r in out)

    def test_wide_ballot_refused(self, spark):
        rows = [("g", "v", f"i{j}", float(j)) for j in range(5)]
        df = spark.createDataFrame(
            rows, "grp string, voter string, item string, v double"
        )
        with pytest.raises(ValueError, match="max_ballot"):
            copeland_pairwise(
                df, ["grp"], "voter", "item", "v", max_ballot=4
            )
