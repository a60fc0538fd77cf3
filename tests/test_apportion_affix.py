"""Highest-averages apportionment (L399) and common-affix audit (L400)."""

import pytest

from lmss_entity_extractor_spark.ops.apportion import highest_averages
from lmss_entity_extractor_spark.ops.textnorm import common_affix_audit


def _votes(spark, pairs):
    return spark.createDataFrame(
        [("e", p, v) for p, v in pairs], "el string, party string, votes long"
    )


class TestHighestAverages:
    WIKI = [("A", 100000), ("B", 80000), ("C", 30000), ("D", 20000)]

    def test_dhondt_wikipedia(self, spark):
        out = {
            r["party"]: r["seats"]
            for r in highest_averages(
                _votes(spark, self.WIKI), ["el"], "party", "votes", 8
            ).collect()
        }
        assert out == {"A": 4, "B": 3, "C": 1, "D": 0}

    def test_sainte_lague_wikipedia(self, spark):
        out = {
            r["party"]: r["seats"]
            for r in highest_averages(
                _votes(spark, self.WIKI), ["el"], "party", "votes", 8,
                method="sainte_lague",
            ).collect()
        }
        assert out == {"A": 3, "B": 3, "C": 1, "D": 1}

    def test_seats_sum_to_total(self, spark):
        out = highest_averages(
            _votes(spark, self.WIKI), ["el"], "party", "votes", 13
        ).collect()
        assert sum(r["seats"] for r in out) == 13

    def test_tie_broken_by_party(self, spark):
        # equal votes, 1 seat: A wins by the pinned party-ASC tiebreak
        out = {
            r["party"]: r["seats"]
            for r in highest_averages(
                _votes(spark, [("B", 10), ("A", 10)]),
                ["el"], "party", "votes", 1,
            ).collect()
        }
        assert out == {"A": 1, "B": 0}

    def test_zero_vote_party_kept_at_zero(self, spark):
        out = {
            r["party"]: r["seats"]
            for r in highest_averages(
                _votes(spark, [("A", 5), ("Z", 0)]),
                ["el"], "party", "votes", 3,
            ).collect()
        }
        assert out == {"A": 3, "Z": 0}

    def test_negative_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            highest_averages(
                _votes(spark, [("A", -1)]), ["el"], "party", "votes", 2
            )

    def test_duplicate_party_refused(self, spark):
        # each duplicate row would spawn its own divisor ladder and
        # silently double-weight the party (r4 ADVICE)
        with pytest.raises(ValueError, match="duplicate"):
            highest_averages(
                _votes(spark, [("A", 10), ("A", 10), ("B", 5)]),
                ["el"], "party", "votes", 3,
            )

    def test_bad_method_and_seats(self, spark):
        df = _votes(spark, [("A", 1)])
        with pytest.raises(ValueError, match="method"):
            highest_averages(df, ["el"], "party", "votes", 2, method="hare")
        with pytest.raises(ValueError, match="total_seats"):
            highest_averages(df, ["el"], "party", "votes", 0)


class TestCommonAffix:
    def _audit(self, spark, texts, **kw):
        df = spark.createDataFrame(
            [("g", t) for t in texts], "grp string, text string"
        )
        return common_affix_audit(df, ["grp"], "text", **kw).collect()[0]

    def test_shared_affixes(self, spark):
        r = self._audit(
            spark,
            ["PRE: hello :END", "PRE: bye :END", "PRE: zzz :END"],
        )
        assert r["prefix"] == "PRE: "
        assert r["prefix_len"] == 5
        assert r["suffix"] == " :END"
        assert r["suffix_len"] == 5

    def test_no_common_affix(self, spark):
        r = self._audit(spark, ["abc", "xyz"])
        assert r["prefix_len"] == 0 and r["prefix"] == ""
        assert r["suffix_len"] == 0 and r["suffix"] == ""

    def test_min_max_identity_middle_string_irrelevant(self, spark):
        # middle strings share more with each other than min/max do;
        # set-LCP must still come from (min, max) alone
        r = self._audit(spark, ["ab1", "ab2", "aa9"])
        assert r["prefix"] == "a"

    def test_single_text_degenerate(self, spark):
        r = self._audit(spark, ["hello"])
        assert r["prefix"] == "hello" and r["suffix"] == "hello"

    def test_one_string_prefix_of_other(self, spark):
        r = self._audit(spark, ["abc", "abcdef"])
        assert r["prefix"] == "abc"
        assert r["prefix_len"] == 3

    def test_probe_truncation(self, spark):
        r = self._audit(spark, ["x" * 500, "x" * 400], max_probe=64)
        assert r["prefix_len"] == 64

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", None)], "grp string, text string"
        )
        with pytest.raises(ValueError, match="NULL text"):
            common_affix_audit(df, ["grp"], "text")
