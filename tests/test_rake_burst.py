"""RAKE keyword extraction (L419) and term-burst screen (L420)."""

import datetime as dt

import pytest

from lmss_entity_extractor_spark.ops.drift import term_burst
from lmss_entity_extractor_spark.ops.textrank import rake_keywords

SW = ["of", "the", "over", "and", "a", "an", "in", "to", "is", "for"]


class TestRake:
    def _run(self, spark, texts, **kw):
        df = spark.createDataFrame(
            [("g", t) for t in texts], "grp string, text string"
        )
        return rake_keywords(df, ["grp"], "text", SW, **kw).collect()

    def test_rose_2010_example(self, spark):
        out = self._run(
            spark,
            ["Compatibility of systems of linear constraints over the "
             "set of natural numbers"],
            top_k=5,
        )
        by_rank = {r["rank"]: r for r in out}
        assert by_rank[1]["phrase"] == "linear constraints"
        assert by_rank[1]["score"] == pytest.approx(4.0)
        assert by_rank[2]["phrase"] == "natural numbers"
        assert {by_rank[i]["phrase"] for i in (3, 4, 5)} == {
            "compatibility", "set", "systems",
        }

    def test_degree_rewards_cooccurrence(self, spark):
        # "deep learning" twice: deg(deep)=4 freq 2 -> score 2 each
        out = self._run(
            spark, ["deep learning is deep learning"], top_k=3
        )
        top = out[0]
        assert top["phrase"] == "deep learning"
        assert top["score"] == pytest.approx(4.0)

    def test_punctuation_stripped(self, spark):
        out = self._run(spark, ["(neural networks), the end!"], top_k=3)
        phrases = {r["phrase"] for r in out}
        assert "neural networks" in phrases
        assert "end" in phrases

    def test_long_phrase_discarded(self, spark):
        out = self._run(
            spark, ["one two three four five is short"],
            top_k=5, max_phrase=4,
        )
        phrases = {r["phrase"] for r in out}
        assert "one two three four five" not in phrases
        assert "short" in phrases

    def test_empty_stopwords_refused(self, spark):
        df = spark.createDataFrame([("g", "x")], "grp string, text string")
        with pytest.raises(ValueError, match="stopwords"):
            rake_keywords(df, ["grp"], "text", [])


class TestTermBurst:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "grp string, ts timestamp, term string"
        )

    def test_surging_term_ranks_first(self, spark):
        rows = []
        for i in range(30):
            t = dt.datetime(2024, 1, 1 + i % 20)
            rows.append(("g", t, "steady"))
        for i in range(6):
            rows.append(("g", dt.datetime(2024, 1, 16 + i % 4), "viral"))
        out = term_burst(
            self._df(spark, rows), ["grp"], "ts", "term",
            "2024-01-15", min_count=2,
        ).collect()
        top = [r for r in out if r["rank"] == 1][0]
        assert top["term"] == "viral"
        assert top["n_baseline"] == 0
        assert top["lift"] > 5

    def test_hand_computed_smoothing(self, spark):
        rows = [
            ("g", dt.datetime(2024, 1, 1), "a"),
            ("g", dt.datetime(2024, 1, 1), "a"),
            ("g", dt.datetime(2024, 1, 20), "a"),
            ("g", dt.datetime(2024, 1, 20), "b"),
            ("g", dt.datetime(2024, 1, 2), "b"),
        ]
        out = {
            r["term"]: r
            for r in term_burst(
                self._df(spark, rows), ["grp"], "ts", "term",
                "2024-01-10", min_count=1,
            ).collect()
        }
        # recent: a=1, b=1, Nr=2; baseline: a=2, b=1, Nb=3
        a = out["a"]
        assert a["rate_recent"] == pytest.approx(1.5 / 2.5)
        assert a["rate_baseline"] == pytest.approx(2.5 / 3.5)
        assert a["lift"] == pytest.approx((1.5 / 2.5) / (2.5 / 3.5))

    def test_min_count_filters(self, spark):
        rows = [
            ("g", dt.datetime(2024, 1, 20), "rare"),
            ("g", dt.datetime(2024, 1, 1), "common"),
            ("g", dt.datetime(2024, 1, 20), "common"),
            ("g", dt.datetime(2024, 1, 2), "common"),
        ]
        out = term_burst(
            self._df(spark, rows), ["grp"], "ts", "term",
            "2024-01-10", min_count=2,
        ).collect()
        assert {r["term"] for r in out} == {"common"}

    def test_null_refused(self, spark):
        rows = [("g", None, "x")]
        with pytest.raises(ValueError, match="NULL"):
            term_burst(
                self._df(spark, rows), ["grp"], "ts", "term",
                "2024-01-10",
            )
