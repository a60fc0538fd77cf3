"""TextRank keyword extraction (L118)."""

import pytest

from lmss_entity_extractor_spark.ops.textrank import (
    cooccurrence_word_edges,
    textrank_keywords,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark shuffles Data; data joins SPARK"),
        (2, "spark scans tables"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestEdges:
    def test_window_1_adjacent_pairs(self, spark, docs):
        got = {
            (r["word_a"], r["word_b"])
            for r in cooccurrence_word_edges(docs, "text", window=1).collect()
        }
        # doc1 tokens: spark shuffles data data joins spark
        # adjacent: (spark,shuffles) (data,shuffles) (data,data->dropped)
        #           (data,joins) (joins,spark)
        # doc2: (scans,spark) (scans,tables)
        assert got == {
            ("shuffles", "spark"), ("data", "shuffles"), ("data", "joins"),
            ("joins", "spark"), ("scans", "spark"), ("scans", "tables"),
        }

    def test_window_2_reaches_over_one(self, spark, docs):
        got = {
            (r["word_a"], r["word_b"])
            for r in cooccurrence_word_edges(docs, "text", window=2).collect()
        }
        assert ("data", "spark") in got      # spark .. data at distance 2
        assert ("spark", "tables") in got    # scans spark? no: spark scans tables -> spark..tables distance 2
        assert ("shuffles", "spark") in got

    def test_min_len_filters_short_tokens(self, spark):
        df = spark.createDataFrame([(1, "a of spark to spark")], "i int, text string")
        got = {
            (r["word_a"], r["word_b"])
            for r in cooccurrence_word_edges(df, "text", window=1).collect()
        }
        # 'a' dropped (len 1); 'of'/'to' kept at default min_len=2
        assert got == {("of", "spark"), ("spark", "to")}

    def test_dedup_is_corpus_level(self, spark):
        df = spark.createDataFrame(
            [(1, "xx yy"), (2, "xx yy"), (3, "yy xx")], "i int, text string"
        )
        assert cooccurrence_word_edges(df, "text").count() == 1

    def test_validation(self, spark, docs):
        with pytest.raises(ValueError, match="window"):
            cooccurrence_word_edges(docs, "text", window=0)
        with pytest.raises(ValueError, match="not in DataFrame"):
            cooccurrence_word_edges(docs, "nope")


class TestTextrank:
    def test_hub_word_ranks_first(self, spark):
        # star: 'hub' co-occurs with every satellite; satellites only with hub
        sats = ["sata", "satb", "satc", "satd", "sate", "satf"]
        rows = [(i, f"hub {s}") for i, s in enumerate(sats)]
        df = spark.createDataFrame(rows, "i int, text string")
        top = textrank_keywords(df, "text", k=3).collect()
        assert top[0]["word"] == "hub"
        assert top[0]["rank6"] > top[1]["rank6"]

    def test_k_and_deterministic_tiebreak(self, spark):
        rows = [(1, "aa bb"), (2, "cc dd")]  # two disjoint symmetric pairs
        df = spark.createDataFrame(rows, "i int, text string")
        got = [r["word"] for r in textrank_keywords(df, "text", k=3).collect()]
        # all four words tie on the grid -> lexicographic within the tie
        assert got == ["aa", "bb", "cc"]
