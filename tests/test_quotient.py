"""Quotient graph (graph/quotient.py, L66): hand-built summaries,
leaf-class separation, count conservation, duplicate predicates."""

from lmss_entity_extractor_spark.graph.quotient import quotient_graph


def _t(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _by_edge(df):
    return {
        (tuple(r["src_set"]), r["p"], tuple(r["dst_set"])): r["n_triples"]
        for r in df.collect()
    }


class TestQuotientGraph:
    def test_two_shapes_and_leaf_class(self, spark):
        # e1, e2 share shape {knows, name}; e3 has shape {knows};
        # "Ada"/"Bob" are leaves (never subjects) -> class []
        rows = [
            ("e1", "knows", "e2"),
            ("e1", "name", "Ada"),
            ("e2", "knows", "e3"),
            ("e2", "name", "Bob"),
            ("e3", "knows", "e1"),
        ]
        got = _by_edge(quotient_graph(_t(spark, rows)))
        full, k = ("knows", "name"), ("knows",)
        assert got == {
            (full, "knows", full): 1,  # e1->e2
            (full, "knows", k): 1,  # e2->e3
            (k, "knows", full): 1,  # e3->e1
            (full, "name", ()): 2,  # e1->Ada, e2->Bob
        }

    def test_counts_conserve_triples(self, spark):
        rows = [
            ("s%d" % (i % 5), "p%d" % (i % 3), "o%d" % (i % 7)) for i in range(40)
        ]
        t = _t(spark, rows).distinct()
        out = quotient_graph(t)
        total = sum(r["n_triples"] for r in out.collect())
        assert total == t.count()

    def test_duplicate_predicate_same_class(self, spark):
        # e1 carries "knows" twice -> still class {knows}
        rows = [("e1", "knows", "x"), ("e1", "knows", "y")]
        got = _by_edge(quotient_graph(_t(spark, rows)))
        assert got == {(("knows",), "knows", ()): 2}

    def test_empty(self, spark):
        out = quotient_graph(_t(spark, []))
        assert out.count() == 0
        assert out.columns == ["src_set", "p", "dst_set", "n_triples"]
