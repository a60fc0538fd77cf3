"""Characteristic sets (graph/charsets.py, L60): hand-checked set
identities, duplicate-predicate handling, and triple accounting."""

from lmss_entity_extractor_spark.graph.charsets import characteristic_sets


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _sets(df):
    return {
        (tuple(r["predicates"]), r["n_subjects"], r["n_triples"])
        for r in df.collect()
    }


class TestCharacteristicSets:
    def test_hand_computed(self, spark):
        g = _triples(
            spark,
            [
                # s1 and s2 share the {name, type} shape
                ("s1", "name", "a"),
                ("s1", "type", "T"),
                ("s2", "name", "b"),
                ("s2", "type", "T"),
                # s3: {name} only
                ("s3", "name", "c"),
                # s4: {name, type} but name twice -> same SET, 3 triples
                ("s4", "name", "d"),
                ("s4", "name", "e"),
                ("s4", "type", "T"),
            ],
        )
        assert _sets(characteristic_sets(g)) == {
            (("name", "type"), 3, 7),
            (("name",), 1, 1),
        }

    def test_set_identity_order_independent(self, spark):
        g = _triples(spark, [("s1", "b", "x"), ("s1", "a", "y"), ("s2", "a", "y"), ("s2", "b", "x")])
        got = _sets(characteristic_sets(g))
        assert got == {(("a", "b"), 2, 4)}

    def test_total_triples_conserved(self, spark):
        g = _triples(
            spark,
            [("s%d" % i, "p%d" % (i % 3), "o") for i in range(20)]
            + [("s1", "q", "o"), ("s1", "q", "o2")],
        )
        cs = characteristic_sets(g)
        assert sum(r["n_triples"] for r in cs.collect()) == g.count()
        assert (
            sum(r["n_subjects"] for r in cs.collect())
            == g.select("s").distinct().count()
        )
