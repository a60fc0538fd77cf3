"""VoID statistics (graph/void.py, L64): hand-counted partitions and
summary over a small typed graph; double-typed entities; shared terms."""

from lmss_entity_extractor_spark.graph.void import (
    void_class_partitions,
    void_property_partitions,
    void_summary,
)

TRIPLES = [
    ("e1", "rdf:type", "Person"),
    ("e1", "rdf:type", "Lawyer"),
    ("e2", "rdf:type", "Person"),
    ("e2", "rdf:type", "Person"),  # duplicated assertion
    ("e1", "knows", "e2"),
    ("e2", "knows", "e1"),
    ("e3", "knows", "e1"),
    ("e1", "name", "Ada"),
]


def _t(spark):
    return spark.createDataFrame(TRIPLES, "s string, p string, o string")


class TestVoid:
    def test_property_partitions(self, spark):
        got = {
            r["p"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
            for r in void_property_partitions(_t(spark)).collect()
        }
        assert got == {
            "rdf:type": (4, 2, 2),
            "knows": (3, 3, 2),
            "name": (1, 1, 1),
        }

    def test_class_partitions_dedup_typed_twice(self, spark):
        got = {
            r["cls"]: r["n_entities"]
            for r in void_class_partitions(_t(spark)).collect()
        }
        # e2's duplicated Person assertion counts once
        assert got == {"Person": 2, "Lawyer": 1}

    def test_summary(self, spark):
        row = void_summary(_t(spark)).collect()[0]
        assert row["n_triples"] == 8
        assert row["n_subjects"] == 3  # e1 e2 e3
        assert row["n_predicates"] == 3
        assert row["n_objects"] == 5  # Person Lawyer e1 e2 Ada
        # terms: e1 e2 e3 rdf:type knows name Person Lawyer Ada
        assert row["n_terms"] == 9

    def test_empty(self, spark):
        t = spark.createDataFrame([], "s string, p string, o string")
        assert void_property_partitions(t).count() == 0
        assert void_class_partitions(t).count() == 0
        row = void_summary(t).collect()[0]
        assert tuple(row) == (0, 0, 0, 0, 0)
