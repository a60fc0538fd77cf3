"""SHACL-lite validation (graph/shacl.py, L53): each constraint kind
hand-checked, including the zero-count minCount case, the null-
unconstrained contract, and conformant graphs."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.rdfs import TYPE_PRED
from lmss_entity_extractor_spark.graph.shacl import validate_shapes

SHAPE_SCHEMA = (
    "shape_id string, target_class string, path string, "
    "min_count int, max_count int, pattern string, value_class string"
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _shapes(spark, rows):
    return spark.createDataFrame(rows, SHAPE_SCHEMA)


def _vset(df):
    return {
        (r["focus"], r["shape_id"], r["path"], r["constraint"], r["actual"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def graph(spark):
    return _triples(
        spark,
        [
            ("c1", TYPE_PRED, "Customer"),
            ("c2", TYPE_PRED, "Customer"),
            ("c3", TYPE_PRED, "Customer"),
            ("n1", TYPE_PRED, "Nation"),
            ("c1", "located_in", "n1"),
            ("c1", "email", "a@x.com"),
            ("c2", "located_in", "n1"),
            ("c2", "located_in", "n9"),  # n9 untyped -> class violation
            ("c2", "email", "not-an-email"),  # pattern violation
            # c3 has NO located_in -> minCount violation (zero-count case)
        ],
    )


@pytest.fixture(scope="module")
def shapes(spark):
    return _shapes(
        spark,
        [
            ("CustShape", "Customer", "located_in", 1, 1, None, "Nation"),
            ("CustShape", "Customer", "email", None, None, "^[^@]+@[^@]+$", None),
        ],
    )


class TestValidateShapes:
    def test_hand_computed_violations(self, spark, graph, shapes):
        got = _vset(validate_shapes(graph, shapes))
        assert got == {
            ("c3", "CustShape", "located_in", "minCount", "0"),
            ("c2", "CustShape", "located_in", "maxCount", "2"),
            ("c2", "CustShape", "email", "pattern", "not-an-email"),
            ("c2", "CustShape", "located_in", "class", "n9"),
        }

    def test_conformant_graph_is_empty(self, spark, shapes):
        g = _triples(
            spark,
            [
                ("c1", TYPE_PRED, "Customer"),
                ("n1", TYPE_PRED, "Nation"),
                ("c1", "located_in", "n1"),
                ("c1", "email", "a@x.com"),
            ],
        )
        assert validate_shapes(g, shapes).count() == 0

    def test_non_focus_nodes_ignored(self, spark, shapes):
        # a subject without the target type is never validated
        g = _triples(spark, [("z1", "located_in", "nowhere")])
        assert validate_shapes(g, shapes).count() == 0

    def test_null_constraints_unenforced(self, spark, graph):
        sh = _shapes(spark, [("S", "Customer", "located_in", None, None, None, None)])
        assert validate_shapes(graph, sh).count() == 0

    def test_min_count_two(self, spark, graph):
        sh = _shapes(spark, [("S", "Customer", "email", 2, None, None, None)])
        got = _vset(validate_shapes(graph, sh))
        assert got == {
            ("c1", "S", "email", "minCount", "1"),
            ("c2", "S", "email", "minCount", "1"),
            ("c3", "S", "email", "minCount", "0"),
        }

    def test_class_check_not_transitive(self, spark):
        # sh:class is exact-type here; run rdfs_entail first for subclass
        g = _triples(
            spark,
            [
                ("c1", TYPE_PRED, "Customer"),
                ("c1", "located_in", "n1"),
                ("n1", TYPE_PRED, "MemberState"),  # not 'Nation'
            ],
        )
        sh = _shapes(spark, [("S", "Customer", "located_in", None, None, None, "Nation")])
        assert _vset(validate_shapes(g, sh)) == {("c1", "S", "located_in", "class", "n1")}

    def test_missing_shape_columns_rejected(self, spark, graph):
        bad = spark.createDataFrame([("S", "Customer")], "shape_id string, target_class string")
        with pytest.raises(ValueError, match="missing columns"):
            validate_shapes(graph, bad)

    def test_duplicate_value_reported_once(self, spark):
        g = _triples(
            spark,
            [
                ("c1", TYPE_PRED, "Customer"),
                ("c1", "email", "bad"),
                ("c1", "email", "bad"),
            ],
        )
        sh = _shapes(spark, [("S", "Customer", "email", None, None, "^[^@]+@[^@]+$", None)])
        out = validate_shapes(g, sh)
        assert out.count() == 1
