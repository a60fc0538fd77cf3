"""RDFS entailment (graph/rdfs.py, L51): every ρdf rule hand-checked on
a small graph, the one-pass fixpoint pinned by idempotence, and the
meta-schema guard proven loud."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.rdfs import (
    DOMAIN_PRED,
    RANGE_PRED,
    SUBCLASS_PRED,
    SUBPROP_PRED,
    TYPE_PRED,
    rdfs_entail,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _tset(df):
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}


@pytest.fixture(scope="module")
def small_graph(spark):
    """hasBrand ⊑ hasAttr ⊑ related; Brand ⊑ Label ⊑ Thing;
    hasBrand domain Part, hasAttr range Label."""
    schema = [
        ("hasBrand", SUBPROP_PRED, "hasAttr"),
        ("hasAttr", SUBPROP_PRED, "related"),
        ("Brand", SUBCLASS_PRED, "Label"),
        ("Label", SUBCLASS_PRED, "Thing"),
        ("hasBrand", DOMAIN_PRED, "Part"),
        ("hasAttr", RANGE_PRED, "Label"),
    ]
    inst = [
        ("p1", "hasBrand", "b1"),
        ("b1", TYPE_PRED, "Brand"),
    ]
    return _triples(spark, schema + inst)


class TestRdfsEntail:
    def test_hand_computed_full_closure(self, spark, small_graph):
        got = _tset(rdfs_entail(small_graph))
        expect = {
            # asserted
            ("hasBrand", SUBPROP_PRED, "hasAttr"),
            ("hasAttr", SUBPROP_PRED, "related"),
            ("Brand", SUBCLASS_PRED, "Label"),
            ("Label", SUBCLASS_PRED, "Thing"),
            ("hasBrand", DOMAIN_PRED, "Part"),
            ("hasAttr", RANGE_PRED, "Label"),
            ("p1", "hasBrand", "b1"),
            ("b1", TYPE_PRED, "Brand"),
            # rdfs5 / rdfs11 (closure of the schema itself)
            ("hasBrand", SUBPROP_PRED, "related"),
            ("Brand", SUBCLASS_PRED, "Thing"),
            # rdfs7 (property lifting, both hops)
            ("p1", "hasAttr", "b1"),
            ("p1", "related", "b1"),
            # rdfs2 (domain of hasBrand)
            ("p1", TYPE_PRED, "Part"),
            # rdfs3 (range of hasAttr fires on the LIFTED triple)
            ("b1", TYPE_PRED, "Label"),
            # rdfs9 (type propagation up the class closure; also lifts
            # the rdfs3-derived Label up to Thing)
            ("b1", TYPE_PRED, "Thing"),
        }
        assert got == expect

    def test_idempotent(self, spark, small_graph):
        once = rdfs_entail(small_graph).localCheckpoint(eager=True)
        twice = rdfs_entail(once)
        assert _tset(once) == _tset(twice)

    def test_delta_mode_excludes_asserted(self, spark, small_graph):
        full = _tset(rdfs_entail(small_graph))
        asserted = _tset(small_graph)
        delta = _tset(rdfs_entail(small_graph, include_asserted=False))
        assert delta == full - asserted
        assert delta  # non-empty on this fixture

    def test_separate_schema_dataframe(self, spark):
        schema = _triples(spark, [("A", SUBCLASS_PRED, "B")])
        inst = _triples(spark, [("x", TYPE_PRED, "A")])
        got = _tset(rdfs_entail(inst, schema))
        assert got == {
            ("A", SUBCLASS_PRED, "B"),
            ("x", TYPE_PRED, "A"),
            ("x", TYPE_PRED, "B"),
        }

    def test_no_schema_is_passthrough(self, spark):
        inst = _triples(spark, [("x", "p", "y"), ("x", "p", "y")])
        got = rdfs_entail(inst)
        assert _tset(got) == {("x", "p", "y")}
        assert got.count() == 1  # distinct output

    def test_subclass_cycle_closes_without_divergence(self, spark):
        g = _triples(
            spark,
            [
                ("A", SUBCLASS_PRED, "B"),
                ("B", SUBCLASS_PRED, "A"),
                ("x", TYPE_PRED, "A"),
            ],
        )
        got = _tset(rdfs_entail(g))
        # A ⊑ B ⊑ A: both classes reach both; x types as both
        assert ("x", TYPE_PRED, "B") in got
        assert ("A", SUBCLASS_PRED, "A") in got  # via the cycle
        assert ("x", TYPE_PRED, "A") in got

    def test_domain_on_superproperty_fires_for_subproperty_triple(self, spark):
        g = _triples(
            spark,
            [
                ("sub", SUBPROP_PRED, "super"),
                ("super", DOMAIN_PRED, "C"),
                ("a", "sub", "b"),
            ],
        )
        assert ("a", TYPE_PRED, "C") in _tset(rdfs_entail(g))

    def test_meta_schema_rejected(self, spark):
        g = _triples(
            spark,
            [(TYPE_PRED, SUBPROP_PRED, "p2"), ("x", TYPE_PRED, "A")],
        )
        with pytest.raises(ValueError, match="RDFS vocabulary"):
            rdfs_entail(g)
        g2 = _triples(spark, [("q", SUBPROP_PRED, SUBCLASS_PRED)])
        with pytest.raises(ValueError, match="RDFS vocabulary"):
            rdfs_entail(g2)

    def test_null_rows_dropped(self, spark):
        g = _triples(
            spark,
            [("x", TYPE_PRED, None), (None, "p", "y"), ("x", "p", "y")],
        )
        assert _tset(rdfs_entail(g)) == {("x", "p", "y")}

    def test_broadcast_in_plan(self, spark, small_graph):
        plan = rdfs_entail(small_graph)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_entailment_distributes_over_instance_union(self, spark, small_graph):
        """Given a FIXED schema, every ρdf rule is per-instance-triple
        local (the closures live on the schema side), so
        entail(A ∪ B) == entail(A) ∪ entail(B) — the property that
        makes 100 TB entailment embarrassingly incremental: entail only
        the delta (include_asserted=False on the new batch) and union
        it onto the already-published graph."""
        schema = small_graph.filter(
            F.col("p").isin(SUBPROP_PRED, SUBCLASS_PRED, DOMAIN_PRED, RANGE_PRED)
        )
        inst = small_graph.subtract(schema)
        a = inst.filter(F.col("s") == "p1")   # the hasBrand triple
        b = inst.subtract(a)                  # the type triple
        whole = _tset(rdfs_entail(inst, schema))
        parts = _tset(rdfs_entail(a, schema)) | _tset(rdfs_entail(b, schema))
        assert whole == parts
