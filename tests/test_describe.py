"""CBD / SPARQL DESCRIBE (graph/describe.py, L77): blank-node
recursion, shared bnodes, cycle detection — hand-checked."""

import pytest

from lmss_entity_extractor_spark.graph.describe import describe_cbd


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def _rows(df):
    return {tuple(r[c] for c in df.columns) for r in df.collect()}


@pytest.fixture(scope="module")
def graph(spark):
    return _triples(
        spark,
        [
            ("o1", "status", "OK"),
            ("o1", "has_addr", "_:a1"),
            ("_:a1", "street", "1 Main St"),
            ("_:a1", "in_city", "_:c1"),
            ("_:c1", "city_name", "Springfield"),
            ("o2", "status", "LATE"),          # other seed
            ("o3", "status", "LOST"),          # never seeded
            ("_:c1", "country", "iri:US"),     # iri object: no recursion
            ("iri:US", "label", "USA"),        # NOT pulled in (not a bnode)
        ],
    )


class TestDescribeCbd:
    def test_blank_node_recursion(self, spark, graph):
        out = describe_cbd(graph, _seeds(spark, ["o1"]))
        assert _rows(out) == {
            ("o1", "status", "OK"),
            ("o1", "has_addr", "_:a1"),
            ("_:a1", "street", "1 Main St"),
            ("_:a1", "in_city", "_:c1"),
            ("_:c1", "city_name", "Springfield"),
            ("_:c1", "country", "iri:US"),
        }

    def test_multiple_seeds_no_duplicates(self, spark, graph):
        out = describe_cbd(graph, _seeds(spark, ["o1", "o2", "o1"]))
        rows = out.collect()
        assert len(rows) == len(set(map(tuple, rows)))  # dup-free w/o distinct
        assert ("o2", "status", "LATE") in _rows(out)
        assert ("o3", "status", "LOST") not in _rows(out)

    def test_seed_without_triples_is_empty(self, spark, graph):
        assert describe_cbd(graph, _seeds(spark, ["ghost"])).count() == 0

    def test_bnode_cycle_is_loud(self, spark):
        g = _triples(
            spark,
            [("r", "p", "_:x"), ("_:x", "p", "_:y"), ("_:y", "p", "_:x")],
        )
        # the cycle exhausts: _:x and _:y both enter visited once, then
        # the frontier dries up — NO error, output complete
        out = describe_cbd(g, _seeds(spark, ["r"]))
        assert _rows(out) == {
            ("r", "p", "_:x"),
            ("_:x", "p", "_:y"),
            ("_:y", "p", "_:x"),
        }

    def test_round_bound_is_loud(self, spark):
        g = _triples(
            spark,
            [("r", "p", "_:a"), ("_:a", "p", "_:b"), ("_:b", "p", "_:c")],
        )
        with pytest.raises(RuntimeError, match="max_rounds"):
            describe_cbd(g, _seeds(spark, ["r"]), max_rounds=2)
