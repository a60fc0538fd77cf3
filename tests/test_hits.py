"""HITS (graph/hits.py, L63): hand-computed one-iteration scores,
bipartite fixed point, sink/source zeroing, empty input."""

import pytest

from lmss_entity_extractor_spark.graph.hits import hits


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _by_node(df):
    return {r["node"]: (r["hub"], r["auth"]) for r in df.collect()}


class TestHits:
    def test_one_iteration_hand_computed(self, spark):
        # a->b, a->c, b->c, c->a
        # auth_raw: a=1 (from c), b=1 (from a), c=2 (from a,b); max 2
        # auth: a=.5, b=.5, c=1
        # hub_raw: a=auth(b)+auth(c)=1.5, b=auth(c)=1, c=auth(a)=.5
        # hub: a=1, b=2/3, c=1/3
        e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
        got = _by_node(hits(e, n_iters=1))
        assert got["a"] == (pytest.approx(1.0), pytest.approx(0.5))
        assert got["b"] == (pytest.approx(2 / 3), pytest.approx(0.5))
        assert got["c"] == (pytest.approx(1 / 3), pytest.approx(1.0))

    def test_bipartite_fixed_point(self, spark):
        # pure hubs h1,h2 -> pure authorities a1,a2,a3: symmetric, so
        # every hub scores 1 and every authority scores 1, stably
        e = _edges(
            spark,
            [(h, a) for h in ("h1", "h2") for a in ("a1", "a2", "a3")],
        )
        got = _by_node(hits(e, n_iters=5))
        for h in ("h1", "h2"):
            assert got[h] == (pytest.approx(1.0), 0.0)
        for a in ("a1", "a2", "a3"):
            assert got[a] == (0.0, pytest.approx(1.0))

    def test_sink_has_zero_hub_source_zero_auth(self, spark):
        e = _edges(spark, [("src", "mid"), ("mid", "sink")])
        got = _by_node(hits(e, n_iters=3))
        assert got["src"][1] == 0.0  # nothing points at src
        assert got["sink"][0] == 0.0  # sink points at nothing
        assert max(v[0] for v in got.values()) == pytest.approx(1.0)
        assert max(v[1] for v in got.values()) == pytest.approx(1.0)

    def test_empty_edges(self, spark):
        out = hits(_edges(spark, []), n_iters=3)
        assert out.count() == 0
        assert out.columns == ["node", "hub", "auth"]

    def test_parallelism_independent(self, spark):
        pairs = [("n%d" % (i % 11), "n%d" % ((i * 7 + 3) % 11)) for i in range(40)]
        a = _by_node(hits(_edges(spark, pairs).repartition(1), n_iters=4))
        b = _by_node(hits(_edges(spark, pairs).repartition(16), n_iters=4))
        assert set(a) == set(b)
        for k in a:
            assert a[k][0] == pytest.approx(b[k][0], abs=1e-12)
            assert a[k][1] == pytest.approx(b[k][1], abs=1e-12)
