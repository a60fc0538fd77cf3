"""HyperBall neighborhood function / harmonic centrality (L111)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.hyperball import harmonic_centrality, hyperball


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


@pytest.fixture(scope="module")
def chain(spark):
    # a -> b -> c -> d (directed chain)
    return _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])


class TestHyperball:
    def test_chain_ball_sizes_exact(self, spark, chain):
        got = {
            (r["node"], r["t"]): r["ball_est"]
            for r in hyperball(chain, max_t=3).collect()
        }
        # B(a,t) grows one hop per radius; d exhausts at itself
        want = {
            ("a", 0): 1, ("a", 1): 2, ("a", 2): 3, ("a", 3): 4,
            ("b", 0): 1, ("b", 1): 2, ("b", 2): 3, ("b", 3): 3,
            ("c", 0): 1, ("c", 1): 2, ("c", 2): 2, ("c", 3): 2,
            ("d", 0): 1, ("d", 1): 1, ("d", 2): 1, ("d", 3): 1,
        }
        assert got == want

    def test_cycle_saturates(self, spark):
        ring = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        got = {
            (r["node"], r["t"]): r["ball_est"]
            for r in hyperball(ring, max_t=4).collect()
        }
        for n in "abc":
            assert got[(n, 2)] == 3 and got[(n, 4)] == 3  # saturated at diameter

    def test_duplicate_edges_and_self_loops_idempotent(self, spark):
        e = _edges(
            spark,
            [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")],
        )
        got = {(r["node"], r["t"]): r["ball_est"] for r in hyperball(e, 2).collect()}
        assert got[("a", 1)] == 2 and got[("a", 2)] == 3

    def test_sparse_regime_exact_at_test_scale(self, spark):
        # star: hub -> 300 leaves; |B(hub,1)| = 301 must be EXACT —
        # pins the datasketches sparse-mode boundary the contract
        # query's integer-equality oracle relies on
        leaves = [("hub", f"leaf{i}") for i in range(300)]
        got = {
            (r["node"], r["t"]): r["ball_est"]
            for r in hyperball(_edges(spark, leaves), 1).collect()
        }
        assert got[("hub", 1)] == 301

    def test_validation(self, spark, chain):
        with pytest.raises(ValueError, match="max_t"):
            hyperball(chain, 0)
        with pytest.raises(ValueError, match="lg_k"):
            hyperball(chain, 2, lg_k=2)
        with pytest.raises(ValueError, match="must have column"):
            hyperball(chain.withColumnRenamed("dst", "to"), 2)


class TestHarmonic:
    def test_chain_harmonic(self, spark, chain):
        got = {r["node"]: r["harmonic"] for r in harmonic_centrality(chain, 3).collect()}
        # a reaches b,c,d at distances 1,2,3
        assert got["a"] == pytest.approx(1 + 0.5 + 1 / 3, abs=1e-6)
        assert got["b"] == pytest.approx(1 + 0.5, abs=1e-6)
        assert got["c"] == pytest.approx(1.0, abs=1e-6)
        assert got["d"] == 0.0

    def test_truncation(self, spark, chain):
        got = {r["node"]: r["harmonic"] for r in harmonic_centrality(chain, 1).collect()}
        assert got["a"] == 1.0  # c, d beyond the horizon contribute 0


class TestNeighborhoodFunction:
    def test_chain_profile(self, spark, chain):
        from lmss_entity_extractor_spark.graph.hyperball import neighborhood_function

        got = {r["t"]: (r["n_pairs"], r["frac"]) for r in
               neighborhood_function(chain, 3).collect()}
        # chain a->b->c->d: N(0)=4, N(1)=4+3, N(2)=4+3+2, N(3)=4+3+2+1
        assert got[0] == (4, pytest.approx(0.4, abs=1e-6))
        assert got[1] == (7, pytest.approx(0.7, abs=1e-6))
        assert got[2] == (9, pytest.approx(0.9, abs=1e-6))
        assert got[3] == (10, 1.0)

    def test_effective_diameter_interpolated(self, spark, chain):
        from lmss_entity_extractor_spark.graph.hyperball import effective_diameter

        # q=0.9 hits exactly at N(2)=9 -> boundary t where the target is met
        d = effective_diameter(chain, 3, q=0.9).collect()[0]["effective_diameter"]
        assert d == pytest.approx(2.0, abs=1e-6)
        # q=0.95 -> target 9.5 sits halfway inside the (2, 3] step
        d2 = effective_diameter(chain, 3, q=0.95).collect()[0]["effective_diameter"]
        assert d2 == pytest.approx(2.5, abs=1e-6)

    def test_effective_diameter_validation(self, spark, chain):
        from lmss_entity_extractor_spark.graph.hyperball import effective_diameter

        with pytest.raises(ValueError, match="q must be"):
            effective_diameter(chain, 3, q=0.0)
