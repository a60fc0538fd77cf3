"""Rich-club (L168), k-anonymity audit (L169), random projection (L170)."""

import math

import numpy as np
import pytest

from lmss_entity_extractor_spark.graph.richclub import rich_club
from lmss_entity_extractor_spark.ops.privacy import (
    k_anonymity_audit,
    k_anonymity_summary,
)
from lmss_entity_extractor_spark.ops.randproj import jl_sign_matrix, rp_project


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


class TestRichClub:
    def test_hub_core(self, spark):
        # clique {h1,h2,h3} + a spoke on each hub: deg(h)=4, deg(spoke)=1
        pairs = [
            ("h1", "h2"), ("h2", "h3"), ("h1", "h3"),
            ("h1", "s1"), ("h1", "s2"),
            ("h2", "s3"), ("h2", "s4"),
            ("h3", "s5"), ("h3", "s6"),
        ]
        out = {r["k"]: r for r in rich_club(_edges(spark, pairs)).collect()}
        # k=1: all hubs (deg 4) qualify, 3 nodes, 3 intra edges -> phi=1
        assert out[1]["n_k"] == 3 and out[1]["e_k"] == 3
        assert out[1]["phi"] == 1.0
        # k=4: nobody above degree 4
        assert out[4]["n_k"] == 0 and out[4]["phi"] is None

    def test_star_no_rich_club(self, spark):
        pairs = [("h", f"s{i}") for i in range(4)]
        out = {r["k"]: r for r in rich_club(_edges(spark, pairs)).collect()}
        assert out[1]["n_k"] == 1 and out[1]["e_k"] == 0
        assert out[1]["phi"] is None  # a single rich node has no club


class TestKAnonymity:
    def _df(self, spark):
        rows = [
            ("z1", "m", 100.0), ("z1", "m", 200.0), ("z1", "m", 100.0),
            ("z2", "f", 300.0),
        ]
        return spark.createDataFrame(rows, "zip string, g string, bal double")

    def test_audit_rows(self, spark):
        out = {
            (r["zip"], r["g"]): r
            for r in k_anonymity_audit(
                self._df(spark), ["zip", "g"], "bal", k_min=3, l_min=2
            ).collect()
        }
        a = out[("z1", "m")]
        assert (a["n"], a["l"]) == (3, 2)
        assert a["ok_k"] is True and a["ok_l"] is True
        b = out[("z2", "f")]
        assert b["ok_k"] is False  # singleton group re-identifiable

    def test_summary(self, spark):
        r = k_anonymity_summary(
            self._df(spark), ["zip", "g"], "bal", k_min=3, l_min=2
        ).collect()[0]
        assert r["n_groups"] == 2 and r["min_k"] == 1
        assert r["n_below_k"] == 1 and r["n_rows_at_risk"] == 1

    def test_empty_quasi_refused(self, spark):
        with pytest.raises(ValueError, match="non-empty"):
            k_anonymity_audit(self._df(spark), [], "bal")


class TestRandomProjection:
    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(5)
        X = rng.randn(20, 16)
        df = spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(X)],
            "vec_id bigint, embedding array<double>",
        )
        out = rp_project(df, dim=16, out_dim=4, seed=3)
        S = np.asarray(jl_sign_matrix(16, 4, 3))
        expected = X @ S.T * math.sqrt(3.0 / 4)
        got = {r["vec_id"]: r["rp"] for r in out.select("vec_id", "rp").collect()}
        for i in range(20):
            assert got[i] == pytest.approx(list(expected[i]), rel=1e-12)

    def test_sign_matrix_deterministic_and_sparse(self):
        a = jl_sign_matrix(64, 8, 7)
        b = jl_sign_matrix(64, 8, 7)
        assert a == b
        flat = [v for row in a for v in row]
        zeros = flat.count(0.0) / len(flat)
        assert 0.5 < zeros < 0.8  # ~2/3 sparsity
        assert jl_sign_matrix(64, 8, 8) != a  # seed changes the matrix

    def test_distance_preserved_in_expectation(self, spark):
        rng = np.random.RandomState(9)
        X = rng.randn(2, 64)
        df = spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(X)],
            "vec_id bigint, embedding array<double>",
        )
        got = {
            r["vec_id"]: np.asarray(r["rp"])
            for r in rp_project(df, 64, 32, seed=1).select("vec_id", "rp").collect()
        }
        orig = float(np.linalg.norm(X[0] - X[1]))
        proj = float(np.linalg.norm(got[0] - got[1]))
        assert proj == pytest.approx(orig, rel=0.5)  # JL: coarse at d_out=32

    def test_zero_shuffle(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0] * 8)], "vec_id bigint, embedding array<double>"
        )
        plan = (
            rp_project(df, 8, 2)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
