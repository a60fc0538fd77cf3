"""Simplified silhouette (L156) + Adjusted Rand Index (L157)."""

import math

import numpy as np
import pytest

from lmss_entity_extractor_spark.ops.clustereval import (
    adjusted_rand_index,
    silhouette_simplified,
)
from lmss_entity_extractor_spark.ops.kmeans import assign_kmeans, train_kmeans


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<double>",
    )


class TestSilhouette:
    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(3)
        X = np.vstack(
            [
                [5.0, 0.0] + rng.randn(15, 2) * 0.2,
                [0.0, 5.0] + rng.randn(15, 2) * 0.2,
            ]
        )
        df = _df(spark, X)
        cents = train_kmeans(df, k=2, n_iters=5)
        rows = (
            silhouette_simplified(assign_kmeans(df, cents), cents)
            .select("vec_id", "cluster", "a", "b", "silhouette")
            .collect()
        )
        C = np.asarray([c for _, c, _ in cents])
        for r in rows:
            d = np.sqrt(((X[r["vec_id"]] - C) ** 2).sum(axis=1))
            a = d[r["cluster"]]
            b = min(d[j] for j in range(len(C)) if j != r["cluster"])
            assert r["a"] == pytest.approx(a, rel=1e-12)
            assert r["b"] == pytest.approx(b, rel=1e-12)
            assert r["silhouette"] == pytest.approx(
                (b - a) / max(a, b), rel=1e-12
            )
            assert r["silhouette"] > 0.8  # well-separated blobs

    def test_point_on_centroid_s_is_one(self, spark):
        # two singleton-ish clusters: points AT the centroids -> a=0, s=1
        X = np.array([[0.0, 0.0], [10.0, 0.0]])
        df = _df(spark, X)
        cents = train_kmeans(df, k=2, n_iters=3)
        rows = silhouette_simplified(assign_kmeans(df, cents), cents).collect()
        for r in rows:
            assert r["a"] == 0.0 and r["silhouette"] == 1.0


def _labels_df(spark, a, b):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(zip(a, b))],
        "id bigint, la int, lb int",
    )


def _ari_py(a, b):
    from collections import Counter

    cells = Counter(zip(a, b))
    ra, cb = Counter(a), Counter(b)
    n = len(a)
    p_ij = sum(o * (o - 1) for o in cells.values())
    p_a = sum(o * (o - 1) for o in ra.values())
    p_b = sum(o * (o - 1) for o in cb.values())
    n2 = n * (n - 1)
    num = 2 * (n2 * p_ij - p_a * p_b)
    den = n2 * (p_a + p_b) - 2 * p_a * p_b
    return num / den


class TestAri:
    def test_identical_is_one(self, spark):
        a = [0, 0, 1, 1, 2, 2, 2]
        row = adjusted_rand_index(_labels_df(spark, a, a), "la", "lb").collect()[0]
        assert row["ari"] == 1.0

    def test_permuted_labels_still_one(self, spark):
        a = [0, 0, 1, 1, 2, 2]
        b = [5, 5, 9, 9, 7, 7]  # same partition, renamed
        row = adjusted_rand_index(_labels_df(spark, a, b), "la", "lb").collect()[0]
        assert row["ari"] == 1.0

    def test_matches_python(self, spark):
        a = [0, 0, 0, 1, 1, 1, 2, 2, 2, 2]
        b = [0, 0, 1, 1, 1, 2, 2, 2, 0, 2]
        row = adjusted_rand_index(_labels_df(spark, a, b), "la", "lb").collect()[0]
        assert row["n"] == 10
        assert row["ari"] == pytest.approx(_ari_py(a, b), rel=1e-15)

    def test_single_cluster_both_null(self, spark):
        a = [0, 0, 0]
        row = adjusted_rand_index(_labels_df(spark, a, a), "la", "lb").collect()[0]
        assert row["ari"] is None

    def test_independent_near_zero(self, spark):
        # balanced checkerboard: agreement is chance-level; ARI sits
        # just below 0 at finite n — match the python reference exactly
        a = [i % 2 for i in range(40)]
        b = [(i // 2) % 2 for i in range(40)]
        row = adjusted_rand_index(_labels_df(spark, a, b), "la", "lb").collect()[0]
        assert row["ari"] == pytest.approx(_ari_py(a, b), rel=1e-15)
        assert abs(row["ari"]) < 0.05
