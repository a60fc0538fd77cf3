"""Euclidean k-means (L155)."""

import numpy as np
import pytest

from lmss_entity_extractor_spark.ops.kmeans import (
    assign_kmeans,
    train_kmeans,
    train_kmeans_local,
)


def _blobs():
    """Three well-separated 4-d blobs, deterministic."""
    rng = np.random.RandomState(7)
    centers = np.array(
        [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 0.0]]
    )
    X = np.vstack([c + rng.randn(20, 4) * 0.3 for c in centers])
    truth = np.repeat([0, 1, 2], 20)
    return X, truth


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<double>",
    )


class TestTrain:
    def test_separates_blobs(self):
        X, truth = _blobs()
        cents = train_kmeans_local(X, k=3, n_iters=5)
        # every trained center sits on exactly one blob center
        assigned = set()
        for _, c, _ in cents:
            d = np.linalg.norm(np.asarray(c) - np.array(
                [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]]), axis=1)
            j = int(np.argmin(d))
            assert d[j] < 1.0
            assigned.add(j)
        assert assigned == {0, 1, 2}

    def test_deterministic(self):
        X, _ = _blobs()
        a = train_kmeans_local(X.copy(), k=3, n_iters=5)
        b = train_kmeans_local(X.copy(), k=3, n_iters=5)
        assert a == b  # bit-identical, including half-norms

    def test_k_capped_at_n(self):
        X = np.array([[1.0, 0.0], [2.0, 0.0]])
        cents = train_kmeans_local(X, k=5, n_iters=3)
        assert len(cents) == 2

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            train_kmeans_local(np.zeros((0, 4)))


class TestAssign:
    def test_labels_match_numpy_argmin(self, spark):
        X, _ = _blobs()
        df = _df(spark, X)
        cents = train_kmeans(df, k=3, n_iters=5)
        got = {
            r["vec_id"]: r["cluster"]
            for r in assign_kmeans(df, cents).select("vec_id", "cluster").collect()
        }
        C = np.asarray([c for _, c, _ in cents])
        expected = np.argmin(
            ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        assert got == {i: int(e) for i, e in enumerate(expected)}

    def test_parallelism_invariant_training(self, spark):
        X, _ = _blobs()
        df = _df(spark, X)
        a = train_kmeans(df.repartition(1), k=3, n_iters=5)
        b = train_kmeans(df.repartition(16), k=3, n_iters=5)
        assert a == b

    def test_assignment_is_zero_shuffle(self, spark):
        X, _ = _blobs()
        df = _df(spark, X)
        cents = train_kmeans(df, k=3, n_iters=2)
        plan = (
            assign_kmeans(df, cents)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
