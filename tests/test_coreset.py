"""Farthest-point sampling / k-center coreset (L158)."""

import numpy as np
import pytest

from lmss_entity_extractor_spark.ops.coreset import (
    cover_assign,
    farthest_point_sample,
)


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<double>",
    )


def _fps_py(X, k):
    """Plain-python greedy reference."""
    picks = [0]  # lowest id
    radii = [0.0]
    for _ in range(1, k):
        best_d, best_i = -1.0, None
        for i in range(len(X)):
            d = min(float(((X[i] - X[p]) ** 2).sum()) for p in picks)
            if d > best_d:
                best_d, best_i = d, i
        if best_d == 0.0:
            break
        picks.append(best_i)
        radii.append(best_d)
    return picks, radii


class TestFps:
    def test_matches_python_greedy(self, spark):
        rng = np.random.RandomState(11)
        X = rng.randn(40, 6) * 3.0
        got = farthest_point_sample(_df(spark, X), k=5)
        ids, radii = _fps_py(X, 5)
        assert [p[1] for p in got] == ids
        for (_, _, r), er in zip(got, radii):
            assert r == pytest.approx(er, rel=1e-9)

    def test_picks_the_corners(self, spark):
        # square + center: FPS must pick corners before the center
        X = np.array(
            [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0], [5.0, 5.0]]
        )
        got = farthest_point_sample(_df(spark, X), k=4)
        assert {p[1] for p in got} == {0, 1, 2, 3}

    def test_duplicates_stop_early(self, spark):
        X = np.array([[1.0, 1.0], [1.0, 1.0], [1.0, 1.0]])
        got = farthest_point_sample(_df(spark, X), k=3)
        assert len(got) == 1  # everything duplicates the seed

    def test_empty_and_bad_k(self, spark):
        with pytest.raises(ValueError, match="empty"):
            farthest_point_sample(_df(spark, np.zeros((0, 2))), k=2)
        with pytest.raises(ValueError, match="k must be"):
            farthest_point_sample(_df(spark, np.ones((2, 2))), k=0)
        with pytest.raises(ValueError, match="k > 64"):
            farthest_point_sample(_df(spark, np.ones((2, 2))), k=100)

    def test_cover_assign_nearest(self, spark):
        X = np.array(
            [[0.0, 0.0], [10.0, 0.0], [1.0, 0.0], [9.0, 0.0], [4.0, 0.0]]
        )
        df = _df(spark, X)
        picks = farthest_point_sample(df, k=2)
        vecs = [(pid, X[pid].tolist()) for _, pid, _ in picks]
        got = {
            r["vec_id"]: r["center"]
            for r in cover_assign(df, vecs).select("vec_id", "center").collect()
        }
        assert got == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0}

    def test_cover_assign_zero_shuffle(self, spark):
        X = np.random.RandomState(0).randn(10, 4)
        df = _df(spark, X)
        picks = farthest_point_sample(df, k=2)
        vecs = [(pid, X[pid].tolist()) for _, pid, _ in picks]
        plan = (
            cover_assign(df, vecs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
