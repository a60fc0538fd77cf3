"""PCA / whitening (ops/pca.py, L80): moments vs direct numpy,
projection correctness, whitened covariance ~ I, sign pinning, and
cross-parallelism drift bounded."""

import numpy as np
import pytest

from lmss_entity_extractor_spark.ops.pca import (
    collect_moments,
    pca_fit,
    pca_project,
)


def _vecs(seed=7, n=200, d=6):
    rng = np.random.RandomState(seed)
    # anisotropic: two dominant directions
    base = rng.randn(n, d) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    return (base + rng.randn(d) * 2).astype(np.float32)


def _df(spark, x, parts=4):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


class TestMoments:
    def test_matches_numpy(self, spark):
        x = _vecs()
        n, mean, cov = collect_moments(_df(spark, x))
        x64 = x.astype(np.float64)
        assert n == len(x)
        np.testing.assert_allclose(mean, x64.mean(axis=0), rtol=1e-12)
        np.testing.assert_allclose(
            cov, np.cov(x64, rowvar=False, bias=True), rtol=1e-9, atol=1e-12
        )

    def test_parallelism_drift_bounded(self, spark):
        x = _vecs()
        _, m1, c1 = collect_moments(_df(spark, x, parts=1))
        _, m8, c8 = collect_moments(_df(spark, x, parts=8))
        np.testing.assert_allclose(m1, m8, rtol=1e-12)
        np.testing.assert_allclose(c1, c8, rtol=1e-9, atol=1e-13)

    def test_null_vector_is_loud(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, None)], "vec_id long, embedding array<float>"
        )
        with pytest.raises(Exception, match="NULL"):
            collect_moments(df)


class TestFitProject:
    def test_projection_matches_numpy(self, spark):
        x = _vecs()
        df = _df(spark, x)
        model = pca_fit(df, k=3)
        out = (
            pca_project(df, model)
            .orderBy("vec_id")
            .select("pca")
            .collect()
        )
        got = np.array([r["pca"] for r in out])
        want = (x.astype(np.float64) - model.mean) @ model.components.T
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)

    def test_whitened_covariance_is_identity(self, spark):
        x = _vecs(n=500)
        df = _df(spark, x)
        model = pca_fit(df, k=4)
        out = pca_project(df, model, whiten=True).select("pca").collect()
        y = np.array([r["pca"] for r in out])
        cov = np.cov(y, rowvar=False, bias=True)
        np.testing.assert_allclose(cov, np.eye(4), atol=1e-6)

    def test_sign_pinned(self, spark):
        x = _vecs()
        model = pca_fit(_df(spark, x), k=3)
        for comp in model.components:
            assert comp[np.abs(comp).argmax()] > 0

    def test_eigvals_descending_capture_variance(self, spark):
        x = _vecs()
        model = pca_fit(_df(spark, x), k=6)
        assert all(
            model.eigvals[i] >= model.eigvals[i + 1] - 1e-12 for i in range(5)
        )
        # top component aligns with the dominant axis (scale 5.0 on dim 0)
        assert np.abs(model.components[0][0]) > 0.9

    def test_k_out_of_range_rejected(self, spark):
        with pytest.raises(ValueError, match="out of range"):
            pca_fit(_df(spark, _vecs()), k=7)
