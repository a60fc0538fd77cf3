"""Goodman-Kruskal lambda (L259) and Theil's U (L260)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.infotheory import (
    gk_lambda,
    mutual_information,
    theils_u,
)


def _lambda_py(pairs):
    from collections import Counter

    cxy = Counter(pairs)
    cy = Counter(y for _, y in pairs)
    cx = Counter(x for x, _ in pairs)
    n = len(pairs)
    sum_max_y = sum(
        max(o for (xx, _), o in cxy.items() if xx == x)
        for x in cx
    )
    sum_max_x = sum(
        max(o for (_, yy), o in cxy.items() if yy == y)
        for y in cy
    )
    lyx = (sum_max_y - max(cy.values())) / (n - max(cy.values())) \
        if n > max(cy.values()) else None
    lxy = (sum_max_x - max(cx.values())) / (n - max(cx.values())) \
        if n > max(cx.values()) else None
    return lyx, lxy


class TestGkLambda:
    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [(str(x), str(y)) for x, y in pairs], "x string, y string"
        )

    def test_matches_python_reference(self, spark):
        pairs = [("a", 1)] * 6 + [("a", 2)] * 2 + [("b", 2)] * 5 \
            + [("b", 1)] * 1 + [("c", 3)] * 4
        out = gk_lambda(self._df(spark, pairs), "x", "y").collect()[0]
        lyx, lxy = _lambda_py(pairs)
        assert out["lambda_yx"] == pytest.approx(lyx, rel=1e-12)
        assert out["lambda_xy"] == pytest.approx(lxy, rel=1e-12)

    def test_perfect_prediction_is_one(self, spark):
        pairs = [("a", 1)] * 5 + [("b", 2)] * 5 + [("c", 3)] * 2
        out = gk_lambda(self._df(spark, pairs), "x", "y").collect()[0]
        assert out["lambda_yx"] == 1.0

    def test_independent_zero(self, spark):
        # knowing x never changes the modal y
        pairs = [(x, y) for x in "ab" for y in (1, 1, 2)]
        out = gk_lambda(self._df(spark, pairs), "x", "y").collect()[0]
        assert out["lambda_yx"] == 0.0

    def test_constant_column_null(self, spark):
        pairs = [("a", 1), ("b", 1), ("c", 1)]
        out = gk_lambda(self._df(spark, pairs), "x", "y").collect()[0]
        assert out["lambda_yx"] is None
        assert out["lambda_xy"] == 0.0


class TestTheilsU:
    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [(str(x), str(y)) for x, y in pairs], "x string, y string"
        )

    def test_identity_with_mi(self, spark):
        pairs = [("a", 1)] * 6 + [("a", 2)] * 4 + [("b", 1)] * 2 \
            + [("b", 2)] * 8
        df = self._df(spark, pairs)
        u = theils_u(df, "x", "y").collect()[0]
        m = mutual_information(df, "x", "y").collect()[0]
        assert u["u_yx"] == m["mi"] / m["h_y"]
        assert u["u_xy"] == m["mi"] / m["h_x"]

    def test_perfect_dependence_is_one(self, spark):
        pairs = [("a", 1)] * 5 + [("b", 2)] * 5
        out = theils_u(self._df(spark, pairs), "x", "y").collect()[0]
        assert out["u_yx"] == pytest.approx(1.0)

    def test_constant_side_null(self, spark):
        pairs = [("a", 1), ("b", 1)]
        out = theils_u(self._df(spark, pairs), "x", "y").collect()[0]
        assert out["u_yx"] is None
