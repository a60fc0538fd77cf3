"""Mahalanobis 2D (L335) and balanced two-way ANOVA (L336)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.anomaly import mahalanobis_2d
from lmss_entity_extractor_spark.ops.stattests import (
    twoway_anova_balanced,
)


def _md2_py(pts, px, py_):
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    vx = sum((x - mx) ** 2 for x, _ in pts) / (n - 1)
    vy = sum((y - my) ** 2 for _, y in pts) / (n - 1)
    cv = sum((x - mx) * (y - my) for x, y in pts) / (n - 1)
    det = vx * vy - cv * cv
    dx, dy = px - mx, py_ - my
    return (vy * dx * dx - 2 * cv * dx * dy + vx * dy * dy) / det


class TestMahalanobis:
    def _df(self, spark, pts, g="g1"):
        return spark.createDataFrame(
            [(g, i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
            "g string, id long, x double, y double",
        )

    def test_matches_python_reference(self, spark):
        pts = [(1, 2), (2, 4.2), (3, 5.8), (4, 8.1), (5, 10.2),
               (6, 11.9), (2.5, 5.1), (3.5, 7.2), (8, 4)]
        rows = mahalanobis_2d(
            self._df(spark, pts), ["g"], "id", "x", "y"
        ).collect()
        for r in rows:
            assert r["md2"] == pytest.approx(
                _md2_py(pts, r["x"], r["y"]), rel=1e-9
            )

    def test_joint_outlier_detected(self, spark):
        # (8, 4) breaks the strong x-y correlation while being
        # unremarkable on each axis
        pts = [(1, 2), (2, 4.2), (3, 5.8), (4, 8.1), (5, 10.2),
               (6, 11.9), (2.5, 5.1), (3.5, 7.2), (8, 4)]
        rows = {
            r["id"]: r
            for r in mahalanobis_2d(
                self._df(spark, pts), ["g"], "id", "x", "y",
                threshold=5.99,  # chi2_2 at 5%; the outlier inflates
                # the covariance it is judged against (masking)
            ).collect()
        }
        assert rows[8]["is_outlier"] is True
        assert sum(1 for r in rows.values() if r["is_outlier"]) == 1

    def test_constant_margin_null(self, spark):
        pts = [(1, 5), (2, 5), (3, 5)]
        rows = mahalanobis_2d(
            self._df(spark, pts), ["g"], "id", "x", "y"
        ).collect()
        assert all(r["md2"] is None for r in rows)


def _twoway_py(cells):
    """cells: {(a, b): [values]} — balanced."""
    import itertools

    avals = sorted({a for a, _ in cells})
    bvals = sorted({b for _, b in cells})
    m = len(next(iter(cells.values())))
    r, c = len(avals), len(bvals)
    n = r * c * m
    allv = [v for vs in cells.values() for v in vs]
    g = sum(allv) / n
    abar = {
        a: sum(v for (aa, _), vs in cells.items() if aa == a
               for v in vs) / (c * m)
        for a in avals
    }
    bbar = {
        b: sum(v for (_, bb), vs in cells.items() if bb == b
               for v in vs) / (r * m)
        for b in bvals
    }
    cbar = {k: sum(vs) / m for k, vs in cells.items()}
    ss_a = m * c * sum((abar[a] - g) ** 2 for a in avals)
    ss_b = m * r * sum((bbar[b] - g) ** 2 for b in bvals)
    ss_ab = m * sum(
        (cbar[(a, b)] - abar[a] - bbar[b] + g) ** 2
        for a, b in itertools.product(avals, bvals)
    )
    ss_e = sum(
        (v - cbar[k]) ** 2 for k, vs in cells.items() for v in vs
    )
    df_a, df_b = r - 1, c - 1
    df_ab, df_e = df_a * df_b, n - r * c
    mse = ss_e / df_e
    return (
        ss_a / df_a / mse, ss_b / df_b / mse, ss_ab / df_ab / mse
    )


class TestTwoWay:
    CELLS = {
        ("a1", "b1"): [10, 11, 9.5], ("a1", "b2"): [14, 15, 13.5],
        ("a2", "b1"): [12, 13, 11.5], ("a2", "b2"): [22, 23, 21.5],
    }

    def _df(self, spark, cells, g="g1"):
        rows = [
            (g, a, b, float(v))
            for (a, b), vs in cells.items()
            for v in vs
        ]
        return spark.createDataFrame(
            rows, "g string, a string, b string, x double"
        )

    def test_matches_python_reference(self, spark):
        row = twoway_anova_balanced(
            self._df(spark, self.CELLS), ["g"], "a", "b", "x"
        ).collect()[0]
        fa, fb, fab = _twoway_py(self.CELLS)
        assert row["f_a"] == pytest.approx(fa, rel=1e-9)
        assert row["f_b"] == pytest.approx(fb, rel=1e-9)
        assert row["f_ab"] == pytest.approx(fab, rel=1e-9)
        assert (row["df_a"], row["df_b"], row["df_ab"],
                row["df_e"]) == (1.0, 1.0, 1.0, 8.0)

    def test_interaction_detected(self, spark):
        # a2xb2 cell breaks additivity strongly -> big F_ab
        row = twoway_anova_balanced(
            self._df(spark, self.CELLS), ["g"], "a", "b", "x"
        ).collect()[0]
        assert row["f_ab"] > 5.32  # F(1,8) 5%

    def test_unbalanced_refused(self, spark):
        cells = dict(self.CELLS)
        cells[("a1", "b1")] = [10, 11]
        with pytest.raises(ValueError, match="unequal cell sizes"):
            twoway_anova_balanced(
                self._df(spark, cells), ["g"], "a", "b", "x"
            )
