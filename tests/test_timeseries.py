"""EWMA closed form (ops/timeseries.py): recurrence equivalence,
exactness at alpha=1/2, multi-key isolation, guards.
"""

from __future__ import annotations

import pytest

from lmss_entity_extractor_spark.ops.timeseries import ewma


def _series(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(vals)], "k string, t int, x double"
    )


def _ref(vals, alpha):
    e = [float(vals[0])]
    for x in vals[1:]:
        e.append((1 - alpha) * e[-1] + alpha * x)
    return e


def _got(df):
    return [r["ewma"] for r in df.orderBy("k", "t").collect()]


def test_matches_recurrence_exactly_at_half(spark):
    vals = [10, 2, 8, 4, 16, 1, 7, 3]
    out = ewma(_series(spark, vals), "k", "t", "x", alpha=0.5)
    assert _got(out) == _ref(vals, 0.5)  # dyadic-exact: == not approx


def test_matches_recurrence_general_alpha(spark):
    vals = [5, 1, 9, 2, 6]
    out = ewma(_series(spark, vals), "k", "t", "x", alpha=0.3)
    for got, want in zip(_got(out), _ref(vals, 0.3)):
        assert got == pytest.approx(want, rel=1e-12)


def test_first_row_is_identity_and_keys_isolated(spark):
    a = _series(spark, [100, 0], key="a")
    b = _series(spark, [4], key="b")
    out = ewma(a.unionByName(b), "k", "t", "x")
    rows = {(r["k"], r["t"]): r["ewma"] for r in out.collect()}
    assert rows[("a", 0)] == 100.0 and rows[("a", 1)] == 50.0
    assert rows[("b", 0)] == 4.0  # b's series never sees a's values


def test_alpha_validated_and_length_guard_loud(spark):
    with pytest.raises(ValueError, match="alpha"):
        ewma(_series(spark, [1]), "k", "t", "x", alpha=1.0)
    long = _series(spark, range(30))
    with pytest.raises(Exception, match="max_len"):
        ewma(long, "k", "t", "x", max_len=10).collect()
