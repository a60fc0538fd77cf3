"""Mutual information (L152) + Jensen-Shannon divergence (L153)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.infotheory import (
    js_divergence,
    mutual_information,
)


def _mi_py(pairs):
    from collections import Counter

    n = len(pairs)
    cells, rows, cols = Counter(pairs), Counter(), Counter()
    for x, y in pairs:
        rows[x] += 1
        cols[y] += 1
    mi = sum(
        o / n * math.log(o * n / (rows[x] * cols[y]))
        for (x, y), o in cells.items()
    )
    hx = -sum(r / n * math.log(r / n) for r in rows.values())
    hy = -sum(c / n * math.log(c / n) for c in cols.values())
    return mi, hx, hy


def _jsd_py(xs, ys):
    from collections import Counter

    ca, cb = Counter(xs), Counter(ys)
    na, nb = len(xs), len(ys)
    s = 0.0
    for cat in set(ca) | set(cb):
        p, q = ca[cat] / na, cb[cat] / nb
        if p > 0:
            s += p * math.log(2 * p / (p + q))
        if q > 0:
            s += q * math.log(2 * q / (p + q))
    return s / 2


def _pairs_df(spark, pairs):
    return spark.createDataFrame(list(pairs), "x string, y string")


class TestMutualInformation:
    def test_matches_python(self, spark):
        pairs = [
            ("a", "p"), ("a", "p"), ("a", "q"), ("b", "q"),
            ("b", "q"), ("b", "p"), ("c", "r"), ("c", "r"),
        ]
        row = mutual_information(_pairs_df(spark, pairs), "x", "y").collect()[0]
        mi, hx, hy = _mi_py(pairs)
        assert row["n"] == 8
        assert row["mi"] == pytest.approx(mi, rel=1e-12)
        assert row["h_x"] == pytest.approx(hx, rel=1e-12)
        assert row["h_y"] == pytest.approx(hy, rel=1e-12)
        assert row["nmi"] == pytest.approx(mi / math.sqrt(hx * hy), rel=1e-12)

    def test_independent_zero(self, spark):
        # product distribution: every (x, y) combination equally often
        pairs = [(x, y) for x in "ab" for y in "pq" for _ in range(3)]
        row = mutual_information(_pairs_df(spark, pairs), "x", "y").collect()[0]
        assert row["mi"] == pytest.approx(0.0, abs=1e-15)

    def test_deterministic_equals_entropy(self, spark):
        # y = f(x) bijective: MI = H(X) = H(Y), NMI = 1
        pairs = [("a", "p")] * 2 + [("b", "q")] * 3 + [("c", "r")] * 5
        row = mutual_information(_pairs_df(spark, pairs), "x", "y").collect()[0]
        assert row["mi"] == pytest.approx(row["h_x"], rel=1e-12)
        assert row["nmi"] == pytest.approx(1.0, rel=1e-12)

    def test_constant_column_nmi_null(self, spark):
        pairs = [("a", "p"), ("b", "p"), ("c", "p")]
        row = mutual_information(_pairs_df(spark, pairs), "x", "y").collect()[0]
        assert row["mi"] == pytest.approx(0.0, abs=1e-15)
        assert row["nmi"] is None


def _samples_df(spark, xs, ys):
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    return spark.createDataFrame(rows, "s string, cat string")


class TestJsd:
    def test_matches_python(self, spark):
        xs = ["u", "u", "v", "w", "w", "w"]
        ys = ["u", "v", "v", "v", "x"]
        row = js_divergence(
            _samples_df(spark, xs, ys), "s", "a", "b", "cat"
        ).collect()[0]
        assert row["n_a"] == 6 and row["n_b"] == 5
        assert row["jsd"] == pytest.approx(_jsd_py(xs, ys), rel=1e-12)

    def test_identical_zero(self, spark):
        xs = ["u", "v", "v", "w"]
        row = js_divergence(
            _samples_df(spark, xs, xs), "s", "a", "b", "cat"
        ).collect()[0]
        assert row["jsd"] == pytest.approx(0.0, abs=1e-15)

    def test_disjoint_ln2(self, spark):
        row = js_divergence(
            _samples_df(spark, ["u", "u"], ["v", "w"]), "s", "a", "b", "cat"
        ).collect()[0]
        assert row["jsd"] == pytest.approx(math.log(2), rel=1e-12)

    def test_empty_sample_null(self, spark):
        row = js_divergence(
            _samples_df(spark, ["u"], []), "s", "a", "b", "cat"
        ).collect()[0]
        assert row["jsd"] is None
