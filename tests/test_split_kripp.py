"""Decision-stump best split (L237) and Krippendorff's alpha (L238)."""

import itertools

import pytest

from lmss_entity_extractor_spark.ops.encoding import best_split
from lmss_entity_extractor_spark.ops.evalmetrics import krippendorff_alpha


def _split_py(rows):
    """rows: (v, y). Returns (threshold, gain, n_left, pos_left)."""
    n = len(rows)
    p = sum(y for _, y in rows)

    def gini(nn, pp):
        q = pp / nn
        r = (nn - pp) / nn
        return 1.0 - q * q - r * r

    base = gini(n, p)
    best = None
    for v in sorted({v for v, _ in rows})[:-1]:
        nl = sum(1 for x, _ in rows if x <= v)
        pl = sum(y for x, y in rows if x <= v)
        g = (base - (nl / n) * gini(nl, pl)) - ((n - nl) / n) * gini(
            n - nl, p - pl
        )
        if best is None or g > best[1] or (g == best[1] and v < best[0]):
            best = (v, g, nl, pl)
    return base, best


class TestBestSplit:
    def _df(self, spark, rows, g="g1"):
        return spark.createDataFrame(
            [(g, float(v), int(y)) for v, y in rows],
            "g string, v double, y int",
        )

    def test_matches_python_reference(self, spark):
        rows = [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1),
                (2, 1), (5, 0), (7, 1), (8, 1)]
        out = best_split(self._df(spark, rows), ["g"], "v", "y").collect()[0]
        base, (v, g, nl, pl) = _split_py(rows)
        assert out["base_gini"] == base
        assert out["threshold"] == v and out["gain"] == g
        assert out["n_left"] == nl and out["pos_left"] == pl

    def test_perfect_separation(self, spark):
        rows = [(1, 0), (2, 0), (3, 0), (10, 1), (11, 1)]
        out = best_split(self._df(spark, rows), ["g"], "v", "y").collect()[0]
        assert out["threshold"] == 3.0
        assert out["gain"] == pytest.approx(out["base_gini"])

    def test_constant_feature_omitted(self, spark):
        rows = [(5, 0), (5, 1), (5, 1)]
        assert best_split(self._df(spark, rows), ["g"], "v", "y").count() == 0

    def test_tie_breaks_to_smallest_threshold(self, spark):
        # symmetric: splitting at 1 or at 2 gives identical gain
        rows = [(1, 0), (2, 1), (3, 0)]
        out = best_split(self._df(spark, rows), ["g"], "v", "y").collect()[0]
        ref = _split_py(rows)[1]
        assert out["threshold"] == ref[0]

    def test_non_binary_refused(self, spark):
        df = spark.createDataFrame([("g", 1.0, 2)], "g string, v double, y int")
        with pytest.raises(ValueError, match="non-binary"):
            best_split(df, ["g"], "v", "y")


def _kripp_pairs_py(units):
    """Independent pair-enumeration derivation of nominal alpha."""
    m = len(units[0])
    vals = [v for u in units for v in u]
    n = len(vals)
    do_pairs = sum(
        1
        for u in units
        for a, b in itertools.permutations(range(m), 2)
        if u[a] != u[b]
    )
    d_o = do_pairs / (n * (m - 1))
    de_pairs = sum(
        1 for a, b in itertools.permutations(range(n), 2) if vals[a] != vals[b]
    )
    d_e = de_pairs / (n * (n - 1))
    return 1 - d_o / d_e if d_e else None


class TestKrippendorff:
    def _df(self, spark, units):
        rows = [(i, str(v)) for i, u in enumerate(units) for v in u]
        return spark.createDataFrame(rows, "unit int, val string")

    def test_matches_pair_enumeration(self, spark):
        units = [["a", "a", "b"], ["b", "b", "b"], ["a", "c", "c"],
                 ["c", "c", "c"], ["a", "b", "a"]]
        out = krippendorff_alpha(self._df(spark, units), "unit", "val").collect()[0]
        assert out["alpha"] == pytest.approx(_kripp_pairs_py(units), rel=1e-12)
        assert out["n_units"] == 5 and out["m"] == 3 and out["n"] == 15

    def test_perfect_agreement_is_one(self, spark):
        units = [["a", "a"], ["b", "b"], ["c", "c"]]
        out = krippendorff_alpha(self._df(spark, units), "unit", "val").collect()[0]
        assert out["alpha"] == 1.0

    def test_single_category_null(self, spark):
        units = [["a", "a"], ["a", "a"]]
        out = krippendorff_alpha(self._df(spark, units), "unit", "val").collect()[0]
        assert out["alpha"] is None

    def test_unbalanced_refused(self, spark):
        df = spark.createDataFrame(
            [(0, "a"), (0, "b"), (1, "a")], "unit int, val string"
        )
        with pytest.raises(ValueError, match="unbalanced"):
            krippendorff_alpha(df, "unit", "val")

    def test_single_rating_refused(self, spark):
        df = spark.createDataFrame(
            [(0, "a"), (1, "b")], "unit int, val string"
        )
        with pytest.raises(ValueError, match="m must be"):
            krippendorff_alpha(df, "unit", "val")
