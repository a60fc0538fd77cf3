"""Robust MAD anomaly flags (L137) + LOO target encoding (L138)."""

import pytest

from lmss_entity_extractor_spark.ops.anomaly import mad_outliers
from lmss_entity_extractor_spark.ops.encoding import target_encode_loo


class TestMadOutliers:
    def test_hand_computed_flags(self, spark):
        # group a: values 1..7 plus a wild 100. med of
        # [1,2,3,4,5,6,7,100] = 4 (disc, lower), devs = [3,2,1,0,1,2,3,96],
        # mad = 2 -> threshold 6 -> only 100 flagged
        rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 100]]
        df = spark.createDataFrame(rows, "g string, v double")
        out = mad_outliers(df, ["g"], "v", k=3.0).collect()
        flagged = sorted(r["v"] for r in out if r["is_outlier"])
        assert flagged == [100.0]
        r0 = out[0]
        assert r0["med"] == 4.0 and r0["mad"] == 2.0

    def test_tight_group_flags_any_deviation(self, spark):
        # constant group: mad = 0 -> any dev > 0 is an outlier
        rows = [("c", 5.0)] * 6 + [("c", 5.001)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = mad_outliers(df, ["g"], "v").collect()
        assert sorted(r["v"] for r in out if r["is_outlier"]) == [5.001]

    def test_groups_independent(self, spark):
        rows = [("a", float(v)) for v in [1, 1, 1, 50]] + [
            ("b", float(v)) for v in [50, 50, 50, 50]
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = mad_outliers(df, ["g"], "v").collect()
        assert {(r["g"], r["v"]) for r in out if r["is_outlier"]} == {("a", 50.0)}

    def test_median_is_order_statistic_not_interpolated(self, spark):
        # even count: percentile_disc picks the LOWER middle VALUE
        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 10.0), ("g", 11.0)], "g string, v double"
        )
        out = mad_outliers(df, ["g"], "v").collect()
        assert out[0]["med"] == 2.0  # not 6.0

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0), ("g", None), ("g", 3.0)], "g string, v double"
        )
        out = mad_outliers(df, ["g"], "v").collect()
        assert len(out) == 2 and all(r["v"] is not None for r in out)


class TestTargetEncoding:
    def test_hand_computed_loo(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 100.0)],
            "id long, c string, y double",
        )
        out = {r["id"]: r["te"] for r in target_encode_loo(df, "c", "y").collect()}
        assert out[1] == pytest.approx((20 + 30) / 2)
        assert out[2] == pytest.approx((10 + 30) / 2)
        assert out[3] == pytest.approx((10 + 20) / 2)
        # singleton category falls back to the GLOBAL mean
        assert out[4] == pytest.approx((10 + 20 + 30 + 100) / 4)

    def test_no_self_leakage(self, spark):
        # each row's own y must not influence its encoding: two rows with
        # identical category but different y get different encodings
        df = spark.createDataFrame(
            [(1, "a", 0.0), (2, "a", 100.0), (3, "a", 100.0)],
            "id long, c string, y double",
        )
        out = {r["id"]: r["te"] for r in target_encode_loo(df, "c", "y").collect()}
        assert out[1] == pytest.approx(100.0)
        assert out[2] == out[3] == pytest.approx(50.0)

    def test_null_target_and_category(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", None), (3, None, 5.0), (4, "a", 3.0)],
            "id long, c string, y double",
        )
        out = {r["id"]: r["te"] for r in target_encode_loo(df, "c", "y").collect()}
        assert out[2] is None and out[3] is None
        # stats exclude the null rows: row 1 sees only row 4
        assert out[1] == pytest.approx(3.0)

    def test_parallelism_invariance_bitwise(self, spark):
        rows = [
            (i, "c%d" % (i % 5), (i * 7) % 13 + 0.25 * (i % 2) * 2)
            for i in range(100)
        ]
        df = spark.createDataFrame(rows, "id long, c string, y double")
        a = sorted((r["id"], r["te"]) for r in target_encode_loo(df, "c", "y").collect())
        b = sorted(
            (r["id"], r["te"])
            for r in target_encode_loo(df.repartition(17), "c", "y").collect()
        )
        assert a == b  # exact, not approx: decimal sums pin the doubles
