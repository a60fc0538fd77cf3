"""CUSUM changepoint detection (L154)."""

import pytest

from lmss_entity_extractor_spark.ops.changepoint import cusum


def _cusum_py(xs, target, slack):
    """The textbook recurrence, both sides."""
    s = t = 0.0
    hi, lo = [], []
    for x in xs:
        s = max(0.0, s + (x - target - slack))
        t = max(0.0, t + (target - x - slack))
        hi.append(s)
        lo.append(t)
    return hi, lo


def _series(spark, xs, grp="g"):
    return spark.createDataFrame(
        [(grp, i, float(v)) for i, v in enumerate(xs)],
        "g string, t int, v double",
    )


class TestCusum:
    def test_matches_recurrence(self, spark):
        xs = [50.0, 52.0, 61.0, 58.0, 40.0, 39.5, 55.0, 70.25, 71.0, 30.0]
        rows = (
            cusum(_series(spark, xs), ["g"], ["t"], "v", "50.00", "2.00", "10.00")
            .orderBy("t")
            .collect()
        )
        hi, lo = _cusum_py(xs, 50.0, 2.0)
        for r, eh, el in zip(rows, hi, lo):
            assert r["s_hi"] == pytest.approx(eh, abs=0)
            assert r["s_lo"] == pytest.approx(el, abs=0)

    def test_alarm_fires_after_shift(self, spark):
        xs = [50.0] * 5 + [60.0] * 5  # upward shift at t=5
        rows = (
            cusum(_series(spark, xs), ["g"], ["t"], "v", "50.00", "1.00", "20.00")
            .orderBy("t")
            .collect()
        )
        assert not any(r["alarm_hi"] for r in rows[:5])
        assert rows[-1]["alarm_hi"] is True  # 3 post-shift rows exceed 20
        assert not any(r["alarm_lo"] for r in rows)

    def test_in_control_stays_zero(self, spark):
        xs = [50.0, 50.5, 49.5, 50.0]
        rows = (
            cusum(_series(spark, xs), ["g"], ["t"], "v", "50.00", "1.00", "5.00")
            .orderBy("t")
            .collect()
        )
        assert all(r["s_hi"] == 0.0 and r["s_lo"] == 0.0 for r in rows)

    def test_resets_after_excursion(self, spark):
        # excursion then deep return: statistic must clamp back to 0
        xs = [60.0, 60.0, 10.0, 50.0]
        rows = (
            cusum(_series(spark, xs), ["g"], ["t"], "v", "50.00", "2.00", "99.00")
            .orderBy("t")
            .collect()
        )
        hi, _ = _cusum_py(xs, 50.0, 2.0)
        assert [r["s_hi"] for r in rows] == hi
        assert rows[3]["s_hi"] == 0.0

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 0, 1.0), ("g", 1, None)], "g string, t int, v double"
        )
        with pytest.raises(ValueError, match="NULL"):
            cusum(df, ["g"], ["t"], "v", "50.00", "1.00", "5.00").collect()

    def test_parallelism_invariant(self, spark):
        xs = [float((i * 31) % 97) for i in range(200)]
        df = _series(spark, xs)
        a = (
            cusum(df.repartition(1), ["g"], ["t"], "v", "48.00", "3.00", "60.00")
            .orderBy("t")
            .collect()
        )
        b = (
            cusum(df.repartition(16), ["g"], ["t"], "v", "48.00", "3.00", "60.00")
            .orderBy("t")
            .collect()
        )
        assert [(r["s_hi"], r["s_lo"]) for r in a] == [
            (r["s_hi"], r["s_lo"]) for r in b
        ]
