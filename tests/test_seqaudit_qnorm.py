"""Sequence-integrity audit (L345) and quantile normalization (L346)."""

import pytest

from lmss_entity_extractor_spark.ops.integrity import sequence_audit
from lmss_entity_extractor_spark.ops.scaling import quantile_normalize


class TestSequenceAudit:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k string, idx int")

    def test_clean_run_contiguous(self, spark):
        rows = [("a", i) for i in range(5)]
        r = sequence_audit(self._df(spark, rows), ["k"], "idx").collect()[0]
        assert (r["n"], r["n_dupes"], r["n_gaps"]) == (5, 0, 0)
        assert r["contiguous"] is True

    def test_gap_and_dupe_counts(self, spark):
        rows = [("a", 0), ("a", 1), ("a", 1), ("a", 4)]
        r = sequence_audit(self._df(spark, rows), ["k"], "idx").collect()[0]
        assert r["n_dupes"] == 1          # idx 1 repeated
        assert r["n_gaps"] == 2           # 2 and 3 missing
        assert r["contiguous"] is False

    def test_wrong_base(self, spark):
        rows = [("a", 1), ("a", 2), ("a", 3)]
        r = sequence_audit(
            self._df(spark, rows), ["k"], "idx", base=0
        ).collect()[0]
        assert r["n_gaps"] == 0 and r["n_dupes"] == 0
        assert r["contiguous"] is False   # starts at 1, base is 0
        r1 = sequence_audit(
            self._df(spark, rows), ["k"], "idx", base=1
        ).collect()[0]
        assert r1["contiguous"] is True

    def test_null_idx_refused(self, spark):
        with pytest.raises(ValueError, match="NULL index"):
            sequence_audit(
                spark.createDataFrame(
                    [("a", None)], "k string, idx int"
                ),
                ["k"], "idx",
            )


def _qn_py(groups):
    """groups: dict name -> list of values; returns dict (name, value-index)
    -> qnorm using strict rank order."""
    names = sorted(groups)
    ranked = {g: sorted(groups[g]) for g in names}
    n = len(next(iter(groups.values())))
    ref = [
        sum(ranked[g][r] for g in names) / len(names) for r in range(n)
    ]
    out = {}
    for g in names:
        order = sorted(range(n), key=lambda i: (groups[g][i], i))
        for r, i in enumerate(order):
            out[(g, i)] = ref[r]
    return out


class TestQuantileNormalize:
    def _df(self, spark, groups):
        rows = [
            (g, i, float(v))
            for g, vs in groups.items()
            for i, v in enumerate(vs)
        ]
        return spark.createDataFrame(rows, "g string, t int, x double")

    def test_matches_python_reference(self, spark):
        groups = {
            "a": [5.0, 2.0, 8.0, 3.0],
            "b": [100.0, 300.0, 200.0, 400.0],
        }
        out = quantile_normalize(
            self._df(spark, groups), ["g"], ["t"], "x"
        ).collect()
        ref = _qn_py(groups)
        got = {(r["g"], r["t"]): r["qnorm"] for r in out}
        for k, v in ref.items():
            assert got[k] == pytest.approx(v, rel=1e-12)

    def test_same_distribution_after(self, spark):
        groups = {"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0]}
        out = quantile_normalize(
            self._df(spark, groups), ["g"], ["t"], "x"
        ).collect()
        a = sorted(r["qnorm"] for r in out if r["g"] == "a")
        b = sorted(r["qnorm"] for r in out if r["g"] == "b")
        assert a == b == [5.5, 11.0, 16.5]

    def test_tie_determinism(self, spark):
        groups = {"a": [1.0, 1.0, 2.0], "b": [3.0, 4.0, 5.0]}
        runs = [
            sorted(
                map(
                    tuple,
                    quantile_normalize(
                        self._df(spark, groups), ["g"], ["t"], "x"
                    ).collect(),
                )
            )
            for _ in range(2)
        ]
        assert runs[0] == runs[1]

    def test_unequal_sizes_refused(self, spark):
        groups = {"a": [1.0, 2.0], "b": [1.0, 2.0, 3.0]}
        with pytest.raises(ValueError, match="equal-sized"):
            quantile_normalize(
                self._df(spark, groups), ["g"], ["t"], "x"
            )

    def test_null_refused(self, spark):
        with pytest.raises(ValueError, match="NULL"):
            quantile_normalize(
                spark.createDataFrame(
                    [("a", 0, None)], "g string, t int, x double"
                ),
                ["g"], ["t"], "x",
            )
