"""ROC-AUC / Mann-Whitney (L146) + two-sample KS (L147)."""

import pytest

from lmss_entity_extractor_spark.ops.rankeval import ks_2samp, roc_auc


def _auc_py(pairs):
    """Average-rank AUC over (label, score) pairs."""
    ranked = sorted(pairs, key=lambda p: p[1])
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(ranked):
        j = i
        while j < len(ranked) and ranked[j][1] == ranked[i][1]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[k] = avg
        i = j
    rpos = sum(ranks[k] for k, (lab, _) in enumerate(ranked) if lab == 1)
    npos = sum(1 for lab, _ in pairs if lab == 1)
    nneg = len(pairs) - npos
    u = rpos - npos * (npos + 1) / 2.0
    return u, u / (npos * nneg)


def _ks_py(xs, ys):
    na, nb = len(xs), len(ys)
    best = 0
    for v in sorted(set(xs) | set(ys)):
        ca = sum(1 for x in xs if x <= v)
        cb = sum(1 for y in ys if y <= v)
        best = max(best, abs(ca * nb - cb * na))
    return best / (na * nb)


def _auc_df(spark, pairs, grp="g"):
    return spark.createDataFrame(
        [(grp, l, float(s)) for l, s in pairs],
        "g string, label int, score double",
    )


class TestRocAuc:
    def test_matches_python_with_ties(self, spark):
        pairs = [
            (1, 3.0), (1, 2.0), (1, 2.0), (1, 5.0),
            (0, 1.0), (0, 2.0), (0, 3.0), (0, 0.5), (0, 2.0),
        ]
        row = roc_auc(_auc_df(spark, pairs), ["g"], "label", "score").collect()[0]
        u, auc = _auc_py(pairs)
        assert row["n_pos"] == 4 and row["n_neg"] == 5
        assert row["u"] == pytest.approx(u, abs=0)
        assert row["auc"] == pytest.approx(auc, abs=0)

    def test_perfect_and_reversed(self, spark):
        perfect = [(1, 10.0), (1, 9.0), (0, 2.0), (0, 1.0)]
        rev = [(0, 10.0), (0, 9.0), (1, 2.0), (1, 1.0)]
        out = {
            r["g"]: r["auc"]
            for r in roc_auc(
                _auc_df(spark, perfect, "hi").unionByName(
                    _auc_df(spark, rev, "lo")
                ),
                ["g"],
                "label",
                "score",
            ).collect()
        }
        assert out == {"hi": 1.0, "lo": 0.0}

    def test_all_tied_is_half(self, spark):
        pairs = [(1, 7.0), (0, 7.0), (1, 7.0), (0, 7.0)]
        row = roc_auc(_auc_df(spark, pairs), ["g"], "label", "score").collect()[0]
        assert row["auc"] == 0.5

    def test_single_class_null(self, spark):
        pairs = [(1, 1.0), (1, 2.0)]
        row = roc_auc(_auc_df(spark, pairs), ["g"], "label", "score").collect()[0]
        assert row["auc"] is None and row["u"] is None

    def test_parallelism_invariant(self, spark):
        pairs = [((i * 7) % 3 % 2, float((i * 13) % 40)) for i in range(200)]
        df = _auc_df(spark, pairs)
        a = roc_auc(df.repartition(1), ["g"], "label", "score").collect()[0]
        b = roc_auc(df.repartition(16), ["g"], "label", "score").collect()[0]
        assert a["auc"] == b["auc"] and a["u"] == b["u"]


def _ks_df(spark, xs, ys, grp="g"):
    rows = [(grp, "A", float(v)) for v in xs] + [
        (grp, "B", float(v)) for v in ys
    ]
    return spark.createDataFrame(rows, "g string, s string, v double")


class TestKs2Samp:
    def test_matches_python(self, spark):
        xs = [1.0, 2.0, 2.0, 3.5, 4.0, 9.0]
        ys = [2.0, 3.0, 3.5, 5.0, 6.0]
        row = ks_2samp(
            _ks_df(spark, xs, ys), ["g"], "s", "A", "B", "v"
        ).collect()[0]
        assert row["n_a"] == 6 and row["n_b"] == 5
        assert row["d"] == pytest.approx(_ks_py(xs, ys), abs=0)

    def test_identical_zero(self, spark):
        xs = [1.0, 2.0, 3.0]
        row = ks_2samp(
            _ks_df(spark, xs, xs), ["g"], "s", "A", "B", "v"
        ).collect()[0]
        assert row["d"] == 0.0

    def test_disjoint_one(self, spark):
        row = ks_2samp(
            _ks_df(spark, [1.0, 2.0], [10.0, 11.0]), ["g"], "s", "A", "B", "v"
        ).collect()[0]
        assert row["d"] == 1.0

    def test_missing_sample_null(self, spark):
        df = _ks_df(spark, [1.0, 2.0], [])
        row = ks_2samp(df, ["g"], "s", "A", "B", "v").collect()[0]
        assert row["d"] is None

    def test_other_samples_ignored(self, spark):
        df = _ks_df(spark, [1.0, 2.0], [1.0, 2.0]).unionByName(
            _ks_df(spark, [], []).sparkSession.createDataFrame(
                [("g", "C", 99.0)], "g string, s string, v double"
            )
        )
        row = ks_2samp(df, ["g"], "s", "A", "B", "v").collect()[0]
        assert row["d"] == 0.0 and row["n_a"] == 2
