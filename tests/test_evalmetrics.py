"""Retrieval metrics (L164) + classification report (L165)."""

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import (
    classification_report,
    retrieval_metrics,
)


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, rank int, neighbor_id bigint"
    )


class TestRetrievalMetrics:
    def test_hand_computed(self, spark):
        truth = _ranked(spark, [(1, 1, 10), (1, 2, 11), (1, 3, 12)])
        pred = _ranked(spark, [(1, 1, 10), (1, 2, 99), (1, 3, 12)])
        r = retrieval_metrics(pred, truth, k=3).collect()[0]
        assert r["n_rel"] == 3 and r["hits"] == 2
        assert r["precision"] == pytest.approx(2 / 3, abs=0)
        assert r["recall"] == pytest.approx(2 / 3, abs=0)
        assert r["rr"] == 1.0  # first prediction is relevant

    def test_no_hits(self, spark):
        truth = _ranked(spark, [(1, 1, 10)])
        pred = _ranked(spark, [(1, 1, 99)])
        r = retrieval_metrics(pred, truth, k=3).collect()[0]
        assert r["hits"] == 0 and r["precision"] == 0.0
        assert r["recall"] == 0.0 and r["rr"] is None

    def test_rr_uses_first_relevant_rank(self, spark):
        truth = _ranked(spark, [(1, 1, 10), (1, 2, 11)])
        pred = _ranked(spark, [(1, 1, 99), (1, 2, 98), (1, 3, 11)])
        r = retrieval_metrics(pred, truth, k=3).collect()[0]
        assert r["rr"] == pytest.approx(1 / 3, abs=0)

    def test_k_cutoff(self, spark):
        truth = _ranked(spark, [(1, 1, 10)])
        pred = _ranked(spark, [(1, 1, 99), (1, 2, 10)])
        r = retrieval_metrics(pred, truth, k=1).collect()[0]
        assert r["hits"] == 0  # the hit is at rank 2, beyond k=1


def _labeled(spark, pairs):
    return spark.createDataFrame(pairs, "y string, p string")


class TestClassificationReport:
    def test_hand_computed(self, spark):
        pairs = (
            [("a", "a")] * 3 + [("a", "b")] * 1  # a: tp=3, fn=1
            + [("b", "b")] * 2 + [("b", "a")] * 2  # b: tp=2, fn=2
        )
        out = {
            r["label"]: r
            for r in classification_report(_labeled(spark, pairs), "y", "p").collect()
        }
        a, b = out["a"], out["b"]
        assert (a["n_true"], a["n_pred"], a["tp"]) == (4, 5, 3)
        assert a["precision"] == pytest.approx(3 / 5, abs=0)
        assert a["recall"] == pytest.approx(3 / 4, abs=0)
        assert a["f1"] == pytest.approx(6 / 9, abs=0)
        assert (b["n_true"], b["n_pred"], b["tp"]) == (4, 3, 2)

    def test_class_only_predicted(self, spark):
        pairs = [("a", "a"), ("a", "c")]
        out = {
            r["label"]: r
            for r in classification_report(_labeled(spark, pairs), "y", "p").collect()
        }
        c = out["c"]
        assert c["n_true"] == 0 and c["n_pred"] == 1 and c["tp"] == 0
        assert c["precision"] == 0.0 and c["recall"] is None

    def test_perfect(self, spark):
        pairs = [("a", "a"), ("b", "b"), ("b", "b")]
        out = classification_report(_labeled(spark, pairs), "y", "p").collect()
        assert all(r["f1"] == 1.0 for r in out)


class TestCohensKappa:
    def test_hand_computed(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

        # classic 2x2 example: tp sums 20+15=35 of n=50,
        # pe = (25*30 + 25*20)/50^2 -> kappa = (0.7-0.5)/(1-0.5) = 0.4
        rows = (
            [("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15
        )
        df = spark.createDataFrame(rows, "a string, b string")
        r = cohens_kappa(df, "a", "b").collect()[0]
        assert r["n"] == 50
        assert r["kappa"] == pytest.approx(0.4, abs=0)

    def test_perfect_agreement_one(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

        rows = [("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")]
        df = spark.createDataFrame(rows, "a string, b string")
        assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] == 1.0

    def test_constant_raters_null(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

        rows = [("x", "x")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] is None

    def test_chance_level_zero(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

        # independent balanced raters: agreement exactly at chance
        rows = [
            ("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"),
        ] * 3
        df = spark.createDataFrame(rows, "a string, b string")
        assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] == 0.0


class TestMcNemar:
    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [("g", int(x), int(y)) for x, y in pairs],
            "g string, x int, y int",
        )

    def test_hand_computed(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import mcnemar

        # b=3 (1,0), c=1 (0,1), concordant pairs ignored
        pairs = [(1, 0)] * 3 + [(0, 1)] + [(1, 1)] * 5 + [(0, 0)] * 2
        r = mcnemar(self._df(spark, pairs), ["g"], "x", "y").collect()[0]
        assert r["b"] == 3 and r["c"] == 1
        assert abs(r["chi2"] - 4.0 / 4.0) < 1e-12
        assert abs(r["chi2_cc"] - 1.0 / 4.0) < 1e-12

    def test_no_discordant_null(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import mcnemar

        pairs = [(1, 1), (0, 0)]
        r = mcnemar(self._df(spark, pairs), ["g"], "x", "y").collect()[0]
        assert r["chi2"] is None and r["chi2_cc"] is None

    def test_equal_discordant(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import mcnemar

        # b = c = 2: chi2 = 0, Edwards correction gives 1/(b+c)
        pairs = [(1, 0)] * 2 + [(0, 1)] * 2
        r = mcnemar(self._df(spark, pairs), ["g"], "x", "y").collect()[0]
        assert r["chi2"] == 0.0
        assert abs(r["chi2_cc"] - 0.25) < 1e-12


class TestFleissKappa:
    # the canonical worked example (Fleiss 1971 / the one every
    # textbook reprints): n=10 subjects, m=14 raters, 5 categories,
    # kappa ~= 0.2099
    TABLE = [
        [0, 0, 0, 0, 14],
        [0, 2, 6, 4, 2],
        [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0],
        [2, 2, 8, 1, 1],
        [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0],
        [2, 5, 3, 2, 2],
        [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ]

    def _ratings(self, spark, table, m=14):
        rows = []
        for i, counts in enumerate(table):
            for j, c in enumerate(counts):
                rows += [("g", f"s{i}", f"c{j}")] * c
        return spark.createDataFrame(
            rows, "g string, s string, c string"
        )

    def test_textbook_example(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import fleiss_kappa

        n, m = len(self.TABLE), 14
        a = sum(v * v for row in self.TABLE for v in row) - n * m
        cterm = sum(
            sum(row[j] for row in self.TABLE) ** 2 for j in range(5)
        )
        k_ref = (a * n * m - (m - 1) * cterm) / (
            (m - 1) * (n * n * m * m - cterm)
        )
        assert abs(k_ref - 0.20993) < 5e-5  # sanity vs the textbook
        r = fleiss_kappa(
            self._ratings(spark, self.TABLE), ["g"], "s", "c", m=14
        ).collect()[0]
        assert r["n_subjects"] == 10
        assert abs(r["kappa"] - k_ref) < 1e-12

    def test_wrong_m_subjects_dropped(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import fleiss_kappa

        rows = (
            [("g", "s0", "a")] * 3
            + [("g", "s1", "b")] * 3
            + [("g", "s2", "a")] * 2  # only 2 ratings -> dropped
        )
        df = spark.createDataFrame(rows, "g string, s string, c string")
        r = fleiss_kappa(df, ["g"], "s", "c", m=3).collect()[0]
        assert r["n_subjects"] == 2
        # perfect agreement on the kept subjects
        assert abs(r["kappa"] - 1.0) < 1e-12

    def test_single_category_null(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import fleiss_kappa

        rows = [("g", "s0", "a")] * 2 + [("g", "s1", "a")] * 2
        df = spark.createDataFrame(rows, "g string, s string, c string")
        r = fleiss_kappa(df, ["g"], "s", "c", m=2).collect()[0]
        assert r["kappa"] is None


class TestCochranQ:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [("g", b, t, int(y)) for b, t, y in rows],
            "g string, b string, t string, y int",
        )

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cochran_q

        # 3 treatments x 8 blocks, deterministic 0/1 pattern
        k, n = 3, 8
        out = {
            (b, t): 1 if ((3 * b + 7 * t + b * t) % 5) < 2 else 0
            for b in range(n)
            for t in range(k)
        }
        rows = [(f"b{b}", f"t{t}", out[(b, t)]) for b, t in out]
        cj = [sum(out[(b, t)] for b in range(n)) for t in range(k)]
        ri = [sum(out[(b, t)] for t in range(k)) for b in range(n)]
        ntot = sum(cj)
        q_ref = (
            (k - 1)
            * (k * sum(c * c for c in cj) - ntot * ntot)
            / (k * ntot - sum(r * r for r in ri))
        )
        r = cochran_q(self._df(spark, rows), ["g"], "b", "t", "y").collect()[0]
        assert r["k"] == k and r["n_blocks"] == n
        assert abs(r["q"] - q_ref) < 1e-12

    def test_k2_equals_mcnemar(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import (
            cochran_q,
            mcnemar,
        )

        # paired binary data as 2 treatments over blocks
        pairs = [(1, 0)] * 5 + [(0, 1)] * 2 + [(1, 1)] * 4 + [(0, 0)] * 3
        rows = []
        pair_rows = []
        for i, (x, y) in enumerate(pairs):
            rows += [(f"b{i}", "x", x), (f"b{i}", "y", y)]
            pair_rows.append(("g", x, y))
        q = cochran_q(self._df(spark, rows), ["g"], "b", "t", "y").collect()[0]
        mdf = spark.createDataFrame(pair_rows, "g string, x int, y int")
        m = mcnemar(mdf, ["g"], "x", "y").collect()[0]
        assert abs(q["q"] - m["chi2"]) < 1e-12

    def test_incomplete_blocks_drop(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cochran_q

        rows = [
            ("b0", "a", 1), ("b0", "b", 0),
            ("b1", "a", 1), ("b1", "b", 1),
            ("b2", "a", 0),  # incomplete
        ]
        r = cochran_q(self._df(spark, rows), ["g"], "b", "t", "y").collect()[0]
        assert r["n_blocks"] == 2

    def test_degenerate_null(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cochran_q

        # every block all-1 or all-0: denominator kN - sum R^2 = 0
        rows = [
            ("b0", "a", 1), ("b0", "b", 1),
            ("b1", "a", 0), ("b1", "b", 0),
        ]
        r = cochran_q(self._df(spark, rows), ["g"], "b", "t", "y").collect()[0]
        assert r["q"] is None


class TestRboOverlap:
    @staticmethod
    def _ref(la, lb, k, p):
        rbo = 0.0
        for d in range(1, k + 1):
            xd = len(set(la[:d]) & set(lb[:d]))
            rbo += (1.0 - p) * p ** (d - 1) * xd / d
        xk = len(set(la[:k]) & set(lb[:k]))
        return rbo, rbo + p**k * xk / k

    def _df(self, spark, lists):
        rows = [
            (q, item, r + 1)
            for q, items in lists.items()
            for r, item in enumerate(items)
        ]
        return spark.createDataFrame(rows, "query_id string, item string, rank int")

    def test_reference_values(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import rbo_overlap

        la = {"q1": ["a", "b", "c", "d", "e"], "q2": ["x", "y", "z"]}
        lb = {"q1": ["b", "a", "c", "f", "g"], "q2": ["p", "q", "r"]}
        out = {
            r["query_id"]: r
            for r in rbo_overlap(
                self._df(spark, la), self._df(spark, lb), k=5, p=0.9
            ).collect()
        }
        for q in ("q1", "q2"):
            rbo, ext = self._ref(la[q], lb[q], 5, 0.9)
            assert abs(out[q]["rbo"] - rbo) < 1e-12, q
            assert abs(out[q]["rbo_ext"] - ext) < 1e-12, q
        assert out["q2"]["n_common"] == 0 and out["q2"]["rbo"] == 0.0

    def test_identical_lists_near_one(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import rbo_overlap

        la = {"q": list("abcdefghij")}
        out = rbo_overlap(
            self._df(spark, la), self._df(spark, la), k=10, p=0.9
        ).collect()[0]
        # identical lists: X_d = d, so rbo = 1 - p^k and ext = 1.0
        assert abs(out["rbo"] - (1 - 0.9**10)) < 1e-12
        assert abs(out["rbo_ext"] - 1.0) < 1e-12

    def test_top_weighting(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import rbo_overlap

        # agreement at the TOP scores higher than at the bottom
        base = {"q": ["a", "b", "c", "d"]}
        top = {"q": ["a", "b", "x", "y"]}
        bot = {"q": ["x", "y", "c", "d"]}
        r_top = rbo_overlap(
            self._df(spark, base), self._df(spark, top), k=4
        ).collect()[0]["rbo"]
        r_bot = rbo_overlap(
            self._df(spark, base), self._df(spark, bot), k=4
        ).collect()[0]["rbo"]
        assert r_top > r_bot


class TestGainsTable:
    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import gains_table

        rows = [
            (i, (97 * i) % 100 / 100.0, 1 if (i * 13) % 7 < 2 else 0)
            for i in range(100)
        ]
        df = spark.createDataFrame(rows, "id int, score double, y int")
        # python reference: sort by (-score, id), 10 buckets
        ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
        n = len(ordered)
        buckets = {}
        for rn, (_, _, y) in enumerate(ordered, 1):
            b = (rn * 10 + n - 1) // n
            nb, pb = buckets.get(b, (0, 0))
            buckets[b] = (nb + 1, pb + y)
        p_tot = sum(p for _, p in buckets.values())
        got = {
            r["bucket"]: r
            for r in gains_table(df, "score", "y", "id", 10).collect()
        }
        cum_p = cum_n = 0
        for b in sorted(buckets):
            nb, pb = buckets[b]
            cum_p += pb
            cum_n += nb
            r = got[b]
            assert r["n"] == nb and r["pos"] == pb and r["cum_pos"] == cum_p
            assert abs(r["capture"] - cum_p / p_tot) < 1e-12
            assert abs(r["lift"] - (pb * n) / (nb * p_tot)) < 1e-12
            assert abs(r["cum_lift"] - (cum_p * n) / (cum_n * p_tot)) < 1e-12

    def test_perfect_model_front_loads(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import gains_table

        # scores equal to labels: all positives land in the top bucket
        rows = [(i, 1.0 if i < 10 else 0.0, 1 if i < 10 else 0)
                for i in range(100)]
        df = spark.createDataFrame(rows, "id int, score double, y int")
        got = {
            r["bucket"]: r
            for r in gains_table(df, "score", "y", "id", 10).collect()
        }
        assert got[1]["pos"] == 10 and abs(got[1]["capture"] - 1.0) < 1e-12
        assert abs(got[1]["lift"] - 10.0) < 1e-12
        assert got[10]["pos"] == 0 and abs(got[10]["cum_lift"] - 1.0) < 1e-12

    def test_no_positives_null(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import gains_table

        rows = [(i, float(i), 0) for i in range(20)]
        df = spark.createDataFrame(rows, "id int, score double, y int")
        for r in gains_table(df, "score", "y", "id", 4).collect():
            assert r["capture"] is None and r["lift"] is None


class TestBinaryValidation:
    def test_mcnemar_nonbinary_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.evalmetrics import mcnemar

        df = spark.createDataFrame(
            [("g", 2, 0), ("g", 1, 1)], "g string, x int, y int"
        )
        with pytest.raises(ValueError, match="non-binary"):
            mcnemar(df, ["g"], "x", "y")

    def test_cochran_nonbinary_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.evalmetrics import cochran_q

        df = spark.createDataFrame(
            [("g", "b0", "a", -1), ("g", "b0", "b", 1)],
            "g string, b string, t string, y int",
        )
        with pytest.raises(ValueError, match="non-binary"):
            cochran_q(df, ["g"], "b", "t", "y")

    def test_fleiss_bad_m_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.evalmetrics import fleiss_kappa

        df = spark.createDataFrame(
            [("g", "s0", "a")], "g string, s string, c string"
        )
        with pytest.raises(ValueError, match="m must be"):
            fleiss_kappa(df, ["g"], "s", "c", m=0)


class TestRobustBinaryValidator:
    def test_fractional_double_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.evalmetrics import mcnemar

        # 0.9 truncates to 0 under an int cast — the raw-column check
        # must still refuse it
        df = spark.createDataFrame(
            [("g", 0.9, 0.0), ("g", 1.0, 1.0)],
            "g string, x double, y double",
        )
        with pytest.raises(ValueError, match="non-binary"):
            mcnemar(df, ["g"], "x", "y")

    def test_string_label_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.effectsize import mde_proportions

        df = spark.createDataFrame(
            [("g", "yes"), ("g", "no")], "g string, y string"
        )
        with pytest.raises(ValueError, match="non-binary"):
            mde_proportions(df, ["g"], "y")

    def test_exact_doubles_pass(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import mcnemar

        df = spark.createDataFrame(
            [("g", 1.0, 0.0), ("g", 0.0, 1.0)],
            "g string, x double, y double",
        )
        r = mcnemar(df, ["g"], "x", "y").collect()[0]
        assert r["b"] == 1 and r["c"] == 1

    def test_bh_fdr_max_tests_refused(self, spark):
        """r6 guard: the step-up rank sweep is one global window, so an
        unbounded hypothesis table is refused, not serialized; the
        check rides the existing validation scan and honors the
        skip_validation() knob."""
        import pytest

        from lmss_entity_extractor_spark.ops.effectsize import bh_fdr
        from lmss_entity_extractor_spark.ops.validate import skip_validation

        df = spark.createDataFrame(
            [(f"t{i}", 0.01 * (i + 1)) for i in range(10)], "test string, p double"
        )
        with pytest.raises(ValueError, match="max_tests"):
            bh_fdr(df, "test", "p", max_tests=5)
        assert bh_fdr(df, "test", "p", max_tests=10).count() == 10
        with skip_validation():  # caller-beware: no pre-flight scan at all
            assert bh_fdr(df, "test", "p", max_tests=5).count() == 10

    def test_bh_fdr_overlong_q_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.effectsize import bh_fdr

        df = spark.createDataFrame([("a", 0.5)], "test string, p double")
        with pytest.raises(ValueError, match="6 decimal"):
            bh_fdr(df, "test", "p", q="0.0249995")

    def test_two_prop_empty_arm_zero_counts(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import (
            two_proportion_test,
        )

        # a group with only variant B rows: k_a must be 0, not NULL
        df = spark.createDataFrame(
            [("g", "B", 1), ("g", "B", 0)], "g string, var string, y int"
        )
        r = two_proportion_test(df, ["g"], "var", "A", "B", "y").collect()[0]
        assert r["n_a"] == 0 and r["k_a"] == 0
