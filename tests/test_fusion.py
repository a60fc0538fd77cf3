"""Conflict resolution (graph/fusion.py, L62): hand-checked elections,
set-semantics idempotence, weighted votes, deterministic tie-breaks."""

from lmss_entity_extractor_spark.graph.fusion import resolve_conflicts


def _claims(spark, rows, schema="s string, p string, o string, source string"):
    return spark.createDataFrame(rows, schema)


def _by_slot(df):
    return {
        (r["s"], r["p"]): (
            r["o"],
            r["support"],
            r["total_support"],
            r["n_values"],
            r["confidence"],
        )
        for r in df.collect()
    }


class TestResolveConflicts:
    def test_majority_vote(self, spark):
        c = _claims(
            spark,
            [
                ("e1", "born", "paris", "src1"),
                ("e1", "born", "paris", "src2"),
                ("e1", "born", "london", "src3"),
                ("e2", "born", "rome", "src1"),
            ],
        )
        got = _by_slot(resolve_conflicts(c))
        assert got[("e1", "born")] == ("paris", 2.0, 3.0, 2, 2.0 / 3.0)
        assert got[("e2", "born")] == ("rome", 1.0, 1.0, 1, 1.0)

    def test_duplicate_assertion_counts_once(self, spark):
        c = _claims(
            spark,
            [
                ("e1", "t", "A", "src1"),
                ("e1", "t", "A", "src1"),  # same source repeats itself
                ("e1", "t", "A", "src1"),
                ("e1", "t", "B", "src2"),
                ("e1", "t", "B", "src3"),
            ],
        )
        got = _by_slot(resolve_conflicts(c))
        assert got[("e1", "t")][0] == "B"  # 2 sources beat 1 loud source
        assert got[("e1", "t")][2] == 3.0

    def test_tie_breaks_on_object_asc(self, spark):
        c = _claims(
            spark,
            [("e1", "t", "zebra", "s1"), ("e1", "t", "apple", "s2")],
        )
        assert _by_slot(resolve_conflicts(c))[("e1", "t")][0] == "apple"

    def test_weighted_vote_overrides_count(self, spark):
        c = _claims(
            spark,
            [
                ("e1", "t", "A", "s1", 5),
                ("e1", "t", "B", "s2", 2),
                ("e1", "t", "B", "s3", 2),
            ],
            schema="s string, p string, o string, source string, trust int",
        )
        got = _by_slot(resolve_conflicts(c, weight_col="trust"))
        assert got[("e1", "t")] == ("A", 5.0, 9.0, 2, 5.0 / 9.0)

    def test_one_row_per_slot(self, spark):
        rows = [
            ("e%d" % (i % 7), "p%d" % (i % 3), "o%d" % (i % 5), "s%d" % i)
            for i in range(60)
        ]
        out = resolve_conflicts(_claims(spark, rows))
        slots = {(r[0], r[1]) for r in rows}
        assert out.count() == len(slots)
        assert out.select("s", "p").distinct().count() == len(slots)
