"""Frequent itemsets + association rules (L134)."""

import pytest

from lmss_entity_extractor_spark.ops.itemsets import (
    association_rules,
    frequent_itemsets,
    keyed_baskets,
)


def _rows(spark, baskets: dict):
    rows = [(k, it) for k, items in baskets.items() for it in items]
    return spark.createDataFrame(rows, "k int, it string")


def _mine(spark, baskets, min_support, max_len=3, **kw):
    out = frequent_itemsets(
        _rows(spark, baskets), "k", "it", min_support, max_len=max_len, **kw
    )
    return {r["itemset"]: r["support"] for r in out.collect()}


def _support(baskets, itemset):
    """Python reference: subset containment per distinct basket."""
    want = set(itemset)
    return sum(want <= set(items) for items in baskets.values())


class TestItemsets:
    def test_basic_lattice(self, spark):
        baskets = {
            1: ["bread", "milk", "eggs"],
            2: ["bread", "milk"],
            3: ["milk", "eggs"],
            4: ["bread", "eggs"],
        }
        out = _mine(spark, baskets, min_support=2)
        assert out["bread"] == 3 and out["milk"] == 3 and out["eggs"] == 3
        assert out["bread + milk"] == 2
        assert out["eggs + milk"] == 2  # sorted canonical form
        assert "bread + eggs + milk" not in out  # support 1

    def test_duplicates_count_once(self, spark):
        # basket 1 lists milk twice: DISTINCT item set, support once
        out = _mine(
            spark, {1: ["milk", "milk", "bread"], 2: ["milk"]}, min_support=2
        )
        assert out["milk"] == 2
        assert "milk + milk" not in out

    def test_matches_python_reference(self, spark):
        baskets = {
            k: sorted({("ABCDE")[(k * 3 + i * i) % 5] for i in range(4)})
            for k in range(15)
        }
        out = _mine(spark, baskets, min_support=4, max_len=3)
        for itemset_str, sup in out.items():
            assert sup == _support(baskets, itemset_str.split(" + ")), itemset_str
        # completeness at length 2
        for a in "ABCDE":
            for b in "ABCDE":
                if a < b and _support(baskets, [a, b]) >= 4:
                    assert out.get(f"{a} + {b}") == _support(baskets, [a, b])

    def test_antimonotone(self, spark):
        baskets = {k: [("WXYZ")[(k + i) % 4] for i in range(3)] for k in range(10)}
        out = _mine(spark, baskets, min_support=2)
        for itemset_str, sup in out.items():
            items = itemset_str.split(" + ")
            for drop in range(len(items)):
                sub = items[:drop] + items[drop + 1 :]
                if sub:
                    assert out[" + ".join(sub)] >= sup


class TestRules:
    def test_confidence_and_lift(self, spark):
        baskets = {
            1: ["a", "b"],
            2: ["a", "b"],
            3: ["a"],
            4: ["b"],
            5: ["c"],
        }
        rules = association_rules(
            _rows(spark, baskets), "k", "it", min_support=2, max_len=2
        )
        got = {
            (r["antecedent"], r["consequent"]): (
                r["support"],
                r["confidence"],
                r["lift"],
            )
            for r in rules.collect()
        }
        # supp(a)=3, supp(b)=3, supp(ab)=2, N=5
        assert got[("a", "b")] == (2, 2 / 3, 2 * 5 / (3 * 3))
        assert got[("b", "a")] == (2, 2 / 3, 2 * 5 / (3 * 3))

    def test_min_confidence_filters(self, spark):
        baskets = {1: ["a", "b"], 2: ["a", "b"], 3: ["a"], 4: ["a"]}
        rules = association_rules(
            _rows(spark, baskets), "k", "it", 2, min_confidence=0.9, max_len=2
        )
        got = {(r["antecedent"], r["consequent"]) for r in rules.collect()}
        assert got == {("b", "a")}  # conf 2/2 = 1.0; a->b conf 0.5 dropped

    def test_triple_rules_have_pair_antecedents(self, spark):
        baskets = {k: ["x", "y", "z"] for k in range(3)}
        rules = association_rules(_rows(spark, baskets), "k", "it", 3, max_len=3)
        got = {(r["antecedent"], r["consequent"]) for r in rules.collect()}
        assert ("x + y", "z") in got and ("x + z", "y") in got
        for r in rules.collect():
            assert r["confidence"] == 1.0


class TestGuards:
    def test_hot_basket_refused(self, spark):
        df = _rows(spark, {1: [str(i) for i in range(30)]})
        with pytest.raises(ValueError, match="max_basket"):
            keyed_baskets(df, "k", "it", max_basket=10)

    def test_candidate_cap(self, spark):
        df = _rows(spark, {k: [str(i) for i in range(20)] for k in range(3)})
        with pytest.raises(ValueError, match="candidate blow-up"):
            frequent_itemsets(df, "k", "it", 1, max_len=2, candidate_cap=50)

    def test_bad_params(self, spark):
        df = _rows(spark, {1: ["a"]})
        with pytest.raises(ValueError, match="min_support"):
            frequent_itemsets(df, "k", "it", 0)
        with pytest.raises(ValueError, match="max_len"):
            frequent_itemsets(df, "k", "it", 1, max_len=0)

    def test_parallelism_invariance(self, spark):
        baskets = {k: [("PQRS")[(k + i) % 4] for i in range(3)] for k in range(9)}
        df = _rows(spark, baskets)
        a = sorted(frequent_itemsets(df, "k", "it", 2).collect())
        b = sorted(frequent_itemsets(df.repartition(13), "k", "it", 2).collect())
        assert a == b
