"""Gale-Shapley stable matching (L403) and auction clearing (L404)."""

import pytest

from lmss_entity_extractor_spark.ops.matching import (
    auction_clearing,
    stable_matching,
)


def _market(spark, pprefs, aprefs):
    rows = []
    for p, lst in pprefs.items():
        for a in lst:
            if p in aprefs.get(a, []):
                pv = float(len(lst) - lst.index(a))
                av = float(len(aprefs[a]) - aprefs[a].index(p))
                rows.append(("m", p, a, pv, av))
    return spark.createDataFrame(
        rows, "mk string, p string, a string, pv double, av double"
    )


def _gs_ref(pprefs, aprefs):
    """Textbook proposer-optimal GS with strict lists."""
    free = list(sorted(pprefs))
    nxt = {p: 0 for p in pprefs}
    match = {}
    while free:
        p = free.pop(0)
        if nxt[p] >= len(pprefs[p]):
            continue
        a = pprefs[p][nxt[p]]
        nxt[p] += 1
        cur = match.get(a)
        if cur is None:
            match[a] = p
        else:
            pref = aprefs[a]
            if pref.index(p) < pref.index(cur):
                match[a] = p
                free.append(cur)
            else:
                free.append(p)
    return {p: a for a, p in match.items()}


class TestStableMatching:
    PP = {"A": ["Y", "X", "Z"], "B": ["X", "Y", "Z"], "C": ["X", "Y", "Z"]}
    AP = {"X": ["B", "A", "C"], "Y": ["A", "B", "C"], "Z": ["A", "B", "C"]}

    def _run(self, spark, pp, ap):
        out = stable_matching(
            _market(spark, pp, ap), ["mk"], "p", "a", "pv", "av"
        ).collect()
        return {r["proposer"]: r["acceptor"] for r in out}

    def test_textbook_instance(self, spark):
        got = self._run(spark, self.PP, self.AP)
        assert got == _gs_ref(self.PP, self.AP) == {
            "A": "Y", "B": "X", "C": "Z"
        }

    def test_matches_python_reference_larger(self, spark):
        import itertools

        ps = [f"p{i}" for i in range(5)]
        qs = [f"a{i}" for i in range(5)]
        pp = {
            p: sorted(qs, key=lambda a: ((hash_ := (i * 7 + int(a[1]) * 3) % 11), a))
            for i, p in enumerate(ps)
        }
        ap = {
            a: sorted(ps, key=lambda p: ((int(a[1]) * 5 + int(p[1]) * 2) % 7, p))
            for a in qs
        }
        got = self._run(spark, pp, ap)
        assert got == _gs_ref(pp, ap)

    def test_no_blocking_pair(self, spark):
        got = self._run(spark, self.PP, self.AP)
        # stability: no (p, a) both preferring each other over matches
        for p, plist in self.PP.items():
            for a in plist:
                if got[p] == a:
                    continue
                p_prefers = plist.index(a) < plist.index(got[p])
                cur = [x for x, y in got.items() if y == a][0]
                a_prefers = self.AP[a].index(p) < self.AP[a].index(cur)
                assert not (p_prefers and a_prefers)

    def test_unmatched_proposer_absent(self, spark):
        # 2 proposers, 1 acceptor: loser absent from output
        df = spark.createDataFrame(
            [("m", "A", "X", 1.0, 2.0), ("m", "B", "X", 1.0, 1.0)],
            "mk string, p string, a string, pv double, av double",
        )
        out = stable_matching(df, ["mk"], "p", "a", "pv", "av").collect()
        assert len(out) == 1 and out[0]["proposer"] == "A"

    def test_tie_broken_by_id(self, spark):
        # equal a_value: proposer-ASC pinned -> A wins
        df = spark.createDataFrame(
            [("m", "B", "X", 1.0, 5.0), ("m", "A", "X", 1.0, 5.0)],
            "mk string, p string, a string, pv double, av double",
        )
        out = stable_matching(df, ["mk"], "p", "a", "pv", "av").collect()
        assert out[0]["proposer"] == "A"


class TestAuctionClearing:
    def _run(self, spark, bids, supply):
        df = spark.createDataFrame(
            [("au", b, float(p), q) for b, p, q in bids],
            "auc string, b string, price double, qty long",
        )
        return {
            r["bidder"]: r
            for r in auction_clearing(
                df, ["auc"], "b", "price", "qty", supply=supply
            ).collect()
        }

    def test_marginal_pro_rata(self, spark):
        out = self._run(
            spark,
            [("b1", 10, 5), ("b2", 8, 4), ("b3", 7, 6), ("b4", 5, 3)],
            12,
        )
        assert out["b1"]["alloc"] == 5.0
        assert out["b2"]["alloc"] == 4.0
        assert out["b3"]["alloc"] == pytest.approx(3.0)
        assert out["b4"]["alloc"] == 0.0
        assert float(out["b1"]["clearing_price"]) == 7.0

    def test_undersubscribed(self, spark):
        out = self._run(spark, [("b1", 10, 5), ("b2", 8, 4)], 100)
        assert out["b1"]["alloc"] == 5.0 and out["b2"]["alloc"] == 4.0
        assert out["b1"]["clearing_price"] is None

    def test_exact_fill_no_pro_rata(self, spark):
        out = self._run(spark, [("b1", 10, 5), ("b2", 8, 5)], 10)
        assert out["b2"]["alloc"] == 5.0
        assert float(out["b2"]["clearing_price"]) == 8.0

    def test_total_allocation_equals_supply(self, spark):
        out = self._run(
            spark, [("b1", 9, 7), ("b2", 8, 9), ("b3", 7, 4)], 11
        )
        assert sum(r["alloc"] for r in out.values()) == pytest.approx(11.0)

    def test_price_tie_bidder_order(self, spark):
        out = self._run(spark, [("b2", 5, 4), ("b1", 5, 4)], 4)
        assert out["b1"]["alloc"] == 4.0
        assert out["b2"]["alloc"] == 0.0

    def test_refusals(self, spark):
        df = spark.createDataFrame(
            [("au", "b", 1.0, 0)], "auc string, b string, price double, qty long"
        )
        with pytest.raises(ValueError, match="non-positive"):
            auction_clearing(df, ["auc"], "b", "price", "qty", supply=5)
        with pytest.raises(ValueError, match="supply"):
            auction_clearing(df, ["auc"], "b", "price", "qty", supply=0)
