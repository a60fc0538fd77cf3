"""Multi-touch attribution (L363) and Qini uplift deciles (L364)."""

import pytest

from lmss_entity_extractor_spark.ops.cohort import (
    multitouch_attribution,
    qini_deciles,
)


class TestAttribution:
    def _df(self, spark, paths):
        rows = [
            (conv, i, ch)
            for conv, chans in paths.items()
            for i, ch in enumerate(chans)
        ]
        return spark.createDataFrame(
            rows, "conv string, t int, channel string"
        )

    PATHS = {
        "c1": ["search", "social", "email"],
        "c2": ["email"],
        "c3": ["social", "email"],
    }

    def test_linear(self, spark):
        out = {r["channel"]: r["credit"] for r in multitouch_attribution(
            self._df(spark, self.PATHS), "conv", ["t"], "channel",
            model="linear",
        ).collect()}
        assert out["search"] == pytest.approx(1 / 3)
        assert out["social"] == pytest.approx(1 / 3 + 1 / 2)
        assert out["email"] == pytest.approx(1 / 3 + 1 + 1 / 2)
        assert sum(out.values()) == pytest.approx(3.0)

    def test_first_and_last(self, spark):
        first = {r["channel"]: r["credit"] for r in multitouch_attribution(
            self._df(spark, self.PATHS), "conv", ["t"], "channel",
            model="first",
        ).collect()}
        assert first == pytest.approx(
            {"search": 1.0, "email": 1.0, "social": 1.0}
        )
        last = {r["channel"]: r["credit"] for r in multitouch_attribution(
            self._df(spark, self.PATHS), "conv", ["t"], "channel",
            model="last",
        ).collect()}
        assert last["email"] == pytest.approx(3.0)
        assert last.get("search", 0.0) == 0.0

    def test_u_shaped(self, spark):
        out = {r["channel"]: r["credit"] for r in multitouch_attribution(
            self._df(spark, self.PATHS), "conv", ["t"], "channel",
            model="u_shaped",
        ).collect()}
        # c1: search .4, social .2, email .4; c2: email 1; c3: .5/.5
        assert out["search"] == pytest.approx(0.4)
        assert out["social"] == pytest.approx(0.2 + 0.5)
        assert out["email"] == pytest.approx(0.4 + 1.0 + 0.5)
        assert sum(out.values()) == pytest.approx(3.0)

    def test_refusals(self, spark):
        df = self._df(spark, {"c": ["a", "b", "c"]})
        with pytest.raises(ValueError, match="unknown model"):
            multitouch_attribution(df, "conv", ["t"], "channel", model="x")
        with pytest.raises(ValueError, match="max_path"):
            multitouch_attribution(
                df, "conv", ["t"], "channel", max_path=2
            )


class TestQini:
    def _df(self, spark, rows, g="g1"):
        return spark.createDataFrame(
            [(g, i, float(s), t, y) for i, (s, t, y) in enumerate(rows)],
            "g string, id int, score double, tr int, conv int",
        )

    def test_counts_and_formulas(self, spark):
        # 20 units: scores descending by construction
        rows = []
        for i in range(20):
            score = 20.0 - i
            treated = 1 if i % 2 == 0 else 0
            # model is good: high-score treated convert
            conv = 1 if (treated and i < 8) or (not treated and i < 2) else 0
            rows.append((score, treated, conv))
        out = {r["decile"]: r for r in qini_deciles(
            self._df(spark, rows), ["g"], "id", "score", "tr", "conv"
        ).collect()}
        d10 = out[10]
        assert d10["nt"] == 10 and d10["nc"] == 10
        assert d10["yt"] == 4 and d10["yc"] == 1
        assert d10["qini"] == pytest.approx(4 - 1 * (10 / 10))
        assert d10["uplift"] == pytest.approx(0.4 - 0.1)
        # early deciles show higher uplift than the full population
        assert out[2]["uplift"] >= d10["uplift"]

    def test_monotone_rank_window(self, spark):
        rows = [(float(i), i % 2, 0) for i in range(40)]
        out = qini_deciles(
            self._df(spark, rows), ["g"], "id", "score", "tr", "conv"
        ).collect()
        assert len(out) == 10
        assert all(r["qini"] == 0.0 for r in out)

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="non-0/1"):
            qini_deciles(
                self._df(spark, [(1.0, 2, 0)]), ["g"], "id", "score",
                "tr", "conv",
            )
        with pytest.raises(ValueError, match="NULL"):
            qini_deciles(
                spark.createDataFrame(
                    [("g", 1, None, 1, 0)],
                    "g string, id int, score double, tr int, conv int",
                ),
                ["g"], "id", "score", "tr", "conv",
            )
