"""Golden-record survivorship (L122)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.survivorship import golden_records


@pytest.fixture(scope="module")
def clusters(spark):
    rows = [
        # cluster A: three observations over time
        ("A", 1, "alice",  None,   10.0, "x"),
        ("A", 2, "alicia", "a@e",  30.0, "y"),
        ("A", 3, None,     "a2@e", 20.0, "y"),
        # cluster B: single row
        ("B", 5, "bob",    "b@e",  1.0,  "z"),
    ]
    return spark.createDataFrame(
        rows, "cid string, ts int, name string, email string, bal double, seg string"
    ).repartition(3)


RULES = [
    ("latest", "name", "ts"),
    ("latest", "email", "ts"),
    ("max", "bal"),
    ("majority", "seg"),
]


class TestGoldenRecords:
    def test_election(self, spark, clusters):
        got = {r["cid"]: r for r in golden_records(clusters, "cid", RULES).collect()}
        a = got["A"]
        assert a["n_members"] == 3
        assert a["name"] == "alicia"   # newest NON-NULL (ts=3 row has null)
        assert a["email"] == "a2@e"    # newest non-null
        assert a["bal"] == 30.0
        assert a["seg"] == "y"         # 2 of 3
        b = got["B"]
        assert (b["name"], b["email"], b["bal"], b["seg"]) == ("bob", "b@e", 1.0, "z")

    def test_majority_tie_breaks_low(self, spark):
        rows = [("A", 1, "x"), ("A", 2, "y")]
        df = spark.createDataFrame(rows, "cid string, ts int, seg string")
        out = golden_records(df, "cid", [("majority", "seg")]).collect()[0]
        assert out["seg"] == "x"

    def test_latest_tie_breaks_by_value(self, spark):
        rows = [("A", 1, "p"), ("A", 1, "q")]
        df = spark.createDataFrame(rows, "cid string, ts int, name string")
        out = golden_records(df, "cid", [("latest", "name", "ts")]).collect()[0]
        assert out["name"] == "q"  # (ts, value) struct max -> higher value

    def test_all_null_column_stays_null(self, spark):
        rows = [("A", 1, None), ("A", 2, None)]
        df = spark.createDataFrame(rows, "cid string, ts int, name string")
        out = golden_records(df, "cid", [("latest", "name", "ts")]).collect()[0]
        assert out["name"] is None

    def test_column_order_and_schema(self, spark, clusters):
        out = golden_records(clusters, "cid", RULES)
        assert out.columns == ["cid", "n_members", "name", "email", "bal", "seg"]

    def test_deterministic_across_parallelism(self, spark, clusters):
        a = sorted(map(tuple, golden_records(clusters.repartition(1), "cid", RULES).collect()))
        b = sorted(map(tuple, golden_records(clusters.repartition(8), "cid", RULES).collect()))
        assert a == b

    def test_validation(self, spark, clusters):
        with pytest.raises(ValueError, match="non-empty"):
            golden_records(clusters, "cid", [])
        with pytest.raises(ValueError, match="unknown rule kind"):
            golden_records(clusters, "cid", [("newest", "name")])
        with pytest.raises(ValueError, match="duplicate rule"):
            golden_records(clusters, "cid", [("max", "bal"), ("min", "bal")])
        with pytest.raises(ValueError, match="latest needs"):
            golden_records(clusters, "cid", [("latest", "name")])
