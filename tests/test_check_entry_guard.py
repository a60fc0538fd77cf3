"""The contract pre-flight dtype guard (tools/check_entry.py).

Round 4's six driver reds were one class: Spark DECIMAL reaching
pandas as object-dtype ``Decimal`` (vs DuckDB's float64) and
array<string> crashing the driver's canonicalization.  The local
checker's job is to red-flag that class BEFORE the driver samples it
— these tests pin the guard on deliberately-broken fixtures from
both sides (r4 VERDICT ask #2)."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_entry import odd_oracle_dtypes, odd_spark_dtypes  # noqa: E402


class TestOracleSide:
    def _rel(self, sql):
        return duckdb.connect().sql(sql)

    def test_decimal_flagged(self):
        odd = odd_oracle_dtypes(self._rel("SELECT CAST(1.5 AS DECIMAL(18,2)) AS x"))
        assert odd == [("x", "DECIMAL(18,2)")]

    def test_list_flagged(self):
        odd = odd_oracle_dtypes(self._rel("SELECT ['a','b'] AS xs"))
        assert len(odd) == 1 and odd[0][0] == "xs"

    def test_struct_flagged(self):
        odd = odd_oracle_dtypes(self._rel("SELECT {'a': 1} AS s"))
        assert len(odd) == 1 and odd[0][0] == "s"

    def test_legacy_odd_dtypes_still_flagged(self):
        odd = odd_oracle_dtypes(self._rel("SELECT CAST(1 AS HUGEINT) AS h"))
        assert odd == [("h", "HUGEINT")]

    def test_clean_relation_passes(self):
        odd = odd_oracle_dtypes(
            self._rel(
                "SELECT CAST(1 AS BIGINT) AS n, CAST(1.5 AS DOUBLE) AS x,"
                " 'a' AS s, array_to_string(['a','b'], ',') AS joined"
            )
        )
        assert odd == []


class TestSparkSide:
    def test_decimal_flagged(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(1).select(
            F.lit("1.50").cast("decimal(18,2)").alias("x")
        )
        odd = odd_spark_dtypes(df)
        assert odd == [("x", "decimal(18,2)")]

    def test_array_flagged(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(1).select(F.array(F.lit("a")).alias("xs"))
        assert odd_spark_dtypes(df) == [("xs", "array<string>")]

    def test_contract_boundary_clears_it(self, spark):
        """__spark_entry__._contract_out is the fix the guard enforces:
        after the boundary projection nothing is flagged."""
        from pyspark.sql import functions as F

        import __spark_entry__ as entry

        df = spark.range(1).select(
            F.lit("1.50").cast("decimal(18,2)").alias("d"),
            F.array(F.lit("a"), F.lit("b")).alias("xs"),
            F.array(F.lit(1), F.lit(2)).alias("nums"),
            F.struct(F.lit(1).alias("a")).alias("st"),
            F.lit(7).alias("n"),
        )
        out = entry._contract_out(df)
        assert odd_spark_dtypes(out) == []
        row = out.collect()[0]
        assert row["d"] == pytest.approx(1.5)
        assert row["xs"] == "a,b"
        assert row["nums"] == "1,2"
        assert row["n"] == 7

    def test_every_contract_query_is_wrapped(self):
        """queries() applies the boundary to every entry — a future
        query that forgets cannot leak a decimal/array output."""
        import __spark_entry__ as entry

        for name, fn in entry.queries().items():
            assert fn.__wrapped__ is not None, name
