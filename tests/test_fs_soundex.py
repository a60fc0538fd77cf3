"""Fellegi-Sunter scoring (L241) and Soundex keys (L242)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.blocking import fellegi_sunter_score
from lmss_entity_extractor_spark.ops.phonetic import (
    add_soundex,
    soundex_sql,
)

# canonical American Soundex test vectors (Archives.gov examples +
# the classic h/w corner cases)
VECTORS = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
    "VanDeusen": "V532",
    "O'Brien": "O165",
}


class TestSoundex:
    def test_canonical_vectors(self, spark):
        df = spark.createDataFrame(
            [(k,) for k in VECTORS], "name string"
        )
        out = {r["name"]: r["soundex"]
               for r in add_soundex(df, "name").collect()}
        assert out == VECTORS

    def test_duckdb_parity(self, spark):
        import duckdb

        names = list(VECTORS) + ["", "42", "h", "W", "aeiou", "Zzyzx"]
        df = spark.createDataFrame([(n,) for n in names], "name string")
        got_spark = {
            r["name"]: r["soundex"] for r in add_soundex(df, "name").collect()
        }
        con = duckdb.connect()
        expr = soundex_sql("name", g_flag=", 'g'")
        got_duck = dict(
            con.execute(
                f"SELECT name, {expr} FROM (SELECT unnest(?) AS name)",
                [names],
            ).fetchall()
        )
        assert got_spark == got_duck

    def test_empty_and_nonalpha_null(self, spark):
        df = spark.createDataFrame([("",), ("123",)], "name string")
        rows = add_soundex(df, "name").collect()
        assert all(r["soundex"] is None for r in rows)


class TestFellegiSunter:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "id int, agree_name boolean, agree_city boolean"
        )

    def test_weights(self, spark):
        params = {"name": (0.9, 0.1), "city": (0.8, 0.3)}
        df = self._df(
            spark,
            [(1, True, True), (2, True, False), (3, False, None)],
        )
        out = {r["id"]: r["fs_weight"]
               for r in fellegi_sunter_score(df, params).collect()}
        # mirror the op's literal trees exactly: (1.0 - m) is NOT the
        # same float as writing the decimal by hand
        wn = math.log(0.9 / 0.1)
        wnn = math.log((1.0 - 0.9) / (1.0 - 0.1))
        wc = math.log(0.8 / 0.3)
        wcn = math.log((1.0 - 0.8) / (1.0 - 0.3))
        assert out[1] == (0.0 + wn) + wc
        assert out[2] == (0.0 + wn) + wcn
        assert out[3] == (0.0 + wnn) + 0.0  # NULL -> no information

    def test_match_beats_nonmatch(self, spark):
        params = {"name": (0.95, 0.05), "city": (0.9, 0.2)}
        df = self._df(spark, [(1, True, True), (2, False, False)])
        out = {r["id"]: r["fs_weight"]
               for r in fellegi_sunter_score(df, params).collect()}
        assert out[1] > 0 > out[2]

    def test_validation(self, spark):
        df = self._df(spark, [(1, True, True)])
        with pytest.raises(ValueError, match="empty"):
            fellegi_sunter_score(df, {})
        with pytest.raises(ValueError, match="0 < u < m < 1"):
            fellegi_sunter_score(df, {"name": (0.2, 0.5)})
