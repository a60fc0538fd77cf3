"""Unicode normalization ops (ops/textnorm.py): composition/
decomposition cases, idempotence, NULL passthrough, HTML stripping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.textnorm import nfc, strip_accents, strip_html

DECOMPOSED = "café"       # 'cafe' + combining acute
COMPOSED = "café"          # 'café' precomposed
ANGSTROM = "Å"             # Å (ANGSTROM SIGN) -> NFC U+00C5


def _one(spark, val, expr):
    df = spark.createDataFrame([(val,)], "t string")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_nfc_composes(spark):
    assert _one(spark, DECOMPOSED, nfc("t")) == COMPOSED
    assert _one(spark, ANGSTROM, nfc("t")) == "Å"
    assert _one(spark, "plain", nfc("t")) == "plain"
    assert _one(spark, None, nfc("t")) is None


def test_nfc_unifies_spelling_variants_for_dedup(spark):
    df = spark.createDataFrame([(DECOMPOSED,), (COMPOSED,)], "t string")
    assert df.select(nfc("t").alias("n")).distinct().count() == 1


def test_strip_accents(spark):
    assert _one(spark, COMPOSED, strip_accents("t")) == "cafe"
    assert _one(spark, DECOMPOSED, strip_accents("t")) == "cafe"
    assert _one(spark, "naïve", strip_accents("t")) == "naive"
    assert _one(spark, None, strip_accents("t")) is None
    # ligatures are NOT accents -- must survive (compatibility folding
    # is NFKC's job, deliberately out of scope here)
    assert _one(spark, "ﬁne", strip_accents("t")) == "ﬁne"


def test_strip_accents_idempotent(spark):
    df = spark.createDataFrame([(COMPOSED,), ("Zürich Å",)], "t string")
    once = df.select(strip_accents("t").alias("v"))
    twice = once.select(strip_accents("v").alias("v"))
    assert [r["v"] for r in once.collect()] == [r["v"] for r in twice.collect()]


def test_strip_html(spark):
    cases = {
        "<p>hello <b>world</b></p>": "hello world",
        "no tags": "no tags",
        "a < b but <i>x</i>": "a < b but x",
        "<a href='u'>link</a>": "link",
    }
    for raw, want in cases.items():
        assert _one(spark, raw, strip_html("t")) == want


def test_strip_html_is_jvm_only(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "t string")
    plan = (
        df.select(strip_html("t").alias("v"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_composition(spark):
    raw = "<p>Café résumé</p>"
    df = spark.createDataFrame([(raw,)], "t string")
    out = df.select(strip_accents(nfc(strip_html(F.col("t")))).alias("v"))
    assert out.collect()[0]["v"] == "Cafe resume"
