"""URL normalization / domain curation (ops/urls.py).

Each normalization rule gets a hand-written case; garbage URLs must
surface as NULL, not echo through; domain_stats must count duplicates
created ONLY by normalization.
"""

from __future__ import annotations

import pytest

from lmss_entity_extractor_spark.ops.urls import (
    domain_stats,
    normalize_url,
    normalize_urls,
    registered_domain,
)


def _norm_one(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(normalize_url("url").alias("n")).collect()[0]["n"]


CASES = [
    # scheme + host case-folding
    ("HTTPS://Example.COM/a", "https://example.com/a"),
    # www strip (one label only)
    ("http://www.example.com/a", "http://example.com/a"),
    ("http://www.www.example.com/a", "http://www.example.com/a"),
    # default ports dropped, non-default kept, cross-scheme not dropped
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com:443/a", "http://example.com:443/a"),
    # empty path -> /
    ("http://example.com", "http://example.com/"),
    # fragment dropped
    ("http://example.com/a#sec", "http://example.com/a"),
    # bare '?' dropped; params sorted; value order inside a param kept
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?a=1&b=2", "http://example.com/a?a=1&b=2"),
    # everything at once
    (
        "HTTP://WWW.Ex.COM:80?z=9&a=1#f",
        "http://ex.com/?a=1&z=9",
    ),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_rules(spark, raw, expected):
    assert _norm_one(spark, raw) == expected


@pytest.mark.parametrize(
    "garbage", ["", "not a url", "example.com/nopath", "://missing.scheme"]
)
def test_garbage_is_null_not_echo(spark, garbage):
    assert _norm_one(spark, garbage) is None


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [
            ("http://a.b.example.com/x",),
            ("http://example.org/x",),
            ("http://localhost/x",),
        ],
        "url string",
    )
    out = [
        r["d"]
        for r in df.select(
            registered_domain(normalize_url("url")).alias("d")
        ).collect()
    ]
    assert out == ["example.com", "example.org", None]


def test_domain_stats_counts_norm_dups(spark):
    # three spellings of ONE resource + one distinct URL on example.com,
    # one on other.org, one garbage row
    rows = [
        ("https://example.com/a?x=1&y=2",),
        ("HTTPS://EXAMPLE.com/a?y=2&x=1",),
        ("https://www.example.com:443/a?x=1&y=2",),
        ("https://example.com/b",),
        ("http://other.org/c",),
        ("garbage",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {
        r["domain"]: (r["n_rows"], r["n_urls"], r["n_dup_rows"])
        for r in domain_stats(df).collect()
    }
    assert got["example.com"] == (4, 2, 2)
    assert got["other.org"] == (1, 1, 0)
    assert got[None] == (1, 0, 1)


def test_normalize_urls_is_projection_only(spark):
    df = spark.createDataFrame([("http://a.example.com/x",)], "url string")
    plan = normalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: fuses into the scan
