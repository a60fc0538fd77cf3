"""N-Triples I/O (graph/ntriples.py, L56): grammar cases hand-checked,
escape round-trips on adversarial strings, strict-mode failure path."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.ntriples import (
    assert_no_malformed,
    parse_ntriples,
    to_ntriples,
)

PARSED_SCHEMA = (
    "s string, p string, o string, o_kind string, lang string, datatype string"
)


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def _rows(df):
    cols = ["s", "p", "o", "o_kind", "lang", "datatype"]
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


class TestParse:
    def test_grammar_cases(self, spark):
        got = _rows(
            parse_ntriples(
                _lines(
                    spark,
                    [
                        "<http://a> <http://p> <http://b> .",
                        '<http://a> <http://p> "plain" .',
                        '<http://a> <http://p> "hola"@es .',
                        '<http://a> <http://p> "42"^^<http://int> .',
                        "_:b0 <http://p> _:b1 .",
                        "# a comment",
                        "   ",
                        "  <http://a>   <http://p>   <http://c>  .  ",
                    ],
                )
            )
        )
        assert got == {
            ("http://a", "http://p", "http://b", "iri", None, None),
            ("http://a", "http://p", "plain", "literal", None, None),
            ("http://a", "http://p", "hola", "literal", "es", None),
            ("http://a", "http://p", "42", "literal", None, "http://int"),
            ("_:b0", "http://p", "_:b1", "iri", None, None),
            ("http://a", "http://p", "http://c", "iri", None, None),
        }

    def test_escapes_unescaped(self, spark):
        got = _rows(
            parse_ntriples(
                _lines(
                    spark,
                    [
                        r'<http://a> <http://p> "tab\there" .',
                        r'<http://a> <http://p> "quote\"q" .',
                        r'<http://a> <http://p> "bs\\n stays" .',
                    ],
                )
            )
        )
        assert got == {
            ("http://a", "http://p", "tab\there", "literal", None, None),
            ("http://a", "http://p", 'quote"q', "literal", None, None),
            # \\n is an escaped backslash followed by 'n', NOT a newline
            ("http://a", "http://p", "bs\\n stays", "literal", None, None),
        }

    def test_permissive_drops_malformed(self, spark):
        out = parse_ntriples(
            _lines(spark, ["garbage", "<http://a> <http://p> <http://b> ."])
        )
        assert out.count() == 1

    def test_strict_flags_malformed(self, spark):
        out = parse_ntriples(
            _lines(spark, ["<http://a> <http://p> nonsense .", "garbage"]),
            mode="strict",
        )
        with pytest.raises(ValueError, match="malformed N-Triples"):
            assert_no_malformed(out)

    def test_strict_clean_passthrough(self, spark):
        out = parse_ntriples(
            _lines(spark, ["<http://a> <http://p> <http://b> ."]), mode="strict"
        )
        clean = assert_no_malformed(out)
        assert clean.count() == 1 and "_malformed" not in clean.columns

    def test_mode_validated(self, spark):
        with pytest.raises(ValueError, match="permissive|strict"):
            parse_ntriples(_lines(spark, []), mode="lenient")


class TestFormat:
    def test_hand_computed_lines(self, spark):
        trips = spark.createDataFrame(
            [
                ("http://a", "http://p", "http://b", "iri", None, None),
                ("http://a", "http://p", "hi", "literal", None, None),
                ("http://a", "http://p", "hola", "literal", "es", None),
                ("http://a", "http://p", "42", "literal", None, "http://int"),
                ("_:b0", "http://p", "_:b1", "iri", None, None),
            ],
            PARSED_SCHEMA,
        )
        got = {r["value"] for r in to_ntriples(trips).collect()}
        assert got == {
            "<http://a> <http://p> <http://b> .",
            '<http://a> <http://p> "hi" .',
            '<http://a> <http://p> "hola"@es .',
            '<http://a> <http://p> "42"^^<http://int> .',
            "_:b0 <http://p> _:b1 .",
        }

    def test_plain_spo_mode(self, spark):
        trips = spark.createDataFrame([("a", "p", "b")], "s string, p string, o string")
        got = [r["value"] for r in to_ntriples(trips, o_kind_col=None).collect()]
        assert got == ["<a> <p> <b> ."]


class TestRoundTrip:
    ADVERSARIAL = [
        'she said "hi"',
        "line1\nline2",
        "tab\tsep",
        "back\\slash",
        "trailing backslash\\",
        '\\"tricky',
        "\\n not a newline",
        "carriage\rreturn",
        "",
    ]

    def test_escape_round_trip(self, spark):
        trips = spark.createDataFrame(
            [("http://s", "http://p", v, "literal", None, None) for v in self.ADVERSARIAL],
            PARSED_SCHEMA,
        )
        back = parse_ntriples(to_ntriples(trips), mode="strict")
        clean = assert_no_malformed(back)
        assert _rows(clean) == _rows(trips)
        assert clean.count() == len(self.ADVERSARIAL)
