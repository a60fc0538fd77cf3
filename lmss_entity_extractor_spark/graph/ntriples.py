"""N-Triples line-format RDF I/O (W3C N-Triples 1.1): parse a text
table of NT lines into typed triples and format triples back — the
RDF interchange format that actually scales on Spark, because one
line = one triple means `spark.read.text` splits a 100 TB dump into
independent partitions with no cross-line state (Turtle/RDF-XML need
a stateful parser and are driver-side or pre-converted; SURVEY §2.1
S1/S3 cover those at ontology scale).

Everything is JVM-side column expressions — `regexp_extract` for the
grammar, chained `regexp_replace` for the escape rules (ECHAR:
``\\ \" \n \t \r``; a NUL sentinel makes backslash unescaping
order-safe — NUL itself cannot appear unescaped in valid NT).  No
Python UDFs.

Parse output: (s, p, o, o_kind, lang, datatype) — ``o_kind`` ∈
{'iri', 'literal'}; ``o`` is the IRI or the UNESCAPED lexical form;
``lang``/``datatype`` are null unless the literal carries them.
Comment and blank lines are dropped.  Malformed lines: ``mode=
"permissive"`` (default) drops them; ``mode="strict"`` keeps a
``_malformed`` marker so callers can assert emptiness cheaply
(`assert_no_malformed` runs the one bounded action).

Blank nodes (``_:label``) are accepted as subjects and objects and
passed through verbatim in ``s``/``o`` (kind 'iri' — the distinction
RDF cares about is literal vs resource; documented simplification).

Reference counterpart: the reference serializes its graph with
rdflib on the driver (`app/lmss_parser.py:166-169`); this pair is the
distributed re-expression plus the missing parse direction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one NT line: subject (IRI or bnode), predicate IRI, object term, dot
_LINE_RE = r"^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$"
# object alternatives
_OBJ_IRI_RE = r"^(<[^>]*>|_:\S+)$"
_OBJ_LIT_RE = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?$'

_NUL = "\x00"


def _strip_angle(c: Column) -> Column:
    return F.when(
        c.startswith("<"), F.regexp_replace(c, r"^<|>$", "")
    ).otherwise(c)


def _unescape(c: Column) -> Column:
    """ECHAR unescape, order-safe: protect '\\\\' behind a NUL sentinel
    first so '\\\\n' (escaped backslash + n) never becomes a newline."""
    c = F.regexp_replace(c, r"\\\\", _NUL)
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    c = F.regexp_replace(c, r"\\\"", '"')
    return F.regexp_replace(c, _NUL, "\\\\")


def _escape(c: Column) -> Column:
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return F.regexp_replace(c, '"', r'\\"')


def parse_ntriples(
    lines: DataFrame, *, col: str = "value", mode: str = "permissive"
) -> DataFrame:
    """Parse NT ``lines[col]`` into (s, p, o, o_kind, lang, datatype).

    ``mode="permissive"`` drops malformed lines; ``mode="strict"``
    adds a ``_malformed`` string column (null for good rows) carrying
    the offending line — pair with ``assert_no_malformed``."""
    if mode not in ("permissive", "strict"):
        raise ValueError(f"mode must be permissive|strict, got {mode!r}")
    raw = lines.select(F.col(col).alias("_line")).filter(
        ~F.col("_line").rlike(r"^\s*(#|$)")
    )
    parts = raw.select(
        "_line",
        F.regexp_extract("_line", _LINE_RE, 1).alias("_s"),
        F.regexp_extract("_line", _LINE_RE, 2).alias("_p"),
        F.regexp_extract("_line", _LINE_RE, 3).alias("_obj"),
    )
    is_line = F.col("_line").rlike(_LINE_RE)
    is_iri_obj = F.col("_obj").rlike(_OBJ_IRI_RE)
    is_lit_obj = F.col("_obj").rlike(_OBJ_LIT_RE)
    ok = is_line & (is_iri_obj | is_lit_obj)

    lit_body = F.regexp_extract("_obj", _OBJ_LIT_RE, 1)
    parsed = parts.select(
        _strip_angle(F.col("_s")).alias("s"),
        F.col("_p").alias("p"),
        F.when(is_iri_obj, _strip_angle(F.col("_obj")))
        .otherwise(_unescape(lit_body))
        .alias("o"),
        F.when(is_iri_obj, F.lit("iri")).otherwise(F.lit("literal")).alias("o_kind"),
        F.nullif(F.regexp_extract("_obj", _OBJ_LIT_RE, 2), F.lit("")).alias("lang"),
        F.nullif(F.regexp_extract("_obj", _OBJ_LIT_RE, 3), F.lit("")).alias("datatype"),
        ok.alias("_ok"),
        F.col("_line"),
    )
    if mode == "strict":
        return parsed.select(
            "s",
            "p",
            "o",
            "o_kind",
            "lang",
            "datatype",
            F.when(~F.col("_ok"), F.col("_line")).alias("_malformed"),
        )
    return parsed.filter(F.col("_ok")).drop("_ok", "_line")


def assert_no_malformed(parsed: DataFrame) -> DataFrame:
    """For strict-mode output: fail loudly on the first malformed line,
    else return the clean (s,p,o,o_kind,lang,datatype) table.  One
    bounded action (limit 3)."""
    bad = [
        r["_malformed"]
        for r in parsed.filter(F.col("_malformed").isNotNull())
        .select("_malformed")
        .limit(3)
        .collect()
    ]
    if bad:
        raise ValueError(f"malformed N-Triples lines (first {len(bad)}): {bad}")
    return parsed.drop("_malformed")


def to_ntriples(
    triples: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    o_kind_col: str | None = "o_kind",
    lang_col: str | None = "lang",
    datatype_col: str | None = "datatype",
) -> DataFrame:
    """Format triples as one NT line per row (column ``value``).  With
    ``o_kind_col=None`` every object is treated as an IRI (the plain
    s/p/o graph-table case).  Bnode ids (``_:x``) are emitted without
    angle brackets, as the grammar requires."""
    s = F.col(s_col)
    o = F.col(o_col)
    term_s = F.when(s.startswith("_:"), s).otherwise(F.concat(F.lit("<"), s, F.lit(">")))
    iri_o = F.when(o.startswith("_:"), o).otherwise(F.concat(F.lit("<"), o, F.lit(">")))
    if o_kind_col is None:
        term_o = iri_o
    else:
        # lang and datatype are mutually exclusive in the grammar;
        # lang wins if a caller supplies both
        suffix = F.lit("")
        if datatype_col is not None:
            suffix = F.when(
                F.col(datatype_col).isNotNull(),
                F.concat(F.lit("^^<"), F.col(datatype_col), F.lit(">")),
            ).otherwise(suffix)
        if lang_col is not None:
            suffix = F.when(
                F.col(lang_col).isNotNull(), F.concat(F.lit("@"), F.col(lang_col))
            ).otherwise(suffix)
        lit = F.concat(F.lit('"'), _escape(o), F.lit('"'), suffix)
        term_o = F.when(F.col(o_kind_col) == "literal", lit).otherwise(iri_o)
    return triples.select(
        F.concat(
            term_s,
            F.lit(" <"),
            F.col(p_col),
            F.lit("> "),
            term_o,
            F.lit(" ."),
        ).alias("value")
    )
