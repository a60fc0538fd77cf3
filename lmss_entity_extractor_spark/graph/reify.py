"""RDF reification (RDF 1.1 Semantics §C / the rdf:Statement
vocabulary): lift each (s, p, o) into four triples under a statement
node, and lower statement nodes back to plain triples.  Reification is
how a 2004-vintage vocabulary says "a triple plus provenance" — KG
pipelines still meet it in legacy ontologies and in exports for
tools that cannot read RDF-star.

Statement nodes are MINTED DETERMINISTICALLY from the triple content
(md5 over the unit-separator-joined terms), not as blank nodes: the
same triple reified on any executor, any run, any cluster size gets
the same node — set-semantic dedup then collapses repeats for free,
and an oracle can re-derive every id.  (A counter- or uuid-based mint
would be partition-order-dependent — exactly the nondeterminism this
repo bans.)

Shapes: ``reify`` is one narrow projection fanned out four ways — zero
shuffles before the final distinct; ``unreify`` is two equi-joins on
the statement node (at most one match per slice for well-formed data).
Malformed reifications pass through visibly: a node missing any of
subject/predicate/object emits nothing (inner joins), one with
duplicated roles emits the cross of its role values — data-quality
signals, never silently repaired (the rdflist.py discipline).

No reference counterpart; extends the KG interchange family
(SURVEY §2.11, sibling of L56 N-Triples I/O).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"
RDF_STATEMENT = "rdf:Statement"
RDF_SUBJECT = "rdf:subject"
RDF_PREDICATE = "rdf:predicate"
RDF_OBJECT = "rdf:object"

_SEP = "\x1f"


def reify(
    triples: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    stmt_prefix: str = "stmt:",
) -> DataFrame:
    """(s, p, o) -> the four reification triples per input triple,
    distinct, under content-addressed statement nodes."""
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    node = F.concat(
        F.lit(stmt_prefix), F.md5(F.concat_ws(_SEP, "s", "p", "o"))
    ).alias("node")
    base = t.select(node, "s", "p", "o")
    return (
        base.select(F.col("node").alias("s"), F.lit(RDF_TYPE).alias("p"), F.lit(RDF_STATEMENT).alias("o"))
        .unionByName(base.select(F.col("node").alias("s"), F.lit(RDF_SUBJECT).alias("p"), F.col("s").alias("o")))
        .unionByName(base.select(F.col("node").alias("s"), F.lit(RDF_PREDICATE).alias("p"), F.col("p").alias("o")))
        .unionByName(base.select(F.col("node").alias("s"), F.lit(RDF_OBJECT).alias("p"), F.col("o").alias("o")))
        .distinct()
    )


def unreify(
    triples: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Collect rdf:subject / rdf:predicate / rdf:object per statement
    node back into plain (s, p, o), distinct.  Non-reification triples
    are ignored; incomplete statement nodes emit nothing."""
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )

    def _role(pred: str, out: str) -> DataFrame:
        return t.filter(F.col("p") == pred).select(
            F.col("s").alias("node"), F.col("o").alias(out)
        )

    return (
        _role(RDF_SUBJECT, "s")
        .join(_role(RDF_PREDICATE, "p"), "node")
        .join(_role(RDF_OBJECT, "o"), "node")
        .select("s", "p", "o")
        .distinct()
    )
