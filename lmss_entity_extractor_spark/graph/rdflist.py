"""RDF collection (rdf:List) flattening — the ordered-container decode
of RDF 1.1 §5.2 / W3C RDF Schema §3.3.3: cons cells chained by
``rdf:rest`` with payloads under ``rdf:first`` become (head, pos, item)
rows.  OWL serializations lean on lists everywhere (owl:unionOf,
owl:intersectionOf, owl:oneOf), so a KG loader that can't flatten them
can't see inside class expressions.

Algorithm: frontier walk from the list HEADS (cons cells that are not
the object of any ``rdf:rest`` — interior cells are, by construction).
Each round emits the payloads at the current position (one equi-join
against the rdf:first slice) and advances every frontier cell one
``rdf:rest`` hop (one equi-join against the rdf:rest slice).  Rounds =
longest list, which for ontology expressions is tens, not millions —
the linear walk is deliberate (a pointer-doubling closure would
materialize O(n·len) pairs for no benefit at that length), and the
loop fails LOUDLY past ``max_len``, which also catches the one input
that would otherwise hang it: a cyclic rdf:rest chain.

Malformed cells pass through untouched rather than guessed at: a cons
cell with no ``rdf:first`` emits nothing at its position (the walk
still advances), one with several emits several rows — both are
data-quality signals the caller can count, not silently repair.

No reference counterpart (the reference's parser never reads class
expressions); extends the KG ingestion family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_FIRST = "rdf:first"
RDF_REST = "rdf:rest"
RDF_NIL = "rdf:nil"


def flatten_lists(
    triples: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    first_pred: str = RDF_FIRST,
    rest_pred: str = RDF_REST,
    nil: str = RDF_NIL,
    max_len: int = 128,
) -> DataFrame:
    """triples(s, p, o) -> (head, pos, item): every well-formed list
    head with its 0-indexed ordered payloads."""
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    firsts = (
        t.filter(F.col("p") == first_pred)
        .select(F.col("s").alias("node"), F.col("o").alias("item"))
        .localCheckpoint(eager=True)
    )
    rests = (
        t.filter(F.col("p") == rest_pred)
        .select(F.col("s").alias("node"), F.col("o").alias("_next"))
        .localCheckpoint(eager=True)
    )
    cons = firsts.select("node").union(rests.select("node")).distinct()
    heads = cons.join(
        rests.select(F.col("_next").alias("node")), "node", "left_anti"
    )
    frontier = heads.select(
        F.col("node").alias("head"), "node", F.lit(0).alias("pos")
    ).localCheckpoint(eager=True)

    spark = triples.sparkSession
    out = spark.createDataFrame(
        [], "head string, pos int, item string"
    )
    for _ in range(max_len):
        if frontier.limit(1).count() == 0:
            return out
        out = out.unionByName(
            frontier.join(firsts, "node").select("head", "pos", "item")
        ).localCheckpoint(eager=True)
        frontier = (
            frontier.join(rests, "node")
            .filter(F.col("_next") != nil)
            .select("head", F.col("_next").alias("node"), (F.col("pos") + 1).alias("pos"))
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"flatten_lists: a list exceeds max_len={max_len} (or the "
        "rdf:rest chain is cyclic) — raise max_len only if such lists "
        "are expected"
    )
