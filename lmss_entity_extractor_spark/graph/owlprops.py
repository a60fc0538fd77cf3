"""OWL property-semantics entailment — the property-rule subset of
OWL 2 RL (W3C OWL 2 Profiles §4.3: prp-inv1/2, prp-symp, prp-trp):

- owl:inverseOf   (p inv q): (s p o) → (o q s), both directions;
- owl:SymmetricProperty:     (s p o) → (o p s);
- owl:TransitiveProperty:    per-predicate transitive closure.

Complements graph/rdfs.py (the ρdf class/property-hierarchy rules);
interaction with subPropertyOf is OUT of this fragment (compose the two
operators and re-run to a joint fixpoint if a schema needs it —
documented boundary, same spirit as rdfs_entail's meta-schema guard).

Completeness argument for the staged plan below:

1. inverse/symmetric only MIRROR triples between predicates, so their
   joint fixpoint is captured by closing the PREDICATE-mirror graph
   first: predicates are nodes, inverseOf edges flip orientation
   (parity 1), symmetric declarations are parity-1 self-loops; BFS
   with path parity (driver-side — the schema is ontology-sized, the
   same bounded-collect contract as rdfs._reject_meta_schema) yields
   every (p, q, parity) mirror pair, applied to the instance data in
   ONE broadcast join.
2. a predicate is closed transitively if IT or ANY mirror partner is
   declared transitive (the inverse of a transitive property is
   transitive); closure runs over the mirror-EXPANDED edge set, keyed
   by (predicate, node) — the graph/closure.py fixpoint with the
   predicate riding the join key, so distinct predicates never mix.
3. mirrors are applied once more over the closure output (reversal
   preserves transitive closedness, so no further rounds can add
   anything) and the result is deduplicated — the one full shuffle.

Scale shape: schema-side work is ontology-sized; instance triples meet
only broadcast joins until the final semantics-required distinct —
the same one-keyed-shuffle budget as rdfs_entail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TYPE_PRED = "rdf:type"
INVERSE_PRED = "owl:inverseOf"
SYMMETRIC_CLS = "owl:SymmetricProperty"
TRANSITIVE_CLS = "owl:TransitiveProperty"

_SCHEMA_MARKERS = (INVERSE_PRED, SYMMETRIC_CLS, TRANSITIVE_CLS)


def _mirror_map(inv_pairs, sym_props):
    """BFS with parity over the predicate-mirror graph -> sorted
    [(p, q, parity)] with parity 0 = same orientation, 1 = flipped;
    the identity (p, p, 0) rows are implicit and not returned."""
    adj: dict[str, set[tuple[str, int]]] = {}

    def _add(a, b, par):
        adj.setdefault(a, set()).add((b, par))

    for p, q in inv_pairs:
        _add(p, q, 1)
        _add(q, p, 1)
    for p in sym_props:
        _add(p, p, 1)
    out = set()
    for start in sorted(adj):
        seen = {(start, 0)}
        frontier = [(start, 0)]
        while frontier:
            nxt = []
            for node, par in frontier:
                for m, epar in adj.get(node, ()):
                    state = (m, (par + epar) % 2)
                    if state not in seen:
                        seen.add(state)
                        nxt.append(state)
            frontier = nxt
        out.update(
            (start, q, par) for q, par in seen if (q, par) != (start, 0)
        )
    return sorted(out)


def owl_entail(
    triples: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_iterations: int = 30,
) -> DataFrame:
    """Materialize the inverse/symmetric/transitive closure of
    ``triples`` (schema rows ride along in the same graph, as usual
    for RDF): returns (s, p, o), distinct, asserted triples included."""
    g = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).filter(F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull())

    # schema rows: bounded driver-side collect (ontology-sized contract)
    inv_pairs = [
        (r["s"], r["o"])
        for r in g.filter(F.col("p") == INVERSE_PRED).collect()
    ]
    marks = g.filter(
        (F.col("p") == TYPE_PRED)
        & F.col("o").isin(SYMMETRIC_CLS, TRANSITIVE_CLS)
    ).collect()
    sym_props = sorted({r["s"] for r in marks if r["o"] == SYMMETRIC_CLS})
    trans_declared = {r["s"] for r in marks if r["o"] == TRANSITIVE_CLS}

    mirrors = _mirror_map(inv_pairs, sym_props)
    spark = g.sparkSession

    inst = g.filter(
        (F.col("p") != INVERSE_PRED)
        & ~((F.col("p") == TYPE_PRED) & F.col("o").isin(*_SCHEMA_MARKERS))
    )

    def _mirror_expand(df: DataFrame) -> DataFrame:
        if not mirrors:
            return df
        m = F.broadcast(
            spark.createDataFrame(mirrors, "mp string, mq string, parity int")
        )
        j = df.join(m, df["p"] == F.col("mp"))
        return df.unionByName(
            j.select(
                F.when(F.col("parity") == 0, F.col("s")).otherwise(F.col("o")).alias("s"),
                F.col("mq").alias("p"),
                F.when(F.col("parity") == 0, F.col("o")).otherwise(F.col("s")).alias("o"),
            )
        )

    expanded = _mirror_expand(inst)

    # transitive: a predicate is closed if it or any mirror partner is
    # declared transitive
    trans_props = set(trans_declared)
    for p, q, _ in mirrors:
        if p in trans_declared:
            trans_props.add(q)
        if q in trans_declared:
            trans_props.add(p)
    if trans_props:
        tedges = expanded.filter(F.col("p").isin(*sorted(trans_props)))
        closed = _per_pred_closure(tedges, max_iterations)
        expanded = expanded.unionByName(closed)

    # schema rows re-enter the output asserted-as-given
    schema_rows = g.filter(
        (F.col("p") == INVERSE_PRED)
        | ((F.col("p") == TYPE_PRED) & F.col("o").isin(*_SCHEMA_MARKERS))
    )
    return _mirror_expand(expanded).unionByName(schema_rows).distinct()


def _per_pred_closure(edges: DataFrame, max_iterations: int) -> DataFrame:
    """Transitive closure of (s, p, o) edge sets, independently per p —
    the graph/closure.py fixpoint with the predicate riding the key."""
    spark = edges.sparkSession
    _CP = "spark.sql.constraintPropagation.enabled"
    prev_cp = spark.conf.get(_CP, "true")
    spark.conf.set(_CP, "false")
    try:
        base = edges.select("s", "p", "o").distinct().localCheckpoint(eager=True)
        closure = base
        frontier = base
        for _ in range(max_iterations):
            ext = (
                frontier.alias("f")
                .join(
                    base.alias("e"),
                    (F.col("f.p") == F.col("e.p"))
                    & (F.col("f.o") == F.col("e.s")),
                )
                .select(F.col("f.s").alias("s"), F.col("f.p").alias("p"), F.col("e.o").alias("o"))
            )
            new = ext.join(closure, ["s", "p", "o"], "left_anti").distinct().localCheckpoint(eager=True)
            if new.limit(1).count() == 0:
                return closure
            closure = closure.unionByName(new).localCheckpoint(eager=True)
            frontier = new
        raise RuntimeError(
            f"owl_entail transitive closure did not converge within "
            f"{max_iterations} rounds"
        )
    finally:
        spark.conf.set(_CP, prev_cp)
