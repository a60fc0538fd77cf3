"""SPARQL 1.1 property-path evaluation over a triple table: compile a
path expression to a (subj, obj) DataFrame — the navigational
companion to graph/bgp.py's pattern matching (SPARQL 1.1 §9; the W3C
"ALP" semantics for arbitrary-length operators).

Path expressions are a tiny AST (no string parser — the caller is
Python, tuples compose fine):

    "pred"                      atomic link  (subj pred obj)
    ("seq", p1, p2, ...)        p1 / p2      sequence
    ("alt", p1, p2, ...)        p1 | p2      alternative
    ("inv", p)                  ^p           inverse
    ("neg", "p1", "p2", ...)    !(p1|...)    negated property set
    ("plus", p)                 p+           one-or-more
    ("star", p)                 p*           zero-or-more
    ("opt", p)                  p?           zero-or-one

Semantics note (documented contract choice): results are SET-semantic
— every combinator ends ``distinct``.  The SPARQL spec gives fixed-
length operators multiset multiplicity (counting intermediate
witnesses) but mandates duplicate-free results for ``+``/``*``;
deployed stores disagree with each other here, and for a bulk engine
the set answer is the useful one.  Zero-length paths (``star``,
``opt``) match every TERM of the graph — all distinct subjects and
objects — per the spec's eval(Path0) definition.

Compilation, Spark-first:

- atomic = one predicate filter of the shared scan (pushed down);
- seq = chained inner equi-joins on the junction variable;
- alt = unionByName + distinct;
- inv = column swap (free);
- plus = graph/closure.py's iterative-self-join fixpoint over the
  DISTINCT edge set of the inner path (hierarchy-depth rounds,
  localCheckpoint per round);
- star/opt = plus/inner ∪ the identity relation over graph terms —
  the term set is one distinct over (s ∪ o), computed only when a
  zero-length operator actually appears.

Scale shape (100 TB triples): atomic slices are predicate-pruned
scans; every combinator is joins/unions/distincts on (subj, obj) —
one keyed shuffle each, nothing driver-side, nothing quadratic in the
graph (``plus`` is linear rounds in hierarchy depth, the same cost
J4's ontology closure already pays).

Reference counterpart: none (the reference walks its JSON graph in
Python per query, `app/lmss_classification.py:163-165`); part of the
beyond-reference KG mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .closure import transitive_closure

_COMBINATORS = ("seq", "alt", "inv", "plus", "star", "opt", "neg")


def _terms(g: DataFrame) -> DataFrame:
    """All graph terms, as the identity relation (subj == obj)."""
    nodes = g.select(F.col("s").alias("subj")).union(
        g.select(F.col("o").alias("subj"))
    ).distinct()
    return nodes.withColumn("obj", F.col("subj"))


def _eval(g: DataFrame, path, max_iterations: int) -> DataFrame:
    if isinstance(path, str):
        return g.filter(F.col("p") == path).select(
            F.col("s").alias("subj"), F.col("o").alias("obj")
        )
    if not isinstance(path, tuple) or not path or path[0] not in _COMBINATORS:
        raise ValueError(
            f"bad path expression {path!r}: expected a predicate string or "
            f"a tuple starting with one of {_COMBINATORS}"
        )
    op, *args = path
    if op in ("inv", "plus", "star", "opt") and len(args) != 1:
        raise ValueError(f"{op} takes exactly one sub-path, got {len(args)}")
    if op in ("seq", "alt") and len(args) < 2:
        raise ValueError(f"{op} takes at least two sub-paths, got {len(args)}")

    if op == "seq":
        out = _eval(g, args[0], max_iterations)
        for sub in args[1:]:
            nxt = _eval(g, sub, max_iterations).withColumnsRenamed(
                {"subj": "_mid", "obj": "_next"}
            )
            out = (
                out.join(nxt, out["obj"] == nxt["_mid"], "inner")
                .select("subj", F.col("_next").alias("obj"))
                .distinct()
            )
        return out
    if op == "alt":
        out = _eval(g, args[0], max_iterations)
        for sub in args[1:]:
            out = out.unionByName(_eval(g, sub, max_iterations))
        return out.distinct()
    if op == "inv":
        inner = _eval(g, args[0], max_iterations)
        return inner.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
    if op == "neg":
        # SPARQL 1.1 §9.2 negated property set, forward form !(p1|...|pn):
        # every triple whose predicate is OUTSIDE the set.  The spec's
        # mixed form with inverse members decomposes onto this:
        # !(^p) == ("inv", ("neg", "p")) — a column swap over the same
        # slice — so one combinator covers the grammar.
        if not args or not all(isinstance(a, str) for a in args):
            raise ValueError("neg takes one or more predicate strings")
        return (
            g.filter(~F.col("p").isin(list(args)))
            .select(F.col("s").alias("subj"), F.col("o").alias("obj"))
            .distinct()
        )
    if op == "plus":
        edges = _eval(g, args[0], max_iterations).distinct()
        return (
            transitive_closure(
                edges, "subj", "obj", include_self=False, max_iterations=max_iterations
            )
            .select(F.col("desc_iri").alias("subj"), F.col("anc_iri").alias("obj"))
            .distinct()
        )
    if op == "star":
        plus = _eval(g, ("plus", args[0]), max_iterations)
        return plus.unionByName(_terms(g)).distinct()
    # opt
    inner = _eval(g, args[0], max_iterations)
    return inner.unionByName(_terms(g)).distinct()


def property_path(
    triples: DataFrame,
    path,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_iterations: int = 30,
) -> DataFrame:
    """Evaluate ``path`` over ``triples``; returns distinct (subj, obj)
    pairs connected by the path.  ``max_iterations`` bounds the
    ``plus``/``star`` fixpoint (loud failure past it, never a silent
    partial closure — closure.py's contract)."""
    g = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    return _eval(g, path, max_iterations)
