"""RDFS entailment materialization (the ρdf fragment): close a triple
table under the standard RDFS inference rules — the reasoning step a
KG-construction pipeline runs after triple emission so that downstream
queries see implied facts without per-query traversals.

Rules materialized (names from the RDF Semantics spec; the fragment is
the "minimal RDFS" of Muñoz, Pérez & Gutierrez, ESWC'07):

- rdfs5  (p ⊑ q) ∧ (q ⊑ r)      → p ⊑ r        (subPropertyOf closure)
- rdfs11 (A ⊑ B) ∧ (B ⊑ C)      → A ⊑ C        (subClassOf closure)
- rdfs7  (s p o) ∧ (p ⊑* q)     → (s q o)
- rdfs2  (s p o) ∧ (p domain C) → (s type C)
- rdfs3  (s p o) ∧ (p range C)  → (o type C)
- rdfs9  (s type A) ∧ (A ⊑* B)  → (s type B)

Fixpoint in ONE stratified pass: every derived triple's predicate is
``type_pred`` (rdfs2/3/9) or a superproperty of an asserted predicate
(rdfs7), so re-running the rules can add nothing new UNLESS the schema
speaks about the RDFS vocabulary itself (e.g. ``rdf:type ⊑ p`` or a
domain declared FOR ``rdfs:subClassOf``).  That meta-schema corner is
outside the ρdf fragment and is rejected loudly rather than silently
under-entailed — see ``_reject_meta_schema``.  The stratification order
is: property closure → rdfs7 → rdfs2/3 over the rdfs7-EXPANDED graph
(a domain on a superproperty must fire for triples asserted on the
subproperty) → class closure → rdfs9 over ALL type triples.

Scale shape (100 TB instance data, ontology-sized schema): both
closures run on the schema only (graph/closure.py fixpoint, hierarchy-
depth rounds) and are broadcast into every instance-side join — the
instance table is scanned, multiplied by the (small) per-predicate
superproperty / domain / range fan-out, and never shuffled until the
final semantics-required ``distinct``.  That one keyed shuffle is the
whole cost; at 1000 executors it is the same dedup shuffle every KG
load already pays for triple canonicalization.

Reference counterpart: the reference's per-query Python recursion over
the class hierarchy (app/lmss_classification.py:163-165) answers ONE
descendant probe at a time; this operator materializes the entailment
once so the 100 TB graph can be queried flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .closure import transitive_closure

#: predicate spellings follow the compact qname style of graph/triples.py
TYPE_PRED = "rdf:type"
SUBCLASS_PRED = "rdfs:subClassOf"
SUBPROP_PRED = "rdfs:subPropertyOf"
DOMAIN_PRED = "rdfs:domain"
RANGE_PRED = "rdfs:range"

_SCHEMA_PREDS = (SUBCLASS_PRED, SUBPROP_PRED, DOMAIN_PRED, RANGE_PRED)


def _reject_meta_schema(schema: DataFrame, type_pred: str) -> None:
    """Loud failure on schema-about-schema: a subject or a subPropertyOf
    parent drawn from the reserved vocabulary breaks the one-pass
    fixpoint argument (derived triples could fire new rules), so refuse
    instead of silently under-entailing.  The schema is ontology-sized —
    this is a bounded driver-side check, not a data scan."""
    reserved = {type_pred, *_SCHEMA_PREDS}
    bad = (
        schema.filter(
            F.col("s").isin(*reserved)
            | (F.col("p").isin(SUBPROP_PRED) & F.col("o").isin(*reserved))
        )
        .limit(5)
        .collect()
    )
    if bad:
        rows = [(r["s"], r["p"], r["o"]) for r in bad]
        raise ValueError(
            "rdfs_entail: schema speaks about the RDFS vocabulary itself "
            f"(first offenders: {rows}) — outside the one-pass ρdf fragment; "
            "materialize with an iterative reasoner instead"
        )


def _strict_closure(edges: DataFrame, max_iterations: int) -> DataFrame:
    """(child, parent) pairs at distance >= 1 — transitive_closure minus
    the reflexive rows, renamed for the broadcast probe side."""
    return (
        transitive_closure(
            edges, "c", "p", include_self=False, max_iterations=max_iterations
        )
        .select(F.col("desc_iri").alias("sub"), F.col("anc_iri").alias("sup"))
    )


def rdfs_entail(
    triples: DataFrame,
    schema: DataFrame | None = None,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    type_pred: str = TYPE_PRED,
    include_asserted: bool = True,
    max_iterations: int = 30,
) -> DataFrame:
    """Materialize the RDFS closure of ``triples``: returns (s, p, o)
    with every rule-derived triple added, ``distinct``.

    ``schema`` carries the subClassOf / subPropertyOf / domain / range
    rows (same s/p/o shape).  If None, schema rows are SPLIT OUT of
    ``triples`` by predicate — the usual single-graph RDF layout — and
    re-enter the result (closed under rdfs5/rdfs11) alongside the
    instance triples.  ``include_asserted=False`` returns only the
    NEWLY derived triples (the delta a load job appends)."""
    g = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).filter(F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull())

    if schema is None:
        sch = g.filter(F.col("p").isin(*_SCHEMA_PREDS))
        inst = g.filter(~F.col("p").isin(*_SCHEMA_PREDS))
    else:
        # a separately-passed schema may use the triples' column names
        # or the plain s/p/o spelling (the usual literal-DataFrame case
        # when the fact table has renamed columns like subj/pred/obj)
        if s_col in schema.columns:
            cols = (s_col, p_col, o_col)
        elif "s" in schema.columns:
            cols = ("s", "p", "o")
        else:
            raise ValueError(
                f"schema must carry columns ({s_col}, {p_col}, {o_col}) or "
                f"(s, p, o); got {schema.columns}"
            )
        sch = schema.select(
            F.col(cols[0]).alias("s"),
            F.col(cols[1]).alias("p"),
            F.col(cols[2]).alias("o"),
        )
        inst = g
    _reject_meta_schema(sch, type_pred)
    # the schema is read by FOUR closures/joins below and is the output of
    # an upstream plan — pin it once (ontology-sized by contract)
    sch = sch.localCheckpoint(eager=True)

    subprop = sch.filter(F.col("p") == SUBPROP_PRED).select(
        F.col("s").alias("c"), F.col("o").alias("p")
    )
    subclass = sch.filter(F.col("p") == SUBCLASS_PRED).select(
        F.col("s").alias("c"), F.col("o").alias("p")
    )
    prop_clo = _strict_closure(subprop, max_iterations)
    class_clo = _strict_closure(subclass, max_iterations)

    # rdfs7: instance triples restated under every (strict) superproperty;
    # G1 = the property-expanded graph the domain/range rules read
    lifted = inst.join(
        F.broadcast(prop_clo), inst["p"] == prop_clo["sub"], "inner"
    ).select("s", F.col("sup").alias("p"), "o")
    g1 = inst.unionByName(lifted)

    dom = sch.filter(F.col("p") == DOMAIN_PRED).select(
        F.col("s").alias("dp"), F.col("o").alias("cls")
    )
    rng = sch.filter(F.col("p") == RANGE_PRED).select(
        F.col("s").alias("rp"), F.col("o").alias("cls")
    )
    # rdfs2 / rdfs3 over the expanded graph
    typed_dom = g1.join(F.broadcast(dom), g1["p"] == dom["dp"], "inner").select(
        "s", F.lit(type_pred).alias("p"), F.col("cls").alias("o")
    )
    typed_rng = g1.join(F.broadcast(rng), g1["p"] == rng["rp"], "inner").select(
        F.col("o").alias("s"), F.lit(type_pred).alias("p"), F.col("cls").alias("o")
    )

    types = (
        g1.filter(F.col("p") == type_pred)
        .unionByName(typed_dom)
        .unionByName(typed_rng)
    )
    # rdfs9: propagate every type triple up the (strict) class closure
    super_types = types.join(
        F.broadcast(class_clo), types["o"] == class_clo["sub"], "inner"
    ).select("s", "p", F.col("sup").alias("o"))

    # rdfs5 / rdfs11: the closed schema itself is entailed
    closed_schema = prop_clo.select(
        F.col("sub").alias("s"), F.lit(SUBPROP_PRED).alias("p"), F.col("sup").alias("o")
    ).unionByName(
        class_clo.select(
            F.col("sub").alias("s"),
            F.lit(SUBCLASS_PRED).alias("p"),
            F.col("sup").alias("o"),
        )
    )

    derived = lifted.unionByName(typed_dom).unionByName(typed_rng).unionByName(
        super_types
    ).unionByName(closed_schema)
    if include_asserted:
        out = inst.unionByName(sch).unionByName(derived)
    else:
        # the delta only: derived minus anything already asserted
        out = derived.join(inst.unionByName(sch), ["s", "p", "o"], "left_anti")
    return out.distinct()
