"""SPARQL basic-graph-pattern (BGP) matching over a triple table:
compile a list of triple patterns with shared variables into a
DataFrame join plan and return the solution mappings — the read-side
query surface of a KG engine (SPARQL 1.1 §18.3.1, restricted to BGPs;
FILTER/OPTIONAL/UNION compose on top as plain DataFrame ops).

Pattern syntax: each pattern is a (s, p, o) string triple; a term
starting with ``?`` is a variable, anything else is a constant.  The
result has ONE COLUMN PER DISTINCT VARIABLE (named without the ``?``)
and one row per solution mapping.  Because an RDF graph is a SET of
triples, every per-pattern relation is duplicate-free over its
variable columns, and inner-joining on the shared variables keeps the
result duplicate-free — SPARQL's multiset semantics degenerates to
set semantics here, with multiplicity 1 (documented; no distinct is
spent enforcing it).

Compilation, Spark-first:

- each pattern = one filter of the SAME scan by its constants (+ an
  equality filter when a variable repeats inside the pattern), then a
  rename-projection of its variable positions — Catalyst pushes the
  constant filters into the parquet scan and prunes to s/p/o columns;
- patterns are folded left-to-right with inner equi-joins on the
  variables shared with everything already folded (the caller's
  pattern order is the join order — selective patterns first is the
  classic BGP heuristic; AQE still re-plans sides at runtime);
- a pattern sharing NO variable with the prefix is a genuine cross
  product (SPARQL allows it); it is built with an explicit crossJoin
  so the plan says what the query says;
- a pattern with NO variables is an existence gate: the result keeps
  all other solutions if the triple is present, else is empty —
  compiled as a crossJoin with a ``limit(1)`` probe.

Scale shape (100 TB triples): every join is a hash equi-join on
binding columns; nothing driver-side.  For star queries (shared
subject variable) the folds chain on one key — a single shuffle
partitioning is reused across stages.  Predicate-constant patterns
benefit from a table PARTITIONED BY predicate (partition pruning);
that layout choice belongs to the caller's sink.

Reference counterpart: the reference answers fixed questions with
hand-written Python loops over its JSON graph (`app/lmss_search.py`);
a declarative BGP surface is part of the beyond-reference mandate
(SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ("s", "p", "o")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _var_name(term: str) -> str:
    name = term[1:]
    if not name:
        raise ValueError("bare '?' is not a valid variable name")
    return name


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Match ``patterns`` against ``triples`` and return the solution
    mappings, one column per distinct variable."""
    g = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    return _match(g, patterns, _POSITIONS, "bgp_match")


def bgp_match_quads(
    quads: DataFrame,
    patterns: list[tuple[str, str, str, str]],
    *,
    g_col: str = "g",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL GRAPH clause over a QUAD table (named graphs, SPARQL 1.1
    §13): each pattern is (g, s, p, o); a variable graph term binds the
    graph name into the solutions (``GRAPH ?g { ... }`` = repeat ?g in
    each pattern of the group), a constant pins the group to one named
    graph.  Same compilation as ``bgp_match`` with the graph name as a
    fourth position — constant graph terms push into the scan, which is
    the partition filter when the quad table is PARTITIONED BY graph
    (the natural 100 TB layout for multi-tenant KGs)."""
    q = quads.select(
        F.col(g_col).alias("g"),
        F.col(s_col).alias("s"),
        F.col(p_col).alias("p"),
        F.col(o_col).alias("o"),
    )
    return _match(q, patterns, ("g",) + _POSITIONS, "bgp_match_quads")


def _match(g: DataFrame, patterns, positions, who: str) -> DataFrame:
    """Shared BGP fold over an n-position term table (docstring at the
    module head; ``positions`` is ("s","p","o") for triples, prefixed
    with "g" for quads)."""
    if not patterns:
        raise ValueError(f"{who}: empty pattern list")
    for pat in patterns:
        if len(pat) != len(positions):
            raise ValueError(
                f"{who}: pattern must have {len(positions)} terms, got {pat!r}"
            )

    result: DataFrame | None = None
    bound: set[str] = set()
    gates: list[DataFrame] = []
    for i, pat in enumerate(patterns):
        rel = g
        # constant filters first — these reach the scan
        for pos, term in zip(positions, pat):
            if not _is_var(term):
                rel = rel.filter(F.col(pos) == term)
        # repeated-variable equality inside one pattern (?x p ?x)
        seen: dict[str, str] = {}
        for pos, term in zip(positions, pat):
            if _is_var(term):
                v = _var_name(term)
                if v in seen:
                    rel = rel.filter(F.col(seen[v]) == F.col(pos))
                else:
                    seen[v] = pos
        if not seen:
            # variable-free pattern: existence gate, applied at the end
            gates.append(rel.limit(1).select(F.lit(1).alias(f"_exists_{i}")))
            continue
        rel = rel.select(*(F.col(pos).alias(v) for v, pos in seen.items()))
        if result is None:
            result = rel
        else:
            keys = sorted(bound & set(seen))
            result = result.join(rel, keys) if keys else result.crossJoin(rel)
        bound |= set(seen)

    if result is None:
        # all patterns were existence gates: one row iff every gated
        # triple is present, surfaced as a single constant column
        out = gates[0]
        for gate in gates[1:]:
            out = out.crossJoin(gate)
        return out.select(F.lit(1).alias("matched"))
    for gate in gates:
        result = result.crossJoin(gate)
    return result.select(*sorted(bound))


def bgp_query(
    triples: DataFrame,
    where: list[tuple[str, str, str]],
    *,
    optional: list[list[tuple[str, str, str]]] = (),
    filters: list[str] = (),
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL SELECT-fragment evaluation: a required BGP (``where``),
    zero or more OPTIONAL groups (each its own BGP, attached by LEFT
    OUTER join on the variables shared with everything already bound —
    SPARQL 1.1 §18.5 LeftJoin), then FILTER expressions (SQL strings
    over the variable columns, applied last — the safe placement for
    filters that reference optional variables).

    Each OPTIONAL group introduces its unshared variables as nullable
    columns.  An OPTIONAL group sharing no variable with the required
    part extends every solution (crossJoin), matching the spec's
    join-on-empty-domain behavior.  Result columns are all variables,
    sorted by name."""
    result = bgp_match(triples, where, s_col=s_col, p_col=p_col, o_col=o_col)
    bound = set(result.columns)
    for group in optional:
        rel = bgp_match(triples, group, s_col=s_col, p_col=p_col, o_col=o_col)
        keys = sorted(bound & set(rel.columns))
        result = result.join(rel, keys, "left") if keys else result.crossJoin(rel)
        bound |= set(rel.columns)
    for f in filters:
        result = result.filter(F.expr(f))
    return result.select(*sorted(bound))


def bgp_construct(
    triples: DataFrame,
    where: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    *,
    optional: list[list[tuple[str, str, str]]] = (),
    filters: list[str] = (),
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL CONSTRUCT (SPARQL 1.1 §16.2): evaluate the SELECT
    fragment (``bgp_query`` semantics — required BGP, OPTIONAL groups,
    FILTERs), then instantiate every ``template`` triple once per
    solution.  Per the spec, an instantiation with ANY unbound position
    (a template variable fed by an unmatched OPTIONAL) is silently
    omitted — that triple, not the whole solution.  Output is (s, p, o),
    distinct (CONSTRUCT builds a GRAPH, i.e. a set).

    Plan shape: the solution relation is computed once and fanned out
    through K narrow projections (one per template triple) — the
    template union is projection-only, so CONSTRUCT costs exactly one
    BGP evaluation plus the set-semantics distinct."""
    if not template:
        raise ValueError("bgp_construct: empty template")
    sols = bgp_query(
        triples, where, optional=optional, filters=filters,
        s_col=s_col, p_col=p_col, o_col=o_col,
    )
    bound = set(sols.columns)
    out: DataFrame | None = None
    for pat in template:
        if len(pat) != 3:
            raise ValueError(f"template triple must have 3 terms, got {pat!r}")
        cols = []
        for term in pat:
            if _is_var(term):
                name = _var_name(term)
                if name not in bound:
                    raise ValueError(
                        f"template variable ?{name} is not bound by the query"
                    )
                cols.append(F.col(name))
            else:
                cols.append(F.lit(term))
        t = sols.select(
            cols[0].alias("s"), cols[1].alias("p"), cols[2].alias("o")
        ).filter(
            F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
        )
        out = t if out is None else out.unionByName(t)
    return out.distinct()

def bgp_union(
    triples: DataFrame,
    groups: list[list[tuple[str, str, str]]],
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL UNION (SPARQL 1.1 §18.5 Union): evaluate each ``groups``
    entry as its own BGP and take the union of the solution sequences.
    Branches may bind DIFFERENT variable sets — the result carries the
    sorted union of all branch variables, and a variable a branch does
    not bind surfaces as NULL (unbound) in that branch's rows, exactly
    the spec's differing-domain behavior.

    Set semantics, consistent with the module contract: each branch is
    duplicate-free (see ``bgp_match``), but the SAME solution can arise
    from two branches, so one ``distinct`` lands the result back in set
    form (documented divergence from SPARQL's multiset counting — this
    engine never reports multiplicities).

    Plan shape: K independent BGP plans + a union + one distinct; the
    distinct is the only cross-branch shuffle, keyed on the full
    solution row.  Branches are evaluated against the same scan, so a
    cached/persisted triple table is read once per pattern, never per
    branch-combination."""
    if not groups:
        raise ValueError("bgp_union: empty group list")
    rels = [
        bgp_match(triples, g, s_col=s_col, p_col=p_col, o_col=o_col)
        for g in groups
    ]
    all_vars = sorted({c for rel in rels for c in rel.columns})
    out: DataFrame | None = None
    for rel in rels:
        padded = rel.select(
            *(
                F.col(v) if v in rel.columns
                else F.lit(None).cast("string").alias(v)
                for v in all_vars
            )
        )
        out = padded if out is None else out.unionByName(padded)
    return out.distinct()


def bgp_minus(
    solutions: DataFrame,
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL MINUS (SPARQL 1.1 §8.3): remove from ``solutions`` every
    mapping that is COMPATIBLE with some solution of the MINUS-side BGP
    on a NON-EMPTY shared domain.  ``solutions`` is any solution
    relation (``bgp_match``/``bgp_query``/``bgp_union`` output — one
    column per variable, NULL = unbound).

    Spec corners honored:

    - the MINUS pattern sharing NO variable with ``solutions`` removes
      nothing (dom(mu) ∩ dom(mu') = ∅ for every pair — §8.3's famous
      "MINUS with disjoint patterns is a no-op");
    - a NULL (unbound) shared variable in a solution drops out of ITS
      domain: compatibility then only constrains the remaining shared
      variables, and if ALL shared variables are NULL the domains are
      disjoint again and the row survives.

    Scale shape — TWO anti-joins, not one nested loop.  The MINUS-side
    BGP binds every shared variable (BGP solutions are total over their
    variables), so compatibility for a FULLY-BOUND solution row is plain
    equality on the shared columns — a hash anti-join.  Only rows with
    at least one NULL shared variable (OPTIONAL-miss rows fed through
    ``bgp_query``/``bgp_union``) need the general subset-compatibility
    condition, and those get their own anti-join against the SAME
    minus relation with the ``AND_v (v IS NULL OR v = minus.v) AND
    OR_v (v IS NOT NULL)`` condition (a broadcast nested loop — priced
    only by the null-carrying slice, which is empty for pure-BGP input
    and small whenever OPTIONAL misses are the exception).  The two
    slices are disjoint by the null predicate, so their union is exact."""
    rel = bgp_match(triples, patterns, s_col=s_col, p_col=p_col, o_col=o_col)
    shared = sorted(set(solutions.columns) & set(rel.columns))
    if not shared:
        return solutions
    for v in shared:
        if f"_minus_{v}" in solutions.columns:
            raise ValueError(f"column _minus_{v} collides with the rename scheme")
    right = rel.select(*(F.col(v).alias(f"_minus_{v}") for v in shared))

    all_bound = None
    for v in shared:
        nn = F.col(v).isNotNull()
        all_bound = nn if all_bound is None else all_bound & nn
    bound_part = solutions.filter(all_bound).join(
        right,
        on=_conj(F.col(v) == F.col(f"_minus_{v}") for v in shared),
        how="left_anti",
    )
    null_part = solutions.filter(~all_bound)
    compat = _conj(
        F.col(v).isNull() | (F.col(v) == F.col(f"_minus_{v}")) for v in shared
    )
    nonempty = None
    for v in shared:
        ne = F.col(v).isNotNull()
        nonempty = ne if nonempty is None else nonempty | ne
    null_part = null_part.join(right, on=compat & nonempty, how="left_anti")
    return bound_part.unionByName(null_part)


def _conj(conds):
    out = None
    for c in conds:
        out = c if out is None else out & c
    return out


_AGG_FNS = {
    "count": lambda c: F.count(c),
    "count_distinct": lambda c: F.countDistinct(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "avg": lambda c: F.avg(c),
    # SPARQL SAMPLE picks an arbitrary value; this engine pins it to
    # MIN so the same query gives the same answer on any engine and at
    # any parallelism — determinism over spec freedom
    "sample": lambda c: F.min(c),
}


def bgp_aggregate(
    triples: DataFrame,
    where: list[tuple[str, str, str]],
    *,
    group_by: list[str] = (),
    aggs: list[tuple[str, str, str]],
    optional: list[list[tuple[str, str, str]]] = (),
    filters: list[str] = (),
    having: list[str] = (),
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL aggregates (SPARQL 1.1 §11): GROUP BY over the solution
    mappings of a ``bgp_query`` evaluation, with HAVING applied after
    aggregation.  ``aggs`` entries are ``(fn, var, out_name)`` where fn
    is one of count / count_distinct / sum / min / max / avg / sample
    and var is a bound variable name (or ``*`` for count).  An empty
    ``group_by`` is the spec's implicit single group (one output row,
    even over zero solutions — COUNT(*) = 0, other aggregates NULL).

    SPARQL corners honored:

    - COUNT(?v) skips rows where ?v is unbound (NULL) — free, because
      Spark's count(col) has exactly that semantics;
    - SAMPLE is deterministic here (MIN), documented above;
    - grouping on a variable an OPTIONAL left NULL forms the spec's
      "error key" group — Spark groups NULLs together, same behavior.

    Scale shape: the whole thing is the BGP join plan + ONE combinable
    hash aggregate (count_distinct rewrites to Spark's two-phase
    distinct-expand, so a hot group does not funnel one reducer).
    HAVING lands after the agg as a plain filter on the aggregated
    relation — nothing re-scans."""
    if not aggs:
        raise ValueError("bgp_aggregate: empty aggs list")
    sols = bgp_query(
        triples, where, optional=optional, filters=filters,
        s_col=s_col, p_col=p_col, o_col=o_col,
    )
    exprs = []
    for fn, var, out in aggs:
        if fn not in _AGG_FNS:
            raise ValueError(f"unknown aggregate {fn!r}; have {sorted(_AGG_FNS)}")
        col = F.lit(1) if var == "*" else F.col(var)
        if var == "*" and fn != "count":
            raise ValueError(f"'*' is only valid with count, got {fn!r}")
        exprs.append(_AGG_FNS[fn](col).alias(out))
    grouped = sols.groupBy(*[F.col(g) for g in group_by]) if group_by else sols.groupBy()
    out_df = grouped.agg(*exprs)
    for h in having:
        out_df = out_df.filter(F.expr(h))
    return out_df


def reorder_patterns(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> list[tuple[str, str, str]]:
    """Selectivity-greedy BGP join ordering — the classic optimizer
    move ``bgp_match`` deliberately leaves to the caller (its docstring
    contract: caller order IS the join order).

    Estimate, one tiny aggregation: per-predicate triple counts (the
    predicate vocabulary of a real KG is small — collected driver-side
    like every other broadcast-sized stat in this repo).  Each
    pattern's cost = its predicate's count (whole-graph count for a
    variable predicate), discounted 100× per additional constant
    position (s/o constants are point lookups within the predicate
    slice).  Order: start at the cheapest pattern, then repeatedly take
    the cheapest pattern CONNECTED to the bound variable set —
    disconnected patterns only when nothing connects (they are cross
    products whichever way you order them, so they go last at their
    cost rank).

    Result-invariant by construction (inner joins commute); tests pin
    row-set equality against the unordered fold.  At 100 TB the
    difference is the intermediate-result size of the first two joins —
    exactly what a selectivity-first order minimizes."""
    if not patterns:
        raise ValueError("reorder_patterns: empty pattern list")
    freq = {
        r["p"]: r["n"]
        for r in triples.groupBy(F.col(p_col).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(freq.values()) or 1

    def cost(pat):
        s, p, o = pat
        est = float(freq.get(p, 0) if not _is_var(p) else total)
        for term in (s, o):
            if not _is_var(term):
                est /= 100.0
        return est

    def pat_vars(pat):
        return {_var_name(t) for t in pat if _is_var(t)}

    remaining = list(patterns)
    ordered: list[tuple[str, str, str]] = []
    bound: set[str] = set()
    while remaining:
        connected = [q for q in remaining if not bound or (pat_vars(q) & bound)]
        pool = connected or remaining
        nxt = min(pool, key=lambda q: (cost(q), patterns.index(q)))
        ordered.append(nxt)
        remaining.remove(nxt)
        bound |= pat_vars(nxt)
    return ordered


def bgp_filter_exists(
    solutions: DataFrame,
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    *,
    negate: bool = False,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL FILTER EXISTS / NOT EXISTS (SPARQL 1.1 §8.1.1): keep a
    solution iff substituting its bindings into ``patterns`` leaves a
    non-empty (resp. empty) match.

    Deliberately NOT the same operator as ``bgp_minus`` — the spec's
    teaching case is a pattern sharing NO variable with the solutions:
    MINUS removes nothing (disjoint domains are never compatible),
    while NOT EXISTS evaluates the pattern once and removes EVERY row
    if it matches at all.  Both corners are honored here and pinned by
    test.

    Plan shape: one semi-join (EXISTS) or anti-join (NOT EXISTS) on the
    shared variables; with no shared variables the pattern collapses to
    a 1-row existence probe crossed against the solutions — never a
    per-row subquery."""
    rel = bgp_match(triples, patterns, s_col=s_col, p_col=p_col, o_col=o_col)
    shared = sorted(set(solutions.columns) & set(rel.columns))
    how = "left_anti" if negate else "left_semi"
    if shared:
        return solutions.join(rel.select(*shared), on=shared, how=how)
    probe = rel.limit(1).count() > 0
    keep = probe != negate
    return solutions if keep else solutions.limit(0)


def bgp_values(
    solutions: DataFrame,
    values: dict[str, list],
) -> DataFrame:
    """SPARQL VALUES (SPARQL 1.1 §10.2): constrain solutions by an
    inline table of bindings — one broadcast-sized inner join.  Keys of
    ``values`` are variable names (columns of ``solutions``); the lists
    are positional rows of equal length; a ``None`` entry is UNDEF
    (that variable unconstrained in that row), honored by the spec's
    compatibility rule (NULL joins through on the remaining columns)."""
    if not values:
        raise ValueError("bgp_values: empty values block")
    cols = sorted(values)
    n = {len(values[c]) for c in cols}
    if len(n) != 1:
        raise ValueError(f"bgp_values: ragged value lists (lengths {sorted(n)})")
    missing = [c for c in cols if c not in solutions.columns]
    if missing:
        raise ValueError(f"bgp_values: unknown variable(s) {missing}")
    spark = solutions.sparkSession
    rows = list(zip(*(values[c] for c in cols)))
    schema = ", ".join(f"{c} string" for c in cols)
    inline = spark.createDataFrame(rows, schema)
    cond = None
    for c in cols:
        eq = inline[c].isNull() | (solutions[c] == inline[c])
        cond = eq if cond is None else cond & eq
    out = solutions.join(F.broadcast(inline), on=cond, how="left_semi")
    return out
