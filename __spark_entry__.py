"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction dataflow over the
sf0.001 testdata (documents reshaped to the mandated transcripts schema)
and returns the canonical edges DataFrame.  ``queries()`` exposes one
entry per implemented operator family from SURVEY.md §2 over
``/root/testdata/sf*``; ``oracle_sql()`` provides DuckDB-equivalent ANSI
SQL for every SQL-expressible query (UDF-backed pipeline operators are
rows-only by design and say so in their docstrings).

Column-name discipline: every computed column is aliased identically in
the Spark query and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_ENTRY_OWL = "/tmp/lmss_fixture_ontology.owl"


def _artifact_owl() -> str:
    from lmss_entity_extractor_spark.datagen import write_fixture_owl

    write_fixture_owl(_ENTRY_OWL)
    return _ENTRY_OWL


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lmss_entity_extractor_spark.datagen.transcripts import transcripts_from_documents

    return transcripts_from_documents(_t(spark, sf_dir, "documents"))


def _pipeline(spark: SparkSession):
    import tempfile

    from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig

    return KGPipeline(
        spark,
        _artifact_owl(),
        tempfile.mkdtemp(prefix="lmss_entry_"),
        PipelineConfig(similarity_threshold=0.7, materialize_intermediate=False),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: sf0.001 documents -> transcripts -> mention
    detection -> linking -> canonical (subj, pred, obj) edges."""
    tdf = _transcripts(spark, "/root/testdata/sf0.001")
    return _pipeline(spark).dataflow(tdf)["edges"]


# ---------------------------------------------------------------------------
# queries — relational operator inventory (oracle-checked)
# ---------------------------------------------------------------------------


def q_filter_project(spark, sf_dir):
    """P4/pushdown + agg: filtered revenue (TPC-H Q6 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_agg_returnflag(spark, sf_dir):
    """A1 hash aggregation (TPC-H Q1 shape): partial+final automatic."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_topk_orders(spark, sf_dir):
    """T1 top-k: TakeOrderedAndProject, deterministic tiebreak."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
    )


def q_window_dedup(spark, sf_dir):
    """A6 keep-first dedup as row_number window."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    # l_linenumber alone is not unique per order in this dataset — the
    # ordering must be total or the kept row is engine-dependent.
    w = Window.partitionBy("l_orderkey").orderBy(
        F.asc("l_linenumber"), F.asc("l_partkey"), F.asc("l_suppkey")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", F.round("l_quantity", 2).alias("first_qty"))
    )


def q_broadcast_join_brand(spark, sf_dir):
    """J: broadcast hash join on the small dimension."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_semi_join(spark, sf_dir):
    """P10 semi-join: customers having orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


def q_anti_join(spark, sf_dir):
    """Anti-join: customers without orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_nationkey")


def q_region_revenue(spark, sf_dir):
    """Multi-way join chain with two broadcast dims."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_sketch_rollup(spark, sf_dir):
    """Persistable/mergeable HLL distinct sketches (L109): per-nation
    customer sketches built in one scan, UNIONED up to region grain
    (hll_union_agg over sketch rows — the base table is not rescanned)
    and compared against the exact distinct count.  The oracle is the
    L23 pattern: DuckDB recomputes the exact counts and expects the
    published tolerance flag to be true (estimates are approximate and
    topology-dependent by design — the module docstring pins why)."""
    from lmss_entity_extractor_spark.ops.sketches import (
        build_distinct_sketches,
        rollup_distinct_estimate,
    )

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cn = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", "c_custkey")
    )
    sk = build_distinct_sketches(cn, ["r_name", "n_name"], "c_custkey")
    up = rollup_distinct_estimate(sk, ["r_name"])
    exact = cn.groupBy("r_name").agg(F.count_distinct("c_custkey").alias("exact_distinct"))
    return up.join(exact, "r_name").select(
        "r_name",
        "n_groups_merged",
        "exact_distinct",
        (
            F.abs(F.col("distinct_est") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * 0.02
        ).alias("within_2pct"),
    )


def _hyperball_edges(spark, sf_dir):
    """Shared L111 fixture graph: customer chains (c:k → c:k+100 where
    both exist, keys % 100 == 0) feeding into the nation ring
    (n → (n+1) % 25) via each customer's nation edge — ball sizes vary
    by chain position, so the radius sweep is non-trivial."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 0)
    n = _t(spark, sf_dir, "nation")
    keys = c.select(F.col("c_custkey").alias("nk"))
    chain = (
        c.join(keys, c.c_custkey + 100 == keys.nk)
        .select(
            F.concat(F.lit("c:"), "c_custkey").alias("src"),
            F.concat(F.lit("c:"), "nk").alias("dst"),
        )
    )
    return (
        c.select(
            F.concat(F.lit("c:"), "c_custkey").alias("src"),
            F.concat(F.lit("n:"), "c_nationkey").alias("dst"),
        )
        .unionByName(chain)
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), "n_nationkey").alias("src"),
                F.concat(F.lit("n:"), (F.col("n_nationkey") + 1) % 25).alias("dst"),
            )
        )
    )


def q_hyperball(spark, sf_dir):
    """HyperBall radius sweep (L111): per-node ball-size estimates at
    t = 0..3 over the chain+ring graph.  Ball sizes at this scale sit
    in the datasketches sparse regime, so the HLL estimates are EXACT
    integers and the oracle is a recursive-CTE BFS counting nodes
    within t hops — integer equality, not a tolerance flag."""
    from lmss_entity_extractor_spark.graph.hyperball import hyperball

    return hyperball(_hyperball_edges(spark, sf_dir), max_t=3)


def q_harmonic_centrality(spark, sf_dir):
    """Truncated harmonic centrality (L111) from the same sweep:
    Σ 1/d over nodes within 3 hops, computed as the telescoping
    per-radius fold.  Oracle: min-distance BFS then SUM(1.0/d)."""
    from lmss_entity_extractor_spark.graph.hyperball import harmonic_centrality

    return harmonic_centrality(_hyperball_edges(spark, sf_dir), max_t=3)


def q_gap_fill(spark, sf_dir):
    """Regular-grid resampling + linear interpolation (L112): two
    sparse user series from events onto an hourly epoch-aligned spine,
    in-bucket max (order-free, float-exact), gaps linearly interpolated
    between the surrounding observed buckets.  Oracle: generate_series
    spine + IGNORE NULLS window sweep with the identical interpolation
    arithmetic."""
    from lmss_entity_extractor_spark.ops.timeseries import resample_gap_fill

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 97 == 0)
    out = resample_gap_fill(ev, "user_id", "ts", "value", 3600, agg="max")
    return out.select(
        "user_id", "bucket_ts", F.round("value", 6).alias("value"), "is_observed"
    )


def q_expectations_summary(spark, sf_dir):
    """Data-quality expectations (L113): a six-rule contract over
    customer — all four row-local rules fused into ONE scan, uniqueness
    as one keyed count, referential integrity as one broadcast
    anti-count against nation.  Oracle: UNION ALL of per-rule SQL
    counts with identical rule ids."""
    from lmss_entity_extractor_spark.ops.expectations import validate_expectations

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rules = [
        ("not_null", "c_name"),
        ("in_range", "c_acctbal", 0.0, 5000.0),
        ("regex", "c_name", "^Customer#[0-9]{9}$"),
        ("in_set", "c_mktsegment", ["AUTOMOBILE", "BUILDING", "FURNITURE"]),
        ("unique", ["c_custkey"]),
        ("ref", "c_nationkey", n, "n_nationkey"),
    ]
    return validate_expectations(c, rules)


def q_quarantine(spark, sf_dir):
    """Row-level quarantine split (L113): customers violating the
    range/segment rules, with the sorted violated-rule array published
    as a CSV column (rule ids are index-ordered = lexically sorted).
    Oracle: concat_ws over per-rule CASE arms (NULL-skipping)."""
    from lmss_entity_extractor_spark.ops.expectations import quarantine

    c = _t(spark, sf_dir, "customer")
    rules = [
        ("in_range", "c_acctbal", 0.0, 5000.0),
        ("in_set", "c_mktsegment", ["AUTOMOBILE", "BUILDING", "FURNITURE"]),
    ]
    _, bad = quarantine(c, rules)
    return bad.select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.array_join("violated", ",").alias("violated_csv"),
    )


def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix (L114): daily first-activity cohorts
    over the high-value event slice (sparse activity → a real matrix:
    many cohorts, varied offsets and ratios), distinct active users per
    (cohort, offset), retention as the exact ratio against the
    offset-0 base.  Oracle: the same two-window derivation in SQL."""
    from lmss_entity_extractor_spark.ops.cohort import cohort_retention

    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 190)
    return cohort_retention(ev, "user_id", "ts", period_seconds=24 * 3600)


def q_funnel(spark, sf_dir):
    """Strict ordered funnel (L114): signup → view → click → purchase
    within a 3-day horizon of the user's FIRST signup, evaluated as one
    sorted-array higher-order fold per user (single keyed exchange).
    Oracle: the chain re-derived as sequential conditional-min joins —
    the textbook self-join form the fold replaces."""
    from lmss_entity_extractor_spark.ops.cohort import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(
        ev,
        "user_id",
        "ts",
        "event_type",
        ["signup", "view", "click", "purchase"],
        horizon_seconds=3 * 24 * 3600,
    )


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling (L115): 5 documents per language
    with inclusion odds proportional to n_chars — A-ES priorities from
    the shared Knuth hash, one window exchange.  Oracle: the identical
    priority formula and (priority, key) tie-break in SQL."""
    from lmss_entity_extractor_spark.ops.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents")
    return weighted_sample(
        d.select("doc_id", "lang", "n_chars"),
        "doc_id",
        "n_chars",
        5,
        group_cols=["lang"],
    )


def q_cdc_apply(spark, sf_dir):
    """CDC changelog apply (L116): a minted I/U/D feed folded into
    customer — %13 keys get two ordered updates (last wins), %29 keys a
    later delete (shadowing any earlier update on overlap), %41 keys
    mint inserts; the result is the next snapshot.  Oracle: window
    winner + NOT EXISTS survival in SQL."""
    from lmss_entity_extractor_spark.ops.cdc import apply_changelog

    c = _t(spark, sf_dir, "customer")
    u1 = c.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey", "c_name", "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit("CDC_V1").alias("c_mktsegment"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    u2 = c.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey", "c_name", "c_nationkey",
        (F.col("c_acctbal") + 2000.0).alias("c_acctbal"),
        F.lit("CDC_V2").alias("c_mktsegment"),
        F.lit("U").alias("op"), F.lit(2).alias("seq"),
    )
    d = c.filter(F.col("c_custkey") % 29 == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit("D").alias("op"), F.lit(3).alias("seq"),
    )
    ins = c.filter(F.col("c_custkey") % 41 == 0).select(
        (F.col("c_custkey") + 2000000).alias("c_custkey"),
        F.concat(F.lit("cdc-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    changes = u1.unionByName(u2).unionByName(d).unionByName(ins)
    return apply_changelog(c, changes, ["c_custkey"], "seq")


def q_neighborhood_function(spark, sf_dir):
    """HyperANF global distance profile (L117): N(t) = Σ_v |B(v,t)|
    over the chain+ring graph, exact in the sparse regime, with the
    fraction-of-final column the effective-diameter quantile reads.
    Oracle: the BFS CTE summed per radius."""
    from lmss_entity_extractor_spark.graph.hyperball import neighborhood_function

    return neighborhood_function(_hyperball_edges(spark, sf_dir), max_t=3)


def q_textrank(spark, sf_dir):
    """TextRank keywords (L118): PageRank over the window-2 word
    co-occurrence graph of a documents slice, top-15 on the floor-1e6
    grid with lexicographic tie-break.  Oracle: tokenization + pair
    mint replicated relationally, the PageRank recurrence unrolled as
    10 CTEs (the L28 discipline)."""
    from lmss_entity_extractor_spark.ops.textrank import textrank_keywords

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    return textrank_keywords(d, "text", k=15, window=2, n_iters=10)


def q_schema_evolution(spark, sf_dir):
    """Schema-drift union (L119): three customer 'generations' — gen 1
    without balance/segment, gen 2 adds balance and carries a widened
    nationkey, gen 3 adds segment — unioned under the evolved schema
    (missing columns typed NULL, int→bigint widened, first-seen column
    order).  Oracle: explicit UNION ALL with NULL/CAST arms."""
    from lmss_entity_extractor_spark.ops.evolve import union_evolved

    c = _t(spark, sf_dir, "customer")
    g1 = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", "c_name", F.col("c_nationkey").cast("int").alias("c_nationkey")
    )
    g2 = c.filter(F.col("c_custkey") % 3 == 1).select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "c_acctbal",
    )
    g3 = c.filter(F.col("c_custkey") % 3 == 2).select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    return union_evolved([g1, g2, g3])


def q_cms_estimate(spark, sf_dir):
    """Count-min sketch (L120): per-returnflag part-frequency sketches
    over lineitem (depth 4 × width 2048), probed for the %50 part keys
    and published next to the exact count (est >= true always; equal
    when the probed cells are collision-free).  The sketch hashing is
    exact integer arithmetic, so the oracle recomputes the IDENTICAL
    cells, estimates, and margins in SQL — cell-level value parity, not
    a tolerance flag."""
    from lmss_entity_extractor_spark.ops.cms import cms_build, cms_estimate

    li = _t(spark, sf_dir, "lineitem")
    sk = cms_build(li, ["l_returnflag"], "l_partkey", depth=4, width=2048)
    probes = li.filter(F.col("l_partkey") % 50 == 0).select(
        "l_returnflag", "l_partkey"
    )
    est = cms_estimate(sk, probes, ["l_returnflag"], "l_partkey", depth=4, width=2048)
    true = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .groupBy("l_returnflag", "l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt_true"))
    )
    return est.join(true, ["l_returnflag", "l_partkey"]).select(
        "l_returnflag",
        "l_partkey",
        "est",
        "cnt_true",
        (F.col("est") - F.col("cnt_true")).alias("over_by"),
    )


def q_zone_pruned_read(spark, sf_dir):
    """Zone-map data skipping (L121): orders written range-clustered on
    o_orderkey with a per-file min/max manifest, then a range read that
    opens ONLY the overlapping files (pruning asserted — the plan must
    touch a strict subset).  Result is exact, so the oracle is the
    plain BETWEEN scan."""
    import tempfile

    from lmss_entity_extractor_spark.ops.zonemap import (
        prune_files,
        read_zone_pruned,
        write_with_zonemap,
    )

    tmp = tempfile.mkdtemp(prefix="lmss_zonemap_q_")
    path = f"{tmp}/orders_zoned"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_with_zonemap(o, path, "o_orderkey", n_files=10)
    lo, hi = 2000, 5999
    keep, total = prune_files(path, lo, hi)
    if not len(keep) < total:
        raise AssertionError(
            f"zone map failed to prune: {len(keep)}/{total} files for [{lo},{hi}]"
        )
    return read_zone_pruned(spark, path, lo, hi)


def q_curate_sampled(spark, sf_dir):
    """Composed curation v2 (L113 × L115): documents gated by a
    declarative expectation list (quarantine keeps only clean rows),
    then a weighted per-language sample (odds ∝ n_chars) — the
    training-mixture construction step after quality control, one lazy
    plan.  Oracle: the rule predicates + the A-ES formula composed in
    SQL."""
    from lmss_entity_extractor_spark.ops.expectations import quarantine
    from lmss_entity_extractor_spark.ops.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    rules = [
        ("not_null", "text"),
        ("in_range", "n_chars", 60, 520),
        ("in_set", "lang", ["en", "es", "de", "fr"]),
    ]
    clean, _ = quarantine(docs, rules)
    samp = weighted_sample(clean, "doc_id", "n_chars", 6, group_cols=["lang"])
    return samp.select("doc_id", "lang", "n_chars")


def q_golden_records(spark, sf_dir):
    """Golden-record survivorship (L122): three minted observation
    versions per %11 customer collapse to one canonical record —
    latest-non-null name (v3's null must NOT erase v2), max balance,
    majority segment (2-of-3 beats v2's GOLD).  Oracle: ordered
    list-agg / counts-CTE twins of the same elections."""
    from lmss_entity_extractor_spark.ops.survivorship import golden_records

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 11 == 0)
    v1 = c.select(
        F.col("c_custkey").alias("cid"), F.lit(1).alias("ts"),
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    v2 = c.select(
        F.col("c_custkey").alias("cid"), F.lit(2).alias("ts"),
        F.upper("c_name").alias("name"),
        (F.col("c_acctbal") + 500.0).alias("bal"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("GOLD"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    v3 = c.select(
        F.col("c_custkey").alias("cid"), F.lit(3).alias("ts"),
        F.lit(None).cast("string").alias("name"),
        (F.col("c_acctbal") - 100.0).alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    obs = v1.unionByName(v2).unionByName(v3)
    return golden_records(
        obs,
        "cid",
        [("latest", "name", "ts"), ("max", "bal"), ("majority", "seg")],
    )


def q_attribution(spark, sf_dir):
    """Last-touch attribution (L123, an L10 as-of composition): every
    purchase event attributes its value to the user's latest click at
    or before the purchase (none → NULL = organic).  One as-of sweep —
    no per-purchase scan.  Oracle: correlated latest-click subquery."""
    from lmss_entity_extractor_spark.ops.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts_col="ts",
        right_cols=["click_id"],
        tie_col="click_id",
    )
    return out.select(
        "event_id", "user_id", "value", F.col("asof_click_id").alias("touch_id")
    )


def q_equidepth_bins(spark, sf_dir):
    """Equi-depth binning (L124): 8 exact quantile buckets fit on
    o_totalprice (percentile_disc — verified to agree with DuckDB's
    quantile_disc), frozen boundaries applied back, per-bucket count
    and range published.  Oracle: the same discrete quantiles + the
    same strictly-below counting rule."""
    from lmss_entity_extractor_spark.ops.binning import (
        apply_bins,
        fit_equidepth_bins,
    )

    o = _t(spark, sf_dir, "orders")
    bounds = fit_equidepth_bins(o, "o_totalprice", 8)
    return (
        apply_bins(o.filter(F.col("o_totalprice").isNotNull()), "o_totalprice", bounds)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


def q_cms_join_size(spark, sf_dir):
    """CMS join-cardinality estimate (L125): |lineitem ⋈ orders| on
    orderkey predicted from two KB-sized sketches (min-of-inner-
    products, est >= true always), published next to the exact join
    count.  Deterministic integer arithmetic end-to-end, so the oracle
    recomputes sketches, estimate, and margin cell-for-cell."""
    from lmss_entity_extractor_spark.ops.cms import cms_build, cms_join_size

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ska = cms_build(li, [], "l_orderkey", depth=4, width=4096)
    skb = cms_build(o, [], "o_orderkey", depth=4, width=4096)
    est = cms_join_size(ska, skb, depth=4)
    true = li.join(
        o, li.l_orderkey == o.o_orderkey
    ).agg(F.count(F.lit(1)).alias("true_size"))
    return est.crossJoin(true).select(
        "join_size_est",
        "true_size",
        (F.col("join_size_est") - F.col("true_size")).alias("over_by"),
    )


def q_distinct_overlap(spark, sf_dir):
    """HLL set algebra (L126): per region, how many distinct customers
    are shared between the positive-balance segment and the has-orders
    segment — estimated from two persisted sketch tables (union via
    hll_union, intersection by inclusion-exclusion), never rescanning
    the base.  Oracle: exact distinct counts + tolerance flags (the
    L109 stance — inclusion-exclusion error is bounded relative to the
    UNION, so the flag budget is 5% of it, floor 3)."""
    from lmss_entity_extractor_spark.ops.sketches import (
        build_distinct_sketches,
        distinct_overlap_estimate,
    )

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    o = _t(spark, sf_dir, "orders")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    seg_a = cn.filter(F.col("c_acctbal") > 0).select("r_name", "c_custkey")
    seg_b = cn.join(o, cn.c_custkey == o.o_custkey).select("r_name", "c_custkey")
    ska = build_distinct_sketches(seg_a, ["r_name"], "c_custkey")
    skb = build_distinct_sketches(seg_b, ["r_name"], "c_custkey")
    est = distinct_overlap_estimate(ska, skb, ["r_name"])

    ex_a = seg_a.groupBy("r_name").agg(F.count_distinct("c_custkey").alias("exact_a"))
    ex_b = seg_b.groupBy("r_name").agg(F.count_distinct("c_custkey").alias("exact_b"))
    ex_i = (
        seg_a.join(seg_b.select("r_name", "c_custkey").distinct(), ["r_name", "c_custkey"])
        .groupBy("r_name")
        .agg(F.count_distinct("c_custkey").alias("exact_i"))
    )
    ex_u = (
        seg_a.unionByName(seg_b)
        .groupBy("r_name")
        .agg(F.count_distinct("c_custkey").alias("exact_u"))
    )
    j = est.join(ex_a, "r_name").join(ex_b, "r_name").join(ex_i, "r_name").join(ex_u, "r_name")
    budget = F.greatest(F.lit(3.0), F.col("exact_u") * 0.05)
    return j.select(
        "r_name",
        "exact_a",
        "exact_b",
        "exact_i",
        (F.abs(F.col("n_a") - F.col("exact_a")) <= budget).alias("ok_a"),
        (F.abs(F.col("n_b") - F.col("exact_b")) <= budget).alias("ok_b"),
        (F.abs(F.col("n_intersect") - F.col("exact_i")) <= budget).alias("ok_i"),
    )


def _event_intervals(spark, sf_dir, etype):
    """Shared L127/L128 fixture: half-open activity intervals
    [ts, ts + value*60 + 1) in epoch seconds for one event type —
    minutes-scaled so the sparse per-user streams genuinely overlap."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("user_id") % 5 == 0) & (F.col("event_type") == etype)
    )
    s = F.unix_timestamp("ts")
    return ev.select(
        "user_id",
        s.alias("s"),
        (s + (F.col("value") * 60.0).cast("long") + 1).alias("e"),
    )


def q_concurrency_peak(spark, sf_dir):
    """Sweep-line peak concurrency (L127): max simultaneous click
    intervals per user and the earliest boundary reaching the peak —
    one keyed window over ±1 boundary events, never a θ-join.
    Oracle: the same sweep in SQL (trunc() mirrors Spark's
    double→long truncation)."""
    from lmss_entity_extractor_spark.ops.sweep import max_concurrency

    return max_concurrency(
        _event_intervals(spark, sf_dir, "click"), "user_id", "s", "e"
    )


def q_interval_intersect(spark, sf_dir):
    """Interval-set intersection (L128): per user, the coalesced time
    segments where click activity and view activity overlap — two
    coverage sums over one merged boundary stream (coverage, not
    multiplicity), gaps-and-islands merged.  Oracle: the identical
    sweep as SQL windows."""
    from lmss_entity_extractor_spark.ops.sweep import interval_intersect

    a = _event_intervals(spark, sf_dir, "click")
    b = _event_intervals(spark, sf_dir, "view")
    return interval_intersect(a, b, "user_id", "s", "e")


def q_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank (L129): the pagerank hierarchy with
    key-derived integer weights (the _sssp fixture discipline) — rank
    flows ∝ w/W_out.  Oracle: the recurrence unrolled as 10 CTEs with
    the same weight ratios; floor-1e6 grid."""
    from lmss_entity_extractor_spark.graph.pagerank import pagerank_weighted

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    edges = (
        o.select(
            F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
            (F.col("o_orderkey") % 7 + 1).cast("double").alias("weight"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
                F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
                (F.col("c_custkey") % 5 + 1).cast("double").alias("weight"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
                (F.col("n_nationkey") % 3 + 1).cast("double").alias("weight"),
            )
        )
    )
    pr = pagerank_weighted(edges, n_iters=10, damping=0.85)
    return pr.select("node", (F.floor(F.col("rank") * 1e6) / 1e6).alias("rank6"))


def q_skyline(spark, sf_dir):
    """Distributed skyline (L130): the Pareto frontier of parts on
    (size, retailprice), both maximized — per-batch BNL prune then one
    bounded merge, never the full NOT-EXISTS self-join.  The oracle IS
    that quadratic NOT-EXISTS form (which this operator exists to
    avoid running at scale)."""
    from lmss_entity_extractor_spark.ops.skyline import skyline

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    return skyline(p, ["p_size", "p_retailprice"])


def q_part_salience(spark, sf_dir):
    """Entity-salience composition (L50 × L129): the co-purchase graph
    (parts sharing an order, exact n_co counts, min_count=2) ranked by
    WEIGHTED PageRank with n_co as flow — the 'which entities matter'
    query a KG answers after edge mining, as ONE lazy plan.  Top-20 on
    the floor-1e6 grid with (rank, part) tie-break.  Oracle: pair
    counts + the weighted recurrence unrolled (integer weights, so the
    float story is exactly L129's)."""
    from lmss_entity_extractor_spark.graph.cooccur import cooccurrence_edges
    from lmss_entity_extractor_spark.graph.pagerank import pagerank_weighted

    obs = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
    )
    ed = cooccurrence_edges(obs, "l_orderkey", "l_partkey", min_count=2)
    edges = ed.select(
        F.col("item_a").cast("string").alias("src"),
        F.col("item_b").cast("string").alias("dst"),
        F.col("n_co").cast("double").alias("weight"),
    ).unionByName(
        ed.select(
            F.col("item_b").cast("string").alias("src"),
            F.col("item_a").cast("string").alias("dst"),
            F.col("n_co").cast("double").alias("weight"),
        )
    )
    pr = pagerank_weighted(edges, n_iters=8, damping=0.85)
    return (
        pr.select(
            F.col("node").alias("part"),
            (F.floor(F.col("rank") * 1e6) / 1e6).alias("rank6"),
        )
        .orderBy(F.col("rank6").desc(), F.col("part").asc())
        .limit(20)
    )


def q_psi_drift(spark, sf_dir):
    """Distribution-drift monitor (L131, composing the L124 bins):
    PSI of order totals between the even-key half (reference) and the
    odd-key half shifted +20% (current) on the REFERENCE's own
    equi-depth grid — per-bucket terms on the half-up 1e-6 grid, total
    rounded to 4 decimals (verdict thresholds live at 0.1/0.25).
    Oracle: the same quantiles, floors, log tree, and grids in SQL."""
    from lmss_entity_extractor_spark.ops.drift import psi_drift

    o = _t(spark, sf_dir, "orders")
    ref = o.filter(F.col("o_orderkey") % 2 == 0).select("o_totalprice")
    cur = o.filter(F.col("o_orderkey") % 2 == 1).select(
        (F.col("o_totalprice") * 1.2).alias("o_totalprice")
    )
    return psi_drift(ref, cur, "o_totalprice", n_bins=5)


def q_markov_transitions(spark, sf_dir):
    """Empirical Markov transition matrix (L132): consecutive event_type
    pairs within each user's event_id-ordered stream — one lag window +
    one combinable groupBy; probabilities are exact integer ratios (a
    single IEEE division, bit-identical across engines, emitted raw).
    Oracle: the same lead window + window-sum normalization in SQL."""
    from lmss_entity_extractor_spark.ops.markov import markov_transitions

    e = _t(spark, sf_dir, "events")
    return markov_transitions(e, "user_id", "event_type", "event_id")


def q_markov_stationary(spark, sf_dir):
    """Markov stationary distribution (L132): 12 synchronous power
    iterations x' = Pᵀx from the uniform start over the user-journey
    transition matrix — the pagerank discipline (fixed iterations,
    localCheckpoint), chain-closure guarded.  Oracle: the identical
    recurrence unrolled as 12 CTEs; floor-1e6 grid absorbs
    summation-order ulps."""
    from lmss_entity_extractor_spark.ops.markov import (
        markov_transitions,
        stationary_distribution,
    )

    e = _t(spark, sf_dir, "events")
    pi = stationary_distribution(
        markov_transitions(e, "user_id", "event_type", "event_id"), n_iters=12
    )
    return pi.select("state", (F.floor(F.col("pi") * 1e6) / 1e6).alias("pi6"))


def q_frequent_sequences(spark, sf_dir):
    """GSP sequential pattern mining (L133): frequent gapped event-type
    journeys (length <= 3) over each user's first 12 events, majority
    support — level-wise Apriori with greedy-fold containment as pure
    codegen expressions over broadcast candidates.  Oracle: the same
    lattice with containment as nested-EXISTS self-joins (the
    quadratic/cubic relational twin the operator avoids at scale)."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.seqmine import frequent_sequences

    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    w = Window.partitionBy("user_id").orderBy("event_id")
    first12 = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 12)
    n_users = first12.select("user_id").distinct().count()
    return frequent_sequences(
        first12, "user_id", "event_type", "event_id", n_users // 2 + 1, max_len=3
    )


def q_rolling_active_users(spark, sf_dir):
    """Rolling 7-day distinct active users (L127×L72 composition):
    EXACT rolling distinct — the classic can't-do-with-a-window metric
    (COUNT(DISTINCT) OVER RANGE isn't supported anywhere) — via
    per-user coverage islands (each event day covers [d, d+6]; merged
    by `coalesce_intervals`) swept globally by `concurrency`: one step
    row per boundary, no per-day fan-out, nothing quadratic.  The
    oracle IS the quadratic definition (per-boundary correlated
    COUNT(DISTINCT) over [t−6, t]) — the relational twin this
    composition avoids at row scale."""
    from lmss_entity_extractor_spark.graph.temporal import coalesce_intervals
    from lmss_entity_extractor_spark.ops.sweep import concurrency

    e = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        # thin the stream so per-user gaps exceed the window and the
        # island/boundary structure is actually exercised (the raw
        # fixture has every user active every week)
        & (F.col("event_id") % 29 == 0)
    )
    ud = e.select(
        F.col("user_id").alias("u"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).distinct()
    iv = ud.select(
        "u",
        F.col("d").alias("valid_from"),
        (F.col("d") + 6).alias("valid_to"),
    )
    merged = coalesce_intervals(
        iv, key_cols=("u",), start_col="valid_from", end_col="valid_to"
    )
    glob = merged.select(
        F.lit(1).alias("g"),
        "valid_from",
        (F.col("valid_to") + 1).alias("vend"),
    )
    steps = concurrency(glob, "g", "valid_from", "vend")
    return steps.select(
        F.col("t").alias("day"), F.col("n_active").alias("active_users")
    )


def q_feature_scale(spark, sf_dir):
    """Feature scaling (L143): z-score quantity, min-max price, and
    winsorized discount on one lineitem slice, composed in ONE lazy
    plan — decimal-exact fit stats broadcast onto per-row codegen
    expressions, ungridded."""
    from lmss_entity_extractor_spark.ops.scaling import (
        minmax_scale,
        standardize,
        winsorize,
    )

    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 37 == 0
    )
    out = standardize(li, ["l_quantity"])
    out = minmax_scale(out, ["l_extendedprice"])
    out = winsorize(out, ["l_discount"], lo=0.05, hi=0.95)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "z_l_quantity",
        "mm_l_extendedprice",
        "w_l_discount",
    )


def q_corr_matrix(spark, sf_dir):
    """Pearson correlation matrix (L141): all pairs over four lineitem
    measures from ONE combinable aggregation — exact decimal sufficient
    stats, fixed IEEE trees, ungridded."""
    from lmss_entity_extractor_spark.ops.correlation import corr_matrix

    li = _t(spark, sf_dir, "lineitem")
    return corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def q_spearman(spark, sf_dir):
    """Spearman rank correlation (L142): quantity vs discount —
    average-tie ranks minted from value-count tables (the ordered pass
    touches only DISTINCT values, never the rows), then the decimal-
    exact Pearson machinery on doubled integer ranks."""
    from lmss_entity_extractor_spark.ops.correlation import spearman_corr

    li = _t(spark, sf_dir, "lineitem")
    return spearman_corr(li, ["l_quantity", "l_discount"])


def _corr_oracle_sql(cols: list[str], scale: int, src_sql: str) -> str:
    """DuckDB twin of corr_matrix: same decimal sums, same IEEE tree,
    one pair-SELECT per unordered column pair over ``src_sql``."""
    cols = sorted(cols)
    dec = f"DECIMAL(18,{scale})"
    sums = ["count(*) AS n"]
    for i, a in enumerate(cols):
        sums.append(f"sum(CAST({a} AS {dec})) AS s_{a}")
        sums.append(
            f"sum(CAST({a} AS {dec}) * CAST({a} AS {dec})) AS ss_{a}_{a}"
        )
        for b in cols[i + 1 :]:
            sums.append(
                f"sum(CAST({a} AS {dec}) * CAST({b} AS {dec})) AS ss_{a}_{b}"
            )
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    pair_sql = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            pair_sql.append(
                f"""
            SELECT '{a}' AS col_a, '{b}' AS col_b, n,
                   CASE WHEN CAST(n AS DOUBLE) * CAST(ss_{a}_{a} AS DOUBLE)
                             - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE)
                             > 0.0
                         AND CAST(n AS DOUBLE) * CAST(ss_{b}_{b} AS DOUBLE)
                             - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)
                             > 0.0
                   THEN (CAST(n AS DOUBLE) * CAST(ss_{a}_{b} AS DOUBLE)
                         - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
                        / (sqrt(CAST(n AS DOUBLE) * CAST(ss_{a}_{a} AS DOUBLE)
                                - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                           * sqrt(CAST(n AS DOUBLE) * CAST(ss_{b}_{b} AS DOUBLE)
                                  - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))
                   END AS corr
            FROM stats"""
            )
    return (
        f"WITH src AS ({src_sql}), stats AS (SELECT "
        + ", ".join(sums)
        + f" FROM src WHERE {notnull})"
        + " UNION ALL ".join(pair_sql)
    )


def q_welch_ab(spark, sf_dir):
    """Welch's t-test (L139): order totals, open ('O') vs finished
    ('F') orders per priority — exact decimal sufficient stats through
    one fixed IEEE tree (sqrt is exactly rounded), ungridded."""
    from lmss_entity_extractor_spark.ops.stattests import welch_ttest

    o = _t(spark, sf_dir, "orders")
    return welch_ttest(
        o, ["o_orderpriority"], "o_orderstatus", "O", "F", "o_totalprice"
    )


def q_chi2_assoc(spark, sf_dir):
    """Chi-squared independence (L140): returnflag × linestatus
    association on lineitem — exact integer cells, ordered-fold cell
    sum, engine-stable double."""
    from lmss_entity_extractor_spark.ops.stattests import chi2_independence

    li = _t(spark, sf_dir, "lineitem")
    return chi2_independence(li, "l_returnflag", "l_linestatus")


def q_mad_outliers(spark, sf_dir):
    """Robust MAD anomaly flags (L137): per-event-type discrete
    median/MAD over event values (users < 100 slice), Hampel k=3 —
    order statistics are engine-exact, so med/mad/flags hash-match
    ungridded."""
    from lmss_entity_extractor_spark.ops.anomaly import mad_outliers

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    out = mad_outliers(e, ["event_type"], "value", k=3.0)
    return out.select(
        "event_id", "event_type", "value", "med", "mad", "is_outlier"
    )


def q_target_encode(spark, sf_dir):
    """Leave-one-out target encoding (L138): order priority encoded
    against total price — exact decimal sums, one IEEE division,
    bit-identical with no grid."""
    from lmss_entity_extractor_spark.ops.encoding import target_encode_loo

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return target_encode_loo(o, "o_orderpriority", "o_totalprice").select(
        "o_orderkey", "o_orderpriority", "te"
    )


def q_nb_lang_scores(spark, sf_dir):
    """Multinomial Naive Bayes (L136), scoring surface: per-(doc,
    class) log-posteriors under per-lang unigram class models — train
    is one combinable pass, scoring one broadcast join; the per-cell
    sum is the L39 ordered fold so the oracle reproduces the doubles
    to libm ulps."""
    from lmss_entity_extractor_spark.ops.nbayes import nb_score, train_nb

    docs = _t(spark, sf_dir, "documents")
    model, classes = train_nb(docs, "lang", alpha=0.5)
    return nb_score(docs, model, classes)


def q_nb_predict_lang(spark, sf_dir):
    """Naive Bayes argmax prediction (L136): the class with the highest
    log-posterior per document, ties on label ASC.  Count-driven score
    margins (≫ libm ulp) keep the argmax engine-stable."""
    from lmss_entity_extractor_spark.ops.nbayes import nb_predict, train_nb

    docs = _t(spark, sf_dir, "documents")
    model, classes = train_nb(docs, "lang", alpha=0.5)
    return nb_predict(docs, model, classes)


def q_grouped_ols(spark, sf_dir):
    """Grouped OLS trendlines (L135): extendedprice regressed on
    quantity per returnflag — exact DECIMAL sufficient statistics
    (order-insensitive sums) cast to double through ONE fixed IEEE
    expression tree, so slope/intercept/r2 hash-match the oracle with
    no rounding grid."""
    from lmss_entity_extractor_spark.ops.regression import grouped_linreg

    li = _t(spark, sf_dir, "lineitem")
    return grouped_linreg(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice"
    )


def _brand_baskets(spark, sf_dir):
    """Per-order DISTINCT brand baskets — the L134 input shape."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey).select(
        F.col("l_orderkey").alias("k"), F.col("p_brand").alias("it")
    )


def q_frequent_itemsets(spark, sf_dir):
    """Apriori frequent-itemset mining (L134): brand baskets per order,
    itemsets up to length 3 at 0.5% support — level-wise lattice with
    set containment as codegen `forall`/`array_contains` over broadcast
    candidates.  Oracle: the same lattice with containment as
    self-joins on the exploded basket table."""
    from lmss_entity_extractor_spark.ops.itemsets import frequent_itemsets

    b = _brand_baskets(spark, sf_dir)
    n = b.select("k").distinct().count()
    return frequent_itemsets(b, "k", "it", n // 200 + 1, max_len=3)


def q_assoc_rules(spark, sf_dir):
    """Association rules (L134) from frequent brand pairs: confidence =
    supp(pair)/supp(antecedent), lift = supp·N/(supp_a·supp_c) — exact
    integer products, single IEEE divisions, no rounding grid needed."""
    from lmss_entity_extractor_spark.ops.itemsets import association_rules

    b = _brand_baskets(spark, sf_dir)
    n = b.select("k").distinct().count()
    return association_rules(b, "k", "it", n // 200 + 1, max_len=2)


def q_bloom_semi_join(spark, sf_dir):
    """Bloom-filter join pruning (L110): lineitem semi-joined against
    the Brand#23 slice of part, with the bloom bit array built from the
    dim side and pushed into the fact scan as a codegen filter — rows
    that cannot match never reach the join exchange (the explicit form
    of Spark's runtime bloom filter).  The exact LEFT SEMI join after
    the probe removes false positives, so the oracle is the plain
    EXISTS semi-join, row-for-row."""
    from lmss_entity_extractor_spark.ops.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return bloom_semi_join(
        li.select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity"),
        p,
        "l_partkey",
        "p_partkey",
        num_bits=1 << 16,
    )


def q_table_diff(spark, sf_dir):
    """Keyed table diff / reconciliation (L108) composed with the L105
    upsert: diff customer against its upserted snapshot — the %13 keys
    classify as changed (with per-column change flags), the minted %41
    keys as added, nothing removed.  One full outer join; all change
    detection is null-safe projection.  Oracle: FULL OUTER JOIN +
    IS DISTINCT FROM CASE arms in DuckDB."""
    from lmss_entity_extractor_spark.ops.upsert import merge_upsert
    from lmss_entity_extractor_spark.ops.tablediff import table_diff

    c = _t(spark, sf_dir, "customer")
    changed = c.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit("UPSERTED").alias("c_mktsegment"),
    )
    inserted = c.filter(F.col("c_custkey") % 41 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    merged = merge_upsert(
        c, changed.unionByName(inserted), ["c_custkey"], check_unique=False
    )
    d = table_diff(c, merged, ["c_custkey"])
    return d.select(
        "c_custkey",
        "diff_kind",
        "changed_cols",
        "left_c_mktsegment",
        "right_c_mktsegment",
        F.round("left_c_acctbal", 2).alias("left_bal"),
        F.round("right_c_acctbal", 2).alias("right_bal"),
    )


def q_pit_join(spark, sf_dir):
    """Point-in-time dimension join (L107) composed with the SCD2
    collapse (L104): every event enriched with the user's event_type
    REGIME effective at the event's own timestamp — as-of sweep + expiry
    check, never a range theta-join.  Oracle: relational interval join
    (valid_from <= ts < valid_to, open tail) against the same lag/lead
    dimension derivation."""
    from lmss_entity_extractor_spark.ops.scd import pit_join, scd2_collapse

    ev = _t(spark, sf_dir, "events")
    dim = scd2_collapse(
        ev.select("user_id", "ts", "event_type"), ["user_id"], "ts", ["event_type"]
    )
    facts = ev.select("event_id", "user_id", "ts")
    return pit_join(facts, dim, ["user_id"], "ts", ["event_type"], prefix="regime_").select(
        "event_id", "user_id", F.col("regime_event_type").alias("regime")
    )


def q_merge_upsert(spark, sf_dir):
    """Keyed MERGE / upsert (L105, the Iceberg MERGE INTO shape as
    anti-join + union): a deterministic update delta — every 13th
    customer re-observed with a bumped balance and a changed segment,
    plus brand-new keys minted from every 41st — merged into customer.
    Matched keys take the update, new keys insert, the rest survive.
    Oracle: updates UNION ALL base-NOT-EXISTS in DuckDB."""
    from lmss_entity_extractor_spark.ops.upsert import merge_upsert

    c = _t(spark, sf_dir, "customer")
    changed = c.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 1000.0, 2).alias("c_acctbal"),
        F.lit("UPSERTED").alias("c_mktsegment"),
    )
    inserted = c.filter(F.col("c_custkey") % 41 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    merged = merge_upsert(c, changed.unionByName(inserted), ["c_custkey"])
    return merged.select(
        "c_custkey", "c_name", "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment",
    )


def q_scd2(spark, sf_dir):
    """SCD Type-2 change-history collapse (L104): each user's
    event_type observation log becomes versioned half-open intervals
    with change-point dedup (null-safe lag comparison), valid_to
    chaining via lead, and is_current on the open tail — both windows
    riding one keyed shuffle.  Oracle: identical lag/lead derivation
    with IS DISTINCT FROM in DuckDB."""
    from lmss_entity_extractor_spark.ops.scd import scd2_collapse

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return scd2_collapse(ev, ["user_id"], "ts", ["event_type"])


def q_profile_table(spark, sf_dir):
    """One-pass table profiling (L103): per-column n_rows / n_nulls /
    exact n_distinct / native-typed min+max (as strings) for four
    int/string columns of orders — all computed inside ONE aggregate
    over one scan (exact distincts via Spark's Expand rewrite).  Oracle:
    a UNION ALL of the per-column aggregates in DuckDB."""
    from lmss_entity_extractor_spark.ops.profile import profile_table

    return profile_table(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )


def q_salted_join(spark, sf_dir):
    """Generic salted skew join (L102): lineitem as the skewed probe
    side, part replicated 8x as the build side, joined on (partkey,
    salt) then aggregated per container.  The salt is a physical
    redistribution only — the contract (and the oracle) is the PLAIN
    join: identical rows, identical multiplicities."""
    from lmss_entity_extractor_spark.ops.skewjoin import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        salted_join(li, p, on="p_partkey", salt=8)
        .groupBy("p_type")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_pivot_events(spark, sf_dir):
    """P3 triples->wide pivot shape: conditional aggregation."""
    e = _t(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 10).alias("user_bucket")
    return (
        e.groupBy(bucket)
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
            F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 2).alias("purchase_value"),
        )
    )


def q_closure(spark, sf_dir):
    """J4 transitive closure by iterative self-join over the
    order->customer->nation->region hierarchy (depth 3)."""
    from lmss_entity_extractor_spark.graph.closure import transitive_closure

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    e1 = o.select(
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("child"),
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("parent"),
    )
    e2 = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("child"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("parent"),
    )
    e3 = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("child"),
        F.concat(F.lit("r:"), F.col("n_regionkey")).alias("parent"),
    )
    edges = e1.unionByName(e2).unionByName(e3)
    return transitive_closure(edges, include_self=False).select(
        F.col("desc_iri").alias("descendant"),
        F.col("anc_iri").alias("ancestor"),
        F.col("depth").alias("depth"),
    )


def q_argmax_link(spark, sf_dir):
    """J1/J2/A5 relational form: crossJoin + per-query argmax by cosine
    (strict first-max tiebreak on neighbor id)."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.similarity import cosine_expr

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cvec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qvec"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("cand_id").alias("best_id"))
    )


def q_knn_bruteforce(spark, sf_dir):
    """Brute-force cosine top-k similarity search."""
    from lmss_entity_extractor_spark.ops.similarity import knn_bruteforce

    e = _t(spark, sf_dir, "embeddings")
    return knn_bruteforce(e, e.filter(F.col("vec_id") < 5), k=3)


def q_knn_lsh(spark, sf_dir):
    """Sign-LSH bucketed approximate top-k."""
    from lmss_entity_extractor_spark.ops.similarity import knn_lsh

    e = _t(spark, sf_dir, "embeddings")
    return knn_lsh(e, e.filter(F.col("vec_id") < 5), k=3, bits=2)


def q_knn_ivf(spark, sf_dir):
    """IVF approximate top-k with a trained spherical-k-means codebook
    (n_centroids=10, nprobe=2) over a clustered embedding space.

    IVF's contract is geometric: high recall when neighbors share coarse
    cells (the regime real embedding corpora are in).  The driver's
    random vectors have no cluster structure — the worst case for ANY
    coarse quantizer — so the query first lifts them into a clustered
    space both engines can reproduce (+6.0 on the dimension indexed by
    the row's ``label``), where trained IVF provably recovers the exact
    top-k that the exhaustive SQL oracle computes.  Quantizer quality on
    its own (recall@k vs brute force, nprobe monotonicity, k-means
    determinism) is covered by tests/test_ops.py::TestSimilarity."""
    from lmss_entity_extractor_spark.ops.similarity import knn_ivf

    e0 = _t(spark, sf_dir, "embeddings")
    clustered = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double") + F.when(i == F.col("label"), F.lit(6.0)).otherwise(F.lit(0.0)),
    )
    # cache the lift: three consumers (training collect, cell assignment,
    # query probe) would otherwise each re-evaluate the 64-element array
    # rebuild per row — Catalyst inlines collapsed projections into every
    # consumer.  Production corpora read a STORED embedding column, so
    # this is contract-query bookkeeping, not an operator cost (2000 rows
    # ~= 1.5 MB cached).
    e = e0.select("vec_id", clustered.alias("embedding")).cache()
    return knn_ivf(e, e.filter(F.col("vec_id") < 5), k=3, n_centroids=10, nprobe=2)


def q_semdedup(spark, sf_dir):
    """SemDeDup semantic near-dup flagging (L40, Abbas et al. 2023):
    coarse-cluster the embedding space, compare pairs only within a
    cluster, and drop the MORE prototypical member of every pair with
    cosine >= threshold (keep order = centroid_sim ASC, id ASC).

    The coarse codebook is the frozen sf0.01 IVF centroid fixture
    (tools/make_oracle_fixtures.py) — the same file the oracle reads, so
    both engines derive identical cells/sims at ANY sf (the fixture is
    an input, not a per-sf artifact; this query is NOT sf-pinned).
    threshold=0.375 sits at ~the 99.7th percentile of the within-cell
    pair-cosine distribution of the random test vectors (max 0.493), so
    the contract exercises both keep=true and keep=false rows.  Every
    float (cell dot, norm, pair cosine) is a left-associated fold on
    both engines — see _semdedup_oracle_sql."""
    from lmss_entity_extractor_spark.ops.semdedup import semdedup

    e = _t(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(
        "/root/repo/fixtures/oracle/sf0.01/ivf_centroids.parquet"
    )
    return semdedup(e, centroids=cents, threshold=0.375)


def q_knn_pq(spark, sf_dir):
    """Product-quantization ANN (L34): embeddings coded as m=8 x k=16
    per-subspace centroid ids (narrow JVM argmin expressions), queries
    scored by ADC — an (m x k) distance-table literal + m lookups and a
    fold per candidate, no float vectors on the hot path.

    Value-level oracle (pinned to sf0.01 like the other frozen-fixture
    queries): the codebook is trained by a shared numpy core frozen to
    parquet (tools/make_oracle_fixtures.py); DuckDB re-derives the code
    assignment (argmin with lowest-code ties) and the ADC ranking with
    explicitly left-associated float64 sums that mirror the Spark folds
    term-for-term."""
    from lmss_entity_extractor_spark.ops.pq import encode_pq, knn_pq, train_pq_codebooks

    e = _t(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(e, m=8, k=16)
    codes = encode_pq(e, books)
    return knn_pq(codes, e.filter(F.col("vec_id") < 5), books, k=10)


def q_knn_ivfpq(spark, sf_dir):
    """IVFADC (L34 composition): IVF cell pruning x ADC code scoring —
    the configuration that serves ANN at corpus scale (nprobe/n_centroids
    of the rows, m code lookups per candidate, zero floats read).

    Value-level oracle (pinned to sf0.01): BOTH frozen codebooks (IVF
    centroids + PQ subspace codebooks, trained by the same shared numpy
    cores) let DuckDB re-derive every stage — cell assignment, per-query
    probe cells, candidate restriction, codes, and the ADC ranking.
    ``rerank=0`` pins the PURE-ADC ranking this oracle re-derives; the
    serving default (exact re-rank) is oracled by q_knn_ivfpq_rerank."""
    from lmss_entity_extractor_spark.ops.pq import knn_ivfpq

    e = _t(spark, sf_dir, "embeddings")
    return knn_ivfpq(
        e, e.filter(F.col("vec_id") < 5), k=10, n_centroids=10, nprobe=2, rerank=0
    )


def q_knn_ivfpq_rerank(spark, sf_dir):
    """IVFADC + exact re-rank (Jegou §V, the r3 VERDICT's one quality
    gap): ADC shortlists k'=100 candidates from the probed cells, then
    a broadcast-shortlist join reads ONLY those float vectors and exact
    squared L2 orders the final top-10 — recall@10 goes 0.30 -> 0.93 at
    these defaults on the clustered corpus (BENCH/IVF.md; the residue is
    nprobe probe loss plus shortlist depth) while the scan story keeps
    reading codes, never a full float column.

    Value-level oracle (pinned to sf0.01): the q_knn_ivfpq SQL extended
    by the re-rank stages — ADC shortlist (rank <= k'), then exact L2
    re-derived as an explicitly left-associated 64-term float64 sum
    that mirrors Spark's sequential zip_with/aggregate fold
    term-for-term."""
    from lmss_entity_extractor_spark.ops.pq import knn_ivfpq

    e = _t(spark, sf_dir, "embeddings")
    # library defaults: rerank=None -> auto shortlist max(50, 10k) = 100
    return knn_ivfpq(e, e.filter(F.col("vec_id") < 5), k=10, n_centroids=10, nprobe=2)


def q_knn_ivfpq_residual(spark, sf_dir):
    """Residual IVFADC (Jegou §IV proper): PQ quantizes (x - assigned
    cell MEAN), so the whole m x k code budget resolves in-cluster
    structure the coarse quantizer already absorbed — same storage, same
    scan shape; the scattered-centers test pins recall improvement and
    a >2x reconstruction-MSE reduction (measured point values: MSE 28.3
    -> 5.9, recall 8x), measured neutral on the grid's synthetic
    corpora whose residual IS the full random vector (BENCH/IVF.md).  Each query builds one ADC table per probed cell
    from ITS residual against that cell's mean.

    Value-level oracle (pinned to sf0.01): the frozen RESIDUAL codebook
    (same shared numpy trainer over residuals) lets DuckDB re-derive
    residual codes — per-term tree ((x - ivfcent) - cbcent) mirroring
    Spark's residual column then subspace distance — the per-(query,
    cell) tables, and the ADC ranking.  ``rerank=0`` pins pure ADC (the
    re-rank stage is oracled separately by q_knn_ivfpq_rerank and is
    coding-independent)."""
    from lmss_entity_extractor_spark.ops.pq import knn_ivfpq

    e = _t(spark, sf_dir, "embeddings")
    return knn_ivfpq(
        e, e.filter(F.col("vec_id") < 5),
        k=10, n_centroids=10, nprobe=2, rerank=0, residual=True,
    )


def q_asof_join(spark, sf_dir):
    """As-of join (backward inclusive): each purchase event picks up the
    most recent prior click by the same user — single keyed shuffle."""
    from lmss_entity_extractor_spark.ops.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    return asof_join(
        purchases, clicks, on=["user_id"], ts_col="ts",
        right_cols=["event_id", "ts"], tie_col="event_id", prefix="click_",
    ).select("user_id", "purchase_id", F.col("ts").alias("purchase_ts"), "click_event_id", "click_ts")


def q_outer_join(spark, sf_dir):
    """Left outer join with null backfill: suppliers per nation (0 for
    nations with none)."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "left_outer")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.round(F.sum(F.coalesce(F.col("s_acctbal"), F.lit(0.0))), 2).alias("total_acctbal"),
        )
    )


def q_max_by(spark, sf_dir):
    """A5 max-by aggregate form: best/worst supplier per nation by
    account balance (balances verified unique per nation at every sf;
    the tie-safe windowed form is `window_dedup`)."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("s_name", "s_acctbal").alias("top_supplier"),
            F.min_by("s_name", "s_acctbal").alias("bottom_supplier"),
            F.round(F.max("s_acctbal"), 2).alias("max_acctbal"),
        )
    )


def q_dedup_exact(spark, sf_dir):
    """Exact duplicate groups by text hash."""
    from lmss_entity_extractor_spark.ops.dedup import exact_duplicates

    return exact_duplicates(_t(spark, sf_dir, "documents"))


def q_dedup_jaccard(spark, sf_dir):
    """3-gram shingle Jaccard near-duplicate pairs (threshold 0.6)."""
    from lmss_entity_extractor_spark.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.6, max_shingle_df=50
    )


def q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH candidate pairs (md5 hash family, 8 hashes, 4 bands)."""
    from lmss_entity_extractor_spark.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), n=3, num_hashes=8, bands=4)


def q_mixture_sample(spark, sf_dir):
    """Domain-mixture sampling (L36): select documents hitting the
    training-recipe proportions 50% en / 25% es / 25% fr exactly, at the
    largest total the inventory allows — per-stratum quotas from the
    counts, selection = each stratum's smallest Knuth-hashed keys.
    Dyadic target fractions (0.5/0.25) keep every division and product
    exact in binary, so the driver-side float quota math and the
    oracle's DOUBLE arithmetic agree bit-for-bit.  Oracle: the same
    quota derivation and ranking in SQL (the hash is pure integer
    arithmetic by design)."""
    from lmss_entity_extractor_spark.ops.mixture import mixture_sample

    docs = _t(spark, sf_dir, "documents")
    out = mixture_sample(docs, {"en": 0.5, "es": 0.25, "fr": 0.25})
    return out.select("doc_id", "lang")


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (L35, GPT-3 appendix-C style): training
    docs sharing any full 5-gram with the "benchmark" (the deterministic
    doc_id % 97 == 0 subset standing in for an eval set) are flagged
    with hit and size counts.  Corpus scanned once; the benchmark's
    distinct n-gram hash set broadcasts.  Oracle: the identical 5-gram
    derivation and joins in DuckDB (full windows only, so the list
    comprehension matches the Spark builder exactly)."""
    from lmss_entity_extractor_spark.ops.decontam import contaminated_docs

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contaminated_docs(docs, bench, n=5, min_hits=1)


def q_heavy_hitters(spark, sf_dir):
    """Distributed exact heavy hitters (L101, Misra-Gries two-pass):
    document bigrams occurring in strictly more than 1/700 of all bigram
    occurrences, with exact counts.  Pass 1 prunes the shuffle domain to
    a per-partition-summary candidate superset (guaranteed by the MG
    eviction bound); pass 2 is an exact count over candidates only with
    an integer-rational cut (n * 700 > N) — so the oracle is a plain
    GROUP BY + HAVING in DuckDB over the identical bigram derivation."""
    from lmss_entity_extractor_spark.ops.heavyhitters import heavy_hitters

    d = _t(spark, sf_dir, "documents")
    bigrams = d.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(split(lower(trim(text)), '\\\\s+')) - 1, 0)), "
                "i -> concat(element_at(split(lower(trim(text)), '\\\\s+'), i), ' ', "
                "element_at(split(lower(trim(text)), '\\\\s+'), i + 1)))"
            )
        ).alias("term")
    ).filter(F.length("term") > 1)
    return heavy_hitters(bigrams, "term", 1, 700).withColumnRenamed("item", "term")


def q_repetition_stats(spark, sf_dir):
    """Gopher-style intra-document repetition metrics (L37, Rae et al.
    2021 table A1 shape): duplicate-token/-bigram/-line fractions, top
    2-gram character coverage — all computed as per-row higher-order
    folds over sorted token arrays, so the operator is ONE narrow
    shuffle-free projection riding the scan.  Every fraction is a single
    IEEE division of exact integer counts (no summation-order caveat).
    Oracle: an independent relational derivation (unnest + group +
    argmax window) of the same semantics in DuckDB."""
    from lmss_entity_extractor_spark.ops.repetition import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"), top_n=2, dup_n=3)


def q_lm_quality(spark, sf_dir):
    """CCNet-style unigram-LM quality scoring (L39, Wenzek et al. 2020
    §3.3): add-0.5-smoothed unigram LM trained on the corpus itself
    (top-V deterministic vocab), per-doc cross-entropy + perplexity.
    Training = one combinable groupBy + TakeOrdered; scoring = combinable
    (doc,token) multiplicities + broadcast LM join + per-doc agg.  The
    log-prob sum is a left-assoc fold over token-sorted lists on BOTH
    engines (array_sort+aggregate here, list_sort+list_reduce in DuckDB),
    so addend order — the usual float-sum caveat — is pinned."""
    from lmss_entity_extractor_spark.ops.lmscore import lm_quality_score

    return lm_quality_score(_t(spark, sf_dir, "documents"))


def q_leakage_split(spark, sf_dir):
    """Leakage-safe train/val split (L43): side = knuth_hash of the
    MinHash near-dup cluster canonical, so no cluster straddles the
    split.  Oracle: the dedup_clusters recursive CTE + the shared
    ANSI knuth-hash spelling — all integer arithmetic."""
    from lmss_entity_extractor_spark.ops.dedup import minhash_lsh_pairs
    from lmss_entity_extractor_spark.ops.split import leakage_safe_split

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, n=3, num_hashes=8, bands=4)
    return leakage_safe_split(d, pairs, val_per_mille=250).select(
        "doc_id", "split_key", "split"
    )


def q_substr_spans(spark, sf_dir):
    """Exact-substring dedup spans (L42, Lee et al. 2021 ExactSubstr,
    window-covering approximation): maximal token runs whose 5-token
    windows occur >= 2 times corpus-wide, merged per doc.

    Integer-only arithmetic (positions and counts), so the oracle is a
    direct relational re-derivation; Spark counts windows by
    xxhash64(gram) while the oracle groups the gram strings themselves —
    identical absent a 64-bit collision (the ops/dedup.py caveat)."""
    from lmss_entity_extractor_spark.ops.substr import duplicated_substring_spans

    return duplicated_substring_spans(_t(spark, sf_dir, "documents"), min_len=5)


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (L41, Xie et al. 2023): the 100 most
    French-like documents of the whole corpus, scored by hashed
    uni+bigram bucket models (m=512, add-1 smoothing) — target model
    trained on the lang='fr' slice, raw model on everything.

    Oracle: the full pipeline re-derived relationally in DuckDB —
    identical md5-prefix bucket hash, identical smoothing arithmetic,
    and the per-doc log-weight folded over bucket-sorted structs with a
    0.0-prepended left-assoc list_reduce (the L39 float discipline), so
    log_weights match bit-for-bit and the top-100 cut (log_weight DESC,
    doc_id ASC — exact-dup texts tie) falls identically."""
    from lmss_entity_extractor_spark.ops.dsir import dsir_select

    d = _t(spark, sf_dir, "documents")
    return dsir_select(d, d.filter(F.col("lang") == "fr"), k=100, m=512).select(
        "doc_id", "lang", "n_grams", "log_weight"
    )


def q_corpus_line_dedup(spark, sf_dir):
    """C4/RefinedWeb corpus-level line dedup (L38): drop every line
    occurring >= 3 times corpus-wide.  The sf documents are single-line,
    so the query derives a multi-line corpus DETERMINISTICALLY (split at
    the token " value ", plus three injected boilerplate lines keyed on
    doc_id residues) — the oracle constructs the identical input in SQL.
    Counting is a map-side-combinable groupBy(line); removal is a left
    anti-style join against the (tiny) frequent-line blocklist;
    reassembly is a per-doc sort-agg — nothing all-pairs, two keyed
    shuffles total.  Oracle: same rule via unnest + HAVING + ANTI JOIN +
    ordered string_agg in DuckDB."""
    from pyspark.sql import functions as F

    from lmss_entity_extractor_spark.ops.linededup import corpus_line_dedup

    docs = _t(spark, sf_dir, "documents")
    derived = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("subscribe to our newsletter\n")
            ).otherwise(F.lit("")),
            F.replace(F.col("text"), F.lit(" value "), F.lit("\n")),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\nall rights reserved")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit("\nclick here to read more")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return corpus_line_dedup(derived, min_count=3)


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs within label buckets."""
    from lmss_entity_extractor_spark.ops.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.9, bucket_col="label"
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs -> clusters: connected components (iterative
    min-label propagation, localCheckpoint-flattened lineage) over the
    MinHash+LSH candidate pairs, canonical = min doc id.  Oracle: DuckDB
    recursive CTE computing min-reachable-label over the same pairs."""
    from lmss_entity_extractor_spark.ops.components import dedup_clusters
    from lmss_entity_extractor_spark.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_t(spark, sf_dir, "documents"), n=3, num_hashes=8, bands=4)
    return dedup_clusters(pairs)


def q_dedup_clusters_star(spark, sf_dir):
    """The same clusters via large-star/small-star components (Kiveris
    et al., SoCC'14; L31) — O(log diameter) rounds instead of
    O(diameter), the variant for long-chain graphs.  Label contract is
    identical to dedup_clusters, so the SAME recursive-CTE oracle
    value-checks it (VERDICT r3 #2)."""
    from lmss_entity_extractor_spark.ops.components import dedup_clusters
    from lmss_entity_extractor_spark.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_t(spark, sf_dir, "documents"), n=3, num_hashes=8, bands=4)
    return dedup_clusters(pairs, algorithm="star")


def q_range_join(spark, sf_dir):
    """Range (interval) join via the bucketed composition: orders priced
    into half-open price bands — interval explode + equi-join on the
    coarse bucket + exact containment filter, NOT a θ-join (plan
    asserted in tests/test_plans.py)."""
    from lmss_entity_extractor_spark.ops.interval import range_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    bands = spark.range(60).select(
        F.col("id").cast("int").alias("band"),
        (F.col("id") * 10000).cast("double").alias("lo"),
        ((F.col("id") + 1) * 10000).cast("double").alias("hi"),
    )
    j = range_join(o, bands, "price", "lo", "hi", bucket_width=10000.0, end_inclusive=False)
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("price"), 2).alias("revenue"),
    )


def q_curate(spark, sf_dir):
    """The operators composed into one curation dataflow (dedup clusters
    -> canonical-only -> quality filter -> chunk -> pack) as a SINGLE
    lazy plan; the oracle is the corresponding composition of the
    per-operator SQL twins — the pipeline, not just its pieces, is
    value-checked."""
    from lmss_entity_extractor_spark.ops.curate import curate_corpus

    return curate_corpus(
        _t(spark, sf_dir, "documents"),
        min_quality=0.7,
        chunk_tokens=32,
        stride=24,
        capacity=64,
        n_shards=8,
    )


def q_quantize(spark, sf_dir):
    """int8 embedding quantization, value-checked to the CODE level: the
    oracle recomputes scale and every int8 code (floor(x/scale + 0.5)
    half-up — explicit, since Spark round() is half-up and DuckDB's is
    half-even) and independently re-derives the >=0.999 cosine-fidelity
    claim from its own dequantization."""
    from lmss_entity_extractor_spark.ops.quantize import dequantize_expr, quantize_embeddings
    from lmss_entity_extractor_spark.ops.similarity import cosine_expr

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    qd = quantize_embeddings(e)
    return qd.select(
        "vec_id",
        (F.floor(F.col("q_scale") * 1e6) / 1e6).alias("scale6"),
        F.array_join(F.transform("q_vec", lambda q: q.cast("string")), ",").alias("codes"),
        (
            cosine_expr(dequantize_expr(F.col("q_vec"), F.col("q_scale")), F.col("embedding"))
            >= 0.999
        ).alias("cos_ok"),
    )


def q_pack_chunks(spark, sf_dir):
    """Sequence packing: chunk the documents, then cut each shard's
    deterministic chunk stream into 64-token bins (window cumsum per
    shard — shards pack in parallel)."""
    from lmss_entity_extractor_spark.ops.textprep import chunk_documents, pack_chunks

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100),
        chunk_tokens=32,
        stride=32,
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(8)).cast("int"))
    return pack_chunks(
        chunks, capacity=64, shard_col="shard", order_cols=["doc_id", "chunk_idx"]
    ).select("doc_id", "chunk_idx", "shard", "tok_offset", "bin_id", "n_chunk_tokens")


def q_sketch_accuracy(spark, sf_dir):
    """Sketch operators under an oracle-checkable contract: the query
    returns exact values PLUS boolean accuracy claims about the sketches
    (HLL++ approx distinct within 5%, approx percentile within 2% of the
    exact p50).  DuckDB can't reproduce Spark's sketch values, but it CAN
    pin the exact sides and assert the claims as literal TRUE — so a
    sketch drifting out of tolerance fails the value-hash gate."""
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_nd"),
        F.approx_count_distinct("user_id", 0.02).alias("_and"),
        F.expr("percentile(value, 0.5)").alias("_p50"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("_ap50"),
    )
    return agg.select(
        "event_type",
        "exact_nd",
        (F.abs(F.col("_and") - F.col("exact_nd")) <= 0.05 * F.col("exact_nd")).alias(
            "hll_within_5pct"
        ),
        F.round("_p50", 4).alias("p50"),
        (F.abs(F.col("_ap50") - F.col("_p50")) <= 0.02 * F.abs(F.col("_p50"))).alias(
            "approx_p50_within_2pct"
        ),
    )


def q_full_outer_join(spark, sf_dir):
    """Full outer join with disjoint key ranges on both sides — all
    three row classes (left-only, right-only, both) exercised."""
    o94 = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1994)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_1994"))
    )
    o96 = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1996)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_1996"))
    )
    return (
        o94.join(o96, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce("n_1994", F.lit(0)).alias("n_1994"),
            F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
        )
    )


def q_rank_funcs(spark, sf_dir):
    """Ranking window function family: rank / dense_rank / ntile /
    percent_rank / cume_dist over suppliers per nation."""
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_unpivot_long(spark, sf_dir):
    """UNPIVOT (wide -> long): per-user event-type counts melted back to
    (user_id, etype, n) rows — the inverse of pivot_events."""
    e = _t(spark, sf_dir, "events")
    wide = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("view"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase"),
    )
    return wide.unpivot("user_id", ["click", "view", "purchase"], "etype", "n")


def q_explode_outer(spark, sf_dir):
    """explode_outer (LATERAL VIEW OUTER): rows with empty arrays
    survive with a null element — the semantics plain explode silently
    drops."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: F.length(t) >= 12
    )
    return d.select("doc_id", F.explode_outer(words).alias("long_word"))


def q_time_rollup(spark, sf_dir):
    """Time-bucketed rollup (hypertable-style continuous-aggregate
    shape): events into 6-hour buckets x event_type with ROLLUP
    subtotals."""
    e = _t(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 21600).cast("long") * 21600
    )
    return (
        e.select(bucket.alias("bucket6h"), "event_type", "value")
        .rollup("bucket6h", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def q_chunk_docs(spark, sf_dir):
    """LLM-pretraining document chunking: sliding token windows
    (32-token chunks, stride 24 -> 8-token overlap), executor-side
    explode, tails kept."""
    from lmss_entity_extractor_spark.ops.textprep import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50),
        chunk_tokens=32,
        stride=24,
    )


def q_pii_scrub(spark, sf_dir):
    """PII scrub with per-category audit counts over documents augmented
    with deterministic synthetic PII (the raw corpus has none to find);
    redaction order (SSN before phone) is part of the contract."""
    from lmss_entity_extractor_spark.ops.textprep import scrub_pii

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    synth = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example now, SSN 123-45-6789, call 415-555-"),
            F.lpad(F.pmod(F.col("doc_id"), 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return scrub_pii(synth)


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum sampling (Knuth multiplicative hash on
    the key): per-label keep-rates, reproducible in pure integer SQL and
    stable under appends — which row-level rand()/TABLESAMPLE is not."""
    from lmss_entity_extractor_spark.ops.textprep import stratified_sample

    e = _t(spark, sf_dir, "embeddings")
    rate = F.lit(100) + F.col("label") * F.lit(50)
    return stratified_sample(e, "vec_id", "label", rate).select("vec_id", "label")


def q_bm25(spark, sf_dir):
    """BM25 ranked retrieval (k1=1.2, b=0.75): inverted-index build +
    broadcast query-term probe + keyed score sum + top-k; whole formula
    reproduced in the SQL oracle."""
    from lmss_entity_extractor_spark.ops.bm25 import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), "spark shuffle partition memory", k=10)


def q_quality_stats(spark, sf_dir):
    """Per-document quality features."""
    from lmss_entity_extractor_spark.ops.textstats import quality_stats

    return quality_stats(_t(spark, sf_dir, "documents"))


def q_langid(spark, sf_dir):
    """Stopword-probe language heuristic."""
    from lmss_entity_extractor_spark.ops.textstats import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def q_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish regex token counting."""
    from lmss_entity_extractor_spark.ops.textstats import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    """Normalization fingerprint (md5 of lowercased alphanumerics)."""
    from lmss_entity_extractor_spark.ops.textstats import doc_fingerprint

    return doc_fingerprint(_t(spark, sf_dir, "documents"))


def q_context_slice(spark, sf_dir):
    """W3 context slice: ±30 chars around the first 'spark' occurrence."""
    d = _t(spark, sf_dir, "documents")
    pos = F.instr(F.col("text"), F.lit("spark"))
    return (
        d.filter(pos > 0)
        .select(
            "doc_id",
            F.substring(F.col("text"), F.greatest(pos - 30, F.lit(1)), F.lit(60) + F.least(pos - 31, F.lit(0))).alias("context"),
        )
    )


def q_source_split(spark, sf_dir):
    """F11 split-first-token tag: part type family counts."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.split(F.col("p_type"), " ").getItem(0).alias("type_family"))
        .groupBy("type_family")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def q_coalesce_backfill(spark, sf_dir):
    """P12 null backfill: nullif + coalesce -> 'Unknown'."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("Unknown")).alias("etype"))
        .groupBy("etype")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q_stable_sort(spark, sf_dir):
    """T5 stable output ordering on (ts, event_id)."""
    return (
        _t(spark, sf_dir, "events")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .limit(50)
        .select("event_id", "event_type")
    )


def q_array_mean(spark, sf_dir):
    """A3 element-wise mean embedding per group (the ontology build's
    mean-of-field-embeddings, `app/lmss_classification.py:50-60`), as
    posexplode -> groupBy(label, pos) -> avg."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg((F.floor(F.avg("val") * 10000) / 10000).alias("mean_val"))
    )


def q_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (10 iters, d=0.85) over the
    order->customer->nation->region hierarchy — the iterative-algorithm
    workload beyond closure, joined+aggregated per iteration with
    localCheckpoint-flattened lineage.  The oracle unrolls the identical
    recurrence as 10 SQL CTEs; ranks compare on a floor-1e6 grid (the
    recurrences agree to ~1e-16 relative; the grid absorbs summation-
    order ulps)."""
    from lmss_entity_extractor_spark.graph.pagerank import pagerank

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    edges = (
        o.select(
            F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
                F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
            )
        )
    )
    pr = pagerank(edges, n_iters=10, damping=0.85)
    return pr.select("node", (F.floor(F.col("rank") * 1e6) / 1e6).alias("rank6"))


def q_hits(spark, sf_dir):
    """Fixed-iteration HITS (L63, Kleinberg JACM'99; 5 iters,
    max-normalized) over the order->customer->nation->region hierarchy
    — hubs and authorities per node, the companion ranking to
    `pagerank`.  Max-normalization keeps the only global reduction
    order-independent, so the oracle (identical recurrence unrolled as
    CTEs) agrees to ulps; scores compare on the floor-1e6 grid."""
    from lmss_entity_extractor_spark.graph.hits import hits

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    edges = (
        o.select(
            F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
                F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
            )
        )
    )
    out = hits(edges, n_iters=5)
    return out.select(
        "node",
        (F.floor(F.col("hub") * 1e6) / 1e6).alias("hub6"),
        (F.floor(F.col("auth") * 1e6) / 1e6).alias("auth6"),
    )


def q_triangles(spark, sf_dir):
    """Triangle counting + local clustering coefficient (L44) over the
    part co-occurrence graph (parts sharing an order): degree-ordered
    orientation (Suri & Vassilvitskii WWW'11) generates each triangle
    exactly once at its min-rank apex — wedge fan-out bounded O(sqrt m)
    regardless of hub skew.  The oracle enumerates triangles the NAIVE
    independent way (three-way canonical-edge join a<b<c), so the
    orientation machinery itself is value-checked."""
    from lmss_entity_extractor_spark.graph.triangles import triangle_counts

    po = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return triangle_counts(edges)


def q_shortest_hops(spark, sf_dir):
    """Bounded-hop BFS (L45): minimal hop counts from nation n:0 over
    the undirected order->customer->nation->region hierarchy, 3-hop
    horizon — frontier expansion, one keyed join + one anti-join per
    round, one row per REACHED node (not per reachable pair, unlike the
    closure).  Oracle: DuckDB recursive CTE walking (node, hops) states
    with the same bound, min(hops) per node."""
    from lmss_entity_extractor_spark.graph.paths import shortest_hops

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    edges = (
        o.select(
            F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
                F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
            )
        )
    )
    return shortest_hops(edges, ["n:0"], max_hops=3, directed=False)


def q_link_predict(spark, sf_dir):
    """Neighborhood-overlap link prediction (L46) on the part
    co-occurrence graph: non-adjacent part pairs sharing >= 2 co-order
    neighbors, scored by common-neighbor count and neighborhood Jaccard
    (Liben-Nowell & Kleinberg CIKM'03).  Jaccard is a single division
    of exact integers — engine-reproducible.  Oracle: the same wedge
    count re-derived with a plain SQL self-join + NOT EXISTS."""
    from lmss_entity_extractor_spark.graph.linkpred import link_prediction_scores

    po = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 8 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return link_prediction_scores(edges, min_common=2)


def q_ppr(spark, sf_dir):
    """Personalized PageRank (L48, Jeh & Widom WWW'03) from sources
    {n:0, n:1} over the order->customer->nation->region hierarchy:
    teleport restarts at the source set, measuring graph proximity —
    the KG candidate-ranking signal.  Oracle: the identical recurrence
    unrolled as 10 SQL CTEs (the `pagerank` discipline); ranks compare
    on the floor-1e6 grid that absorbs summation-order ulps."""
    from lmss_entity_extractor_spark.graph.pagerank import personalized_pagerank

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    edges = (
        o.select(
            F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
                F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
            )
        )
    )
    pr = personalized_pagerank(edges, ["n:0", "n:1"], n_iters=10)
    return pr.select("node", (F.floor(F.col("rank") * 1e6) / 1e6).alias("rank6"))


def q_random_walks(spark, sf_dir):
    """Deterministic random walks (L49, the DeepWalk corpus generator)
    over the symmetrized part co-occurrence graph: 3 steps from every
    node, neighbor choice = engine-portable md5-prefix hash of
    (cur, step, walk, seed) mod degree — reproducible corpus artifacts,
    no RNG.  Oracle: the identical recurrence unrolled as 3 CTE steps
    with the same hash and the same dense-rank adjacency ordering."""
    from lmss_entity_extractor_spark.graph.walks import random_walks

    po = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    pairs = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
    )
    sym = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    return random_walks(sym, walk_len=3, walks_per_node=1, seed=0)


def q_cooccur_pmi(spark, sf_dir):
    """PMI/NPMI co-occurrence edge mining (L50) over (order, part)
    observations — the statistical association-edge builder a KG runs
    after entity linking.  Counts are exact; scores land on the half-up
    1e-6 grid (floor(x*1e6 + 0.5) — explicit, since Spark round() is
    half-up and DuckDB's is half-even, and JVM/libm ln may differ by
    1 ulp per term).  Oracle: identical counts + identical fixed log
    expression tree + identical grid in DuckDB."""
    from lmss_entity_extractor_spark.graph.cooccur import cooccurrence_edges

    obs = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
    )
    ed = cooccurrence_edges(obs, "l_orderkey", "l_partkey", min_count=2)

    def grid(c):
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    return ed.select(
        "item_a",
        "item_b",
        "n_co",
        "n_a",
        "n_b",
        grid(F.col("pmi")).alias("pmi6"),
        grid(F.col("npmi")).alias("npmi6"),
    )


def q_rdfs_entail(spark, sf_dir):
    """RDFS entailment materialization (L51, graph/rdfs.py): close an
    instance graph drawn from customer→nation under the ρdf fragment
    (rules rdfs2/3/5/7/9/11) against a six-row literal schema that
    exercises every rule — subPropertyOf chain (located_in ⊑ within ⊑
    part_of), subClassOf chain (Nation ⊑ Territory ⊑ Geo), a domain and
    a range declaration.  Oracle: the same stratified derivation in
    DuckDB — recursive CTEs for the two sub-hierarchy closures, then the
    lift/domain/range/type joins — so every derived triple is re-earned
    by an independent engine."""
    from lmss_entity_extractor_spark.graph.rdfs import rdfs_entail

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    n = _t(spark, sf_dir, "nation")
    inst = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("s"),
        F.lit("located_in").alias("p"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("o"),
    ).unionByName(
        n.select(
            F.concat(F.lit("n:"), F.col("n_nationkey")).alias("s"),
            F.lit("rdf:type").alias("p"),
            F.lit("Nation").alias("o"),
        )
    )
    schema = spark.createDataFrame(
        [
            ("located_in", "rdfs:subPropertyOf", "within"),
            ("within", "rdfs:subPropertyOf", "part_of"),
            ("Nation", "rdfs:subClassOf", "Territory"),
            ("Territory", "rdfs:subClassOf", "Geo"),
            ("located_in", "rdfs:domain", "Customer"),
            ("within", "rdfs:range", "Territory"),
        ],
        "s string, p string, o string",
    )
    return rdfs_entail(inst, schema)


def _sameas_fixture(spark, sf_dir):
    """Shared identity-graph fixture for `sameas_resolve` and
    `kg_publish`: instance facts asserted on canonical AND alias ids
    (both positions), plus sameAs chains of length 3."""
    from lmss_entity_extractor_spark.graph.sameas import SAMEAS_PRED

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("nk")
    )
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("name")
    )
    cn = c.filter(F.col("k") % 20 == 0).join(n, "nk")
    inst = (
        c.filter(F.col("k") % 10 == 0)
        .select(
            F.concat(F.lit("c:"), "k").alias("s"),
            F.lit("located_in").alias("p"),
            F.concat(F.lit("n:"), "nk").alias("o"),
        )
        .unionByName(
            cn.select(
                F.concat(F.lit("dup:"), "k").alias("s"),
                F.lit("located_in").alias("p"),
                F.concat(F.lit("nname:"), "name").alias("o"),
            )
        )
        .unionByName(
            c.filter(F.col("k") % 20 == 0).select(
                F.concat(F.lit("dup:"), "k").alias("s"),
                F.lit("type").alias("p"),
                F.lit("Customer").alias("o"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("hq:"), "nk").alias("s"),
                F.lit("located_near").alias("p"),
                F.concat(F.lit("nname:"), "name").alias("o"),
            )
        )
    )
    sameas = (
        c.filter(F.col("k") % 20 == 0)
        .select(
            F.concat(F.lit("dup:"), "k").alias("s"),
            F.lit(SAMEAS_PRED).alias("p"),
            F.concat(F.lit("c:"), "k").alias("o"),
        )
        .unionByName(
            c.filter(F.col("k") % 40 == 0).select(
                F.concat(F.lit("dup2:"), "k").alias("s"),
                F.lit(SAMEAS_PRED).alias("p"),
                F.concat(F.lit("dup:"), "k").alias("o"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("nname:"), "name").alias("s"),
                F.lit(SAMEAS_PRED).alias("p"),
                F.concat(F.lit("n:"), "nk").alias("o"),
            )
        )
    )
    return inst.unionByName(sameas)


def q_sameas_resolve(spark, sf_dir):
    """owl:sameAs smushing (L52, graph/sameas.py): connected-component
    canonical-IRI election over the sameAs graph, then subject+object
    rewrite of the fact table.  The fixture exercises chains of length
    3 (dup2 ~ dup ~ c), object-position aliases (nname ~ n), fact
    collapse (dup facts merging into asserted canonical facts) and
    novel derived facts (type/located_near rows that only exist after
    rewriting).  Oracle: reachability via recursive CTE + min election
    + the same two left-join rewrites in DuckDB."""
    from lmss_entity_extractor_spark.graph.sameas import sameas_resolve

    return sameas_resolve(_sameas_fixture(spark, sf_dir))


def q_kg_publish(spark, sf_dir):
    """Composed KG publish (L52∘L51): sameAs smushing, then RDFS
    entailment over the resolved graph (type_pred='type', a 4-rule
    schema with a domain declared on the SUPERPROPERTY so rdfs2 only
    fires through rdfs7's lifting — the stratification is load-
    bearing), then a per-predicate profile of the published graph.
    One lazy plan end-to-end.  Oracle: the L52 resolution CTEs feeding
    the rule arms and the same GROUP BY."""
    from lmss_entity_extractor_spark.graph.rdfs import rdfs_entail
    from lmss_entity_extractor_spark.graph.sameas import sameas_resolve

    resolved = sameas_resolve(_sameas_fixture(spark, sf_dir))
    schema = spark.createDataFrame(
        [
            ("located_in", "rdfs:subPropertyOf", "within"),
            ("within", "rdfs:domain", "Customer"),
            ("within", "rdfs:range", "Place"),
            ("Customer", "rdfs:subClassOf", "Party"),
        ],
        "s string, p string, o string",
    )
    entailed = rdfs_entail(resolved, schema, type_pred="type")
    return entailed.groupBy("p").agg(F.count(F.lit(1)).alias("n"))


def q_shacl_violations(spark, sf_dir):
    """SHACL-lite validation (L53, graph/shacl.py) over a triple fixture
    seeded with every violation kind: missing located_in (minCount,
    including the zero-count case), doubled located_in (maxCount),
    malformed emails (pattern), and edges to untyped nodes (class).
    Oracle: the same focus/count/value derivation in plain SQL — counts
    via GROUP BY, pattern via anchored regexp_matches, class via NOT
    EXISTS against the type slice."""
    from lmss_entity_extractor_spark.graph.shacl import validate_shapes

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("nk")
    )
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nk"))
    triples = (
        c.select(
            F.concat(F.lit("c:"), "k").alias("s"),
            F.lit("rdf:type").alias("p"),
            F.lit("Customer").alias("o"),
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), "nk").alias("s"),
                F.lit("rdf:type").alias("p"),
                F.lit("Nation").alias("o"),
            )
        )
        .unionByName(
            c.filter(F.col("k") % 30 != 0).select(
                F.concat(F.lit("c:"), "k").alias("s"),
                F.lit("located_in").alias("p"),
                F.concat(F.lit("n:"), "nk").alias("o"),
            )
        )
        .unionByName(
            c.filter(F.col("k") % 40 == 0).select(
                F.concat(F.lit("c:"), "k").alias("s"),
                F.lit("located_in").alias("p"),
                F.concat(F.lit("n:"), (F.col("nk") + 1) % 25).alias("o"),
            )
        )
        .unionByName(
            c.filter(F.col("k") % 50 == 0).select(
                F.concat(F.lit("c:"), "k").alias("s"),
                F.lit("located_in").alias("p"),
                F.concat(F.lit("x:"), "k").alias("o"),
            )
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), "k").alias("s"),
                F.lit("email").alias("p"),
                F.when(F.col("k") % 20 == 0, F.lit("bad"))
                .otherwise(F.concat(F.lit("u"), "k", F.lit("@ex.com")))
                .alias("o"),
            )
        )
    )
    shapes = spark.createDataFrame(
        [
            ("CustShape", "Customer", "located_in", 1, 1, None, "Nation"),
            ("CustShape", "Customer", "email", None, None, "^[^@]+@[^@]+$", None),
        ],
        "shape_id string, target_class string, path string, min_count int, "
        "max_count int, pattern string, value_class string",
    )
    return validate_shapes(triples, shapes)


def _bgp_fixture(spark, sf_dir):
    """Order→customer→nation triple graph where only regions 0-2
    nations carry rdf:type — shared by the BGP chain and OPTIONAL
    contract queries."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    triples = (
        o.select(
            F.concat(F.lit("o:"), "o_orderkey").alias("s"),
            F.lit("placed_by").alias("p"),
            F.concat(F.lit("c:"), "o_custkey").alias("o"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), "c_custkey").alias("s"),
                F.lit("located_in").alias("p"),
                F.concat(F.lit("n:"), "c_nationkey").alias("o"),
            )
        )
        .unionByName(
            n.filter(F.col("n_regionkey") < 3).select(
                F.concat(F.lit("n:"), "n_nationkey").alias("s"),
                F.lit("rdf:type").alias("p"),
                F.lit("Nation").alias("o"),
            )
        )
    )
    return triples


def q_bgp_match(spark, sf_dir):
    """SPARQL BGP matching (L54, graph/bgp.py): a 3-pattern chain query
    (?o placed_by ?c)(?c located_in ?n)(?n rdf:type Nation) compiled to
    DataFrame joins over an order→customer→nation triple graph where
    only regions 0-2 nations are typed — the type pattern genuinely
    filters.  Oracle: the equivalent 3-way SQL join."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_match

    return bgp_match(
        _bgp_fixture(spark, sf_dir),
        [
            ("?o", "placed_by", "?c"),
            ("?c", "located_in", "?n"),
            ("?n", "rdf:type", "Nation"),
        ],
    )


def q_bgp_optional(spark, sf_dir):
    """SPARQL OPTIONAL + FILTER (graph/bgp.py bgp_query): the chain
    WHERE with an OPTIONAL type group — untyped nations (regions 3-4)
    survive with a NULL ?t — and a FILTER referencing the optional
    variable (the spec-mandated filter-after-LeftJoin placement).
    Oracle: LEFT JOIN + IS-NULL-or-match in SQL."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_query

    return bgp_query(
        _bgp_fixture(spark, sf_dir),
        [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")],
        optional=[[("?n", "rdf:type", "?t")]],
        filters=["t IS NULL OR t = 'Nation'"],
    )


def q_property_path(spark, sf_dir):
    """SPARQL property paths (L55, graph/proppath.py): the expression
    placed_by / (located_in | in_state) / within*  — sequence,
    alternative, and zero-or-more in one query — over an order→customer
    →nation→region triple graph where customers split between two
    location predicates.  The star's zero-length arm keeps the (order,
    nation) pairs; its one-hop arm adds (order, region).  Oracle: both
    arms derived by plain joins and UNION'd."""
    from lmss_entity_extractor_spark.graph.proppath import property_path

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    triples = (
        o.select(
            F.concat(F.lit("o:"), "o_orderkey").alias("s"),
            F.lit("placed_by").alias("p"),
            F.concat(F.lit("c:"), "o_custkey").alias("o"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), "c_custkey").alias("s"),
                F.when(F.col("c_custkey") % 2 == 0, F.lit("located_in"))
                .otherwise(F.lit("in_state"))
                .alias("p"),
                F.concat(F.lit("n:"), "c_nationkey").alias("o"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), "n_nationkey").alias("s"),
                F.lit("within").alias("p"),
                F.concat(F.lit("r:"), "n_regionkey").alias("o"),
            )
        )
    )
    return property_path(
        triples,
        ("seq", "placed_by", ("alt", "located_in", "in_state"), ("star", "within")),
    )


def q_ntriples_roundtrip(spark, sf_dir):
    """N-Triples I/O (L56, graph/ntriples.py): format part-table facts
    as NT lines — literals deliberately seeded with quotes, a
    backslash, a newline and a tab, plus @en tags and plain IRIs —
    then PARSE the lines back.  The oracle derives the expected parsed
    rows directly from the table, so any escaping or grammar defect in
    either direction breaks the hash."""
    from lmss_entity_extractor_spark.graph.ntriples import (
        parse_ntriples,
        to_ntriples,
    )

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    trips = part.select(
        F.concat(F.lit("part:"), "p_partkey").alias("s"),
        F.lit("hasName").alias("p"),
        F.concat(F.lit('say "'), F.col("p_name"), F.lit('"\\\n\tend')).alias("o"),
        F.lit("literal").alias("o_kind"),
        F.when(F.col("p_partkey") % 40 == 0, F.lit("en"))
        .otherwise(F.lit(None).cast("string"))
        .alias("lang"),
        F.lit(None).cast("string").alias("datatype"),
    ).unionByName(
        part.select(
            F.concat(F.lit("part:"), "p_partkey").alias("s"),
            F.lit("hasBrand").alias("p"),
            F.concat(F.lit("brand:"), "p_brand").alias("o"),
            F.lit("iri").alias("o_kind"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("datatype"),
        )
    )
    return parse_ntriples(to_ntriples(trips))


def q_resolve_entities(spark, sf_dir):
    """Entity resolution (L57, graph/er.py) over name-variant records
    seeded from the customer table: base / 4-of-5-token variant /
    distractor per key.  Exercises the stop-token guard (shared tokens
    like 'cust'/'alpha' exceed the block cap at sf0.01 but not all do
    at sf0.001 — the Jaccard still rejects cross-key pairs either
    way), the exact-rational 0.8 boundary (4/5 MUST match), and
    cluster totality.  Oracle: the whole pipeline re-derived in SQL —
    token lists, block counts, pair join, list_intersect Jaccard with
    the same integer cross-multiplication, recursive-CTE components."""
    from lmss_entity_extractor_spark.graph.er import resolve_entities

    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    recs = (
        c.filter(F.col("k") % 10 == 0)
        .select(
            F.concat(F.lit("b:"), "k").alias("node_id"),
            F.concat(F.lit("cust "), "k", F.lit(" alpha beta")).alias("name"),
        )
        .unionByName(
            c.filter(F.col("k") % 20 == 0).select(
                F.concat(F.lit("v:"), "k").alias("node_id"),
                F.concat(F.lit("cust "), "k", F.lit(" alpha beta gamma")).alias(
                    "name"
                ),
            )
        )
        .unionByName(
            c.filter(F.col("k") % 30 == 0).select(
                F.concat(F.lit("d:"), "k").alias("node_id"),
                F.concat(F.lit("cust "), "k", F.lit(" delta")).alias("name"),
            )
        )
    )
    return resolve_entities(recs, threshold=0.8, max_block_size=50)


def q_negative_samples(spark, sf_dir):
    """Deterministic KG negative sampling (L58, graph/negsample.py):
    k=2 filtered corruptions per side over customer→nation positives.
    Oracle: identical md5-prefix pick hash, identical md5-ordered pool
    ranking, identical original-entity and filtered-positive drops —
    the negatives are re-minted entity-for-entity in DuckDB."""
    from lmss_entity_extractor_spark.graph.negsample import negative_samples

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    pos = c.select(
        F.concat(F.lit("c:"), "c_custkey").alias("s"),
        F.lit("located_in").alias("p"),
        F.concat(F.lit("n:"), "c_nationkey").alias("o"),
    )
    return negative_samples(pos, k=2, corrupt="both", seed=0)


def q_label_propagation(spark, sf_dir):
    """Sync label propagation (L59, graph/lpa.py): 3 deterministic
    rounds over the part co-purchase graph (the random_walks fixture
    graph).  Oracle: the identical recurrence unrolled — one count CTE
    + one window-argmax CTE per round, same (count desc, label asc)
    tie-break."""
    from lmss_entity_extractor_spark.graph.lpa import label_propagation

    po = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    e = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    return label_propagation(e, iterations=3)


def q_charsets(spark, sf_dir):
    """Characteristic sets (L60, graph/charsets.py) over a customer
    triple fixture with four entity shapes ({nation}, {nation,segment},
    {nation,phone}, {nation,segment,phone}) and duplicated nation
    triples for every 10th customer — n_triples must diverge from
    per-set predicate counts.  Oracle: list(DISTINCT)/list_sort +
    the same two GROUP BYs in DuckDB."""
    from lmss_entity_extractor_spark.graph.charsets import characteristic_sets

    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    subj = F.concat(F.lit("c:"), "k").alias("s")
    trips = (
        c.select(subj, F.lit("nation").alias("p"), F.lit("x").alias("o"))
        .unionByName(
            c.filter(F.col("k") % 2 == 0).select(
                subj, F.lit("segment").alias("p"), F.lit("x").alias("o")
            )
        )
        .unionByName(
            c.filter(F.col("k") % 5 == 0).select(
                subj, F.lit("phone").alias("p"), F.lit("x").alias("o")
            )
        )
        .unionByName(
            c.filter(F.col("k") % 10 == 0).select(
                subj, F.lit("nation").alias("p"), F.lit("y").alias("o")
            )
        )
    )
    return characteristic_sets(trips)


def q_dict_encode(spark, sf_dir):
    """Dictionary-encoded triples (L61, graph/dictenc.py) over a
    customer/nation triple fixture whose object terms ("n:<key>") are
    also subjects — the shared term universe is the point of a global
    dictionary.  Oracle: row_number over sorted distinct terms + three
    joins, re-deriving every id."""
    from lmss_entity_extractor_spark.graph.dictenc import (
        encode_triples,
        term_dictionary,
    )

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    subj = F.concat(F.lit("c:"), "c_custkey").alias("s")
    nsub = F.concat(F.lit("n:"), "c_nationkey").alias("s")
    trips = (
        c.select(subj, F.lit("nation").alias("p"), F.concat(F.lit("n:"), "c_nationkey").alias("o"))
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 0).select(
                subj, F.lit("segment").alias("p"), F.col("c_mktsegment").alias("o")
            )
        )
        .unionByName(
            c.select(nsub, F.lit("type").alias("p"), F.lit("Nation").alias("o")).distinct()
        )
    )
    return encode_triples(trips, term_dictionary(trips))


def q_conflict_resolution(spark, sf_dir):
    """Truth discovery / conflict resolution (L62, graph/fusion.py):
    clerk buckets (sources, o_orderkey % 7) assert an order priority
    (object) for each customer (subject) — naturally conflicting
    multi-source claims, with repeated same-source assertions that
    exercise the set semantics.  Elect one priority per customer by
    majority vote with ascending-object tie-break.  Oracle: the same
    two-level aggregation + window argmax in DuckDB over DISTINCT
    (s,p,o,source) claims."""
    from lmss_entity_extractor_spark.graph.fusion import resolve_conflicts

    o = _t(spark, sf_dir, "orders")
    claims = o.select(
        F.concat(F.lit("c:"), "o_custkey").alias("s"),
        F.lit("priority").alias("p"),
        F.col("o_orderpriority").alias("o"),
        F.concat(F.lit("clerk:"), F.col("o_orderkey") % 7).alias("source"),
    )
    return resolve_conflicts(claims)


def q_kcore(spark, sf_dir):
    """3-core of the part co-occurrence graph (L65, graph/kcore.py):
    iterative peel to fixpoint — parts kept only while ≥3 co-purchase
    neighbors survive.  The fixpoint is round-count-independent, so the
    oracle unrolls the same peel rule for 8 rounds (≥ the fixture's
    peel depth; idempotent past convergence) and must land on the same
    node set and in-core degrees."""
    from lmss_entity_extractor_spark.graph.kcore import kcore

    po = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return kcore(edges, k=3)


def q_void_stats(spark, sf_dir):
    """VoID property partitions (L64, graph/void.py) over a typed
    customer/nation triple fixture — per-predicate triple counts plus
    distinct-subject/object counts, the dataset description a KG
    publisher emits.  Oracle: the same GROUP BY with COUNT(DISTINCT)
    in DuckDB."""
    from lmss_entity_extractor_spark.graph.void import void_property_partitions

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    subj = F.concat(F.lit("c:"), "c_custkey").alias("s")
    trips = (
        c.select(subj, F.lit("nation").alias("p"), F.concat(F.lit("n:"), "c_nationkey").alias("o"))
        .unionByName(c.select(subj, F.lit("rdf:type").alias("p"), F.lit("Customer").alias("o")))
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 0).select(
                subj, F.lit("segment").alias("p"), F.col("c_mktsegment").alias("o")
            )
        )
        .unionByName(
            c.select(
                F.concat(F.lit("n:"), "c_nationkey").alias("s"),
                F.lit("rdf:type").alias("p"),
                F.lit("Nation").alias("o"),
            ).distinct()
        )
    )
    return void_property_partitions(trips)


def q_quotient_graph(spark, sf_dir):
    """Characteristic-set quotient graph (L66, graph/quotient.py) over
    the typed customer/nation triple fixture: customers split into
    {nation, rdf:type} / {nation, rdf:type, segment} shapes, nations
    into {rdf:type}, literals into the empty leaf class — summary
    edges with triple counts.  Oracle: per-subject list(DISTINCT)
    classes + two endpoint joins + the same GROUP BY in DuckDB."""
    from lmss_entity_extractor_spark.graph.quotient import quotient_graph

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    subj = F.concat(F.lit("c:"), "c_custkey").alias("s")
    trips = (
        c.select(subj, F.lit("nation").alias("p"), F.concat(F.lit("n:"), "c_nationkey").alias("o"))
        .unionByName(c.select(subj, F.lit("rdf:type").alias("p"), F.lit("Customer").alias("o")))
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 0).select(
                subj, F.lit("segment").alias("p"), F.col("c_mktsegment").alias("o")
            )
        )
        .unionByName(
            c.select(
                F.concat(F.lit("n:"), "c_nationkey").alias("s"),
                F.lit("rdf:type").alias("p"),
                F.lit("Nation").alias("o"),
            ).distinct()
        )
    )
    return quotient_graph(trips)


def q_coalesce_intervals(spark, sf_dir):
    """Valid-time interval coalescing (L67, graph/temporal.py): each
    order asserts its customer's priority valid for 30 days from the
    order date; chains of orders within 30 days merge into one maximal
    validity interval per (customer, priority) — gaps-and-islands with
    a running-max end.  Oracle: the identical two-window recurrence in
    DuckDB on integer day offsets (no float drift)."""
    from lmss_entity_extractor_spark.graph.temporal import coalesce_intervals

    o = _t(spark, sf_dir, "orders")
    day0 = F.lit("1990-01-01")
    iv = o.select(
        F.concat(F.lit("c:"), "o_custkey").alias("s"),
        F.lit("active").alias("p"),
        F.col("o_orderpriority").alias("o"),
        F.datediff("o_orderdate", day0).cast("long").alias("valid_from"),
        (F.datediff("o_orderdate", day0) + 30).cast("long").alias("valid_to"),
    )
    return coalesce_intervals(iv)


def q_shortest_paths(spark, sf_dir):
    """Hop-bounded weighted shortest paths (L68, graph/sssp.py) from
    region r:0 down the reversed region->nation->customer->order
    hierarchy with key-derived integer weights — Bellman-Ford rounds on
    the min-plus semiring; min is order-independent, so integer
    distances match the oracle exactly (no float grid needed).
    Oracle: the identical 3-round recurrence unrolled as MATERIALIZED
    CTEs."""
    from lmss_entity_extractor_spark.graph.sssp import shortest_paths

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    edges = (
        n.select(
            F.concat(F.lit("r:"), F.col("n_regionkey")).alias("src"),
            F.concat(F.lit("n:"), F.col("n_nationkey")).alias("dst"),
            (F.col("n_nationkey") % 3 + 1).alias("w"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("n:"), F.col("c_nationkey")).alias("src"),
                F.concat(F.lit("c:"), F.col("c_custkey")).alias("dst"),
                (F.col("c_custkey") % 7 + 1).alias("w"),
            )
        )
        .unionByName(
            o.select(
                F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
                F.concat(F.lit("o:"), F.col("o_orderkey")).alias("dst"),
                (F.col("o_orderkey") % 11 + 1).alias("w"),
            )
        )
    )
    return shortest_paths(edges, ["r:0"], n_rounds=3)


def q_closure_insert(spark, sf_dir):
    """Incremental closure maintenance (L69, graph/incclosure.py): the
    o->c->n->r hierarchy closure is materialized first, then a batch of
    o->n SHORTCUT edges (o_orderkey % 400) is inserted via the
    semi-naive delta loop — new pairs appear and existing o->n / o->r
    depths shorten, with C never shuffled inside the loop.  Oracle: a
    full recursive-CTE recompute over E ∪ ΔE at min depth — recompute
    equality IS the maintenance contract."""
    from lmss_entity_extractor_spark.graph.closure import transitive_closure
    from lmss_entity_extractor_spark.graph.incclosure import closure_insert

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base_edges = (
        o.select(
            F.concat(F.lit("o:"), F.col("o_orderkey")).alias("child"),
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("parent"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), F.col("c_custkey")).alias("child"),
                F.concat(F.lit("n:"), F.col("c_nationkey")).alias("parent"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("child"),
                F.concat(F.lit("r:"), F.col("n_regionkey")).alias("parent"),
            )
        )
    )
    delta = (
        o.filter(F.col("o_orderkey") % 400 == 0)
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.concat(F.lit("o:"), F.col("o_orderkey")).alias("child"),
            F.concat(F.lit("n:"), F.col("c_nationkey")).alias("parent"),
        )
    )
    base = transitive_closure(base_edges, include_self=False)
    return closure_insert(base, delta).select(
        F.col("desc_iri").alias("descendant"),
        F.col("anc_iri").alias("ancestor"),
        "depth",
    )


def q_flatten_lists(spark, sf_dir):
    """rdf:List flattening (L70, graph/rdflist.py): each order's
    lineitems become a cons-cell chain (rdf:first = part, rdf:rest =
    next cell or rdf:nil, ordered by linenumber); the frontier walk
    must decode every chain back to (head, pos, item).  Oracle: the
    same walk as a recursive CTE in DuckDB over identically minted
    cells."""
    from pyspark.sql.window import Window

    from lmss_entity_extractor_spark.graph.rdflist import flatten_lists

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    cells = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")).alias("cnt"),
    )
    node = F.concat(F.lit("cons:"), "ok", F.lit(":"), "rn")
    trips = cells.select(
        node.alias("s"),
        F.lit("rdf:first").alias("p"),
        F.concat(F.lit("p:"), "l_partkey").alias("o"),
    ).unionByName(
        cells.select(
            node.alias("s"),
            F.lit("rdf:rest").alias("p"),
            F.when(
                F.col("rn") < F.col("cnt"),
                F.concat(F.lit("cons:"), "ok", F.lit(":"), F.col("rn") + 1),
            )
            .otherwise(F.lit("rdf:nil"))
            .alias("o"),
        )
    )
    return flatten_lists(trips)


def q_owl_entail(spark, sf_dir):
    """OWL property-rule entailment (L71, graph/owlprops.py): `within`
    is transitive with inverse `contains` over the customer->nation->
    region containment chain — the closure materializes c->r hops and
    every triple mirrors under `contains`.  Oracle: recursive-CTE
    closure + orientation flip + schema rows, DISTINCT."""
    from lmss_entity_extractor_spark.graph.owlprops import owl_entail

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 4 == 0)
    n = _t(spark, sf_dir, "nation")
    schema = spark.createDataFrame(
        [
            ("within", "rdf:type", "owl:TransitiveProperty"),
            ("within", "owl:inverseOf", "contains"),
        ],
        "s string, p string, o string",
    )
    trips = (
        c.select(
            F.concat(F.lit("c:"), "c_custkey").alias("s"),
            F.lit("within").alias("p"),
            F.concat(F.lit("n:"), "c_nationkey").alias("o"),
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), "n_nationkey").alias("s"),
                F.lit("within").alias("p"),
                F.concat(F.lit("r:"), "n_regionkey").alias("o"),
            )
        )
        .unionByName(schema)
    )
    return owl_entail(trips)


def q_bgp_construct(spark, sf_dir):
    """SPARQL CONSTRUCT (L72, graph/bgp.py bgp_construct): rewrite the
    customer->nation graph into (nation hasMember customer) plus an
    OPTIONAL-fed (customer inRegion region) — only even nations carry
    region triples, so odd-nation customers must omit the inRegion
    instantiation but keep hasMember (spec §16.2 per-triple omission).
    Oracle: join + LEFT JOIN + two projections under UNION."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_construct

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    trips = c.select(
        F.concat(F.lit("c:"), "c_custkey").alias("s"),
        F.lit("nation").alias("p"),
        F.concat(F.lit("n:"), "c_nationkey").alias("o"),
    ).unionByName(
        n.filter(F.col("n_nationkey") % 2 == 0).select(
            F.concat(F.lit("n:"), "n_nationkey").alias("s"),
            F.lit("region").alias("p"),
            F.concat(F.lit("r:"), "n_regionkey").alias("o"),
        )
    )
    return bgp_construct(
        trips,
        [("?c", "nation", "?n")],
        [("?n", "hasMember", "?c"), ("?c", "inRegion", "?r")],
        optional=[[("?n", "region", "?r")]],
    )


def q_reify(spark, sf_dir):
    """RDF reification (L73, graph/reify.py) of the customer->nation
    triples: four rows per triple under content-addressed statement
    nodes (md5 over unit-separator-joined terms).  Oracle: DuckDB
    re-mints every node id with the same md5 recipe and rebuilds the
    same four projections."""
    from lmss_entity_extractor_spark.graph.reify import reify

    c = _t(spark, sf_dir, "customer")
    trips = c.select(
        F.concat(F.lit("c:"), "c_custkey").alias("s"),
        F.lit("nation").alias("p"),
        F.concat(F.lit("n:"), "c_nationkey").alias("o"),
    )
    return reify(trips)


def q_bisim(spark, sf_dir):
    """A(2) bisimulation classes (L74, graph/bisim.py) over the typed
    customer/nation triple fixture: depth-2 refinement separates
    customers by segment-edge presence AND by their nation's own
    structure.  Oracle: the identical two-round refinement in DuckDB —
    md5 over the same canonical signature serialization, so every
    class id matches byte-for-byte."""
    from lmss_entity_extractor_spark.graph.bisim import bisimulation_classes

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    subj = F.concat(F.lit("c:"), "c_custkey").alias("s")
    trips = (
        c.select(subj, F.lit("nation").alias("p"), F.concat(F.lit("n:"), "c_nationkey").alias("o"))
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 0).select(
                subj, F.lit("segment").alias("p"), F.col("c_mktsegment").alias("o")
            )
        )
        .unionByName(
            c.filter(F.col("c_nationkey") % 2 == 0).select(
                F.concat(F.lit("n:"), "c_nationkey").alias("s"),
                F.lit("rdf:type").alias("p"),
                F.lit("Nation").alias("o"),
            ).distinct()
        )
    )
    return bisimulation_classes(trips, k=2)


def q_winnow(spark, sf_dir):
    """Winnowing fingerprints (L47, Schleimer et al. SIGMOD'03) over the
    documents corpus: per-doc sliding-window minima of md5-prefix 3-gram
    hashes, window 4 — all per-row folds, zero shuffles (plan-asserted).
    The hash family is engine-identical (ops/dsir.py spelling), so the
    oracle re-derives the SELECTION itself: DuckDB window-function minima
    vs Spark's higher-order-function folds — two independent mechanisms,
    same fingerprint set."""
    from lmss_entity_extractor_spark.ops.winnow import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=3, window=4)


def q_closure_counts(spark, sf_dir):
    """A2 descendant counts per ancestor (top-classes entity counts,
    `app/lmss_parser.py:92-112`) over the J4 closure."""
    from lmss_entity_extractor_spark.graph.closure import transitive_closure

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    e2 = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("child"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("parent"),
    )
    e3 = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("child"),
        F.concat(F.lit("r:"), F.col("n_regionkey")).alias("parent"),
    )
    closure = transitive_closure(e2.unionByName(e3), include_self=False)
    return closure.groupBy(F.col("anc_iri").alias("ancestor")).agg(
        F.countDistinct("desc_iri").alias("n_descendants")
    )


def q_set_ops(spark, sf_dir):
    """§2.7 set operations: INTERSECT / EXCEPT over distinct customer
    keys of two order-year slices."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return a.intersect(b).withColumn("tag", F.lit("both")).unionByName(
        a.exceptAll(b).withColumn("tag", F.lit("only_1995"))
    )


def q_sessionize(spark, sf_dir):
    """Ordered-scan sessionization (training-data pipeline op): lag-gap
    > 30 min starts a new session; per-user session/event counts."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # ts is TIMESTAMP_NTZ in the parquet; route through TIMESTAMP for epoch
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap_s = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
    return (
        e.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


def q_above_avg(spark, sf_dir):
    """Correlated scalar subquery shape: customers with above-average
    account balance within their nation (decorrelated to a window/join
    aggregate — the plan Spark and every warehouse engine rewrite to)."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return (
        c.withColumn("nation_avg", F.avg("c_acctbal").over(w))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


def q_quantiles(spark, sf_dir):
    """Ordered-set aggregate: exact interpolated percentiles of order
    totals per order priority."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.floor(F.percentile("o_totalprice", 0.5) * 100).cast("long").alias("p50_cents"),
        F.floor(F.percentile("o_totalprice", 0.9) * 100).cast("long").alias("p90_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_moving_avg(spark, sf_dir):
    """Window frame aggregation: per-user 5-row trailing average event
    value over event time (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-4, Window.currentRow)
    )
    return e.filter(F.col("user_id") < 20).select(
        "user_id",
        "event_id",
        F.floor(F.avg("value").over(w) * 10000).cast("long").alias("avg5_e4"),
    )


def q_rollup_revenue(spark, sf_dir):
    """Grouping sets: ROLLUP(region, nation) revenue with ALL backfill."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "revenue",
            "n_orders",
        )
    )


def q_benford(spark, sf_dir):
    """Benford's-law conformance (L144): leading-digit forensics on
    order totals — exact digit tally (string path, floor not round),
    libm-expected shares, fixed-tree chi² terms, ungridded."""
    from lmss_entity_extractor_spark.ops.benford import benford_digits

    o = _t(spark, sf_dir, "orders")
    return benford_digits(o, "o_totalprice")


def q_power_law(spark, sf_dir):
    """Power-law degree fit (L145): is the order→customer graph
    scale-free?  Degree histogram → ln/ln OLS over the BOUNDED
    distinct-degree point list, five sums as 0.0-prepended
    k-sorted left folds (the L39 ordered-fold discipline), fixed
    IEEE fit tree — alpha = −slope, plus R².  Oracle: same sorted
    folds via list_reduce, same tree."""
    from lmss_entity_extractor_spark.graph.powerlaw import power_law_fit

    o = _t(spark, sf_dir, "orders")
    edges = o.select(
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
    )
    return power_law_fit(edges).select(
        F.col("n_points").cast("long").alias("n_points"),
        "alpha",
        "intercept",
        "r2",
    )


def q_roc_auc(spark, sf_dir):
    """ROC-AUC / Mann-Whitney U (L146): per-priority AUC of the
    bucketed order total as a 'key divisible by 3' classifier —
    doubled average-rank sums are exact DECIMAL integers, ONE IEEE
    division at the end, bit-identical, ungridded.  Bucketing the
    score (floor/100) forces real tie groups."""
    from lmss_entity_extractor_spark.ops.rankeval import roc_auc

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_orderkey") % 3 == 0).cast("int").alias("label"),
        F.floor(F.col("o_totalprice") / F.lit(100.0)).alias("s"),
    )
    return roc_auc(o, ["priority"], "label", "s")


def q_ks_2samp(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov (L147): click-vs-view value
    drift per user bucket — per distinct value the scaled ECDF gap
    |cum_a·n_b − cum_b·n_a| is an exact integer; D = max gap over
    n_a·n_b, ONE IEEE division, ungridded."""
    from lmss_entity_extractor_spark.ops.rankeval import ks_2samp

    e = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("bucket"),
        "event_type",
        "value",
    )
    return ks_2samp(e, ["bucket"], "event_type", "click", "view", "value")


def q_modularity(spark, sf_dir):
    """Newman modularity (L148): does the region partition explain the
    customer→nation graph?  Q = (4m·Σe_c − Σd_c²)/(4m²) — exact
    integer statistics, ONE IEEE division, ungridded."""
    from lmss_entity_extractor_spark.graph.metrics import modularity

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    edges = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
    )
    comm = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"),
            F.col("n_regionkey").alias("community"),
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("node"),
                F.col("n_regionkey").alias("community"),
            )
        )
    )
    return modularity(edges, comm)


def q_assortativity(spark, sf_dir):
    """Degree assortativity (L149): endpoint-degree Pearson over both
    orientations of the order→customer graph — all sums exact
    integers, r = ONE IEEE division, ungridded (strongly negative:
    hub customers attach to degree-1 orders)."""
    from lmss_entity_extractor_spark.graph.metrics import degree_assortativity

    o = _t(spark, sf_dir, "orders")
    edges = o.select(
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
    )
    return degree_assortativity(edges)


def q_gini(spark, sf_dir):
    """Gini concentration (L150): how unevenly is order revenue
    distributed within each priority — G = (2Σi·xᵢ − (n+1)Σxᵢ)/(nΣxᵢ)
    over decimal-exact rank-value sums, ONE IEEE division,
    ungridded."""
    from lmss_entity_extractor_spark.ops.concentration import gini

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"), "o_totalprice"
    )
    out = gini(o, ["priority"], "o_totalprice")
    return out.select(
        "priority", "n", F.col("total").cast("double").alias("total"), "gini"
    )


def q_acf(spark, sf_dir):
    """Autocorrelation function (L151): lags 1..3 of the event-value
    series per user bucket, ordered by (ts, event_id) — mean-centred
    as cₜ = n·xₜ − S so sums stay exact decimals; r = ONE IEEE
    division per lag, ungridded."""
    from lmss_entity_extractor_spark.ops.concentration import acf

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select((F.col("user_id") % 4).alias("bucket"), "ts", "event_id", "value")
    )
    return acf(e, ["bucket"], ["ts", "event_id"], "value", max_lag=3)


def q_mutual_info(spark, sf_dir):
    """Mutual information + NMI (L152): does order priority carry
    information about order status — exact integer cell counts,
    fixed-tree terms, ordered cell fold (the L140 discipline),
    ungridded."""
    from lmss_entity_extractor_spark.ops.infotheory import mutual_information

    o = _t(spark, sf_dir, "orders")
    return mutual_information(o, "o_orderpriority", "o_orderstatus")


def q_jsd(spark, sf_dir):
    """Jensen-Shannon divergence (L153): event-type distribution drift
    between even and odd user cohorts — zero-count categories
    contribute exactly 0 (the x·ln x limit), ordered category fold,
    ONE final halving, ungridded."""
    from lmss_entity_extractor_spark.ops.infotheory import js_divergence

    e = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("cohort"),
        "event_type",
    )
    return js_divergence(e, "cohort", "a", "b", "event_type")


def q_cusum(spark, sf_dir):
    """CUSUM changepoint chart (L154): per-bucket two-sided control
    statistics via the prefix-sum/running-min closed form — all
    arithmetic DECIMAL-exact (no division, no grid), one keyed window
    sort."""
    from lmss_entity_extractor_spark.ops.changepoint import cusum

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select((F.col("user_id") % 4).alias("bucket"), "ts", "event_id", "value")
    )
    return cusum(
        e,
        ["bucket"],
        ["ts", "event_id"],
        "value",
        target="50.00",
        slack="5.00",
        threshold="500.00",
    )


def q_kmeans(spark, sf_dir):
    """Euclidean k-means (L155): deterministic Lloyd trainer (id-sorted
    sample, fixed-order einsum, lowest-id ties) + zero-shuffle literal-
    expression assignment — argmax(x·c − ‖c‖²/2).

    Value-level oracle (pinned to sf0.01 like the other frozen-fixture
    queries): the trained (center, halfnorm) pairs are frozen to parquet
    by tools/make_oracle_fixtures.py through the SAME numpy core; DuckDB
    re-derives every cluster label with explicitly left-associated
    float64 dots mirroring the Spark fold term-for-term."""
    from lmss_entity_extractor_spark.ops.kmeans import assign_kmeans, train_kmeans

    e = _t(spark, sf_dir, "embeddings")
    cents = train_kmeans(e, k=6, n_iters=5)
    return assign_kmeans(e, cents).select("vec_id", "cluster")


def _kmeans_oracle_sql(dim: int = 64) -> str:
    """q_kmeans's oracle, generated so the per-dimension float64 dot is
    EXPLICITLY left-associated term-for-term with the Spark zip_with/
    aggregate fold (SQL SUM order is unspecified; a 1-ulp reassociation
    could flip a near-tie assignment)."""

    def dot(vec: str) -> str:
        acc = f"(CAST({vec}[1] AS DOUBLE) * km.cent[1])"
        for i in range(1, dim):
            acc = f"({acc} + (CAST({vec}[{i} + 1] AS DOUBLE) * km.cent[{i} + 1]))"
        return acc

    return f"""
        WITH km AS (
            SELECT cid, cent, halfn
            FROM read_parquet(
                '/root/repo/fixtures/oracle/sf0.01/kmeans_centroids.parquet')
        ),
        scored AS (
            SELECT e.vec_id, km.cid,
                   ({dot('e.embedding')} - km.halfn) AS d
            FROM embeddings e CROSS JOIN km
        )
        SELECT vec_id, cid AS cluster FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d DESC, cid ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    """


def q_silhouette(spark, sf_dir):
    """Simplified silhouette (L156): per-point clustering quality
    against the L155 centroids only (never the O(n²) pairwise matrix)
    — a/b distances as generated left-fold expressions, zero shuffle;
    oracle re-derives every value from the frozen fixture."""
    from lmss_entity_extractor_spark.ops.clustereval import silhouette_simplified
    from lmss_entity_extractor_spark.ops.kmeans import assign_kmeans, train_kmeans

    e = _t(spark, sf_dir, "embeddings")
    cents = train_kmeans(e, k=6, n_iters=5)
    out = silhouette_simplified(assign_kmeans(e, cents), cents)
    return out.select("vec_id", "cluster", "a", "b", "silhouette")


def q_ari(spark, sf_dir):
    """Adjusted Rand Index (L157): agreement between the L155 k-means
    labels and the embeddings table's ground-truth label — all pair
    counts exact integers, ONE final IEEE division, ungridded."""
    from lmss_entity_extractor_spark.ops.clustereval import adjusted_rand_index
    from lmss_entity_extractor_spark.ops.kmeans import assign_kmeans, train_kmeans

    e = _t(spark, sf_dir, "embeddings")
    cents = train_kmeans(e, k=6, n_iters=5)
    return adjusted_rand_index(assign_kmeans(e, cents), "cluster", "label")


def _km_oracle_dots(dim: int = 64):
    """Left-assoc float64 dot expansions shared by the kmeans-fixture
    oracles (mirror the Spark zip_with/aggregate folds term-for-term)."""

    def dot(vec: str) -> str:
        acc = f"(CAST({vec}[1] AS DOUBLE) * km.cent[1])"
        for i in range(1, dim):
            acc = f"({acc} + (CAST({vec}[{i} + 1] AS DOUBLE) * km.cent[{i} + 1]))"
        return acc

    def selfdot(vec: str) -> str:
        acc = f"(CAST({vec}[1] AS DOUBLE) * CAST({vec}[1] AS DOUBLE))"
        for i in range(1, dim):
            acc = (
                f"({acc} + (CAST({vec}[{i} + 1] AS DOUBLE)"
                f" * CAST({vec}[{i} + 1] AS DOUBLE)))"
            )
        return acc

    return dot, selfdot


def _silhouette_oracle_sql(dim: int = 64) -> str:
    """q_silhouette's oracle: frozen-fixture assignment + the identical
    sqrt(greatest(0, (x·x − 2·x·c) + ‖c‖²)) distance tree per centroid."""
    dot, selfdot = _km_oracle_dots(dim)
    return f"""
        WITH km AS (
            SELECT cid, cent, halfn
            FROM read_parquet(
                '/root/repo/fixtures/oracle/sf0.01/kmeans_centroids.parquet')
        ),
        scored AS (
            SELECT e.vec_id, km.cid,
                   ({dot('e.embedding')} - km.halfn) AS assign_d,
                   sqrt(greatest(CAST(0 AS DOUBLE),
                        (({selfdot('e.embedding')}
                          - (CAST(2.0 AS DOUBLE) * {dot('e.embedding')}))
                         + (km.halfn + km.halfn)))) AS dist
            FROM embeddings e CROSS JOIN km
        ),
        assigned AS (
            SELECT vec_id, cid AS cluster FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY assign_d DESC, cid ASC)
                           AS rn
                FROM scored
            ) WHERE rn = 1
        ),
        ab AS (
            SELECT s.vec_id, a2.cluster,
                   max(CASE WHEN s.cid = a2.cluster THEN s.dist END) AS a,
                   min(CASE WHEN s.cid <> a2.cluster THEN s.dist END) AS b
            FROM scored s JOIN assigned a2 ON s.vec_id = a2.vec_id
            GROUP BY 1, 2
        )
        SELECT vec_id, cluster, a, b,
               CASE WHEN greatest(a, b) > 0.0
                    THEN (b - a) / greatest(a, b) END AS silhouette
        FROM ab
    """


def _ari_oracle_sql(dim: int = 64) -> str:
    """q_ari's oracle: frozen-fixture assignment, then the rescaled
    pair-counting identity in exact BIGINT arithmetic."""
    dot, _ = _km_oracle_dots(dim)
    return f"""
        WITH km AS (
            SELECT cid, cent, halfn
            FROM read_parquet(
                '/root/repo/fixtures/oracle/sf0.01/kmeans_centroids.parquet')
        ),
        idot AS (
            SELECT e.vec_id, km.cid,
                   ({dot('e.embedding')} - km.halfn) AS d,
                   e.label
            FROM embeddings e CROSS JOIN km
        ),
        assigned AS (
            SELECT vec_id, cid AS x, label AS y FROM (
                SELECT vec_id, cid, label,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d DESC, cid ASC) AS rn
                FROM idot
            ) WHERE rn = 1 AND label IS NOT NULL
        ),
        cells AS (SELECT x, y, count(*) AS o FROM assigned GROUP BY 1, 2),
        sij AS (
            SELECT CAST(sum(CAST(o AS BIGINT) * (CAST(o AS BIGINT) - 1))
                        AS BIGINT) AS p_ij,
                   CAST(sum(o) AS BIGINT) AS n
            FROM cells
        ),
        sa AS (
            SELECT CAST(sum(CAST(a AS BIGINT) * (CAST(a AS BIGINT) - 1))
                        AS BIGINT) AS p_a
            FROM (SELECT CAST(sum(o) AS BIGINT) AS a FROM cells GROUP BY x)
        ),
        sb AS (
            SELECT CAST(sum(CAST(b AS BIGINT) * (CAST(b AS BIGINT) - 1))
                        AS BIGINT) AS p_b
            FROM (SELECT CAST(sum(o) AS BIGINT) AS b FROM cells GROUP BY y)
        )
        SELECT n,
               CASE WHEN n * (n - 1) * (p_a + p_b) - 2 * p_a * p_b <> 0
                    THEN CAST(2 * (n * (n - 1) * p_ij - p_a * p_b)
                              AS DOUBLE)
                         / CAST(n * (n - 1) * (p_a + p_b)
                                - 2 * p_a * p_b AS DOUBLE)
               END AS ari
        FROM sij CROSS JOIN sa CROSS JOIN sb
    """


def q_fps(spark, sf_dir):
    """Farthest-point sampling (L158): k=4 maximally-diverse vectors —
    greedy k-center (Gonzalez), lowest-id seed, exact squared-distance
    trees, id tiebreaks; each round one narrow projection + top-1.
    Oracle: the 4 rounds unrolled as CTEs re-deriving the same picks."""
    from lmss_entity_extractor_spark.ops.coreset import farthest_point_sample

    e = _t(spark, sf_dir, "embeddings")
    picks = farthest_point_sample(e, k=4)
    return spark.createDataFrame(
        picks, "round int, vec_id bigint, sq_radius double"
    )


def _fps_oracle_sql(dim: int = 64, k: int = 4) -> str:
    """q_fps's oracle: each greedy round as a CTE; distances are the
    identical greatest(0, (x·x − 2·x·c) + c·c) left-fold trees."""

    def fold(ea: str, eb: str) -> str:
        acc = f"(CAST({ea}[1] AS DOUBLE) * CAST({eb}[1] AS DOUBLE))"
        for i in range(1, dim):
            acc = (
                f"({acc} + (CAST({ea}[{i} + 1] AS DOUBLE)"
                f" * CAST({eb}[{i} + 1] AS DOUBLE)))"
            )
        return acc

    def sq(e: str, s: str) -> str:
        return (
            f"greatest(CAST(0 AS DOUBLE), (({fold(e, e)}"
            f" - (CAST(2.0 AS DOUBLE) * {fold(e, s)})) + {fold(s, s)}))"
        )

    ctes = [
        "r0 AS (SELECT vec_id AS id0, embedding AS v0 FROM embeddings"
        " ORDER BY vec_id LIMIT 1)"
    ]
    for r in range(1, k):
        dists = [sq("e.embedding", f"v{j}") for j in range(r)]
        mind = f"least({', '.join(dists)})" if len(dists) > 1 else dists[0]
        joins = " ".join(f"CROSS JOIN r{j}" for j in range(r))
        ctes.append(
            f"r{r} AS (SELECT e.vec_id AS id{r}, e.embedding AS v{r}, "
            f"{mind} AS d{r} FROM embeddings e {joins} "
            f"ORDER BY d{r} DESC, e.vec_id ASC LIMIT 1)"
        )
    selects = [
        "SELECT CAST(0 AS INTEGER) AS round, id0 AS vec_id, "
        "CAST(0.0 AS DOUBLE) AS sq_radius FROM r0"
    ] + [
        f"SELECT CAST({r} AS INTEGER), id{r}, d{r} FROM r{r}"
        for r in range(1, k)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _survival_input(spark, sf_dir, as_string_cohort=False):
    """Shared L159/L160 fixture: per-user duration on a bounded 30-day
    grid + a deterministic censoring flag."""
    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        ((F.max("event_id") - F.min("event_id")) % 30).alias("dur")
    )
    if as_string_cohort:
        cohort = (
            F.when(F.col("user_id") % 2 == 0, F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("cohort")
        )
    else:
        cohort = (F.col("user_id") % 2).alias("cohort")
    return u.select(
        cohort,
        "dur",
        (F.col("user_id") % 5 != 0).cast("int").alias("event"),
    )


def q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival (L159): per-cohort product-limit curve
    with right-censoring — exact integer risk sets (window cumsum),
    survival as a 1.0-prepended t-sorted prefix fold of (n−d)/n
    factors over the BOUNDED day grid, ungridded."""
    from lmss_entity_extractor_spark.ops.survival import kaplan_meier

    return kaplan_meier(
        _survival_input(spark, sf_dir), ["cohort"], "dur", "event"
    )


def q_logrank(spark, sf_dir):
    """Two-sample log-rank test (L160): does cohort a outlive cohort b
    — O−E and hypergeometric V folded over the pooled bounded grid in
    t order, χ² = (O−E)²/V as fixed IEEE trees, ungridded."""
    from lmss_entity_extractor_spark.ops.survival import logrank_test

    return logrank_test(
        _survival_input(spark, sf_dir, as_string_cohort=True),
        "cohort",
        "a",
        "b",
        "dur",
        "event",
    )


def _trend_input(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_id", "value")
    )


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test (L161): per-user monotonic-trend S over
    the bounded pair lattice — S and the tie-corrected variance exact
    integers, Z a fixed IEEE tree, ungridded."""
    from lmss_entity_extractor_spark.ops.trend import mann_kendall

    return mann_kendall(
        _trend_input(spark, sf_dir), ["user_id"], "event_id", "value"
    )


def q_theil_sen(spark, sf_dir):
    """Theil-Sen robust slope (L162): median pairwise slope per user —
    each slope ONE division, median an exact order statistic over the
    sorted bounded slope list, ungridded."""
    from lmss_entity_extractor_spark.ops.trend import theil_sen

    return theil_sen(
        _trend_input(spark, sf_dir), ["user_id"], "event_id", "value"
    )


def q_seasonal(spark, sf_dir):
    """Classical seasonal decomposition (L163): x = trend + seasonal +
    remainder per user series at period 7 — decimal-exact moving-sum
    numerators, one division per row, phase indices centered by a
    bounded fold, ungridded."""
    from lmss_entity_extractor_spark.ops.seasonal import seasonal_decompose

    e = (
        _t(spark, sf_dir, "events")
        .filter((F.col("user_id") < 8) & F.col("value").isNotNull())
        .select("user_id", "event_id", "value")
    )
    return seasonal_decompose(e, ["user_id"], "event_id", "value", period=7)


def q_retrieval_metrics(spark, sf_dir):
    """Retrieval metrics (L164): per-query precision/recall@3 and
    reciprocal rank of sign-LSH ANN (L8) against the brute-force truth
    (L7) — exact integer counts, one division per metric, ungridded.
    Oracle: BOTH pipelines' existing oracle SQL nested as CTEs."""
    from lmss_entity_extractor_spark.ops.evalmetrics import retrieval_metrics

    pred = q_knn_lsh(spark, sf_dir)
    truth = q_knn_bruteforce(spark, sf_dir)
    return retrieval_metrics(pred, truth, k=3)


def q_classification_report(spark, sf_dir):
    """Classification report (L165): per-class precision/recall/F1 of
    the 'previous event type predicts the next' baseline — exact
    integer cells, F1 = 2tp/(n_true+n_pred) single-division form,
    ungridded."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.evalmetrics import classification_report

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.lead("event_type").over(w).alias("pred")
    )
    return classification_report(e, "event_type", "pred")


def _calibration_input(spark, sf_dir):
    """Decimal-exact probability fixture: p = (key % 100)·0.01."""
    o = _t(spark, sf_dir, "orders")
    p = (F.col("o_orderkey") % 100).cast("decimal(9,2)") * F.lit("0.01").cast(
        "decimal(9,2)"
    )
    return o.select(
        p.alias("p"), (F.col("o_orderkey") % 3 == 0).cast("int").alias("y")
    )


def q_brier(spark, sf_dir):
    """Brier score (L166): mean squared probability error — exact
    decimal (p−y)² sum, ONE division, ungridded."""
    from lmss_entity_extractor_spark.ops.calibration import brier_score

    return brier_score(_calibration_input(spark, sf_dir), "p", "y")


def q_calibration(spark, sf_dir):
    """Reliability table (L166): 10 probability bins with exact
    decimal Σp/Σy, one division per output value, ungridded."""
    from lmss_entity_extractor_spark.ops.calibration import calibration_bins

    return calibration_bins(_calibration_input(spark, sf_dir), "p", "y")


def q_rbo(spark, sf_dir):
    """Rank-biased overlap (L200): per-customer top-10 order lists
    ranked by price vs by key — depth-decayed overlap with weights
    embedded as identical double literals in both engines, ordered
    depth fold."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.evalmetrics import rbo_overlap

    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    wa = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wb = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    a = o.select(
        F.col("o_custkey").alias("query_id"),
        F.col("o_orderkey").alias("item"),
        F.row_number().over(wa).alias("rank"),
    )
    b = o.select(
        F.col("o_custkey").alias("query_id"),
        F.col("o_orderkey").alias("item"),
        F.row_number().over(wb).alias("rank"),
    )
    return rbo_overlap(a, b, k=10, p=0.9)


def q_kendall(spark, sf_dir):
    """Kendall's tau-b (L199): quantity vs price-bucket concordance
    per return flag — 2-D prefix pair counts over the bounded grid,
    tie-normalized, one fixed IEEE tree."""
    from lmss_entity_extractor_spark.ops.correlation import kendall_tau_b

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor("l_quantity").alias("x"),
            F.floor(F.col("l_extendedprice") / 5000).alias("y"),
        )
    )
    return kendall_tau_b(li, ["flag"], "x", "y")


def q_jonckheere(spark, sf_dir):
    """Jonckheere-Terpstra (L198): does order value rise with
    priority rank — doubled pair counts over the bounded
    (priority × price-bucket) grid, tie-corrected variance from
    exact integer polynomials, fixed IEEE z tree."""
    from lmss_entity_extractor_spark.ops.rankeval import (
        jonckheere_terpstra,
    )

    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderpriority").alias("lvl"),
            F.floor(F.col("o_totalprice") / 10000).alias("v"),
        )
    )
    return jonckheere_terpstra(o, [], "lvl", "v")


def q_jaro_join(spark, sf_dir):
    """Blocked Jaro-Winkler self-join (L197): distinct part names
    scoring >= 0.9 within a 2-char lowercase prefix block — the
    record-linkage scorer; the Arrow-batched kernel is pinned BIT FOR
    BIT against DuckDB's jaro_winkler_similarity by a fuzz test, so
    the threshold filter cannot knife-edge across engines."""
    from lmss_entity_extractor_spark.ops.fuzzyjoin import jaro_winkler_join

    return jaro_winkler_join(
        _t(spark, sf_dir, "part").select("p_name"),
        None,
        "p_name",
        min_sim=0.9,
        block_prefix=2,
    )


def q_isotonic(spark, sf_dir):
    """Isotonic calibration (L196): pool-adjacent-violators via the
    parallel minimax identity over 10 probability bins — exact prefix
    integers, one division per interval mean, deterministic min/max."""
    from lmss_entity_extractor_spark.ops.calibration import isotonic_fit

    return isotonic_fit(_calibration_input(spark, sf_dir), "p", "y", n_bins=10)


def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test (L219): parity of floored event
    values as the binary sequence per type — one lag window, exact
    integer moments, fixed IEEE z tree."""
    from lmss_entity_extractor_spark.ops.stattests import runs_test

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.col("event_id").alias("t"),
            (F.floor("value") % 2 == 0).cast("int").alias("x"),
        )
    )
    return runs_test(e, ["g"], "t", "x")


def q_ols_influence(spark, sf_dir):
    """OLS influence diagnostics (L220): leverage/residual/Cook's D
    of the quantity→price fit per return flag on a keyed slice —
    fit-small/apply-wide, per-row fixed trees."""
    from lmss_entity_extractor_spark.ops.regression import ols_influence

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 20 == 0)
        .select(
            F.col("l_returnflag").alias("flag"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "rid"
            ),
            F.col("l_quantity").alias("x"),
            F.col("l_extendedprice").alias("y"),
        )
    )
    return ols_influence(li, ["flag"], "rid", "x", "y")


def q_anova(spark, sf_dir):
    """One-way ANOVA F + eta^2 (L215): do event types differ in mean
    floored value — exact decimal per-level stats, sorted-level
    ordered folds, one-pass fixed IEEE trees."""
    from lmss_entity_extractor_spark.ops.stattests import oneway_anova

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("event_type").alias("lvl"), F.floor("value").alias("v")
        )
    )
    return oneway_anova(e, [], "lvl", "v")


def q_two_prop(spark, sf_dir):
    """Two-proportion z + risk/odds ratios (L216): odd vs even order
    keys as arms, divisible-by-3 keys as conversions, per priority —
    exact integer cells, fixed IEEE trees, no transcendentals."""
    from lmss_entity_extractor_spark.ops.effectsize import (
        two_proportion_test,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.when(F.col("o_orderkey") % 2 == 1, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("var"),
        (F.col("o_orderkey") % 3 == 0).cast("int").alias("y"),
    )
    return two_proportion_test(o, ["prio"], "var", "A", "B", "y")


def q_durbin_watson(spark, sf_dir):
    """Durbin-Watson (L217): lag-1 autocorrelation diagnostic of the
    floored event-value series per type — exact decimal sums, one
    division."""
    from lmss_entity_extractor_spark.ops.timeseries import durbin_watson

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.col("event_id").alias("t"),
            F.floor("value").alias("v"),
        )
    )
    return durbin_watson(e, ["g"], "t", "v")


def q_partial_corr(spark, sf_dir):
    """Partial correlation (L218): quantity-price association
    controlling for discount, per return flag — nine exact decimal
    sums, one fixed IEEE tree."""
    from lmss_entity_extractor_spark.ops.correlation import (
        partial_correlation,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
        F.col("l_discount").alias("z"),
    )
    return partial_correlation(li, ["flag"], "x", "y", "z")


def q_rolling_slope(spark, sf_dir):
    """Rolling OLS slope (L214): 10-row trend velocity of event
    values per type — five exact decimal frame sums on one keyed
    window, one fixed IEEE tree per row."""
    from lmss_entity_extractor_spark.ops.timeseries import rolling_slope

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.col("event_id").alias("t"),
            F.floor("value").alias("y"),
        )
    )
    return rolling_slope(e, ["g"], "t", "y", window_rows=10)


def q_density_clusters(spark, sf_dir):
    """Grid-density clustering (L213, DBSCAN-flavored composition):
    dense 10-degree cells (>= 3 points) linked across the 3x3
    neighborhood and merged with the L39 connected-components
    operator — spatial blocking + graph machinery composed; min-label
    cluster ids, per-cell point counts."""
    from lmss_entity_extractor_spark.ops.components import (
        connected_components,
    )

    pts = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(
            (
                ((F.col("c_custkey") * 37) % 18000).cast("double")
                / F.lit(100.0)
                - F.lit(90.0)
            ).alias("lat"),
            (
                ((F.col("c_custkey") * 73) % 36000).cast("double")
                / F.lit(100.0)
                - F.lit(180.0)
            ).alias("lon"),
        )
    )
    cells = pts.select(
        F.floor(F.col("lat") / 10.0).cast("long").alias("cx"),
        F.floor(F.col("lon") / 10.0).cast("long").alias("cy"),
    )
    dense = (
        cells.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .filter(F.col("n_points") >= 3)
        .withColumn(
            "cell", F.concat_ws(":", F.col("cx"), F.col("cy"))
        )
    )
    lft = (
        dense.withColumn(
            "_dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
        )
        .withColumn(
            "_dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
        )
        .select(
            F.col("cell").alias("src"),
            (F.col("cx") + F.col("_dx")).alias("_jx"),
            (F.col("cy") + F.col("_dy")).alias("_jy"),
        )
    )
    rgt = dense.select(
        F.col("cell").alias("dst"),
        F.col("cx").alias("_jx"),
        F.col("cy").alias("_jy"),
    )
    edges = lft.join(rgt, ["_jx", "_jy"]).select("src", "dst")
    comp = connected_components(edges, "src", "dst")
    return (
        dense.join(comp, dense["cell"] == comp["node"])
        .select(
            "cell",
            F.col("component").alias("cluster"),
            "n_points",
        )
    )


def q_geo_pairs(spark, sf_dir):
    """Grid-bucketed spatial neighbor pairs (L212): deterministic
    synthetic lat/lon from customer keys, 5-degree cells, 3x3
    neighborhood equi-join, unfiltered haversine distances (the
    9-sig-digit compare absorbs cross-engine trig ULPs)."""
    from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 5 == 0)
        .select(
            F.col("c_custkey").alias("id"),
            (
                ((F.col("c_custkey") * 37) % 18000).cast("double")
                / F.lit(100.0)
                - F.lit(90.0)
            ).alias("lat"),
            (
                ((F.col("c_custkey") * 73) % 36000).cast("double")
                / F.lit(100.0)
                - F.lit(180.0)
            ).alias("lon"),
        )
    )
    return grid_neighbor_pairs(c, "id", "lat", "lon", cell_deg=5.0)


def q_simpsons(spark, sf_dir):
    """Simpson's-paradox audit (composition of L141 grouped OLS):
    per-flag discount→price slopes against the pooled slope, with a
    flip flag when a segment's sign contradicts the aggregate —
    identical exact-decimal fits on both levels, broadcast pooled
    row."""
    from lmss_entity_extractor_spark.ops.regression import grouped_linreg

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_discount").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    per = grouped_linreg(li, ["flag"], "x", "y")
    pooled = grouped_linreg(li, [], "x", "y").select(
        F.col("slope").alias("pooled_slope")
    )
    return per.crossJoin(F.broadcast(pooled)).select(
        "flag",
        "n",
        "slope",
        "pooled_slope",
        F.when(
            F.col("slope").isNotNull() & F.col("pooled_slope").isNotNull(),
            (F.col("slope") > 0) != (F.col("pooled_slope") > 0),
        ).alias("sign_flip"),
    )


def q_covariate_balance(spark, sf_dir):
    """Standardized mean difference (L210): odd/even order keys as
    pseudo-arms, extended price as the covariate, per return flag —
    exact decimal sufficient stats, unpooled-variance SMD tree."""
    from lmss_entity_extractor_spark.ops.effectsize import (
        covariate_balance,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_orderkey") % 2).cast("int").alias("t"),
        F.col("l_extendedprice").alias("v"),
    )
    return covariate_balance(li, ["flag"], "t", "v")


def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR (L211): step-up over a deterministic
    synthetic p-value table keyed by part — exact decimal k*q/m
    thresholds, deterministic tie-broken ranks, flagged discoveries."""
    from lmss_entity_extractor_spark.ops.effectsize import bh_fdr

    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("test_id"),
        (
            ((F.col("p_partkey") * 7919) % 9973).cast("double")
            / F.lit(9973.0)
        ).alias("p"),
    )
    return bh_fdr(p, "test_id", "p", q="0.05")


def q_vocab_coverage(spark, sf_dir):
    """Chao1 + Good-Turing vocabulary coverage (L208): frequency-of-
    frequencies over whitespace tokens — exact integer f1/f2/N/D,
    one division per estimate."""
    from lmss_entity_extractor_spark.ops.corpuslaws import vocab_coverage

    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term")
        )
        .filter(F.col("term") != "")
    )
    return vocab_coverage(toks, "term")


def q_mde(spark, sf_dir):
    """Minimum detectable effect (L209): per order priority, the
    two-arm proportion MDE at the observed base rate — embedded z
    literals, one fixed IEEE tree."""
    from lmss_entity_extractor_spark.ops.effectsize import mde_proportions

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_orderkey") % 3 == 0).cast("int").alias("y"),
    )
    return mde_proportions(o, ["prio"], "y")


def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS surface (§2.6 companion to rollup/cube): three
    explicit grouping levels with grouping_id disambiguating the NULL
    rows — exact decimal revenue, one cast per output."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gsets"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, grouping_id() AS gid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


def q_forecast_acc(spark, sf_dir):
    """Forecast accuracy (L206): persistence forecast of event values
    per type scored with MAE/RMSE/WAPE and season-7 MASE — exact
    decimal error sums, one fixed tree per metric."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.timeseries import forecast_accuracy

    w = Window.partitionBy("g").orderBy("t")
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.col("event_id").alias("t"),
            F.floor("value").alias("y"),
        )
        .withColumn("p", F.lag("y").over(w))
    )
    return forecast_accuracy(e, ["g"], "t", "y", "p", season=7)


def q_gains(spark, sf_dir):
    """Cumulative gains / lift table (L207): orders ranked by total
    price with a divisible-by-3 key as the positive label — exact
    ntile buckets via integer arithmetic, one division per rate."""
    from lmss_entity_extractor_spark.ops.evalmetrics import gains_table

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("score"),
        (F.col("o_orderkey") % 3 == 0).cast("int").alias("y"),
    )
    return gains_table(o, "score", "y", "id", n_buckets=10)


def q_trimmed(spark, sf_dir):
    """Trimmed/winsorized means (L204): 5%-trimmed extended price per
    return flag — exact decimal floor(a*n) cut, engine-exact rank
    slice, one division per mean."""
    from lmss_entity_extractor_spark.ops.rankeval import trimmed_stats

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
    )
    return trimmed_stats(li, ["flag"], "v", trim="0.05")


def q_ratio_metric(spark, sf_dir):
    """Delta-method ratio metric (L205): revenue-per-unit-quantity
    with ORDERS as analysis units, per return flag — exact decimal
    sufficient statistics, fixed IEEE ratio/SE tree."""
    from lmss_entity_extractor_spark.ops.effectsize import ratio_metric

    units = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_quantity").isNotNull()
        )
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_orderkey").alias("ok"),
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("x"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("y"),
        )
    )
    return ratio_metric(units, ["flag"], "x", "y")


def q_conformal(spark, sf_dir):
    """Split-conformal quantile (L202): per event type, the
    ceil((n+1)(1-alpha))-th smallest value — exact decimal threshold
    arithmetic, engine-exact order statistic."""
    from lmss_entity_extractor_spark.ops.calibration import (
        conformal_quantile,
    )

    e = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("etype"), F.col("value").alias("s")
    )
    return conformal_quantile(e, ["etype"], "s", alpha="0.1")


def q_ece(spark, sf_dir):
    """Expected/maximum calibration error (L203): scalar roll-up of
    the L166 reliability table — ece collapses to sum|Σy−Σp|/n over
    exact decimal bin sums, one division; mce one division per bin."""
    from lmss_entity_extractor_spark.ops.calibration import (
        expected_calibration_error,
    )

    return expected_calibration_error(
        _calibration_input(spark, sf_dir), "p", "y", n_bins=10
    )


def q_adamic_adar(spark, sf_dir):
    """Adamic-Adar + resource allocation (L167): degree-weighted
    common-neighbor scores over the order—part bipartite slice — per-
    pair sorted neighbor folds (the L39 discipline), one division per
    term, ungridded."""
    from lmss_entity_extractor_spark.graph.linkpred import adamic_adar

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    edges = li.select(
        F.concat(F.lit("o:"), F.col("l_orderkey")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey")).alias("dst"),
    )
    return adamic_adar(edges)


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient (L168): φ(k) over the order→customer
    graph's distinct-degree grid — exact integer N_k/E_k suffix
    counts, one division per k, ungridded."""
    from lmss_entity_extractor_spark.graph.richclub import rich_club

    o = _t(spark, sf_dir, "orders")
    edges = o.select(
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
    )
    return rich_club(edges)


def q_k_anonymity(spark, sf_dir):
    """k-anonymity / l-diversity audit (L169): customers by
    (nation, segment) quasi-identifiers with account balance as the
    sensitive value — exact integer group sizes/diversities plus a
    release-gate summary joined in one row per group."""
    from lmss_entity_extractor_spark.ops.privacy import k_anonymity_audit

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("bal"),
    )
    return k_anonymity_audit(c, ["nation", "segment"], "bal", k_min=10, l_min=5)


def q_t_closeness(spark, sf_dir):
    """t-closeness audit (L201): per (nation, segment) class, ordered
    EMD and TVD of the balance-bucket distribution vs the global one —
    cross-multiplied exact integer gaps (the KS discipline), one
    division per statistic."""
    from lmss_entity_extractor_spark.ops.privacy import t_closeness

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).alias("bal"),
    )
    return t_closeness(c, ["nation", "segment"], "bal")


def q_random_projection(spark, sf_dir):
    """Sparse random projection (L170): 64-d embeddings → 8-d via the
    SHA-derived Achlioptas sign matrix, long format — every value
    bit-checked against the oracle's identical generated literals."""
    from lmss_entity_extractor_spark.ops.randproj import rp_project

    e = _t(spark, sf_dir, "embeddings")
    out = rp_project(e, dim=64, out_dim=8, seed=7)
    return out.select("vec_id", F.posexplode("rp").alias("dim", "value"))


def _random_projection_oracle_sql(dim: int = 64, out_dim: int = 8, seed: int = 7) -> str:
    """q_random_projection's oracle: the SAME sign matrix (shared
    derivation) expanded as explicitly left-associated float64 dots."""
    import math

    from lmss_entity_extractor_spark.ops.randproj import jl_sign_matrix

    signs = jl_sign_matrix(dim, out_dim, seed)
    scale = math.sqrt(3.0 / out_dim)

    def lit(v: float) -> str:
        # repr round-trips: DuckDB parses the shortest decimal form to
        # the identical IEEE double (Spark's _dlit D-suffix is not
        # DuckDB syntax)
        return f"CAST({v!r} AS DOUBLE)"

    def dot(row) -> str:
        acc = f"(CAST(e.embedding[1] AS DOUBLE) * {lit(row[0])})"
        for i in range(1, dim):
            acc = (
                f"({acc} + (CAST(e.embedding[{i} + 1] AS DOUBLE)"
                f" * {lit(row[i])}))"
            )
        return acc

    selects = [
        f"SELECT vec_id, CAST({j} AS INTEGER) AS dim, "
        f"({dot(row)} * {lit(scale)}) AS value FROM embeddings e"
        for j, row in enumerate(signs)
    ]
    return "\nUNION ALL\n".join(selects)


def q_containment(spark, sf_dir):
    """Shingle containment near-dup (L171): the 'document swallowed a
    document' case Jaccard misses — integer-exact n_shared ≥ t·n
    filter on EITHER side, one division per emitted ratio."""
    from lmss_entity_extractor_spark.ops.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5, max_shingle_df=50
    )


def q_ccf(spark, sf_dir):
    """Cross-correlation function (L172): does the event value lead the
    (event_id mod 7) cycle — lags 0..3 per user, exact decimal
    centring, sqrt·sqrt denominator, one division per lag."""
    from lmss_entity_extractor_spark.ops.concentration import ccf

    e = (
        _t(spark, sf_dir, "events")
        .filter((F.col("user_id") < 40) & F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.col("value").alias("x"),
            (F.col("event_id") % 7).cast("double").alias("y"),
        )
    )
    return ccf(e, ["user_id"], ["ts", "event_id"], "x", "y", max_lag=3)


def q_srm(spark, sf_dir):
    """Sample-ratio-mismatch check (L140 composition): is the 50/50
    even/odd user split actually 50/50 — χ² = (n_a−n_b)²/(n_a+n_b),
    exact integers, one division."""
    e = _t(spark, sf_dir, "events")
    agg = e.agg(
        F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("n_a"),
        F.sum((F.col("user_id") % 2 != 0).cast("long")).alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    return agg.select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") + F.col("n_b")) > 0,
            (d * d).cast("double") / (F.col("n_a") + F.col("n_b")).cast("double"),
        ).alias("chi2"),
    )


def q_weighted_quantiles(spark, sf_dir):
    """Weighted quantiles (L173): per-priority weighted p25/p50/p75 of
    order totals — decimal-exact cumW ≥ q·W threshold (no float
    boundary wobble), one window sort for all quantiles."""
    from lmss_entity_extractor_spark.ops.rankeval import weighted_quantiles

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderkey") % 5 + 1).alias("w"),
    )
    return weighted_quantiles(
        o, ["priority"], "v", "w", qs=["0.25", "0.5", "0.75"]
    )


def q_kruskal(spark, sf_dir):
    """Kruskal-Wallis (L174): do event types differ in (floored) value
    — doubled-rank integer sums, bounded group/tie folds, fixed IEEE H
    tree with tie correction, ungridded."""
    from lmss_entity_extractor_spark.ops.rankeval import kruskal_wallis

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.floor("value").alias("v"))
    )
    return kruskal_wallis(e, "event_type", "v")


def q_readability(spark, sf_dir):
    """Flesch / Flesch-Kincaid readability (L175): regex-only counting
    conventions (vowel-group syllables, terminator-run sentences),
    exact integer counts, two divisions per score, ungridded."""
    from lmss_entity_extractor_spark.ops.textstats import readability

    return readability(_t(spark, sf_dir, "documents"))


def q_compaction_plan(spark, sf_dir):
    """Compaction planning (L176): documents-as-files packed into
    ≈8 KiB merge buckets — size-desc total order, exact integer
    running totals; summary shape per bucket."""
    from lmss_entity_extractor_spark.ops.compaction import compaction_summary

    files = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("file_id"),
        F.length("text").cast("long").alias("bytes"),
    )
    return compaction_summary(files, target_bytes=8192)


def q_sorted_neighborhood(spark, sf_dir):
    """Blocked sorted-neighborhood ER blocking (L177): part names
    sorted within 2-char prefix blocks, pairs within a 3-position
    window — exact integer positions, one keyed exchange."""
    from lmss_entity_extractor_spark.ops.blocking import sorted_neighborhood_pairs

    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        F.col("p_name").alias("name"),
        F.substring("p_name", 1, 2).alias("blk"),
    )
    return sorted_neighborhood_pairs(p, "blk", "name", "pid", window=3)


def q_cuped(spark, sf_dir):
    """CUPED adjustment (L178): order totals adjusted by the key-mod
    covariate per priority — θ from exact decimal OLS stats, fixed
    per-row tree, ungridded."""
    from lmss_entity_extractor_spark.ops.cuped import cuped_adjust

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        F.col("o_totalprice").alias("y"),
        (F.col("o_orderkey") % 100).cast("double").alias("x"),
    )
    out = cuped_adjust(o, ["priority"], "y", "x")
    return out.select("priority", "o_orderkey", "theta", "metric_adj")


def q_heaps(spark, sf_dir):
    """Heaps'-law vocabulary growth (L179): ln V on ln N over per-doc
    cumulative points — first-occurrence cumsums (no running COUNT
    DISTINCT), ordered-fold OLS, fixed fit tree."""
    from lmss_entity_extractor_spark.ops.corpuslaws import heaps_fit

    return heaps_fit(_t(spark, sf_dir, "documents"))


def q_zipf(spark, sf_dir):
    """Zipf rank-frequency fit (L180): ln f on ln rank over the top-200
    terms (count DESC, term ASC ranks), ordered-fold OLS."""
    from lmss_entity_extractor_spark.ops.corpuslaws import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), top_k=200)


def q_wasserstein(spark, sf_dir):
    """1-D Wasserstein distance (L181): click-vs-view value drift per
    user bucket — the integral ECDF gap (KS's companion), exact
    decimal gap×width terms, ONE division."""
    from lmss_entity_extractor_spark.ops.rankeval import wasserstein_1d

    e = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("bucket"), "event_type", "value"
    )
    return wasserstein_1d(e, ["bucket"], "event_type", "click", "view", "value")


def q_twap(spark, sf_dir):
    """Time-weighted average (L182): per-user TWAP of event values —
    exact integer microsecond intervals, exact decimal v·Δt terms,
    ONE division; the mean row-weighted AVG gets wrong on irregular
    sampling."""
    from lmss_entity_extractor_spark.ops.timeseries import time_weighted_avg

    e = (
        _t(spark, sf_dir, "events")
        .filter((F.col("user_id") < 40) & F.col("value").isNotNull())
        .select("user_id", "ts", "value")
    )
    return time_weighted_avg(e, ["user_id"], "ts", "value")


def q_ohlc(spark, sf_dir):
    """OHLC resample bars (L183): per-user daily bars — open/close via
    min_by/max_by on exact microsecond order, exact min/max."""
    from lmss_entity_extractor_spark.ops.timeseries import ohlc_bars

    e = (
        _t(spark, sf_dir, "events")
        .filter((F.col("user_id") < 40) & F.col("value").isNotNull())
        .select("user_id", "ts", "value")
    )
    return ohlc_bars(e, ["user_id"], "ts", "value", bucket_seconds=86400)


def q_cohens_kappa(spark, sf_dir):
    """Cohen's κ (L184): chance-corrected agreement between an event
    type and its successor — exact integer contingency/margin products,
    ONE division, ungridded."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    return cohens_kappa(e, "event_type", "nxt")


def q_wilson(spark, sf_dir):
    """Wilson score interval (L185): per-event-type success-rate CI —
    fixed IEEE tree over exact (k, n), pinned z literal, ungridded."""
    from lmss_entity_extractor_spark.ops.effectsize import wilson_interval

    e = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 3 == 0).cast("int").alias("success")
    )
    return wilson_interval(e, ["event_type"], "success")


def q_cohens_d(spark, sf_dir):
    """Cohen's d + Hedges' g (L186): even-vs-odd order totals per
    priority — exact decimal sufficient stats, fixed trees,
    ungridded."""
    from lmss_entity_extractor_spark.ops.effectsize import cohens_d

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("variant"),
        F.col("o_totalprice").alias("y"),
    )
    return cohens_d(o, ["priority"], "variant", "a", "b", "y")


def q_reciprocity(spark, sf_dir):
    """Directed reciprocity (L187): customer→nation edges with a
    one-third back-edge subset — r = |E∩Eᵀ|/|E| exact, one division."""
    from lmss_entity_extractor_spark.graph.metrics import reciprocity

    c = _t(spark, sf_dir, "customer")
    fwd = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
    )
    back = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("src"),
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("dst"),
    )
    return reciprocity(fwd.unionByName(back))


def q_conductance(spark, sf_dir):
    """Community conductance (L188): does the region partition cut few
    customer→nation edges — exact integer cut/volume, one division per
    community."""
    from lmss_entity_extractor_spark.graph.metrics import conductance

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    edges = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
    )
    comm = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"),
            F.col("n_regionkey").alias("community"),
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("node"),
                F.col("n_regionkey").alias("community"),
            )
        )
    )
    return conductance(edges, comm)


def q_wilcoxon(spark, sf_dir):
    """Wilcoxon signed-rank (L189): paired discount-vs-tax per
    lineitem row, grouped by return flag — doubled-rank integer sums,
    exact tie correction, one fixed IEEE z tree, ungridded."""
    from lmss_entity_extractor_spark.ops.rankeval import (
        wilcoxon_signed_rank,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_discount").alias("x"),
        F.col("l_tax").alias("y"),
    )
    return wilcoxon_signed_rank(li, ["flag"], "x", "y", scale=2)


def q_friedman(spark, sf_dir):
    """Friedman test (L190): blocks = orders, treatments = line
    numbers, values = extended price — complete blocks only (orders
    carrying every line number seen in the group), doubled within-
    block average ranks, tie-corrected Q as one division of exact
    DECIMAL integers."""
    from lmss_entity_extractor_spark.ops.rankeval import friedman

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 3).alias("grp"),
        F.col("l_orderkey").alias("b"),
        F.col("l_linenumber").alias("t"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
    )
    return friedman(li, ["grp"], "b", "t", "v")


def q_mcnemar(spark, sf_dir):
    """McNemar's test (L191): paired binary indicators (deep discount
    vs high tax) per lineitem row, by return flag — discordant-pair
    counts, plain and Edwards-corrected chi2, one exact division."""
    from lmss_entity_extractor_spark.ops.evalmetrics import mcnemar

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_discount") > 0.05).cast("int").alias("x"),
        (F.col("l_tax") > 0.04).cast("int").alias("y"),
    )
    return mcnemar(li, ["flag"], "x", "y")


def q_fleiss(spark, sf_dir):
    """Fleiss' kappa (L192): orders as subjects, their lineitem
    return flags as m=4 ratings (other order sizes drop loudly) —
    rescaled so kappa is one division of exact DECIMAL integers."""
    from lmss_entity_extractor_spark.ops.evalmetrics import fleiss_kappa

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 2).alias("grp"),
        F.col("l_orderkey").alias("s"),
        F.col("l_returnflag").alias("c"),
    )
    return fleiss_kappa(li, ["grp"], "s", "c", m=4)


def q_cochran(spark, sf_dir):
    """Cochran's Q (L195): did the k line positions of an order get
    deep discounts at different rates — complete blocks (orders
    carrying every line number in the group), /k-cleared exact
    integer form, one division."""
    from lmss_entity_extractor_spark.ops.evalmetrics import cochran_q

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 3).alias("grp"),
        F.col("l_orderkey").alias("b"),
        F.col("l_linenumber").alias("t"),
        (F.col("l_discount") > 0.05).cast("int").alias("y"),
    )
    return cochran_q(li, ["grp"], "b", "t", "y")


def q_brown_forsythe(spark, sf_dir):
    """Brown-Forsythe (L193): do event types have equal value
    variance — discrete per-level medians, exact decimal deviation
    stats, ordered-fold ANOVA on |value - median|."""
    from lmss_entity_extractor_spark.ops.stattests import brown_forsythe

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("event_type").alias("lvl"),
            F.floor("value").alias("v"),
        )
    )
    return brown_forsythe(e, [], "lvl", "v")


def q_cramers_v(spark, sf_dir):
    """Cramér's V (L194): effect size of the priority × status
    association on orders — ordered-fold chi2, plain and
    Bergsma-corrected V as fixed IEEE trees."""
    from lmss_entity_extractor_spark.ops.stattests import cramers_v

    return cramers_v(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


def q_share_of_total(spark, sf_dir):
    """Ratio-to-report: each nation's share of its region's revenue —
    DECIMAL window sums (exact, order-insensitive) with ONE IEEE
    division per row, ungridded."""
    from pyspark.sql import Window

    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "rev_d"
            )
        )
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        F.col("r_name").alias("region_name"),
        F.col("n_name").alias("nation_name"),
        F.col("rev_d").cast("double").alias("revenue"),
        (
            F.col("rev_d").cast("double")
            / F.sum("rev_d").over(w).cast("double")
        ).alias("share"),
    )


def q_collect_pivot(spark, sf_dir):
    """P3 triples->wide-row pivot form: per-subject ordered multi-value
    collapse (`app/lmss_parser.py:65-69` get_literals), as a sorted
    distinct-collect joined to a comma string for determinism."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
        F.min("ts").alias("first_ts"),
    )


def q_top_terms(spark, sf_dir):
    """T2 per-document top-k term frequencies (the reference's single-doc
    TF-IDF keyword channel, `app/entity_extraction.py:128-140`), as
    explode -> count -> windowed top-3 with deterministic tiebreak."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.length("term") >= 6)
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("term"))
    return (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


def q_sha256(spark, sf_dir):
    """F9 sha256 content hash (`app/lmss_parser.py:36-42`) per document."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("sha")
    )


# ---------------------------------------------------------------------------
# queries — UDF-backed pipeline operators (rows-only; no SQL oracle)
# ---------------------------------------------------------------------------


def q_mention_type_counts(spark, sf_dir):
    """A1 over the real extraction stage (Arrow UDF): mention counts per
    candidate type on the documents-derived transcripts.

    Oracle-checked against the independent single-process loop oracle
    (oracle/reference_oracle.py — per-turn Python, no Spark, no shared
    dataflow code beyond the pinned candidate/fuzzy/encoder fixtures),
    whose tallies are frozen as a parquet fixture the driver's DuckDB
    reads (tools/make_oracle_fixtures.py; regenerated + compared in
    tests/test_contract.py so drift fails CI)."""
    pipe = _pipeline(spark)
    mentions = pipe.dataflow(_transcripts(spark, sf_dir), strategy="staged")["mentions"]
    return mentions.groupBy("mtype").agg(F.count(F.lit(1)).alias("n_mentions"))


def q_kg_edge_counts(spark, sf_dir):
    """Full KG pipeline (extract -> link -> canonicalize), per-predicate
    canonical edge counts and provenance tallies.

    Oracle-checked against the loop oracle's oracle_edge_counts fixture
    (see q_mention_type_counts): n_edges = distinct (subj, pred, obj),
    n_provenances = raw emission count per canonical edge — the same
    semantics the salted 3-phase canonicalization computes
    distributed."""
    pipe = _pipeline(spark)
    edges = pipe.dataflow(_transcripts(spark, sf_dir))["edges"]
    return edges.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("n_provenances").alias("n_provenances"),
    )


def q_hybrid_search(spark, sf_dir):
    """J3 hybrid index search over the ontology catalog
    (/root/reference/app/lmss_search.py:88-104 semantics).

    Oracle-checked via a term fixture (tools/make_oracle_fixtures.py):
    the three per-(query,entity) score terms — token_set_ratio,
    partial_ratio, hash-encoder cosine — are LCS/encoder algorithms with
    no ANSI-SQL equivalent, so they are frozen to parquet by the same
    straight-line functions the parity gate trusts (hand-computed ratio
    cases in tests/test_textproc.py), and DuckDB independently checks
    the relational rest: the 0.3/0.3/0.4 blend, the score>0 filter, and
    the top-10 ranking with the asc-iri tiebreak.  The fixture's cosine
    uses the exact sequential-fold accumulation of cosine_expr, so the
    rounded scores match bit-for-bit."""
    from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes
    from lmss_entity_extractor_spark.search import hybrid_search

    artifacts = build_artifacts(parse_owl_classes(_artifact_owl()))
    return hybrid_search(spark, artifacts, "patent litigation counsel")


def q_simhash(spark, sf_dir):
    """64-bit SimHash signatures (Arrow numpy UDF).

    Oracle-checked bit-for-bit: the md5 token-hash family lets DuckDB
    recompute every signature from hex-digest nibbles — a full value
    check of the vectorized bit-twiddling UDF, not just row counts."""
    from lmss_entity_extractor_spark.ops.dedup import simhash_signatures

    return simhash_signatures(_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100))


def q_bucketed_join(spark, sf_dir):
    """O8 bucketed layout: same-key bucketed tables join with zero
    shuffle exchanges (plan asserted in tests/test_plans.py); results
    match the plain equi-join oracle."""
    from lmss_entity_extractor_spark.catalog import drop_table, write_bucketed

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    drop_table(spark, "q_bkt_customer")
    drop_table(spark, "q_bkt_orders")
    write_bucketed(c.select("c_custkey", "c_mktsegment"), "q_bkt_customer", ["c_custkey"], 16)
    write_bucketed(o.select("o_custkey", "o_totalprice"), "q_bkt_orders", ["o_custkey"], 16)
    tc, to = spark.table("q_bkt_customer"), spark.table("q_bkt_orders")
    return (
        tc.hint("merge")
        .join(to, tc.c_custkey == to.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_streaming_conv_totals(spark, sf_dir):
    """§2.9 stateful streaming (applyInPandasWithState): per-conversation
    turn totals over an AvailableNow bounded stream, split into multiple
    micro-batches (maxFilesPerTrigger=2 over a 4-file input) so
    cross-batch state merging is genuinely exercised.

    Oracle-checked (VERDICT r1 item 2): the final state per conversation
    is batching-invariant and equals the plain GROUP BY count DuckDB
    computes over the same derived transcripts
    (``transcripts_from_documents`` is pure column math over
    ``documents``: conv_id = 'conv-' || lpad(doc_id % 64, 6, '0'))."""
    import tempfile

    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import conversation_running_totals

    tmp = tempfile.mkdtemp(prefix="lmss_stream_q_")
    _transcripts(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(f"{tmp}/turns")
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmp}/turns")
    )
    q = (
        conversation_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("q_conv_totals")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT conv_id, max(n_turns_total) AS n_turns_total FROM q_conv_totals GROUP BY conv_id"
    )


def q_streaming_heavy_hitters(spark, sf_dir):
    """Streaming heavy hitters (L106, sharded Misra-Gries in the state
    store): document unigram tokens streamed in multiple micro-batches;
    k=64 exceeds the corpus vocabulary, so NO eviction happens and the
    final per-item state is the EXACT count — which is the oracle-able
    regime (plain GROUP BY count in DuckDB).  The eviction regime's MG
    bounds are pinned by tests/test_streaming_hh.py."""
    import tempfile

    from lmss_entity_extractor_spark.streaming.stateful import streaming_heavy_hitters

    tmp = tempfile.mkdtemp(prefix="lmss_stream_hh_")
    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
    )
    toks.repartition(4).write.mode("overwrite").parquet(f"{tmp}/toks")
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmp}/toks")
    )
    q = (
        streaming_heavy_hitters(stream, "tok", k=64, shards=4)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("q_stream_hh")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT item AS term, max(count_est) AS n FROM q_stream_hh GROUP BY item"
    )


def q_streaming_dedup(spark, sf_dir):
    """Watermark-bounded streaming dedup: the transcripts are delivered
    TWICE (at-least-once redelivery, two identical files processed in
    separate micro-batches) and dropDuplicatesWithinWatermark must emit
    each (conv_id, turn_idx) exactly once — the oracle is the plain
    GROUP BY over a single clean copy."""
    import tempfile

    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import streaming_dedup

    tmp = tempfile.mkdtemp(prefix="lmss_sdedup_q_")
    t = _transcripts(spark, sf_dir)
    t.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/turns/copy=a")
    t.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/turns/copy=b")
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/turns/copy=*")
    )
    q = (
        streaming_dedup(stream, ["conv_id", "turn_idx"], watermark="240 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("q_sdedup")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT conv_id, count(*) AS n_turns FROM q_sdedup GROUP BY conv_id"
    )


# v1/v2 commit boundary for the changelog query AND its frozen fixtures
# (tools/make_oracle_fixtures.py imports this — one constant, no drift);
# sf0.01 (500 docs) splits in half
CHANGELOG_CUT = 250

# Queries whose oracles read loop-oracle fixtures frozen at sf0.01 (the
# driver's correctness scale): comparing them at another sf mismatches BY
# DESIGN.  tools/check_entry.py skips them off-sf0.01 with a note; every
# other oracle is scale-independent (verified green at sf0.001/0.01/0.1).
FIXTURE_PINNED_SF001 = frozenset(
    {
        "mention_type_counts",
        "kg_edge_counts",
        "edges_changelog",
        "knn_pq",
        "knn_ivfpq",
        "knn_ivfpq_rerank",
        "knn_ivfpq_residual",
        "edges_as_of",
    }
)


def _two_commit_increments(spark, sf_dir, prefix):
    """Shared setup for the snapshot-machinery contract queries: derive
    transcripts from documents in TWO commits (doc_id < CHANGELOG_CUT,
    then the rest) and run each through ``run_incremental`` — the same
    v1/v2 split tools/make_oracle_fixtures.py freezes.  Returns
    (pipe, out_dir, r1, r2)."""
    import tempfile

    from lmss_entity_extractor_spark.datagen.transcripts import transcripts_from_documents

    tmp = tempfile.mkdtemp(prefix=prefix)
    pipe = _pipeline(spark)
    docs = _t(spark, sf_dir, "documents")
    tdir, out = f"{tmp}/turns", f"{tmp}/edges"
    transcripts_from_documents(
        docs.filter(F.col("doc_id") < CHANGELOG_CUT)
    ).coalesce(1).write.parquet(f"{tdir}/v1")
    r1 = pipe.run_incremental(tdir, out)
    transcripts_from_documents(
        docs.filter(F.col("doc_id") >= CHANGELOG_CUT)
    ).coalesce(1).write.parquet(f"{tdir}/v2")
    r2 = pipe.run_incremental(tdir, out)
    return pipe, out, r1, r2


def q_edges_changelog(spark, sf_dir):
    """Snapshot-incremental + changelog machinery end-to-end, value-
    oracled: the derived transcripts land in TWO commits (doc_id < 250,
    then the rest), ``run_incremental`` processes each delta through the
    real extract->link->canonicalize dataflow, and ``edges_diff``
    computes the insert/update changelog between the two recorded
    snapshots.

    Oracle: DuckDB left-joins two frozen loop-oracle edge tables (the
    doc_id < 250 prefix and the full table —
    tools/make_oracle_fixtures.py, pinned to sf0.01 like the other
    loop-oracle fixtures).  Count inequality per triple is
    diff-completeness: any provenance change implies new emissions,
    which always bump n_provenances (oracle_edge_rows docstring)."""
    from lmss_entity_extractor_spark.streaming.incremental import edges_diff

    pipe, out, r1, r2 = _two_commit_increments(spark, sf_dir, "lmss_chlog_")
    diff = edges_diff(pipe, out, r1["snapshot_id"], r2["snapshot_id"])
    return diff.select("subj", "pred", "obj", "n_provenances", "_change")


def q_edges_as_of(spark, sf_dir):
    """Time travel (L32, VERDICT r3 #4): two commits land through
    ``run_incremental`` (doc_id < 250, then the rest) and the VERSION-
    AS-OF read at the FIRST snapshot must reconstruct exactly the v1
    canonical edge table — the second commit's increment contributes
    zero rows (and zero scanned bytes: directory selection prunes it).

    Oracle: the frozen v1 loop-oracle edge table
    (fixtures/oracle/sf0.01/kg_edges_v1.parquet) read directly — the
    same fixture family as edges_changelog, pinned to sf0.01."""
    pipe, out, r1, _r2 = _two_commit_increments(spark, sf_dir, "lmss_asof_")
    return pipe.edges_as_of(out, r1["snapshot_id"]).select(
        "subj", "pred", "obj", "n_provenances"
    )


def q_stream_reply_join(spark, sf_dir):
    """L29 stream-STREAM event-time interval join, driven as a genuine
    multi-micro-batch stream: user turns pair with same-conversation
    assistant turns arriving within 2 hours after them.

    The derived transcripts space conversation turns 64 minutes apart
    (ts = epoch + doc_id minutes, doc_id stepping by 64 within a conv),
    with roles cycling user/assistant/tool by turn_idx — so the 2-hour
    window captures exactly the immediately-following assistant turn.
    Both sides are watermarked (bounded join state); maxFilesPerTrigger=2
    over a 4-file input forces cross-batch buffering.  Oracle: the same
    range join in DuckDB over the pure-column-math transcript
    derivation."""
    import tempfile

    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import pair_turns_with_replies

    tmp = tempfile.mkdtemp(prefix="lmss_replyq_")
    t = _transcripts(spark, sf_dir)
    t.repartition(4).write.mode("overwrite").parquet(f"{tmp}/turns")
    # The watermark must exceed the full event-time span: repartition(4)
    # scatters the time range across files, so batch 1 can contain
    # near-max ts and a too-short horizon would silently DROP batch-2
    # rows from the stateful join (the oracle keeps them -> red row).
    # Derive it from the data instead of hard-coding 240h.
    span = t.agg(
        F.ceil((F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))) / 3600)
    ).collect()[0][0]
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmp}/turns")
    )
    q = (
        pair_turns_with_replies(stream, reply_window="2 hours", watermark=f"{int(span) + 24} hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("q_reply_join")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT conv_id, user_turn_idx, user_ts, reply_turn_idx, reply_ts FROM q_reply_join"
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: binary payload -> Arrow-batched feature
    extraction through ``mapInPandas``.

    Oracle-checked on the metadata that round-trips the UDF (mime groups,
    item counts, payload byte sizes — byte counts, not char counts, so a
    string-cast regression resurfaces here); the stubbed decode's feature
    *values* are covered by determinism/round-trip tests in
    tests/test_ops.py (blake2b is not expressible in SQL)."""
    from lmss_entity_extractor_spark.ops.multimodal import extract_media_features, make_media_table

    media = make_media_table(_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100))
    feats = extract_media_features(media)
    return feats.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
    )


def q_frame_sample(spark, sf_dir):
    """Multimodal frame sampling: every-64th-byte frame slicing over
    binary payloads (executor-side explode; decode stubbed).

    Oracle-checked: per-mime frame counts follow ceil(n_bytes/64) (min 1),
    and summed frame byte lengths must reassemble the exact payload byte
    totals — a conservation law that fails if slicing drops the tail,
    mangles bytes through a string cast, or double-counts."""
    from lmss_entity_extractor_spark.ops.multimodal import make_media_table, sample_frames

    media = make_media_table(_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50))
    frames = sample_frames(media, every_n_bytes=64)
    return frames.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame_bytes")).alias("n_payload_bytes"),
    )


def q_bgp_union(spark, sf_dir):
    """SPARQL UNION (graph/bgp.py bgp_union): a chain branch binding
    (o, c, n) unioned with a type-only branch binding just n — the
    branches have DIFFERING variable domains, so the result pads the
    unbound columns with NULL per SPARQL 1.1 §18.5 (this engine's set
    semantics: one distinct).  Oracle: the two joins UNION ALL'd with
    explicit NULL casts + DISTINCT."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_union

    return bgp_union(
        _bgp_fixture(spark, sf_dir),
        [
            [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")],
            [("?n", "rdf:type", "Nation")],
        ],
    )


def q_bgp_minus(spark, sf_dir):
    """SPARQL MINUS (graph/bgp.py bgp_minus) with BOTH compatibility
    slices live: solutions come from a UNION whose second branch binds
    only ?n2, so its rows carry NULL in every MINUS-shared variable
    (disjoint domain → must SURVIVE, §8.3), while the fully-bound chain
    rows are removed exactly when their (c, n) matches a typed-nation
    customer.  Survivors: untyped-region chain rows + all type-only
    rows.  Oracle: NOT EXISTS with the spec's subset-compatibility
    predicate (NULL drops out of the domain; at least one shared var
    non-NULL)."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_minus, bgp_union

    fix = _bgp_fixture(spark, sf_dir)
    sols = bgp_union(
        fix,
        [
            [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")],
            [("?n2", "rdf:type", "Nation")],
        ],
    )
    return bgp_minus(
        sols, fix, [("?c", "located_in", "?n"), ("?n", "rdf:type", "Nation")]
    )


def q_bgp_aggregate(spark, sf_dir):
    """SPARQL aggregates (graph/bgp.py bgp_aggregate): GROUP BY ?n over
    the chain solutions extended with an OPTIONAL type pattern —
    COUNT(?t) must skip the unbound (NULL) ?t rows of untyped nations
    while COUNT(*) counts them, SAMPLE is pinned to MIN, and HAVING
    prunes small groups after aggregation.  Oracle: LEFT JOIN + the
    same grouped aggregates (SQL count(col) shares the skip-NULL
    semantics)."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_aggregate

    return bgp_aggregate(
        _bgp_fixture(spark, sf_dir),
        [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")],
        group_by=["n"],
        aggs=[
            ("count", "*", "n_sols"),
            ("count", "t", "n_typed"),
            ("count_distinct", "c", "n_custs"),
            ("sample", "c", "sample_c"),
        ],
        optional=[[("?n", "rdf:type", "?t")]],
        having=["n_sols >= 3"],
    )


def q_describe(spark, sf_dir):
    """SPARQL DESCRIBE / Concise Bounded Description (graph/describe.py):
    seeds are every 10th customer; each customer's out-triples include a
    blank-node address (``_:a<k>``) and, for k % 3 = 0, a second-level
    blank geo node (``_:g<k>``) — the CBD must follow blank nodes
    transitively (depth-3 frontier) and must NOT pull in the IRI-object
    neighbors (nations).  Oracle: recursive reachability CTE restricted
    to blank-node objects, then one join for the triple payload."""
    from lmss_entity_extractor_spark.graph.describe import describe_cbd

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    triples = (
        c.select(
            F.concat(F.lit("c:"), k).alias("s"),
            F.lit("located_in").alias("p"),
            F.concat(F.lit("n:"), F.col("c_nationkey")).alias("o"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), k).alias("s"),
                F.lit("address").alias("p"),
                F.concat(F.lit("_:a"), k).alias("o"),
            )
        )
        .unionByName(
            c.select(
                F.concat(F.lit("_:a"), k).alias("s"),
                F.lit("street").alias("p"),
                F.concat(F.lit("street "), k).alias("o"),
            )
        )
        .unionByName(
            c.filter(k % 3 == 0).select(
                F.concat(F.lit("_:a"), k).alias("s"),
                F.lit("geo").alias("p"),
                F.concat(F.lit("_:g"), k).alias("o"),
            )
        )
        .unionByName(
            c.filter(k % 3 == 0).select(
                F.concat(F.lit("_:g"), k).alias("s"),
                F.lit("lat").alias("p"),
                F.concat(F.lit("lat"), k).alias("o"),
            )
        )
    )
    seeds = c.filter(k % 10 == 0).select(F.concat(F.lit("c:"), k).alias("node"))
    return describe_cbd(triples, seeds)


def q_wu_palmer(spark, sf_dir):
    """Wu-Palmer taxonomic similarity (graph/taxsim.py): a 4-level
    hierarchy root(1) → region(2) → nation(3) → customer(4) built from
    the TPC-H geography; pairs mix customer×customer and
    customer×nation, so the LCA lands at every level (self, nation,
    region, root) and wup spans {1, 3/4, 1/2, 1/4, 6/7, 4/7, 2/7}.
    wup is a division of small exact ints — bit-identical cross-engine,
    no rounding grid needed.  Oracle: the same ancestor relation in SQL
    with the LCA elected by row_number ORDER BY depth DESC, anc DESC
    (the max(struct) tie-break, spelled relationally)."""
    from lmss_entity_extractor_spark.graph.taxsim import wu_palmer

    cn = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 100 == 0)
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey", "n_regionkey")
    )
    n = _t(spark, sf_dir, "nation")
    ck = F.concat(F.lit("c:"), F.col("c_custkey"))
    nk = F.concat(F.lit("n:"), F.col("c_nationkey"))
    rk = F.concat(F.lit("r:"), F.col("n_regionkey"))
    cust_anc = (
        cn.select(ck.alias("node"), ck.alias("anc"), F.lit(4).alias("anc_depth"))
        .unionByName(cn.select(ck.alias("node"), nk.alias("anc"), F.lit(3).alias("anc_depth")))
        .unionByName(cn.select(ck.alias("node"), rk.alias("anc"), F.lit(2).alias("anc_depth")))
        .unionByName(cn.select(ck.alias("node"), F.lit("root").alias("anc"), F.lit(1).alias("anc_depth")))
    )
    nn = F.concat(F.lit("n:"), F.col("n_nationkey"))
    nr = F.concat(F.lit("r:"), F.col("n_regionkey"))
    nat_anc = (
        n.select(nn.alias("node"), nn.alias("anc"), F.lit(3).alias("anc_depth"))
        .unionByName(n.select(nn.alias("node"), nr.alias("anc"), F.lit(2).alias("anc_depth")))
        .unionByName(n.select(nn.alias("node"), F.lit("root").alias("anc"), F.lit(1).alias("anc_depth")))
    )
    ancestors = cust_anc.unionByName(nat_anc)
    ca = cn.select(ck.alias("a"))
    pairs = (
        ca.crossJoin(cn.select(ck.alias("b")))
        .unionByName(ca.crossJoin(cn.select(nk.alias("b"))))
        .distinct()
    )
    return wu_palmer(ancestors, pairs)


def q_bpe_pairs(spark, sf_dir):
    """BPE pair statistics (ops/bpe.py): ONE corpus pass builds the
    word-frequency table, then weighted adjacent-symbol-pair counts over
    the vocabulary — the no-merge path is pure JVM column algebra
    (split + zip_with over two slices), which is exactly the slice this
    oracle re-derives: per-word character positions via
    generate_series, the terminal symbol forced to </w>, counts
    weighted by word frequency."""
    from lmss_entity_extractor_spark.ops.bpe import bpe_pair_counts, word_counts

    return bpe_pair_counts(word_counts(_t(spark, sf_dir, "documents"), "text"))


def q_pca_covariance(spark, sf_dir):
    """Distributed covariance via per-partition moment matrices
    (ops/pca.py collect_moments): the only cross-cluster traffic is one
    (n, Σx, Σxxᵀ) row per partition; the driver combines and forms the
    population covariance.  Contract slice: the 16×16 leading block on
    the half-up 1e-6 grid (floor(x·1e6 + 0.5) — the repo-standard
    cross-engine float discipline; eigh itself is never oracled, per
    the module docstring).  Oracle: E[xy] − E[x]E[y] per coordinate
    pair in DuckDB with values CAST to double BEFORE the product, same
    as the kernel's float64 widening."""
    import math

    from lmss_entity_extractor_spark.ops.pca import collect_moments

    _n, _mean, cov = collect_moments(_t(spark, sf_dir, "embeddings"), "embedding")
    rows = [
        (i, j, math.floor(cov[i, j] * 1e6 + 0.5) / 1e6)
        for i in range(16)
        for j in range(16)
    ]
    return spark.createDataFrame(rows, "i int, j int, cov6 double")


def _minted_urls(spark, sf_dir):
    """Deterministic URL corpus over documents: doc_id mods drive
    scheme/host case, www, default/kept ports, empty paths, query
    permutations, fragments, and a garbage slice — every normalization
    rule of ops/urls.py fires.  The oracle mints the identical strings
    (and derives the expected canonical form from the CASE arms, not by
    re-running a regexp — an independent derivation)."""
    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    url = F.when(k % 13 == 0, F.lit("not a url")).otherwise(
        F.concat(
            F.when(k % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("http://")),
            F.when(k % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.col("source"),
            F.when(k % 2 == 0, F.lit(".Example.COM")).otherwise(F.lit(".example.org")),
            F.when(k % 4 == 0, F.lit(":443"))
            .when(k % 4 == 1, F.lit(":80"))
            .when(k % 4 == 2, F.lit(":8080"))
            .otherwise(F.lit("")),
            F.when(k % 11 == 0, F.lit("")).otherwise(
                F.concat(F.lit("/p/"), (k % 50).cast("string"))
            ),
            F.when(k % 5 == 0, F.lit("?b=2&a=1"))
            .when(k % 5 == 1, F.lit("?a=1&b=2"))
            .when(k % 5 == 2, F.lit("?"))
            .otherwise(F.lit("")),
            F.when(k % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
        )
    )
    return d.select("doc_id", url.alias("url"))


def q_url_normalize(spark, sf_dir):
    """URL canonicalization (ops/urls.py): scheme/host case-fold, www
    strip, default-port drop, empty-path /, fragment drop, bare-?
    drop, query-param sort; garbage rows surface as NULL.  Pure JVM
    regexp/array algebra — the normalization fuses into the scan
    projection.  Oracle: the expected canonical string derived
    independently from the minting arms."""
    from lmss_entity_extractor_spark.ops.urls import normalize_urls

    return normalize_urls(_minted_urls(spark, sf_dir)).select(
        "doc_id", "url_norm", "domain"
    )


def q_domain_stats(spark, sf_dir):
    """Per-registered-domain curation stats (ops/urls.py): row count,
    distinct canonical URLs, duplicate surplus — ONE combinable hash
    aggregate; unparseable URLs stay visible under the NULL domain.
    Oracle: the same counts over the independently-derived canonical
    forms."""
    from lmss_entity_extractor_spark.ops.urls import domain_stats

    return domain_stats(_minted_urls(spark, sf_dir))


def q_bpe_merged_pairs(spark, sf_dir):
    """BPE merge application (ops/bpe.py _symbols, the Arrow-UDF seam):
    pair counts AFTER applying the fixed merge chain
    (e,</w>) → (t,h) → (th,e</w>) — the third merge consumes symbols
    PRODUCED by the first two, so the training-order replay is what is
    being checked, not just independent substitutions.  Oracle: each
    merge as one string replace over a separator-fenced symbol
    serialization (single separator at the ends, double between
    symbols), which makes SQL's left-to-right non-overlapping replace
    EXACTLY the paper's simultaneous merge scan."""
    from lmss_entity_extractor_spark.ops.bpe import bpe_pair_counts, word_counts

    return bpe_pair_counts(
        word_counts(_t(spark, sf_dir, "documents"), "text"),
        merges=[("e", "</w>"), ("t", "h"), ("th", "e</w>")],
    )


def q_zorder_key(spark, sf_dir):
    """Z-order / Morton layout keys (ops/zorder.py): interleave
    (l_partkey, l_suppkey) into one long — a single JVM
    shift/and/or expression tree (whole-stage codegen, zero shuffle);
    range-partitioning on this key is what makes 2-D min/max file
    skipping work at 100 TB.  Oracle: the same 32-term bit arithmetic
    spelled out in SQL."""
    from lmss_entity_extractor_spark.ops.zorder import zorder_key

    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            zorder_key(["l_partkey", "l_suppkey"], bits=16).alias("zkey"),
        )
    )


def q_cube_revenue(spark, sf_dir):
    """CUBE grouping (relational surface): all four grouping sets of
    (l_returnflag, l_linestatus) in one pass with grouping_id
    distinguishing subtotal NULLs from data NULLs — Spark expands the
    cube BEFORE the hash aggregate, so it is still one combinable agg.
    Oracle: GROUP BY CUBE + GROUPING() in DuckDB (same bit order:
    first column most significant)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("gid"),
        )
    )


def q_recursive_cte(spark, sf_dir):
    """Native recursive CTE (Spark 4 WITH RECURSIVE) computing the same
    ancestor closure as the `closure` query — the iterative-join
    operator (graph/closure.py) and the engine's native recursion now
    certify each other against one oracle fixture.  Oracle: the
    identical recursion in DuckDB."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_rc_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_rc_customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("v_rc_nation")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
            SELECT 'o:' || o_orderkey AS child, 'c:' || o_custkey AS parent
            FROM v_rc_orders WHERE o_orderkey % 200 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM v_rc_customer
            UNION ALL
            SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM v_rc_nation
        ),
        closure(descendant, ancestor, depth) AS (
            SELECT child, parent, 1 FROM edges
            UNION ALL
            SELECT c.descendant, e.parent, c.depth + 1
            FROM closure c JOIN edges e ON c.ancestor = e.child
        )
        SELECT DISTINCT descendant, ancestor, depth FROM closure
        """
    )


def q_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT ingest: order rows serialized to JSON, parsed
    with parse_json into VARIANT, then path-extracted with variant_get
    (nested object + array index + typed casts) — the semi-structured
    fast path that replaces schema-on-write for ragged inputs.  Oracle:
    the source columns (extraction must be the identity on what was
    serialized)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    js = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.struct(F.col("o_totalprice").alias("p")).alias("m"),
            F.array(F.col("o_orderkey") % 7, F.col("o_orderkey") % 3).alias("tags"),
        )
    )
    v = o.select(F.parse_json(js).alias("v"))
    return v.select(
        F.variant_get("v", "$.k", "bigint").alias("o_orderkey"),
        F.variant_get("v", "$.m.p", "double").alias("o_totalprice"),
        F.variant_get("v", "$.tags[0]", "bigint").alias("tag7"),
        F.variant_get("v", "$.tags[1]", "bigint").alias("tag3"),
    )


def q_xml_roundtrip(spark, sf_dir):
    """XML ingest surface: to_xml over a struct, parsed back with
    from_xml + an explicit schema — the roundtrip identity law, same
    contract as json_roundtrip but through the XML reader.  Oracle:
    the source columns."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 40 == 0)
    xml = F.to_xml(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("c"),
            F.col("o_totalprice").alias("p"),
        )
    )
    parsed = o.select(F.from_xml(xml, "k bigint, c bigint, p double").alias("x"))
    return parsed.select(
        F.col("x.k").alias("o_orderkey"),
        F.col("x.c").alias("o_custkey"),
        F.col("x.p").alias("o_totalprice"),
    )


def q_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT: each
    sampled customer's top-2 orders by price — the SQL-native spelling
    of grouped top-k.  Oracle: an INDEPENDENT mechanism (row_number
    window + filter) in DuckDB, so the lateral decorrelation is checked
    against plain window semantics, not itself."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_lt_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_lt_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM v_lt_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM v_lt_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey % 10 = 0
        """
    )


def q_dag_levels(spark, sf_dir):
    """Topological levels (graph/toposort.py): the customer→nation→
    region→root hierarchy with SHORTCUT edges (customer→region for
    every other sampled customer) — the shortcut must LOSE to the
    longer path (longest-path leveling, not BFS): regions still level
    at 2 and root at 3.  Oracle: recursive CTE over all source-rooted
    paths, max length per node."""
    from lmss_entity_extractor_spark.graph.toposort import dag_levels

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    cn = c.join(
        _t(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey")
    )
    n = _t(spark, sf_dir, "nation")
    edges = (
        c.select(
            F.concat(F.lit("c:"), "c_custkey").alias("src"),
            F.concat(F.lit("n:"), "c_nationkey").alias("dst"),
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), "n_nationkey").alias("src"),
                F.concat(F.lit("r:"), "n_regionkey").alias("dst"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("r:"), "n_regionkey").alias("src"),
                F.lit("root").alias("dst"),
            )
        )
        .unionByName(
            cn.filter(F.col("c_custkey") % 20 == 0).select(
                F.concat(F.lit("c:"), "c_custkey").alias("src"),
                F.concat(F.lit("r:"), "n_regionkey").alias("dst"),
            )
        )
    )
    return dag_levels(edges)


def q_scc(spark, sf_dir):
    """Strongly connected components (graph/scc.py): customers point
    into a nation graph that carries five minted 5-cycles
    (n → (n+5) mod 25) — each ring must collapse to one component
    (min-id labeled) while every customer stays a singleton (one-way
    edges into a cycle don't join it).  Oracle: recursive-CTE closure +
    the same mutual-reachability min rule."""
    from lmss_entity_extractor_spark.graph.scc import strongly_connected

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    n = _t(spark, sf_dir, "nation")
    edges = c.select(
        F.concat(F.lit("c:"), "c_custkey").alias("src"),
        F.concat(F.lit("n:"), "c_nationkey").alias("dst"),
    ).unionByName(
        n.select(
            F.concat(F.lit("n:"), "n_nationkey").alias("src"),
            F.concat(F.lit("n:"), (F.col("n_nationkey") + 5) % 25).alias("dst"),
        )
    )
    return strongly_connected(edges)


def q_bgp_exists(spark, sf_dir):
    """SPARQL FILTER NOT EXISTS (graph/bgp.py bgp_filter_exists): the
    chain solutions minus those whose ?n carries an rdf:type row —
    compiled to ONE anti-join on the shared variable, never a per-row
    subquery.  (Deliberately distinct from MINUS — the disjoint-domain
    divergence is pinned in unit tests.)  Oracle: NOT EXISTS in SQL."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_filter_exists, bgp_match

    fix = _bgp_fixture(spark, sf_dir)
    sols = bgp_match(fix, [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")])
    return bgp_filter_exists(
        sols, fix, [("?n", "rdf:type", "Nation")], negate=True
    )


def q_bgp_values(spark, sf_dir):
    """SPARQL VALUES (graph/bgp.py bgp_values): the chain solutions
    constrained by an inline two-row binding table — row 1 pins ?n
    with ?c UNDEF, row 2 pins ?c with ?n UNDEF — one broadcast
    semi-join with the spec's UNDEF-passes-through compatibility.
    Oracle: the equivalent OR of the two rows' constraints."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_match, bgp_values

    fix = _bgp_fixture(spark, sf_dir)
    sols = bgp_match(fix, [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")])
    return bgp_values(sols, {"n": ["n:1", None], "c": [None, "c:10"]})


def q_bgp_reordered(spark, sf_dir):
    """Join-order optimization end-to-end (graph/bgp.py
    reorder_patterns): the bgp_match chain submitted in the WORST order
    (fattest pattern first, most selective last) is reordered by the
    per-predicate histogram and must produce the identical solution
    set — the oracle is byte-for-byte the `bgp_match` oracle."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_match, reorder_patterns

    fix = _bgp_fixture(spark, sf_dir)
    worst = [
        ("?c", "located_in", "?n"),      # fattest first
        ("?o", "placed_by", "?c"),
        ("?n", "rdf:type", "Nation"),    # most selective last
    ]
    return bgp_match(fix, reorder_patterns(fix, worst))


def q_bgp_quads(spark, sf_dir):
    """Named graphs / SPARQL GRAPH clause (graph/bgp.py
    bgp_match_quads): customers are spread across three tenant graphs
    (c_custkey mod 3) and only tenant t0 carries rdf:type rows — the
    shared ?g variable forces both patterns into the SAME graph, so
    solutions surface only where the chain AND the typing coexist.
    Oracle: the same two-pattern join with graph-name equality in SQL."""
    from lmss_entity_extractor_spark.graph.bgp import bgp_match_quads

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    quads = c.select(
        F.concat(F.lit("t"), F.col("c_custkey") % 3).alias("g"),
        F.concat(F.lit("c:"), "c_custkey").alias("s"),
        F.lit("located_in").alias("p"),
        F.concat(F.lit("n:"), "c_nationkey").alias("o"),
    ).unionByName(
        n.filter(F.col("n_regionkey") < 3).select(
            F.lit("t0").alias("g"),
            F.concat(F.lit("n:"), "n_nationkey").alias("s"),
            F.lit("rdf:type").alias("p"),
            F.lit("Nation").alias("o"),
        )
    )
    return bgp_match_quads(
        quads,
        [("?g", "?c", "located_in", "?n"), ("?g", "?n", "rdf:type", "Nation")],
    )


def q_robust_outliers(spark, sf_dir):
    """Robust per-group anomaly statistics: median + MAD (median
    absolute deviation) of extended price per return flag, and the
    count of rows beyond the 3-MAD fence — the data-quality screen
    that, unlike mean/stddev, is not dragged by the outliers it hunts.
    Exact interpolating percentile on both engines (same (a+b)/2
    arithmetic); values on the 1e-6 grid for cross-engine safety."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("x")
    )
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(x, 0.5)").alias("med")
    )
    j = li.join(med, "l_returnflag")
    mad = (
        j.withColumn("absdev", F.abs(F.col("x") - F.col("med")))
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(absdev, 0.5)").alias("mad"), F.first("med").alias("med"))
    )
    out = (
        j.join(mad.select("l_returnflag", "mad"), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.abs(F.col("x") - F.col("med")) > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers")
        )
    )

    def grid(c):
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    return mad.join(out, "l_returnflag").select(
        "l_returnflag",
        grid(F.col("med")).alias("med6"),
        grid(F.col("mad")).alias("mad6"),
        "n_outliers",
    )


def q_skew_stats(spark, sf_dir):
    """Key-skew diagnosis (the pre-flight a 100 TB join/agg runs before
    choosing salting): per-key-cardinality profile of the orders→
    customer key — n_keys, max/mean multiplicity ratio (the hot-key
    factor), and the top-3 heaviest keys — one combinable count + one
    tiny agg.  The engine's own canonicalization stage keys its salting
    decision on exactly this shape.  Oracle: same two-level aggregation
    (ratio = division of exact counts — bit-identical)."""
    counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), "o_custkey").limit(3)
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        (F.max("n") * F.count(F.lit(1)) / F.sum("n")).alias("hot_factor"),
    )
    return top.crossJoin(summary).select(
        F.col("o_custkey").alias("hot_key"),
        F.col("n").alias("hot_n"),
        "n_keys",
        "n_rows",
        "max_n",
        "hot_factor",
    )


def q_ewma(spark, sf_dir):
    """Per-conversation EWMA of turn length (ops/timeseries.py): the
    sequential recurrence e_t = (e_{t−1} + x_t)/2 computed as ONE
    window expression via its prefix-sum closed form
    (P_t + x_0)/2^{t+1} — at α = 1/2 every term is dyadic, so the
    operator is float-EXACT and needs no rounding grid.  Oracle: the
    same closed form spelled as a window sum in DuckDB (bit-identical
    doubles)."""
    from lmss_entity_extractor_spark.ops.timeseries import ewma

    t = _transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", F.length("text").cast("double").alias("chars")
    )
    return ewma(t, "conv_id", "turn_idx", "chars", alpha=0.5).select(
        "conv_id", "turn_idx", "chars", "ewma"
    )


def q_text_normalize(spark, sf_dir):
    """Unicode normalization trio (ops/textnorm.py): part names wrapped
    in HTML tags and decorated with DECOMPOSED diacritics (combining
    acute/diaeresis/ring) — strip_html (JVM regexp) must drop only real
    tags, nfc must compose the combining marks, strip_accents must fold
    them without recomposition.  Oracle: DuckDB's regexp_replace(…,'g')
    + nfc_normalize + strip_accents — an independent Unicode
    implementation (utf8proc vs Python unicodedata) agreeing
    byte-for-byte."""
    from lmss_entity_extractor_spark.ops.textnorm import (
        nfc,
        strip_accents,
        strip_html,
    )

    # decomposed on purpose: combining acute / diaeresis / ring
    deco = "\u0301 <b>Zu\u0308rich</b> A\u030A</p>"
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    raw = F.concat(F.lit("<p>"), F.col("p_name"), F.lit(" Cafe"), F.lit(deco))
    clean = nfc(strip_html(raw))
    return p.select(
        "p_partkey",
        clean.alias("nfc_text"),
        strip_accents(clean).alias("folded"),
    )


def q_property_path_neg(spark, sf_dir):
    """SPARQL 1.1 §9.2 negated property sets (graph/proppath.py
    ("neg", ...)): placed_by / !(in_state) / within — the negation
    slices out the odd-custkey customers whose location edge uses the
    in_state predicate — ALT'd with !(^(located_in|within|placed_by)),
    the inverse-negation composition (a column swap over the
    complementary slice, exactly the spec's !(^p) decomposition).
    Oracle: the two arms derived by plain predicate-complement joins."""
    from lmss_entity_extractor_spark.graph.proppath import property_path

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    triples = (
        o.select(
            F.concat(F.lit("o:"), "o_orderkey").alias("s"),
            F.lit("placed_by").alias("p"),
            F.concat(F.lit("c:"), "o_custkey").alias("o"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("c:"), "c_custkey").alias("s"),
                F.when(F.col("c_custkey") % 2 == 0, F.lit("located_in"))
                .otherwise(F.lit("in_state"))
                .alias("p"),
                F.concat(F.lit("n:"), "c_nationkey").alias("o"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n:"), "n_nationkey").alias("s"),
                F.lit("within").alias("p"),
                F.concat(F.lit("r:"), "n_regionkey").alias("o"),
            )
        )
    )
    return property_path(
        triples,
        (
            "alt",
            ("seq", "placed_by", ("neg", "in_state"), "within"),
            ("inv", ("neg", "located_in", "within", "placed_by")),
        ),
    )


def q_histogram(spark, sf_dir):
    """Feature binning / histogram: fixed-width buckets over
    l_extendedprice per return flag — the SAME floor((x−lo)/w)
    expression tree on both engines, so bucket-edge floats take
    identical IEEE paths (no width_bucket builtin whose internal
    rounding could differ by an ulp).  Out-of-range clamps to the
    sentinel buckets 0 and n+1, the ANSI width_bucket convention."""
    lo, w, n = 0.0, 5000.0, 20
    x = F.col("l_extendedprice")
    bucket = (
        F.when(x < lo, F.lit(0))
        .when(x >= lo + w * n, F.lit(n + 1))
        .otherwise(F.floor((x - lo) / w) + 1)
    ).cast("int")
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def q_corr_stats(spark, sf_dir):
    """Grouped second-moment statistics: Pearson correlation, sample
    covariance, and sample stddev of (quantity, extendedprice) per
    return flag — engines aggregate co-moments in different orders, so
    values land on the repo-standard half-up 1e-6 grid."""
    li = _t(spark, sf_dir, "lineitem")

    def grid(c):
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    return li.groupBy("l_returnflag").agg(
        grid(F.corr("l_quantity", "l_extendedprice")).alias("corr6"),
        grid(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar6"),
        grid(F.stddev("l_quantity")).alias("sd_qty6"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_json_roundtrip(spark, sf_dir):
    """JSON ingest surface: each order is serialized to a JSON document
    (to_json over a nested struct with an array field), then parsed
    back with from_json + an explicit schema and the fields projected
    out — the lossless-roundtrip law.  Oracle: the original columns
    straight from the table (the oracle never touches JSON — identity
    is the contract)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    js = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("c"),
            F.struct(F.col("o_totalprice").alias("p")).alias("m"),
            F.array(F.col("o_orderkey") % 7, F.col("o_orderkey") % 3).alias("tags"),
        )
    )
    schema = "k bigint, c bigint, m struct<p: double>, tags array<bigint>"
    parsed = o.select(F.from_json(js, schema).alias("j"))
    return parsed.select(
        F.col("j.k").alias("o_orderkey"),
        F.col("j.c").alias("o_custkey"),
        F.col("j.m.p").alias("o_totalprice"),
        F.element_at("j.tags", 1).alias("tag7"),
        F.element_at("j.tags", 2).alias("tag3"),
    )


def q_session_window(spark, sf_dir):
    """Native session windows (F.session_window — Spark's built-in
    gap-merging window operator, the same machinery streaming session
    aggregation uses) over transcripts with a MINTED burst/lull rhythm:
    turn t of a conversation fires at epoch + (t·10 + ⌊t/5⌋·120)
    minutes, so 10-minute bursts of five turns are separated by
    130-minute lulls — a 60-minute gap closes each burst into one
    session.  Oracle: independent relational derivation (lag → gap
    flag → running session id → min/max + gap), NOT session_window
    re-spelled; window.end = last event + gap per the operator's
    contract."""
    t = _transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(
                mins=(
                    F.col("turn_idx") * 10
                    + F.floor(F.col("turn_idx") / 5) * 120
                ).cast("int")
            )
        ).alias("ts"),
    )
    return (
        t.groupBy(F.session_window("ts", "60 minutes").alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_turns",
        )
    )


def q_ktruss(spark, sf_dir):
    """4-truss of the part co-purchase graph (graph/ktruss.py): edges
    kept only while they close ≥ 2 triangles among surviving edges —
    support peeling to a fixpoint (5 rounds on this fixture; the
    result is round-count-independent, so the oracle unrolls the same
    peel rule for 7 rounds — ≥ fixture depth, idempotent past
    convergence — the kcore oracle argument applied to edges)."""
    from lmss_entity_extractor_spark.graph.ktruss import ktruss

    po = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return ktruss(edges, k=4)


def q_edit_join(spark, sf_dir):
    """Blocked edit-distance self-join (ops/fuzzyjoin.py): distinct
    part names within 3 edits sharing a 2-char lowercase prefix block —
    prefix equi-join + length band + built-in levenshtein, no cross
    join (plan-asserted in tests).  Oracle: the same block/band/
    distance ladder with DuckDB's levenshtein."""
    from lmss_entity_extractor_spark.ops.fuzzyjoin import edit_distance_join

    return edit_distance_join(
        _t(spark, sf_dir, "part").select("p_name"),
        None,
        "p_name",
        max_dist=3,
        block_prefix=2,
    )


def q_ndcg(spark, sf_dir):
    """NDCG@5 (L221): per-customer order ranking by price scored
    against graded relevance rel = orderkey % 4 — discount weights
    1/log2(d+1) embedded as identical double literals in both engines,
    bounded d-ordered fold, one division."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.evalmetrics import ndcg

    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    wa = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    pred = o.select(
        F.col("o_custkey").alias("query_id"),
        F.col("o_orderkey").alias("item"),
        F.row_number().over(wa).alias("rank"),
    )
    truth = o.select(
        F.col("o_custkey").alias("query_id"),
        F.col("o_orderkey").alias("item"),
        (F.col("o_orderkey") % 4).cast("int").alias("rel"),
    )
    return ndcg(pred, truth, k=5)


def q_pettitt(spark, sf_dir):
    """Pettitt changepoint test (L222): unknown mean-shift scan per
    event type over floored values mod 7 — doubled-rank prefix sums
    keep every U_t an exact BIGINT; earliest-argmax tiebreak; the only
    float is the final 6K²/(n³+n²) tree."""
    from lmss_entity_extractor_spark.ops.changepoint import pettitt

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.col("event_id").alias("t"),
            (F.floor("value") % 7).alias("x"),
        )
    )
    return pettitt(e, ["g"], "t", "x")


def q_sign_test(spark, sf_dir):
    """Paired sign test (L223): per event type, the sign of each
    consecutive within-user value change — exact integer counts, one
    combinable agg, fixed IEEE z tree."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.stattests import sign_test

    w = Window.partitionBy("user_id").orderBy("event_id")
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").alias("x"),
        F.lead("value").over(w).alias("y"),
    )
    return sign_test(e, ["event_type"], "x", "y")


def q_mood_median(spark, sf_dir):
    """Mood's median test (L224): do the event types share a common
    median of floored values — pooled discrete median, k×2 exact
    integer cells, sorted-level ordered fold."""
    from lmss_entity_extractor_spark.ops.stattests import mood_median

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", F.floor("value").alias("v"))
    )
    return mood_median(e, [], "event_type", "v")


def q_hodges_lehmann(spark, sf_dir):
    """Hodges-Lehmann estimator (L225): robust per-user location from
    the Walsh-average lattice — exact decimal doubled sums, exact
    order-statistic median, power-of-two halving in double."""
    from lmss_entity_extractor_spark.ops.trend import hodges_lehmann

    return hodges_lehmann(
        _trend_input(spark, sf_dir).select("user_id", "value"),
        ["user_id"],
        "value",
    )


def q_ordinal_panel(spark, sf_dir):
    """Ordinal-association panel (L226): gamma / Somers' D both ways /
    Stuart's tau-c over the SAME exact pair-count grid as Kendall's
    tau-b (L199) — quantity vs price bucket per return flag."""
    from lmss_entity_extractor_spark.ops.correlation import ordinal_association

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor("l_quantity").alias("x"),
            F.floor(F.col("l_extendedprice") / 5000).alias("y"),
        )
    )
    return ordinal_association(li, ["flag"], "x", "y")


def q_v_measure(spark, sf_dir):
    """V-measure panel (L227): homogeneity/completeness/V of order
    status 'clusters' against order-priority 'labels' — composed on
    the L152 MI folds, one division per statistic."""
    from lmss_entity_extractor_spark.ops.infotheory import v_measure

    o = _t(spark, sf_dir, "orders")
    return v_measure(o, "o_orderpriority", "o_orderstatus")


def q_ljung_box(spark, sf_dir):
    """Ljung-Box Q (L228): white-noise portmanteau over lags 1..3 of
    the per-bucket event-value series — composed on the L151 ACF,
    bounded lag-ordered fold, n(n+2)·Σ fixed tree."""
    from lmss_entity_extractor_spark.ops.concentration import ljung_box

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 4).alias("bucket"), "ts", "event_id", "value"
        )
    )
    return ljung_box(e, ["bucket"], ["ts", "event_id"], "value", max_lag=3)


def q_grubbs(spark, sf_dir):
    """Grubbs max-residual test (L229): the single worst event value
    per type — exact decimal sufficient stats, order-insensitive max,
    larger-value tiebreak, fixed IEEE G tree."""
    from lmss_entity_extractor_spark.ops.stattests import grubbs_test

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    return grubbs_test(e, ["event_type"], "value")


def q_cochran_armitage(spark, sf_dir):
    """Cochran-Armitage trend (L230): is the thirds-of-orderkey
    success rate trending across quantity-decile scores per return
    flag — exact decimal score sums, one fixed z tree."""
    from lmss_entity_extractor_spark.ops.stattests import cochran_armitage

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").isNotNull())
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_quantity") / 10).alias("s"),
            (F.col("l_orderkey") % 3 == 0).cast("int").alias("y"),
        )
    )
    return cochran_armitage(li, ["flag"], "s", "y")


def q_sax(spark, sf_dir):
    """SAX symbolization (L231): 8-segment PAA + 4-letter word per
    user series — exact decimal segment sums, fixed z trees, literal
    breakpoint comparisons identical in both engines."""
    from lmss_entity_extractor_spark.ops.timeseries import sax_symbolize

    e = (
        _t(spark, sf_dir, "events")
        .filter(
            (F.col("user_id") < 8)
            & F.col("value").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select("user_id", "event_id", "value")
    )
    return sax_symbolize(e, ["user_id"], ["event_id"], "value", n_segments=8)


def q_bartlett(spark, sf_dir):
    """Bartlett's variance-equality test (L232): the normal-theory
    sharp counterpart to Brown-Forsythe (L193) on the same event-type
    levels — exact decimal level stats, three same-order folds, one
    ln-bearing fixed tree."""
    from lmss_entity_extractor_spark.ops.stattests import bartlett

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", F.floor("value").alias("v"))
    )
    return bartlett(e, [], "event_type", "v")


def q_dunn(spark, sf_dir):
    """Dunn's post-hoc pairwise rank test (L233): which event-type
    pairs differ after the L174 omnibus — doubled ranks, bounded k×k
    pair join, tie-corrected fixed z trees."""
    from lmss_entity_extractor_spark.ops.rankeval import dunn_posthoc

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", F.floor("value").alias("v"))
    )
    return dunn_posthoc(e, "event_type", "v")


def q_calinski(spark, sf_dir):
    """Calinski-Harabasz index (L234): partition geometry of the
    vec_id%5 labeling over the embedding table — micro-unit quantized
    exact sums, bounded (cluster × dim) folds, one CH tree."""
    from lmss_entity_extractor_spark.ops.clustereval import calinski_harabasz

    e = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 5).alias("cl"), "embedding"
    )
    return calinski_harabasz(e, "cl")


def q_davies_bouldin(spark, sf_dir):
    """Davies-Bouldin index (L235): worst-pair separation of the
    vec_id%5 labeling — shared micro-unit moment sums with L234,
    bounded pair folds, exact maxima."""
    from lmss_entity_extractor_spark.ops.clustereval import davies_bouldin

    e = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 5).alias("cl"), "embedding"
    )
    return davies_bouldin(e, "cl")


def q_avg_precision(spark, sf_dir):
    """Average precision @3 (L236): order-sensitive agreement of
    sign-LSH ANN (L8) against the brute-force truth (L7) — exact
    integer hit pivots, d-ordered precision chain, one final division.
    Oracle: both pipelines' oracle SQL nested as CTEs (L164 pattern)."""
    from lmss_entity_extractor_spark.ops.evalmetrics import average_precision

    pred = q_knn_lsh(spark, sf_dir)
    truth = q_knn_bruteforce(spark, sf_dir).filter(F.col("rank") <= 3)
    return average_precision(pred, truth, k=3, item_col="neighbor_id")


def q_best_split(spark, sf_dir):
    """Decision-stump best split (L237): the quantity threshold that
    best separates thirds-of-orderkey per return flag — exact prefix
    counts, fixed gini/gain trees, smallest-threshold tiebreak."""
    from lmss_entity_extractor_spark.ops.encoding import best_split

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").isNotNull())
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor("l_quantity").alias("v"),
            (F.col("l_orderkey") % 3 == 0).cast("int").alias("y"),
        )
    )
    return best_split(li, ["flag"], "v", "y")


def q_krippendorff(spark, sf_dir):
    """Krippendorff's alpha (L238): five-event units (event_id//5 —
    ids are dense, so the design is exactly balanced) rated by event
    type — exact integer D_o/D_e identity, one division."""
    from lmss_entity_extractor_spark.ops.evalmetrics import krippendorff_alpha

    e = _t(spark, sf_dir, "events").select(
        F.floor(F.col("event_id") / 5).alias("unit"),
        F.col("event_type").alias("val"),
    )
    return krippendorff_alpha(e, "unit", "val")


def q_mantel_haenszel(spark, sf_dir):
    """Mantel-Haenszel pooled 2×2 (L239): quantity>25 exposure vs
    thirds-of-orderkey outcome stratified by return flag — exact
    integer cells, sorted-stratum folds, fixed OR/χ² trees."""
    from lmss_entity_extractor_spark.ops.stattests import mantel_haenszel

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").isNotNull())
        .select(
            F.col("l_returnflag").alias("s"),
            (F.col("l_quantity") > 25).cast("int").alias("e"),
            (F.col("l_orderkey") % 3 == 0).cast("int").alias("y"),
        )
    )
    return mantel_haenszel(li, "s", "e", "y")


def q_cronbach(spark, sf_dir):
    """Cronbach's alpha (L240): internal consistency of four lineitem
    'items' — one combinable agg of exact decimal sufficient stats,
    item-order folds, one alpha tree."""
    from lmss_entity_extractor_spark.ops.evalmetrics import cronbach_alpha

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor("l_quantity").alias("i0"),
        (F.col("l_orderkey") % 7).alias("i1"),
        (F.col("l_partkey") % 7).alias("i2"),
        (F.col("l_suppkey") % 7).alias("i3"),
    )
    return cronbach_alpha(li, ["i0", "i1", "i2", "i3"])


_FS_PARAMS = {"brand": (0.9, 0.1), "type": (0.8, 0.3), "size": (0.7, 0.2)}


def q_fellegi_sunter(spark, sf_dir):
    """Fellegi-Sunter linkage score (L241): consecutive-key part
    pairs with three agreement fields — literal log-weight chain in
    field order, zero-shuffle scorer over the pair table."""
    from lmss_entity_extractor_spark.ops.blocking import fellegi_sunter_score

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    a = p.select(*[F.col(c).alias(f"a_{c}") for c in p.columns])
    b = p.select(*[F.col(c).alias(f"b_{c}") for c in p.columns])
    pairs = a.join(
        b, F.col("a_p_partkey") + 1 == F.col("b_p_partkey")
    ).select(
        F.col("a_p_partkey").alias("id_a"),
        F.col("b_p_partkey").alias("id_b"),
        (F.col("a_p_brand") == F.col("b_p_brand")).alias("agree_brand"),
        (F.col("a_p_type") == F.col("b_p_type")).alias("agree_type"),
        (F.col("a_p_size") == F.col("b_p_size")).alias("agree_size"),
    )
    return fellegi_sunter_score(pairs, _FS_PARAMS)


def q_soundex(spark, sf_dir):
    """Soundex blocking keys (L242): phonetic key histogram over part
    names — the whole algorithm ONE generated SQL expression shared
    verbatim (minus the regexp flag) with the DuckDB oracle."""
    from lmss_entity_extractor_spark.ops.phonetic import add_soundex

    p = _t(spark, sf_dir, "part").select("p_name")
    return add_soundex(p, "p_name").groupBy("soundex").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("p_name").alias("n_names"),
    )


def q_ks_uniform(spark, sf_dir):
    """One-sample KS vs Uniform(0,99) (L243): are floored event
    values mod 100 uniformly allocated per type — exact decimal CDF
    numerators, tie-correct jump candidates, order-insensitive max."""
    from lmss_entity_extractor_spark.ops.rankeval import ks_uniform

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", (F.floor("value") % 100).alias("x"))
    )
    return ks_uniform(e, ["event_type"], "x", "0", "99")


def q_anderson_darling(spark, sf_dir):
    """Two-sample Anderson-Darling (L244): click vs view value
    distributions per user-parity bucket — tie-corrected exact
    integer mid-cumulatives, fixed cell trees, ordered folds."""
    from lmss_entity_extractor_spark.ops.rankeval import anderson_darling_2samp

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("bucket"),
            "event_type",
            F.floor("value").alias("x"),
        )
    )
    return anderson_darling_2samp(
        e, ["bucket"], "event_type", "click", "view", "x"
    )


def q_page_trend(spark, sf_dir):
    """Page's L trend test (L245): does extended price trend with
    line number within orders — the ordered-alternatives sharpening
    of the L190 Friedman input, doubled block ranks, one z tree."""
    from lmss_entity_extractor_spark.ops.rankeval import page_trend

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 3).alias("grp"),
        F.col("l_orderkey").alias("b"),
        F.col("l_linenumber").alias("t"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
    )
    return page_trend(li, ["grp"], "b", "t", "v")


def q_capture_recapture(spark, sf_dir):
    """Chapman capture-recapture (L246): estimate the customer
    universe from two independent deterministic order 'passes' —
    exact distinct/overlap counts, fixed estimator trees."""
    from lmss_entity_extractor_spark.ops.sketches import capture_recapture

    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_custkey").alias("id")
    )
    b = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_custkey").alias("id")
    )
    return capture_recapture(a, b, "id")


def q_kendalls_w(spark, sf_dir):
    """Kendall's W (L247): rater concordance over the L190 input —
    the W = Q/(m(k−1)) identity on the tie-corrected Friedman Q, one
    extra division."""
    from lmss_entity_extractor_spark.ops.rankeval import kendalls_w

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 3).alias("grp"),
        F.col("l_orderkey").alias("b"),
        F.col("l_linenumber").alias("t"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
    )
    return kendalls_w(li, ["grp"], "b", "t", "v")


def q_hellinger(spark, sf_dir):
    """Hellinger/Bhattacharyya (L248): click vs view floored-value
    distributions per user-parity bucket — exact cells, bounded
    sqrt-term folds, [0,1]-bounded metric."""
    from lmss_entity_extractor_spark.ops.infotheory import hellinger_distance

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("bucket"),
            "event_type",
            F.floor("value").alias("x"),
        )
    )
    return hellinger_distance(e, ["bucket"], "event_type", "click", "view", "x")


def q_topk_churn(spark, sf_dir):
    """Top-10 churn (L249): leaderboard turnover of the most active
    users across event-id hectobuckets (/100 keeps ≥10 periods at
    every sf incl. 0.001) — exact overlap counts, one jaccard
    division, dense-rank period pairing."""
    from lmss_entity_extractor_spark.ops.evalmetrics import topk_churn

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id").isNotNull() & F.col("user_id").isNotNull())
        .groupBy(
            F.floor(F.col("event_id") / 100).alias("p"),
            F.col("user_id").alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("s"))
    )
    return topk_churn(e, "p", "item", "s", k=10)


def q_poisson_rate(spark, sf_dir):
    """Two-sample Poisson rate test (L250): click vs view event
    intensity with per-row synthetic exposures — exact count/decimal
    sums, conditional binomial z, fixed trees."""
    from lmss_entity_extractor_spark.ops.stattests import poisson_rate_test

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor("value").alias("c"),
            (F.col("user_id") % 7 + 1).alias("t"),
        )
    )
    return poisson_rate_test(e, [], "event_type", "click", "view", "c", "t")


def q_bowker(spark, sf_dir):
    """Bowker symmetry test (L251): are within-user event-type
    transitions balanced — exact paired cells, bounded (i<j) pair
    fold, skip-empty-pair dof convention."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.evalmetrics import bowker_symmetry

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        _t(spark, sf_dir, "events")
        .select("event_type", F.lead("event_type").over(w).alias("next_type"))
    )
    return bowker_symmetry(e, [], "event_type", "next_type")


def q_g_test(spark, sf_dir):
    """Likelihood-ratio G-test (L252): order priority vs status —
    the additive contingency test, G = 2N·MI identity pinned against
    L152; observed cells, ln trees, sorted-cell fold."""
    from lmss_entity_extractor_spark.ops.stattests import g_test

    o = _t(spark, sf_dir, "orders")
    return g_test(o, "o_orderpriority", "o_orderstatus")


def q_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative hazard (L254): the additive sibling of
    the L159 KM curve on the same cohort fixture — d/n increments and
    d/n² variances as t-sorted bounded prefix folds."""
    from lmss_entity_extractor_spark.ops.survival import nelson_aalen

    return nelson_aalen(
        _survival_input(spark, sf_dir), ["cohort"], "dur", "event"
    )


def q_morans_i(spark, sf_dir):
    """Moran's I (L253): spatial autocorrelation of floored account
    balances over the L212 synthetic customer points — floored-mean
    centring keeps every pair sum an exact decimal, one δ division,
    fixed correction trees."""
    from lmss_entity_extractor_spark.ops.geo import morans_i

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 5 == 0)
        .select(
            F.col("c_custkey").alias("id"),
            (
                ((F.col("c_custkey") * 37) % 18000).cast("double")
                / F.lit(100.0)
                - F.lit(90.0)
            ).alias("lat"),
            (
                ((F.col("c_custkey") * 73) % 36000).cast("double")
                / F.lit(100.0)
                - F.lit(180.0)
            ).alias("lon"),
            F.floor("c_acctbal").alias("v"),
        )
    )
    return morans_i(c, "id", "lat", "lon", "v", cell_deg=5.0)


def q_icc(spark, sf_dir):
    """One-way ICC(1,1) (L255): how user-clustered are floored event
    values — exact decimal per-unit stats, bounded sorted-unit fold,
    unbalanced k₀ correction, fixed trees."""
    from lmss_entity_extractor_spark.ops.stattests import icc_oneway

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.floor("value").alias("v"))
    )
    return icc_oneway(e, [], "user_id", "v")


def q_tukey(spark, sf_dir):
    """Tukey-Kramer HSD pairs (L256): which event-type means differ
    after the L215 omnibus — exact decimal level stats, bounded MSW
    fold, one fixed q tree per ordered pair."""
    from lmss_entity_extractor_spark.ops.stattests import tukey_hsd

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", F.floor("value").alias("v"))
    )
    return tukey_hsd(e, [], "event_type", "v")


def q_diversity(spark, sf_dir):
    """Diversity panel (L257): event-type composition per user-parity
    bucket — exact cells, bounded ln folds, order-insensitive max."""
    from lmss_entity_extractor_spark.ops.concentration import diversity_indices

    e = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("bucket"), "event_type"
    )
    return diversity_indices(e, ["bucket"], "event_type")


def q_cumulative_incidence(spark, sf_dir):
    """Aalen-Johansen CIF (L258): two competing causes on the L159
    duration fixture — all-cause KM prefix products feeding per-cause
    d/n increments, nested bounded folds."""
    from lmss_entity_extractor_spark.ops.survival import cumulative_incidence

    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        ((F.max("event_id") - F.min("event_id")) % 30).alias("dur")
    )
    d = u.select(
        (F.col("user_id") % 2).alias("cohort"),
        "dur",
        F.when(F.col("user_id") % 5 == 0, 0)
        .otherwise((F.col("user_id") % 3) % 2 + 1)
        .alias("cause"),
    )
    return cumulative_incidence(d, ["cohort"], "dur", "cause")


def q_gk_lambda(spark, sf_dir):
    """Goodman-Kruskal λ (L259): PRE association of order priority vs
    status — exact integer cell/margin maxima, one division each way,
    fold-free."""
    from lmss_entity_extractor_spark.ops.infotheory import gk_lambda

    o = _t(spark, sf_dir, "orders")
    return gk_lambda(o, "o_orderpriority", "o_orderstatus")


def q_theils_u(spark, sf_dir):
    """Theil's U (L260): asymmetric normalized MI on the L152 input —
    one extra division each direction."""
    from lmss_entity_extractor_spark.ops.infotheory import theils_u

    o = _t(spark, sf_dir, "orders")
    return theils_u(o, "o_orderpriority", "o_orderstatus")


def q_interevent(spark, sf_dir):
    """Inter-event panel (L261): arrival burstiness per event type —
    exact µs gaps (multiset invariant under tie order), decimal
    sufficient stats, CV and Goh-Barabási B trees."""
    from lmss_entity_extractor_spark.ops.timeseries import interevent_stats

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_type", "ts")
    )
    return interevent_stats(e, ["event_type"], "ts")


def q_dispersion(spark, sf_dir):
    """Dispersion index (L262): are per-user event counts Poisson-like
    within each type — exact integer counts, one VMR tree."""
    from lmss_entity_extractor_spark.ops.concentration import dispersion_index

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return dispersion_index(e, ["event_type"], "c")


def q_chi2_residuals(spark, sf_dir):
    """Adjusted cell residuals (L263): which priority×status cells
    drive the L140 association — per-cell fixed trees on the exact
    cell/margin pipeline, no folds."""
    from lmss_entity_extractor_spark.ops.stattests import chi2_residuals

    o = _t(spark, sf_dir, "orders")
    return chi2_residuals(o, "o_orderpriority", "o_orderstatus")


def q_cvm(spark, sf_dir):
    """Cramér-von Mises 2-sample (L264): click vs view floored
    values per user-parity bucket — cross-multiplied exact integer
    gap terms, one bounded fold, one division."""
    from lmss_entity_extractor_spark.ops.rankeval import cramer_von_mises_2samp

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("bucket"),
            "event_type",
            F.floor("value").alias("x"),
        )
    )
    return cramer_von_mises_2samp(
        e, ["bucket"], "event_type", "click", "view", "x"
    )


def q_hoover(spark, sf_dir):
    """Hoover index (L265): what share of account-balance mass per
    segment would have to move to equalize — cross-multiplied exact
    decimal deviations, one division."""
    from lmss_entity_extractor_spark.ops.concentration import hoover_index

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.greatest(F.col("c_acctbal"), F.lit(0)).alias("v"),
    )
    return hoover_index(c, ["seg"], "v")


def q_jarque_bera(spark, sf_dir):
    """Jarque-Bera (L266): is order value per priority normal —
    exact integer micro-unit power sums, one fixed moment tree."""
    from lmss_entity_extractor_spark.ops.stattests import jarque_bera

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"), "o_totalprice"
    )
    return jarque_bera(o, ["pri"], "o_totalprice")


def q_inequality(spark, sf_dir):
    """Inequality panel (L267): Theil T/L + Atkinson of positive
    account balances per segment — bounded sorted-cell ln folds."""
    from lmss_entity_extractor_spark.ops.concentration import (
        inequality_indices,
    )

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_mktsegment").alias("seg"), "c_acctbal")
    )
    return inequality_indices(c, ["seg"], "c_acctbal")


def q_brunner_munzel(spark, sf_dir):
    """Brunner-Munzel (L268): click vs view floored values per
    user-parity bucket — exact doubled-midrank sums, one fixed
    tree."""
    from lmss_entity_extractor_spark.ops.rankeval import brunner_munzel

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("bucket"),
            "event_type",
            F.floor("value").alias("x"),
        )
    )
    return brunner_munzel(e, ["bucket"], "event_type", "click", "view", "x")


def q_ansari(spark, sf_dir):
    """Ansari-Bradley (L269): click vs view dispersion per
    user-mod-3 bucket — exact doubled block score-sums, bounded
    folds."""
    from lmss_entity_extractor_spark.ops.rankeval import ansari_bradley

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 3).alias("bucket"),
            "event_type",
            F.floor("value").alias("x"),
        )
    )
    return ansari_bradley(e, ["bucket"], "event_type", "click", "view", "x")


def q_breusch_pagan(spark, sf_dir):
    """Breusch-Pagan (L270): does price-residual variance grow with
    quantity per returnflag — 14 exact mixed micro-unit moments, one
    shared-text polynomial tree."""
    from lmss_entity_extractor_spark.ops.regression import breusch_pagan

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_quantity",
        "l_extendedprice",
    )
    return breusch_pagan(li, ["flag"], "l_quantity", "l_extendedprice")


def q_quade(spark, sf_dir):
    """Quade test (L271): range-weighted ranked complete-block ANOVA
    of per-(custkey-bucket) order revenue across priorities — exact
    quarter-unit scores."""
    from lmss_entity_extractor_spark.ops.rankeval import quade_test

    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (F.col("o_custkey") % 2).alias("bucket"),
            (F.col("o_custkey") % 40).alias("blk"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("v")
        )
    )
    return quade_test(o, ["bucket"], "blk", "trt", "v")


def q_holt(spark, sf_dir):
    """Holt linear smoothing (L272) of exact daily event revenue per
    user-parity bucket — bounded in-array fold, recursive-CTE
    oracle."""
    from lmss_entity_extractor_spark.ops.timeseries import holt_linear

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).alias("bucket"),
            F.unix_date(F.to_date("ts")).alias("t"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )
    return holt_linear(daily, ["bucket"], "t", "v", alpha=0.5, beta=0.3)


def _daily_series(spark, sf_dir):
    """Exact daily event revenue per user-parity bucket — the shared
    series for the L272-L274 forecasting family."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).alias("bucket"),
            F.unix_date(F.to_date("ts")).alias("t"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )


def q_yule_walker(spark, sf_dir):
    """Yule-Walker AR(3) + PACF (L273) of the daily revenue series —
    Durbin-Levinson fold over exact L151 ACF values; recursive-CTE
    oracle carries LIST state through the identical per-step tree."""
    from lmss_entity_extractor_spark.ops.timeseries import ar_yule_walker

    return ar_yule_walker(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v", p=3
    )


def q_periodogram(spark, sf_dir):
    """Periodogram power at candidate weekly periods (L274) of the
    daily revenue series — order-pinned in-array cos/sin folds."""
    from lmss_entity_extractor_spark.ops.timeseries import periodogram

    return periodogram(
        _daily_series(spark, sf_dir), ["bucket"], "t", "v",
        periods=[7, 14],
    )


def q_rmst(spark, sf_dir):
    """Restricted mean survival time (L275): mean days-into-month
    until shipment over a 20-day horizon per linestatus, returned
    lines treated as censored — bounded KM-grid fold, list-encoded-
    accumulator oracle."""
    from lmss_entity_extractor_spark.ops.survival import rmst

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linestatus").alias("st"),
        (F.dayofmonth("l_shipdate") - 1).alias("dur"),
        (F.col("l_returnflag") != "R").cast("int").alias("ev"),
    )
    return rmst(li, ["st"], "dur", "ev", tau=20.0)


def q_cox_stuart(spark, sf_dir):
    """Cox-Stuart trend test (L276): is daily revenue drifting per
    bucket — half-offset sign pairs via one exact integer equi-join."""
    from lmss_entity_extractor_spark.ops.trend import cox_stuart

    return cox_stuart(_daily_series(spark, sf_dir), ["bucket"], ["t"], "v")


def q_stuart_maxwell(spark, sf_dir):
    """Stuart-Maxwell 3×3 (L277): did per-customer order status shift
    between first and last order — doubled off-diagonal means keep
    the closed form all-integer."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.evalmetrics import (
        stuart_maxwell_3,
    )

    o = _t(spark, sf_dir, "orders")
    wf = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    wl = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    tagged = o.select(
        "o_custkey",
        "o_orderstatus",
        F.row_number().over(wf).alias("_rf"),
        F.row_number().over(wl).alias("_rl"),
    )
    first = tagged.filter(F.col("_rf") == 1).select(
        "o_custkey", F.col("o_orderstatus").alias("b")
    )
    last = tagged.filter(F.col("_rl") == 1).select(
        "o_custkey", F.col("o_orderstatus").alias("a")
    )
    paired = first.join(last, "o_custkey").select(
        (F.col("o_custkey") % 2).alias("bucket"), "b", "a"
    )
    return stuart_maxwell_3(paired, ["bucket"], "b", "a")


def q_bartels(spark, sf_dir):
    """Bartels rank von Neumann (L278): is daily revenue serially
    random per bucket — all-integer doubled-midrank sums, one
    division."""
    from lmss_entity_extractor_spark.ops.rankeval import bartels_rank_test

    return bartels_rank_test(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v"
    )


def q_turning_points(spark, sf_dir):
    """Turning-points test (L279): local-extrema count of the daily
    revenue series vs the randomness expectation — one window pass."""
    from lmss_entity_extractor_spark.ops.trend import turning_points

    return turning_points(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v"
    )


def q_croston(spark, sf_dir):
    """Croston's method (L280): intermittent daily high-value-signup
    demand per bucket, zero-filled over the full day grid — twin SES
    folds over (size, interval)."""
    from lmss_entity_extractor_spark.ops.timeseries import croston

    e = _t(spark, sf_dir, "events")
    days = e.select(F.to_date("ts").alias("d")).distinct()
    buckets = e.select((F.col("user_id") % 2).alias("bucket")).distinct()
    hits = (
        e.filter((F.col("event_type") == "signup") & (F.col("value") > 300))
        .groupBy(
            (F.col("user_id") % 2).alias("bucket"),
            F.to_date("ts").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    full = (
        days.crossJoin(buckets)
        .join(hits, ["bucket", "d"], "left")
        .select(
            "bucket",
            F.unix_date("d").alias("t"),
            F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("x"),
        )
    )
    return croston(full, ["bucket"], "t", "x", alpha=0.2)


def q_theta(spark, sf_dir):
    """Theta method (L281): one-step forecast of daily revenue —
    exact-position OLS + SES fold over the theta-2 line."""
    from lmss_entity_extractor_spark.ops.timeseries import theta_forecast

    return theta_forecast(
        _daily_series(spark, sf_dir), ["bucket"], "t", "v", alpha=0.5
    )


def q_spectral_entropy(spark, sf_dir):
    """Spectral entropy (L282): forecastability of daily revenue —
    periodogram over the full Fourier grid, staged power array."""
    from lmss_entity_extractor_spark.ops.timeseries import (
        spectral_entropy,
    )

    return spectral_entropy(
        _daily_series(spark, sf_dir), ["bucket"], "t", "v"
    )


def q_msprt(spark, sf_dir):
    """mSPRT always-valid p (L283): click vs view value per bucket —
    exact decimal sufficient stats, one Λ tree."""
    from lmss_entity_extractor_spark.ops.effectsize import msprt_normal

    e = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("bucket"), "event_type", "value"
    )
    return msprt_normal(
        e, ["bucket"], "event_type", "click", "view", "value", tau=10.0
    )


def q_eb_shrink(spark, sf_dir):
    """EB beta-binomial shrinkage (L284): per-part-bucket return
    rates shrunk toward the fitted Beta prior — bounded key-grid
    folds."""
    from lmss_entity_extractor_spark.ops.encoding import eb_beta_binomial

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_suppkey") % 2).alias("bucket"),
        (F.col("l_partkey") % 100).alias("pkey"),
        (F.col("l_returnflag") == "R").cast("long").alias("ret"),
        F.lit(1).cast("long").alias("one"),
    )
    return eb_beta_binomial(li, ["bucket"], "pkey", "ret", "one")


def q_seasonal_strength(spark, sf_dir):
    """Seasonal/trend strength (L285): how much of the L163
    decomposition's variation each component explains — shared-n
    squared-deviation folds, no per-component divisions."""
    from lmss_entity_extractor_spark.ops.seasonal import seasonal_strength

    e = (
        _t(spark, sf_dir, "events")
        .filter((F.col("user_id") < 8) & F.col("value").isNotNull())
        .select("user_id", "event_id", "value")
    )
    return seasonal_strength(e, ["user_id"], "event_id", "value", period=7)


def q_quantile_loss(spark, sf_dir):
    """Pinball loss + coverage (L286): score the crude quantity-based
    price quantile predictor per returnflag — exact integer-percent
    cross-multiplied loss terms, ONE division."""
    from lmss_entity_extractor_spark.ops.calibration import quantile_loss

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_extendedprice",
        (F.col("l_quantity") * 1050).alias("pred"),
    )
    return quantile_loss(
        li, ["flag"], "l_extendedprice", "pred", q_pct=75
    )


def q_dickey_fuller(spark, sf_dir):
    """Dickey-Fuller (L287): is daily revenue a random walk — one lag
    window, exact decimal OLS sums, one t tree."""
    from lmss_entity_extractor_spark.ops.timeseries import dickey_fuller

    return dickey_fuller(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v"
    )


def q_harrell_c(spark, sf_dir):
    """Harrell's C (L288): does discount rank ship-day outcomes per
    order bucket, returns censored — bounded in-row pair lattice,
    exact counts."""
    from lmss_entity_extractor_spark.ops.survival import harrell_c

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 500).alias("grp"),
        (F.dayofmonth("l_shipdate") - 1).alias("dur"),
        (F.col("l_returnflag") != "R").cast("int").alias("ev"),
        F.col("l_discount").alias("risk"),
    )
    return harrell_c(li, ["grp"], "dur", "ev", "risk")


def q_granger(spark, sf_dir):
    """Granger causality (L289): does yesterday's view revenue lead
    today's click revenue per bucket — nine exact decimal sums, one
    Cramer tree."""
    from lmss_entity_extractor_spark.ops.timeseries import granger_1lag

    dec = "decimal(18,2)"
    d2 = (
        _t(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(["click", "view"])
        )
        .groupBy(
            (F.col("user_id") % 2).alias("bucket"),
            F.unix_date(F.to_date("ts")).alias("t"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "click",
                        F.col("value").cast(dec),
                    )
                ),
                F.lit(0).cast(dec),
            ).alias("y"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "view",
                        F.col("value").cast(dec),
                    )
                ),
                F.lit(0).cast(dec),
            ).alias("x"),
        )
    )
    return granger_1lag(d2, ["bucket"], ["t"], "y", "x")


def q_arch_lm(spark, sf_dir):
    """ARCH(1) LM (L290): volatility clustering of daily revenue per
    bucket — exact integer micro-unit centred squares, one R² tree."""
    from lmss_entity_extractor_spark.ops.timeseries import arch_lm

    return arch_lm(_daily_series(spark, sf_dir), ["bucket"], ["t"], "v")


def q_var_backtest(spark, sf_dir):
    """VaR backtest (L291): daily revenue vs an 85%-of-mean floor per
    bucket — exact exception/transition counts, fixed ln trees."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.calibration import var_backtest

    daily = _daily_series(spark, sf_dir)
    wb = Window.partitionBy("bucket")
    d2 = daily.select(
        "bucket",
        "t",
        F.col("v").cast("double").alias("x"),
        (
            F.lit(0.85)
            * (
                F.sum("v").over(wb).cast("double")
                / F.count(F.lit(1)).over(wb).cast("double")
            )
        ).alias("var_floor"),
    )
    return var_backtest(d2, ["bucket"], ["t"], "x", "var_floor", p=0.1)


def q_entropy_rate(spark, sf_dir):
    """Markov entropy rate (L292): next-event predictability of the
    per-user event-type chain — exact cells, one bounded fold."""
    from lmss_entity_extractor_spark.ops.markov import markov_entropy_rate

    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return markov_entropy_rate(e, "user_id", "event_type", ["ts", "event_id"])


def q_meta_pool(spark, sf_dir):
    """Meta-analysis pooling (L293): per-nation mean account balance
    pooled per region — fixed + DerSimonian-Laird random effects on
    order-pinned weight folds."""
    from lmss_entity_extractor_spark.ops.effectsize import meta_pool

    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey", F.col("c_acctbal").cast("decimal(18,2)").alias("x")
    )
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_regionkey").alias("region"),
    )
    stats = (
        c.join(F.broadcast(n), "c_nationkey")
        .groupBy("region", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("q"),
        )
    )
    nd = F.col("n").cast("double")
    sd_ = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    var = (nd * qd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    eff = stats.select(
        "region",
        (sd_ / nd).alias("effect"),
        F.sqrt(var / nd).alias("se"),
    )
    return meta_pool(eff, ["region"], "effect", "se")


def q_km_ci(spark, sf_dir):
    """KM + Greenwood bands (L294): the L159 curve with plain-scale
    confidence bands — prefix folds for both S and the Greenwood
    sum, NULL bands after the risk set exhausts."""
    from lmss_entity_extractor_spark.ops.survival import kaplan_meier_ci

    return kaplan_meier_ci(
        _survival_input(spark, sf_dir), ["cohort"], "dur", "event"
    )


def q_seasonal_mk(spark, sf_dir):
    """Seasonal Mann-Kendall (L295): weekday-phase trend in daily
    revenue — per-phase pair lattices, exact combined S, fold-pinned
    combined Var."""
    from lmss_entity_extractor_spark.ops.trend import seasonal_mann_kendall

    return seasonal_mann_kendall(
        _daily_series(spark, sf_dir), ["bucket"], "t", "v", period=7
    )


def q_lorenz(spark, sf_dir):
    """Lorenz curve points (L296): decile value shares of account
    balances per segment — one window pass, exact decimal cumsums."""
    from lmss_entity_extractor_spark.ops.concentration import lorenz_points

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.greatest(F.col("c_acctbal"), F.lit(0)).alias("v"),
    )
    return lorenz_points(c, ["seg"], "v", n_points=10)


def _hourly_series(spark, sf_dir):
    """Exact hourly event revenue per user-parity bucket — the longer
    series for the L297/L298 complexity family (~720 points)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).alias("bucket"),
            F.floor(F.unix_timestamp("ts") / 3600)
            .cast("long")
            .alias("t"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )


def q_rs(spark, sf_dir):
    """R/S analysis (L297): mean rescaled range of hourly revenue at
    block sizes 8..64 — per-block (cum, max, min) scans inside the
    packed array."""
    from lmss_entity_extractor_spark.ops.complexity import rs_analysis

    return rs_analysis(
        _hourly_series(spark, sf_dir), ["bucket"], "t", "v",
        block_sizes=(8, 16, 32, 64),
    )


def q_hurst(spark, sf_dir):
    """Hurst exponent (L297 composed on L135): slope of ln(R/S) on
    ln(m) via the exact-decimal grouped OLS — the one-job-per-op
    composition."""
    from lmss_entity_extractor_spark.ops.regression import grouped_linreg

    rs = q_rs(spark, sf_dir).filter(
        F.col("rs_mean").isNotNull() & (F.col("rs_mean") > 0)
    )
    pts = rs.select(
        "bucket",
        F.log(F.col("m").cast("double")).alias("lx"),
        F.log("rs_mean").alias("ly"),
    )
    return grouped_linreg(pts, ["bucket"], "lx", "ly", scale=6)


def q_pentropy(spark, sf_dir):
    """Permutation entropy (L298): ordinal-pattern complexity of the
    hourly revenue series — exact pattern cells, one bounded fold."""
    from lmss_entity_extractor_spark.ops.complexity import (
        permutation_entropy,
    )

    return permutation_entropy(
        _hourly_series(spark, sf_dir), ["bucket"], ["t"], "v"
    )


def q_cusum_squares(spark, sf_dir):
    """CUSUM-of-squares (L299): where did daily revenue volatility
    shift per bucket — exact micro-unit square prefix sums, one
    deterministic argmax pick."""
    from lmss_entity_extractor_spark.ops.changepoint import cusum_squares

    return cusum_squares(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v"
    )


def q_energy(spark, sf_dir):
    """Energy distance (L300): click vs view value distributions per
    bucket (bounded user slice) — exact |difference| pair lattices
    folded in-array."""
    from lmss_entity_extractor_spark.ops.rankeval import energy_distance

    e = (
        _t(spark, sf_dir, "events")
        .filter((F.col("user_id") < 30) & F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("bucket"),
            "event_type",
            "value",
        )
    )
    return energy_distance(
        e, ["bucket"], "event_type", "click", "view", "value",
        max_len=20000,
    )


def q_dcor(spark, sf_dir):
    """Distance correlation (L301): any-form dependence between
    daily click and view revenue per bucket — double-centred distance
    folds inside the packed array."""
    from lmss_entity_extractor_spark.ops.correlation import (
        distance_correlation,
    )

    dec = "decimal(18,2)"
    d2 = (
        _t(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(["click", "view"])
        )
        .groupBy(
            (F.col("user_id") % 2).alias("bucket"),
            F.unix_date(F.to_date("ts")).alias("t"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "click",
                        F.col("value").cast(dec),
                    )
                ),
                F.lit(0).cast(dec),
            ).alias("y"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "view",
                        F.col("value").cast(dec),
                    )
                ),
                F.lit(0).cast(dec),
            ).alias("x"),
        )
    )
    return distance_correlation(d2, ["bucket"], "y", "x")


def q_cucconi(spark, sf_dir):
    """Cucconi test (L302): joint location-scale click vs view shift
    per bucket — exact doubled-rank square sums, one C tree."""
    from lmss_entity_extractor_spark.ops.rankeval import cucconi_test

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("bucket"),
            "event_type",
            F.floor("value").alias("x"),
        )
    )
    return cucconi_test(e, ["bucket"], "event_type", "click", "view", "x")


def q_dtw(spark, sf_dir):
    """DTW distance (L303): elastic similarity of the two buckets'
    daily revenue curves — the DP recurrence as a LIST-accumulator
    fold, no table materialized."""
    from lmss_entity_extractor_spark.ops.complexity import dtw_distance

    return dtw_distance(
        _daily_series(spark, sf_dir), [], "bucket", 0, 1, "t", "v"
    )


def q_gini_jk(spark, sf_dir):
    """Jackknife Gini SE (L304): is segment balance concentration
    statistically distinguishable — exact rank-shift LOO identity,
    zero refits."""
    from lmss_entity_extractor_spark.ops.concentration import (
        gini_jackknife,
    )

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.greatest(F.col("c_acctbal"), F.lit(0)).alias("v"),
    )
    return gini_jackknife(c, ["seg"], "v")


def _label_score(spark, sf_dir):
    """Binary (is-purchase, floored-value) label/score frame for the
    L305/L306 classifier-eval pair."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("bucket"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
            F.floor("value").cast("double").alias("s"),
        )
    )


def q_youden(spark, sf_dir):
    """Youden J cutpoint (L305): where to threshold value to predict
    purchases — exact grid counts, deterministic argmax pick."""
    from lmss_entity_extractor_spark.ops.rankeval import youden_cutpoint

    return youden_cutpoint(_label_score(spark, sf_dir), ["bucket"], "y", "s")


def q_pr_auc(spark, sf_dir):
    """PR-AUC (L306): step-interpolated average precision of the
    value-predicts-purchase score — exact grid, order-pinned AP fold."""
    from lmss_entity_extractor_spark.ops.rankeval import pr_auc

    return pr_auc(_label_score(spark, sf_dir), ["bucket"], "y", "s")


def q_seasonal_ts(spark, sf_dir):
    """Seasonal Theil-Sen (L307): robust weekday-phase trend rate of
    daily revenue — pooled within-phase slope median."""
    from lmss_entity_extractor_spark.ops.trend import seasonal_theil_sen

    return seasonal_theil_sen(
        _daily_series(spark, sf_dir), ["bucket"], "t", "v", period=7
    )


def q_records(spark, sf_dir):
    """Records test (L308): are daily revenue record highs arriving
    faster than exchangeability allows — one running-max window,
    harmonic moment folds."""
    from lmss_entity_extractor_spark.ops.trend import records_test

    return records_test(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v"
    )


def q_gumbel(spark, sf_dir):
    """Gumbel return levels (L309): the once-per-10/100-day daily
    peak event value per bucket — MoM fit on exact sums, one tree per
    period."""
    from lmss_entity_extractor_spark.ops.extremes import gumbel_fit

    dmax = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).alias("bucket"),
            F.to_date("ts").alias("d"),
        )
        .agg(F.max(F.col("value").cast("decimal(18,2)")).alias("mx"))
    )
    return gumbel_fit(dmax, ["bucket"], "mx", return_periods=(10, 100))


def q_hill(spark, sf_dir):
    """Hill tail index (L310): how heavy is the event-value upper
    tail per bucket — top-51 order stats, one ln fold."""
    from lmss_entity_extractor_spark.ops.extremes import hill_estimator

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0))
        .select((F.col("user_id") % 2).alias("bucket"), "value")
    )
    return hill_estimator(e, ["bucket"], "value", k=50)


def q_gpd(spark, sf_dir):
    """GPD peaks-over-threshold (L311): once-per-T event-value levels
    from exceedances over 300 per bucket — exact exceedance sums, one
    tree per period."""
    from lmss_entity_extractor_spark.ops.extremes import gpd_pot

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select((F.col("user_id") % 2).alias("bucket"), "value")
    )
    return gpd_pot(
        e, ["bucket"], "value", threshold=300.0,
        return_periods=(1000, 10000),
    )


def q_var_es(spark, sf_dir):
    """Historical VaR + ES (L312): the 5% worst daily revenue days'
    threshold and mean per bucket — one descending window pass."""
    from lmss_entity_extractor_spark.ops.extremes import hist_var_es

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select((F.col("user_id") % 2).alias("bucket"), "value")
    )
    return hist_var_es(e, ["bucket"], "value", q_pct=95)


def q_sampen(spark, sf_dir):
    """Sample entropy (L313): regularity of the mean-normalized daily
    revenue series per bucket (r = 0.2 on the dimensionless scale) —
    exact template-match counts from in-array pair folds."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.complexity import sample_entropy

    daily = _daily_series(spark, sf_dir)
    wb = Window.partitionBy("bucket")
    norm = daily.select(
        "bucket",
        "t",
        (
            F.col("v").cast("double")
            / (
                F.sum("v").over(wb).cast("double")
                / F.count(F.lit(1)).over(wb).cast("double")
            )
        ).alias("x"),
    )
    return sample_entropy(norm, ["bucket"], "t", "x", r=0.2)


def q_mdd(spark, sf_dir):
    """Max drawdown (L314): deepest peak-to-trough fall of daily
    revenue per bucket — one prefix-max window, earliest-trough tie
    rule."""
    from lmss_entity_extractor_spark.ops.timeseries import max_drawdown

    return max_drawdown(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v"
    )


def _price_pair(spark, sf_dir):
    """(flag, actual price, crude quantity-based estimate) — the
    method-comparison frame for the L315/L316 agreement pair."""
    return _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("x"),
        (F.col("l_quantity") * 1050).alias("y"),
    )


def q_ccc(spark, sf_dir):
    """Lin's CCC (L315): does the crude quantity-based estimate AGREE
    with actual price per returnflag — five exact sums, one tree."""
    from lmss_entity_extractor_spark.ops.evalmetrics import lins_ccc

    return lins_ccc(_price_pair(spark, sf_dir), ["flag"], "x", "y")


def q_bland_altman(spark, sf_dir):
    """Bland-Altman limits (L316): how far apart the two price
    measurements can be — exact difference sums, fit broadcast back
    for the coverage count."""
    from lmss_entity_extractor_spark.ops.evalmetrics import bland_altman

    return bland_altman(_price_pair(spark, sf_dir), ["flag"], "x", "y")


def q_deming(spark, sf_dir):
    """Deming regression (L317): the errors-in-both-variables line
    between actual price and the crude estimate — closed form from
    the five exact sums."""
    from lmss_entity_extractor_spark.ops.regression import deming_regression

    return deming_regression(
        _price_pair(spark, sf_dir), ["flag"], "x", "y"
    )


def q_did(spark, sf_dir):
    """Difference-in-differences (L318): did odd-user event values
    move differently after mid-month, per event type — one combinable
    agg over the four cells."""
    from lmss_entity_extractor_spark.ops.regression import did_estimator

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.col("user_id") % 2).cast("int").alias("tr"),
            (F.dayofmonth("ts") >= 16).cast("int").alias("po"),
            "value",
        )
    )
    return did_estimator(e, ["event_type"], "tr", "po", "value")


def q_mix_shift(spark, sf_dir):
    """Mix-shift decomposition (L319): is the odd/even-customer
    fill-rate gap driven by per-priority rates or by priority mix —
    exact cells, Kitagawa folds."""
    from lmss_entity_extractor_spark.ops.effectsize import (
        mix_shift_decomposition,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("seg"),
        (F.col("o_custkey") % 2).alias("grp"),
        (F.col("o_orderstatus") == "F").cast("long").alias("succ"),
        F.lit(1).cast("long").alias("trial"),
    )
    return mix_shift_decomposition(
        o, [], "seg", "grp", 0, 1, "succ", "trial"
    )


def q_yuen(spark, sf_dir):
    """Yuen's trimmed t (L320): robust click vs view value comparison
    per bucket — positional trim boundaries, closed-form winsorized
    sums."""
    from lmss_entity_extractor_spark.ops.stattests import yuen_ttest

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("bucket"),
            "event_type",
            "value",
        )
    )
    return yuen_ttest(
        e, ["bucket"], "event_type", "click", "view", "value",
        trim_pct=20,
    )


def q_ipf(spark, sf_dir):
    """IPF raking (L321): calibrate the odd-customer (priority,
    status) order grid to the even-customer margins — fixed
    deterministic iterations folded in-array."""
    from lmss_entity_extractor_spark.ops.raking import ipf_raking

    o = _t(spark, sf_dir, "orders")
    odd = o.filter(F.col("o_custkey") % 2 == 1)
    even = o.filter(F.col("o_custkey") % 2 == 0)
    cells = odd.groupBy(
        F.col("o_orderpriority").alias("r"),
        F.col("o_orderstatus").alias("c"),
    ).agg(F.count(F.lit(1)).cast("double").alias("w"))
    rt = even.groupBy(F.col("o_orderpriority").alias("r")).agg(
        F.count(F.lit(1)).cast("double").alias("target")
    )
    ct = even.groupBy(F.col("o_orderstatus").alias("c")).agg(
        F.count(F.lit(1)).cast("double").alias("target")
    )
    return ipf_raking(cells, [], "r", "c", "w", rt, ct, iters=10)


def q_kish(spark, sf_dir):
    """Kish ESS (L322): how many unweighted customers the
    balance-weighted sample is worth per segment — two exact sums,
    two divisions."""
    from lmss_entity_extractor_spark.ops.raking import kish_ess

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_mktsegment").alias("seg"), "c_acctbal")
    )
    return kish_ess(c, ["seg"], "c_acctbal")


def q_ht(spark, sf_dir):
    """Horvitz-Thompson (L323): revenue total under a two-rate
    stratified design per linestatus — exact per-π cells, bounded
    fold."""
    from lmss_entity_extractor_spark.ops.sampling import ht_estimator

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linestatus").alias("st"),
        F.col("l_extendedprice").alias("y"),
        F.when(F.col("l_returnflag") == "R", F.lit(0.25))
        .otherwise(F.lit(0.5))
        .alias("pi"),
    )
    return ht_estimator(li, ["st"], "y", "pi")


def q_p_chart(spark, sf_dir):
    """p-chart (L324): is the daily error-event rate in control per
    bucket — exact subgroup counts, 3-sigma binomial limits."""
    from lmss_entity_extractor_spark.ops.sampling import p_chart

    e = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("bucket"),
        F.to_date("ts").alias("day"),
        (F.col("event_type") == "error").cast("int").alias("def_"),
    )
    return p_chart(e, ["bucket"], "day", "def_")


def q_imr(spark, sf_dir):
    """I-MR chart (L325): individuals control limits for daily
    revenue per bucket — MR-based sigma, exact signs for the
    8-in-a-row rule."""
    from lmss_entity_extractor_spark.ops.spc import imr_chart

    return imr_chart(_daily_series(spark, sf_dir), ["bucket"], ["t"], "v")


def q_ewma_chart(spark, sf_dir):
    """EWMA chart (L326): small-shift detection on daily revenue per
    bucket — list-appending z-path fold, warm-up-widening limits."""
    from lmss_entity_extractor_spark.ops.spc import ewma_chart

    return ewma_chart(
        _daily_series(spark, sf_dir), ["bucket"], "t", "v", lam=0.2
    )


def q_capability(spark, sf_dir):
    """Process capability (L327): does mean-normalized daily revenue
    fit the (0.5, 1.5) spec band per bucket — MR-based within sigma
    vs overall sigma."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.spc import process_capability

    daily = _daily_series(spark, sf_dir)
    wb = Window.partitionBy("bucket")
    ratio = F.col("v").cast("double") / (
        F.sum("v").over(wb).cast("double")
        / F.count(F.lit(1)).over(wb).cast("double")
    )
    # floor onto the 1e-4 grid: round-half cut points of a rational
    # ratio can tie and engines disagree; floor never ties
    norm = daily.select(
        "bucket",
        "t",
        (F.floor(ratio * F.lit(10000.0)) / F.lit(10000.0)).alias("x"),
    )
    return process_capability(
        norm, ["bucket"], ["t"], "x", lsl=0.5, usl=1.5
    )


def q_robust_shape(spark, sf_dir):
    """Robust shape panel (L328): Bowley/Moors/QCV of positive
    balances per segment — exact octile order statistics."""
    from lmss_entity_extractor_spark.ops.spc import robust_shape

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_mktsegment").alias("seg"), "c_acctbal")
    )
    return robust_shape(c, ["seg"], "c_acctbal")


def q_dsr(spark, sf_dir):
    """Direct standardization (L329): odd/even-customer fill rates
    under the pooled priority mix — exact cells, bounded weight
    folds."""
    from lmss_entity_extractor_spark.ops.effectsize import (
        direct_standardization,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("s"),
        (F.col("o_custkey") % 2).alias("grp"),
        (F.col("o_orderstatus") == "F").cast("long").alias("x"),
        F.lit(1).cast("long").alias("t"),
    )
    return direct_standardization(o, [], "s", "grp", "x", "t")


def q_mtbf(spark, sf_dir):
    """MTBF/MTTR/availability (L330): the event stream read as a
    health-probe log per bucket (error = down) — exact microsecond
    segments, one division per mean."""
    from lmss_entity_extractor_spark.ops.timeseries import mtbf_mttr

    probes = (
        _t(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 2).alias("bucket"), "ts")
        .agg(
            F.when(
                F.max((F.col("event_type") == "error").cast("int")) == 1,
                F.lit("down"),
            )
            .otherwise(F.lit("up"))
            .alias("state")
        )
    )
    return mtbf_mttr(probes, ["bucket"], "ts", "state", "up")


def q_median_ci(spark, sf_dir):
    """Median CI (L331): distribution-free balance-median bounds per
    segment — order-statistic ranks, zero resampling."""
    from lmss_entity_extractor_spark.ops.rankeval import median_ci

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"), "c_acctbal"
    )
    return median_ci(c, ["seg"], "c_acctbal")


def q_xi(spark, sf_dir):
    """Chatterjee's ξ (L332): does quantity functionally determine
    price per returnflag — exact range-framed rank counts, one
    division."""
    from lmss_entity_extractor_spark.ops.rankeval import chatterjee_xi

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_quantity",
        "l_extendedprice",
    )
    return chatterjee_xi(li, ["flag"], "l_quantity", "l_extendedprice")


def q_holt_winters(spark, sf_dir):
    """Holt-Winters additive (L333): weekly-seasonal daily revenue
    forecast per bucket — (level, trend, seasonal-array) struct fold."""
    from lmss_entity_extractor_spark.ops.timeseries import (
        holt_winters_additive,
    )

    return holt_winters_additive(
        _daily_series(spark, sf_dir), ["bucket"], "t", "v",
        period=7, alpha=0.3, beta=0.1, gamma=0.2,
    )


def q_gwet(spark, sf_dir):
    """Gwet's AC1 (L334): does a crude status-derived label agree
    with the return flag per part bucket — exact cells, one bounded
    marginal fold."""
    from lmss_entity_extractor_spark.ops.evalmetrics import gwet_ac1

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 2).alias("bucket"),
        F.col("l_returnflag").alias("ra"),
        F.when(F.col("l_linestatus") == "F", F.lit("A"))
        .otherwise(F.lit("N"))
        .alias("rb"),
    )
    return gwet_ac1(li, ["bucket"], "ra", "rb")


def q_mahalanobis(spark, sf_dir):
    """Mahalanobis 2D (L335): jointly-odd (quantity, price) lines per
    returnflag on a deterministic slice — closed-form 2x2 inverse,
    fit broadcast back."""
    from lmss_entity_extractor_spark.ops.anomaly import mahalanobis_2d

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            F.col("l_returnflag").alias("flag"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "lid"
            ),
            "l_quantity",
            "l_extendedprice",
        )
    )
    return mahalanobis_2d(
        li, ["flag"], "lid", "l_quantity", "l_extendedprice"
    )


def q_twoway(spark, sf_dir):
    """Balanced two-way ANOVA (L336): row-number-minted 2x2 factors
    over order revenue — exact cell sums, bounded margin folds."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.stattests import (
        twoway_anova_balanced,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    rn = F.row_number().over(Window.orderBy("o_orderkey"))
    nn = F.count(F.lit(1)).over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    tagged = o.select(
        "o_totalprice",
        rn.alias("_rn"),
        nn.alias("_nn"),
    ).filter(F.col("_rn") <= (F.col("_nn") - F.col("_nn") % 4))
    fac = tagged.select(
        (F.col("_rn") % 2).alias("fa"),
        (F.floor(F.col("_rn") / 2) % 2).alias("fb"),
        "o_totalprice",
    )
    return twoway_anova_balanced(fac, [], "fa", "fb", "o_totalprice")


def q_rfm(spark, sf_dir):
    """RFM scoring (L337): purchase recency/frequency/monetary
    quintiles per user — deterministic id-tiebroken rank bins."""
    from lmss_entity_extractor_spark.ops.cohort import rfm_scores

    e = (
        _t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .select("user_id", "ts", "value")
    )
    return rfm_scores(e, [], "user_id", "ts", "value")


def q_wcorr(spark, sf_dir):
    """Winsorized correlation (L338): robust quantity-price
    dependence per returnflag — clamped exact decimals, one Pearson
    tree."""
    from lmss_entity_extractor_spark.ops.correlation import (
        winsorized_corr,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_quantity",
        "l_extendedprice",
    )
    return winsorized_corr(
        li, ["flag"], "l_quantity", "l_extendedprice", trim_pct=10
    )


def q_kpss(spark, sf_dir):
    """KPSS level stationarity (L339): is daily revenue level-stationary
    — denominator-cleared exact partial-sum/autocovariance sums, one
    Bartlett long-run-variance tree."""
    from lmss_entity_extractor_spark.ops.timeseries import kpss_level

    return kpss_level(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v", lags=4
    )


def q_varratio(spark, sf_dir):
    """Lo-MacKinlay variance ratio (L340): does daily-revenue variance
    grow linearly with a 4-day horizon — one rolling exact-decimal
    window, expanded mean corrections, one z tree."""
    from lmss_entity_extractor_spark.ops.timeseries import variance_ratio

    return variance_ratio(
        _daily_series(spark, sf_dir), ["bucket"], ["t"], "v", q=4
    )


def _daily_diff(spark, sf_dir):
    """Day-over-day exact-decimal revenue changes per bucket — the
    return series for the L341/L342 performance family."""
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy("t")
    return (
        _daily_series(spark, sf_dir)
        .select(
            "bucket",
            "t",
            (F.col("v") - F.lag("v", 1).over(w)).alias("r"),
        )
        .filter(F.col("r").isNotNull())
    )


def q_risk_panel(spark, sf_dir):
    """Risk-adjusted performance panel (L341): Sharpe/Sortino/Calmar of
    day-over-day revenue changes — exact sums + prefix-max drawdown,
    one tree per ratio."""
    from lmss_entity_extractor_spark.ops.timeseries import risk_panel

    return risk_panel(
        _daily_diff(spark, sf_dir), ["bucket"], ["t"], "r", periods=252
    )


def q_omega(spark, sf_dir):
    """Omega ratio (L342): probability-weighted gain/loss of daily
    revenue changes around zero — two exact partial sums, one
    division."""
    from lmss_entity_extractor_spark.ops.timeseries import omega_ratio

    return omega_ratio(_daily_diff(spark, sf_dir), ["bucket"], "r")


def q_fk_orphans(spark, sf_dir):
    """FK orphan audit (L343): orders whose customer is missing from a
    deliberately-holed customer dimension — one anti join + a bounded
    lexical key sample."""
    from lmss_entity_extractor_spark.ops.integrity import fk_orphans

    holed = _t(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 3 != 0
    )
    return fk_orphans(
        _t(spark, sf_dir, "orders"), holed, ["o_custkey"], ["c_custkey"],
        sample=5,
    )


def q_fd_audit(spark, sf_dir):
    """FD-violation audit (L344): which customers place orders under
    more than one priority (o_custkey → o_orderpriority fails) — two
    cascaded NULL-safe groupBys."""
    from lmss_entity_extractor_spark.ops.integrity import fd_violations

    return fd_violations(
        _t(spark, sf_dir, "orders"), ["o_custkey"], ["o_orderpriority"]
    )


def q_seq_audit(spark, sf_dir):
    """Sequence-integrity audit (L345): are line numbers a clean
    1,2,… run per order after a deliberate hole at 3 — exact
    dupe/gap counts, one combinable agg."""
    from lmss_entity_extractor_spark.ops.integrity import sequence_audit

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") != 3) & (F.col("l_orderkey") % 10 == 0)
    )
    return sequence_audit(li, ["l_orderkey"], "l_linenumber", base=1)


def q_qnorm(spark, sf_dir):
    """Quantile normalization (L346): force both buckets' first-28-day
    revenue series onto the mean order-statistic curve — rank window +
    exact rank sums, one division."""
    from pyspark.sql import Window

    from lmss_entity_extractor_spark.ops.scaling import (
        quantile_normalize,
    )

    w = Window.partitionBy("bucket").orderBy("t")
    trimmed = (
        _daily_series(spark, sf_dir)
        .select("bucket", "t", "v", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= 28)
        .drop("_rn")
    )
    return quantile_normalize(trimmed, ["bucket"], ["t"], "v")


def q_kalman(spark, sf_dir):
    """Kalman local-level (L347): adaptive-gain level tracking of
    daily revenue — an (a, P, K) struct fold, four IEEE ops per
    step."""
    from lmss_entity_extractor_spark.ops.timeseries import kalman_level

    return kalman_level(
        _daily_series(spark, sf_dir), ["bucket"], "t", "v",
        q_var=1000.0, r_var=5000.0, p0=1e6,
    )


def q_engle_granger(spark, sf_dir):
    """Engle-Granger (L348): do daily revenue and daily event counts
    share one trend per bucket — OLS + no-constant DF on residuals,
    all from 13 exact lagged cross-sums."""
    from lmss_entity_extractor_spark.ops.timeseries import engle_granger

    d = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).alias("bucket"),
            F.unix_date(F.to_date("ts")).alias("t"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return engle_granger(d, ["bucket"], ["t"], "rev", "cnt")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered by driver-verification priority (the driver may sample a
    # prefix of the contract): entries whose oracles have never been
    # driver-checked come first, then rows red/unsampled in round 2, then
    # the round-1-green remainder.
    return {
        # oracles never yet driver-checked (added r2/r3/r4)
        "kpss": q_kpss,
        "varratio": q_varratio,
        "risk_panel": q_risk_panel,
        "omega": q_omega,
        "fk_orphans_audit": q_fk_orphans,
        "fd_audit": q_fd_audit,
        "seq_audit": q_seq_audit,
        "qnorm": q_qnorm,
        "kalman": q_kalman,
        "engle_granger": q_engle_granger,
        "ndcg": q_ndcg,
        "pettitt": q_pettitt,
        "sign_test": q_sign_test,
        "mood_median": q_mood_median,
        "hodges_lehmann": q_hodges_lehmann,
        "ordinal_panel": q_ordinal_panel,
        "v_measure": q_v_measure,
        "ljung_box": q_ljung_box,
        "grubbs": q_grubbs,
        "cochran_armitage": q_cochran_armitage,
        "sax": q_sax,
        "bartlett": q_bartlett,
        "dunn": q_dunn,
        "calinski": q_calinski,
        "davies_bouldin": q_davies_bouldin,
        "avg_precision": q_avg_precision,
        "best_split": q_best_split,
        "krippendorff": q_krippendorff,
        "mantel_haenszel": q_mantel_haenszel,
        "cronbach": q_cronbach,
        "fellegi_sunter": q_fellegi_sunter,
        "soundex": q_soundex,
        "ks_uniform": q_ks_uniform,
        "anderson_darling": q_anderson_darling,
        "page_trend": q_page_trend,
        "capture_recapture": q_capture_recapture,
        "kendalls_w": q_kendalls_w,
        "hellinger": q_hellinger,
        "topk_churn": q_topk_churn,
        "poisson_rate": q_poisson_rate,
        "bowker": q_bowker,
        "g_test": q_g_test,
        "nelson_aalen": q_nelson_aalen,
        "morans_i": q_morans_i,
        "icc": q_icc,
        "tukey": q_tukey,
        "diversity": q_diversity,
        "cumulative_incidence": q_cumulative_incidence,
        "gk_lambda": q_gk_lambda,
        "theils_u": q_theils_u,
        "interevent": q_interevent,
        "dispersion": q_dispersion,
        "chi2_residuals": q_chi2_residuals,
        "cvm": q_cvm,
        "hoover": q_hoover,
        "jarque_bera": q_jarque_bera,
        "inequality": q_inequality,
        "brunner_munzel": q_brunner_munzel,
        "ansari": q_ansari,
        "breusch_pagan": q_breusch_pagan,
        "quade": q_quade,
        "holt": q_holt,
        "yule_walker": q_yule_walker,
        "periodogram": q_periodogram,
        "rmst": q_rmst,
        "cox_stuart": q_cox_stuart,
        "stuart_maxwell": q_stuart_maxwell,
        "bartels": q_bartels,
        "turning_points": q_turning_points,
        "croston": q_croston,
        "theta": q_theta,
        "spectral_entropy": q_spectral_entropy,
        "msprt": q_msprt,
        "eb_shrink": q_eb_shrink,
        "seasonal_strength": q_seasonal_strength,
        "quantile_loss": q_quantile_loss,
        "dickey_fuller": q_dickey_fuller,
        "harrell_c": q_harrell_c,
        "granger": q_granger,
        "arch_lm": q_arch_lm,
        "var_backtest": q_var_backtest,
        "entropy_rate": q_entropy_rate,
        "meta_pool": q_meta_pool,
        "km_ci": q_km_ci,
        "seasonal_mk": q_seasonal_mk,
        "lorenz": q_lorenz,
        "rs_analysis": q_rs,
        "hurst": q_hurst,
        "pentropy": q_pentropy,
        "cusum_squares": q_cusum_squares,
        "energy": q_energy,
        "dcor": q_dcor,
        "cucconi": q_cucconi,
        "dtw": q_dtw,
        "gini_jk": q_gini_jk,
        "youden": q_youden,
        "pr_auc": q_pr_auc,
        "seasonal_ts": q_seasonal_ts,
        "records": q_records,
        "gumbel": q_gumbel,
        "hill": q_hill,
        "gpd": q_gpd,
        "var_es": q_var_es,
        "sampen": q_sampen,
        "mdd": q_mdd,
        "ccc": q_ccc,
        "bland_altman": q_bland_altman,
        "deming": q_deming,
        "did": q_did,
        "mix_shift": q_mix_shift,
        "yuen": q_yuen,
        "ipf": q_ipf,
        "kish": q_kish,
        "ht": q_ht,
        "p_chart": q_p_chart,
        "imr": q_imr,
        "ewma_chart": q_ewma_chart,
        "capability": q_capability,
        "robust_shape": q_robust_shape,
        "dsr": q_dsr,
        "mtbf": q_mtbf,
        "median_ci": q_median_ci,
        "xi": q_xi,
        "holt_winters": q_holt_winters,
        "gwet": q_gwet,
        "mahalanobis": q_mahalanobis,
        "twoway": q_twoway,
        "rfm": q_rfm,
        "wcorr": q_wcorr,
        "semdedup": q_semdedup,
        "dsir_select": q_dsir_select,
        "substr_spans": q_substr_spans,
        "leakage_split": q_leakage_split,
        "simhash": q_simhash,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
        "streaming_conv_totals": q_streaming_conv_totals,
        "streaming_dedup": q_streaming_dedup,
        "mention_type_counts": q_mention_type_counts,
        "kg_edge_counts": q_kg_edge_counts,
        "hybrid_search": q_hybrid_search,
        "stream_reply_join": q_stream_reply_join,
        "edges_changelog": q_edges_changelog,
        # oracles never yet driver-checked (added r4)
        "bgp_union": q_bgp_union,
        "bgp_minus": q_bgp_minus,
        "bgp_aggregate": q_bgp_aggregate,
        "describe": q_describe,
        "wu_palmer": q_wu_palmer,
        "bpe_pairs": q_bpe_pairs,
        "pca_covariance": q_pca_covariance,
        "url_normalize": q_url_normalize,
        "domain_stats": q_domain_stats,
        "bpe_merged_pairs": q_bpe_merged_pairs,
        "zorder_key": q_zorder_key,
        "cube_revenue": q_cube_revenue,
        "edit_join": q_edit_join,
        "ktruss": q_ktruss,
        "session_window": q_session_window,
        "histogram": q_histogram,
        "corr_stats": q_corr_stats,
        "json_roundtrip": q_json_roundtrip,
        "property_path_neg": q_property_path_neg,
        "text_normalize": q_text_normalize,
        "ewma": q_ewma,
        "robust_outliers": q_robust_outliers,
        "skew_stats": q_skew_stats,
        "bgp_quads": q_bgp_quads,
        "bgp_reordered": q_bgp_reordered,
        "bgp_exists": q_bgp_exists,
        "bgp_values": q_bgp_values,
        "scc": q_scc,
        "dag_levels": q_dag_levels,
        "recursive_cte": q_recursive_cte,
        "variant_extract": q_variant_extract,
        "xml_roundtrip": q_xml_roundtrip,
        "lateral_topk": q_lateral_topk,
        "knn_ivfpq_rerank": q_knn_ivfpq_rerank,
        "knn_ivfpq_residual": q_knn_ivfpq_residual,
        "dedup_clusters_star": q_dedup_clusters_star,
        "edges_as_of": q_edges_as_of,
        "triangles": q_triangles,
        "shortest_hops": q_shortest_hops,
        "link_predict": q_link_predict,
        "winnow": q_winnow,
        "ppr": q_ppr,
        "random_walks": q_random_walks,
        "cooccur_pmi": q_cooccur_pmi,
        "rdfs_entail": q_rdfs_entail,
        "sameas_resolve": q_sameas_resolve,
        "shacl_violations": q_shacl_violations,
        "bgp_match": q_bgp_match,
        "property_path": q_property_path,
        "ntriples_roundtrip": q_ntriples_roundtrip,
        "resolve_entities": q_resolve_entities,
        "kg_publish": q_kg_publish,
        "negative_samples": q_negative_samples,
        "bgp_optional": q_bgp_optional,
        "label_propagation": q_label_propagation,
        "charsets": q_charsets,
        "dict_encode": q_dict_encode,
        "conflict_resolution": q_conflict_resolution,
        "void_stats": q_void_stats,
        "kcore": q_kcore,
        "quotient_graph": q_quotient_graph,
        "coalesce_intervals": q_coalesce_intervals,
        "shortest_paths": q_shortest_paths,
        "closure_insert": q_closure_insert,
        "flatten_lists": q_flatten_lists,
        "owl_entail": q_owl_entail,
        "bgp_construct": q_bgp_construct,
        "reify": q_reify,
        "bisim": q_bisim,
        "decontaminate": q_decontaminate,
        "heavy_hitters": q_heavy_hitters,
        "mixture_sample": q_mixture_sample,
        "repetition_stats": q_repetition_stats,
        "corpus_line_dedup": q_corpus_line_dedup,
        "lm_quality": q_lm_quality,
        "knn_pq": q_knn_pq,
        "knn_ivfpq": q_knn_ivfpq,
        # red in round 2 (oracle dtype, fixed r3) — re-check first
        "time_rollup": q_time_rollup,
        # green in round 1 but unsampled in round 2
        "quantiles": q_quantiles,
        "moving_avg": q_moving_avg,
        "rollup_revenue": q_rollup_revenue,
        "sha256": q_sha256,
        "collect_pivot": q_collect_pivot,
        "top_terms": q_top_terms,
        "bucketed_join": q_bucketed_join,
        # relational inventory (oracle-checked, driver-green r2)
        "filter_project": q_filter_project,
        "agg_returnflag": q_agg_returnflag,
        "topk_orders": q_topk_orders,
        "window_dedup": q_window_dedup,
        "broadcast_join_brand": q_broadcast_join_brand,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "region_revenue": q_region_revenue,
        "salted_join": q_salted_join,
        "profile_table": q_profile_table,
        "scd2": q_scd2,
        "merge_upsert": q_merge_upsert,
        "streaming_heavy_hitters": q_streaming_heavy_hitters,
        "pit_join": q_pit_join,
        "table_diff": q_table_diff,
        "sketch_rollup": q_sketch_rollup,
        "bloom_semi_join": q_bloom_semi_join,
        "psi_drift": q_psi_drift,
        "markov_transitions": q_markov_transitions,
        "markov_stationary": q_markov_stationary,
        "frequent_sequences": q_frequent_sequences,
        "frequent_itemsets": q_frequent_itemsets,
        "assoc_rules": q_assoc_rules,
        "grouped_ols": q_grouped_ols,
        "nb_lang_scores": q_nb_lang_scores,
        "nb_predict_lang": q_nb_predict_lang,
        "mad_outliers": q_mad_outliers,
        "target_encode": q_target_encode,
        "welch_ab": q_welch_ab,
        "chi2_assoc": q_chi2_assoc,
        "corr_matrix": q_corr_matrix,
        "spearman": q_spearman,
        "feature_scale": q_feature_scale,
        "rolling_active_users": q_rolling_active_users,
        "share_of_total": q_share_of_total,
        "benford": q_benford,
        "power_law": q_power_law,
        "roc_auc": q_roc_auc,
        "ks_2samp": q_ks_2samp,
        "modularity": q_modularity,
        "assortativity": q_assortativity,
        "gini": q_gini,
        "acf": q_acf,
        "mutual_info": q_mutual_info,
        "jsd": q_jsd,
        "cusum": q_cusum,
        "kmeans": q_kmeans,
        "silhouette": q_silhouette,
        "ari": q_ari,
        "fps": q_fps,
        "kaplan_meier": q_kaplan_meier,
        "logrank": q_logrank,
        "mann_kendall": q_mann_kendall,
        "theil_sen": q_theil_sen,
        "seasonal": q_seasonal,
        "retrieval_metrics": q_retrieval_metrics,
        "classification_report": q_classification_report,
        "brier": q_brier,
        "calibration": q_calibration,
        "isotonic": q_isotonic,
        "geo_pairs": q_geo_pairs,
        "runs_test": q_runs_test,
        "ols_influence": q_ols_influence,
        "anova": q_anova,
        "two_prop": q_two_prop,
        "durbin_watson": q_durbin_watson,
        "partial_corr": q_partial_corr,
        "rolling_slope": q_rolling_slope,
        "density_clusters": q_density_clusters,
        "simpsons_flip": q_simpsons,
        "covariate_balance": q_covariate_balance,
        "bh_fdr": q_bh_fdr,
        "vocab_coverage": q_vocab_coverage,
        "mde": q_mde,
        "grouping_sets": q_grouping_sets,
        "forecast_acc": q_forecast_acc,
        "gains": q_gains,
        "trimmed_mean": q_trimmed,
        "ratio_metric": q_ratio_metric,
        "conformal": q_conformal,
        "ece": q_ece,
        "jaro_join": q_jaro_join,
        "jonckheere": q_jonckheere,
        "kendall_tau": q_kendall,
        "rbo": q_rbo,
        "adamic_adar": q_adamic_adar,
        "rich_club": q_rich_club,
        "k_anonymity": q_k_anonymity,
        "t_closeness": q_t_closeness,
        "random_projection": q_random_projection,
        "containment": q_containment,
        "ccf": q_ccf,
        "srm": q_srm,
        "weighted_quantiles": q_weighted_quantiles,
        "kruskal": q_kruskal,
        "readability": q_readability,
        "compaction_plan": q_compaction_plan,
        "sorted_neighborhood": q_sorted_neighborhood,
        "cuped": q_cuped,
        "heaps": q_heaps,
        "zipf": q_zipf,
        "wasserstein": q_wasserstein,
        "twap": q_twap,
        "ohlc": q_ohlc,
        "cohens_kappa": q_cohens_kappa,
        "wilson": q_wilson,
        "cohens_d": q_cohens_d,
        "reciprocity": q_reciprocity,
        "conductance": q_conductance,
        "wilcoxon": q_wilcoxon,
        "friedman": q_friedman,
        "mcnemar": q_mcnemar,
        "fleiss_kappa": q_fleiss,
        "cochran_q": q_cochran,
        "brown_forsythe": q_brown_forsythe,
        "cramers_v": q_cramers_v,
        "part_salience": q_part_salience,
        "skyline": q_skyline,
        "pagerank_weighted": q_pagerank_weighted,
        "concurrency_peak": q_concurrency_peak,
        "interval_intersect": q_interval_intersect,
        "distinct_overlap": q_distinct_overlap,
        "cms_join_size": q_cms_join_size,
        "equidepth_bins": q_equidepth_bins,
        "attribution": q_attribution,
        "golden_records": q_golden_records,
        "curate_sampled": q_curate_sampled,
        "zone_pruned_read": q_zone_pruned_read,
        "cms_estimate": q_cms_estimate,
        "schema_evolution": q_schema_evolution,
        "textrank": q_textrank,
        "neighborhood_function": q_neighborhood_function,
        "cdc_apply": q_cdc_apply,
        "weighted_sample": q_weighted_sample,
        "cohort_retention": q_cohort_retention,
        "funnel": q_funnel,
        "expectations_summary": q_expectations_summary,
        "quarantine": q_quarantine,
        "gap_fill": q_gap_fill,
        "hyperball": q_hyperball,
        "harmonic_centrality": q_harmonic_centrality,
        "pivot_events": q_pivot_events,
        "closure": q_closure,
        "argmax_link": q_argmax_link,
        "knn_bruteforce": q_knn_bruteforce,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
        "asof_join": q_asof_join,
        "outer_join": q_outer_join,
        "max_by": q_max_by,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_clusters": q_dedup_clusters,
        "embedding_neardup": q_embedding_neardup,
        "range_join": q_range_join,
        "sketch_accuracy": q_sketch_accuracy,
        "quantize": q_quantize,
        "pack_chunks": q_pack_chunks,
        "curate": q_curate,
        "full_outer_join": q_full_outer_join,
        "rank_funcs": q_rank_funcs,
        "unpivot_long": q_unpivot_long,
        "explode_outer": q_explode_outer,
        "chunk_docs": q_chunk_docs,
        "pii_scrub": q_pii_scrub,
        "stratified_sample": q_stratified_sample,
        "bm25": q_bm25,
        "quality_stats": q_quality_stats,
        "langid": q_langid,
        "token_counts": q_token_counts,
        "fingerprint": q_fingerprint,
        "context_slice": q_context_slice,
        "source_split": q_source_split,
        "coalesce_backfill": q_coalesce_backfill,
        "stable_sort": q_stable_sort,
        "array_mean": q_array_mean,
        "closure_counts": q_closure_counts,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "set_ops": q_set_ops,
        "sessionize": q_sessionize,
        "above_avg": q_above_avg,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _shingles_cte(src: str = "documents") -> str:
    return f"""
toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM {src}
),
sh AS (
    SELECT DISTINCT doc_id,
           unnest([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] FOR i IN range(greatest(len(t)-2, 0))]) AS shingle
    FROM toks
),
sh_nonempty AS (SELECT * FROM sh WHERE length(shingle) > 0)
"""


def _minhash_pairs_cte(src: str = "documents") -> str:
    return f"""
{_shingles_cte(src)},
hashed AS (
    SELECT doc_id, i.range AS h_idx,
           min(md5(i.range || ':' || shingle)) AS minhash
    FROM sh_nonempty, range(8) i
    GROUP BY doc_id, i.range
),
band_sig AS (
    SELECT doc_id, CAST(h_idx // 2 AS INT) AS band,
           string_agg(h_idx || ':' || minhash, '|' ORDER BY h_idx || ':' || minhash) AS band_sig
    FROM hashed GROUP BY 1, 2
),
mh_pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM band_sig a JOIN band_sig b ON a.band = b.band AND a.band_sig = b.band_sig
    WHERE a.doc_id < b.doc_id
)
"""


_SHINGLES_CTE = _shingles_cte()
_MINHASH_PAIRS_CTE = _minhash_pairs_cte()


def _pq_oracle_sql(ivf_probe: bool = False, rerank: int = 0, residual: bool = False) -> str:
    """The knn_pq / knn_ivfpq / knn_ivfpq_rerank oracles, generated so
    the float sums are EXPLICITLY left-associated term-for-term with the
    Spark/Python folds (grouped SQL SUM has unspecified order; a 1-ulp
    reassociation difference could flip a near-tie in the ranking).

    ``ivf_probe=True`` adds the IVFADC composition from the frozen IVF
    centroids: cell assignment (argmax-dot, lowest-cid ties), per-query
    top-nprobe probe cells, and the candidate restriction to probed
    cells — every stage of ``knn_ivfpq`` re-derived in SQL.

    ``rerank=k'`` appends the Jegou-§V exact re-rank: ADC shortlist of
    k' per query, then exact squared L2 (64 explicitly left-associated
    float64 terms, both operands CAST from the stored float32) orders
    the final top-k — mirroring ops.pq._exact_rerank's sequential
    zip_with/aggregate fold.

    ``residual=True`` (requires ivf_probe) re-derives the §IV residual
    coding: codes quantize (x - assigned cell's MEAN) — NOT the unit-
    normalized IVF centroid, which would leave the cluster offset intact
    (see the cmeans CTE below) — and each query builds one ADC table PER
    PROBED CELL from (q - that cell's mean); the per-term tree
    ((x - cellmean) - cbcent) mirrors Spark's two-stage residual-then-
    distance computation exactly."""
    sub, m, kq, dim, nprobe = 8, 8, 10, 64, 2
    if residual and not ivf_probe:
        raise ValueError("residual coding is the IVFADC composition; set ivf_probe=True")

    def dist(vec: str, ivfcent: str | None = None) -> str:
        def x(i: int) -> str:
            raw = f"CAST({vec}[cb.j * {sub} + {i} + 1] AS DOUBLE)"
            if ivfcent is None:
                return raw
            return f"({raw} - {ivfcent}[cb.j * {sub} + {i} + 1])"

        acc = f"({x(0)} - cb.cent[1]) * ({x(0)} - cb.cent[1])"
        for i in range(1, sub):
            t = f"({x(i)} - cb.cent[{i} + 1]) * ({x(i)} - cb.cent[{i} + 1])"
            acc = f"({acc} + {t})"
        return acc

    def dot64(vec: str) -> str:
        acc = f"(CAST({vec}[1] AS DOUBLE) * ivf.cent[1])"
        for i in range(1, dim):
            acc = f"({acc} + (CAST({vec}[{i} + 1] AS DOUBLE) * ivf.cent[{i} + 1]))"
        return acc

    adc = f"max(CASE WHEN j = 0 THEN d END)"
    for j in range(1, m):
        adc = f"({adc} + max(CASE WHEN j = {j} THEN d END))"

    ivf_ctes = f""",
        ivf AS (SELECT cid, cent
                FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/ivf_centroids.parquet')),
        idot AS (
            SELECT b.vec_id, ivf.cid, {dot64('b.embedding')} AS d
            FROM base b CROSS JOIN ivf
        ),
        cells AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid ASC) AS rn
                FROM idot
            ) WHERE rn = 1
        ),
        probe AS (
            SELECT vec_id AS query_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid ASC) AS rn
                FROM idot WHERE vec_id < 5
            ) WHERE rn <= {nprobe}
        )"""
    if residual:
        ivf_ctes += """,
        cmeans AS (SELECT cid, cent
                   FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/ivf_cell_means.parquet'))"""
    if residual:
        # qtbl carries a cid: one ADC table per (query, probed cell) —
        # the pair must match the candidate's OWN cell's table
        pairs = """
            SELECT t.query_id, c.vec_id AS neighbor_id, c.j, t.d
            FROM codes c
            JOIN cells ce ON ce.vec_id = c.vec_id
            JOIN probe p ON p.cid = ce.cid
            JOIN qtbl t ON t.query_id = p.query_id AND t.cid = ce.cid
                       AND t.j = c.j AND t.code = c.code
            WHERE c.vec_id <> t.query_id"""
    elif ivf_probe:
        pairs = """
            SELECT t.query_id, c.vec_id AS neighbor_id, c.j, t.d
            FROM codes c
            JOIN cells ce ON ce.vec_id = c.vec_id
            JOIN probe p ON p.cid = ce.cid
            JOIN qtbl t ON t.query_id = p.query_id AND t.j = c.j AND t.code = c.code
            WHERE c.vec_id <> t.query_id"""
    else:
        pairs = """
            SELECT t.query_id, c.vec_id AS neighbor_id, c.j, t.d
            FROM codes c JOIN qtbl t ON t.j = c.j AND t.code = c.code
            WHERE c.vec_id <> t.query_id"""

    if rerank:

        def _l2_64(a: str, b: str) -> str:
            def term(i: int) -> str:
                d = f"(CAST({a}[{i} + 1] AS DOUBLE) - CAST({b}[{i} + 1] AS DOUBLE))"
                return f"({d} * {d})"

            acc = term(0)
            for i in range(1, dim):
                acc = f"({acc} + {term(i)})"
            return acc

        rerank_ctes = f""",
        short AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY adc_dist ASC, neighbor_id ASC) AS srn
                FROM adc
            ) WHERE srn <= {rerank}
        ),
        exact AS (
            SELECT s.query_id, s.neighbor_id,
                   {_l2_64('b.embedding', 'q.embedding')} AS xdist
            FROM short s
            JOIN base b ON b.vec_id = s.neighbor_id
            JOIN base q ON q.vec_id = s.query_id
        )"""
        final_src, final_dist = "exact", "xdist"
    else:
        rerank_ctes, final_src, final_dist = "", "adc", "adc_dist"
    book = "pq_codebook_residual" if residual else "pq_codebook"
    if residual:
        # residual offsets are the frozen per-cell MEANS (the spherical
        # IVF centroids are unit vectors and would leave the cluster
        # offset intact) — ml/pm join the means table by assigned /
        # probed cell respectively
        vdist = f"""
            SELECT b.vec_id, cb.j, cb.code, {dist('b.embedding', 'ml.cent')} AS d
            FROM base b
            JOIN cells ce ON ce.vec_id = b.vec_id
            JOIN cmeans ml ON ml.cid = ce.cid
            CROSS JOIN cb"""
        qtbl = f"""
            SELECT b.vec_id AS query_id, p.cid, cb.j, cb.code,
                   {dist('b.embedding', 'pm.cent')} AS d
            FROM base b
            JOIN probe p ON p.query_id = b.vec_id
            JOIN cmeans pm ON pm.cid = p.cid
            CROSS JOIN cb"""
    else:
        vdist = f"""
            SELECT b.vec_id, cb.j, cb.code, {dist('b.embedding')} AS d
            FROM base b CROSS JOIN cb"""
        qtbl = f"""
            SELECT b.vec_id AS query_id, cb.j, cb.code, {dist('b.embedding')} AS d
            FROM base b CROSS JOIN cb WHERE b.vec_id < 5"""
    return f"""
        WITH cb AS (SELECT j, code, cent
                    FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/{book}.parquet')),
        base AS (SELECT vec_id, embedding FROM embeddings){ivf_ctes if ivf_probe else ''},
        vdist AS ({vdist}
        ),
        codes AS (
            SELECT vec_id, j, code FROM (
                SELECT vec_id, j, code,
                       row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, code ASC) AS rn
                FROM vdist
            ) WHERE rn = 1
        ),
        qtbl AS ({qtbl}
        ),
        pairs AS ({pairs}
        ),
        adc AS (
            SELECT query_id, neighbor_id, {adc} AS adc_dist
            FROM pairs GROUP BY 1, 2
        ){rerank_ctes}
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY {final_dist} ASC, neighbor_id ASC) AS rank
            FROM {final_src}
        ) WHERE rank <= {kq}
    """


def _semdedup_oracle_sql(threshold: str = "0.375", dim: int = 64) -> str:
    """The semdedup oracle: cells, centroid sims, the within-cell pair
    scan, and the keep rule re-derived in SQL from the same frozen IVF
    centroid fixture the Spark query reads.

    Float discipline (the same contract as _pq_oracle_sql): every sum is
    EXPLICITLY left-associated term-for-term with the Spark
    zip_with/aggregate folds (``ops/similarity.py dot_expr/norm_expr``),
    both operands CAST from the stored float32, so cell dots, norms, and
    pair cosines are bit-identical and the >= threshold / sim-order
    comparisons flip on neither engine.  threshold must be a dyadic
    rational spelled in decimal (0.375 = 3/8) so the DECIMAL->DOUBLE
    conversion is exact on both engines."""

    def dot(a: str, b: str) -> str:
        acc = f"(CAST({a}[1] AS DOUBLE) * CAST({b}[1] AS DOUBLE))"
        for i in range(1, dim):
            acc = (
                f"({acc} + (CAST({a}[{i} + 1] AS DOUBLE)"
                f" * CAST({b}[{i} + 1] AS DOUBLE)))"
            )
        return acc

    def dotc(vec: str) -> str:
        # vector x centroid: the centroid fixture is already DOUBLE[]
        acc = f"(CAST({vec}[1] AS DOUBLE) * ivf.cent[1])"
        for i in range(1, dim):
            acc = f"({acc} + (CAST({vec}[{i} + 1] AS DOUBLE) * ivf.cent[{i} + 1]))"
        return acc

    return f"""
        WITH ivf AS (SELECT cid, cent
                     FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/ivf_centroids.parquet')),
        base AS (
            SELECT vec_id, embedding,
                   sqrt({dot('embedding', 'embedding')}) AS nv
            FROM embeddings
        ),
        idot AS (
            SELECT b.vec_id, ivf.cid, {dotc('b.embedding')} AS d
            FROM base b CROSS JOIN ivf
        ),
        assigned AS (
            SELECT i.vec_id, i.cid AS cell,
                   CASE WHEN b.nv > 0 THEN i.d / b.nv ELSE 0.0 END AS centroid_sim
            FROM (
                SELECT vec_id, cid, d,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d DESC, cid ASC) AS rn
                FROM idot
            ) i
            JOIN base b ON b.vec_id = i.vec_id
            WHERE i.rn = 1
        ),
        dropped AS (
            SELECT DISTINCT b2.vec_id
            FROM assigned a
            JOIN assigned b2 ON a.cell = b2.cell AND a.vec_id <> b2.vec_id
            JOIN base ba ON ba.vec_id = a.vec_id
            JOIN base bb ON bb.vec_id = b2.vec_id
            WHERE (CASE WHEN ba.nv = 0 OR bb.nv = 0 THEN 0.0
                        ELSE {dot('ba.embedding', 'bb.embedding')}
                             / (ba.nv * bb.nv) END)
                  >= CAST({threshold} AS DOUBLE)
              AND (a.centroid_sim < b2.centroid_sim
                   OR (a.centroid_sim = b2.centroid_sim
                       AND a.vec_id < b2.vec_id))
        )
        SELECT s.vec_id, s.cell, s.centroid_sim,
               (d.vec_id IS NULL) AS keep
        FROM assigned s LEFT JOIN dropped d ON d.vec_id = s.vec_id
    """


def _cms_oracle_sql(depth: int = 4, width: int = 2048) -> str:
    """The CMS build/probe recomputed cell-for-cell: same integer hash
    constants (generated from the same Python definitions as ops/cms)."""
    p = 2147483647
    rows = ", ".join(
        f"({r}, {(2654435761 + r * 40503) % p}, {(97 + r * 1009) % p})"
        for r in range(depth)
    )
    return f"""
        WITH rs(r, a, b) AS (VALUES {rows}),
        src AS (
            SELECT l_returnflag AS g, l_partkey AS x
            FROM lineitem WHERE l_partkey IS NOT NULL
        ),
        sketch AS (
            SELECT g, r, ((a * (x % {p}) + b) % {p}) % {width} AS c,
                   count(*) AS cnt
            FROM src CROSS JOIN rs
            GROUP BY 1, 2, 3
        ),
        probes AS (
            SELECT DISTINCT l_returnflag AS g, l_partkey AS x
            FROM lineitem WHERE l_partkey % 50 = 0
        ),
        est AS (
            SELECT p.g, p.x, min(coalesce(s.cnt, 0)) AS est
            FROM probes p CROSS JOIN rs
            LEFT JOIN sketch s
              ON s.g = p.g AND s.r = rs.r
             AND s.c = ((rs.a * (p.x % {p}) + rs.b) % {p}) % {width}
            GROUP BY 1, 2
        ),
        truec AS (
            SELECT l_returnflag AS g, l_partkey AS x, count(*) AS cnt_true
            FROM lineitem WHERE l_partkey % 50 = 0
            GROUP BY 1, 2
        )
        SELECT e.g AS l_returnflag, e.x AS l_partkey, e.est,
               t.cnt_true, e.est - t.cnt_true AS over_by
        FROM est e JOIN truec t ON t.g = e.g AND t.x = e.x"""


def _cms_join_oracle_sql(depth: int = 4, width: int = 4096) -> str:
    """Both sketches + the min-of-inner-products estimate recomputed."""
    p = 2147483647
    rows = ", ".join(
        f"({r}, {(2654435761 + r * 40503) % p}, {(97 + r * 1009) % p})"
        for r in range(depth)
    )
    return f"""
        WITH rs(r, a, b) AS (VALUES {rows}),
        ska AS (
            SELECT r, ((a * (l_orderkey % {p}) + b) % {p}) % {width} AS c,
                   count(*) AS cnt
            FROM lineitem CROSS JOIN rs
            WHERE l_orderkey IS NOT NULL GROUP BY 1, 2
        ),
        skb AS (
            SELECT r, ((a * (o_orderkey % {p}) + b) % {p}) % {width} AS c,
                   count(*) AS cnt
            FROM orders CROSS JOIN rs
            WHERE o_orderkey IS NOT NULL GROUP BY 1, 2
        ),
        ip AS (
            SELECT rs.r,
                   CAST(coalesce(sum(ska.cnt * skb.cnt), 0) AS BIGINT) AS ip
            FROM rs
            LEFT JOIN ska ON ska.r = rs.r
            LEFT JOIN skb ON skb.r = ska.r AND skb.c = ska.c
            GROUP BY rs.r
        ),
        est AS (SELECT min(ip) AS join_size_est FROM ip),
        truec AS (
            SELECT count(*) AS true_size
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT join_size_est, true_size,
               join_size_est - true_size AS over_by
        FROM est CROSS JOIN truec"""


def _textrank_oracle_sql(n_iters: int = 10, k: int = 15) -> str:
    """Tokenize + window-2 pair mint relationally, then the pagerank
    recurrence unrolled (same iteration body as _pagerank_oracle_sql)."""
    base = """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> length(x) >= 2) AS t
            FROM documents WHERE doc_id % 20 = 0
        ),
        pos AS (
            SELECT doc_id, t[i] AS w, i
            FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
        ),
        und AS (
            SELECT DISTINCT least(a.w, b.w) AS word_a,
                            greatest(a.w, b.w) AS word_b
            FROM pos a JOIN pos b
              ON a.doc_id = b.doc_id AND b.i - a.i IN (1, 2)
            WHERE a.w <> b.w
        ),
        edges AS (
            SELECT word_a AS src, word_b AS dst FROM und
            UNION ALL
            SELECT word_b, word_a FROM und
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY 1),
        pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nc.n AS rank FROM nodes, nc)"""
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f""",
        pr{i} AS (
            SELECT n.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nc.n
                   + CAST(0.85 AS DOUBLE) * coalesce(s.inflow, CAST(0 AS DOUBLE)) AS rank
            FROM nodes n CROSS JOIN nc
            LEFT JOIN (
                SELECT e.dst AS node, sum(p.rank / d.outdeg) AS inflow
                FROM edges e
                JOIN pr{i - 1} p ON p.node = e.src
                JOIN deg d ON d.node = e.src
                GROUP BY 1
            ) s ON s.node = n.node
        )""")
    return base + "".join(iters) + f"""
        SELECT node AS word, floor(rank * 1000000) / 1000000 AS rank6
        FROM pr{n_iters}
        ORDER BY rank6 DESC, word
        LIMIT {k}"""


def _part_salience_oracle_sql(n_iters: int = 8, k: int = 20) -> str:
    """Pair counts (the L50 derivation) + the L129 weighted recurrence
    unrolled, composed."""
    base = """
        WITH obs AS (
            SELECT DISTINCT l_orderkey AS g, l_partkey AS item
            FROM lineitem WHERE l_orderkey % 4 = 0
        ),
        und AS (
            SELECT a.item AS item_a, b.item AS item_b,
                   CAST(count(*) AS DOUBLE) AS w
            FROM obs a JOIN obs b ON a.g = b.g AND a.item < b.item
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        edges AS (
            SELECT CAST(item_a AS VARCHAR) AS src,
                   CAST(item_b AS VARCHAR) AS dst, w FROM und
            UNION ALL
            SELECT CAST(item_b AS VARCHAR), CAST(item_a AS VARCHAR), w FROM und
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src AS node, sum(w) AS outw FROM edges GROUP BY 1),
        pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nc.n AS rank FROM nodes, nc)"""
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f""",
        pr{i} AS (
            SELECT n.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nc.n
                   + CAST(0.85 AS DOUBLE) * coalesce(s.inflow, CAST(0 AS DOUBLE)) AS rank
            FROM nodes n CROSS JOIN nc
            LEFT JOIN (
                SELECT e.dst AS node, sum(p.rank * e.w / d.outw) AS inflow
                FROM edges e
                JOIN pr{i - 1} p ON p.node = e.src
                JOIN deg d ON d.node = e.src
                GROUP BY 1
            ) s ON s.node = n.node
        )""")
    return base + "".join(iters) + f"""
        SELECT node AS part, floor(rank * 1000000) / 1000000 AS rank6
        FROM pr{n_iters}
        ORDER BY rank6 DESC, part
        LIMIT {k}"""


def _pagerank_weighted_oracle_sql(n_iters: int = 10) -> str:
    """The weighted recurrence unrolled — identical to the unweighted
    oracle with per-edge w / W_out ratios."""
    base = """
        WITH edges AS (
            SELECT 'o:' || o_orderkey AS src, 'c:' || o_custkey AS dst,
                   CAST(o_orderkey % 7 + 1 AS DOUBLE) AS w
            FROM orders WHERE o_orderkey % 200 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'n:' || c_nationkey,
                   CAST(c_custkey % 5 + 1 AS DOUBLE)
            FROM customer
            UNION ALL
            SELECT 'n:' || n_nationkey, 'r:' || n_regionkey,
                   CAST(n_nationkey % 3 + 1 AS DOUBLE)
            FROM nation
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src AS node, sum(w) AS outw FROM edges GROUP BY 1),
        pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nc.n AS rank FROM nodes, nc)"""
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f""",
        pr{i} AS (
            SELECT n.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nc.n
                   + CAST(0.85 AS DOUBLE) * coalesce(s.inflow, CAST(0 AS DOUBLE)) AS rank
            FROM nodes n CROSS JOIN nc
            LEFT JOIN (
                SELECT e.dst AS node, sum(p.rank * e.w / d.outw) AS inflow
                FROM edges e
                JOIN pr{i - 1} p ON p.node = e.src
                JOIN deg d ON d.node = e.src
                GROUP BY 1
            ) s ON s.node = n.node
        )""")
    return base + "".join(iters) + f"""
        SELECT node, floor(rank * 1000000) / 1000000 AS rank6 FROM pr{n_iters}"""


_MARKOV_TRANS_SQL = """
        WITH pairs AS (
            SELECT src, dst FROM (
                SELECT event_type AS src,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY event_id) AS dst
                FROM events
            ) WHERE src IS NOT NULL AND dst IS NOT NULL
        ),
        c AS (SELECT src, dst, count(*) AS n FROM pairs GROUP BY 1, 2),
        trans AS (
            SELECT src, dst, n,
                   CAST(n AS DOUBLE)
                       / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS prob
            FROM c
        )"""


def _markov_stationary_oracle_sql(n_iters: int = 12) -> str:
    """The power method unrolled (the L129 pagerank oracle shape): each
    iteration is one join + one grouped sum over the state-space-sized
    transition table."""
    base = (
        _MARKOV_TRANS_SQL
        + """,
        states AS (SELECT DISTINCT src AS state FROM trans),
        nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM states),
        x0 AS (SELECT state, CAST(1.0 AS DOUBLE) / nc.n AS pi FROM states, nc)"""
    )
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f""",
        x{i} AS (
            SELECT t.dst AS state, sum(x.pi * t.prob) AS pi
            FROM trans t JOIN x{i - 1} x ON x.state = t.src
            GROUP BY 1
        )""")
    return base + "".join(iters) + f"""
        SELECT state, floor(pi * 1000000) / 1000000 AS pi6 FROM x{n_iters}"""


def _pagerank_oracle_sql(n_iters: int = 10) -> str:
    """The pagerank recurrence unrolled as CTEs (standard SQL forbids
    aggregation in a recursive term, so fixed iterations unroll)."""
    base = """
        WITH edges AS (
            SELECT 'o:' || o_orderkey AS src, 'c:' || o_custkey AS dst
            FROM orders WHERE o_orderkey % 200 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY 1),
        pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nc.n AS rank FROM nodes, nc)"""
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f""",
        pr{i} AS (
            SELECT n.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nc.n
                   + CAST(0.85 AS DOUBLE) * coalesce(s.inflow, CAST(0 AS DOUBLE)) AS rank
            FROM nodes n CROSS JOIN nc
            LEFT JOIN (
                SELECT e.dst AS node, sum(p.rank / d.outdeg) AS inflow
                FROM edges e
                JOIN pr{i - 1} p ON p.node = e.src
                JOIN deg d ON d.node = e.src
                GROUP BY 1
            ) s ON s.node = n.node
        )""")
    return base + "".join(iters) + f"""
        SELECT node, floor(rank * 1000000) / 1000000 AS rank6 FROM pr{n_iters}"""


def _sssp_oracle_sql(rounds: int = 3) -> str:
    """The min-plus Bellman-Ford recurrence unrolled — each round
    references the previous twice (carry + relax), so MATERIALIZED."""
    base = """
        WITH e AS MATERIALIZED (
            SELECT 'r:' || n_regionkey AS src, 'n:' || n_nationkey AS dst,
                   n_nationkey % 3 + 1 AS w
            FROM nation
            UNION ALL
            SELECT 'n:' || c_nationkey, 'c:' || c_custkey,
                   c_custkey % 7 + 1
            FROM customer
            UNION ALL
            SELECT 'c:' || o_custkey, 'o:' || o_orderkey,
                   o_orderkey % 11 + 1
            FROM orders WHERE o_orderkey % 50 = 0
        ),
        d0 AS (SELECT 'r:0' AS node, CAST(0 AS BIGINT) AS dist)"""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f""",
        d{i} AS MATERIALIZED (
            SELECT node, min(dist) AS dist FROM (
                SELECT node, dist FROM d{i - 1}
                UNION ALL
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d{i - 1} d JOIN e ON d.node = e.src
            ) GROUP BY node
        )""")
    return base + "".join(steps) + f"""
        SELECT node, dist FROM d{rounds}"""


def _kcore_oracle_sql(k: int = 3, rounds: int = 8) -> str:
    """The k-core peel rule unrolled for ``rounds`` rounds — correct as
    long as rounds ≥ the fixture's peel depth (idempotent thereafter,
    the fixpoint argument in graph/kcore.py)."""
    base = """
        WITH po AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 4 = 0
        ),
        e0 AS (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM po a JOIN po b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey
        )"""
    steps = []
    # AS MATERIALIZED: each round references the previous one twice;
    # DuckDB's default CTE inlining would re-evaluate the whole chain
    # per reference (2^rounds blowup)
    for i in range(1, rounds + 1):
        steps.append(f""",
        n{i} AS MATERIALIZED (
            SELECT a AS node FROM e{i - 1} GROUP BY a
            HAVING count(*) >= {k}
        ),
        e{i} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{i - 1} e
            JOIN n{i} x ON e.a = x.node
            JOIN n{i} y ON e.b = y.node
        )""")
    return base + "".join(steps) + f"""
        SELECT a AS node, count(*) AS degree FROM e{rounds} GROUP BY a"""


def _ktruss_oracle_sql(k: int = 4, rounds: int = 7) -> str:
    """The k-truss support-peel rule unrolled for ``rounds`` rounds —
    correct once rounds ≥ the fixture's peel depth (fixpoint argument
    in graph/ktruss.py; the kcore oracle discipline on edges).  Each
    round enumerates ORIENTED triangles (x < y < z), explodes them to
    their three edges, and keeps edges with support ≥ k−2."""
    base = """
        WITH po AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 4 = 0
        ),
        e0 AS (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM po a JOIN po b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )"""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f""",
        t{i} AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e{i - 1} e1
            JOIN e{i - 1} e2 ON e1.a = e2.a AND e1.b < e2.b
            JOIN e{i - 1} e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        s{i} AS MATERIALIZED (
            SELECT a, b, count(*) AS sup FROM (
                SELECT x AS a, y AS b FROM t{i}
                UNION ALL SELECT x, z FROM t{i}
                UNION ALL SELECT y, z FROM t{i}
            ) GROUP BY 1, 2
        ),
        e{i} AS MATERIALIZED (
            SELECT a, b FROM s{i} WHERE sup >= {k - 2}
        )""")
    return base + "".join(steps) + f"""
        SELECT a, b, sup AS support FROM s{rounds} WHERE sup >= {k - 2}"""


def _hits_oracle_sql(n_iters: int = 5) -> str:
    """The max-normalized HITS recurrence unrolled as CTEs — the
    `_pagerank_oracle_sql` discipline (standard SQL forbids aggregation
    in a recursive term, so fixed iterations unroll)."""
    base = """
        WITH edges AS (
            SELECT 'o:' || o_orderkey AS src, 'c:' || o_custkey AS dst
            FROM orders WHERE o_orderkey % 200 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes)"""
    iters = []
    # AS MATERIALIZED: each normalization references its raw CTE twice
    # (FROM + scalar max); DuckDB's default inlining would re-evaluate
    # the full recurrence per reference (exponential across iterations)
    for i in range(1, n_iters + 1):
        iters.append(f""",
        ar{i} AS MATERIALIZED (
            SELECT e.dst AS node, sum(h.hub) AS a
            FROM edges e JOIN h{i - 1} h ON h.node = e.src
            GROUP BY 1
        ),
        a{i} AS MATERIALIZED (
            SELECT node, a / (SELECT max(a) FROM ar{i}) AS auth FROM ar{i}
        ),
        hr{i} AS MATERIALIZED (
            SELECT e.src AS node, sum(a.auth) AS h
            FROM edges e JOIN a{i} a ON a.node = e.dst
            GROUP BY 1
        ),
        h{i} AS MATERIALIZED (
            SELECT node, h / (SELECT max(h) FROM hr{i}) AS hub FROM hr{i}
        )""")
    return base + "".join(iters) + f"""
        SELECT n.node,
               floor(coalesce(h.hub, 0) * 1000000) / 1000000 AS hub6,
               floor(coalesce(a.auth, 0) * 1000000) / 1000000 AS auth6
        FROM nodes n
        LEFT JOIN h{n_iters} h ON h.node = n.node
        LEFT JOIN a{n_iters} a ON a.node = n.node"""


def _ppr_oracle_sql(n_iters: int = 10) -> str:
    """Personalized-PageRank recurrence (restart mass on {n:0, n:1})
    unrolled as CTEs — the `_pagerank_oracle_sql` discipline with the
    teleport term personalized to the source set."""
    base = """
        WITH edges AS (
            SELECT 'o:' || o_orderkey AS src, 'c:' || o_custkey AS dst
            FROM orders WHERE o_orderkey % 200 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        ),
        srcs AS (SELECT 'n:0' AS node UNION ALL SELECT 'n:1'),
        nodes AS (
            SELECT src AS node FROM edges
            UNION SELECT dst FROM edges
            UNION SELECT node FROM srcs
        ),
        deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY 1),
        rst AS (
            SELECT a.node,
                   CASE WHEN s.node IS NOT NULL
                        THEN CAST(1.0 AS DOUBLE) / 2 ELSE CAST(0 AS DOUBLE) END AS restart
            FROM nodes a LEFT JOIN srcs s ON s.node = a.node
        ),
        pr0 AS (SELECT node, restart AS rank FROM rst)"""
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f""",
        pr{i} AS (
            SELECT r.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * r.restart
                   + CAST(0.85 AS DOUBLE) * coalesce(s.inflow, CAST(0 AS DOUBLE)) AS rank
            FROM rst r
            LEFT JOIN (
                SELECT e.dst AS node, sum(p.rank / d.outdeg) AS inflow
                FROM edges e
                JOIN pr{i - 1} p ON p.node = e.src
                JOIN deg d ON d.node = e.src
                GROUP BY 1
            ) s ON s.node = r.node
        )""")
    return base + "".join(iters) + f"""
        SELECT node, floor(rank * 1000000) / 1000000 AS rank6 FROM pr{n_iters}"""


def oracle_sql() -> dict[str, str]:
    oracles = {
        "filter_project": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_discount BETWEEN 0.02 AND 0.06
              AND l_quantity < 24
        """,
        "agg_returnflag": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS total_price
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "window_dedup": """
            SELECT l_orderkey, l_partkey, round(l_quantity, 2) AS first_qty
            FROM (
                SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
                FROM lineitem
            ) WHERE rn = 1
        """,
        "broadcast_join_brand": """
            SELECT p_brand, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        "semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "anti_join": """
            SELECT c_custkey, c_nationkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "region_revenue": """
            SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "schema_evolution": """
            SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   CAST(NULL AS DOUBLE) AS c_acctbal,
                   CAST(NULL AS VARCHAR) AS c_mktsegment
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT),
                   c_acctbal, CAST(NULL AS VARCHAR)
            FROM customer WHERE c_custkey % 3 = 1
            UNION ALL
            SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT),
                   c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey % 3 = 2
        """,
        "neighborhood_function": """
            WITH RECURSIVE e AS (
                SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst
                FROM customer WHERE c_custkey % 100 = 0
                UNION ALL
                SELECT 'c:' || a.c_custkey, 'c:' || b.c_custkey
                FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 100
                WHERE a.c_custkey % 100 = 0 AND b.c_custkey % 100 = 0
                UNION ALL
                SELECT 'n:' || n_nationkey, 'n:' || ((n_nationkey + 1) % 25)
                FROM nation
            ),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            reach(node, dest, d) AS (
                SELECT node, node, 0 FROM nodes
                UNION
                SELECT r.node, e.dst, r.d + 1
                FROM reach r JOIN e ON e.src = r.dest WHERE r.d < 3
            ),
            mind AS (SELECT node, dest, min(d) AS d FROM reach GROUP BY 1, 2),
            nf AS (
                SELECT g.t, count(*) AS n_pairs
                FROM mind m CROSS JOIN (VALUES (0),(1),(2),(3)) g(t)
                WHERE m.d <= g.t
                GROUP BY g.t
            )
            SELECT t, n_pairs,
                   round(n_pairs / (SELECT max(n_pairs) FROM nf), 6) AS frac
            FROM nf
        """,
        "cdc_apply": """
            WITH ch AS (
                SELECT c_custkey AS k, c_name, c_nationkey,
                       c_acctbal + 1000.0 AS c_acctbal,
                       'CDC_V1' AS c_mktsegment, 'U' AS op, 1 AS seq
                FROM customer WHERE c_custkey % 13 = 0
                UNION ALL
                SELECT c_custkey, c_name, c_nationkey, c_acctbal + 2000.0,
                       'CDC_V2', 'U', 2
                FROM customer WHERE c_custkey % 13 = 0
                UNION ALL
                SELECT c_custkey, NULL, NULL, NULL, NULL, 'D', 3
                FROM customer WHERE c_custkey % 29 = 0
                UNION ALL
                SELECT c_custkey + 2000000, 'cdc-' || c_name, c_nationkey,
                       0.0, 'NEW', 'I', 1
                FROM customer WHERE c_custkey % 41 = 0
            ),
            win AS (
                SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
                FROM ch
            )
            SELECT k AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM win WHERE rn = 1 AND op <> 'D'
            UNION ALL
            SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer b
            WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.k = b.c_custkey)
        """,
        "weighted_sample": """
            -- identical A-ES priority: -ln((knuth(key)+0.5)/2^32)/w,
            -- (priority, key) tie-break, row_number <= k per lang
            WITH pri AS (
                SELECT doc_id, lang, n_chars,
                       -ln((((doc_id % 2147483648) * 2654435761)
                             % 4294967296 + 0.5) / 4294967296.0)
                           / CAST(n_chars AS DOUBLE) AS p
                FROM documents
            )
            SELECT doc_id, lang, n_chars
            FROM (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (PARTITION BY lang ORDER BY p, doc_id) AS rn
                FROM pri
            )
            WHERE rn <= 5
        """,
        "cohort_retention": """
            WITH ev AS (
                SELECT DISTINCT user_id AS u,
                       CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS p
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value > 190
            ),
            o AS (
                SELECT u,
                       min(p) OVER (PARTITION BY u) AS cohort_p,
                       CAST((p - min(p) OVER (PARTITION BY u)) / 86400 AS INT)
                           AS "offset"
                FROM ev
            ),
            c AS (
                SELECT cohort_p, "offset", count(DISTINCT u) AS n_active
                FROM o GROUP BY 1, 2
            )
            SELECT CAST(to_timestamp(cohort_p) AS TIMESTAMP) AS cohort_period,
                   "offset", n_active,
                   round(n_active / max(CASE WHEN "offset" = 0 THEN n_active END)
                             OVER (PARTITION BY cohort_p), 6) AS retention
            FROM c
        """,
        "funnel": """
            -- the fold's greedy-first chain as sequential
            -- conditional-min joins; epoch floored to whole seconds to
            -- mirror Spark's unix_timestamp truncation
            WITH f AS (
                SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                       event_type AS s
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND event_type IN ('signup', 'view', 'click', 'purchase')
            ),
            s0 AS (SELECT u, min(t) AS t0 FROM f WHERE s = 'signup' GROUP BY u),
            s1 AS (
                SELECT f.u, min(t) AS t1 FROM f JOIN s0 USING (u)
                WHERE s = 'view' AND t > t0 AND t - t0 <= 259200 GROUP BY f.u
            ),
            s2 AS (
                SELECT f.u, min(t) AS t2
                FROM f JOIN s1 USING (u) JOIN s0 USING (u)
                WHERE s = 'click' AND t > t1 AND t - t0 <= 259200 GROUP BY f.u
            ),
            s3 AS (
                SELECT f.u, min(t) AS t3
                FROM f JOIN s2 USING (u) JOIN s0 USING (u)
                WHERE s = 'purchase' AND t > t2 AND t - t0 <= 259200 GROUP BY f.u
            ),
            d AS (
                SELECT u,
                       CASE WHEN u IN (SELECT u FROM s3) THEN 4
                            WHEN u IN (SELECT u FROM s2) THEN 3
                            WHEN u IN (SELECT u FROM s1) THEN 2
                            WHEN u IN (SELECT u FROM s0) THEN 1
                            ELSE 0 END AS depth
                FROM (SELECT DISTINCT u FROM f)
            )
            SELECT g.k AS steps_completed,
                   CAST(coalesce(c.n, 0) AS BIGINT) AS n_users
            FROM (VALUES (0), (1), (2), (3), (4)) g(k)
            LEFT JOIN (SELECT depth, count(*) AS n FROM d GROUP BY depth) c
                   ON c.depth = g.k
        """,
        "expectations_summary": """
            SELECT 'r00_not_null_c_name' AS rule_id, 'not_null' AS kind,
                   'c_name' AS target,
                   count(*) FILTER (WHERE c_name IS NULL) AS n_violations
            FROM customer
            UNION ALL
            SELECT 'r01_in_range_c_acctbal', 'in_range', 'c_acctbal',
                   count(*) FILTER (WHERE c_acctbal IS NOT NULL
                                    AND (c_acctbal < 0.0 OR c_acctbal > 5000.0))
            FROM customer
            UNION ALL
            SELECT 'r02_regex_c_name', 'regex', 'c_name',
                   count(*) FILTER (WHERE c_name IS NOT NULL
                                    AND NOT regexp_matches(c_name, '^Customer#[0-9]{9}$'))
            FROM customer
            UNION ALL
            SELECT 'r03_in_set_c_mktsegment', 'in_set', 'c_mktsegment',
                   count(*) FILTER (WHERE c_mktsegment IS NOT NULL
                                    AND c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE'))
            FROM customer
            UNION ALL
            SELECT 'r04_unique_c_custkey', 'unique', 'c_custkey',
                   CAST(coalesce(sum(n), 0) AS BIGINT)
            FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey HAVING count(*) > 1)
            UNION ALL
            SELECT 'r05_ref_c_nationkey', 'ref', 'c_nationkey',
                   count(*) FILTER (WHERE c_nationkey IS NOT NULL AND NOT EXISTS (
                       SELECT 1 FROM nation WHERE n_nationkey = c_nationkey))
            FROM customer
        """,
        "quarantine": """
            -- concat_ws skips the NULL CASE arms; rule ids are
            -- index-ordered which equals the sorted-array order
            SELECT c_custkey, c_acctbal, c_mktsegment,
                   concat_ws(',',
                       CASE WHEN c_acctbal IS NOT NULL
                                 AND (c_acctbal < 0.0 OR c_acctbal > 5000.0)
                            THEN 'r00_in_range_c_acctbal' END,
                       CASE WHEN c_mktsegment IS NOT NULL
                                 AND c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE')
                            THEN 'r01_in_set_c_mktsegment' END
                   ) AS violated_csv
            FROM customer
            WHERE (c_acctbal IS NOT NULL AND (c_acctbal < 0.0 OR c_acctbal > 5000.0))
               OR (c_mktsegment IS NOT NULL
                   AND c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE'))
        """,
        "gap_fill": """
            -- spine via generate_series, fill via IGNORE NULLS window
            -- sweep with the identical interpolation arithmetic
            WITH obs AS (
                SELECT user_id,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS b,
                       max(value) AS v
                FROM events
                WHERE user_id % 97 = 0 AND ts IS NOT NULL AND value IS NOT NULL
                GROUP BY 1, 2
            ),
            span AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM obs GROUP BY 1),
            spine AS (
                SELECT user_id, unnest(generate_series(b0, b1, 3600)) AS b FROM span
            ),
            g AS (
                SELECT s.user_id, s.b, o.v
                FROM spine s LEFT JOIN obs o USING (user_id, b)
            ),
            w AS (
                SELECT user_id, b, v,
                    last_value(v IGNORE NULLS) OVER back AS pv,
                    last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
                        OVER back AS pt,
                    first_value(v IGNORE NULLS) OVER fwd AS nv,
                    first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
                        OVER fwd AS nt
                FROM g
                WINDOW back AS (PARTITION BY user_id ORDER BY b
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       fwd AS (PARTITION BY user_id ORDER BY b
                               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            )
            SELECT user_id,
                   CAST(to_timestamp(b) AS TIMESTAMP) AS bucket_ts,
                   round(CASE WHEN v IS NOT NULL THEN v
                              WHEN pt IS NULL THEN nv
                              WHEN nt IS NULL THEN pv
                              ELSE pv + (nv - pv) * ((b - pt) / (nt - pt))
                         END, 6) AS value,
                   v IS NOT NULL AS is_observed
            FROM w
        """,
        "hyperball": """
            -- recursive-CTE BFS min-distances, then count nodes within
            -- each radius; HLL is exact in the sparse regime at this
            -- scale so integer equality holds
            WITH RECURSIVE e AS (
                SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst
                FROM customer WHERE c_custkey % 100 = 0
                UNION ALL
                SELECT 'c:' || a.c_custkey, 'c:' || b.c_custkey
                FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 100
                WHERE a.c_custkey % 100 = 0 AND b.c_custkey % 100 = 0
                UNION ALL
                SELECT 'n:' || n_nationkey, 'n:' || ((n_nationkey + 1) % 25)
                FROM nation
            ),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            reach(node, dest, d) AS (
                SELECT node, node, 0 FROM nodes
                UNION
                SELECT r.node, e.dst, r.d + 1
                FROM reach r JOIN e ON e.src = r.dest WHERE r.d < 3
            ),
            mind AS (SELECT node, dest, min(d) AS d FROM reach GROUP BY 1, 2)
            SELECT m.node, g.t, count(*) AS ball_est
            FROM mind m CROSS JOIN (VALUES (0),(1),(2),(3)) g(t)
            WHERE m.d <= g.t
            GROUP BY 1, 2
        """,
        "harmonic_centrality": """
            WITH RECURSIVE e AS (
                SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst
                FROM customer WHERE c_custkey % 100 = 0
                UNION ALL
                SELECT 'c:' || a.c_custkey, 'c:' || b.c_custkey
                FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 100
                WHERE a.c_custkey % 100 = 0 AND b.c_custkey % 100 = 0
                UNION ALL
                SELECT 'n:' || n_nationkey, 'n:' || ((n_nationkey + 1) % 25)
                FROM nation
            ),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            reach(node, dest, d) AS (
                SELECT node, node, 0 FROM nodes
                UNION
                SELECT r.node, e.dst, r.d + 1
                FROM reach r JOIN e ON e.src = r.dest WHERE r.d < 3
            ),
            mind AS (SELECT node, dest, min(d) AS d FROM reach GROUP BY 1, 2)
            SELECT node,
                   round(coalesce(sum(CASE WHEN d > 0 THEN 1.0 / d END), 0), 6)
                       AS harmonic
            FROM mind
            GROUP BY node
        """,
        "bloom_semi_join": """
            -- bloom pruning is exact after the final semi join: the
            -- oracle is the plain EXISTS form, row-for-row
            SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
            FROM lineitem
            WHERE EXISTS (
                SELECT 1 FROM part
                WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
            )
        """,
        "sketch_rollup": """
            -- exact side recomputed; the sketch estimate is asserted
            -- only through its tolerance flag (L23 oracle pattern)
            SELECT r_name,
                   count(DISTINCT n_name) AS n_groups_merged,
                   count(DISTINCT c_custkey) AS exact_distinct,
                   TRUE AS within_2pct
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "table_diff": """
            -- upserted snapshot re-derived, then FULL OUTER JOIN +
            -- null-safe per-column comparison mirroring ops/tablediff
            WITH upd AS (
                SELECT c_custkey, c_name, c_nationkey,
                       c_acctbal + 1000.0 AS c_acctbal,
                       'UPSERTED' AS c_mktsegment
                FROM customer WHERE c_custkey % 13 = 0
                UNION ALL
                SELECT c_custkey + 1000000, 'new-' || c_name, c_nationkey,
                       0.0, 'NEW'
                FROM customer WHERE c_custkey % 41 = 0
            ),
            merged AS (
                SELECT * FROM upd
                UNION ALL
                SELECT b.* FROM customer b
                WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = b.c_custkey)
            ),
            j AS (
                SELECT coalesce(l.c_custkey, r.c_custkey) AS c_custkey,
                       l.c_custkey IS NOT NULL AS in_l,
                       r.c_custkey IS NOT NULL AS in_r,
                       l.c_name IS DISTINCT FROM r.c_name AS d_name,
                       l.c_nationkey IS DISTINCT FROM r.c_nationkey AS d_nk,
                       l.c_acctbal IS DISTINCT FROM r.c_acctbal AS d_bal,
                       l.c_mktsegment IS DISTINCT FROM r.c_mktsegment AS d_seg,
                       l.c_mktsegment AS left_c_mktsegment,
                       r.c_mktsegment AS right_c_mktsegment,
                       round(l.c_acctbal, 2) AS left_bal,
                       round(r.c_acctbal, 2) AS right_bal
                FROM customer l FULL OUTER JOIN merged r USING (c_custkey)
            ),
            k AS (
                SELECT *,
                       CASE WHEN NOT in_l THEN 'added'
                            WHEN NOT in_r THEN 'removed'
                            WHEN d_name OR d_nk OR d_bal OR d_seg THEN 'changed'
                            ELSE 'unchanged' END AS diff_kind
                FROM j
            )
            SELECT c_custkey, diff_kind,
                   CASE WHEN diff_kind = 'changed' THEN list_sort(list_filter([
                            CASE WHEN d_bal THEN 'c_acctbal' END,
                            CASE WHEN d_seg THEN 'c_mktsegment' END,
                            CASE WHEN d_name THEN 'c_name' END,
                            CASE WHEN d_nk THEN 'c_nationkey' END
                        ], x -> x IS NOT NULL))
                        ELSE CAST([] AS VARCHAR[]) END AS changed_cols,
                   left_c_mktsegment, right_c_mktsegment, left_bal, right_bal
            FROM k WHERE diff_kind <> 'unchanged'
        """,
        "pit_join": """
            -- SCD2 dimension re-derived (same as the scd2 oracle), then
            -- the relational point-in-time interval join
            WITH m AS (
                SELECT user_id, ts, event_type,
                       row_number() OVER w = 1
                       OR event_type IS DISTINCT FROM lag(event_type) OVER w AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
            ),
            p AS (SELECT user_id, ts AS valid_from, event_type FROM m WHERE chg),
            dim AS (
                SELECT user_id, valid_from, event_type,
                       lead(valid_from) OVER (PARTITION BY user_id
                                              ORDER BY valid_from, event_type) AS valid_to
                FROM p
            )
            SELECT e.event_id, e.user_id, d.event_type AS regime
            FROM events e
            LEFT JOIN dim d
              ON e.user_id = d.user_id
             AND e.ts >= d.valid_from
             AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        """,
        "streaming_heavy_hitters": """
            -- k=64 > vocab: zero evictions, streaming MG state == exact
            -- counts, so the oracle is the plain unigram GROUP BY
            WITH toks AS (
                SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
                FROM documents
            )
            SELECT term, count(*) AS n FROM toks WHERE length(term) > 0 GROUP BY term
        """,
        "merge_upsert": """
            -- MERGE INTO as relational algebra: the update delta wins
            -- on matched keys, base survives only where no update key
            WITH upd AS (
                SELECT c_custkey, c_name, c_nationkey,
                       round(c_acctbal + 1000.0, 2) AS c_acctbal,
                       'UPSERTED' AS c_mktsegment
                FROM customer WHERE c_custkey % 13 = 0
                UNION ALL
                SELECT c_custkey + 1000000, 'new-' || c_name, c_nationkey,
                       0.0, 'NEW'
                FROM customer WHERE c_custkey % 41 = 0
            )
            SELECT c_custkey, c_name, c_nationkey,
                   round(c_acctbal, 2) AS c_acctbal, c_mktsegment
            FROM upd
            UNION ALL
            SELECT b.c_custkey, b.c_name, b.c_nationkey,
                   round(b.c_acctbal, 2), b.c_mktsegment
            FROM customer b
            WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = b.c_custkey)
        """,
        "scd2": """
            -- change-point detection + interval chaining, (ts, attr)
            -- tiebreak order matching ops/scd.scd2_collapse exactly
            WITH m AS (
                SELECT user_id, ts, event_type,
                       row_number() OVER w = 1
                       OR event_type IS DISTINCT FROM lag(event_type) OVER w AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
            ),
            p AS (SELECT user_id, ts AS valid_from, event_type FROM m WHERE chg)
            SELECT user_id, valid_from, event_type,
                   lead(valid_from) OVER w2 AS valid_to,
                   lead(valid_from) OVER w2 IS NULL AS is_current
            FROM p
            WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_type)
        """,
        "profile_table": """
            -- one UNION ALL arm per profiled column, mirroring the
            -- single-agg profile row-for-row (n_distinct excludes NULLs)
            SELECT 'o_orderkey' AS column, count(*) AS n_rows,
                   count(*) - count(o_orderkey) AS n_nulls,
                   count(DISTINCT o_orderkey) AS n_distinct,
                   CAST(min(o_orderkey) AS VARCHAR) AS min_value,
                   CAST(max(o_orderkey) AS VARCHAR) AS max_value
            FROM orders
            UNION ALL
            SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
                   count(DISTINCT o_custkey),
                   CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
                   count(DISTINCT o_orderstatus),
                   min(o_orderstatus), max(o_orderstatus)
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
                   count(DISTINCT o_orderpriority),
                   min(o_orderpriority), max(o_orderpriority)
            FROM orders
        """,
        "salted_join": """
            -- the salt is physical only: the oracle is the PLAIN join
            SELECT p_type,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        "pivot_events": """
            SELECT user_id % 10 AS user_bucket,
                   count(*) FILTER (WHERE event_type = 'click') AS n_click,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view,
                   count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                   round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value
            FROM events GROUP BY 1
        """,
        "closure": """
            WITH RECURSIVE edges AS (
                SELECT 'o:' || o_orderkey AS child, 'c:' || o_custkey AS parent
                FROM orders WHERE o_orderkey % 200 = 0
                UNION ALL
                SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
                UNION ALL
                SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
            ),
            closure AS (
                SELECT child AS descendant, parent AS ancestor, 1 AS depth FROM edges
                UNION ALL
                SELECT c.descendant, e.parent, c.depth + 1
                FROM closure c JOIN edges e ON c.ancestor = e.child
            )
            SELECT DISTINCT descendant, ancestor, depth FROM closure
        """,
        "argmax_link": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 8),
            scored AS (
                SELECT q.query_id, e.vec_id AS cand_id,
                       list_cosine_similarity(q.qvec, e.embedding) AS cos
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, cand_id AS best_id
            FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rn
                FROM scored
            ) WHERE rn = 1
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qvec, e.embedding) AS cos
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, rn AS rank, neighbor_id
            FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
                FROM scored
            ) WHERE rn <= 3
        """,
        "knn_lsh": """
            WITH b AS (
                SELECT vec_id, embedding,
                       (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                     + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) AS bucket
                FROM embeddings
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qvec, bucket FROM b WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qvec, e.embedding) AS cos
                FROM b e JOIN q ON e.bucket = q.bucket
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, rn AS rank, neighbor_id
            FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
                FROM scored
            ) WHERE rn <= 3
        """,
        "knn_ivf": """
            -- exhaustive top-k over the clustered lift: the Spark side must
            -- reproduce this exactly through its trained IVF index
            WITH v AS (
                SELECT vec_id,
                       [embedding[i+1] + CASE WHEN i = label THEN 6.0 ELSE 0.0 END
                        FOR i IN range(len(embedding))] AS embedding
                FROM embeddings
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qvec FROM v WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qvec, e.embedding) AS cos
                FROM v e CROSS JOIN q
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, rn AS rank, neighbor_id
            FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
                FROM scored
            ) WHERE rn <= 3
        """,
        "asof_join": """
            WITH tagged AS (
                SELECT user_id, ts, 0 AS side, event_id AS tie,
                       event_id AS c_event_id, ts AS c_ts,
                       NULL::BIGINT AS purchase_id
                FROM events WHERE event_type = 'click'
                UNION ALL
                SELECT user_id, ts, 1 AS side, event_id AS tie,
                       NULL, NULL, event_id
                FROM events WHERE event_type = 'purchase'
            ),
            swept AS (
                SELECT *,
                       last_value(c_event_id IGNORE NULLS) OVER w AS click_event_id,
                       last_value(c_ts IGNORE NULLS) OVER w AS click_ts
                FROM tagged
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, tie
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT user_id, purchase_id, ts AS purchase_ts, click_event_id, click_ts
            FROM swept WHERE side = 1
        """,
        "outer_join": """
            SELECT n_name, count(s_suppkey) AS n_suppliers,
                   round(sum(coalesce(s_acctbal, 0.0)), 2) AS total_acctbal
            FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
            GROUP BY 1
        """,
        "max_by": """
            SELECT n_name,
                   arg_max(s_name, s_acctbal) AS top_supplier,
                   arg_min(s_name, s_acctbal) AS bottom_supplier,
                   round(max(s_acctbal), 2) AS max_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS canonical_id
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_jaccard": f"""
            WITH {_SHINGLES_CTE},
            ok AS (SELECT shingle FROM sh_nonempty GROUP BY 1 HAVING count(*) <= 50),
            shf AS (SELECT s.* FROM sh_nonempty s JOIN ok USING (shingle)),
            sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
            shared AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
                FROM shf a JOIN shf b USING (shingle)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, n_shared, sa.n AS n_a, sb.n AS n_b
            FROM shared
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE n_shared >= 0.6 * (sa.n + sb.n - n_shared)
        """,
        "containment": f"""
            WITH {_SHINGLES_CTE},
            ok AS (SELECT shingle FROM sh_nonempty GROUP BY 1
                   HAVING count(*) <= 50),
            shf AS (SELECT s.* FROM sh_nonempty s JOIN ok USING (shingle)),
            sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
            shared AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS n_shared
                FROM shf a JOIN shf b USING (shingle)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, n_shared, sa.n AS n_a, sb.n AS n_b,
                   CAST(n_shared AS DOUBLE) / CAST(sa.n AS DOUBLE)
                       AS cont_a,
                   CAST(n_shared AS DOUBLE) / CAST(sb.n AS DOUBLE)
                       AS cont_b
            FROM shared
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE n_shared >= 0.5 * sa.n OR n_shared >= 0.5 * sb.n
        """,
        "ccf": """
            -- cross-correlation: exact decimal centring, the n²
            -- cancels; r = num / (sqrt(dx)·sqrt(dy)) — Spark's trees
            WITH base AS (
                SELECT user_id, ts, event_id,
                       CAST(value AS DECIMAL(18,2)) AS x,
                       CAST(event_id % 7 AS DECIMAL(18,2)) AS y
                FROM events WHERE user_id < 40 AND value IS NOT NULL
            ),
            stats AS (
                SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS DECIMAL(19,2)) AS sx,
                       CAST(sum(y) AS DECIMAL(19,2)) AS sy
                FROM base GROUP BY 1
            ),
            centred AS (
                SELECT b.user_id, st.n, b.ts, b.event_id,
                       CAST(CAST(st.n AS DECIMAL(10,0)) * b.x - st.sx
                            AS DECIMAL(19,2)) AS cx,
                       CAST(CAST(st.n AS DECIMAL(10,0)) * b.y - st.sy
                            AS DECIMAL(19,2)) AS cy
                FROM base b JOIN stats st ON b.user_id = st.user_id
            ),
            lagged AS (
                SELECT user_id, n, cx, cy,
                       lag(cy, 0) OVER w AS l0,
                       lag(cy, 1) OVER w AS l1,
                       lag(cy, 2) OVER w AS l2,
                       lag(cy, 3) OVER w AS l3
                FROM centred
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sums AS (
                SELECT user_id, n,
                       sum(cx * cx) AS dx, sum(cy * cy) AS dy,
                       sum(cx * l0) AS n0, sum(cx * l1) AS n1,
                       sum(cx * l2) AS n2, sum(cx * l3) AS n3
                FROM lagged GROUP BY 1, 2
            )
            SELECT user_id, CAST(lag AS INTEGER) AS lag, n,
                   CASE WHEN dx > 0 AND dy > 0 AND num IS NOT NULL
                        THEN CAST(num AS DOUBLE)
                             / (sqrt(CAST(dx AS DOUBLE))
                                * sqrt(CAST(dy AS DOUBLE)))
                   END AS r
            FROM (
                SELECT user_id, n, dx, dy, 0 AS lag, n0 AS num FROM sums
                UNION ALL
                SELECT user_id, n, dx, dy, 1, n1 FROM sums
                UNION ALL
                SELECT user_id, n, dx, dy, 2, n2 FROM sums
                UNION ALL
                SELECT user_id, n, dx, dy, 3, n3 FROM sums
            )
        """,
        "srm": """
            SELECT n_a, n_b,
                   CASE WHEN n_a + n_b > 0 THEN
                       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE) END AS chi2
            FROM (
                SELECT CAST(sum(CASE WHEN user_id % 2 = 0
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                       CAST(sum(CASE WHEN user_id % 2 <> 0
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_b
                FROM events
            )
        """,
        "dedup_minhash": f"""
            WITH {_MINHASH_PAIRS_CTE}
            SELECT doc_a, doc_b FROM mh_pairs
        """,
        "dedup_clusters": f"""
            -- connected components as min-reachable-label over the same
            -- MinHash pair relation (symmetric closure, recursive CTE)
            WITH RECURSIVE {_MINHASH_PAIRS_CTE},
            und AS (
                SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                UNION
                SELECT doc_b, doc_a FROM mh_pairs
            ),
            reach AS (
                SELECT DISTINCT a AS node, a AS lbl FROM und
                UNION
                SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.node
            )
            SELECT node AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY 1
        """,
        "range_join": """
            WITH bands AS (
                SELECT CAST(i.range AS INT) AS band,
                       i.range * 10000.0 AS lo, (i.range + 1) * 10000.0 AS hi
                FROM range(60) i
            )
            SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY 1
        """,
        "curate": f"""
            -- the per-operator SQL twins composed end-to-end: quality
            -- gate FIRST (so a junk canonical can't evict clean dups),
            -- then minhash pairs -> components -> canonical-only ->
            -- chunk -> pack over the survivors
            WITH RECURSIVE qkept AS (
                SELECT doc_id, text FROM documents
                WHERE floor((least(len(string_split_regex(trim(text), '\\s+')) / 64.0, 1.0) * 0.4
                          + len(list_distinct(string_split_regex(trim(text), '\\s+'))) * 1.0
                            / len(string_split_regex(trim(text), '\\s+')) * 0.4
                          + (1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) * 4.0
                                         / greatest(length(text), 1), 1.0)) * 0.2) * 10000) / 10000 >= 0.7
            ),
            {_minhash_pairs_cte("qkept")},
            und AS (
                SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                UNION
                SELECT doc_b, doc_a FROM mh_pairs
            ),
            reach AS (
                SELECT DISTINCT a AS node, a AS lbl FROM und
                UNION
                SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.node
            ),
            dropped AS (
                SELECT node AS doc_id FROM reach GROUP BY 1
                HAVING node <> min(lbl)
            ),
            kept AS (
                SELECT doc_id, text FROM qkept
                WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
            ),
            tk AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS nr
                FROM kept
            ),
            chunks AS (
                SELECT doc_id, CAST(i AS INT) AS chunk_idx, CAST(doc_id % 8 AS INT) AS shard,
                       array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text,
                       CAST(greatest(least(nr - i*24, 32), 0) AS INT) AS n_chunk_tokens
                FROM tk, unnest(range(1 + CAST(ceil(greatest(nr - 32, 0)/24.0) AS INT))) AS u(i)
                WHERE i*24 < greatest(nr, 1)
            )
            SELECT doc_id, chunk_idx, shard,
                   CAST(sum(n_chunk_tokens) OVER w - n_chunk_tokens AS BIGINT) AS tok_offset,
                   CAST(floor((sum(n_chunk_tokens) OVER w - n_chunk_tokens) / 64.0) AS INT) AS bin_id,
                   chunk_text, n_chunk_tokens
            FROM chunks
            WINDOW w AS (PARTITION BY shard ORDER BY doc_id, chunk_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "quantize": """
            WITH q AS (
                SELECT vec_id, embedding,
                       list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                FROM embeddings WHERE vec_id < 200
            ),
            c AS (
                SELECT vec_id, embedding, scale,
                       CASE WHEN scale = 0
                            THEN [0 FOR x IN embedding]
                            ELSE [CAST(greatest(-127.0, least(127.0,
                                       floor(CAST(x AS DOUBLE) / scale + 0.5))) AS INT)
                                  FOR x IN embedding] END AS qcodes
                FROM q
            )
            SELECT vec_id,
                   floor(scale * 1000000) / 1000000 AS scale6,
                   array_to_string(qcodes, ',') AS codes,
                   CASE WHEN scale = 0 THEN FALSE
                        ELSE list_cosine_similarity(
                                 list_transform(qcodes, cc -> cc * scale), embedding) >= 0.999
                   END AS cos_ok
            FROM c
        """,
        "pack_chunks": """
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS nr
                FROM documents WHERE doc_id < 100
            ),
            chunks AS (
                SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                       CAST(doc_id % 8 AS INT) AS shard,
                       CAST(greatest(least(nr - i*32, 32), 0) AS INT) AS n_chunk_tokens
                FROM t, unnest(range(1 + CAST(ceil(greatest(nr - 32, 0)/32.0) AS INT))) AS u(i)
                WHERE i*32 < greatest(nr, 1)
            )
            SELECT doc_id, chunk_idx, shard,
                   CAST(sum(n_chunk_tokens) OVER w - n_chunk_tokens AS BIGINT) AS tok_offset,
                   CAST(floor((sum(n_chunk_tokens) OVER w - n_chunk_tokens) / 64.0) AS INT) AS bin_id,
                   n_chunk_tokens
            FROM chunks
            WINDOW w AS (PARTITION BY shard ORDER BY doc_id, chunk_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "sketch_accuracy": """
            -- exact sides computed independently; the sketch-accuracy
            -- claims are pinned TRUE — Spark must earn them
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_nd,
                   TRUE AS hll_within_5pct,
                   round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
                   TRUE AS approx_p50_within_2pct
            FROM events GROUP BY 1
        """,
        "full_outer_join": """
            WITH o94 AS (
                SELECT o_custkey, count(*) AS n_1994 FROM orders
                WHERE year(o_orderdate) = 1994 GROUP BY 1
            ),
            o96 AS (
                SELECT o_custkey, count(*) AS n_1996 FROM orders
                WHERE year(o_orderdate) = 1996 GROUP BY 1
            )
            SELECT coalesce(o94.o_custkey, o96.o_custkey) AS o_custkey,
                   coalesce(n_1994, 0) AS n_1994,
                   coalesce(n_1996, 0) AS n_1996
            FROM o94 FULL OUTER JOIN o96 ON o94.o_custkey = o96.o_custkey
        """,
        "rank_funcs": """
            SELECT s_suppkey, s_nationkey,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   CAST(ntile(4) OVER w AS INT) AS quartile,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cume
            FROM supplier
            WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
        """,
        "unpivot_long": """
            WITH wide AS (
                SELECT user_id,
                       count(*) FILTER (WHERE event_type = 'click') AS click,
                       count(*) FILTER (WHERE event_type = 'view') AS view,
                       count(*) FILTER (WHERE event_type = 'purchase') AS purchase
                FROM events GROUP BY 1
            )
            SELECT user_id, etype, n FROM wide
            UNPIVOT (n FOR etype IN (click, view, purchase))
        """,
        "explode_outer": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                   t -> length(t) >= 12) AS words
                FROM documents WHERE doc_id < 50
            )
            SELECT doc_id, CASE WHEN len(words) = 0 THEN NULL ELSE unnest(words) END AS long_word
            FROM w WHERE len(words) > 0
            UNION ALL
            SELECT doc_id, NULL FROM w WHERE len(words) = 0
        """,
        "time_rollup": """
            -- tz-free bucket reconstruction: epoch arithmetic + a plain
            -- TIMESTAMP interval add.  (CAST(to_timestamp(..) AS TIMESTAMP)
            -- would render wall-clock in the HOST's session TimeZone while
            -- Spark's session tz is pinned UTC — red on any non-UTC host.)
            WITH b AS (
                SELECT TIMESTAMP '1970-01-01 00:00:00'
                           + to_seconds(CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600)
                           AS bucket6h,
                       event_type, value
                FROM events
            )
            SELECT bucket6h, event_type, count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM b GROUP BY ROLLUP(bucket6h, event_type)
        """,
        "chunk_docs": """
            WITH t AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS nr
                FROM documents WHERE doc_id < 50
            )
            SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                   array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text,
                   CAST(greatest(least(nr - i*24, 32), 0) AS INT) AS n_chunk_tokens
            FROM t, unnest(range(1 + CAST(ceil(greatest(nr - 32, 0)/24.0) AS INT))) AS u(i)
            WHERE i*24 < greatest(nr, 1)
        """,
        "pii_scrub": """
            WITH synth AS (
                SELECT doc_id,
                       text || ' Contact user' || doc_id ||
                       '@mail.example now, SSN 123-45-6789, call 415-555-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
                FROM documents WHERE doc_id < 100
            ),
            s1 AS (  -- email FIRST (see ops/textprep.PII_PATTERNS), then SSN (3-2-4), then phone (3-3-4)
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_email,
                       regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
                FROM synth
            ),
            s2 AS (
                SELECT doc_id, n_email,
                       CAST(len(regexp_extract_all(t1, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS INT) AS n_ssn,
                       regexp_replace(t1, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<SSN>', 'g') AS t2
                FROM s1
            )
            SELECT doc_id,
                   regexp_replace(t2, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g') AS scrubbed_text,
                   n_email, n_ssn,
                   CAST(len(regexp_extract_all(t2, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS INT) AS n_phone
            FROM s2
        """,
        "stratified_sample": """
            -- key folded mod 2^31 before the multiply: product stays in
            -- int64 for any key (mirrors the ANSI-safe Spark formulation);
            -- the +m wrap makes DuckDB's sign-preserving % match Spark's
            -- pmod for negative keys too (folded >= 0 keeps the rest >= 0)
            SELECT vec_id, label FROM embeddings
            WHERE ((((vec_id % 2147483648) + 2147483648) % 2147483648)
                   * 2654435761) % 4294967296 % 1000
                  < 100 + label * 50
        """,
        "bm25": """
            WITH q(term) AS (VALUES ('spark'), ('shuffle'), ('partition'), ('memory')),
            post AS (
                SELECT doc_id AS doc, term, count(*) AS tf
                FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
                      FROM documents)
                WHERE term <> '' GROUP BY 1, 2
            ),
            dlen AS (SELECT doc, sum(tf) AS dl FROM post GROUP BY 1),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen),
            hits AS (SELECT p.* FROM post p JOIN q USING (term)),
            dft AS (SELECT term, count(DISTINCT doc) AS df FROM hits GROUP BY 1),
            scored AS (
                SELECT h.doc,
                       ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS tscore
                FROM hits h JOIN dft USING (term) JOIN dlen USING (doc) CROSS JOIN stats
            )
            SELECT doc AS doc_id, round(sum(tscore), 6) AS score, CAST(count(*) AS INT) AS n_hits
            FROM scored GROUP BY doc ORDER BY sum(tscore) DESC, doc ASC LIMIT 10
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.label = b.label
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.9
        """,
        "quality_stats": """
            WITH t AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       string_split_regex(trim(text), '\\s+') AS toks,
                       length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS punct
                FROM documents
            )
            SELECT doc_id, n_chars, len(toks) AS n_tokens,
                   floor((n_chars - (len(toks) - 1)) / len(toks) * 10000) / 10000 AS mean_token_len,
                   floor(len(list_distinct(toks)) * 1.0 / len(toks) * 10000) / 10000 AS uniq_token_ratio,
                   floor(punct * 1.0 / greatest(n_chars, 1) * 10000) / 10000 AS punct_ratio,
                   floor((least(len(toks) / 64.0, 1.0) * 0.4
                       + len(list_distinct(toks)) * 1.0 / len(toks) * 0.4
                       + (1.0 - least(punct * 4.0 / greatest(n_chars, 1), 1.0)) * 0.2) * 10000) / 10000 AS quality_score
            FROM t
        """,
        "langid": """
            WITH t AS (
                SELECT doc_id,
                       len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in)\\b')) AS hits_en,
                       len(regexp_extract_all(lower(text), '\\b(el|la|de|que|los)\\b')) AS hits_es,
                       len(regexp_extract_all(lower(text), '\\b(le|la|les|des|est)\\b')) AS hits_fr,
                       len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')) AS hits_de
                FROM documents
            )
            SELECT doc_id, hits_en, hits_es, hits_fr, hits_de,
                   CASE WHEN greatest(hits_en, hits_es, hits_fr, hits_de) = 0 THEN 'und'
                        WHEN hits_de = greatest(hits_en, hits_es, hits_fr, hits_de) THEN 'de'
                        WHEN hits_en = greatest(hits_en, hits_es, hits_fr, hits_de) THEN 'en'
                        WHEN hits_es = greatest(hits_en, hits_es, hits_fr, hits_de) THEN 'es'
                        WHEN hits_fr = greatest(hits_en, hits_es, hits_fr, hits_de) THEN 'fr'
                   END AS lang_guess
            FROM t
        """,
        "token_counts": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
                   len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
                   floor(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) * 10000.0
                         / greatest(len(string_split_regex(trim(text), '\\s+')), 1)) / 10000 AS bpe_per_word
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
                   length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_norm_chars
            FROM documents
        """,
        "context_slice": """
            SELECT doc_id,
                   substring(text, greatest(strpos(text, 'spark') - 30, 1),
                             60 + least(strpos(text, 'spark') - 31, 0)) AS context
            FROM documents WHERE strpos(text, 'spark') > 0
        """,
        "source_split": """
            SELECT split_part(p_type, ' ', 1) AS type_family, count(*) AS n_parts
            FROM part GROUP BY 1
        """,
        "coalesce_backfill": """
            SELECT coalesce(nullif(event_type, 'error'), 'Unknown') AS etype,
                   count(*) AS n_events
            FROM events GROUP BY 1
        """,
        "stable_sort": """
            SELECT event_id, event_type FROM events
            ORDER BY ts ASC, event_id ASC LIMIT 50
        """,
        "array_mean": """
            WITH ex AS (
                SELECT label, unnest(embedding) AS val,
                       unnest(range(len(embedding))) AS pos
                FROM embeddings
            )
            SELECT label, CAST(pos AS INT) AS pos,
                   floor(avg(val) * 10000) / 10000 AS mean_val
            FROM ex GROUP BY 1, 2
        """,
        "closure_counts": """
            WITH RECURSIVE edges AS (
                SELECT 'c:' || c_custkey AS child, 'n:' || c_nationkey AS parent FROM customer
                UNION ALL
                SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
            ),
            closure AS (
                SELECT child AS descendant, parent AS ancestor FROM edges
                UNION ALL
                SELECT c.descendant, e.parent FROM closure c JOIN edges e ON c.ancestor = e.child
            )
            SELECT ancestor, count(DISTINCT descendant) AS n_descendants
            FROM closure GROUP BY 1
        """,
        "pagerank": _pagerank_oracle_sql(10),
        "pagerank_weighted": _pagerank_weighted_oracle_sql(10),
        "part_salience": _part_salience_oracle_sql(8, 20),
        "textrank": _textrank_oracle_sql(10, 15),
        "cms_estimate": _cms_oracle_sql(4, 2048),
        "cms_join_size": _cms_join_oracle_sql(4, 4096),
        "markov_transitions": _MARKOV_TRANS_SQL
        + """
        SELECT src, dst, n, prob FROM trans""",
        "markov_stationary": _markov_stationary_oracle_sql(12),
        "frequent_sequences": """
            WITH ev AS (
                SELECT user_id AS k, event_id AS o, event_type AS s,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY event_id) AS rn
                FROM events WHERE event_type IS NOT NULL
            ),
            e AS (SELECT k, o, s FROM ev WHERE rn <= 12),
            ms AS (SELECT count(DISTINCT k) // 2 + 1 AS m FROM e),
            l1 AS (
                SELECT s, count(DISTINCT k) AS support FROM e GROUP BY 1
                HAVING count(DISTINCT k) >= (SELECT m FROM ms)
            ),
            p2 AS (
                SELECT DISTINCT e1.k, e1.s AS s1, e2.s AS s2
                FROM e e1 JOIN e e2 ON e1.k = e2.k AND e1.o < e2.o
            ),
            l2 AS (
                SELECT c.s1, c.s2, count(*) AS support
                FROM (SELECT a.s AS s1, b.s AS s2
                      FROM l1 a CROSS JOIN l1 b) c
                JOIN p2 p ON p.s1 = c.s1 AND p.s2 = c.s2
                GROUP BY 1, 2
                HAVING count(*) >= (SELECT m FROM ms)
            ),
            p3 AS (
                SELECT DISTINCT e1.k, e1.s AS s1, e2.s AS s2, e3.s AS s3
                FROM e e1
                JOIN e e2 ON e1.k = e2.k AND e1.o < e2.o
                JOIN e e3 ON e2.k = e3.k AND e2.o < e3.o
            ),
            l3 AS (
                SELECT c.s1, c.s2, c.s3, count(*) AS support
                FROM (SELECT l.s1, l.s2, i.s AS s3
                      FROM l2 l CROSS JOIN l1 i) c
                JOIN p3 p ON p.s1 = c.s1 AND p.s2 = c.s2 AND p.s3 = c.s3
                GROUP BY 1, 2, 3
                HAVING count(*) >= (SELECT m FROM ms)
            )
            SELECT s AS pattern, 1 AS length, support FROM l1
            UNION ALL
            SELECT s1 || ' -> ' || s2, 2, support FROM l2
            UNION ALL
            SELECT s1 || ' -> ' || s2 || ' -> ' || s3, 3, support FROM l3
        """,
        "rolling_active_users": """
            -- the quadratic DEFINITION the sweep composition avoids:
            -- boundaries = island starts / island-ends+7 (same break
            -- rule: events <= 6 days apart chain), value at t = exact
            -- COUNT(DISTINCT user) with an event in [t-6, t]
            WITH ud AS (
                SELECT DISTINCT user_id AS u,
                       date_diff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS d
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL
                  AND event_id % 29 = 0
            ),
            starts AS (
                SELECT DISTINCT d AS t FROM ud a
                WHERE NOT EXISTS (SELECT 1 FROM ud b
                                  WHERE b.u = a.u
                                    AND b.d BETWEEN a.d - 6 AND a.d - 1)
            ),
            ends AS (
                SELECT DISTINCT d + 7 AS t FROM ud a
                WHERE NOT EXISTS (SELECT 1 FROM ud b
                                  WHERE b.u = a.u
                                    AND b.d BETWEEN a.d + 1 AND a.d + 6)
            ),
            bounds AS (SELECT t FROM starts UNION SELECT t FROM ends)
            SELECT t AS day,
                   (SELECT count(DISTINCT u) FROM ud
                    WHERE ud.d BETWEEN bounds.t - 6 AND bounds.t)
                       AS active_users
            FROM bounds
        """,
        "feature_scale": """
            WITH src AS (
                SELECT * FROM lineitem WHERE l_orderkey % 37 = 0
            ),
            st AS (
                SELECT count(l_quantity) AS n,
                       sum(CAST(l_quantity AS DECIMAL(18,2))) AS s,
                       sum(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2))) AS ss,
                       min(l_extendedprice) AS lo_p,
                       max(l_extendedprice) AS hi_p,
                       quantile_disc(l_discount, 0.05) AS lo_d,
                       quantile_disc(l_discount, 0.95) AS hi_d
                FROM src
            ),
            d AS (
                SELECT *, CAST(n AS DOUBLE) AS nd,
                       CAST(s AS DOUBLE) AS sd,
                       CAST(ss AS DOUBLE) AS ssd
                FROM st
            )
            SELECT src.l_orderkey, src.l_linenumber,
                   CASE WHEN d.n > 1
                             AND d.nd * d.ssd - d.sd * d.sd > 0.0
                        THEN (src.l_quantity - d.sd / d.nd)
                             / sqrt((d.nd * d.ssd - d.sd * d.sd)
                                    / (d.nd * (d.nd - 1.0)))
                   END AS z_l_quantity,
                   CASE WHEN d.hi_p > d.lo_p
                        THEN (src.l_extendedprice - d.lo_p)
                             / (d.hi_p - d.lo_p)
                   END AS mm_l_extendedprice,
                   least(greatest(src.l_discount, d.lo_d), d.hi_d)
                       AS w_l_discount
            FROM src CROSS JOIN d
        """,
        "corr_matrix": _corr_oracle_sql(
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            2,
            "SELECT l_quantity, l_extendedprice, l_discount, l_tax"
            " FROM lineitem",
        ),
        "spearman": _corr_oracle_sql(
            ["rk2_l_quantity", "rk2_l_discount"],
            0,
            """
            WITH vals AS (
                SELECT l_quantity AS a, l_discount AS b FROM lineitem
                WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
            ),
            ca AS (SELECT a AS v, count(*) AS cnt FROM vals GROUP BY 1),
            ra AS (SELECT v, 2 * sum(cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - cnt + 1 AS rk
                   FROM ca),
            cb AS (SELECT b AS v, count(*) AS cnt FROM vals GROUP BY 1),
            rb AS (SELECT v, 2 * sum(cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - cnt + 1 AS rk
                   FROM cb)
            SELECT CAST(ra.rk AS BIGINT) AS rk2_l_quantity,
                   CAST(rb.rk AS BIGINT) AS rk2_l_discount
            FROM vals JOIN ra ON vals.a = ra.v JOIN rb ON vals.b = rb.v
            """,
        ).replace("'rk2_l_discount' AS col_a", "'l_discount' AS col_a")
        .replace("'rk2_l_quantity' AS col_b", "'l_quantity' AS col_b"),
        "welch_ab": """
            WITH flt AS (
                SELECT o_orderpriority AS g, o_orderstatus AS v,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS yd
                FROM orders
                WHERE o_totalprice IS NOT NULL
                  AND o_orderstatus IN ('O', 'F')
            ),
            a AS (SELECT g, count(*) AS n_a, sum(yd) AS s_a,
                         sum(yd * yd) AS sxx_a
                  FROM flt WHERE v = 'O' GROUP BY 1),
            b AS (SELECT g, count(*) AS n_b, sum(yd) AS s_b,
                         sum(yd * yd) AS sxx_b
                  FROM flt WHERE v = 'F' GROUP BY 1),
            j AS (SELECT coalesce(a.g, b.g) AS g,
                         n_a, s_a, sxx_a, n_b, s_b, sxx_b
                  FROM a FULL OUTER JOIN b ON a.g = b.g),
            d AS (
                SELECT g, n_a, n_b,
                       CAST(n_a AS DOUBLE) AS nad,
                       CAST(s_a AS DOUBLE) AS sad,
                       CAST(sxx_a AS DOUBLE) AS sxxad,
                       CAST(n_b AS DOUBLE) AS nbd,
                       CAST(s_b AS DOUBLE) AS sbd,
                       CAST(sxx_b AS DOUBLE) AS sxxbd
                FROM j
            ),
            s AS (
                SELECT g, n_a, n_b,
                       sad / nad AS ma, sbd / nbd AS mb,
                       (nad * sxxad - sad * sad)
                           / (nad * (nad - 1.0)) AS va,
                       (nbd * sxxbd - sbd * sbd)
                           / (nbd * (nbd - 1.0)) AS vb,
                       nad, nbd
                FROM d
            ),
            e AS (SELECT *, va / nad + vb / nbd AS se2 FROM s)
            SELECT g AS o_orderpriority, n_a, n_b,
                   CASE WHEN n_a IS NOT NULL THEN ma END AS mean_a,
                   CASE WHEN n_b IS NOT NULL THEN mb END AS mean_b,
                   CASE WHEN n_a IS NOT NULL AND n_b IS NOT NULL
                             AND n_a > 1 AND n_b > 1 AND se2 > 0.0
                        THEN (ma - mb) / sqrt(se2) END AS t,
                   CASE WHEN n_a IS NOT NULL AND n_b IS NOT NULL
                             AND n_a > 1 AND n_b > 1 AND se2 > 0.0
                        THEN (se2 * se2) /
                             ((va / nad) * (va / nad) / (nad - 1.0)
                              + (vb / nbd) * (vb / nbd) / (nbd - 1.0))
                   END AS dof
            FROM e
        """,
        "chi2_assoc": """
            WITH flt AS (
                SELECT l_returnflag AS x, l_linestatus AS y
                FROM lineitem
                WHERE l_returnflag IS NOT NULL
                  AND l_linestatus IS NOT NULL
            ),
            cells AS (SELECT x, y, count(*) AS o FROM flt GROUP BY 1, 2),
            r AS (SELECT x, sum(o) AS rt FROM cells GROUP BY 1),
            c AS (SELECT y, sum(o) AS ct FROM cells GROUP BY 1),
            tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                           count(DISTINCT x) AS nr,
                           count(DISTINCT y) AS nc
                    FROM cells),
            terms AS (
                SELECT t.n, t.nr, t.nc, cells.x, cells.y,
                       (CAST(cells.o AS DOUBLE)
                          - CAST(r.rt * c.ct AS DOUBLE)
                              / CAST(t.n AS DOUBLE))
                       * (CAST(cells.o AS DOUBLE)
                          - CAST(r.rt * c.ct AS DOUBLE)
                              / CAST(t.n AS DOUBLE))
                       / (CAST(r.rt * c.ct AS DOUBLE)
                              / CAST(t.n AS DOUBLE)) AS term
                FROM cells JOIN r USING (x) JOIN c USING (y)
                CROSS JOIN tot t
            )
            SELECT list_reduce(
                       list_prepend(0.0,
                           [s.term FOR s IN list_sort(list(struct_pack(
                               x := x, y := y, term := term)))]),
                       (acc, v2) -> acc + v2) AS chi2,
                   CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
                   n
            FROM terms GROUP BY n, nr, nc
        """,
        "mad_outliers": """
            WITH vals AS (
                SELECT event_id, event_type, value FROM events
                WHERE user_id < 100 AND value IS NOT NULL
            ),
            med AS (
                SELECT event_type, quantile_disc(value, 0.5) AS med
                FROM vals GROUP BY 1
            ),
            dev AS (
                SELECT v.event_id, v.event_type, v.value, m.med,
                       abs(v.value - m.med) AS d
                FROM vals v JOIN med m USING (event_type)
            ),
            mad AS (
                SELECT event_type, quantile_disc(d, 0.5) AS mad
                FROM dev GROUP BY 1
            )
            SELECT dev.event_id, dev.event_type, dev.value, dev.med,
                   mad.mad, dev.d > 3.0 * mad.mad AS is_outlier
            FROM dev JOIN mad USING (event_type)
        """,
        "target_encode": """
            WITH vals AS (
                SELECT o_orderkey, o_orderpriority,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS yd
                FROM orders
                WHERE o_orderpriority IS NOT NULL
                  AND o_totalprice IS NOT NULL
            ),
            stats AS (
                SELECT o_orderpriority, sum(yd) AS s, count(*) AS n
                FROM vals GROUP BY 1
            ),
            gstats AS (SELECT sum(yd) AS gs, count(*) AS gn FROM vals)
            SELECT o.o_orderkey, o.o_orderpriority,
                   CASE
                     WHEN o.o_totalprice IS NULL
                          OR o.o_orderpriority IS NULL THEN NULL
                     WHEN st.n > 1 THEN
                       CAST(st.s - CAST(o.o_totalprice AS DECIMAL(18,2))
                            AS DOUBLE) / CAST(st.n - 1 AS DOUBLE)
                     ELSE CAST(g.gs AS DOUBLE) / CAST(g.gn AS DOUBLE)
                   END AS te
            FROM orders o
            LEFT JOIN stats st USING (o_orderpriority)
            CROSS JOIN gstats g
        """,
        "grouped_ols": """
            WITH s AS (
                SELECT l_returnflag,
                       count(*) AS n,
                       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                       sum(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
                       sum(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
                       sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
                FROM lineitem
                WHERE l_quantity IS NOT NULL
                  AND l_extendedprice IS NOT NULL
                GROUP BY 1
            ),
            d AS (
                SELECT l_returnflag, n,
                       CAST(n AS DOUBLE) AS nd,
                       CAST(sx AS DOUBLE) AS sxd,
                       CAST(sy AS DOUBLE) AS syd,
                       CAST(sxx AS DOUBLE) AS sxxd,
                       CAST(sxy AS DOUBLE) AS sxyd,
                       CAST(syy AS DOUBLE) AS syyd
                FROM s
            ),
            t AS (
                SELECT l_returnflag, n, nd, sxd, syd,
                       nd * sxyd - sxd * syd AS covn,
                       nd * sxxd - sxd * sxd AS varxn,
                       nd * syyd - syd * syd AS varyn
                FROM d
            )
            SELECT l_returnflag, n,
                   CASE WHEN varxn <> 0 THEN covn / varxn END AS slope,
                   CASE WHEN varxn <> 0
                        THEN (syd - (covn / varxn) * sxd) / nd END
                       AS intercept,
                   CASE WHEN varxn <> 0 AND varyn <> 0
                        THEN (covn * covn) / (varxn * varyn) END AS r2
            FROM t
        """,
        "frequent_itemsets": """
            WITH b AS (
                SELECT DISTINCT l_orderkey AS k, p_brand AS it
                FROM lineitem JOIN part ON l_partkey = p_partkey
            ),
            ms AS (SELECT count(DISTINCT k) // 200 + 1 AS m FROM b),
            l1 AS (
                SELECT it, count(*) AS support FROM b GROUP BY 1
                HAVING count(*) >= (SELECT m FROM ms)
            ),
            l2 AS (
                SELECT b1.it AS i1, b2.it AS i2, count(*) AS support
                FROM b b1 JOIN b b2 ON b1.k = b2.k AND b1.it < b2.it
                GROUP BY 1, 2
                HAVING count(*) >= (SELECT m FROM ms)
            ),
            l3 AS (
                SELECT b1.it AS i1, b2.it AS i2, b3.it AS i3,
                       count(*) AS support
                FROM b b1
                JOIN b b2 ON b1.k = b2.k AND b1.it < b2.it
                JOIN b b3 ON b2.k = b3.k AND b2.it < b3.it
                GROUP BY 1, 2, 3
                HAVING count(*) >= (SELECT m FROM ms)
            )
            SELECT it AS itemset, 1 AS length, support FROM l1
            UNION ALL
            SELECT i1 || ' + ' || i2, 2, support FROM l2
            UNION ALL
            SELECT i1 || ' + ' || i2 || ' + ' || i3, 3, support FROM l3
        """,
        "assoc_rules": """
            WITH b AS (
                SELECT DISTINCT l_orderkey AS k, p_brand AS it
                FROM lineitem JOIN part ON l_partkey = p_partkey
            ),
            nb AS (SELECT count(DISTINCT k) AS n FROM b),
            ms AS (SELECT n // 200 + 1 AS m FROM nb),
            l1 AS (
                SELECT it, count(*) AS support FROM b GROUP BY 1
                HAVING count(*) >= (SELECT m FROM ms)
            ),
            l2 AS (
                SELECT b1.it AS i1, b2.it AS i2, count(*) AS support
                FROM b b1 JOIN b b2 ON b1.k = b2.k AND b1.it < b2.it
                GROUP BY 1, 2
                HAVING count(*) >= (SELECT m FROM ms)
            ),
            both_dirs AS (
                SELECT i1 AS antecedent, i2 AS consequent, support FROM l2
                UNION ALL
                SELECT i2, i1, support FROM l2
            )
            SELECT r.antecedent, r.consequent, r.support,
                   CAST(r.support AS DOUBLE) / fa.support AS confidence,
                   CAST(r.support * (SELECT n FROM nb) AS DOUBLE)
                       / (fa.support * fc.support) AS lift
            FROM both_dirs r
            JOIN l1 fa ON fa.it = r.antecedent
            JOIN l1 fc ON fc.it = r.consequent
        """,
        "psi_drift": """
            WITH bl AS (
                SELECT quantile_disc(o_totalprice, [0.2, 0.4, 0.6, 0.8]) AS bs
                FROM orders
                WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL
            ),
            refb AS (
                SELECT CAST(CAST(len(list_filter((SELECT bs FROM bl),
                                 x -> o_totalprice > x)) AS INT) AS VARCHAR) AS bucket
                FROM orders
                WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL
            ),
            curb AS (
                SELECT CAST(CAST(len(list_filter((SELECT bs FROM bl),
                                 x -> v > x)) AS INT) AS VARCHAR) AS bucket
                FROM (
                    SELECT o_totalprice * 1.2 AS v FROM orders
                    WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL
                )
            ),
            rc AS (SELECT bucket, count(*) AS n_ref FROM refb GROUP BY 1),
            cc AS (SELECT bucket, count(*) AS n_cur FROM curb GROUP BY 1),
            j AS (
                SELECT coalesce(rc.bucket, cc.bucket) AS bucket,
                       coalesce(n_ref, 0) AS n_ref,
                       coalesce(n_cur, 0) AS n_cur
                FROM rc FULL OUTER JOIN cc USING (bucket)
            ),
            tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM j),
            terms AS (
                SELECT bucket, n_ref, n_cur,
                       greatest(n_ref / t_ref, 0.0001) AS p_ref,
                       greatest(n_cur / t_cur, 0.0001) AS p_cur,
                       (greatest(n_cur / t_cur, 0.0001)
                            - greatest(n_ref / t_ref, 0.0001))
                       * ln(greatest(n_cur / t_cur, 0.0001)
                            / greatest(n_ref / t_ref, 0.0001)) AS raw_term
                FROM j CROSS JOIN tot
            ),
            total AS (SELECT round(sum(raw_term), 4) AS psi_total FROM terms)
            SELECT bucket, n_ref, n_cur,
                   round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
                   floor(raw_term * 1000000 + 0.5) / 1000000 AS term,
                   psi_total,
                   CASE WHEN psi_total < 0.1 THEN 'stable'
                        WHEN psi_total < 0.25 THEN 'moderate_shift'
                        ELSE 'major_shift' END AS verdict
            FROM terms CROSS JOIN total
        """,
        "skyline": """
            SELECT p_partkey, p_size, p_retailprice
            FROM part p
            WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
              AND NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_size IS NOT NULL AND q.p_retailprice IS NOT NULL
                  AND q.p_size >= p.p_size
                  AND q.p_retailprice >= p.p_retailprice
                  AND (q.p_size > p.p_size
                       OR q.p_retailprice > p.p_retailprice)
            )
        """,
        "concurrency_peak": """
            WITH iv AS (
                SELECT user_id AS k,
                       CAST(floor(epoch(ts)) AS BIGINT) AS s,
                       CAST(floor(epoch(ts)) AS BIGINT)
                           + CAST(trunc(value * 60.0) AS BIGINT) + 1 AS e
                FROM events
                WHERE user_id % 5 = 0 AND event_type = 'click'
                  AND ts IS NOT NULL AND value IS NOT NULL
            ),
            ev AS (
                SELECT k, s AS t, 1 AS d FROM iv WHERE e > s
                UNION ALL
                SELECT k, e, -1 FROM iv WHERE e > s
            ),
            g AS (SELECT k, t, sum(d) AS d FROM ev GROUP BY 1, 2),
            c AS (
                SELECT k, t,
                       CAST(sum(d) OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS n
                FROM g
            )
            SELECT k AS user_id, max(n) AS peak,
                   (list(t ORDER BY n DESC, t ASC))[1] AS at_t
            FROM c GROUP BY k
        """,
        "interval_intersect": """
            WITH iva AS (
                SELECT user_id AS k,
                       CAST(floor(epoch(ts)) AS BIGINT) AS s,
                       CAST(floor(epoch(ts)) AS BIGINT)
                           + CAST(trunc(value * 60.0) AS BIGINT) + 1 AS e
                FROM events
                WHERE user_id % 5 = 0 AND event_type = 'click'
                  AND ts IS NOT NULL AND value IS NOT NULL
            ),
            ivb AS (
                SELECT user_id AS k,
                       CAST(floor(epoch(ts)) AS BIGINT) AS s,
                       CAST(floor(epoch(ts)) AS BIGINT)
                           + CAST(trunc(value * 60.0) AS BIGINT) + 1 AS e
                FROM events
                WHERE user_id % 5 = 0 AND event_type = 'view'
                  AND ts IS NOT NULL AND value IS NOT NULL
            ),
            ev AS (
                SELECT k, s AS t, 1 AS da, 0 AS db FROM iva WHERE e > s
                UNION ALL SELECT k, e, -1, 0 FROM iva WHERE e > s
                UNION ALL SELECT k, s, 0, 1 FROM ivb WHERE e > s
                UNION ALL SELECT k, e, 0, -1 FROM ivb WHERE e > s
            ),
            g AS (SELECT k, t, sum(da) AS da, sum(db) AS db FROM ev GROUP BY 1, 2),
            c AS (
                SELECT k, t,
                       sum(da) OVER w AS ca, sum(db) OVER w AS cb,
                       lead(t) OVER w AS tn
                FROM g WINDOW w AS (PARTITION BY k ORDER BY t)
            ),
            seg AS (
                SELECT k, t, tn FROM c
                WHERE ca > 0 AND cb > 0 AND tn IS NOT NULL AND tn > t
            ),
            fl AS (
                SELECT k, t, tn,
                       CASE WHEN lag(tn) OVER w2 IS NULL
                                 OR lag(tn) OVER w2 < t THEN 1 ELSE 0 END AS ni
                FROM seg WINDOW w2 AS (PARTITION BY k ORDER BY t)
            ),
            isl AS (
                SELECT k, t, tn,
                       sum(ni) OVER (PARTITION BY k ORDER BY t) AS island
                FROM fl
            )
            SELECT k AS user_id, min(t) AS s, max(tn) AS e
            FROM isl GROUP BY k, island
        """,
        "distinct_overlap": """
            -- exact sides recomputed; sketch estimates asserted via
            -- tolerance flags (the L109 pattern)
            WITH cn AS (
                SELECT r_name, c_custkey, c_acctbal
                FROM customer
                JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
            ),
            a AS (SELECT DISTINCT r_name, c_custkey FROM cn WHERE c_acctbal > 0),
            b AS (
                SELECT DISTINCT r_name, c_custkey
                FROM cn JOIN orders ON c_custkey = o_custkey
            )
            SELECT a.r_name,
                   count(DISTINCT a.c_custkey) AS exact_a,
                   (SELECT count(*) FROM b WHERE b.r_name = a.r_name) AS exact_b,
                   count(DISTINCT CASE WHEN EXISTS (
                       SELECT 1 FROM b WHERE b.r_name = a.r_name
                         AND b.c_custkey = a.c_custkey)
                       THEN a.c_custkey END) AS exact_i,
                   TRUE AS ok_a, TRUE AS ok_b, TRUE AS ok_i
            FROM a
            GROUP BY a.r_name
        """,
        "zone_pruned_read": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_orderkey BETWEEN 2000 AND 5999
        """,
        "equidepth_bins": """
            WITH bl AS (
                SELECT quantile_disc(o_totalprice,
                    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs
                FROM orders WHERE o_totalprice IS NOT NULL
            ),
            assigned AS (
                SELECT o_totalprice AS v,
                       CAST(len(list_filter((SELECT bs FROM bl),
                                            x -> v > x)) AS INT) AS bucket
                FROM orders WHERE o_totalprice IS NOT NULL
            )
            SELECT bucket, count(*) AS n, min(v) AS lo, max(v) AS hi
            FROM assigned GROUP BY bucket
        """,
        "attribution": """
            WITH p AS (
                SELECT event_id, user_id, ts, value
                FROM events WHERE event_type = 'purchase'
            ),
            c AS (
                SELECT event_id AS click_id, user_id, ts
                FROM events WHERE event_type = 'click'
            )
            SELECT p.event_id, p.user_id, p.value,
                   (SELECT c.click_id FROM c
                    WHERE c.user_id = p.user_id AND c.ts <= p.ts
                    ORDER BY c.ts DESC, c.click_id DESC LIMIT 1) AS touch_id
            FROM p
        """,
        "golden_records": """
            WITH obs AS (
                SELECT c_custkey AS cid, 1 AS ts, c_name AS name,
                       c_acctbal AS bal, c_mktsegment AS seg
                FROM customer WHERE c_custkey % 11 = 0
                UNION ALL
                SELECT c_custkey, 2, upper(c_name), c_acctbal + 500.0,
                       CASE WHEN c_custkey % 2 = 0 THEN 'GOLD'
                            ELSE c_mktsegment END
                FROM customer WHERE c_custkey % 11 = 0
                UNION ALL
                SELECT c_custkey, 3, NULL, c_acctbal - 100.0, c_mktsegment
                FROM customer WHERE c_custkey % 11 = 0
            ),
            latest AS (
                SELECT cid, count(*) AS n_members,
                       (list(name ORDER BY ts DESC, name DESC)
                            FILTER (WHERE name IS NOT NULL))[1] AS name,
                       max(bal) AS bal
                FROM obs GROUP BY cid
            ),
            segc AS (
                SELECT cid, seg, count(*) AS n
                FROM obs WHERE seg IS NOT NULL GROUP BY 1, 2
            ),
            maj AS (
                SELECT cid, (list(seg ORDER BY n DESC, seg ASC))[1] AS seg
                FROM segc GROUP BY cid
            )
            SELECT l.cid, l.n_members, l.name, l.bal, m.seg
            FROM latest l LEFT JOIN maj m USING (cid)
        """,
        "curate_sampled": """
            -- expectation predicates then the A-ES sample, composed
            WITH clean AS (
                SELECT doc_id, lang, n_chars
                FROM documents
                WHERE text IS NOT NULL
                  AND (n_chars IS NULL OR n_chars BETWEEN 60 AND 520)
                  AND (lang IS NULL OR lang IN ('en', 'es', 'de', 'fr'))
            ),
            pri AS (
                SELECT doc_id, lang, n_chars,
                       -ln((((doc_id % 2147483648) * 2654435761)
                             % 4294967296 + 0.5) / 4294967296.0)
                           / CAST(n_chars AS DOUBLE) AS p
                FROM clean
            )
            SELECT doc_id, lang, n_chars
            FROM (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (PARTITION BY lang ORDER BY p, doc_id) AS rn
                FROM pri
            )
            WHERE rn <= 6
        """,
        "hits": _hits_oracle_sql(5),
        "kcore": _kcore_oracle_sql(3, 8),
        "ktruss": _ktruss_oracle_sql(4, 7),
        "shortest_paths": _sssp_oracle_sql(3),
        "set_ops": """
            WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
                 b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
            SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
            UNION ALL
            SELECT o_custkey, 'only_1995' AS tag FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        """,
        "sessionize": """
            WITH g AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                              OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
            )
            SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
            FROM g GROUP BY 1
        """,
        "above_avg": """
            SELECT c_custkey, round(c_acctbal, 2) AS acctbal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                               WHERE c2.c_nationkey = c.c_nationkey)
        """,
        "quantiles": """
            SELECT o_orderpriority,
                   CAST(floor(quantile_cont(o_totalprice, 0.5) * 100) AS BIGINT) AS p50_cents,
                   CAST(floor(quantile_cont(o_totalprice, 0.9) * 100) AS BIGINT) AS p90_cents,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        """,
        "moving_avg": """
            SELECT user_id, event_id,
                   CAST(floor(avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) * 10000) AS BIGINT) AS avg5_e4
            FROM events WHERE user_id < 20
        """,
        "rollup_revenue": """
            SELECT coalesce(r_name, 'ALL') AS region_name,
                   coalesce(n_name, 'ALL') AS nation_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
        """,
        "benford": """
            WITH lead AS (
                SELECT CAST(substring(CAST(CAST(floor(abs(o_totalprice))
                           AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit
                FROM orders
                WHERE o_totalprice IS NOT NULL
                  AND abs(o_totalprice) >= 1
            ),
            counts AS (SELECT digit, count(*) AS n FROM lead GROUP BY 1),
            tot AS (SELECT sum(n) AS total FROM counts),
            dig AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit)
            SELECT dig.digit,
                   coalesce(c.n, 0) AS n,
                   CAST(coalesce(c.n, 0) AS DOUBLE)
                       / CAST(t.total AS DOUBLE) AS share,
                   log10(1.0 + 1.0 / CAST(dig.digit AS DOUBLE)) AS expected,
                   abs(CAST(coalesce(c.n, 0) AS DOUBLE)
                           / CAST(t.total AS DOUBLE)
                       - log10(1.0 + 1.0 / CAST(dig.digit AS DOUBLE)))
                       AS abs_dev,
                   (CAST(coalesce(c.n, 0) AS DOUBLE)
                    - log10(1.0 + 1.0 / CAST(dig.digit AS DOUBLE))
                      * CAST(t.total AS DOUBLE))
                   * (CAST(coalesce(c.n, 0) AS DOUBLE)
                      - log10(1.0 + 1.0 / CAST(dig.digit AS DOUBLE))
                        * CAST(t.total AS DOUBLE))
                   / (log10(1.0 + 1.0 / CAST(dig.digit AS DOUBLE))
                      * CAST(t.total AS DOUBLE)) AS chi2_term
            FROM dig LEFT JOIN counts c USING (digit) CROSS JOIN tot t
        """,
        "power_law": """
            -- distinct-degree points sorted by k; five sums as
            -- 0.0-prepended left-assoc list_reduce folds (the L39
            -- float discipline); fixed IEEE fit tree mirrors Spark's
            WITH edges AS (
                SELECT 'o:' || CAST(o_orderkey AS VARCHAR) AS src,
                       'c:' || CAST(o_custkey AS VARCHAR) AS dst
                FROM orders
            ),
            ends AS (
                SELECT src AS node FROM edges
                UNION ALL
                SELECT dst AS node FROM edges
            ),
            deg AS (SELECT node, count(*) AS k FROM ends GROUP BY 1),
            dist AS (
                SELECT k, count(*) AS n_k FROM deg WHERE k >= 1 GROUP BY 1
            ),
            pts AS (
                SELECT list_sort(list(struct_pack(
                           k := k,
                           x := ln(CAST(k AS DOUBLE)),
                           y := ln(CAST(n_k AS DOUBLE))))) AS a
                FROM dist
            ),
            sums AS (
                SELECT CAST(len(a) AS BIGINT) AS n_points,
                       CAST(len(a) AS DOUBLE) AS n,
                       list_reduce(list_prepend(0.0, [p.x FOR p IN a]),
                                   (acc, v) -> acc + v) AS sx,
                       list_reduce(list_prepend(0.0, [p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS sy,
                       list_reduce(list_prepend(0.0,
                                       [p.x * p.x FOR p IN a]),
                                   (acc, v) -> acc + v) AS sxx,
                       list_reduce(list_prepend(0.0,
                                       [p.x * p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS sxy,
                       list_reduce(list_prepend(0.0,
                                       [p.y * p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS syy
                FROM pts
            ),
            t AS (
                SELECT n_points, n, sx, sy,
                       n * sxy - sx * sy AS covn,
                       n * sxx - sx * sx AS varxn,
                       n * syy - sy * sy AS varyn
                FROM sums
            )
            SELECT n_points,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                        THEN -(covn / varxn) END AS alpha,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                        THEN (sy - (covn / varxn) * sx) / n END
                       AS intercept,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                            AND varyn > 0.0
                        THEN (covn * covn) / (varxn * varyn) END AS r2
            FROM t
        """,
        "roc_auc": """
            -- doubled average-rank sums are exact integers
            -- (2·avg_rank = 2·before + cnt + 1); DECIMAL(38,0)
            -- accumulation, one final IEEE division — Spark's tree
            WITH base AS (
                SELECT o_orderpriority AS priority,
                       CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END
                           AS label,
                       floor(o_totalprice / 100.0) AS s
                FROM orders
                WHERE o_totalprice IS NOT NULL
            ),
            pts AS (
                SELECT priority, s, count(*) AS cnt, sum(label) AS pos
                FROM base GROUP BY 1, 2
            ),
            wnd AS (
                SELECT priority, cnt, pos,
                       coalesce(sum(cnt) OVER (
                           PARTITION BY priority ORDER BY s
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS bef
                FROM pts
            ),
            agg AS (
                SELECT priority,
                       CAST(sum(pos) AS BIGINT) AS n_pos,
                       CAST(sum(cnt - pos) AS BIGINT) AS n_neg,
                       sum(CAST(pos AS DECIMAL(38,0))
                           * CAST(2 * bef + cnt + 1 AS DECIMAL(38,0)))
                           AS r2pos
                FROM wnd GROUP BY 1
            ),
            fit AS (
                SELECT priority, n_pos, n_neg,
                       r2pos - CAST(n_pos AS DECIMAL(38,0))
                               * (CAST(n_pos AS DECIMAL(38,0))
                                  + CAST(1 AS DECIMAL(38,0))) AS u2
                FROM agg
            )
            SELECT priority, n_pos, n_neg,
                   CASE WHEN n_pos > 0 AND n_neg > 0
                        THEN CAST(u2 AS DOUBLE) / 2.0 END AS u,
                   CASE WHEN n_pos > 0 AND n_neg > 0
                        THEN CAST(u2 AS DOUBLE)
                             / CAST(CAST(2 AS DECIMAL(38,0))
                                    * CAST(n_pos AS DECIMAL(38,0))
                                    * CAST(n_neg AS DECIMAL(38,0))
                                    AS DOUBLE) END AS auc
            FROM fit
        """,
        "modularity": """
            -- Q = (4m·Σe_c − Σd_c²)/(4m²): exact integer statistics,
            -- one final IEEE division — Spark's tree
            WITH edges AS (
                SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS src,
                       'n:' || CAST(c_nationkey AS VARCHAR) AS dst
                FROM customer
            ),
            comm AS (
                SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS node,
                       n_regionkey AS c
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                UNION ALL
                SELECT 'n:' || CAST(n_nationkey AS VARCHAR), n_regionkey
                FROM nation
            ),
            mm AS (SELECT count(*) AS m FROM edges),
            intra AS (
                SELECT cu.c AS c,
                       sum(CASE WHEN cu.c = cv.c THEN 1 ELSE 0 END) AS e_c
                FROM edges
                JOIN comm cu ON edges.src = cu.node
                JOIN comm cv ON edges.dst = cv.node
                GROUP BY 1
            ),
            deg AS (
                SELECT node, count(*) AS deg
                FROM (SELECT src AS node FROM edges
                      UNION ALL SELECT dst FROM edges)
                GROUP BY 1
            ),
            dc AS (
                SELECT comm.c, sum(deg.deg) AS d_c
                FROM deg JOIN comm ON deg.node = comm.node
                GROUP BY 1
            ),
            stats AS (
                SELECT CAST(count(*) AS BIGINT) AS n_communities,
                       sum(CAST(coalesce(intra.e_c, 0) AS BIGINT)) AS se,
                       sum(CAST(dc.d_c AS BIGINT)
                           * CAST(dc.d_c AS BIGINT)) AS sd2
                FROM dc LEFT JOIN intra ON dc.c = intra.c
            )
            SELECT CAST(mm.m AS BIGINT) AS m,
                   stats.n_communities,
                   CASE WHEN mm.m > 0 THEN
                       CAST(4 * mm.m * stats.se - stats.sd2 AS DOUBLE)
                       / CAST(4 * mm.m * mm.m AS DOUBLE)
                   END AS q
            FROM stats CROSS JOIN mm
        """,
        "assortativity": """
            -- endpoint-degree Pearson over both edge orientations:
            -- r = (N·Σxy − (Σx)²)/(N·Σxx − (Σx)²), all sums exact
            WITH edges AS (
                SELECT 'o:' || CAST(o_orderkey AS VARCHAR) AS src,
                       'c:' || CAST(o_custkey AS VARCHAR) AS dst
                FROM orders
            ),
            deg AS (
                SELECT node, count(*) AS deg
                FROM (SELECT src AS node FROM edges
                      UNION ALL SELECT dst FROM edges)
                GROUP BY 1
            ),
            boths AS (
                SELECT src AS u, dst AS v FROM edges
                UNION ALL
                SELECT dst AS u, src AS v FROM edges
            ),
            paired AS (
                SELECT CAST(du.deg AS BIGINT) AS x,
                       CAST(dv.deg AS BIGINT) AS y
                FROM boths
                JOIN deg du ON boths.u = du.node
                JOIN deg dv ON boths.v = dv.node
            ),
            s AS (
                SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(x * y) AS BIGINT) AS sxy,
                       CAST(sum(x * x) AS BIGINT) AS sxx
                FROM paired
            )
            SELECT CAST(n / 2 AS BIGINT) AS m,
                   CASE WHEN n * sxx - sx * sx <> 0 THEN
                       CAST(n * sxy - sx * sx AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
                   END AS r
            FROM s
        """,
        "gini": """
            -- G = (2·Σi·x − (n+1)·Σx)/(n·Σx): decimal-exact
            -- rank-value sums (row_number ties are safe: equal
            -- values give the same Σi·x), one final IEEE division
            WITH ranked AS (
                SELECT o_orderpriority AS priority,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS x,
                       row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                       ) AS i
                FROM orders WHERE o_totalprice IS NOT NULL
            ),
            agg AS (
                SELECT priority,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS DECIMAL(18,2)) AS total,
                       CAST(sum(CAST(i AS DECIMAL(19,0)) * x)
                            AS DECIMAL(25,2)) AS six
                FROM ranked GROUP BY 1
            )
            SELECT priority, n,
                   CAST(total AS DOUBLE) AS total,
                   CASE WHEN total <> 0 THEN
                       CAST(six + six - CAST(n + 1 AS DECIMAL(19,0))
                                * CAST(total AS DECIMAL(19,2)) AS DOUBLE)
                       / CAST(CAST(n AS DECIMAL(19,0))
                              * CAST(total AS DECIMAL(19,2)) AS DOUBLE)
                   END AS gini
            FROM agg
        """,
        "acf": """
            -- mean-centred without dividing: c = n·x − S (exact
            -- decimal), r_h = Σ c·lag_h(c) / Σ c² — the n² cancels;
            -- one IEEE division per lag
            WITH base AS (
                SELECT user_id % 4 AS bucket, ts, event_id,
                       CAST(value AS DECIMAL(18,2)) AS x
                FROM events WHERE value IS NOT NULL
            ),
            stats AS (
                SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS DECIMAL(18,2)) AS s
                FROM base GROUP BY 1
            ),
            centred AS (
                SELECT b.bucket, st.n,
                       CAST(CAST(st.n AS DECIMAL(10,0)) * b.x
                            - st.s AS DECIMAL(19,2)) AS c,
                       b.ts, b.event_id
                FROM base b JOIN stats st ON b.bucket = st.bucket
            ),
            lagged AS (
                SELECT bucket, n, c,
                       lag(c, 1) OVER w AS l1,
                       lag(c, 2) OVER w AS l2,
                       lag(c, 3) OVER w AS l3
                FROM centred
                WINDOW w AS (PARTITION BY bucket ORDER BY ts, event_id)
            ),
            sums AS (
                SELECT bucket, n,
                       sum(c * c) AS den,
                       sum(c * l1) AS num1,
                       sum(c * l2) AS num2,
                       sum(c * l3) AS num3
                FROM lagged GROUP BY 1, 2
            )
            SELECT bucket, CAST(lag AS INTEGER) AS lag, n,
                   CASE WHEN den IS NOT NULL AND den <> 0
                            AND num IS NOT NULL
                        THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                   END AS r
            FROM (
                SELECT bucket, n, den, 1 AS lag, num1 AS num FROM sums
                UNION ALL
                SELECT bucket, n, den, 2, num2 FROM sums
                UNION ALL
                SELECT bucket, n, den, 3, num3 FROM sums
            )
        """,
        "mutual_info": """
            -- MI = Σ (o/N)·ln(o·N/(rt·ct)); entropies over margins;
            -- bounded sums as 0.0-prepended sorted list_reduce folds
            -- (the L140 float discipline), NMI = MI/sqrt(Hx·Hy)
            WITH flt AS (
                SELECT o_orderpriority AS x, o_orderstatus AS y
                FROM orders
                WHERE o_orderpriority IS NOT NULL
                  AND o_orderstatus IS NOT NULL
            ),
            cells AS (SELECT x, y, count(*) AS o FROM flt GROUP BY 1, 2),
            r AS (SELECT x, sum(o) AS rt FROM cells GROUP BY 1),
            c AS (SELECT y, sum(o) AS ct FROM cells GROUP BY 1),
            tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
            terms AS (
                SELECT t.n, cells.x, cells.y,
                       CAST(cells.o AS DOUBLE) / CAST(t.n AS DOUBLE)
                       * ln(CAST(cells.o AS DOUBLE)
                                * CAST(t.n AS DOUBLE)
                            / CAST(r.rt * c.ct AS DOUBLE)) AS term
                FROM cells JOIN r USING (x) JOIN c USING (y)
                CROSS JOIN tot t
            ),
            mi AS (
                SELECT n,
                       list_reduce(list_prepend(0.0,
                           [s.t FOR s IN list_sort(list(struct_pack(
                               x := x, y := y, t := term)))]),
                           (a, v) -> a + v) AS mi
                FROM terms GROUP BY n
            ),
            hx AS (
                SELECT t.n,
                       list_reduce(list_prepend(0.0,
                           [s.t FOR s IN list_sort(list(struct_pack(
                               x := r.x,
                               t := -(CAST(r.rt AS DOUBLE)
                                          / CAST(t.n AS DOUBLE)
                                      * ln(CAST(r.rt AS DOUBLE)
                                           / CAST(t.n AS DOUBLE))))))]),
                           (a, v) -> a + v) AS h_x
                FROM r CROSS JOIN tot t GROUP BY t.n
            ),
            hy AS (
                SELECT t.n,
                       list_reduce(list_prepend(0.0,
                           [s.t FOR s IN list_sort(list(struct_pack(
                               y := c.y,
                               t := -(CAST(c.ct AS DOUBLE)
                                          / CAST(t.n AS DOUBLE)
                                      * ln(CAST(c.ct AS DOUBLE)
                                           / CAST(t.n AS DOUBLE))))))]),
                           (a, v) -> a + v) AS h_y
                FROM c CROSS JOIN tot t GROUP BY t.n
            )
            SELECT mi.n, mi.mi, hx.h_x, hy.h_y,
                   CASE WHEN hx.h_x > 0.0 AND hy.h_y > 0.0
                        THEN mi.mi / sqrt(hx.h_x * hy.h_y) END AS nmi
            FROM mi JOIN hx USING (n) JOIN hy USING (n)
        """,
        "jsd": """
            -- JSD = ½Σ[p·ln(2p/(p+q)) + q·ln(2q/(p+q))] with the
            -- x·ln x → 0 limit pinned to exactly 0; ordered category
            -- fold; Spark's exact term tree mirrored
            WITH flt AS (
                SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END
                           AS cohort,
                       event_type AS cat
                FROM events WHERE event_type IS NOT NULL
            ),
            cats AS (
                SELECT cat,
                       sum(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END)
                           AS ca,
                       sum(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END)
                           AS cb
                FROM flt GROUP BY 1
            ),
            tot AS (
                SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                       CAST(sum(cb) AS BIGINT) AS n_b
                FROM cats
            ),
            terms AS (
                SELECT t.n_a, t.n_b, cat,
                       (CASE WHEN ca > 0 THEN
                            CAST(ca AS DOUBLE) / CAST(t.n_a AS DOUBLE)
                            * ln(CAST(ca AS DOUBLE)
                                     / CAST(t.n_a AS DOUBLE)
                                 + CAST(ca AS DOUBLE)
                                     / CAST(t.n_a AS DOUBLE))
                            - CAST(ca AS DOUBLE) / CAST(t.n_a AS DOUBLE)
                              * ln(CAST(ca AS DOUBLE)
                                       / CAST(t.n_a AS DOUBLE)
                                   + CAST(cb AS DOUBLE)
                                       / CAST(t.n_b AS DOUBLE))
                        ELSE 0.0 END)
                       + (CASE WHEN cb > 0 THEN
                            CAST(cb AS DOUBLE) / CAST(t.n_b AS DOUBLE)
                            * ln(CAST(cb AS DOUBLE)
                                     / CAST(t.n_b AS DOUBLE)
                                 + CAST(cb AS DOUBLE)
                                     / CAST(t.n_b AS DOUBLE))
                            - CAST(cb AS DOUBLE) / CAST(t.n_b AS DOUBLE)
                              * ln(CAST(ca AS DOUBLE)
                                       / CAST(t.n_a AS DOUBLE)
                                   + CAST(cb AS DOUBLE)
                                       / CAST(t.n_b AS DOUBLE))
                        ELSE 0.0 END) AS term
                FROM cats CROSS JOIN tot t
            )
            SELECT n_a, n_b,
                   CASE WHEN n_a > 0 AND n_b > 0 THEN
                       list_reduce(list_prepend(0.0,
                           [s.t FOR s IN list_sort(list(struct_pack(
                               cat := cat, t := term)))]),
                           (a, v) -> a + v) / 2.0
                   END AS jsd
            FROM terms GROUP BY n_a, n_b
        """,
        "cusum": """
            -- S_t = P_t − min(0, min_{k≤t} P_k): the CUSUM recurrence
            -- as prefix-sum + running-min; every value DECIMAL-exact
            WITH base AS (
                SELECT user_id % 4 AS bucket, ts, event_id,
                       CAST(value AS DECIMAL(18,2)) AS x
                FROM events WHERE value IS NOT NULL
            ),
            staged AS (
                SELECT bucket, ts, event_id, x,
                       CAST(x - CAST('50.00' AS DECIMAL(18,2))
                              - CAST('5.00' AS DECIMAL(18,2))
                            AS DECIMAL(30,2)) AS dh,
                       CAST(CAST('50.00' AS DECIMAL(18,2)) - x
                              - CAST('5.00' AS DECIMAL(18,2))
                            AS DECIMAL(30,2)) AS dl
                FROM base
            ),
            pre AS (
                SELECT bucket, ts, event_id, x,
                       CAST(sum(dh) OVER w AS DECIMAL(30,2)) AS ph,
                       CAST(sum(dl) OVER w AS DECIMAL(30,2)) AS pl
                FROM staged
                WINDOW w AS (PARTITION BY bucket ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
            ),
            cum AS (
                SELECT bucket, ts, event_id, x, ph, pl,
                       CAST(min(ph) OVER w AS DECIMAL(30,2)) AS mh,
                       CAST(min(pl) OVER w AS DECIMAL(30,2)) AS ml
                FROM pre
                WINDOW w AS (PARTITION BY bucket ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
            )
            SELECT bucket, ts, event_id,
                   CAST(x AS DOUBLE) AS value,
                   CAST(ph - least(CAST(0 AS DECIMAL(30,2)), mh)
                        AS DOUBLE) AS s_hi,
                   CAST(pl - least(CAST(0 AS DECIMAL(30,2)), ml)
                        AS DOUBLE) AS s_lo,
                   ph - least(CAST(0 AS DECIMAL(30,2)), mh)
                       > CAST('500.00' AS DECIMAL(30,2)) AS alarm_hi,
                   pl - least(CAST(0 AS DECIMAL(30,2)), ml)
                       > CAST('500.00' AS DECIMAL(30,2)) AS alarm_lo
            FROM cum
        """,
        "kaplan_meier": """
            -- S(t) = Π_{s≤t} (n−d)/n as a 1.0-prepended t-sorted
            -- prefix fold; risk sets exact integer cumsums
            WITH u AS (
                SELECT user_id,
                       (max(event_id) - min(event_id)) % 30 AS dur
                FROM events GROUP BY 1
            ),
            d AS (
                SELECT user_id % 2 AS cohort, dur,
                       CASE WHEN user_id % 5 <> 0 THEN 1 ELSE 0 END AS ev
                FROM u
            ),
            pts AS (
                SELECT cohort, CAST(dur AS BIGINT) AS t,
                       CAST(sum(ev) AS BIGINT) AS d,
                       CAST(sum(1 - ev) AS BIGINT) AS c
                FROM d WHERE dur IS NOT NULL GROUP BY 1, 2
            ),
            risk AS (
                SELECT cohort, t, d, c,
                       CAST(sum(d + c) OVER (PARTITION BY cohort)
                            - coalesce(sum(d + c) OVER (
                                  PARTITION BY cohort ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0)
                            AS BIGINT) AS n
                FROM pts
            ),
            packed AS (
                SELECT cohort,
                       list_sort(list(struct_pack(
                           t := t, d := d, c := c, n := n))) AS a
                FROM risk GROUP BY 1
            ),
            rws AS (SELECT cohort, a, unnest(a) AS s FROM packed)
            SELECT cohort, s.t AS t, s.n AS n_risk, s.d AS n_events,
                   s.c AS n_censored,
                   list_reduce(list_prepend(1.0,
                       [CAST(x.n - x.d AS DOUBLE) / CAST(x.n AS DOUBLE)
                        FOR x IN list_filter(a, x -> x.t <= s.t)]),
                       (acc, v) -> acc * v) AS survival
            FROM rws
        """,
        "logrank": """
            -- O−E and hypergeometric V folded over the pooled grid in
            -- t order; χ² = (O−E)²/V — Spark's fixed trees mirrored
            WITH u AS (
                SELECT user_id,
                       (max(event_id) - min(event_id)) % 30 AS dur
                FROM events GROUP BY 1
            ),
            d AS (
                SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ga,
                       dur,
                       CASE WHEN user_id % 5 <> 0 THEN 1 ELSE 0 END AS ev
                FROM u
            ),
            pts AS (
                SELECT CAST(dur AS BIGINT) AS t,
                       CAST(sum(ev * ga) AS BIGINT) AS d1,
                       CAST(sum(ev * (1 - ga)) AS BIGINT) AS d2,
                       CAST(sum((1 - ev) * ga) AS BIGINT) AS c1,
                       CAST(sum((1 - ev) * (1 - ga)) AS BIGINT) AS c2
                FROM d WHERE dur IS NOT NULL GROUP BY 1
            ),
            risk AS (
                SELECT t, d1, d2, c1, c2,
                       CAST(sum(d1 + c1) OVER ()
                            - coalesce(sum(d1 + c1) OVER (
                                  ORDER BY t ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND 1 PRECEDING), 0)
                            AS BIGINT) AS n1,
                       CAST(sum(d2 + c2) OVER ()
                            - coalesce(sum(d2 + c2) OVER (
                                  ORDER BY t ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND 1 PRECEDING), 0)
                            AS BIGINT) AS n2
                FROM pts
            ),
            terms AS (
                SELECT t,
                       CAST(d1 AS DOUBLE)
                       - CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                         / CAST(n1 + n2 AS DOUBLE) AS oe,
                       CASE WHEN n1 + n2 > 1 THEN
                           CAST(d1 + d2 AS DOUBLE)
                           * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                           * (CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                           * ((CAST(n1 + n2 AS DOUBLE)
                               - CAST(d1 + d2 AS DOUBLE))
                              / (CAST(n1 + n2 AS DOUBLE) - 1.0))
                       ELSE 0.0 END AS v,
                       d1, d2, c1, c2
                FROM risk
            ),
            folded AS (
                SELECT CAST(sum(d1 + c1) AS BIGINT) AS n_a,
                       CAST(sum(d2 + c2) AS BIGINT) AS n_b,
                       CAST(sum(d1) AS BIGINT) AS o1,
                       list_reduce(list_prepend(0.0,
                           [s.oe FOR s IN list_sort(list(struct_pack(
                               t := t, oe := oe)))]),
                           (a, x) -> a + x) AS oe,
                       list_reduce(list_prepend(0.0,
                           [s.v FOR s IN list_sort(list(struct_pack(
                               t := t, v := v)))]),
                           (a, x) -> a + x) AS v
                FROM terms
            )
            SELECT n_a, n_b, o1,
                   CAST(o1 AS DOUBLE) - oe AS e1,
                   v,
                   CASE WHEN v > 0.0 THEN (oe * oe) / v END AS chi2
            FROM folded
        """,
        "mann_kendall": """
            -- S = Σ sgn over the t-ordered pair lattice (exact int),
            -- tie-corrected Var·18 exact int, Z = (S∓1)/sqrt(Var)
            WITH base AS (
                SELECT user_id, CAST(event_id AS DOUBLE) AS t,
                       CAST(value AS DOUBLE) AS x
                FROM events
                WHERE user_id < 40 AND value IS NOT NULL
                  AND event_id IS NOT NULL
            ),
            s_tbl AS (
                SELECT a.user_id,
                       CAST(sum(CAST(sign(b.x - a.x) AS BIGINT))
                            AS BIGINT) AS s
                FROM base a JOIN base b
                  ON a.user_id = b.user_id
                 AND (a.t < b.t OR (a.t = b.t AND a.x < b.x))
                GROUP BY 1
            ),
            nn AS (
                SELECT user_id, CAST(count(*) AS INTEGER) AS n
                FROM base GROUP BY 1
            ),
            ties AS (
                SELECT user_id,
                       CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
                           AS tie_term
                FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS tc
                      FROM base GROUP BY user_id, x)
                GROUP BY 1
            ),
            j AS (
                SELECT s_tbl.user_id, nn.n, s_tbl.s,
                       CAST(nn.n AS BIGINT) * (CAST(nn.n AS BIGINT) - 1)
                           * (2 * CAST(nn.n AS BIGINT) + 5)
                           - ties.tie_term AS var18
                FROM s_tbl
                JOIN nn ON s_tbl.user_id = nn.user_id
                JOIN ties ON s_tbl.user_id = ties.user_id
            )
            SELECT user_id, n, s,
                   CAST(var18 AS DOUBLE) / 18.0 AS var_s,
                   CASE WHEN var18 > 0 THEN
                       CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                                / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                            WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                                / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                            ELSE 0.0 END
                   END AS z
            FROM j
        """,
        "theil_sen": """
            -- median of pairwise slopes: each ONE division, median an
            -- exact order statistic over the sorted slope list
            WITH base AS (
                SELECT user_id, CAST(event_id AS DOUBLE) AS t,
                       CAST(value AS DOUBLE) AS x
                FROM events
                WHERE user_id < 40 AND value IS NOT NULL
                  AND event_id IS NOT NULL
            ),
            slopes AS (
                SELECT a.user_id,
                       list_sort(list((b.x - a.x) / (b.t - a.t))) AS s
                FROM base a JOIN base b
                  ON a.user_id = b.user_id
                 AND (a.t < b.t OR (a.t = b.t AND a.x < b.x))
                WHERE b.t <> a.t
                GROUP BY 1
            )
            SELECT user_id,
                   CAST(len(s) AS INTEGER) AS n_slopes,
                   CASE WHEN len(s) > 0 THEN
                       CASE WHEN len(s) % 2 = 1
                            THEN s[CAST(floor(len(s) / 2) + 1 AS INTEGER)]
                            ELSE (s[CAST(floor((len(s) + 1) / 2) AS INTEGER)]
                                  + s[CAST(floor(len(s) / 2) + 1 AS INTEGER)])
                                 / 2.0 END
                   END AS slope
            FROM slopes
        """,
        "seasonal": """
            -- trend = W/p (decimal window sum, one division); raw
            -- seasonal index from exact p·x − W numerators; centered
            -- by the phase-sorted fold; remainder = (x−trend)−seasonal
            WITH base AS (
                SELECT user_id, event_id AS o,
                       CAST(value AS DECIMAL(18,2)) AS x
                FROM events WHERE user_id < 8 AND value IS NOT NULL
            ),
            idx AS (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY o) - 1 AS i
                FROM base
            ),
            st AS (
                SELECT user_id, o, x, i % 7 AS phase,
                       sum(x) OVER w AS wsum,
                       count(x) OVER w AS wc
                FROM idx
                WINDOW w AS (PARTITION BY user_id ORDER BY o
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            ),
            st2 AS (
                SELECT user_id, o, x, phase,
                       CASE WHEN wc = 7
                            THEN CAST(wsum AS DOUBLE) / 7.0 END AS trend,
                       CASE WHEN wc = 7
                            THEN CAST(7 AS DECIMAL(9,0)) * x - wsum
                       END AS dn
                FROM st
            ),
            raw AS (
                SELECT user_id, phase,
                       CAST(sum(dn) AS DOUBLE)
                       / (7.0 * CAST(count(*) AS DOUBLE)) AS r
                FROM st2 WHERE dn IS NOT NULL GROUP BY 1, 2
            ),
            packed AS (
                SELECT user_id,
                       list_sort(list(struct_pack(phase := phase, r := r)))
                           AS a
                FROM raw GROUP BY 1
            ),
            centered AS (
                SELECT user_id, s.phase AS phase,
                       s.r - list_reduce(list_prepend(0.0,
                                 [q.r FOR q IN a]), (acc, v) -> acc + v)
                             / CAST(len(a) AS DOUBLE) AS seasonal
                FROM (SELECT user_id, a, unnest(a) AS s FROM packed)
            )
            SELECT st2.user_id, st2.o AS event_id,
                   CAST(st2.x AS DOUBLE) AS value,
                   CAST(st2.phase AS INTEGER) AS phase,
                   st2.trend,
                   c.seasonal,
                   CASE WHEN st2.trend IS NOT NULL
                            AND c.seasonal IS NOT NULL
                        THEN (CAST(st2.x AS DOUBLE) - st2.trend)
                             - c.seasonal END AS remainder
            FROM st2 LEFT JOIN centered c
              ON st2.user_id = c.user_id AND st2.phase = c.phase
        """,
        "brier": """
            WITH base AS (
                SELECT CAST(CAST(o_orderkey % 100 AS DECIMAL(9,2))
                            * CAST('0.01' AS DECIMAL(9,2))
                            AS DECIMAL(12,4)) AS p,
                       CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y
                FROM orders
            )
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum((p - CAST(y AS DECIMAL(12,4)))
                            * (p - CAST(y AS DECIMAL(12,4)))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS brier
            FROM base
        """,
        "runs_test": """
            -- one lag window, exact HUGEINT moments, fixed z tree
            WITH base AS (
                SELECT event_type AS g, event_id AS t,
                       CASE WHEN CAST(floor(value) AS BIGINT) % 2 = 0
                            THEN 1 ELSE 0 END AS x
                FROM events
                WHERE value IS NOT NULL AND event_id IS NOT NULL
            ),
            st AS (
                SELECT g, x,
                       CASE WHEN x <> lag(x) OVER (PARTITION BY g
                                ORDER BY t) THEN 1 ELSE 0 END AS chg
                FROM base
            ),
            agg AS (
                SELECT g, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS BIGINT) AS n1,
                       CAST(sum(1 - x) AS BIGINT) AS n0,
                       CAST(coalesce(sum(chg), 0) + 1 AS BIGINT)
                           AS runs
                FROM st GROUP BY 1
            ),
            d AS (
                SELECT g, n, n1, n0, runs,
                       2 * CAST(n1 AS HUGEINT) * n0 AS p2
                FROM agg
            )
            SELECT g, n, n1, n0, runs,
                   CASE WHEN n1 > 0 AND n0 > 0
                             AND CAST(p2 * (p2 - n) AS DOUBLE)
                                 / CAST(CAST(n AS HUGEINT) * n
                                        * (n - 1) AS DOUBLE) > 0
                        THEN (CAST(runs AS DOUBLE)
                              - (1.0 + CAST(p2 AS DOUBLE)
                                       / CAST(n AS DOUBLE)))
                             / sqrt(CAST(p2 * (p2 - n) AS DOUBLE)
                                    / CAST(CAST(n AS HUGEINT) * n
                                           * (n - 1) AS DOUBLE))
                   END AS z
            FROM d
        """,
        "ols_influence": """
            -- fit stats once, per-row fixed leverage/resid/Cook trees
            WITH base AS (
                SELECT l_returnflag AS flag,
                       l_orderkey * 10 + l_linenumber AS rid,
                       l_quantity AS x, l_extendedprice AS y,
                       CAST(l_quantity AS DECIMAL(18,2)) AS xd,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS yd
                FROM lineitem
                WHERE l_orderkey % 20 = 0
                  AND l_quantity IS NOT NULL
                  AND l_extendedprice IS NOT NULL
            ),
            stats AS (
                SELECT flag, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(xd) AS DOUBLE) AS sx,
                       CAST(sum(yd) AS DOUBLE) AS sy,
                       CAST(sum(xd * xd) AS DOUBLE) AS sxx,
                       CAST(sum(xd * yd) AS DOUBLE) AS sxy,
                       CAST(sum(yd * yd) AS DOUBLE) AS syy
                FROM base GROUP BY 1
            ),
            d AS (
                SELECT b.flag, b.rid, b.x, b.y,
                       CAST(b.x AS DOUBLE) AS xi,
                       CAST(b.y AS DOUBLE) AS yi,
                       s.n, CAST(s.n AS DOUBLE) AS nd,
                       s.sx, s.sy,
                       s.sxx - s.sx * s.sx / CAST(s.n AS DOUBLE)
                           AS sxx_c,
                       s.sxy - s.sx * s.sy / CAST(s.n AS DOUBLE)
                           AS sxy_c,
                       s.syy - s.sy * s.sy / CAST(s.n AS DOUBLE)
                           AS syy_c
                FROM base b JOIN stats s USING (flag)
            ),
            f AS (
                SELECT flag, rid, x, y, xi, yi, n, nd, sx, sy,
                       sxx_c,
                       sxy_c / sxx_c AS b,
                       (sy - (sxy_c / sxx_c) * sx) / nd AS a,
                       (syy_c - (sxy_c / sxx_c) * sxy_c) / (nd - 2.0)
                           AS s2
                FROM d
            ),
            g AS (
                SELECT flag, rid, x, y, n, sxx_c, s2,
                       1.0 / nd + (xi - sx / nd) * (xi - sx / nd)
                           / sxx_c AS h,
                       yi - (a + b * xi) AS e
                FROM f
            )
            SELECT flag, rid AS id, x, y,
                   CASE WHEN n > 2 AND sxx_c > 0 AND s2 > 0
                        THEN h END AS leverage,
                   CASE WHEN n > 2 AND sxx_c > 0 AND s2 > 0
                        THEN e END AS resid,
                   CASE WHEN n > 2 AND sxx_c > 0 AND s2 > 0
                             AND h < 1
                        THEN e * e / (2.0 * s2)
                             * (h / ((1.0 - h) * (1.0 - h)))
                   END AS cooks_d
            FROM g
        """,
        "anova": """
            -- one-pass ANOVA: exact decimal level stats, sorted-level
            -- list_reduce folds, fixed IEEE F / eta^2 trees
            WITH vals AS (
                SELECT event_type AS lvl,
                       CAST(CAST(floor(value) AS BIGINT)
                            AS DECIMAL(18,2)) AS v
                FROM events
                WHERE value IS NOT NULL AND event_type IS NOT NULL
            ),
            per AS (
                SELECT lvl, CAST(count(*) AS BIGINT) AS nj,
                       CAST(sum(v) AS DOUBLE) AS sj,
                       CAST(sum(v * v) AS DOUBLE) AS qj,
                       sum(v) AS sj_dec
                FROM vals GROUP BY 1
            ),
            tot AS (
                SELECT CAST(sum(nj) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS k,
                       CAST(sum(sj_dec) AS DOUBLE) AS stot,
                       list_sort(list(struct_pack(
                           g := lvl, nj := nj, sj := sj, qj := qj
                       ))) AS lv
                FROM per
            ),
            folds AS (
                SELECT n, k,
                       list_reduce(
                           list_prepend(0.0,
                               [CAST(s.nj AS DOUBLE)
                                * (s.sj / CAST(s.nj AS DOUBLE)
                                   - stot / CAST(n AS DOUBLE))
                                * (s.sj / CAST(s.nj AS DOUBLE)
                                   - stot / CAST(n AS DOUBLE))
                                FOR s IN lv]),
                           (acc, t) -> acc + t) AS ssb,
                       list_reduce(
                           list_prepend(0.0,
                               [s.qj - s.sj * s.sj
                                       / CAST(s.nj AS DOUBLE)
                                FOR s IN lv]),
                           (acc, t) -> acc + t) AS ssw
                FROM tot
            )
            SELECT k, n,
                   CASE WHEN k >= 2 AND n > k AND ssw > 0
                        THEN (ssb / (CAST(k AS DOUBLE) - 1.0))
                             / (ssw / (CAST(n AS DOUBLE)
                                       - CAST(k AS DOUBLE)))
                   END AS f,
                   CASE WHEN ssb + ssw > 0
                        THEN ssb / (ssb + ssw) END AS eta_sq
            FROM folds
        """,
        "two_prop": """
            -- pooled z + Katz log-scale SEs from exact integer cells
            WITH agg AS (
                SELECT o_orderpriority AS prio,
                       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1
                                ELSE 0 END) AS BIGINT) AS n_a,
                       CAST(sum(CASE WHEN o_orderkey % 2 = 1
                                     AND o_orderkey % 3 = 0 THEN 1
                                ELSE 0 END) AS BIGINT) AS k_a,
                       CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1
                                ELSE 0 END) AS BIGINT) AS n_b,
                       CAST(sum(CASE WHEN o_orderkey % 2 = 0
                                     AND o_orderkey % 3 = 0 THEN 1
                                ELSE 0 END) AS BIGINT) AS k_b
                FROM orders GROUP BY 1
            ),
            d AS (
                SELECT prio, n_a, k_a, n_b, k_b,
                       CAST(n_a AS DOUBLE) AS nad,
                       CAST(k_a AS DOUBLE) AS kad,
                       CAST(n_b AS DOUBLE) AS nbd,
                       CAST(k_b AS DOUBLE) AS kbd
                FROM agg
            )
            SELECT prio, n_a, k_a, n_b, k_b,
                   CASE WHEN n_a > 0 AND n_b > 0 AND k_a + k_b > 0
                             AND k_a + k_b < n_a + n_b
                        THEN (kad / nad - kbd / nbd)
                             / sqrt(((kad + kbd) / (nad + nbd))
                                    * (1.0 - (kad + kbd) / (nad + nbd))
                                    * (1.0 / nad + 1.0 / nbd))
                   END AS z,
                   CASE WHEN k_a > 0 AND k_b > 0 AND n_a > 0
                             AND n_b > 0
                        THEN (kad / nad) / (kbd / nbd) END
                       AS risk_ratio,
                   CASE WHEN k_a > 0 AND k_b > 0 AND n_a > 0
                             AND n_b > 0
                        THEN sqrt(1.0 / kad - 1.0 / nad + 1.0 / kbd
                                  - 1.0 / nbd) END AS rr_se_log,
                   CASE WHEN k_a > 0 AND k_b > 0 AND k_a < n_a
                             AND k_b < n_b
                        THEN (kad * (nbd - kbd)) / (kbd * (nad - kad))
                   END AS odds_ratio,
                   CASE WHEN k_a > 0 AND k_b > 0 AND k_a < n_a
                             AND k_b < n_b
                        THEN sqrt(1.0 / kad + 1.0 / (nad - kad)
                                  + 1.0 / kbd + 1.0 / (nbd - kbd))
                   END AS or_se_log
            FROM d
        """,
        "durbin_watson": """
            -- exact decimal diff/level sums, one division
            WITH base AS (
                SELECT event_type AS g, event_id AS t,
                       CAST(CAST(floor(value) AS BIGINT)
                            AS DECIMAL(18,2)) AS v
                FROM events
                WHERE value IS NOT NULL AND event_id IS NOT NULL
            ),
            st AS (
                SELECT g, v,
                       v - lag(v) OVER (PARTITION BY g ORDER BY t)
                           AS d
                FROM base
            ),
            agg AS (
                SELECT g, CAST(count(*) AS BIGINT) AS n,
                       sum(v * v) AS ss, sum(d * d) AS sd
                FROM st GROUP BY 1
            )
            SELECT g, n,
                   CASE WHEN n >= 2 AND ss > 0
                        THEN CAST(sd AS DOUBLE) / CAST(ss AS DOUBLE)
                   END AS dw
            FROM agg
        """,
        "partial_corr": """
            -- nine exact decimal sums, one fixed IEEE tree
            WITH base AS (
                SELECT l_returnflag AS flag,
                       CAST(l_quantity AS DECIMAL(18,2)) AS x,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS y,
                       CAST(l_discount AS DECIMAL(18,2)) AS z
                FROM lineitem
                WHERE l_quantity IS NOT NULL
                  AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL
            ),
            agg AS (
                SELECT flag, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS DOUBLE) AS sx,
                       CAST(sum(y) AS DOUBLE) AS sy,
                       CAST(sum(z) AS DOUBLE) AS sz,
                       CAST(sum(x * x) AS DOUBLE) AS sxx,
                       CAST(sum(y * y) AS DOUBLE) AS syy,
                       CAST(sum(z * z) AS DOUBLE) AS szz,
                       CAST(sum(x * y) AS DOUBLE) AS sxy,
                       CAST(sum(x * z) AS DOUBLE) AS sxz,
                       CAST(sum(y * z) AS DOUBLE) AS syz
                FROM base GROUP BY 1
            ),
            r AS (
                SELECT flag, n,
                       CAST(n AS DOUBLE) AS nd, sx, sy, sz,
                       CAST(n AS DOUBLE) * sxx - sx * sx AS vx,
                       CAST(n AS DOUBLE) * syy - sy * sy AS vy,
                       CAST(n AS DOUBLE) * szz - sz * sz AS vz,
                       CAST(n AS DOUBLE) * sxy - sx * sy AS cxy,
                       CAST(n AS DOUBLE) * sxz - sx * sz AS cxz,
                       CAST(n AS DOUBLE) * syz - sy * sz AS cyz
                FROM agg
            ),
            rr AS (
                SELECT flag, n, vx, vy, vz,
                       cxy / sqrt(vx * vy) AS r_xy,
                       cxz / sqrt(vx * vz) AS r_xz,
                       cyz / sqrt(vy * vz) AS r_yz
                FROM r
            )
            SELECT flag, n,
                   CASE WHEN n >= 2 AND vx > 0 AND vy > 0 AND vz > 0
                        THEN r_xy END AS r_xy,
                   CASE WHEN n >= 2 AND vx > 0 AND vy > 0 AND vz > 0
                        THEN r_xz END AS r_xz,
                   CASE WHEN n >= 2 AND vx > 0 AND vy > 0 AND vz > 0
                        THEN r_yz END AS r_yz,
                   CASE WHEN n >= 2 AND vx > 0 AND vy > 0 AND vz > 0
                             AND sqrt((1.0 - r_xz * r_xz)
                                      * (1.0 - r_yz * r_yz)) > 0
                        THEN (r_xy - r_xz * r_yz)
                             / sqrt((1.0 - r_xz * r_xz)
                                    * (1.0 - r_yz * r_yz))
                   END AS r_xy_given_z
            FROM rr
        """,
        "rolling_slope": """
            -- five exact decimal frame sums, one IEEE tree per row
            WITH base AS (
                SELECT event_type AS g, event_id AS t,
                       CAST(floor(value) AS BIGINT) AS y
                FROM events
                WHERE value IS NOT NULL AND event_id IS NOT NULL
            ),
            st AS (
                SELECT g, t, y,
                       CAST(count(*) OVER w AS BIGINT) AS n_win,
                       sum(CAST(t AS DECIMAL(18,2))) OVER w AS sx,
                       sum(CAST(y AS DECIMAL(18,2))) OVER w AS sy,
                       sum(CAST(t AS DECIMAL(18,2))
                           * CAST(t AS DECIMAL(18,2))) OVER w AS sxx,
                       sum(CAST(t AS DECIMAL(18,2))
                           * CAST(y AS DECIMAL(18,2))) OVER w AS sxy
                FROM base
                WINDOW w AS (PARTITION BY g ORDER BY t
                             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
            )
            SELECT g, t, y, n_win,
                   CASE WHEN n_win >= 2
                             AND CAST(n_win AS DOUBLE)
                                 * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE)
                                   * CAST(sx AS DOUBLE) <> 0.0
                        THEN (CAST(n_win AS DOUBLE)
                              * CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE)
                                * CAST(sy AS DOUBLE))
                             / (CAST(n_win AS DOUBLE)
                                * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE)
                                  * CAST(sx AS DOUBLE))
                   END AS slope
            FROM st
        """,
        "density_clusters": """
            -- dense-cell adjacency components: min-reachable-label
            -- recursive CTE over the same 3x3 relation
            WITH RECURSIVE pts AS (
                SELECT CAST((c_custkey * 37) % 18000 AS DOUBLE)
                       / 100.0 - 90.0 AS lat,
                       CAST((c_custkey * 73) % 36000 AS DOUBLE)
                       / 100.0 - 180.0 AS lon
                FROM customer WHERE c_custkey % 2 = 0
            ),
            cells AS (
                SELECT CAST(floor(lat / 10.0) AS BIGINT) AS cx,
                       CAST(floor(lon / 10.0) AS BIGINT) AS cy
                FROM pts
            ),
            dense AS (
                SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_points,
                       CAST(cx AS VARCHAR) || ':'
                       || CAST(cy AS VARCHAR) AS cell
                FROM cells GROUP BY 1, 2 HAVING count(*) >= 3
            ),
            lft AS (
                SELECT cell AS src, cx + dx.d AS jx, cy + dy.d AS jy
                FROM dense,
                     (VALUES (-1), (0), (1)) dx(d),
                     (VALUES (-1), (0), (1)) dy(d)
            ),
            edges AS (
                SELECT lft.src, r.cell AS dst
                FROM lft JOIN dense r
                  ON lft.jx = r.cx AND lft.jy = r.cy
            ),
            und AS (
                SELECT src AS a, dst AS b FROM edges
                UNION
                SELECT dst, src FROM edges
            ),
            reach AS (
                SELECT DISTINCT a AS node, a AS lbl FROM und
                UNION
                SELECT u.b, r.lbl FROM reach r JOIN und u
                  ON u.a = r.node
            ),
            comp AS (
                SELECT node, min(lbl) AS cluster FROM reach GROUP BY 1
            )
            SELECT dense.cell, comp.cluster, dense.n_points
            FROM dense JOIN comp ON dense.cell = comp.node
        """,
        "geo_pairs": """
            -- 3x3 grid-cell candidate join + unfiltered haversine
            WITH pts AS (
                SELECT c_custkey AS id,
                       CAST((c_custkey * 37) % 18000 AS DOUBLE)
                       / 100.0 - 90.0 AS lat,
                       CAST((c_custkey * 73) % 36000 AS DOUBLE)
                       / 100.0 - 180.0 AS lon
                FROM customer WHERE c_custkey % 5 = 0
            ),
            cells AS (
                -- longitude cells modulo the 72-cell ring (5-degree
                -- cells tile 360): antimeridian wrap, mirroring the op
                SELECT id, lat, lon,
                       CAST(floor(lat / 5.0) AS BIGINT) AS cx,
                       ((CAST(floor(lon / 5.0) AS BIGINT) % 72) + 72)
                           % 72 AS cy
                FROM pts
            ),
            lft AS (
                SELECT id AS a, lat AS lat_a, lon AS lon_a,
                       cx + dx.d AS jx,
                       (((cy + dy.d) % 72) + 72) % 72 AS jy
                FROM cells,
                     (VALUES (-1), (0), (1)) dx(d),
                     (VALUES (-1), (0), (1)) dy(d)
            ),
            pr AS (
                SELECT lft.a, r.id AS b, lft.lat_a, lft.lon_a,
                       r.lat AS lat_b, r.lon AS lon_b
                FROM lft JOIN cells r
                  ON lft.jx = r.cx AND lft.jy = r.cy
                WHERE lft.a < r.id
            )
            SELECT a, b,
                   CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                       sin(radians(lat_b - lat_a) / 2)
                       * sin(radians(lat_b - lat_a) / 2)
                       + cos(radians(lat_a)) * cos(radians(lat_b))
                         * sin(radians(lon_b - lon_a) / 2)
                         * sin(radians(lon_b - lon_a) / 2)
                   )) AS dist_km
            FROM pr
        """,
        "simpsons_flip": """
            -- per-segment vs pooled OLS sign audit: identical exact
            -- decimal fits on both levels
            WITH base AS (
                SELECT l_returnflag AS flag,
                       CAST(l_discount AS DECIMAL(18,2)) AS x,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS y
                FROM lineitem
                WHERE l_discount IS NOT NULL
                  AND l_extendedprice IS NOT NULL
            ),
            per AS (
                SELECT flag, CAST(count(*) AS BIGINT) AS n,
                       CASE WHEN CAST(count(*) AS DOUBLE)
                                 * CAST(sum(x*x) AS DOUBLE)
                                 - CAST(sum(x) AS DOUBLE)
                                   * CAST(sum(x) AS DOUBLE) <> 0
                            THEN (CAST(count(*) AS DOUBLE)
                                  * CAST(sum(x*y) AS DOUBLE)
                                  - CAST(sum(x) AS DOUBLE)
                                    * CAST(sum(y) AS DOUBLE))
                                 / (CAST(count(*) AS DOUBLE)
                                    * CAST(sum(x*x) AS DOUBLE)
                                    - CAST(sum(x) AS DOUBLE)
                                      * CAST(sum(x) AS DOUBLE))
                       END AS slope
                FROM base GROUP BY 1
            ),
            pooled AS (
                SELECT CASE WHEN CAST(count(*) AS DOUBLE)
                                 * CAST(sum(x*x) AS DOUBLE)
                                 - CAST(sum(x) AS DOUBLE)
                                   * CAST(sum(x) AS DOUBLE) <> 0
                            THEN (CAST(count(*) AS DOUBLE)
                                  * CAST(sum(x*y) AS DOUBLE)
                                  - CAST(sum(x) AS DOUBLE)
                                    * CAST(sum(y) AS DOUBLE))
                                 / (CAST(count(*) AS DOUBLE)
                                    * CAST(sum(x*x) AS DOUBLE)
                                    - CAST(sum(x) AS DOUBLE)
                                      * CAST(sum(x) AS DOUBLE))
                       END AS pooled_slope
                FROM base
            )
            SELECT flag, n, slope, pooled_slope,
                   CASE WHEN slope IS NOT NULL
                             AND pooled_slope IS NOT NULL
                        THEN (slope > 0) <> (pooled_slope > 0)
                   END AS sign_flip
            FROM per CROSS JOIN pooled
        """,
        "covariate_balance": """
            -- unpooled-variance SMD from exact decimal sufficient
            -- statistics, fixed IEEE tree
            WITH flt AS (
                SELECT l_returnflag AS flag,
                       CAST(l_orderkey % 2 AS INT) AS t,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS yd
                FROM lineitem
                WHERE l_extendedprice IS NOT NULL
                  AND l_orderkey IS NOT NULL
            ),
            agg AS (
                SELECT flag,
                       CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_t,
                       sum(CASE WHEN t = 1 THEN yd END) AS s_t,
                       sum(CASE WHEN t = 1 THEN yd * yd END) AS sxx_t,
                       CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_c,
                       sum(CASE WHEN t = 0 THEN yd END) AS s_c,
                       sum(CASE WHEN t = 0 THEN yd * yd END) AS sxx_c
                FROM flt GROUP BY 1
            ),
            fin AS (
                SELECT flag, n_t, n_c,
                       CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                           AS mt,
                       CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                           AS mc,
                       (CAST(n_t AS DOUBLE) * CAST(sxx_t AS DOUBLE)
                        - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE))
                       / (CAST(n_t AS DOUBLE)
                          * (CAST(n_t AS DOUBLE) - 1.0)) AS vt,
                       (CAST(n_c AS DOUBLE) * CAST(sxx_c AS DOUBLE)
                        - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE))
                       / (CAST(n_c AS DOUBLE)
                          * (CAST(n_c AS DOUBLE) - 1.0)) AS vc
                FROM agg
            )
            SELECT flag, n_t, n_c,
                   CASE WHEN n_t > 0 THEN mt END AS mean_t,
                   CASE WHEN n_c > 0 THEN mc END AS mean_c,
                   CASE WHEN n_t > 1 AND n_c > 1 AND vt + vc > 0.0
                        THEN (mt - mc) / sqrt((vt + vc) / 2.0)
                   END AS smd
            FROM fin
        """,
        "bh_fdr": """
            -- BH step-up: deterministic (p, test) ranks, exact
            -- decimal k*q thresholds, one division each
            WITH src AS (
                SELECT p_partkey AS test,
                       CAST((p_partkey * 7919) % 9973 AS DOUBLE)
                       / 9973.0 AS p
                FROM part
            ),
            ranked AS (
                SELECT test, p,
                       CAST(row_number() OVER (ORDER BY p, test)
                            AS BIGINT) AS rank,
                       CAST(count(*) OVER () AS BIGINT) AS m
                FROM src
            ),
            staged AS (
                SELECT *,
                       CAST(CAST(rank AS DECIMAL(20,0))
                            * CAST('0.05' AS DECIMAL(9,6)) AS DOUBLE)
                       / CAST(m AS DOUBLE) AS threshold
                FROM ranked
            ),
            k AS (
                SELECT coalesce(max(CASE WHEN p <= threshold
                                    THEN rank END), 0) AS kk
                FROM staged
            )
            SELECT test, p, rank, m, threshold,
                   rank <= kk AS discovery
            FROM staged CROSS JOIN k
        """,
        "vocab_coverage": """
            -- frequency-of-frequencies: exact integer Chao1 and
            -- Good-Turing coverage, one division each
            WITH toks AS (
                SELECT unnest(string_split_regex(lower(trim(text)),
                              '\\s+')) AS term
                FROM documents
            ),
            tf AS (
                SELECT term, CAST(count(*) AS BIGINT) AS c
                FROM toks WHERE term <> '' GROUP BY 1
            ),
            fof AS (
                SELECT c, CAST(count(*) AS BIGINT) AS f
                FROM tf GROUP BY 1
            ),
            agg AS (
                SELECT CAST(coalesce(sum(CAST(c AS HUGEINT) * f), 0)
                            AS BIGINT) AS n_tokens,
                       CAST(coalesce(sum(f), 0) AS BIGINT) AS n_types,
                       CAST(coalesce(sum(CASE WHEN c = 1 THEN f END),
                                     0) AS BIGINT) AS f1,
                       CAST(coalesce(sum(CASE WHEN c = 2 THEN f END),
                                     0) AS BIGINT) AS f2
                FROM fof
            )
            SELECT n_tokens, n_types, f1, f2,
                   CAST(n_types AS DOUBLE)
                   + CAST(CAST(f1 AS HUGEINT) * (f1 - 1) AS DOUBLE)
                     / CAST(2 * (CAST(f2 AS HUGEINT) + 1) AS DOUBLE)
                       AS chao1,
                   CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                       AS unseen_mass,
                   1.0 - CAST(f1 AS DOUBLE)
                         / CAST(n_tokens AS DOUBLE) AS coverage
            FROM agg WHERE n_tokens > 0
        """,
        "mde": """
            -- two-arm proportion MDE with the embedded z-sum literal
            WITH agg AS (
                SELECT o_orderpriority AS prio,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1
                                ELSE 0 END) AS BIGINT) AS k
                FROM orders GROUP BY 1
            )
            SELECT prio, n, k,
                   CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                   CASE WHEN k > 0 AND k < n
                        THEN CAST(2.8015852181129683 AS DOUBLE)
                             * sqrt(2.0 * (CAST(k AS DOUBLE)
                                           / CAST(n AS DOUBLE))
                                    * (1.0 - CAST(k AS DOUBLE)
                                             / CAST(n AS DOUBLE))
                                    / CAST(n AS DOUBLE))
                   END AS mde_abs,
                   CASE WHEN k > 0 AND k < n
                        THEN (CAST(2.8015852181129683 AS DOUBLE)
                              * sqrt(2.0 * (CAST(k AS DOUBLE)
                                            / CAST(n AS DOUBLE))
                                     * (1.0 - CAST(k AS DOUBLE)
                                              / CAST(n AS DOUBLE))
                                     / CAST(n AS DOUBLE)))
                             / (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                   END AS mde_rel
            FROM agg
        """,
        "grouping_sets": """
            SELECT l_returnflag, l_linestatus,
                   GROUPING(l_returnflag, l_linestatus) AS gid,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS revenue
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
        """,
        "forecast_acc": """
            -- persistence forecast scored with exact decimal sums;
            -- MASE vs the season-7 naive over the SAME filtered rows
            WITH base AS (
                SELECT event_type AS g, event_id AS t,
                       CAST(floor(value) AS BIGINT) AS y
                FROM events
                WHERE value IS NOT NULL AND event_id IS NOT NULL
            ),
            wp AS (
                SELECT g, t, y,
                       lag(y) OVER (PARTITION BY g ORDER BY t) AS p
                FROM base
            ),
            flt AS (SELECT * FROM wp WHERE p IS NOT NULL),
            st AS (
                SELECT g,
                       CAST(y AS DECIMAL(18,2)) AS yd,
                       CAST(y AS DECIMAL(18,2))
                       - CAST(p AS DECIMAL(18,2)) AS e,
                       CAST(y AS DECIMAL(18,2))
                       - lag(CAST(y AS DECIMAL(18,2)), 7)
                         OVER (PARTITION BY g ORDER BY t) AS nv
                FROM flt
            ),
            agg AS (
                SELECT g, CAST(count(*) AS BIGINT) AS n,
                       sum(abs(e)) AS sae, sum(e * e) AS sse,
                       sum(abs(yd)) AS say, sum(abs(nv)) AS snv,
                       CAST(sum(CASE WHEN nv IS NOT NULL THEN 1
                                ELSE 0 END) AS BIGINT) AS nn
                FROM st GROUP BY 1
            )
            SELECT g, n,
                   CAST(sae AS DOUBLE) / CAST(n AS DOUBLE) AS mae,
                   sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE))
                       AS rmse,
                   CASE WHEN say > 0
                        THEN CAST(sae AS DOUBLE)
                             / CAST(say AS DOUBLE) END AS wape,
                   CASE WHEN snv > 0 AND nn > 0
                        THEN (CAST(sae AS DOUBLE) / CAST(n AS DOUBLE))
                             / (CAST(snv AS DOUBLE)
                                / CAST(nn AS DOUBLE)) END AS mase
            FROM agg
        """,
        "gains": """
            -- exact integer ntile buckets over (score DESC, id) with
            -- one division per rate
            WITH flt AS (
                SELECT o_orderkey AS id, o_totalprice AS score,
                       CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END
                           AS y
                FROM orders
                WHERE o_totalprice IS NOT NULL
                  AND o_orderkey IS NOT NULL
            ),
            ranked AS (
                SELECT y,
                       row_number() OVER (ORDER BY score DESC, id)
                           AS rn,
                       CAST(count(*) OVER () AS BIGINT) AS n
                FROM flt
            ),
            per AS (
                SELECT (rn * 10 + n - 1) // n AS bucket,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(y) AS BIGINT) AS pos
                FROM ranked GROUP BY 1
            ),
            staged AS (
                SELECT bucket, n, pos,
                       CAST(sum(pos) OVER (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum_pos,
                       CAST(sum(n) OVER (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum_n,
                       CAST(sum(pos) OVER () AS BIGINT) AS p,
                       CAST(sum(n) OVER () AS BIGINT) AS nt
                FROM per
            )
            SELECT bucket, n, pos, cum_pos,
                   CASE WHEN p > 0
                        THEN CAST(cum_pos AS DOUBLE)
                             / CAST(p AS DOUBLE) END AS capture,
                   CASE WHEN p > 0
                        THEN (CAST(pos AS DOUBLE) * CAST(nt AS DOUBLE))
                             / (CAST(n AS DOUBLE) * CAST(p AS DOUBLE))
                   END AS lift,
                   CASE WHEN p > 0
                        THEN (CAST(cum_pos AS DOUBLE)
                              * CAST(nt AS DOUBLE))
                             / (CAST(cum_n AS DOUBLE)
                                * CAST(p AS DOUBLE)) END AS cum_lift
            FROM staged
        """,
        "trimmed_mean": """
            -- exact decimal g = floor(a*n); rank-slice sums; one
            -- division per mean
            WITH flt AS (
                SELECT l_returnflag AS flag,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS v
                FROM lineitem WHERE l_extendedprice IS NOT NULL
            ),
            st AS (
                SELECT flag, v,
                       row_number() OVER (PARTITION BY flag
                           ORDER BY v) AS rn,
                       CAST(count(*) OVER (PARTITION BY flag)
                            AS BIGINT) AS n
                FROM flt
            ),
            st2 AS (
                SELECT *,
                       CAST(floor(CAST('0.05' AS DECIMAL(9,6))
                                  * CAST(n AS DECIMAL(20,0)))
                            AS BIGINT) AS g
                FROM st
            ),
            agg AS (
                SELECT flag, max(n) AS n, max(g) AS gg,
                       sum(CASE WHEN rn > g AND rn <= n - g
                           THEN v END) AS skept,
                       CAST(sum(CASE WHEN rn > g AND rn <= n - g
                                THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_used,
                       max(CASE WHEN rn = g + 1 THEN v END) AS vlo,
                       max(CASE WHEN rn = n - g THEN v END) AS vhi
                FROM st2 GROUP BY 1
            )
            SELECT flag, n, n_used,
                   CASE WHEN n_used > 0
                        THEN CAST(skept AS DOUBLE)
                             / CAST(n_used AS DOUBLE)
                   END AS trimmed_mean,
                   CASE WHEN n_used > 0
                        THEN CAST(skept + gg * vlo + gg * vhi
                                  AS DOUBLE) / CAST(n AS DOUBLE)
                   END AS winsorized_mean
            FROM agg
        """,
        "ratio_metric": """
            -- delta-method ratio SE over order-level units: exact
            -- decimal sufficient stats, fixed IEEE tree
            WITH units AS (
                SELECT l_returnflag AS flag, l_orderkey,
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                            AS DECIMAL(18,2)) AS x,
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                            AS DECIMAL(18,2)) AS y
                FROM lineitem
                WHERE l_extendedprice IS NOT NULL
                  AND l_quantity IS NOT NULL
                GROUP BY 1, 2
            ),
            agg AS (
                SELECT flag, CAST(count(*) AS BIGINT) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(y * y) AS syy,
                       sum(x * y) AS sxy
                FROM units GROUP BY 1
            ),
            fin AS (
                SELECT flag, n,
                       CAST(sx AS DOUBLE) AS sxd,
                       CAST(sy AS DOUBLE) AS syd,
                       CAST(sxx AS DOUBLE) AS sxxd,
                       CAST(syy AS DOUBLE) AS syyd,
                       CAST(sxy AS DOUBLE) AS sxyd,
                       CAST(n AS DOUBLE) AS nd
                FROM agg
            )
            SELECT flag, n,
                   CASE WHEN n > 1 AND syd <> 0
                        THEN sxd / syd END AS ratio,
                   CASE WHEN n > 1 AND syd <> 0
                             AND ((nd * sxxd - sxd * sxd)
                                  / (nd * (nd - 1.0))
                                  + (sxd / syd) * (sxd / syd)
                                    * ((nd * syyd - syd * syd)
                                       / (nd * (nd - 1.0)))
                                  - 2.0 * (sxd / syd)
                                    * ((nd * sxyd - sxd * syd)
                                       / (nd * (nd - 1.0))))
                                 / (nd * (syd / nd) * (syd / nd)) >= 0
                        THEN sqrt(((nd * sxxd - sxd * sxd)
                                   / (nd * (nd - 1.0))
                                   + (sxd / syd) * (sxd / syd)
                                     * ((nd * syyd - syd * syd)
                                        / (nd * (nd - 1.0)))
                                   - 2.0 * (sxd / syd)
                                     * ((nd * sxyd - sxd * syd)
                                        / (nd * (nd - 1.0))))
                                  / (nd * (syd / nd) * (syd / nd)))
                   END AS se
            FROM fin
        """,
        "conformal": """
            -- split-conformal: exact decimal ceil((n+1)(1-a)), k-th
            -- order statistic per group, NULL when vacuous (k > n)
            WITH flt AS (
                SELECT event_type AS etype, value AS s
                FROM events WHERE value IS NOT NULL
            ),
            sizes AS (
                SELECT etype, CAST(count(*) AS BIGINT) AS n,
                       CAST(ceil(CAST(count(*) + 1 AS DECIMAL(20,0))
                                 * (CAST(1 AS DECIMAL(9,6))
                                    - CAST('0.1' AS DECIMAL(9,6))))
                            AS BIGINT) AS k
                FROM flt GROUP BY 1
            ),
            ranked AS (
                SELECT etype, s,
                       row_number() OVER (PARTITION BY etype
                           ORDER BY s) AS rn
                FROM flt
            ),
            hit AS (
                SELECT r.etype, max(r.s) AS qhat
                FROM ranked r JOIN sizes USING (etype)
                WHERE r.rn = sizes.k GROUP BY 1
            )
            SELECT sizes.etype, sizes.n, sizes.k, hit.qhat
            FROM sizes LEFT JOIN hit USING (etype)
        """,
        "ece": """
            -- ECE = sum|sy-sp|/n over exact decimal bin sums; MCE =
            -- max per-bin one-division gap
            WITH base AS (
                SELECT CAST(CAST(o_orderkey % 100 AS DECIMAL(9,2))
                            * CAST('0.01' AS DECIMAL(9,2))
                            AS DECIMAL(12,4)) AS p,
                       CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y
                FROM orders
            ),
            agg AS (
                SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin,
                       CAST(count(*) AS BIGINT) AS nb,
                       sum(p) AS sp,
                       sum(CAST(y AS DECIMAL(12,4))) AS sy
                FROM base GROUP BY 1
            )
            SELECT CAST(sum(nb) AS BIGINT) AS n,
                   CAST(sum(abs(sy - sp)) AS DOUBLE)
                   / CAST(sum(nb) AS DOUBLE) AS ece,
                   max(CAST(abs(sy - sp) AS DOUBLE)
                       / CAST(nb AS DOUBLE)) AS mce
            FROM agg
        """,
        "isotonic": """
            -- PAV via the minimax identity over 10 occupied bins:
            -- exact prefix integers, one division per interval mean,
            -- min/max of identical doubles
            WITH base AS (
                SELECT CAST(CAST(o_orderkey % 100 AS DECIMAL(9,2))
                            * CAST('0.01' AS DECIMAL(9,2))
                            AS DECIMAL(12,4)) AS p,
                       CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y
                FROM orders
            ),
            agg AS (
                SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin,
                       CAST(count(*) AS BIGINT) AS n,
                       sum(p) AS sp,
                       CAST(sum(y) AS BIGINT) AS sy
                FROM base GROUP BY 1
            ),
            pre AS (
                SELECT bin, n, sp, sy,
                       CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cw,
                       CAST(sum(sy) OVER (ORDER BY bin) AS BIGINT) AS cs
                FROM agg
            ),
            pairs AS (
                SELECT l.bin AS j, h.bin AS k,
                       CAST(h.cs - (l.cs - l.sy) AS DOUBLE)
                       / CAST(h.cw - (l.cw - l.n) AS DOUBLE) AS m
                FROM pre l, pre h WHERE l.bin <= h.bin
            ),
            inner_ AS (
                SELECT i.bin AS bin, p2.j, min(p2.m) AS im
                FROM pre i JOIN pairs p2
                  ON p2.j <= i.bin AND p2.k >= i.bin
                GROUP BY 1, 2
            ),
            iso AS (SELECT bin, max(im) AS iso FROM inner_ GROUP BY 1)
            SELECT pre.bin, pre.n,
                   CAST(pre.sp AS DOUBLE) / CAST(pre.n AS DOUBLE)
                       AS mean_pred,
                   CAST(pre.sy AS DOUBLE) / CAST(pre.n AS DOUBLE)
                       AS frac_pos,
                   iso.iso
            FROM pre JOIN iso USING (bin)
        """,
        "calibration": """
            WITH base AS (
                SELECT CAST(CAST(o_orderkey % 100 AS DECIMAL(9,2))
                            * CAST('0.01' AS DECIMAL(9,2))
                            AS DECIMAL(12,4)) AS p,
                       CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y
                FROM orders
            )
            SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(p) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS mean_pred,
                   CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS frac_pos
            FROM base GROUP BY 1
        """,
        "adamic_adar": """
            -- degree-weighted overlap: AA/RA as 0.0-prepended folds
            -- over the z-sorted common-neighbor list
            WITH raw AS (
                SELECT 'o:' || CAST(l_orderkey AS VARCHAR) AS s,
                       'p:' || CAST(l_partkey AS VARCHAR) AS d
                FROM lineitem WHERE l_orderkey % 50 = 0
            ),
            e AS (
                SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
                FROM raw WHERE s <> d
            ),
            deg AS (
                SELECT node, count(*) AS deg
                FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                GROUP BY 1
            ),
            sym AS (
                SELECT u AS center, v AS nbr FROM e
                UNION ALL
                SELECT v AS center, u AS nbr FROM e
            ),
            symd AS (
                SELECT sym.center, sym.nbr, deg.deg AS deg_c
                FROM sym JOIN deg ON sym.center = deg.node
            ),
            wedges AS (
                SELECT x.nbr AS a, y.nbr AS b, x.center AS z,
                       CAST(x.deg_c AS BIGINT) AS deg_z
                FROM symd x JOIN symd y ON x.center = y.center
                WHERE x.nbr < y.nbr
            ),
            packed AS (
                SELECT a, b,
                       list_sort(list(struct_pack(z := z, deg_z := deg_z)))
                           AS zs
                FROM wedges GROUP BY 1, 2
            ),
            pairs AS (
                SELECT packed.a, packed.b, packed.zs FROM packed
                LEFT JOIN e ON packed.a = e.u AND packed.b = e.v
                WHERE e.u IS NULL
            )
            SELECT a, b, CAST(len(zs) AS INTEGER) AS common,
                   list_reduce(list_prepend(0.0,
                       [1.0 / ln(CAST(s.deg_z AS DOUBLE)) FOR s IN zs]),
                       (acc, v) -> acc + v) AS aa,
                   list_reduce(list_prepend(0.0,
                       [1.0 / CAST(s.deg_z AS DOUBLE) FOR s IN zs]),
                       (acc, v) -> acc + v) AS ra
            FROM pairs
        """,
        "rich_club": """
            -- φ(k) = 2·E_k/(N_k(N_k−1)) over the distinct-degree grid;
            -- E_k via per-edge min endpoint degree, exact suffix counts
            WITH edges AS (
                SELECT 'o:' || CAST(o_orderkey AS VARCHAR) AS src,
                       'c:' || CAST(o_custkey AS VARCHAR) AS dst
                FROM orders
            ),
            deg AS (
                SELECT node, count(*) AS deg
                FROM (SELECT src AS node FROM edges
                      UNION ALL SELECT dst FROM edges)
                GROUP BY 1
            ),
            grid AS (SELECT DISTINCT deg AS k FROM deg),
            em AS (
                SELECT least(du.deg, dv.deg) AS m, count(*) AS em
                FROM edges
                JOIN deg du ON edges.src = du.node
                JOIN deg dv ON edges.dst = dv.node
                WHERE edges.src <> edges.dst
                GROUP BY 1
            ),
            nk AS (SELECT deg, count(*) AS nd FROM deg GROUP BY 1),
            n_k AS (
                SELECT grid.k, CAST(sum(nk.nd) AS BIGINT) AS n_k
                FROM grid JOIN nk ON grid.k < nk.deg GROUP BY 1
            ),
            e_k AS (
                SELECT grid.k, CAST(sum(em.em) AS BIGINT) AS e_k
                FROM grid JOIN em ON grid.k < em.m GROUP BY 1
            )
            SELECT grid.k,
                   coalesce(n_k.n_k, 0) AS n_k,
                   coalesce(e_k.e_k, 0) AS e_k,
                   CASE WHEN coalesce(n_k.n_k, 0) > 1 THEN
                       CAST(2 * coalesce(e_k.e_k, 0) AS DOUBLE)
                       / CAST(n_k.n_k * (n_k.n_k - 1) AS DOUBLE)
                   END AS phi
            FROM grid
            LEFT JOIN n_k ON grid.k = n_k.k
            LEFT JOIN e_k ON grid.k = e_k.k
        """,
        "k_anonymity": """
            SELECT c_nationkey AS nation, c_mktsegment AS segment,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l,
                   count(*) >= 10 AS ok_k,
                   count(DISTINCT c_acctbal) >= 5 AS ok_l
            FROM customer GROUP BY 1, 2
        """,
        "weighted_quantiles": """
            -- lower weighted quantile: smallest v with cumW >= q·W,
            -- all-decimal threshold comparison
            WITH base AS (
                SELECT o_orderpriority AS priority, o_totalprice AS v,
                       CAST(o_orderkey % 5 + 1 AS DECIMAL(18,2)) AS w
                FROM orders WHERE o_totalprice IS NOT NULL
            ),
            st AS (
                SELECT priority, v,
                       sum(w) OVER (PARTITION BY priority ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cw,
                       CAST(sum(w) OVER (PARTITION BY priority)
                            AS DECIMAL(19,2)) AS tw
                FROM base
            ),
            agg AS (
                SELECT priority,
                       min(CASE WHEN cw >= CAST('0.25' AS DECIMAL(9,6))
                                         * tw THEN v END) AS q25,
                       min(CASE WHEN cw >= CAST('0.5' AS DECIMAL(9,6))
                                         * tw THEN v END) AS q50,
                       min(CASE WHEN cw >= CAST('0.75' AS DECIMAL(9,6))
                                         * tw THEN v END) AS q75
                FROM st GROUP BY 1
            )
            SELECT priority, '0.25' AS q, q25 AS value FROM agg
            UNION ALL
            SELECT priority, '0.5', q50 FROM agg
            UNION ALL
            SELECT priority, '0.75', q75 FROM agg
        """,
        "kruskal": """
            -- doubled average ranks (exact ints), per-group R²/4n and
            -- tie terms folded over bounded sorted lists, fixed H tree
            WITH base AS (
                SELECT event_type AS g, CAST(floor(value) AS BIGINT) AS v
                FROM events
                WHERE value IS NOT NULL AND event_type IS NOT NULL
            ),
            pts AS (SELECT v, g, count(*) AS c FROM base GROUP BY 1, 2),
            vals AS (
                SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM pts GROUP BY 1
            ),
            vals2 AS (
                SELECT v, cv,
                       CAST(coalesce(sum(cv) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS bef
                FROM vals
            ),
            pg AS (
                SELECT g, CAST(sum(c) AS BIGINT) AS n_g,
                       CAST(sum(CAST(c AS DECIMAL(19,0))
                                * CAST(2 * bef + cv + 1 AS DECIMAL(19,0)))
                            AS DECIMAL(19,0)) AS r2
                FROM pts JOIN vals2 USING (v) GROUP BY 1
            ),
            gs AS (
                SELECT CAST(sum(n_g) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS n_groups,
                       list_reduce(list_prepend(0.0,
                           [CAST(s.r2 * s.r2 AS DOUBLE)
                            / CAST(4 * s.n_g AS DOUBLE)
                            FOR s IN list_sort(list(struct_pack(
                                g := g, n_g := n_g, r2 := r2)))]),
                           (a, x) -> a + x) AS sr
                FROM pg
            ),
            ts AS (
                SELECT list_reduce(list_prepend(0.0,
                           [CAST(s.cv * s.cv * s.cv - s.cv AS DOUBLE)
                            FOR s IN list_sort(list(struct_pack(
                                v := v, cv := cv)))]),
                           (a, x) -> a + x) AS tt
                FROM vals
            )
            SELECT n, n_groups,
                   CASE WHEN n_groups > 1 AND n > 1
                            AND 1.0 - tt / (CAST(n AS DOUBLE)
                                * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                - CAST(n AS DOUBLE)) > 0.0
                        THEN (12.0 * sr) / (CAST(n AS DOUBLE)
                                 * (CAST(n AS DOUBLE) + 1.0))
                             - 3.0 * (CAST(n AS DOUBLE) + 1.0)
                   END AS h,
                   CASE WHEN n_groups > 1 AND n > 1
                            AND 1.0 - tt / (CAST(n AS DOUBLE)
                                * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                - CAST(n AS DOUBLE)) > 0.0
                        THEN ((12.0 * sr) / (CAST(n AS DOUBLE)
                                  * (CAST(n AS DOUBLE) + 1.0))
                              - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                             / (1.0 - tt / (CAST(n AS DOUBLE)
                                 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                 - CAST(n AS DOUBLE)))
                   END AS h_tie_corrected
            FROM gs CROSS JOIN ts
        """,
        "wilcoxon": """
            -- paired d = discount - tax (exact cents), zeros dropped,
            -- doubled average ranks of |d|, exact tie correction,
            -- one fixed IEEE z tree (subtract in BIGINT, then divide)
            WITH base AS (
                SELECT l_returnflag AS flag,
                       CAST(l_discount AS DECIMAL(18,2))
                       - CAST(l_tax AS DECIMAL(18,2)) AS d
                FROM lineitem
                WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
            ),
            nz AS (
                SELECT flag, abs(d) AS a,
                       CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
                FROM base WHERE d <> 0
            ),
            pts AS (
                SELECT flag, a, CAST(count(*) AS BIGINT) AS cv,
                       CAST(sum(pos) AS BIGINT) AS cpos
                FROM nz GROUP BY 1, 2
            ),
            rk AS (
                SELECT flag, a, cv, cpos,
                       CAST(coalesce(sum(cv) OVER (PARTITION BY flag
                           ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS bef
                FROM pts
            ),
            st AS (
                SELECT flag,
                       CAST(sum(cv) AS BIGINT) AS n,
                       CAST(sum(cpos * (2 * bef + cv + 1)) AS BIGINT)
                           AS w2,
                       CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tt
                FROM rk GROUP BY 1
            )
            SELECT flag, n,
                   CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
                   CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - tt > 0
                        THEN CAST(w2 - n * (n + 1) / 2 AS DOUBLE)
                             / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1)
                                         - tt AS DOUBLE) / 12.0)
                   END AS z
            FROM st
        """,
        "friedman": """
            -- complete-block Friedman: duplicate cells collapse with
            -- max, k = distinct treatments per group, blocks with
            -- fewer than k cells drop, doubled within-block average
            -- ranks (2*cum - eq + 1), tie-corrected Q as one division
            WITH cell AS (
                SELECT CAST(l_orderkey % 3 AS BIGINT) AS grp,
                       l_orderkey AS b, l_linenumber AS t,
                       max(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_linenumber IS NOT NULL
                  AND l_extendedprice IS NOT NULL
                GROUP BY 1, 2, 3
            ),
            kdf AS (
                SELECT grp, CAST(count(DISTINCT t) AS BIGINT) AS k
                FROM cell GROUP BY 1
            ),
            bs AS (
                SELECT grp, b, CAST(count(*) AS BIGINT) AS bc
                FROM cell GROUP BY 1, 2
            ),
            keep AS (
                SELECT c.grp, c.b, c.t, c.v, kdf.k
                FROM cell c
                JOIN bs USING (grp, b) JOIN kdf USING (grp)
                WHERE bs.bc = kdf.k AND kdf.k >= 2
            ),
            ndf AS (
                SELECT grp, CAST(count(DISTINCT b) AS BIGINT) AS n
                FROM keep GROUP BY 1
            ),
            ranked AS (
                SELECT grp, b, t, k,
                       CAST(2 * count(*) OVER (PARTITION BY grp, b
                                ORDER BY v RANGE BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW)
                            - count(*) OVER (PARTITION BY grp, b, v)
                            + 1 AS BIGINT) AS r2
                FROM keep
            ),
            tr AS (
                SELECT grp, k, t,
                       CAST(sum(r2) AS BIGINT) AS rj2,
                       CAST(sum(r2 * r2) AS BIGINT) AS sq
                FROM ranked GROUP BY 1, 2, 3
            ),
            st AS (
                SELECT tr.grp, tr.k, ndf.n AS n_blocks,
                       CAST(sum(tr.sq) AS BIGINT) AS sumsq,
                       CAST(sum((tr.rj2 - ndf.n * (tr.k + 1))
                                * (tr.rj2 - ndf.n * (tr.k + 1)))
                            AS BIGINT) AS dev2
                FROM tr JOIN ndf USING (grp)
                GROUP BY 1, 2, 3
            )
            SELECT grp, k, n_blocks,
                   CASE WHEN sumsq - n_blocks * k * (k+1) * (k+1) > 0
                        THEN CAST((k - 1) * dev2 AS DOUBLE)
                             / CAST(sumsq - n_blocks * k * (k+1)
                                    * (k+1) AS DOUBLE)
                   END AS q
            FROM st
        """,
        "rbo": """
            -- RBO: identical embedded depth weights, ordered fold
            WITH av AS (
                SELECT o_custkey AS q, o_orderkey AS i,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey)
                           AS ra
                FROM orders WHERE o_custkey % 10 = 0
            ),
            bv AS (
                SELECT o_custkey AS q, o_orderkey AS i,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderkey) AS rb
                FROM orders WHERE o_custkey % 10 = 0
            ),
            a10 AS (SELECT * FROM av WHERE ra <= 10),
            b10 AS (SELECT * FROM bv WHERE rb <= 10),
            common AS (
                SELECT a10.q, greatest(a10.ra, b10.rb) AS d0
                FROM a10 JOIN b10
                  ON a10.q = b10.q AND a10.i = b10.i
            ),
            qs AS (
                SELECT q FROM a10 UNION SELECT q FROM b10
            ),
            ncommon AS (
                SELECT qs.q,
                       CAST(count(common.d0) AS BIGINT) AS n_common
                FROM qs LEFT JOIN common USING (q) GROUP BY 1
            ),
            depths(d, w) AS (VALUES (1, CAST(0.09999999999999998 AS DOUBLE)), (2, CAST(0.08999999999999998 AS DOUBLE)), (3, CAST(0.08099999999999999 AS DOUBLE)), (4, CAST(0.07289999999999999 AS DOUBLE)), (5, CAST(0.06560999999999999 AS DOUBLE)), (6, CAST(0.059049 AS DOUBLE)), (7, CAST(0.05314409999999999 AS DOUBLE)), (8, CAST(0.047829689999999994 AS DOUBLE)), (9, CAST(0.043046721 AS DOUBLE)), (10, CAST(0.0387420489 AS DOUBLE))),
            xd AS (
                SELECT qs.q, dep.d, dep.w,
                       CAST(count(c.d0) AS BIGINT) AS x
                FROM qs CROSS JOIN depths dep
                LEFT JOIN common c
                  ON c.q = qs.q AND c.d0 <= dep.d
                GROUP BY 1, 2, 3
            ),
            terms AS (
                SELECT q, d, x,
                       w * (CAST(x AS DOUBLE) / CAST(d AS DOUBLE))
                           AS term
                FROM xd
            ),
            folded AS (
                SELECT q,
                       list_reduce(
                           list_prepend(0.0,
                               [s.term FOR s IN list_sort(list(
                                   struct_pack(d := d,
                                               term := term)))]),
                           (acc, v) -> acc + v) AS rbo,
                       max(CASE WHEN d = 10 THEN x END) AS xk
                FROM terms GROUP BY q
            )
            SELECT f.q AS query_id, n.n_common, f.rbo,
                   f.rbo + CAST(0.3486784401000001 AS DOUBLE)
                           * (CAST(f.xk AS DOUBLE) / 10.0) AS rbo_ext
            FROM folded f JOIN ncommon n USING (q)
        """,
        "kendall_tau": """
            -- tau-b via 2-D prefixes over the bounded grid: exact
            -- integer pair counts, tie-normalized, one IEEE tree
            WITH base AS (
                SELECT l_returnflag AS flag,
                       CAST(floor(l_quantity) AS BIGINT) AS x,
                       CAST(floor(l_extendedprice / 5000) AS BIGINT)
                           AS y
                FROM lineitem
                WHERE l_quantity IS NOT NULL
                  AND l_extendedprice IS NOT NULL
            ),
            pts AS (
                SELECT flag, x, y, CAST(count(*) AS BIGINT) AS c
                FROM base GROUP BY 1, 2, 3
            ),
            grid AS (
                SELECT dx.flag, dx.x, dy.y, coalesce(p.c, 0) AS c
                FROM (SELECT DISTINCT flag, x FROM pts) dx
                JOIN (SELECT DISTINCT flag, y FROM pts) dy
                  USING (flag)
                LEFT JOIN pts p
                  ON p.flag = dx.flag AND p.x = dx.x AND p.y = dy.y
            ),
            g1 AS (
                SELECT flag, x, y, c,
                       sum(c) OVER (PARTITION BY flag, x ORDER BY y
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS r
                FROM grid
            ),
            g2 AS (
                SELECT flag, x, y, c, r,
                       sum(r) OVER (PARTITION BY flag, y ORDER BY x
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS p,
                       sum(c) OVER (PARTITION BY flag, y ORDER BY x
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cy
                FROM g1
            ),
            rowtot AS (
                SELECT flag, x,
                       coalesce(sum(tx) OVER (PARTITION BY flag
                           ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS txb
                FROM (SELECT flag, x, max(r) AS tx FROM g1
                      GROUP BY 1, 2)
            ),
            sums AS (
                SELECT g2.flag,
                       CAST(sum(g2.c) AS BIGINT) AS n,
                       CAST(sum(g2.c * (g2.p - g2.r - g2.cy + g2.c))
                            AS BIGINT) AS conc,
                       CAST(sum(g2.c * (rowtot.txb - (g2.p - g2.r)))
                            AS BIGINT) AS disc
                FROM g2 JOIN rowtot USING (flag, x)
                GROUP BY 1
            ),
            n1 AS (
                SELECT flag,
                       CAST(sum(CAST(t AS HUGEINT) * (t - 1))
                            AS HUGEINT) // 2 AS n1
                FROM (SELECT flag, x, CAST(sum(c) AS BIGINT) AS t
                      FROM pts GROUP BY 1, 2)
                GROUP BY 1
            ),
            n2 AS (
                SELECT flag,
                       CAST(sum(CAST(t AS HUGEINT) * (t - 1))
                            AS HUGEINT) // 2 AS n2
                FROM (SELECT flag, y, CAST(sum(c) AS BIGINT) AS t
                      FROM pts GROUP BY 1, 2)
                GROUP BY 1
            ),
            dens AS (
                -- exact integer n0 - n1 / n0 - n2 (mirrors the op's
                -- DECIMAL arithmetic: subtract exactly, cast ONCE)
                SELECT s.flag, s.n, s.conc, s.disc,
                       (CAST(s.n AS HUGEINT) * (s.n - 1)) // 2
                           - n1.n1 AS da,
                       (CAST(s.n AS HUGEINT) * (s.n - 1)) // 2
                           - n2.n2 AS db
                FROM sums s JOIN n1 USING (flag) JOIN n2 USING (flag)
            )
            SELECT flag, n,
                   CAST(conc AS DOUBLE) AS concordant,
                   CAST(disc AS DOUBLE) AS discordant,
                   CASE WHEN da > 0 AND db > 0
                        THEN CAST(conc - disc AS DOUBLE)
                             / sqrt(CAST(da AS DOUBLE)
                                    * CAST(db AS DOUBLE))
                   END AS tau_b
            FROM dens
        """,
        "t_closeness": """
            -- ordered EMD + TVD to the global sensitive distribution:
            -- cross-multiplied exact integer gaps, one division each
            WITH base AS (
                SELECT c_nationkey AS nation, c_mktsegment AS segment,
                       CAST(floor(c_acctbal / 1000) AS BIGINT) AS v
                FROM customer WHERE c_acctbal IS NOT NULL
            ),
            cells AS (
                SELECT nation, segment, v,
                       CAST(count(*) AS BIGINT) AS c
                FROM base GROUP BY 1, 2, 3
            ),
            gl AS (
                SELECT v, CAST(sum(c) AS BIGINT) AS g
                FROM cells GROUP BY 1
            ),
            gl2 AS (
                SELECT v, g,
                       CAST(sum(g) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cumg,
                       CAST(sum(g) OVER () AS BIGINT) AS ntot,
                       CAST(count(*) OVER () AS BIGINT) AS m
                FROM gl
            ),
            classes AS (
                SELECT nation, segment, CAST(sum(c) AS BIGINT) AS n
                FROM cells GROUP BY 1, 2
            ),
            grid AS (
                SELECT cl.nation, cl.segment, cl.n, gl2.m, gl2.v,
                       gl2.g, gl2.cumg, gl2.ntot,
                       coalesce(ce.c, 0) AS c
                FROM classes cl CROSS JOIN gl2
                LEFT JOIN cells ce
                  ON ce.nation = cl.nation
                 AND ce.segment = cl.segment AND ce.v = gl2.v
            ),
            g2 AS (
                SELECT nation, segment, n, m, ntot, g, cumg, c,
                       CAST(sum(c) OVER (PARTITION BY nation, segment
                           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cumc
                FROM grid
            ),
            agg AS (
                SELECT nation, segment, n, m, ntot,
                       CAST(sum(abs(CAST(cumc AS HUGEINT) * ntot
                                    - CAST(cumg AS HUGEINT) * n))
                            AS HUGEINT) AS semd,
                       CAST(sum(abs(CAST(c AS HUGEINT) * ntot
                                    - CAST(g AS HUGEINT) * n))
                            AS HUGEINT) AS stvd
                FROM g2 GROUP BY 1, 2, 3, 4, 5
            )
            SELECT nation, segment, n, m,
                   CASE WHEN m >= 2
                        THEN CAST(semd AS DOUBLE)
                             / CAST(CAST(n AS HUGEINT) * ntot * (m - 1)
                                    AS DOUBLE)
                   END AS emd_ordered,
                   CAST(stvd AS DOUBLE)
                   / CAST(2 * CAST(n AS HUGEINT) * ntot AS DOUBLE)
                       AS tvd
            FROM agg
        """,
        "jonckheere": """
            -- JT over the (group x distinct-value) grid: two window
            -- prefixes, exact HUGEINT polynomials, fixed IEEE z tree
            WITH base AS (
                SELECT o_orderpriority AS g,
                       CAST(floor(o_totalprice / 10000) AS BIGINT) AS v
                FROM orders
                WHERE o_orderpriority IS NOT NULL
                  AND o_totalprice IS NOT NULL
            ),
            pts AS (
                SELECT g, v, CAST(count(*) AS BIGINT) AS c
                FROM base GROUP BY 1, 2
            ),
            grid AS (
                SELECT dg.g, dv.v, coalesce(p.c, 0) AS c
                FROM (SELECT DISTINCT g FROM pts) dg
                CROSS JOIN (SELECT DISTINCT v FROM pts) dv
                LEFT JOIN pts p ON p.g = dg.g AND p.v = dv.v
            ),
            w1 AS (
                SELECT g, v, c,
                       coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS lt
                FROM grid
            ),
            w2 AS (
                SELECT g, v, c, lt,
                       coalesce(sum(lt) OVER (PARTITION BY v ORDER BY g
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS slt,
                       coalesce(sum(c) OVER (PARTITION BY v ORDER BY g
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS seq
                FROM w1
            ),
            jt2 AS (
                SELECT CAST(sum(CAST(c AS HUGEINT)
                           * (2 * CAST(slt AS HUGEINT)
                              + CAST(seq AS HUGEINT))) AS HUGEINT)
                       AS jt2
                FROM w2
            ),
            gi AS (SELECT g, CAST(sum(c) AS BIGINT) AS ni
                   FROM pts GROUP BY 1),
            gs AS (
                SELECT CAST(sum(ni) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS k,
                       CAST(sum(CAST(ni AS HUGEINT) * ni) AS HUGEINT)
                           AS sn2,
                       CAST(sum(CAST(ni AS HUGEINT) * (ni - 1)
                                * (2 * ni + 5)) AS HUGEINT) AS sag,
                       CAST(sum(CAST(ni AS HUGEINT) * (ni - 1)
                                * (ni - 2)) AS HUGEINT) AS sbg,
                       CAST(sum(CAST(ni AS HUGEINT) * (ni - 1))
                            AS HUGEINT) AS scg
                FROM gi
            ),
            tvt AS (SELECT v, CAST(sum(c) AS BIGINT) AS t
                    FROM pts GROUP BY 1),
            ts2 AS (
                SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1)
                                * (2 * t + 5)) AS HUGEINT) AS sat,
                       CAST(sum(CAST(t AS HUGEINT) * (t - 1)
                                * (t - 2)) AS HUGEINT) AS sbt,
                       CAST(sum(CAST(t AS HUGEINT) * (t - 1))
                            AS HUGEINT) AS sct
                FROM tvt
            ),
            fin AS (
                SELECT n, k,
                       CAST(jt2 AS DOUBLE) / 2.0 AS jt,
                       CAST(CAST(n AS HUGEINT) * n - sn2 AS DOUBLE)
                           / 4.0 AS mean,
                       CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)
                            - sag - sat AS DOUBLE) / 72.0
                       + CAST(sbg * sbt AS DOUBLE)
                         / (36.0 * CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) - 1)
                            * (CAST(n AS DOUBLE) - 2))
                       + CAST(scg * sct AS DOUBLE)
                         / (8.0 * CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) - 1)) AS var
                FROM jt2 CROSS JOIN gs CROSS JOIN ts2
            )
            SELECT n, k, jt,
                   CASE WHEN k >= 2 AND var > 0
                        THEN (jt - mean) / sqrt(var) END AS z
            FROM fin
        """,
        "mcnemar": """
            -- paired binary indicators; discordant counts b/c, plain
            -- and Edwards continuity-corrected chi2, one division
            WITH p AS (
                SELECT l_returnflag AS flag,
                       CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END
                           AS x,
                       CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END AS y
                FROM lineitem
                WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
            ),
            a AS (
                SELECT flag,
                       CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1
                                ELSE 0 END) AS BIGINT) AS b,
                       CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1
                                ELSE 0 END) AS BIGINT) AS c
                FROM p GROUP BY 1
            )
            SELECT flag, b, c,
                   CASE WHEN b + c > 0
                        THEN CAST((b-c)*(b-c) AS DOUBLE)
                             / CAST(b + c AS DOUBLE) END AS chi2,
                   CASE WHEN b + c > 0
                        THEN CAST((abs(b-c)-1)*(abs(b-c)-1) AS DOUBLE)
                             / CAST(b + c AS DOUBLE) END AS chi2_cc
            FROM a
        """,
        "fleiss_kappa": """
            -- Fleiss' kappa, m=4 ratings per subject (orders with
            -- exactly 4 lineitems; others drop): rescaled to one
            -- division of exact integers
            WITH cells AS (
                SELECT CAST(l_orderkey % 2 AS BIGINT) AS grp,
                       l_orderkey AS s, l_returnflag AS c,
                       CAST(count(*) AS BIGINT) AS nij
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_returnflag IS NOT NULL
                GROUP BY 1, 2, 3
            ),
            kept AS (
                SELECT grp, s FROM cells
                GROUP BY grp, s HAVING sum(nij) = 4
            ),
            kc AS (
                SELECT cells.* FROM cells JOIN kept USING (grp, s)
            ),
            per_cat AS (
                SELECT grp, c,
                       CAST(sum(nij) AS BIGINT) AS tj,
                       CAST(sum(nij * nij) AS BIGINT) AS sq
                FROM kc GROUP BY 1, 2
            ),
            ag AS (
                SELECT grp,
                       CAST(sum(tj) / 4 AS BIGINT) AS n_subjects,
                       CAST(sum(sq) AS BIGINT) AS sumsq,
                       CAST(sum(tj * tj) AS BIGINT) AS cc
                FROM per_cat GROUP BY 1
            )
            SELECT grp, n_subjects,
                   CASE WHEN 3 * (n_subjects * n_subjects * 16 - cc)
                             <> 0
                        THEN CAST((sumsq - n_subjects * 4)
                                  * n_subjects * 4 - 3 * cc AS DOUBLE)
                             / CAST(3 * (n_subjects * n_subjects * 16
                                         - cc) AS DOUBLE)
                   END AS kappa
            FROM ag WHERE n_subjects > 0
        """,
        "cochran_q": """
            -- complete-block Cochran's Q: duplicate cells collapse
            -- with max, incomplete blocks drop, /k-cleared exact
            -- integer numerator/denominator, one division
            WITH cell AS (
                SELECT CAST(l_orderkey % 3 AS BIGINT) AS grp,
                       l_orderkey AS b, l_linenumber AS t,
                       max(CASE WHEN l_discount > 0.05 THEN 1
                           ELSE 0 END) AS y
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_linenumber IS NOT NULL
                  AND l_discount IS NOT NULL
                GROUP BY 1, 2, 3
            ),
            kdf AS (
                SELECT grp, CAST(count(DISTINCT t) AS BIGINT) AS k
                FROM cell GROUP BY 1
            ),
            perb AS (
                SELECT grp, b, CAST(count(*) AS BIGINT) AS bc,
                       CAST(sum(y) AS BIGINT) AS r
                FROM cell GROUP BY 1, 2
            ),
            keep AS (
                SELECT c.grp, c.b, c.t, c.y, kdf.k, perb.r
                FROM cell c
                JOIN perb USING (grp, b) JOIN kdf USING (grp)
                WHERE perb.bc = kdf.k AND kdf.k >= 2
            ),
            pert AS (
                SELECT grp, k, t, CAST(sum(y) AS BIGINT) AS c,
                       CAST(count(*) AS BIGINT) AS nb
                FROM keep GROUP BY 1, 2, 3
            ),
            aggt AS (
                SELECT grp, k, max(nb) AS n_blocks,
                       CAST(sum(c * c) AS BIGINT) AS sumc2,
                       CAST(sum(c) AS BIGINT) AS n
                FROM pert GROUP BY 1, 2
            ),
            aggb AS (
                SELECT grp, CAST(sum(r * r) AS BIGINT) AS sumr2
                FROM (SELECT grp, b, max(r) AS r FROM keep
                      GROUP BY 1, 2)
                GROUP BY 1
            )
            SELECT grp, k, n_blocks,
                   CASE WHEN k * n - sumr2 <> 0
                        THEN CAST((k - 1) * (k * sumc2 - n * n)
                                  AS DOUBLE)
                             / CAST(k * n - sumr2 AS DOUBLE)
                   END AS q
            FROM aggt JOIN aggb USING (grp)
        """,
        "brown_forsythe": """
            -- ANOVA on |v - discrete median| per level: exact decimal
            -- deviation stats, sorted-level list_reduce folds, fixed
            -- IEEE F tree
            WITH vals AS (
                SELECT event_type AS lvl,
                       CAST(floor(value) AS BIGINT) AS v
                FROM events
                WHERE value IS NOT NULL AND event_type IS NOT NULL
            ),
            med AS (
                SELECT lvl, quantile_disc(v, 0.5) AS m
                FROM vals GROUP BY 1
            ),
            z AS (
                SELECT vals.lvl,
                       CAST(abs(vals.v - med.m) AS DECIMAL(18,4)) AS z
                FROM vals JOIN med USING (lvl)
            ),
            per AS (
                SELECT lvl,
                       CAST(count(*) AS BIGINT) AS nj,
                       CAST(sum(z) AS DOUBLE) AS sj,
                       CAST(sum(z * z) AS DOUBLE) AS qj,
                       sum(z) AS sj_dec
                FROM z GROUP BY 1
            ),
            tot AS (
                SELECT CAST(sum(nj) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS k,
                       CAST(sum(sj_dec) AS DOUBLE) AS stot,
                       list_sort(list(struct_pack(
                           g := lvl, nj := nj, sj := sj, qj := qj
                       ))) AS lv
                FROM per
            ),
            folds AS (
                SELECT n, k,
                       list_reduce(
                           list_prepend(0.0,
                               [CAST(s.nj AS DOUBLE)
                                * (s.sj / CAST(s.nj AS DOUBLE)
                                   - stot / CAST(n AS DOUBLE))
                                * (s.sj / CAST(s.nj AS DOUBLE)
                                   - stot / CAST(n AS DOUBLE))
                                FOR s IN lv]),
                           (acc, t) -> acc + t) AS ssb,
                       list_reduce(
                           list_prepend(0.0,
                               [s.qj - s.sj * s.sj
                                       / CAST(s.nj AS DOUBLE)
                                FOR s IN lv]),
                           (acc, t) -> acc + t) AS ssw
                FROM tot
            )
            SELECT k, n,
                   CASE WHEN k >= 2 AND n > k AND ssw > 0
                        THEN (ssb / (CAST(k AS DOUBLE) - 1.0))
                             / (ssw / (CAST(n AS DOUBLE)
                                       - CAST(k AS DOUBLE)))
                   END AS f
            FROM folds
        """,
        "cramers_v": """
            -- ordered-fold chi2 (the L140 discipline) + plain and
            -- Bergsma-Wicher bias-corrected V as fixed IEEE trees
            WITH flt AS (
                SELECT o_orderpriority AS x, o_orderstatus AS y
                FROM orders
                WHERE o_orderpriority IS NOT NULL
                  AND o_orderstatus IS NOT NULL
            ),
            cells AS (SELECT x, y, count(*) AS o FROM flt GROUP BY 1, 2),
            r AS (SELECT x, sum(o) AS rt FROM cells GROUP BY 1),
            c AS (SELECT y, sum(o) AS ct FROM cells GROUP BY 1),
            tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                           CAST(count(DISTINCT x) AS BIGINT) AS nr,
                           CAST(count(DISTINCT y) AS BIGINT) AS nc
                    FROM cells),
            terms AS (
                SELECT t.n, t.nr, t.nc, cells.x, cells.y,
                       (CAST(cells.o AS DOUBLE)
                          - CAST(r.rt * c.ct AS DOUBLE)
                              / CAST(t.n AS DOUBLE))
                       * (CAST(cells.o AS DOUBLE)
                          - CAST(r.rt * c.ct AS DOUBLE)
                              / CAST(t.n AS DOUBLE))
                       / (CAST(r.rt * c.ct AS DOUBLE)
                              / CAST(t.n AS DOUBLE)) AS term
                FROM cells JOIN r USING (x) JOIN c USING (y)
                CROSS JOIN tot t
            ),
            folded AS (
                SELECT n, nr, nc,
                       list_reduce(
                           list_prepend(0.0,
                               [s.term FOR s IN list_sort(list(
                                   struct_pack(x := x, y := y,
                                               term := term)))]),
                           (acc, v2) -> acc + v2) AS chi2
                FROM terms GROUP BY n, nr, nc
            )
            SELECT n, nr AS r, nc AS c, chi2,
                   CASE WHEN least(nr, nc) >= 2
                        THEN sqrt(chi2 / (CAST(n AS DOUBLE)
                             * (least(CAST(nr AS DOUBLE),
                                      CAST(nc AS DOUBLE)) - 1.0)))
                   END AS v,
                   CASE WHEN n > 1
                             AND (least(
                                 CAST(nr AS DOUBLE)
                                 - (CAST(nr AS DOUBLE) - 1)
                                   * (CAST(nr AS DOUBLE) - 1)
                                   / (CAST(n AS DOUBLE) - 1.0),
                                 CAST(nc AS DOUBLE)
                                 - (CAST(nc AS DOUBLE) - 1)
                                   * (CAST(nc AS DOUBLE) - 1)
                                   / (CAST(n AS DOUBLE) - 1.0))
                                 - 1.0) > 0
                        THEN sqrt(
                             greatest(0.0,
                                 chi2 / CAST(n AS DOUBLE)
                                 - (CAST(nr AS DOUBLE) - 1)
                                   * (CAST(nc AS DOUBLE) - 1)
                                   / (CAST(n AS DOUBLE) - 1.0))
                             / (least(
                                 CAST(nr AS DOUBLE)
                                 - (CAST(nr AS DOUBLE) - 1)
                                   * (CAST(nr AS DOUBLE) - 1)
                                   / (CAST(n AS DOUBLE) - 1.0),
                                 CAST(nc AS DOUBLE)
                                 - (CAST(nc AS DOUBLE) - 1)
                                   * (CAST(nc AS DOUBLE) - 1)
                                   / (CAST(n AS DOUBLE) - 1.0))
                                 - 1.0))
                   END AS v_corrected
            FROM folded
        """,
        "readability": """
            -- the same regex counting conventions: letter-bearing
            -- whitespace tokens, terminator-run sentences (min 1),
            -- vowel-group syllables with a floor of 1 per word
            WITH base AS (
                SELECT doc_id,
                       coalesce(text, '') AS t,
                       lower(coalesce(text, '')) AS lt
                FROM documents
            ),
            c AS (
                SELECT doc_id,
                       CAST(len(list_filter(
                           string_split_regex(trim(t), '\\s+'),
                           w -> regexp_matches(w, '[A-Za-z]')))
                           AS INTEGER) AS n_words,
                       CAST(len(list_filter(
                           string_split_regex(t, '[.!?]+'),
                           s -> regexp_matches(s, '[A-Za-z0-9]')))
                           AS INTEGER) AS n_sent_raw,
                       CAST(len(list_filter(
                           string_split_regex(lt, '[^aeiouy]+'),
                           s -> s <> '')) AS INTEGER) AS vg,
                       CAST(len(list_filter(list_filter(
                           string_split_regex(trim(lt), '\\s+'),
                           w -> regexp_matches(w, '[a-z]')),
                           w -> NOT regexp_matches(w, '[aeiouy]')))
                           AS INTEGER) AS nvw
                FROM base
            )
            SELECT doc_id, n_words,
                   CASE WHEN n_words > 0
                        THEN greatest(n_sent_raw, 1) ELSE 0 END
                       AS n_sentences,
                   CASE WHEN n_words > 0 THEN vg + nvw ELSE 0 END
                       AS n_syllables,
                   CASE WHEN n_words > 0 THEN
                       206.835
                       - 1.015 * (CAST(n_words AS DOUBLE)
                           / CAST(greatest(n_sent_raw, 1) AS DOUBLE))
                       - 84.6 * (CAST(vg + nvw AS DOUBLE)
                           / CAST(n_words AS DOUBLE))
                   END AS flesch,
                   CASE WHEN n_words > 0 THEN
                       0.39 * (CAST(n_words AS DOUBLE)
                           / CAST(greatest(n_sent_raw, 1) AS DOUBLE))
                       + 11.8 * (CAST(vg + nvw AS DOUBLE)
                           / CAST(n_words AS DOUBLE))
                       - 15.59
                   END AS fk_grade
            FROM c
        """,
        "compaction_plan": """
            -- size-desc total order, bucket = floor(cum_before/target)
            WITH files AS (
                SELECT doc_id AS file_id,
                       CAST(length(text) AS BIGINT) AS bytes
                FROM documents
            ),
            plan AS (
                SELECT file_id, bytes,
                       CAST(floor(coalesce(sum(bytes) OVER (
                           ORDER BY bytes DESC, file_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) / 8192)
                           AS BIGINT) AS bucket
                FROM files
            )
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_files,
                   CAST(sum(bytes) AS BIGINT) AS bucket_bytes
            FROM plan GROUP BY 1
        """,
        "sorted_neighborhood": """
            -- pairs within w positions of the (key, id) sort inside
            -- each prefix block; exact integer row positions
            WITH base AS (
                SELECT p_partkey AS pid, p_name AS name,
                       substring(p_name, 1, 2) AS blk,
                       row_number() OVER (
                           PARTITION BY substring(p_name, 1, 2)
                           ORDER BY p_name, p_partkey) AS rn
                FROM part
            ),
            offs AS (SELECT CAST(unnest(range(1, 3)) AS INTEGER) AS d)
            SELECT a.pid AS id_a, b.pid AS id_b, a.blk AS block,
                   offs.d AS dist
            FROM base a
            CROSS JOIN offs
            JOIN base b ON a.blk = b.blk AND b.rn = a.rn + offs.d
        """,
        "cuped": """
            -- θ = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) from exact decimal
            -- stats; y' = y − θ·(x − x̄) as Spark's fixed tree
            WITH base AS (
                SELECT o_orderpriority AS priority, o_orderkey,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS y,
                       CAST(o_orderkey % 100 AS DECIMAL(18,2)) AS x
                FROM orders
                WHERE o_totalprice IS NOT NULL
            ),
            fit AS (
                SELECT priority,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS DECIMAL(19,2)) AS sx,
                       CAST(sum(y) AS DECIMAL(19,2)) AS sy,
                       CAST(sum(CAST(x AS DECIMAL(19,2))
                                * CAST(x AS DECIMAL(19,2)))
                            AS DECIMAL(30,4)) AS sxx,
                       CAST(sum(CAST(x AS DECIMAL(19,2))
                                * CAST(y AS DECIMAL(19,2)))
                            AS DECIMAL(30,4)) AS sxy
                FROM base GROUP BY 1
            ),
            stats AS (
                SELECT priority,
                       CASE WHEN CAST(n AS DECIMAL(8,0)) * sxx - sx * sx
                                <> 0 THEN
                           CAST(CAST(n AS DECIMAL(8,0)) * sxy - sx * sy
                                AS DOUBLE)
                           / CAST(CAST(n AS DECIMAL(8,0)) * sxx - sx * sx
                                  AS DOUBLE)
                       END AS theta,
                       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
                FROM fit
            )
            SELECT b.priority, b.o_orderkey, s.theta,
                   CASE WHEN s.theta IS NOT NULL THEN
                       CAST(b.y AS DOUBLE)
                       - s.theta * (CAST(b.x AS DOUBLE) - s.xbar)
                   ELSE CAST(b.y AS DOUBLE) END AS metric_adj
            FROM base b JOIN stats s ON b.priority = s.priority
        """,
        "heaps": """
            -- V(N) ~ K·N^beta: first-occurrence cumsums, then the L145
            -- ordered-fold ln/ln OLS with the identical fit tree
            WITH toks AS (
                SELECT doc_id AS d,
                       unnest(list_filter(string_split_regex(
                           lower(coalesce(text, '')), '\\s+'),
                           w -> w <> '')) AS t
                FROM documents
            ),
            per_doc AS (SELECT d, count(*) AS nt FROM toks GROUP BY 1),
            firsts AS (
                SELECT d, count(*) AS nv
                FROM (SELECT t, min(d) AS d FROM toks GROUP BY 1)
                GROUP BY 1
            ),
            pts AS (
                SELECT p.d,
                       sum(p.nt) OVER w AS N,
                       sum(coalesce(f.nv, 0)) OVER w AS V
                FROM per_doc p LEFT JOIN firsts f ON p.d = f.d
                WINDOW w AS (ORDER BY p.d ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW)
            ),
            flt AS (SELECT d, N, V FROM pts WHERE N > 0 AND V > 0),
            sums AS (
                SELECT CAST(len(a) AS BIGINT) AS n_points,
                       CAST(len(a) AS DOUBLE) AS n,
                       list_reduce(list_prepend(0.0, [p.x FOR p IN a]),
                                   (acc, v) -> acc + v) AS sx,
                       list_reduce(list_prepend(0.0, [p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS sy,
                       list_reduce(list_prepend(0.0,
                                       [p.x * p.x FOR p IN a]),
                                   (acc, v) -> acc + v) AS sxx,
                       list_reduce(list_prepend(0.0,
                                       [p.x * p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS sxy,
                       list_reduce(list_prepend(0.0,
                                       [p.y * p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS syy
                FROM (
                    SELECT list_sort(list(struct_pack(
                               o := d,
                               x := ln(CAST(N AS DOUBLE)),
                               y := ln(CAST(V AS DOUBLE))))) AS a
                    FROM flt
                )
            ),
            t AS (
                SELECT n_points, n, sx, sy,
                       n * sxy - sx * sy AS covn,
                       n * sxx - sx * sx AS varxn,
                       n * syy - sy * sy AS varyn
                FROM sums
            )
            SELECT CAST(n_points AS INTEGER) AS n_points,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                        THEN covn / varxn END AS beta,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                        THEN (sy - (covn / varxn) * sx) / n END AS log_k,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                            AND varyn > 0.0
                        THEN (covn * covn) / (varxn * varyn) END AS r2
            FROM t
        """,
        "zipf": """
            -- f(r) ~ C·r^{-s}: top-200 ranks (count DESC, term ASC),
            -- same ordered-fold OLS / fit tree
            WITH counts AS (
                SELECT t, count(*) AS f
                FROM (
                    SELECT unnest(list_filter(string_split_regex(
                               lower(coalesce(text, '')), '\\s+'),
                               w -> w <> '')) AS t
                    FROM documents
                ) GROUP BY 1
            ),
            ranked AS (
                SELECT f, row_number() OVER (ORDER BY f DESC, t ASC) AS r
                FROM counts QUALIFY r <= 200
            ),
            sums AS (
                SELECT CAST(len(a) AS BIGINT) AS n_points,
                       CAST(len(a) AS DOUBLE) AS n,
                       list_reduce(list_prepend(0.0, [p.x FOR p IN a]),
                                   (acc, v) -> acc + v) AS sx,
                       list_reduce(list_prepend(0.0, [p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS sy,
                       list_reduce(list_prepend(0.0,
                                       [p.x * p.x FOR p IN a]),
                                   (acc, v) -> acc + v) AS sxx,
                       list_reduce(list_prepend(0.0,
                                       [p.x * p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS sxy,
                       list_reduce(list_prepend(0.0,
                                       [p.y * p.y FOR p IN a]),
                                   (acc, v) -> acc + v) AS syy
                FROM (
                    SELECT list_sort(list(struct_pack(
                               o := r,
                               x := ln(CAST(r AS DOUBLE)),
                               y := ln(CAST(f AS DOUBLE))))) AS a
                    FROM ranked
                )
            ),
            t AS (
                SELECT n_points, n, sx, sy,
                       n * sxy - sx * sy AS covn,
                       n * sxx - sx * sx AS varxn,
                       n * syy - sy * sy AS varyn
                FROM sums
            )
            SELECT CAST(n_points AS INTEGER) AS n_points,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                        THEN -(covn / varxn) END AS s,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                        THEN (sy - (covn / varxn) * sx) / n END AS log_c,
                   CASE WHEN n_points > 1 AND varxn > 0.0
                            AND varyn > 0.0
                        THEN (covn * covn) / (varxn * varyn) END AS r2
            FROM t
        """,
        "wasserstein": """
            -- W1 = Σ |cumA·n_b − cumB·n_a|·Δv / (n_a·n_b): exact
            -- decimal gap×width terms, one final IEEE division
            WITH base AS (
                SELECT user_id % 4 AS bucket, event_type,
                       CAST(value AS DECIMAL(18,2)) AS v
                FROM events
                WHERE value IS NOT NULL
                  AND event_type IN ('click', 'view')
            ),
            pts AS (
                SELECT bucket, v,
                       sum(CASE WHEN event_type = 'click'
                                THEN 1 ELSE 0 END) AS ca,
                       sum(CASE WHEN event_type = 'view'
                                THEN 1 ELSE 0 END) AS cb
                FROM base GROUP BY 1, 2
            ),
            wnd AS (
                SELECT bucket, v,
                       CAST(sum(ca) OVER cw AS BIGINT) AS cuma,
                       CAST(sum(cb) OVER cw AS BIGINT) AS cumb,
                       CAST(sum(ca) OVER (PARTITION BY bucket)
                            AS BIGINT) AS na,
                       CAST(sum(cb) OVER (PARTITION BY bucket)
                            AS BIGINT) AS nb,
                       lead(v) OVER (PARTITION BY bucket ORDER BY v)
                           AS nextv
                FROM pts
                WINDOW cw AS (PARTITION BY bucket ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)
            ),
            agg AS (
                SELECT bucket,
                       max(na) AS n_a, max(nb) AS n_b,
                       sum(CASE WHEN nextv IS NOT NULL THEN
                           CAST(abs(CAST(cuma AS DECIMAL(19,0))
                                        * CAST(nb AS DECIMAL(19,0))
                                    - CAST(cumb AS DECIMAL(19,0))
                                        * CAST(na AS DECIMAL(19,0)))
                                AS DECIMAL(19,0))
                           * CAST(nextv - v AS DECIMAL(19,2))
                       ELSE CAST(0 AS DECIMAL(19,2)) END) AS num
                FROM wnd GROUP BY 1
            )
            SELECT bucket, n_a, n_b,
                   CASE WHEN n_a > 0 AND n_b > 0 THEN
                       CAST(num AS DOUBLE)
                       / CAST(CAST(n_a AS DECIMAL(19,0))
                              * CAST(n_b AS DECIMAL(19,0)) AS DOUBLE)
                   END AS w1
            FROM agg
        """,
        "twap": """
            -- TWAP = Σ v·Δt / Σ Δt over exact microsecond intervals
            WITH base AS (
                SELECT user_id, epoch_us(ts) AS t,
                       CAST(value AS DECIMAL(18,2)) AS v
                FROM events
                WHERE user_id < 40 AND value IS NOT NULL
                  AND ts IS NOT NULL
            ),
            staged AS (
                SELECT user_id, v, t,
                       lead(t) OVER (PARTITION BY user_id ORDER BY t)
                           AS nt
                FROM base
            ),
            agg AS (
                SELECT user_id,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN nt IS NOT NULL
                                     THEN nt - t END) AS BIGINT) AS span,
                       sum(CASE WHEN nt IS NOT NULL THEN
                           v * CAST(nt - t AS DECIMAL(19,0)) END) AS num
                FROM staged GROUP BY 1
            )
            SELECT user_id, n,
                   coalesce(span, 0) AS span_micros,
                   CASE WHEN span IS NOT NULL AND span > 0 THEN
                       CAST(num AS DOUBLE) / CAST(span AS DOUBLE)
                   END AS twap
            FROM agg
        """,
        "ohlc": """
            -- daily bars: open/close by exact microsecond arg-min/max
            WITH base AS (
                SELECT user_id,
                       CAST(floor(epoch_us(ts) / 86400000000)
                            * 86400000000 AS BIGINT) AS bucket_start,
                       epoch_us(ts) AS t, value AS v
                FROM events
                WHERE user_id < 40 AND value IS NOT NULL
                  AND ts IS NOT NULL
            )
            SELECT user_id, bucket_start,
                   min_by(v, t) AS open,
                   max(v) AS high,
                   min(v) AS low,
                   max_by(v, t) AS close,
                   CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1, 2
        """,
        "cohens_kappa": """
            -- kappa = (n·Σtp − Σ na·nb)/(n² − Σ na·nb): exact ints
            WITH e AS (
                SELECT event_type AS a,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS b
                FROM events
            ),
            cells AS (
                SELECT a, b, count(*) AS o FROM e
                WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY 1, 2
            ),
            diag AS (SELECT CAST(coalesce(sum(o), 0) AS BIGINT) AS tp
                     FROM cells WHERE a = b),
            ma AS (SELECT a, CAST(sum(o) AS BIGINT) AS na
                   FROM cells GROUP BY 1),
            mb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb
                   FROM cells GROUP BY 1),
            pe AS (SELECT CAST(coalesce(sum(ma.na * mb.nb), 0) AS BIGINT)
                       AS pe
                   FROM ma JOIN mb ON ma.a = mb.b),
            tot AS (SELECT CAST(coalesce(sum(o), 0) AS BIGINT) AS n
                    FROM cells)
            SELECT tot.n,
                   CAST(tot.n * diag.tp - pe.pe AS DOUBLE) AS po_num,
                   CAST(pe.pe AS DOUBLE) AS pe_num,
                   CASE WHEN tot.n * tot.n - pe.pe <> 0 THEN
                       CAST(tot.n * diag.tp - pe.pe AS DOUBLE)
                       / CAST(tot.n * tot.n - pe.pe AS DOUBLE)
                   END AS kappa
            FROM tot CROSS JOIN diag CROSS JOIN pe
        """,
        "wilson": """
            -- Wilson score interval: fixed tree over exact (k, n)
            WITH agg AS (
                SELECT event_type,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN user_id % 3 = 0
                                     THEN 1 ELSE 0 END) AS BIGINT) AS k
                FROM events GROUP BY 1
            ),
            t AS (
                SELECT event_type, n, k,
                       CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                       (1.959963984540054 * 1.959963984540054)
                           / CAST(n AS DOUBLE) AS z2n
                FROM agg
            )
            SELECT event_type, n, k,
                   CASE WHEN n > 0 THEN p END AS p,
                   CASE WHEN n > 0 THEN greatest(
                       ((p + z2n / 2.0) / (1.0 + z2n))
                       - (1.959963984540054
                          * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                                 + z2n / (4.0 * CAST(n AS DOUBLE)))
                          / (1.0 + z2n)), 0.0) END AS lo,
                   CASE WHEN n > 0 THEN least(
                       ((p + z2n / 2.0) / (1.0 + z2n))
                       + (1.959963984540054
                          * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                                 + z2n / (4.0 * CAST(n AS DOUBLE)))
                          / (1.0 + z2n)), 1.0) END AS hi
            FROM t
        """,
        "cohens_d": """
            -- d = (m_a − m_b)/s_pooled from exact decimal stats;
            -- g = d·(1 − 3/(4N−9)) — Spark's fixed trees
            WITH base AS (
                SELECT o_orderpriority AS priority,
                       CASE WHEN o_orderkey % 2 = 0
                            THEN 'a' ELSE 'b' END AS variant,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS y
                FROM orders WHERE o_totalprice IS NOT NULL
            ),
            agg AS (
                SELECT priority,
                       CAST(sum(CASE WHEN variant = 'a'
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                       CAST(sum(CASE WHEN variant = 'b'
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                       CAST(sum(CASE WHEN variant = 'a' THEN y END)
                            AS DECIMAL(19,2)) AS sa,
                       CAST(sum(CASE WHEN variant = 'b' THEN y END)
                            AS DECIMAL(19,2)) AS sb,
                       CAST(sum(CASE WHEN variant = 'a' THEN
                                CAST(y AS DECIMAL(19,2))
                                * CAST(y AS DECIMAL(19,2)) END)
                            AS DECIMAL(30,4)) AS ssa,
                       CAST(sum(CASE WHEN variant = 'b' THEN
                                CAST(y AS DECIMAL(19,2))
                                * CAST(y AS DECIMAL(19,2)) END)
                            AS DECIMAL(30,4)) AS ssb
                FROM base GROUP BY 1
            ),
            t AS (
                SELECT priority, n_a, n_b,
                       CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
                       CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
                       CAST(CAST(CAST(n_a AS DECIMAL(8,0)) * ssa
                                 AS DECIMAL(38,4))
                            - CAST(sa * sa AS DECIMAL(38,4)) AS DOUBLE)
                           / CAST(n_a AS DOUBLE) AS va,
                       CAST(CAST(CAST(n_b AS DECIMAL(8,0)) * ssb
                                 AS DECIMAL(38,4))
                            - CAST(sb * sb AS DECIMAL(38,4)) AS DOUBLE)
                           / CAST(n_b AS DOUBLE) AS vb
                FROM agg
            )
            SELECT priority, n_a, n_b,
                   CASE WHEN n_a > 0 THEN ma END AS mean_a,
                   CASE WHEN n_b > 0 THEN mb END AS mean_b,
                   CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 2
                            AND va + vb > 0.0 THEN
                       (ma - mb) / sqrt((va + vb)
                           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                              - 2.0))
                   END AS d,
                   CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 2
                            AND va + vb > 0.0 THEN
                       ((ma - mb) / sqrt((va + vb)
                           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                              - 2.0)))
                       * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE)
                              + CAST(n_b AS DOUBLE)) - 9.0))
                   END AS hedges_g
            FROM t
        """,
        "reciprocity": """
            WITH fwd AS (
                SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS u,
                       'n:' || CAST(c_nationkey AS VARCHAR) AS v
                FROM customer
            ),
            back AS (
                SELECT 'n:' || CAST(c_nationkey AS VARCHAR) AS u,
                       'c:' || CAST(c_custkey AS VARCHAR) AS v
                FROM customer WHERE c_custkey % 3 = 0
            ),
            e AS (
                SELECT DISTINCT u, v
                FROM (SELECT * FROM fwd UNION ALL SELECT * FROM back)
                WHERE u <> v
            ),
            m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
            r AS (
                SELECT CAST(count(*) AS BIGINT) AS m_reciprocated
                FROM e a JOIN e b ON a.u = b.v AND a.v = b.u
            )
            SELECT m.m, r.m_reciprocated,
                   CASE WHEN m.m > 0 THEN
                       CAST(r.m_reciprocated AS DOUBLE)
                       / CAST(m.m AS DOUBLE) END AS r
            FROM m CROSS JOIN r
        """,
        "conductance": """
            -- phi(S) = cut/min(vol, total − vol): exact integers
            WITH edges AS (
                SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS u,
                       'n:' || CAST(c_nationkey AS VARCHAR) AS v
                FROM customer
            ),
            comm AS (
                SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS node,
                       n_regionkey AS c
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                UNION ALL
                SELECT 'n:' || CAST(n_nationkey AS VARCHAR), n_regionkey
                FROM nation
            ),
            tagged AS (
                SELECT cu.c AS cu, cv.c AS cv
                FROM edges
                JOIN comm cu ON edges.u = cu.node
                JOIN comm cv ON edges.v = cv.node
            ),
            vol AS (
                SELECT c, CAST(count(*) AS BIGINT) AS vol
                FROM (SELECT cu AS c FROM tagged
                      UNION ALL SELECT cv FROM tagged)
                GROUP BY 1
            ),
            cut AS (
                SELECT c, CAST(count(*) AS BIGINT) AS cut
                FROM (
                    SELECT cu AS c FROM tagged WHERE cu <> cv
                    UNION ALL
                    SELECT cv FROM tagged WHERE cu <> cv
                ) GROUP BY 1
            ),
            tot AS (SELECT CAST(count(*) * 2 AS BIGINT) AS total
                    FROM tagged)
            SELECT vol.c AS community, vol.vol,
                   coalesce(cut.cut, 0) AS cut,
                   CASE WHEN least(vol.vol, tot.total - vol.vol) > 0 THEN
                       CAST(coalesce(cut.cut, 0) AS DOUBLE)
                       / CAST(least(vol.vol, tot.total - vol.vol)
                              AS DOUBLE) END AS phi
            FROM vol LEFT JOIN cut ON vol.c = cut.c CROSS JOIN tot
        """,
        "ks_2samp": """
            -- per distinct value the scaled ECDF gap
            -- |cum_a·n_b − cum_b·n_a| is an exact integer;
            -- D = max gap / (n_a·n_b), one IEEE division
            WITH base AS (
                SELECT user_id % 4 AS bucket, event_type, value
                FROM events
                WHERE value IS NOT NULL
                  AND event_type IN ('click', 'view')
            ),
            pts AS (
                SELECT bucket, value AS v,
                       sum(CASE WHEN event_type = 'click'
                                THEN 1 ELSE 0 END) AS ca,
                       sum(CASE WHEN event_type = 'view'
                                THEN 1 ELSE 0 END) AS cb
                FROM base GROUP BY 1, 2
            ),
            wnd AS (
                SELECT bucket,
                       sum(ca) OVER (PARTITION BY bucket ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cuma,
                       sum(cb) OVER (PARTITION BY bucket ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cumb,
                       sum(ca) OVER (PARTITION BY bucket) AS na,
                       sum(cb) OVER (PARTITION BY bucket) AS nb
                FROM pts
            ),
            agg AS (
                SELECT bucket,
                       CAST(max(na) AS BIGINT) AS n_a,
                       CAST(max(nb) AS BIGINT) AS n_b,
                       max(abs(CAST(cuma AS DECIMAL(38,0))
                                   * CAST(nb AS DECIMAL(38,0))
                               - CAST(cumb AS DECIMAL(38,0))
                                   * CAST(na AS DECIMAL(38,0))))
                           AS maxgap
                FROM wnd GROUP BY 1
            )
            SELECT bucket, n_a, n_b,
                   CASE WHEN n_a > 0 AND n_b > 0
                        THEN CAST(maxgap AS DOUBLE)
                             / CAST(CAST(n_a AS DECIMAL(38,0))
                                    * CAST(n_b AS DECIMAL(38,0))
                                    AS DOUBLE) END AS d
            FROM agg
        """,
        "share_of_total": """
            WITH nat AS (
                SELECT r_name, n_name,
                       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
                FROM orders
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                GROUP BY 1, 2
            )
            SELECT r_name AS region_name, n_name AS nation_name,
                   CAST(rev_d AS DOUBLE) AS revenue,
                   CAST(rev_d AS DOUBLE)
                       / CAST(sum(rev_d) OVER (PARTITION BY r_name)
                              AS DOUBLE) AS share
            FROM nat
        """,
        "sha256": """
            SELECT doc_id, sha256(text) AS sha FROM documents
        """,
        "bucketed_join": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY 1
        """,
        "collect_pivot": """
            SELECT user_id,
                   string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
                   min(ts) AS first_ts
            FROM events GROUP BY 1
        """,
        "simhash": """
            -- bit-for-bit SimHash twin: sig bit b = sign of the token-sum
            -- of (2*bit_b(md5(tok)[:8]) - 1), bits pulled from hex nibbles
            WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
            toks AS (
                SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                FROM d
            ),
            bits AS (
                SELECT doc_id, b.range AS b,
                       ((strpos('0123456789abcdef', substr(md5(tok), CAST(b.range // 4 AS INT) + 1, 1)) - 1)
                        >> (3 - CAST(b.range % 4 AS INT))) & 1 AS bit
                FROM toks, range(64) b
                WHERE tok <> ''
            ),
            sums AS (SELECT doc_id, b, sum(2 * bit - 1) AS s FROM bits GROUP BY 1, 2),
            sig AS (
                SELECT doc_id,
                       sum(CASE WHEN s > 0 THEN CAST(1 AS HUGEINT) << CAST(63 - b AS INT) ELSE 0 END) AS raw
                FROM sums GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(coalesce(CASE WHEN raw >= CAST(1 AS HUGEINT) << 63
                                      THEN raw - (CAST(1 AS HUGEINT) << 64)
                                      ELSE raw END, 0) AS BIGINT) AS simhash
            FROM d LEFT JOIN sig ON d.doc_id = sig.doc_id
        """,
        "mention_type_counts": """
            -- frozen single-process loop-oracle tallies over the same
            -- derived transcripts (tools/make_oracle_fixtures.py); the
            -- fixture is re-derived from the loop oracle in CI.  Pinned
            -- to sf0.01 — the driver's correctness scale (TESTDATA.md);
            -- comparing at another sf intentionally mismatches.
            SELECT mtype, n_mentions
            FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/mention_type_counts.parquet')
        """,
        "kg_edge_counts": """
            SELECT pred, n_edges, n_provenances
            FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/kg_edge_counts.parquet')
        """,
        "streaming_conv_totals": """
            -- final cross-batch state per conversation == plain GROUP BY
            -- over the same pure-column-math transcripts derivation
            SELECT 'conv-' || lpad(CAST(doc_id % 64 AS VARCHAR), 6, '0') AS conv_id,
                   count(*) AS n_turns_total
            FROM documents GROUP BY 1
        """,
        "streaming_dedup": """
            -- redelivered stream deduped == one clean copy's GROUP BY
            SELECT 'conv-' || lpad(CAST(doc_id % 64 AS VARCHAR), 6, '0') AS conv_id,
                   count(*) AS n_turns
            FROM documents GROUP BY 1
        """,
        "hybrid_search": """
            -- per-(query,entity) score terms frozen from the straight-line
            -- scorer (tools/make_oracle_fixtures.py — sf-independent, the
            -- query ignores sf_dir); DuckDB checks the 0.3/0.3/0.4 blend,
            -- the score>0 filter, and the top-10 asc-iri-tiebreak ranking.
            -- Arithmetic mirrors search.py exactly — the weights are CAST
            -- to DOUBLE so DuckDB cannot constant-fold `0.3 * ts` in exact
            -- DECIMAL (which diverges from the UDF's binary doubles by
            -- 1 ulp); with the forced-double order the scores match
            -- bit-for-bit.  Ordering/limit use the UNROUNDED score like
            -- the Spark plan (the driver compare is order-insensitive).
            SELECT iri, label, round(score, 6) AS score
            FROM (
                SELECT iri, label,
                       (CAST(0.3 AS DOUBLE) * ts_ratio / 100.0
                        + CAST(0.3 AS DOUBLE) * p_ratio / 100.0)
                       + CAST(0.4 AS DOUBLE) * cos AS score
                FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/hybrid_search_terms.parquet')
                WHERE (CAST(0.3 AS DOUBLE) * ts_ratio / 100.0
                       + CAST(0.3 AS DOUBLE) * p_ratio / 100.0)
                      + CAST(0.4 AS DOUBLE) * cos > 0
                ORDER BY score DESC, iri ASC
                LIMIT 10
            )
        """,
        "knn_pq": _pq_oracle_sql(),
        "kmeans": _kmeans_oracle_sql(),
        "random_projection": _random_projection_oracle_sql(),
        "silhouette": _silhouette_oracle_sql(),
        "ari": _ari_oracle_sql(),
        "fps": _fps_oracle_sql(),
        "knn_ivfpq": _pq_oracle_sql(ivf_probe=True),
        # auto shortlist at k=10 -> k' = max(50, 10k) = 100
        "knn_ivfpq_rerank": _pq_oracle_sql(ivf_probe=True, rerank=100),
        "knn_ivfpq_residual": _pq_oracle_sql(ivf_probe=True, residual=True),
        "edges_changelog": """
            -- diff of two frozen loop-oracle canonical edge tables
            -- (doc_id < 250 prefix vs full; tools/make_oracle_fixtures.py,
            -- pinned to sf0.01): inserts = triples absent at v1, updates =
            -- provenance-count changes (count inequality is
            -- diff-completeness — see oracle_edge_rows)
            SELECT n.subj, n.pred, n.obj, n.n_provenances,
                   CASE WHEN o.subj IS NULL THEN 'insert' ELSE 'update' END AS _change
            FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/kg_edges_v2.parquet') n
            LEFT JOIN read_parquet('/root/repo/fixtures/oracle/sf0.01/kg_edges_v1.parquet') o
              USING (subj, pred, obj)
            WHERE o.subj IS NULL OR o.n_provenances <> n.n_provenances
        """,
        "stream_reply_join": """
            -- batch twin of the stream-stream interval join over the same
            -- pure-column-math transcripts derivation (64-min turn spacing,
            -- roles cycling by turn_idx)
            WITH t AS (
                SELECT 'conv-' || lpad(CAST(doc_id % 64 AS VARCHAR), 6, '0') AS conv_id,
                       CAST(doc_id // 64 AS INT) AS turn_idx,
                       ['user', 'assistant', 'tool'][CAST(doc_id // 64 AS INT) % 3 + 1] AS role,
                       TIMESTAMP '2026-01-01 00:00:00'
                           + to_minutes(CAST(doc_id AS BIGINT)) AS ts
                FROM documents
            )
            SELECT u.conv_id,
                   u.turn_idx AS user_turn_idx,
                   u.ts AS user_ts,
                   a.turn_idx AS reply_turn_idx,
                   a.ts AS reply_ts
            FROM t u
            JOIN t a ON u.conv_id = a.conv_id
                    AND u.role = 'user' AND a.role = 'assistant'
                    AND a.ts > u.ts
                    AND a.ts <= u.ts + INTERVAL 2 HOUR
        """,
        "multimodal_features": """
            SELECT CASE CAST(doc_id % 3 AS INT)
                        WHEN 0 THEN 'image/png'
                        WHEN 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS mime,
                   count(*) AS n_media,
                   round(avg(strlen(text)), 2) AS avg_bytes
            FROM documents WHERE doc_id < 100 GROUP BY 1
        """,
        "frame_sample": """
            -- frame counts = ceil(bytes/64) (min 1 per payload); summed
            -- frame lengths must reassemble the payload byte totals
            WITH m AS (
                SELECT CASE CAST(doc_id % 3 AS INT)
                            WHEN 0 THEN 'image/png'
                            WHEN 1 THEN 'audio/wav'
                            ELSE 'video/mp4' END AS mime,
                       strlen(text) AS n_bytes
                FROM documents WHERE doc_id < 50
            )
            SELECT mime,
                   CAST(sum(greatest(CAST(ceil(n_bytes / 64.0) AS BIGINT), 1)) AS BIGINT) AS n_frames,
                   CAST(sum(n_bytes) AS BIGINT) AS n_payload_bytes
            FROM m GROUP BY 1
        """,
        "top_terms": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
                FROM documents
            ),
            counted AS (
                SELECT doc_id, term, count(*) AS n FROM toks
                WHERE length(term) >= 6 GROUP BY 1, 2
            )
            SELECT doc_id, term, n, rank FROM (
                SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, term ASC) AS rank
                FROM counted
            ) WHERE rank <= 3
        """,
    }
    # the star-components variant shares dedup_clusters' label contract
    # (same pairs, same min-label semantics), hence the same oracle
    oracles["dedup_clusters_star"] = oracles["dedup_clusters"]
    oracles["edges_as_of"] = """
        -- VERSION AS OF the first commit == the frozen v1 loop-oracle
        -- canonical edge table (same fixture family as edges_changelog)
        SELECT subj, pred, obj, n_provenances
        FROM read_parquet('/root/repo/fixtures/oracle/sf0.01/kg_edges_v1.parquet')
    """
    oracles["decontaminate"] = """
        -- full-window 5-grams only (docs under 5 tokens have none),
        -- mirroring ops/decontam._full_ngrams; benchmark = doc_id % 97 == 0
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   unnest([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                           t[i+4] || ' ' || t[i+5]
                           FOR i IN range(greatest(len(t) - 4, 0))]) AS shingle
            FROM toks WHERE len(t) >= 5
        ),
        shn AS (SELECT * FROM sh WHERE length(shingle) > 0),
        bench AS (SELECT DISTINCT shingle FROM shn WHERE doc_id % 97 = 0),
        sizes AS (SELECT doc_id, count(*) AS n_doc_shingles FROM shn GROUP BY 1),
        hits AS (
            SELECT s.doc_id, count(*) AS n_hits
            FROM shn s JOIN bench b USING (shingle) GROUP BY 1
        )
        SELECT h.doc_id, h.n_hits, z.n_doc_shingles
        FROM hits h JOIN sizes z USING (doc_id)
        WHERE h.n_hits >= 1
    """
    oracles["lm_quality"] = """
        -- same model re-derived relationally: top-V vocab by (count
        -- DESC, token ASC), alpha=0.5 smoothing over V+1 classes, and
        -- the per-doc log-prob sum as a left-assoc list_reduce over the
        -- token-sorted list — the identical addend order as the Spark
        -- array_sort+aggregate fold, so doubles match to libm ulps
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\\s+'),
                       t -> t <> '')) AS token
            FROM documents
        ),
        cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        vocab AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 65536),
        stats AS (SELECT CAST(sum(c) AS DOUBLE) AS N,
                         CAST(count(*) AS DOUBLE) AS V FROM vocab),
        mult AS (SELECT doc_id, token, count(*) AS m FROM toks GROUP BY doc_id, token),
        scored AS (
            SELECT doc_id, token, m,
                   CASE WHEN v.c IS NOT NULL THEN ln(v.c + 0.5) ELSE ln(0.5) END
                     - ln(s.N + 0.5 * (s.V + 1.0)) AS logp,
                   v.c IS NULL AS oov
            FROM mult LEFT JOIN vocab v USING (token), stats s
        ),
        per_doc AS (
            SELECT doc_id, sum(m) AS n_tokens,
                   sum(CASE WHEN oov THEN m ELSE 0 END) AS n_oov,
                   list_reduce(
                       list_prepend(0.0,
                           [x.m * x.logp FOR x IN
                            list_sort(list(struct_pack(
                                token := token,
                                m := CAST(m AS DOUBLE),
                                logp := logp)))]),
                       (acc, v2) -> acc + v2) AS lp
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id AS doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
               coalesce(-p.lp / p.n_tokens, 0.0) AS cross_entropy,
               coalesce(exp(-p.lp / p.n_tokens), 1.0) AS perplexity
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """
    # Naive Bayes (L136): shared lattice — same tokenizer as lm_quality,
    # same alpha=0.5 / V+1 smoothing, per-(doc,class) sums as the
    # 0.0-prepended token-sorted left-assoc fold (addend order pinned).
    _nb_prefix = """
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\\s+'),
                       t -> t <> '')) AS token
            FROM documents
        ),
        cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        vocab AS (SELECT token FROM cnt ORDER BY c DESC, token LIMIT 65536),
        vs AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
        pc AS (SELECT lang AS label, token, count(*) AS c_tc
               FROM toks JOIN vocab USING (token) GROUP BY 1, 2),
        ct AS (SELECT label, CAST(sum(c_tc) AS DOUBLE) AS n_c
               FROM pc GROUP BY 1),
        nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        classes AS (
            SELECT dc.label,
                   ln(CAST(dc.docs_c AS DOUBLE)) - ln((SELECT n FROM nd))
                       AS prior_lp,
                   ln(0.5) - ln(coalesce(ct.n_c, 0.0)
                                + 0.5 * ((SELECT v FROM vs) + 1.0))
                       AS oov_lp
            FROM (SELECT lang AS label, count(*) AS docs_c
                  FROM documents GROUP BY 1) dc
            LEFT JOIN ct USING (label)
        ),
        model AS (
            SELECT pc.label, pc.token,
                   ln(pc.c_tc + 0.5) - ln(ct.n_c
                       + 0.5 * ((SELECT v FROM vs) + 1.0)) AS logp
            FROM pc JOIN ct USING (label)
        ),
        mult AS (SELECT doc_id, token, count(*) AS m
                 FROM toks GROUP BY 1, 2),
        terms AS (
            SELECT mult.doc_id, c.label, mult.token,
                   CAST(mult.m AS DOUBLE)
                       * coalesce(model.logp, c.oov_lp) AS term
            FROM mult CROSS JOIN classes c
            LEFT JOIN model
              ON model.label = c.label AND model.token = mult.token
        ),
        folded AS (
            SELECT doc_id, label,
                   list_reduce(
                       list_prepend(0.0,
                           [x.term FOR x IN list_sort(list(struct_pack(
                               token := token, term := term)))]),
                       (acc, v2) -> acc + v2) AS lp
            FROM terms GROUP BY doc_id, label
        ),
        scored AS (
            SELECT d.doc_id, c.label,
                   c.prior_lp + coalesce(f.lp, 0.0) AS score
            FROM documents d
            CROSS JOIN classes c
            LEFT JOIN folded f
              ON f.doc_id = d.doc_id AND f.label = c.label
        )
    """
    oracles["nb_lang_scores"] = (
        _nb_prefix + "SELECT doc_id, label, score FROM scored"
    )
    oracles["nb_predict_lang"] = (
        _nb_prefix
        + """
        SELECT doc_id, label, score FROM (
            SELECT doc_id, label, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, label) AS rn
            FROM scored
        ) WHERE rn = 1"""
    )
    oracles["corpus_line_dedup"] = """
        -- identical deterministic input derivation (boilerplate
        -- injection by doc_id residue + split at ' value '), then the
        -- same rule relationally: lines occurring >= 3x corpus-wide are
        -- dropped, docs reassembled by ordered string_agg; docs with no
        -- surviving lines resurface via the left joins
        WITH input AS (
            SELECT doc_id,
                   concat(
                     CASE WHEN doc_id % 5 = 0
                          THEN 'subscribe to our newsletter' || chr(10) ELSE '' END,
                     replace(text, ' value ', chr(10)),
                     CASE WHEN doc_id % 3 = 0
                          THEN chr(10) || 'all rights reserved' ELSE '' END,
                     CASE WHEN doc_id % 7 = 0
                          THEN chr(10) || 'click here to read more' ELSE '' END
                   ) AS text
            FROM documents
        ),
        l AS (
            SELECT doc_id, (u).pos AS pos, (u).line AS line FROM (
                SELECT doc_id,
                       unnest([{'pos': i, 'line': larr[i+1]}
                               FOR i IN range(len(larr))]) AS u
                FROM (SELECT doc_id,
                             list_filter(string_split(text, chr(10)),
                                         x -> trim(x) <> '') AS larr
                      FROM input)
            )
        ),
        blk AS (SELECT line FROM l GROUP BY line HAVING count(*) >= 3),
        kept AS (SELECT l.* FROM l ANTI JOIN blk USING (line)),
        agg AS (
            SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        ),
        tot AS (SELECT doc_id, count(*) AS n_total FROM l GROUP BY doc_id)
        SELECT i.doc_id AS doc_id,
               coalesce(a.text, '') AS text,
               coalesce(a.n_kept, 0) AS n_lines_kept,
               coalesce(t.n_total, 0) - coalesce(a.n_kept, 0) AS n_lines_removed
        FROM input i
        LEFT JOIN agg a USING (doc_id)
        LEFT JOIN tot t USING (doc_id)
    """
    oracles["heavy_hitters"] = """
        -- exact heavy hitters: the MG candidate pass is an internal
        -- pruning detail -- the contract is the exact integer cut over
        -- the identical bigram derivation (1-based slots both engines)
        WITH d AS (
            SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        bg AS (
            SELECT unnest([t[i+1] || ' ' || t[i+2]
                           FOR i IN range(greatest(len(t) - 1, 0))]) AS term
            FROM d
        ),
        t2 AS (SELECT term FROM bg WHERE length(term) > 1)
        SELECT term, count(*) AS n
        FROM t2
        GROUP BY term
        HAVING count(*) * 700 > (SELECT count(*) FROM t2)
    """
    oracles["repetition_stats"] = """
        -- independent relational derivation of the per-row fold
        -- semantics: full-window n-grams (repeats kept), top 2-gram =
        -- argmax by (count DESC, gram ASC), duplicated-line chars count
        -- every occurrence of a line seen > 1x; every fraction is one
        -- division of exact integers, so doubles match bit-for-bit
        WITH base AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               t -> t <> '') AS toks,
                   list_filter(string_split(text, chr(10)),
                               l -> trim(l) <> '') AS lines
            FROM documents
        ),
        g AS (
            SELECT doc_id, text, toks, lines,
                   CASE WHEN len(toks) >= 2 THEN
                       [toks[i+1] || ' ' || toks[i+2] FOR i IN range(len(toks)-1)]
                   ELSE [] END AS g2,
                   CASE WHEN len(toks) >= 3 THEN
                       [toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                        FOR i IN range(len(toks)-2)]
                   ELSE [] END AS g3
            FROM base
        ),
        topg AS (
            SELECT doc_id, gram, cnt FROM (
                SELECT doc_id, gram, count(*) AS cnt,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY count(*) DESC, gram ASC) AS rn
                FROM (SELECT doc_id, unnest(g2) AS gram FROM g) GROUP BY 1, 2
            ) WHERE rn = 1
        ),
        linestats AS (
            SELECT doc_id,
                   coalesce(sum(CASE WHEN cnt > 1 THEN cnt * length(line) END), 0) AS dupchars,
                   coalesce(sum(cnt * length(line)), 0) AS totchars
            FROM (
                SELECT doc_id, line, count(*) AS cnt
                FROM (SELECT doc_id, unnest(lines) AS line FROM g) GROUP BY 1, 2
            ) GROUP BY 1
        )
        SELECT g.doc_id AS doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct_tokens,
               CASE WHEN len(toks) > 0 THEN
                   CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS dup_token_frac,
               topg.gram AS top_gram,
               coalesce(topg.cnt, 0) AS top_gram_count,
               CASE WHEN length(g.text) > 0 AND topg.cnt IS NOT NULL THEN
                   CAST(topg.cnt * length(topg.gram) AS DOUBLE) / length(g.text)
               ELSE 0.0 END AS top_gram_char_frac,
               CASE WHEN len(g3) > 0 THEN
                   CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
               ELSE 0.0 END AS dup_gram_frac,
               CASE WHEN len(lines) > 0 THEN
                   CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines)
               ELSE 0.0 END AS dup_line_frac,
               CASE WHEN ls.totchars > 0 THEN
                   CAST(ls.dupchars AS DOUBLE) / ls.totchars
               ELSE 0.0 END AS dup_line_char_frac
        FROM g
        LEFT JOIN topg ON g.doc_id = topg.doc_id
        LEFT JOIN linestats ls ON g.doc_id = ls.doc_id
    """
    oracles["mixture_sample"] = """
        -- exact-proportion mixture: feasible T = floor(min(n/frac)),
        -- rounded DOWN to the lcm of the fraction denominators (4 for
        -- 1/2,1/4,1/4) so every quota = frac*T is integral and the
        -- output shares equal the targets EXACTLY; keep each stratum's
        -- quota of smallest Knuth hashes.  Dyadic fractions -> exact
        -- DOUBLE arithmetic (CAST needed: bare 0.5 is DECIMAL in
        -- DuckDB); the +m wrap mirrors Spark's pmod for negative keys.
        WITH tgt(lang, frac) AS (
            VALUES ('en', CAST(0.5 AS DOUBLE)),
                   ('es', CAST(0.25 AS DOUBLE)),
                   ('fr', CAST(0.25 AS DOUBLE))
        ),
        counts AS (
            SELECT d.lang, count(*) AS n FROM documents d
            JOIN tgt USING (lang) GROUP BY 1
        ),
        feas AS (
            SELECT (CAST(floor(min(c.n / g.frac)) AS BIGINT) // 4) * 4 AS t_total
            FROM counts c JOIN tgt g USING (lang)
        ),
        quota AS (
            SELECT g.lang, CAST(g.frac * f.t_total AS BIGINT) AS k
            FROM tgt g, feas f
        ),
        ranked AS (
            SELECT d.doc_id, d.lang,
                   row_number() OVER (
                       PARTITION BY d.lang
                       ORDER BY ((((d.doc_id % 2147483648) + 2147483648) % 2147483648)
                                 * 2654435761) % 4294967296 ASC,
                                d.doc_id ASC
                   ) AS rn
            FROM documents d JOIN quota USING (lang)
        )
        SELECT r.doc_id, r.lang
        FROM ranked r JOIN quota q USING (lang)
        WHERE r.rn <= q.k
    """
    oracles["semdedup"] = _semdedup_oracle_sql()
    oracles["dsir_select"] = """
        -- DSIR re-derived: same md5-prefix bucket hash (collisions are
        -- part of the model), same add-1 smoothing parenthesization,
        -- and the per-doc fold over bucket-sorted structs with a
        -- 0.0-prepended left-assoc list_reduce — the lm_quality float
        -- discipline, so the top-100 cut falls identically
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               t -> t <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id, lang,
                   unnest([t[i+1] FOR i IN range(len(t))]
                          || [t[i+1] || ' ' || t[i+2]
                              FOR i IN range(greatest(len(t) - 1, 0))]) AS g
            FROM toks
        ),
        b AS (
            SELECT doc_id, lang,
                   CAST('0x' || substring(md5(g), 1, 8) AS BIGINT) % 512 AS bucket
            FROM grams
        ),
        p AS (SELECT bucket, count(*) AS p_cnt FROM b WHERE lang = 'fr' GROUP BY 1),
        q AS (SELECT bucket, count(*) AS q_cnt FROM b GROUP BY 1),
        ptot AS (SELECT CAST(sum(p_cnt) AS DOUBLE) AS p_tot FROM p),
        qtot AS (SELECT CAST(sum(q_cnt) AS DOUBLE) AS q_tot FROM q),
        db AS (SELECT doc_id, bucket, count(*) AS cb FROM b GROUP BY 1, 2),
        scored AS (
            SELECT db.doc_id, db.bucket, db.cb,
                   (ln(coalesce(p.p_cnt, 0) + 1.0) - ln(ptot.p_tot + 512.0))
                 - (ln(coalesce(q.q_cnt, 0) + 1.0) - ln(qtot.q_tot + 512.0)) AS lam
            FROM db LEFT JOIN p USING (bucket) LEFT JOIN q USING (bucket), ptot, qtot
        ),
        per_doc AS (
            SELECT doc_id, sum(cb) AS n_grams,
                   list_reduce(
                       list_prepend(0.0,
                           [x.cb * x.lam FOR x IN
                            list_sort(list(struct_pack(
                                bucket := bucket,
                                cb := CAST(cb AS DOUBLE),
                                lam := lam)))]),
                       (acc, v2) -> acc + v2) AS log_weight
            FROM scored GROUP BY 1
        )
        SELECT d.doc_id, d.lang,
               CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
               coalesce(pd.log_weight, 0.0) AS log_weight
        FROM documents d LEFT JOIN per_doc pd USING (doc_id)
        ORDER BY log_weight DESC, d.doc_id ASC LIMIT 100
    """
    oracles["substr_spans"] = """
        -- ExactSubstr window-covering spans, integer-only: duplicated
        -- 5-token windows (grouped by gram STRING where Spark groups
        -- xxhash64 -- identical absent collisions), merged per doc via
        -- gaps-and-islands
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               t -> t <> '') AS t
            FROM documents
        ),
        g AS (
            SELECT doc_id, i AS pos, array_to_string(t[i+1:i+5], ' ') AS gram
            FROM toks, unnest(range(greatest(len(t) - 4, 0))) AS u(i)
        ),
        c AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2),
        f AS (SELECT g.doc_id, g.pos AS s, g.pos + 5 AS e FROM g JOIN c USING (gram)),
        m AS (
            SELECT doc_id, s, e,
                   max(e) OVER (PARTITION BY doc_id ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
            FROM f
        ),
        isl AS (
            SELECT doc_id, s, e,
                   sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s) AS grp
            FROM m
        )
        SELECT doc_id, min(s) AS tok_start, max(e) AS tok_end,
               count(*) AS n_windows
        FROM isl GROUP BY doc_id, grp
    """
    oracles["leakage_split"] = f"""
        -- cluster canonicals via the dedup_clusters recursive CTE over
        -- the same MinHash pairs; side = the shared ANSI knuth-hash
        -- spelling (fold mod 2^31 with +m wrap, * 2654435761, mod 2^32)
        -- of coalesce(canonical, doc_id) -- integer-only
        WITH RECURSIVE {{mh}},
        und AS (
            SELECT doc_a AS a, doc_b AS b FROM mh_pairs
            UNION
            SELECT doc_b, doc_a FROM mh_pairs
        ),
        reach AS (
            SELECT DISTINCT a AS node, a AS lbl FROM und
            UNION
            SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.node
        ),
        canon AS (SELECT node AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY 1)
        SELECT d.doc_id,
               coalesce(c.canonical_id, d.doc_id) AS split_key,
               CASE WHEN ((((coalesce(c.canonical_id, d.doc_id) % 2147483648)
                            + 2147483648) % 2147483648)
                          * 2654435761) % 4294967296 % 1000 < 250
                    THEN 'val' ELSE 'train' END AS split
        FROM documents d LEFT JOIN canon c USING (doc_id)
    """.format(mh=_MINHASH_PAIRS_CTE)
    oracles["triangles"] = """
        -- independent derivation: triangles enumerated the naive way
        -- (three-way join over canonical u<v edges, a<b<c), NOT via the
        -- degree orientation the Spark operator uses
        WITH po AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 4 = 0
        ),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM po a JOIN po b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e
            ) GROUP BY 1
        ),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        pn AS (
            SELECT node, count(*) AS nt
            FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY 1
        )
        SELECT d.node, d.deg,
               coalesce(pn.nt, 0) AS n_triangles,
               CASE WHEN d.deg >= 2
                    THEN 2.0 * coalesce(pn.nt, 0) / (d.deg * (d.deg - 1))
                    ELSE 0.0 END AS clustering
        FROM deg d LEFT JOIN pn USING (node)
    """
    oracles["shortest_hops"] = """
        -- bounded BFS as a recursive CTE over (node, hops) states:
        -- UNION dedup terminates cycles, the hop bound caps the walk,
        -- min(hops) per node is the BFS distance
        WITH RECURSIVE eo AS (
            SELECT 'o:' || o_orderkey AS src, 'c:' || o_custkey AS dst
            FROM orders WHERE o_orderkey % 20 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        ),
        und AS (
            SELECT src AS a, dst AS b FROM eo
            UNION
            SELECT dst, src FROM eo
        ),
        walk AS (
            SELECT 'n:0' AS node, 0 AS hops
            UNION
            SELECT u.b, w.hops + 1
            FROM walk w JOIN und u ON u.a = w.node
            WHERE w.hops < 3
        )
        SELECT node, min(hops) AS hops FROM walk GROUP BY 1
    """
    oracles["link_predict"] = """
        WITH po AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 8 = 0
        ),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM po a JOIN po b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e
            ) GROUP BY 1
        ),
        sym AS (
            SELECT u AS center, v AS nbr FROM e
            UNION ALL
            SELECT v, u FROM e
        ),
        pairs AS (
            SELECT x.nbr AS a, y.nbr AS b, count(*) AS common
            FROM sym x JOIN sym y
              ON x.center = y.center AND x.nbr < y.nbr
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        fresh AS (
            SELECT p.* FROM pairs p
            WHERE NOT EXISTS (
                SELECT 1 FROM e WHERE e.u = p.a AND e.v = p.b
            )
        )
        SELECT f.a, f.b, f.common, da.deg AS deg_a, db.deg AS deg_b,
               f.common / (da.deg + db.deg - f.common) AS jaccard
        FROM fresh f
        JOIN deg da ON da.node = f.a
        JOIN deg db ON db.node = f.b
    """
    oracles["winnow"] = """
        -- independent mechanism: window-function minima over exploded
        -- gram rows (Spark side uses per-row higher-order folds); the
        -- md5-prefix hash is engine-identical so the selection matches
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               t -> t <> '') AS t
            FROM documents
        ),
        g AS (
            SELECT doc_id, i AS pos,
                   CAST('0x' || substring(
                       md5(array_to_string(t[i+1:i+3], ' ')), 1, 12) AS BIGINT) AS gh
            FROM toks, unnest(range(greatest(len(t) - 2, 0))) AS u(i)
            WHERE len(t) >= 3
        ),
        w AS (
            SELECT doc_id, pos,
                   min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
                   count(*) OVER (PARTITION BY doc_id) AS ng
            FROM g
        )
        SELECT doc_id, fp AS fingerprint, min(pos) AS first_window
        FROM w WHERE pos <= greatest(ng - 4, 0)
        GROUP BY 1, 2
    """
    oracles["ppr"] = _ppr_oracle_sql(10)
    walk_steps = []
    for i in (1, 2, 3):
        walk_steps.append(f""",
        s{i} AS (
            SELECT s.start_node, s.walk, r.nbr AS cur
            FROM s{i - 1} s
            JOIN deg d ON d.node = s.cur
            JOIN rk r ON r.node = s.cur
             AND r.rk = CAST('0x' || substring(
                     md5(s.cur || ':' || {i} || ':' || s.walk || ':' || 0),
                     1, 12) AS BIGINT) % d.deg
        )""")
    oracles["random_walks"] = (
        """
        -- identical hash recurrence unrolled: dense-rank adjacency,
        -- md5-prefix pick hash, one CTE per step
        WITH po AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 4 = 0
        ),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM po a JOIN po b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        adj AS (
            SELECT u AS node, v AS nbr FROM e
            UNION
            SELECT v, u FROM e
        ),
        rk AS (
            SELECT node, nbr,
                   row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS rk
            FROM adj
        ),
        deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
        s0 AS (
            SELECT node AS start_node, 0 AS walk, node AS cur
            FROM (SELECT DISTINCT node FROM adj)
        )"""
        + "".join(walk_steps)
        + """
        SELECT start_node, walk, 0 AS step, cur AS node FROM s0
        UNION ALL SELECT start_node, walk, 1, cur FROM s1
        UNION ALL SELECT start_node, walk, 2, cur FROM s2
        UNION ALL SELECT start_node, walk, 3, cur FROM s3
    """
    )
    oracles["cooccur_pmi"] = """
        -- identical exact counts, identical fixed log expression tree
        -- ((ln n_co + ln N) - ln n_a - ln n_b), identical half-up grid
        WITH obs AS (
            SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
            WHERE l_orderkey % 4 = 0
        ),
        nc AS (SELECT CAST(count(DISTINCT g) AS DOUBLE) AS n FROM obs),
        ic AS (SELECT item, count(*) AS n_item FROM obs GROUP BY 1),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_co
            FROM obs a JOIN obs b ON a.g = b.g AND a.item < b.item
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        scored AS (
            SELECT p.item_a, p.item_b, p.n_co,
                   ia.n_item AS n_a, ib.n_item AS n_b, nc.n,
                   (ln(CAST(p.n_co AS DOUBLE)) + ln(nc.n))
                   - ln(CAST(ia.n_item AS DOUBLE))
                   - ln(CAST(ib.n_item AS DOUBLE)) AS pmi
            FROM pairs p
            JOIN ic ia ON ia.item = p.item_a
            JOIN ic ib ON ib.item = p.item_b
            CROSS JOIN nc
        )
        SELECT item_a, item_b, n_co, n_a, n_b,
               floor(pmi * 1000000 + 0.5) / 1000000 AS pmi6,
               floor(CASE WHEN CAST(n_co AS DOUBLE) = n THEN 1.0
                          ELSE pmi / (ln(n) - ln(CAST(n_co AS DOUBLE)))
                     END * 1000000 + 0.5) / 1000000 AS npmi6
        FROM scored
    """
    oracles["rdfs_entail"] = """
        -- ρdf stratified derivation, independently in SQL: recursive
        -- closures for the two hierarchies, then lift / domain / range /
        -- type-propagation joins (rules rdfs5,11,7,2,3,9), then distinct
        WITH RECURSIVE
        inst AS (
            SELECT 'c:' || c_custkey AS s, 'located_in' AS p,
                   'n:' || c_nationkey AS o
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT 'n:' || n_nationkey, 'rdf:type', 'Nation' FROM nation
        ),
        schema_rows AS (
            SELECT * FROM (VALUES
                ('located_in', 'rdfs:subPropertyOf', 'within'),
                ('within', 'rdfs:subPropertyOf', 'part_of'),
                ('Nation', 'rdfs:subClassOf', 'Territory'),
                ('Territory', 'rdfs:subClassOf', 'Geo'),
                ('located_in', 'rdfs:domain', 'Customer'),
                ('within', 'rdfs:range', 'Territory')
            ) AS t(s, p, o)
        ),
        prop_clo AS (
            SELECT s AS sub, o AS sup FROM schema_rows
            WHERE p = 'rdfs:subPropertyOf'
            UNION
            SELECT pc.sub, e.o FROM prop_clo pc
            JOIN schema_rows e
              ON e.p = 'rdfs:subPropertyOf' AND pc.sup = e.s
        ),
        class_clo AS (
            SELECT s AS sub, o AS sup FROM schema_rows
            WHERE p = 'rdfs:subClassOf'
            UNION
            SELECT cc.sub, e.o FROM class_clo cc
            JOIN schema_rows e
              ON e.p = 'rdfs:subClassOf' AND cc.sup = e.s
        ),
        lifted AS (
            SELECT i.s, pc.sup AS p, i.o FROM inst i
            JOIN prop_clo pc ON i.p = pc.sub
        ),
        g1 AS (SELECT * FROM inst UNION ALL SELECT * FROM lifted),
        typed_dom AS (
            SELECT g.s, 'rdf:type' AS p, d.o FROM g1 g
            JOIN schema_rows d ON d.p = 'rdfs:domain' AND g.p = d.s
        ),
        typed_rng AS (
            SELECT g.o AS s, 'rdf:type' AS p, r.o FROM g1 g
            JOIN schema_rows r ON r.p = 'rdfs:range' AND g.p = r.s
        ),
        types AS (
            SELECT s, p, o FROM g1 WHERE p = 'rdf:type'
            UNION ALL SELECT * FROM typed_dom
            UNION ALL SELECT * FROM typed_rng
        ),
        super_types AS (
            SELECT t.s, t.p, cc.sup AS o FROM types t
            JOIN class_clo cc ON t.o = cc.sub
        ),
        closed_schema AS (
            SELECT sub AS s, 'rdfs:subPropertyOf' AS p, sup AS o FROM prop_clo
            UNION ALL
            SELECT sub, 'rdfs:subClassOf', sup FROM class_clo
        )
        SELECT DISTINCT s, p, o FROM (
            SELECT * FROM inst
            UNION ALL SELECT * FROM schema_rows
            UNION ALL SELECT * FROM lifted
            UNION ALL SELECT * FROM typed_dom
            UNION ALL SELECT * FROM typed_rng
            UNION ALL SELECT * FROM super_types
            UNION ALL SELECT * FROM closed_schema
        )
    """
    oracles["sameas_resolve"] = """
        -- identity groups = reachability over the symmetric sameAs
        -- graph (recursive CTE), canonical = component min, rewrite =
        -- two left joins against the non-identity mapping slice
        WITH RECURSIVE
        cust AS (SELECT c_custkey AS k, c_nationkey AS nk FROM customer),
        nat AS (SELECT n_nationkey AS nk, n_name AS name FROM nation),
        inst AS (
            SELECT 'c:' || k AS s, 'located_in' AS p, 'n:' || nk AS o
            FROM cust WHERE k % 10 = 0
            UNION ALL
            SELECT 'dup:' || c.k, 'located_in', 'nname:' || n.name
            FROM cust c JOIN nat n ON c.nk = n.nk WHERE c.k % 20 = 0
            UNION ALL
            SELECT 'dup:' || k, 'type', 'Customer' FROM cust WHERE k % 20 = 0
            UNION ALL
            SELECT 'hq:' || nk, 'located_near', 'nname:' || name FROM nat
        ),
        sameas AS (
            SELECT 'dup:' || k AS src, 'c:' || k AS dst
            FROM cust WHERE k % 20 = 0
            UNION ALL
            SELECT 'dup2:' || k, 'dup:' || k FROM cust WHERE k % 40 = 0
            UNION ALL
            SELECT 'nname:' || name, 'n:' || nk FROM nat
        ),
        und AS (
            SELECT src AS a, dst AS b FROM sameas
            UNION
            SELECT dst, src FROM sameas
        ),
        reach AS (
            SELECT a AS node, b AS r FROM und
            UNION
            SELECT reach.node, e.b FROM reach JOIN und e ON reach.r = e.a
        ),
        m AS (
            SELECT node, canonical FROM (
                SELECT node, least(node, min(r)) AS canonical
                FROM reach GROUP BY node
            ) WHERE node <> canonical
        )
        SELECT DISTINCT
            coalesce(ms.canonical, i.s) AS s,
            i.p,
            coalesce(mo.canonical, i.o) AS o
        FROM inst i
        LEFT JOIN m ms ON i.s = ms.node
        LEFT JOIN m mo ON i.o = mo.node
    """
    oracles["shacl_violations"] = """
        -- same focus/count/value derivation in plain SQL: GROUP BY for
        -- cardinalities, anchored regexp for sh:pattern, NOT EXISTS
        -- against the type slice for sh:class
        WITH cust AS (
            SELECT c_custkey AS k, c_nationkey AS nk FROM customer
            WHERE c_custkey % 10 = 0
        ),
        nat AS (SELECT n_nationkey AS nk FROM nation),
        triples AS (
            SELECT 'c:' || k AS s, 'rdf:type' AS p, 'Customer' AS o FROM cust
            UNION ALL SELECT 'n:' || nk, 'rdf:type', 'Nation' FROM nat
            UNION ALL
            SELECT 'c:' || k, 'located_in', 'n:' || nk FROM cust WHERE k % 30 <> 0
            UNION ALL
            SELECT 'c:' || k, 'located_in', 'n:' || ((nk + 1) % 25)
            FROM cust WHERE k % 40 = 0
            UNION ALL
            SELECT 'c:' || k, 'located_in', 'x:' || k FROM cust WHERE k % 50 = 0
            UNION ALL
            SELECT 'c:' || k, 'email',
                   CASE WHEN k % 20 = 0 THEN 'bad'
                        ELSE 'u' || k || '@ex.com' END
            FROM cust
        ),
        shapes AS (
            SELECT * FROM (VALUES
                ('CustShape', 'Customer', 'located_in',
                 1, 1, CAST(NULL AS VARCHAR), 'Nation'),
                ('CustShape', 'Customer', 'email',
                 CAST(NULL AS INT), CAST(NULL AS INT),
                 '^[^@]+@[^@]+$', CAST(NULL AS VARCHAR))
            ) AS t(shape_id, target_class, path,
                   min_count, max_count, pattern, value_class)
        ),
        focus AS (
            SELECT t.s AS focus, sh.shape_id, sh.path, sh.min_count,
                   sh.max_count, sh.pattern, sh.value_class
            FROM triples t JOIN shapes sh
              ON t.p = 'rdf:type' AND t.o = sh.target_class
        ),
        counts AS (
            SELECT s AS focus, p AS path, count(*) AS n
            FROM triples GROUP BY 1, 2
        ),
        carded AS (
            SELECT f.focus, f.shape_id, f.path, f.min_count, f.max_count,
                   coalesce(c.n, 0) AS n
            FROM focus f
            LEFT JOIN counts c ON c.focus = f.focus AND c.path = f.path
            WHERE f.min_count IS NOT NULL OR f.max_count IS NOT NULL
        ),
        vals AS (
            SELECT DISTINCT f.focus, f.shape_id, f.path, f.pattern,
                   f.value_class, t.o
            FROM focus f
            JOIN triples t ON t.s = f.focus AND t.p = f.path
            WHERE f.pattern IS NOT NULL OR f.value_class IS NOT NULL
        )
        SELECT focus, shape_id, path, 'minCount' AS "constraint",
               CAST(n AS VARCHAR) AS actual
        FROM carded WHERE min_count IS NOT NULL AND n < min_count
        UNION ALL
        SELECT focus, shape_id, path, 'maxCount', CAST(n AS VARCHAR)
        FROM carded WHERE max_count IS NOT NULL AND n > max_count
        UNION ALL
        SELECT focus, shape_id, path, 'pattern', o
        FROM vals WHERE pattern IS NOT NULL AND NOT regexp_matches(o, pattern)
        UNION ALL
        SELECT v.focus, v.shape_id, v.path, 'class', v.o
        FROM vals v
        WHERE v.value_class IS NOT NULL AND NOT EXISTS (
            SELECT 1 FROM triples t
            WHERE t.s = v.o AND t.p = 'rdf:type' AND t.o = v.value_class
        )
    """
    oracles["bgp_match"] = """
        -- the BGP chain as a plain 3-way join; columns sorted by
        -- variable name (c, n, o) to match the matcher's contract
        SELECT 'c:' || c.c_custkey AS c,
               'n:' || n.n_nationkey AS n,
               'o:' || o.o_orderkey AS o
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderkey % 100 = 0 AND n.n_regionkey < 3
    """
    oracles["property_path"] = """
        -- placed_by / (located_in | in_state) / within* — the star's
        -- zero-length arm is the base pairs, its one-hop arm joins the
        -- nation->region slice; UNION gives the distinct path relation
        WITH oc AS (
            SELECT 'o:' || o_orderkey AS subj, 'c:' || o_custkey AS c
            FROM orders WHERE o_orderkey % 100 = 0
        ),
        cn AS (
            SELECT 'c:' || c_custkey AS c, 'n:' || c_nationkey AS n
            FROM customer
        ),
        nr AS (
            SELECT 'n:' || n_nationkey AS n, 'r:' || n_regionkey AS r
            FROM nation
        ),
        base AS (SELECT DISTINCT oc.subj, cn.n FROM oc JOIN cn ON oc.c = cn.c)
        SELECT subj, n AS obj FROM base
        UNION
        SELECT b.subj, nr.r FROM base b JOIN nr ON b.n = nr.n
    """
    oracles["ntriples_roundtrip"] = """
        -- the expected parse of the formatted lines IS the source
        -- relation: identity derivation, no NT machinery in the oracle
        SELECT 'part:' || p_partkey AS s,
               'hasName' AS p,
               'say "' || p_name || '"\\' || chr(10) || chr(9) || 'end' AS o,
               'literal' AS o_kind,
               CASE WHEN p_partkey % 40 = 0 THEN 'en' END AS lang,
               CAST(NULL AS VARCHAR) AS datatype
        FROM part WHERE p_partkey % 20 = 0
        UNION ALL
        SELECT 'part:' || p_partkey, 'hasBrand', 'brand:' || p_brand,
               'iri', NULL, NULL
        FROM part WHERE p_partkey % 20 = 0
    """
    oracles["resolve_entities"] = """
        -- the ER pipeline re-derived: token lists, stop-token-capped
        -- blocks, pair join, EXACT Jaccard (i*5 >= 4*u — same integer
        -- cross-multiplication as the engine), recursive components,
        -- totality via left join
        WITH RECURSIVE
        recs AS (
            SELECT 'b:' || c_custkey AS id,
                   'cust ' || c_custkey || ' alpha beta' AS name
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT 'v:' || c_custkey,
                   'cust ' || c_custkey || ' alpha beta gamma'
            FROM customer WHERE c_custkey % 20 = 0
            UNION ALL
            SELECT 'd:' || c_custkey, 'cust ' || c_custkey || ' delta'
            FROM customer WHERE c_custkey % 30 = 0
        ),
        toks AS (
            SELECT id, list_distinct(string_split(name, ' ')) AS t FROM recs
        ),
        blocks AS (SELECT id, unnest(t) AS tok FROM toks),
        keep AS (SELECT tok FROM blocks GROUP BY tok HAVING count(*) <= 50),
        kb AS (SELECT b.id, b.tok FROM blocks b JOIN keep k ON b.tok = k.tok),
        pairs AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM kb a JOIN kb b ON a.tok = b.tok AND a.id < b.id
        ),
        scored AS (
            SELECT p.id_a, p.id_b,
                   len(list_intersect(ta.t, tb.t)) AS i,
                   len(list_distinct(list_concat(ta.t, tb.t))) AS u
            FROM pairs p
            JOIN toks ta ON ta.id = p.id_a
            JOIN toks tb ON tb.id = p.id_b
        ),
        edges AS (SELECT id_a, id_b FROM scored WHERE i * 5 >= 4 * u),
        und AS (
            SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b, id_a FROM edges
        ),
        reach AS (
            SELECT a AS node, b AS r FROM und
            UNION
            SELECT reach.node, e.b FROM reach JOIN und e ON reach.r = e.a
        ),
        canon AS (
            SELECT node, least(node, min(r)) AS canonical
            FROM reach GROUP BY node
        )
        SELECT r.id AS node_id, coalesce(c.canonical, r.id) AS canonical_id
        FROM recs r LEFT JOIN canon c ON c.node = r.id
    """
    oracles["kg_publish"] = """
        -- L52 resolution CTEs feeding the rdfs rule arms (the schema's
        -- two hierarchies are single edges, so their strict closures
        -- are the schema rows themselves), then the predicate profile
        WITH RECURSIVE
        cust AS (SELECT c_custkey AS k, c_nationkey AS nk FROM customer),
        nat AS (SELECT n_nationkey AS nk, n_name AS name FROM nation),
        inst AS (
            SELECT 'c:' || k AS s, 'located_in' AS p, 'n:' || nk AS o
            FROM cust WHERE k % 10 = 0
            UNION ALL
            SELECT 'dup:' || c.k, 'located_in', 'nname:' || n.name
            FROM cust c JOIN nat n ON c.nk = n.nk WHERE c.k % 20 = 0
            UNION ALL
            SELECT 'dup:' || k, 'type', 'Customer' FROM cust WHERE k % 20 = 0
            UNION ALL
            SELECT 'hq:' || nk, 'located_near', 'nname:' || name FROM nat
        ),
        sameas AS (
            SELECT 'dup:' || k AS src, 'c:' || k AS dst
            FROM cust WHERE k % 20 = 0
            UNION ALL
            SELECT 'dup2:' || k, 'dup:' || k FROM cust WHERE k % 40 = 0
            UNION ALL
            SELECT 'nname:' || name, 'n:' || nk FROM nat
        ),
        und AS (
            SELECT src AS a, dst AS b FROM sameas
            UNION
            SELECT dst, src FROM sameas
        ),
        reach AS (
            SELECT a AS node, b AS r FROM und
            UNION
            SELECT reach.node, e.b FROM reach JOIN und e ON reach.r = e.a
        ),
        m AS (
            SELECT node, canonical FROM (
                SELECT node, least(node, min(r)) AS canonical
                FROM reach GROUP BY node
            ) WHERE node <> canonical
        ),
        resolved AS (
            SELECT DISTINCT
                coalesce(ms.canonical, i.s) AS s,
                i.p,
                coalesce(mo.canonical, i.o) AS o
            FROM inst i
            LEFT JOIN m ms ON i.s = ms.node
            LEFT JOIN m mo ON i.o = mo.node
        ),
        schema_rows AS (
            SELECT * FROM (VALUES
                ('located_in', 'rdfs:subPropertyOf', 'within'),
                ('within', 'rdfs:domain', 'Customer'),
                ('within', 'rdfs:range', 'Place'),
                ('Customer', 'rdfs:subClassOf', 'Party')
            ) AS t(s, p, o)
        ),
        lifted AS (
            SELECT s, 'within' AS p, o FROM resolved WHERE p = 'located_in'
        ),
        g1 AS (SELECT * FROM resolved UNION ALL SELECT * FROM lifted),
        typed_dom AS (
            SELECT s, 'type' AS p, 'Customer' AS o FROM g1 WHERE p = 'within'
        ),
        typed_rng AS (
            SELECT o AS s, 'type' AS p, 'Place' AS o FROM g1 WHERE p = 'within'
        ),
        types AS (
            SELECT s, p, o FROM g1 WHERE p = 'type'
            UNION ALL SELECT * FROM typed_dom
            UNION ALL SELECT * FROM typed_rng
        ),
        super_types AS (
            SELECT s, p, 'Party' AS o FROM types WHERE o = 'Customer'
        ),
        entailed AS (
            SELECT DISTINCT s, p, o FROM (
                SELECT * FROM resolved
                UNION ALL SELECT * FROM schema_rows
                UNION ALL SELECT * FROM lifted
                UNION ALL SELECT * FROM typed_dom
                UNION ALL SELECT * FROM typed_rng
                UNION ALL SELECT * FROM super_types
            )
        )
        SELECT p, count(*) AS n FROM entailed GROUP BY p
    """
    oracles["negative_samples"] = """
        -- negatives re-minted: md5-ordered pool ranks, md5-prefix pick
        -- hash per (triple, i, side), original-entity drop, filtered
        -- anti-join — entity-for-entity identical to the engine
        WITH pos AS (
            SELECT DISTINCT 'c:' || c_custkey AS s, 'located_in' AS p,
                   'n:' || c_nationkey AS o
            FROM customer WHERE c_custkey % 10 = 0
        ),
        pool AS (
            SELECT ent, row_number() OVER (ORDER BY md5(ent), ent) - 1 AS rk
            FROM (SELECT s AS ent FROM pos UNION SELECT o FROM pos)
        ),
        nn AS (SELECT count(*) AS n FROM pool),
        arms AS (
            SELECT * FROM (VALUES
                ('subject', 0), ('subject', 1), ('object', 0), ('object', 1)
            ) AS t(side, i)
        ),
        picked AS (
            SELECT pos.s, pos.p, pos.o, a.side, a.i, pl.ent AS repl
            FROM pos CROSS JOIN arms a CROSS JOIN nn
            JOIN pool pl ON pl.rk = CAST('0x' || substring(
                md5(pos.s || ':' || pos.p || ':' || pos.o || ':'
                    || a.i || ':' || a.side || ':' || 0),
                1, 12) AS BIGINT) % nn.n
        ),
        cand AS (
            SELECT CASE WHEN side = 'subject' THEN repl ELSE s END AS s,
                   p,
                   CASE WHEN side = 'object' THEN repl ELSE o END AS o,
                   i AS neg_idx, side AS corrupted
            FROM picked
            WHERE (side = 'subject' AND repl <> s)
               OR (side = 'object' AND repl <> o)
        )
        SELECT c.s, c.p, c.o, c.neg_idx, c.corrupted FROM cand c
        WHERE NOT EXISTS (
            SELECT 1 FROM pos p2
            WHERE p2.s = c.s AND p2.p = c.p AND p2.o = c.o
        )
    """
    oracles["bgp_optional"] = """
        -- OPTIONAL = LEFT JOIN of the type slice onto the chain;
        -- the filter keeps nulls or the matching type
        SELECT 'c:' || c.c_custkey AS c,
               'n:' || c.c_nationkey AS n,
               'o:' || o.o_orderkey AS o,
               t.t AS t
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN (
            SELECT n_nationkey, 'Nation' AS t FROM nation WHERE n_regionkey < 3
        ) t ON c.c_nationkey = t.n_nationkey
        WHERE o.o_orderkey % 100 = 0
          AND (t.t IS NULL OR t.t = 'Nation')
    """
    oracles["charsets"] = """
        -- same two-level aggregation: per-subject sorted predicate
        -- set + triple count, then per-set subject/triple totals
        WITH t AS (
            SELECT 'c:' || c_custkey AS s, 'nation' AS p FROM customer
            UNION ALL
            SELECT 'c:' || c_custkey, 'segment' FROM customer
            WHERE c_custkey % 2 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'phone' FROM customer
            WHERE c_custkey % 5 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'nation' FROM customer
            WHERE c_custkey % 10 = 0
        ),
        per_s AS (
            SELECT s, list_sort(list(DISTINCT p)) AS predicates,
                   count(*) AS nt
            FROM t GROUP BY s
        )
        SELECT predicates, count(*) AS n_subjects,
               CAST(sum(nt) AS BIGINT) AS n_triples
        FROM per_s GROUP BY predicates
    """
    oracles["dict_encode"] = """
        -- same id contract: dense rank of each term in the sorted
        -- distinct-term universe, then three dictionary joins
        WITH t AS (
            SELECT 'c:' || c_custkey AS s, 'nation' AS p,
                   'n:' || c_nationkey AS o
            FROM customer
            UNION ALL
            SELECT 'c:' || c_custkey, 'segment', c_mktsegment
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT DISTINCT 'n:' || c_nationkey, 'type', 'Nation'
            FROM customer
        ),
        terms AS (
            SELECT DISTINCT term FROM (
                SELECT s AS term FROM t
                UNION ALL SELECT p FROM t
                UNION ALL SELECT o FROM t
            )
        ),
        dict AS (
            SELECT term, row_number() OVER (ORDER BY term) - 1 AS id
            FROM terms
        )
        SELECT ds.id AS s_id, dp.id AS p_id, do_.id AS o_id
        FROM t
        JOIN dict ds ON t.s = ds.term
        JOIN dict dp ON t.p = dp.term
        JOIN dict do_ ON t.o = do_.term
    """
    oracles["void_stats"] = """
        -- same per-predicate partition statistics
        WITH t AS (
            SELECT 'c:' || c_custkey AS s, 'nation' AS p,
                   'n:' || c_nationkey AS o
            FROM customer
            UNION ALL
            SELECT 'c:' || c_custkey, 'rdf:type', 'Customer' FROM customer
            UNION ALL
            SELECT 'c:' || c_custkey, 'segment', c_mktsegment
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT DISTINCT 'n:' || c_nationkey, 'rdf:type', 'Nation'
            FROM customer
        )
        SELECT p, count(*) AS n_triples,
               count(DISTINCT s) AS n_subjects,
               count(DISTINCT o) AS n_objects
        FROM t GROUP BY p
    """
    oracles["quotient_graph"] = """
        -- same quotient: per-subject charset classes, endpoint joins,
        -- empty leaf class, summary-edge counts
        WITH t AS (
            SELECT 'c:' || c_custkey AS s, 'nation' AS p,
                   'n:' || c_nationkey AS o
            FROM customer
            UNION ALL
            SELECT 'c:' || c_custkey, 'rdf:type', 'Customer' FROM customer
            UNION ALL
            SELECT 'c:' || c_custkey, 'segment', c_mktsegment
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT DISTINCT 'n:' || c_nationkey, 'rdf:type', 'Nation'
            FROM customer
        ),
        cs AS (
            SELECT s, list_sort(list(DISTINCT p)) AS cset FROM t GROUP BY s
        )
        SELECT c1.cset AS src_set, t.p,
               coalesce(c2.cset, CAST([] AS VARCHAR[])) AS dst_set,
               count(*) AS n_triples
        FROM t
        JOIN cs c1 ON t.s = c1.s
        LEFT JOIN cs c2 ON t.o = c2.s
        GROUP BY 1, 2, 3
    """
    oracles["bisim"] = """
        -- identical two-round refinement, identical canonical
        -- serialization (US-joined records, RS-joined sorted sets)
        WITH t AS MATERIALIZED (
            SELECT 'c:' || c_custkey AS s, 'nation' AS p,
                   'n:' || c_nationkey AS o
            FROM customer
            UNION ALL
            SELECT 'c:' || c_custkey, 'segment', c_mktsegment
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT DISTINCT 'n:' || c_nationkey, 'rdf:type', 'Nation'
            FROM customer WHERE c_nationkey % 2 = 0
        ),
        nodes AS MATERIALIZED (
            SELECT s AS node FROM t UNION SELECT o FROM t
        ),
        c0 AS (SELECT node, md5('') AS cls FROM nodes),
        s1 AS (
            SELECT t.s,
                   md5(array_to_string(
                       list_sort(list(DISTINCT t.p || chr(31) || c.cls)),
                       chr(30))) AS cls
            FROM t JOIN c0 c ON t.o = c.node GROUP BY t.s
        ),
        c1 AS MATERIALIZED (
            SELECT n.node, coalesce(s1.cls, md5('')) AS cls
            FROM nodes n LEFT JOIN s1 ON n.node = s1.s
        ),
        s2 AS (
            SELECT t.s,
                   md5(array_to_string(
                       list_sort(list(DISTINCT t.p || chr(31) || c.cls)),
                       chr(30))) AS cls
            FROM t JOIN c1 c ON t.o = c.node GROUP BY t.s
        )
        SELECT n.node, coalesce(s2.cls, md5('')) AS cls
        FROM nodes n LEFT JOIN s2 ON n.node = s2.s
    """
    oracles["reify"] = """
        -- same mint: md5 over unit-separator-joined terms, same four
        -- projections, DISTINCT
        WITH t AS (
            SELECT 'c:' || c_custkey AS s, 'nation' AS p,
                   'n:' || c_nationkey AS o
            FROM customer
        ),
        b AS (
            SELECT 'stmt:' || md5(s || chr(31) || p || chr(31) || o)
                       AS node,
                   s, p, o
            FROM t
        )
        SELECT DISTINCT s, p, o FROM (
            SELECT node AS s, 'rdf:type' AS p, 'rdf:Statement' AS o FROM b
            UNION ALL
            SELECT node, 'rdf:subject', s FROM b
            UNION ALL
            SELECT node, 'rdf:predicate', p FROM b
            UNION ALL
            SELECT node, 'rdf:object', o FROM b
        )
    """
    oracles["bgp_construct"] = """
        -- same CONSTRUCT: solutions via join + LEFT JOIN, template
        -- fan-out as UNION of projections, null instantiations dropped
        WITH sol AS (
            SELECT 'c:' || c.c_custkey AS cc,
                   'n:' || c.c_nationkey AS nn,
                   CASE WHEN n.n_nationkey IS NOT NULL
                        THEN 'r:' || n.n_regionkey END AS rr
            FROM customer c
            LEFT JOIN nation n
              ON n.n_nationkey = c.c_nationkey
             AND n.n_nationkey % 2 = 0
        )
        SELECT nn AS s, 'hasMember' AS p, cc AS o FROM sol
        UNION
        SELECT cc, 'inRegion', rr FROM sol WHERE rr IS NOT NULL
    """
    oracles["owl_entail"] = """
        -- same fragment: transitive closure of `within`, every pair
        -- mirrored under `contains`, schema rows kept, DISTINCT
        WITH RECURSIVE base AS (
            SELECT 'c:' || c_custkey AS s, 'n:' || c_nationkey AS o
            FROM customer WHERE c_custkey % 4 = 0
            UNION ALL
            SELECT DISTINCT 'n:' || n_nationkey, 'r:' || n_regionkey
            FROM nation
        ),
        clo AS (
            SELECT s, o FROM base
            UNION ALL
            SELECT c.s, b.o FROM clo c JOIN base b ON c.o = b.s
        ),
        pairs AS (SELECT DISTINCT s, o FROM clo)
        SELECT s, 'within' AS p, o FROM pairs
        UNION
        SELECT o, 'contains', s FROM pairs
        UNION
        SELECT 'within', 'rdf:type', 'owl:TransitiveProperty'
        UNION
        SELECT 'within', 'owl:inverseOf', 'contains'
    """
    oracles["flatten_lists"] = """
        -- same cells, same walk as a recursive CTE
        WITH RECURSIVE li AS (
            SELECT l_orderkey AS ok, l_partkey,
                   row_number() OVER (
                       PARTITION BY l_orderkey ORDER BY l_linenumber
                   ) AS rn,
                   count(*) OVER (PARTITION BY l_orderkey) AS cnt
            FROM lineitem WHERE l_orderkey % 100 = 0
        ),
        f AS (
            SELECT 'cons:' || ok || ':' || rn AS node,
                   'p:' || l_partkey AS item
            FROM li
        ),
        r AS (
            SELECT 'cons:' || ok || ':' || rn AS node,
                   CASE WHEN rn < cnt
                        THEN 'cons:' || ok || ':' || (rn + 1)
                        ELSE 'rdf:nil' END AS nxt
            FROM li
        ),
        heads AS (
            SELECT node FROM (
                SELECT node FROM f UNION SELECT node FROM r
            ) WHERE node NOT IN (SELECT nxt FROM r)
        ),
        walk AS (
            SELECT node AS head, node, 0 AS pos FROM heads
            UNION ALL
            SELECT w.head, r.nxt, w.pos + 1
            FROM walk w JOIN r ON w.node = r.node
            WHERE r.nxt <> 'rdf:nil'
        )
        SELECT w.head, w.pos, f.item
        FROM walk w JOIN f ON w.node = f.node
    """
    oracles["closure_insert"] = """
        -- recompute equality: full recursive closure over E ∪ ΔE,
        -- grouped to min depth (shortcuts shorten existing pairs)
        WITH RECURSIVE edges AS (
            SELECT 'o:' || o_orderkey AS child, 'c:' || o_custkey AS parent
            FROM orders WHERE o_orderkey % 200 = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
            UNION ALL
            SELECT 'o:' || o.o_orderkey, 'n:' || c.c_nationkey
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderkey % 400 = 0
        ),
        closure AS (
            SELECT child AS descendant, parent AS ancestor, 1 AS depth
            FROM edges
            UNION ALL
            SELECT cl.descendant, e.parent, cl.depth + 1
            FROM closure cl JOIN edges e ON cl.ancestor = e.child
        )
        SELECT descendant, ancestor, CAST(min(depth) AS INT) AS depth
        FROM closure GROUP BY 1, 2
    """
    oracles["coalesce_intervals"] = """
        -- identical gaps-and-islands: running-max end over strictly
        -- preceding rows, island = running count of openings
        WITH iv AS (
            SELECT 'c:' || o_custkey AS s, 'active' AS p,
                   o_orderpriority AS o,
                   date_diff('day', TIMESTAMP '1990-01-01', o_orderdate)
                       AS vf,
                   date_diff('day', TIMESTAMP '1990-01-01', o_orderdate)
                       + 30 AS vt
            FROM orders
        ),
        m AS (
            SELECT s, p, o, vf, vt,
                   max(vt) OVER (
                       PARTITION BY s, p, o ORDER BY vf, vt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS pme
            FROM iv
        ),
        isl AS (
            SELECT s, p, o, vf, vt,
                   sum(CASE WHEN pme IS NULL OR vf > pme THEN 1 ELSE 0 END)
                       OVER (
                           PARTITION BY s, p, o ORDER BY vf, vt
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW
                       ) AS island
            FROM m
        )
        SELECT s, p, o,
               min(vf) AS valid_from, max(vt) AS valid_to,
               count(*) AS n_merged
        FROM isl GROUP BY s, p, o, island
    """
    oracles["conflict_resolution"] = """
        -- same election: set-semantics claims, summed support per
        -- (s,p,o), window argmax with ascending-object tie-break
        WITH claims AS (
            SELECT DISTINCT 'c:' || o_custkey AS s, 'priority' AS p,
                   o_orderpriority AS o,
                   'clerk:' || (o_orderkey % 7) AS source
            FROM orders
        ),
        support AS (
            SELECT s, p, o, CAST(count(*) AS DOUBLE) AS support
            FROM claims GROUP BY s, p, o
        ),
        slot AS (
            SELECT s, p, o, support,
                   sum(support) OVER (PARTITION BY s, p) AS total_support,
                   count(*) OVER (PARTITION BY s, p) AS n_values,
                   row_number() OVER (
                       PARTITION BY s, p
                       ORDER BY support DESC, o ASC
                   ) AS rk
            FROM support
        )
        SELECT s, p, o, support, total_support, n_values,
               support / total_support AS confidence
        FROM slot WHERE rk = 1
    """
    lpa_rounds = []
    for i in (1, 2, 3):
        lpa_rounds.append(f""",
        c{i} AS (
            SELECT e2.b AS node, l.label, count(*) AS c
            FROM und e2 JOIN l{i - 1} l ON e2.a = l.node
            GROUP BY 1, 2
        ),
        l{i} AS (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (
                           PARTITION BY node ORDER BY c DESC, label
                       ) AS rn
                FROM c{i}
            ) WHERE rn = 1
        )""")
    oracles["label_propagation"] = (
        """
        -- identical sync recurrence unrolled, same total tie-break
        WITH po AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 4 = 0
        ),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM po a JOIN po b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        und AS (
            SELECT u AS a, v AS b FROM e
            UNION
            SELECT v, u FROM e
        ),
        l0 AS (SELECT DISTINCT a AS node, a AS label FROM und)"""
        + "".join(lpa_rounds)
        + """
        SELECT node, label FROM l3
    """
    )
    oracles["bgp_union"] = """
        -- two BGP branches with differing domains: NULL-padded UNION,
        -- then DISTINCT (the engine's set semantics)
        SELECT DISTINCT * FROM (
            SELECT 'c:' || c.c_custkey AS c,
                   'n:' || n.n_nationkey AS n,
                   'o:' || o.o_orderkey AS o
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderkey % 100 = 0
            UNION ALL
            SELECT CAST(NULL AS VARCHAR), 'n:' || n_nationkey,
                   CAST(NULL AS VARCHAR)
            FROM nation WHERE n_regionkey < 3
        )
    """
    oracles["bgp_minus"] = """
        -- SPARQL MINUS semantics spelled out: remove a solution iff some
        -- minus-solution is compatible on a NON-EMPTY shared domain
        -- (NULL shared vars drop out of the domain)
        WITH b1 AS (
            SELECT 'c:' || c.c_custkey AS c, 'n:' || n.n_nationkey AS n,
                   CAST(NULL AS VARCHAR) AS n2, 'o:' || o.o_orderkey AS o
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderkey % 100 = 0
        ),
        b2 AS (
            SELECT CAST(NULL AS VARCHAR) AS c, CAST(NULL AS VARCHAR) AS n,
                   'n:' || n_nationkey AS n2, CAST(NULL AS VARCHAR) AS o
            FROM nation WHERE n_regionkey < 3
        ),
        sols AS (
            SELECT DISTINCT * FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
        ),
        minus_rel AS (
            SELECT 'c:' || c_custkey AS mc, 'n:' || c_nationkey AS mn
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_regionkey < 3
        )
        SELECT c, n, n2, o FROM sols s
        WHERE NOT EXISTS (
            SELECT 1 FROM minus_rel m
            WHERE (s.c IS NULL OR s.c = m.mc)
              AND (s.n IS NULL OR s.n = m.mn)
              AND (s.c IS NOT NULL OR s.n IS NOT NULL)
        )
    """
    oracles["bgp_aggregate"] = """
        -- chain + OPTIONAL type as LEFT JOIN; count(t) skips NULLs like
        -- SPARQL COUNT(?t); SAMPLE pinned to MIN; HAVING after the agg
        SELECT 'n:' || n.n_nationkey AS n,
               count(*) AS n_sols,
               count(t.o) AS n_typed,
               count(DISTINCT 'c:' || c.c_custkey) AS n_custs,
               min('c:' || c.c_custkey) AS sample_c
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN (
            SELECT 'n:' || n_nationkey AS s, 'Nation' AS o
            FROM nation WHERE n_regionkey < 3
        ) t ON t.s = 'n:' || n.n_nationkey
        WHERE o.o_orderkey % 100 = 0
        GROUP BY 1 HAVING count(*) >= 3
    """
    oracles["describe"] = """
        -- CBD = seed out-triples + transitive blank-node closure:
        -- recursive reachability restricted to '_:' objects, then one
        -- join for the payload
        WITH RECURSIVE triples AS (
            SELECT 'c:' || c_custkey AS s, 'located_in' AS p,
                   'n:' || c_nationkey AS o FROM customer
            UNION ALL
            SELECT 'c:' || c_custkey, 'address', '_:a' || c_custkey FROM customer
            UNION ALL
            SELECT '_:a' || c_custkey, 'street', 'street ' || c_custkey FROM customer
            UNION ALL
            SELECT '_:a' || c_custkey, 'geo', '_:g' || c_custkey
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT '_:g' || c_custkey, 'lat', 'lat' || c_custkey
            FROM customer WHERE c_custkey % 3 = 0
        ),
        reach AS (
            SELECT 'c:' || c_custkey AS node FROM customer WHERE c_custkey % 10 = 0
            UNION
            SELECT t.o FROM reach r JOIN triples t ON t.s = r.node
            WHERE starts_with(t.o, '_:')
        )
        SELECT t.s, t.p, t.o FROM triples t JOIN reach r ON t.s = r.node
    """
    oracles["wu_palmer"] = """
        -- LCA elected by row_number over (depth DESC, anc DESC) — the
        -- relational spelling of the engine's max(struct) aggregate;
        -- wup = 2*lca_depth / (depth_a + depth_b), exact small-int
        -- division (bit-identical cross-engine)
        WITH cn AS (
            SELECT c_custkey AS k, c_nationkey AS nk, n_regionkey AS rk
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey % 100 = 0
        ),
        anc AS (
            SELECT 'c:' || k AS node, 'c:' || k AS anc, 4 AS d FROM cn
            UNION ALL SELECT 'c:' || k, 'n:' || nk, 3 FROM cn
            UNION ALL SELECT 'c:' || k, 'r:' || rk, 2 FROM cn
            UNION ALL SELECT 'c:' || k, 'root', 1 FROM cn
            UNION ALL SELECT 'n:' || n_nationkey, 'n:' || n_nationkey, 3 FROM nation
            UNION ALL SELECT 'n:' || n_nationkey, 'r:' || n_regionkey, 2 FROM nation
            UNION ALL SELECT 'n:' || n_nationkey, 'root', 1 FROM nation
        ),
        pairs AS (
            SELECT DISTINCT * FROM (
                SELECT 'c:' || x.k AS a, 'c:' || y.k AS b FROM cn x, cn y
                UNION ALL
                SELECT 'c:' || x.k, 'n:' || y.nk FROM cn x, cn y
            )
        ),
        common AS (
            SELECT p.a, p.b, aa.anc, aa.d,
                   row_number() OVER (
                       PARTITION BY p.a, p.b ORDER BY aa.d DESC, aa.anc DESC
                   ) AS rn
            FROM pairs p
            JOIN anc aa ON aa.node = p.a
            JOIN anc ab ON ab.node = p.b AND ab.anc = aa.anc
        ),
        self_d AS (SELECT node, d FROM anc WHERE node = anc)
        SELECT cm.a, cm.b, cm.anc AS lca, cm.d AS lca_depth,
               sa.d AS depth_a, sb.d AS depth_b,
               2.0 * cm.d / (sa.d + sb.d) AS wup
        FROM common cm
        JOIN self_d sa ON sa.node = cm.a
        JOIN self_d sb ON sb.node = cm.b
        WHERE cm.rn = 1
    """
    oracles["bpe_pairs"] = """
        -- weighted adjacent-symbol pairs over the word-frequency table:
        -- per-word char positions via generate_series, terminal symbol
        -- forced to </w> (the paper's end-of-word marker)
        WITH words AS (
            SELECT w AS word, count(*) AS cnt FROM (
                SELECT unnest(string_split_regex(text, '\\s+')) AS w
                FROM documents
            ) WHERE w <> '' GROUP BY w
        ),
        sym AS (
            SELECT word, cnt,
                   unnest(generate_series(1, length(word))) AS i
            FROM words
        )
        SELECT substr(word, i, 1) AS "left",
               CASE WHEN i < length(word) THEN substr(word, i + 1, 1)
                    ELSE '</w>' END AS "right",
               CAST(sum(cnt) AS BIGINT) AS pair_count
        FROM sym GROUP BY 1, 2
    """
    oracles["pca_covariance"] = """
        -- population covariance E[xy] - E[x]E[y] per coordinate pair,
        -- values CAST to double BEFORE the product (the kernel's
        -- float64 widening), half-up 1e-6 grid
        WITH ex AS (
            SELECT vec_id, CAST(pos AS INT) AS pos, CAST(val AS DOUBLE) AS val
            FROM (
                SELECT vec_id, unnest(embedding) AS val,
                       unnest(range(len(embedding))) AS pos
                FROM embeddings
            ) WHERE pos < 16
        )
        SELECT a.pos AS i, b.pos AS j,
               floor((sum(a.val * b.val) / count(*)
                      - avg(a.val) * avg(b.val)) * 1e6 + 0.5) / 1e6 AS cov6
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id
        GROUP BY 1, 2
    """
    # minted-URL fixture shared by url_normalize / domain_stats: the
    # oracle mints the same raw strings but derives the CANONICAL form
    # independently from the CASE arms (no regexp re-implementation)
    minted_urls_cte = """
        minted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN NULL ELSE
                     (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
                     || '://' || source
                     || (CASE WHEN doc_id % 2 = 0 THEN '.example.com'
                              ELSE '.example.org' END)
                     || (CASE WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
                     || (CASE WHEN doc_id % 11 = 0 THEN '/'
                              ELSE '/p/' || (doc_id % 50) END)
                     || (CASE WHEN doc_id % 5 IN (0, 1) THEN '?a=1&b=2'
                              ELSE '' END)
                   END AS url_norm,
                   CASE WHEN doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 2 = 0 THEN 'example.com'
                        ELSE 'example.org' END AS domain
            FROM documents
        )
    """
    oracles["url_normalize"] = f"""
        WITH {minted_urls_cte}
        SELECT doc_id, url_norm, domain FROM minted
    """
    oracles["domain_stats"] = f"""
        WITH {minted_urls_cte}
        SELECT domain,
               count(*) AS n_rows,
               count(DISTINCT url_norm) AS n_urls,
               count(*) - count(DISTINCT url_norm) AS n_dup_rows
        FROM minted GROUP BY 1
    """
    # BPE merge replay: symbols serialized with a single chr(31) fence
    # at each end and a DOUBLE fence between symbols, so SQL replace's
    # left-to-right non-overlapping scan IS the paper's simultaneous
    # merge pass (adjacent and overlapping occurrences included)
    _s = "chr(31)"
    _d = "chr(31) || chr(31)"

    def _merge_step(prev: str, left: str, right: str) -> str:
        pat = f"{_s} || '{left}' || {_d} || '{right}' || {_s}"
        rep = f"{_s} || '{left}{right}' || {_s}"
        return f"SELECT cnt, replace(s, {pat}, {rep}) AS s FROM {prev}"

    oracles["bpe_merged_pairs"] = f"""
        WITH words AS (
            SELECT w AS word, count(*) AS cnt FROM (
                SELECT unnest(string_split_regex(text, '\\s+')) AS w
                FROM documents
            ) WHERE w <> '' GROUP BY w
        ),
        enc AS (
            SELECT cnt,
                   {_s} || array_to_string(
                       list_append(
                           [substr(word, i + 1, 1) FOR i IN range(length(word))],
                           '</w>'
                       ), {_d}
                   ) || {_s} AS s
            FROM words
        ),
        m1 AS ({_merge_step('enc', 'e', '</w>')}),
        m2 AS ({_merge_step('m1', 't', 'h')}),
        m3 AS ({_merge_step('m2', 'th', 'e</w>')}),
        syms AS (
            SELECT cnt,
                   string_split(substr(s, 2, length(s) - 2), {_d}) AS t
            FROM m3
        ),
        pairs AS (
            SELECT cnt,
                   unnest([t[i + 1] FOR i IN range(greatest(len(t) - 1, 0))]) AS l,
                   unnest([t[i + 2] FOR i IN range(greatest(len(t) - 1, 0))]) AS r
            FROM syms
        )
        SELECT l AS "left", r AS "right", CAST(sum(cnt) AS BIGINT) AS pair_count
        FROM pairs GROUP BY 1, 2
    """
    zterms = " + ".join(
        f"((l_partkey >> {b}) & 1) * {1 << (2 * b)} + "
        f"((l_suppkey >> {b}) & 1) * {1 << (2 * b + 1)}"
        for b in range(16)
    )
    oracles["zorder_key"] = f"""
        -- Morton interleave as explicit bit arithmetic (32 terms)
        SELECT l_orderkey, l_partkey, l_suppkey,
               CAST({zterms} AS BIGINT) AS zkey
        FROM lineitem WHERE l_orderkey % 50 = 0
    """
    oracles["cube_revenue"] = """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS n_rows,
               CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """
    oracles["session_window"] = """
        -- independent gap-sessionization: lag -> strict-gap flag ->
        -- running session id; window end = last event + gap ([start,
        -- end) half-open, so a gap of EXACTLY 60min would split --
        -- hence the strict <, matching the operator's contract)
        WITH t AS (
            SELECT 'conv-' || lpad(CAST(doc_id % 64 AS VARCHAR), 6, '0') AS conv_id,
                   TIMESTAMP '2026-01-01 00:00:00'
                     + INTERVAL ((doc_id // 64) * 10
                                 + ((doc_id // 64) // 5) * 120) MINUTE AS ts
            FROM documents
        ),
        flagged AS (
            SELECT conv_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY conv_id ORDER BY ts)
                             < INTERVAL 60 MINUTE
                        THEN 0 ELSE 1 END AS new_sess
            FROM t
        ),
        sess AS (
            SELECT conv_id, ts,
                   sum(new_sess) OVER (
                       PARTITION BY conv_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM flagged
        )
        SELECT conv_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 60 MINUTE AS session_end,
               count(*) AS n_turns
        FROM sess GROUP BY conv_id, sid
    """
    # the native-recursion query shares the closure fixture: same
    # recursion in DuckDB (and the iterative operator checks against
    # the same rows via the `closure` oracle)
    oracles["recursive_cte"] = oracles["closure"]
    oracles["bgp_reordered"] = oracles["bgp_match"]
    oracles["dag_levels"] = """
        -- longest path from any source, via all source-rooted walks
        WITH RECURSIVE e AS (
            SELECT 'c:' || c_custkey AS u, 'n:' || c_nationkey AS v
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
            UNION ALL
            SELECT 'r:' || n_regionkey, 'root' FROM nation GROUP BY 1
            UNION ALL
            SELECT 'c:' || c.c_custkey, 'r:' || n.n_regionkey
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE c.c_custkey % 20 = 0
        ),
        nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
        sources AS (
            SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM e)
        ),
        walk AS (
            SELECT n AS node, 0 AS lvl FROM sources
            UNION ALL
            SELECT e.v, w.lvl + 1 FROM walk w JOIN e ON e.u = w.node
        )
        SELECT node, CAST(max(lvl) AS INT) AS level FROM walk GROUP BY node
    """
    oracles["scc"] = """
        -- mutual reachability over the reflexive closure, min-labeled
        WITH RECURSIVE e AS (
            SELECT 'c:' || c_custkey AS u, 'n:' || c_nationkey AS v
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT 'n:' || n_nationkey, 'n:' || ((n_nationkey + 5) % 25)
            FROM nation
        ),
        r AS (
            SELECT u, v FROM e
            UNION
            SELECT r.u, e.v FROM r JOIN e ON r.v = e.u
        ),
        nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
        refl AS (
            SELECT u, v FROM r
            UNION
            SELECT n, n FROM nodes
        ),
        mutual AS (
            SELECT a.u, a.v FROM refl a JOIN refl b ON a.u = b.v AND a.v = b.u
        )
        SELECT u AS node, min(v) AS component FROM mutual GROUP BY u
    """
    oracles["bgp_exists"] = """
        SELECT 'c:' || c.c_custkey AS c,
               'n:' || n.n_nationkey AS n,
               'o:' || o.o_orderkey AS o
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderkey % 100 = 0
          AND NOT EXISTS (
              SELECT 1 FROM nation t
              WHERE t.n_regionkey < 3
                AND 'n:' || t.n_nationkey = 'n:' || n.n_nationkey
          )
    """
    oracles["bgp_values"] = """
        -- VALUES rows: (n = n:1, c UNDEF) OR (c = c:10, n UNDEF)
        SELECT 'c:' || c.c_custkey AS c,
               'n:' || n.n_nationkey AS n,
               'o:' || o.o_orderkey AS o
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderkey % 100 = 0
          AND ('n:' || n.n_nationkey = 'n:1' OR 'c:' || c.c_custkey = 'c:10')
    """
    oracles["bgp_quads"] = """
        -- GRAPH ?g { ?c located_in ?n . ?n rdf:type Nation }: both
        -- patterns in the SAME graph; only t0 carries type rows
        SELECT 'c:' || c.c_custkey AS c,
               't' || (c.c_custkey % 3) AS g,
               'n:' || n.n_nationkey AS n
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_custkey % 3 = 0 AND n.n_regionkey < 3
    """
    oracles["robust_outliers"] = """
        -- median/MAD with the same interpolating percentile; fence
        -- count over exact comparisons
        WITH med AS (
            SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
            FROM lineitem GROUP BY 1
        ),
        mad AS (
            SELECT li.l_returnflag,
                   quantile_cont(abs(li.l_extendedprice - m.med), 0.5) AS mad,
                   any_value(m.med) AS med
            FROM lineitem li JOIN med m USING (l_returnflag)
            GROUP BY 1
        ),
        fence AS (
            SELECT li.l_returnflag,
                   CAST(sum(CASE WHEN abs(li.l_extendedprice - d.med) > 3 * d.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM lineitem li JOIN mad d USING (l_returnflag)
            GROUP BY 1
        )
        SELECT d.l_returnflag,
               floor(d.med * 1e6 + 0.5) / 1e6 AS med6,
               floor(d.mad * 1e6 + 0.5) / 1e6 AS mad6,
               f.n_outliers
        FROM mad d JOIN fence f USING (l_returnflag)
    """
    oracles["skew_stats"] = """
        WITH counts AS (
            SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1
        ),
        summary AS (
            SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows, max(n) AS max_n,
                   max(n) * count(*) / CAST(sum(n) AS DOUBLE) AS hot_factor
            FROM counts
        ),
        top AS (
            SELECT o_custkey AS hot_key, n AS hot_n FROM counts
            ORDER BY n DESC, o_custkey LIMIT 3
        )
        SELECT hot_key, hot_n, n_keys, n_rows, max_n, hot_factor
        FROM top, summary
    """
    oracles["ewma"] = """
        -- same dyadic closed form: e_t = (P_t + x_0) / 2^(t+1),
        -- P_t = running sum of x_i * 2^i — exact doubles, no grid
        WITH t AS (
            SELECT 'conv-' || lpad(CAST(doc_id % 64 AS VARCHAR), 6, '0') AS conv_id,
                   CAST(doc_id // 64 AS INT) AS turn_idx,
                   CAST(length(text) AS DOUBLE) AS chars
            FROM documents
        ),
        idx AS (
            SELECT conv_id, turn_idx, chars,
                   CAST(row_number() OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                   ) - 1 AS INT) AS i
            FROM t
        ),
        pre AS (
            SELECT conv_id, turn_idx, chars, i,
                   sum(chars * pow(2.0, i)) OVER (
                       PARTITION BY conv_id ORDER BY i
                       ROWS UNBOUNDED PRECEDING
                   ) AS p,
                   first_value(chars) OVER (
                       PARTITION BY conv_id ORDER BY i
                       ROWS UNBOUNDED PRECEDING
                   ) AS x0
            FROM idx
        )
        SELECT conv_id, turn_idx, chars,
               (p + x0) / pow(2.0, i + 1) AS ewma
        FROM pre
    """
    oracles["text_normalize"] = (
        """
        -- independent Unicode implementation: utf8proc (DuckDB) vs
        -- Python unicodedata must agree byte-for-byte
        WITH raw AS (
            SELECT p_partkey,
                   '<p>' || p_name || ' Café <b>Zürich</b> Å</p>' AS t
            FROM part WHERE p_partkey % 10 = 0
        ),
        clean AS (
            SELECT p_partkey,
                   nfc_normalize(
                       regexp_replace(t, '</?[A-Za-z][^>]*>', '', 'g')
                   ) AS nfc_text
            FROM raw
        )
        SELECT p_partkey, nfc_text, strip_accents(nfc_text) AS folded
        FROM clean
    """
    )
    oracles["property_path_neg"] = """
        -- arm 1: placed_by / !(in_state) / within (even-custkey slice);
        -- arm 2: !(^(located_in|within|placed_by)) = reversed in_state
        SELECT DISTINCT subj, obj FROM (
            SELECT 'o:' || o.o_orderkey AS subj, 'r:' || n.n_regionkey AS obj
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderkey % 100 = 0 AND c.c_custkey % 2 = 0
            UNION ALL
            SELECT 'n:' || c_nationkey, 'c:' || c_custkey
            FROM customer WHERE c_custkey % 2 = 1
        )
    """
    oracles["variant_extract"] = """
        -- extraction must be the identity on what was serialized
        SELECT o_orderkey, o_totalprice,
               o_orderkey % 7 AS tag7, o_orderkey % 3 AS tag3
        FROM orders WHERE o_orderkey % 20 = 0
    """
    oracles["xml_roundtrip"] = """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 40 = 0
    """
    oracles["lateral_topk"] = """
        -- independent mechanism: window row_number, not LATERAL
        SELECT c_custkey, o_orderkey, o_totalprice FROM (
            SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
                   row_number() OVER (
                       PARTITION BY c.c_custkey
                       ORDER BY o.o_totalprice DESC, o.o_orderkey
                   ) AS rn
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey % 10 = 0
        ) WHERE rn <= 2
    """
    oracles["histogram"] = """
        -- identical floor((x - lo)/w) expression tree, sentinel
        -- buckets 0 / n+1 for out-of-range
        SELECT l_returnflag,
               CAST(CASE WHEN l_extendedprice < 0.0 THEN 0
                         WHEN l_extendedprice >= 0.0 + 5000.0 * 20 THEN 21
                         ELSE floor((l_extendedprice - 0.0) / 5000.0) + 1
                    END AS INT) AS bucket,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1, 2
    """
    oracles["corr_stats"] = """
        SELECT l_returnflag,
               floor(corr(l_extendedprice, l_quantity) * 1e6 + 0.5) / 1e6 AS corr6,
               floor(covar_samp(l_extendedprice, l_quantity) * 1e6 + 0.5) / 1e6 AS covar6,
               floor(stddev_samp(l_quantity) * 1e6 + 0.5) / 1e6 AS sd_qty6,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1
    """
    oracles["json_roundtrip"] = """
        -- the lossless-roundtrip law: the oracle is the source relation
        SELECT o_orderkey, o_custkey, o_totalprice,
               o_orderkey % 7 AS tag7, o_orderkey % 3 AS tag3
        FROM orders WHERE o_orderkey % 20 = 0
    """
    # L164: both retrieval pipelines' own oracle SQL nested verbatim as
    # CTEs — the metrics layer is checked on top of already-checked rows
    oracles["retrieval_metrics"] = f"""
        WITH pred AS ({oracles['knn_lsh']}),
        truth AS ({oracles['knn_bruteforce']}),
        t AS (SELECT query_id AS q, neighbor_id AS i
              FROM truth WHERE rank <= 3),
        nrel AS (SELECT q, CAST(count(*) AS BIGINT) AS n_rel
                 FROM t GROUP BY 1),
        p AS (SELECT query_id AS q, neighbor_id AS i, rank AS r
              FROM pred WHERE rank <= 3),
        hit AS (SELECT p.q, CAST(count(*) AS BIGINT) AS hits,
                       min(p.r) AS first
                FROM p JOIN t ON p.q = t.q AND p.i = t.i GROUP BY 1)
        SELECT nrel.q AS query_id, nrel.n_rel,
               coalesce(hit.hits, 0) AS hits,
               CAST(coalesce(hit.hits, 0) AS DOUBLE) / 3.0
                   AS "precision",
               CASE WHEN nrel.n_rel > 0 THEN
                   CAST(coalesce(hit.hits, 0) AS DOUBLE)
                   / CAST(nrel.n_rel AS DOUBLE) END AS recall,
               CASE WHEN hit.first IS NOT NULL THEN
                   1.0 / CAST(hit.first AS DOUBLE) END AS rr
        FROM nrel LEFT JOIN hit ON nrel.q = hit.q
    """
    oracles["classification_report"] = """
        WITH e AS (
            SELECT event_type AS y,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS p
            FROM events
        ),
        cells AS (
            SELECT y, p, count(*) AS o FROM e
            WHERE y IS NOT NULL AND p IS NOT NULL GROUP BY 1, 2
        ),
        classes AS (
            SELECT y AS label FROM cells
            UNION
            SELECT p FROM cells
        ),
        nt AS (SELECT y AS label, CAST(sum(o) AS BIGINT) AS n_true
               FROM cells GROUP BY 1),
        np_ AS (SELECT p AS label, CAST(sum(o) AS BIGINT) AS n_pred
                FROM cells GROUP BY 1),
        tp AS (SELECT y AS label, CAST(o AS BIGINT) AS tp
               FROM cells WHERE y = p)
        SELECT c.label,
               coalesce(nt.n_true, 0) AS n_true,
               coalesce(np_.n_pred, 0) AS n_pred,
               coalesce(tp.tp, 0) AS tp,
               CASE WHEN coalesce(np_.n_pred, 0) > 0 THEN
                   CAST(coalesce(tp.tp, 0) AS DOUBLE)
                   / CAST(np_.n_pred AS DOUBLE) END AS "precision",
               CASE WHEN coalesce(nt.n_true, 0) > 0 THEN
                   CAST(coalesce(tp.tp, 0) AS DOUBLE)
                   / CAST(nt.n_true AS DOUBLE) END AS recall,
               CASE WHEN coalesce(nt.n_true, 0)
                        + coalesce(np_.n_pred, 0) > 0 THEN
                   CAST(2 * coalesce(tp.tp, 0) AS DOUBLE)
                   / CAST(coalesce(nt.n_true, 0)
                          + coalesce(np_.n_pred, 0) AS DOUBLE)
               END AS f1
        FROM classes c
        LEFT JOIN nt ON c.label = nt.label
        LEFT JOIN np_ ON c.label = np_.label
        LEFT JOIN tp ON c.label = tp.label
    """
    oracles["edit_join"] = """
        WITH v AS (SELECT DISTINCT p_name AS a FROM part)
        SELECT x.a AS a, y.a AS b,
               CAST(levenshtein(x.a, y.a) AS INT) AS dist
        FROM v x JOIN v y
          ON lower(substr(x.a, 1, 2)) = lower(substr(y.a, 1, 2))
        WHERE x.a < y.a
          AND abs(length(x.a) - length(y.a)) <= 3
          AND levenshtein(x.a, y.a) <= 3
    """
    oracles["jaro_join"] = """
        WITH v AS (SELECT DISTINCT p_name AS a FROM part)
        SELECT x.a AS a, y.a AS b,
               jaro_winkler_similarity(x.a, y.a) AS sim
        FROM v x JOIN v y
          ON lower(substr(x.a, 1, 2)) = lower(substr(y.a, 1, 2))
        WHERE x.a < y.a
          AND jaro_winkler_similarity(x.a, y.a) >= 0.9
    """
    # L221 NDCG@5: the discount weights 1/log2(d+1) are the SAME python
    # floats the Spark operator embeds as literals; the fold is spelled
    # left-assoc term by term so both engines round identically
    import math as _math

    _ndcg_k = 5
    _ndcg_dcg = "0.0"
    _ndcg_idcg = "0.0"
    for _d in range(1, _ndcg_k + 1):
        _w = repr(1.0 / _math.log2(_d + 1))
        _ndcg_dcg = (
            f"({_ndcg_dcg} + {_w} * "
            f"CAST(coalesce(p{_d}, 0) AS DOUBLE))"
        )
        _ndcg_idcg = (
            f"({_ndcg_idcg} + {_w} * "
            f"CAST(coalesce(t{_d}, 0) AS DOUBLE))"
        )
    _ndcg_pivot_p = ",\n                   ".join(
        f"max(CASE WHEN r = {d} THEN gv END) AS p{d}"
        for d in range(1, _ndcg_k + 1)
    )
    _ndcg_pivot_t = ",\n                   ".join(
        f"max(CASE WHEN rn = {d} THEN g END) AS t{d}"
        for d in range(1, _ndcg_k + 1)
    )
    oracles["ndcg"] = f"""
        WITH o AS (
            SELECT o_custkey AS q, o_orderkey AS i, o_totalprice AS p
            FROM orders WHERE o_custkey % 10 = 0
        ),
        pred AS (
            SELECT q, i,
                   row_number() OVER (PARTITION BY q
                                      ORDER BY p DESC, i) AS r
            FROM o
        ),
        t AS (SELECT q, i, CAST(i % 4 AS BIGINT) AS g FROM o),
        j AS (
            SELECT pred.q, pred.r, coalesce(t.g, 0) AS gv
            FROM pred LEFT JOIN t ON pred.q = t.q AND pred.i = t.i
            WHERE pred.r <= {_ndcg_k}
        ),
        dside AS (
            SELECT q, {_ndcg_pivot_p}
            FROM j GROUP BY q
        ),
        ti AS (
            SELECT q, g,
                   row_number() OVER (PARTITION BY q
                                      ORDER BY g DESC, i) AS rn
            FROM t
        ),
        iside AS (
            SELECT q,
                   CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_rel,
                   {_ndcg_pivot_t}
            FROM ti GROUP BY q
        )
        SELECT q AS query_id, n_rel,
               {_ndcg_dcg} AS dcg,
               {_ndcg_idcg} AS idcg,
               CASE WHEN {_ndcg_idcg} > 0.0
                    THEN {_ndcg_dcg} / {_ndcg_idcg} END AS ndcg
        FROM dside JOIN iside USING (q)
    """
    # L227/L228: compositions — nest the L152/L151 oracles verbatim as
    # CTEs so the shared machinery can never drift between the pair
    oracles["v_measure"] = f"""
        WITH m AS ({oracles["mutual_info"]})
        SELECT n, mi, h_x AS h_label, h_y AS h_cluster,
               CASE WHEN h_x > 0.0 THEN mi / h_x ELSE 1.0 END
                   AS homogeneity,
               CASE WHEN h_y > 0.0 THEN mi / h_y ELSE 1.0 END
                   AS completeness,
               CASE WHEN (CASE WHEN h_x > 0.0 THEN mi / h_x
                               ELSE 1.0 END)
                         + (CASE WHEN h_y > 0.0 THEN mi / h_y
                                 ELSE 1.0 END) > 0.0
                    THEN (2.0 * (CASE WHEN h_x > 0.0 THEN mi / h_x
                                      ELSE 1.0 END)
                          * (CASE WHEN h_y > 0.0 THEN mi / h_y
                                  ELSE 1.0 END))
                         / ((CASE WHEN h_x > 0.0 THEN mi / h_x
                                  ELSE 1.0 END)
                            + (CASE WHEN h_y > 0.0 THEN mi / h_y
                                    ELSE 1.0 END))
                    ELSE 0.0 END AS v_measure
        FROM m
    """
    oracles["ljung_box"] = f"""
        WITH a AS ({oracles["acf"]}),
        g AS (
            SELECT bucket, n,
                   CAST(count(*) AS BIGINT) AS m,
                   CAST(sum(CASE WHEN r IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS bad,
                   list_sort(list(struct_pack(lag := lag, r := r)))
                       AS lv
            FROM a GROUP BY 1, 2
        )
        SELECT bucket, n, m,
               CASE WHEN bad = 0
                    THEN (CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) + 2.0))
                         * list_reduce(
                               list_prepend(0.0,
                                   [(s.r * s.r)
                                    / (CAST(n AS DOUBLE)
                                       - CAST(s.lag AS DOUBLE))
                                    FOR s IN lv]),
                               (acc, t) -> acc + t)
               END AS q,
               m AS dof
        FROM g
    """
    oracles["hodges_lehmann"] = """
        -- doubled Walsh sums stay exact DECIMAL; median an exact
        -- order statistic; the /2 (odd) and /4 (even average)
        -- halvings are exactly rounded in DOUBLE
        WITH base AS (
            SELECT user_id, CAST(value AS DECIMAL(18,4)) AS v
            FROM events WHERE user_id < 40 AND value IS NOT NULL
        ),
        idx AS (
            SELECT user_id, v,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY v) AS i
            FROM base
        ),
        nn AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1
        ),
        w AS (
            SELECT a.user_id, a.v + b.v AS w2
            FROM idx a JOIN idx b
              ON a.user_id = b.user_id AND a.i <= b.i
        ),
        s AS (
            SELECT user_id, list_sort(list(w2)) AS s
            FROM w GROUP BY 1
        )
        SELECT nn.user_id, nn.n,
               CAST(len(s) AS BIGINT) AS n_pairs,
               CASE WHEN len(s) > 0 THEN
                   CASE WHEN len(s) % 2 = 1
                        THEN CAST(s[CAST(floor(len(s) / 2) + 1
                                         AS INTEGER)] AS DOUBLE) / 2.0
                        ELSE CAST(s[CAST(floor((len(s) + 1) / 2)
                                         AS INTEGER)]
                                  + s[CAST(floor(len(s) / 2) + 1
                                           AS INTEGER)] AS DOUBLE)
                             / 4.0 END
               END AS hl
        FROM s JOIN nn USING (user_id)
    """
    oracles["ordinal_panel"] = """
        -- the kendall_tau grid machinery with level counts; four
        -- single-division trees over the exact pair counts
        WITH base AS (
            SELECT l_returnflag AS flag,
                   CAST(floor(l_quantity) AS BIGINT) AS x,
                   CAST(floor(l_extendedprice / 5000) AS BIGINT) AS y
            FROM lineitem
            WHERE l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL
        ),
        pts AS (
            SELECT flag, x, y, CAST(count(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2, 3
        ),
        grid AS (
            SELECT dx.flag, dx.x, dy.y, coalesce(p.c, 0) AS c
            FROM (SELECT DISTINCT flag, x FROM pts) dx
            JOIN (SELECT DISTINCT flag, y FROM pts) dy
              USING (flag)
            LEFT JOIN pts p
              ON p.flag = dx.flag AND p.x = dx.x AND p.y = dy.y
        ),
        g1 AS (
            SELECT flag, x, y, c,
                   sum(c) OVER (PARTITION BY flag, x ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS r
            FROM grid
        ),
        g2 AS (
            SELECT flag, x, y, c, r,
                   sum(r) OVER (PARTITION BY flag, y ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS p,
                   sum(c) OVER (PARTITION BY flag, y ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cy
            FROM g1
        ),
        rowtot AS (
            SELECT flag, x,
                   coalesce(sum(tx) OVER (PARTITION BY flag
                       ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS txb
            FROM (SELECT flag, x, max(r) AS tx FROM g1
                  GROUP BY 1, 2)
        ),
        sums AS (
            SELECT g2.flag,
                   CAST(sum(g2.c) AS BIGINT) AS n,
                   CAST(sum(g2.c * (g2.p - g2.r - g2.cy + g2.c))
                        AS BIGINT) AS conc,
                   CAST(sum(g2.c * (rowtot.txb - (g2.p - g2.r)))
                        AS BIGINT) AS disc
            FROM g2 JOIN rowtot USING (flag, x)
            GROUP BY 1
        ),
        n1 AS (
            SELECT flag,
                   CAST(sum(CAST(t AS HUGEINT) * (t - 1))
                        AS HUGEINT) // 2 AS n1,
                   CAST(count(*) AS BIGINT) AS r
            FROM (SELECT flag, x, CAST(sum(c) AS BIGINT) AS t
                  FROM pts GROUP BY 1, 2)
            GROUP BY 1
        ),
        n2 AS (
            SELECT flag,
                   CAST(sum(CAST(t AS HUGEINT) * (t - 1))
                        AS HUGEINT) // 2 AS n2,
                   CAST(count(*) AS BIGINT) AS c
            FROM (SELECT flag, y, CAST(sum(c) AS BIGINT) AS t
                  FROM pts GROUP BY 1, 2)
            GROUP BY 1
        ),
        dens AS (
            SELECT s.flag, s.n, s.conc, s.disc, n1.r AS r, n2.c AS c,
                   (CAST(s.n AS HUGEINT) * (s.n - 1)) // 2
                       - n1.n1 AS da,
                   (CAST(s.n AS HUGEINT) * (s.n - 1)) // 2
                       - n2.n2 AS db
            FROM sums s JOIN n1 USING (flag) JOIN n2 USING (flag)
        )
        SELECT flag, n,
               CAST(conc AS DOUBLE) AS concordant,
               CAST(disc AS DOUBLE) AS discordant,
               CASE WHEN CAST(conc + disc AS DOUBLE) > 0
                    THEN CAST(conc - disc AS DOUBLE)
                         / CAST(conc + disc AS DOUBLE)
               END AS gamma,
               CASE WHEN CAST(da AS DOUBLE) > 0
                    THEN CAST(conc - disc AS DOUBLE)
                         / CAST(da AS DOUBLE)
               END AS somers_d_yx,
               CASE WHEN CAST(db AS DOUBLE) > 0
                    THEN CAST(conc - disc AS DOUBLE)
                         / CAST(db AS DOUBLE)
               END AS somers_d_xy,
               CASE WHEN CAST(least(r, c) AS DOUBLE) >= 2 AND n > 0
                    THEN (2.0 * CAST(least(r, c) AS DOUBLE)
                          * CAST(conc - disc AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                            * (CAST(least(r, c) AS DOUBLE) - 1.0))
               END AS tau_c
        FROM dens
    """
    # L241/L242: the FS log-weights are computed from the SAME tuple
    # literals the query passes; the soundex text is the same builder
    # output (DuckDB just needs the 'g' regexp flag)
    import math as _m

    from lmss_entity_extractor_spark.ops.phonetic import soundex_sql as _sx

    _fs_cases = []
    for _field, (_mm, _uu) in _FS_PARAMS.items():
        _wa = repr(_m.log(_mm / _uu))
        _wd = repr(_m.log((1.0 - _mm) / (1.0 - _uu)))
        _fs_cases.append(
            f"CASE WHEN agree_{_field} IS NULL THEN 0.0 "
            f"WHEN agree_{_field} THEN {_wa} ELSE {_wd} END"
        )
    _fs_chain = "0.0"
    for _c in _fs_cases:
        _fs_chain = f"({_fs_chain} + {_c})"
    oracles["fellegi_sunter"] = f"""
        WITH pairs AS (
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                   a.p_brand = b.p_brand AS agree_brand,
                   a.p_type = b.p_type AS agree_type,
                   a.p_size = b.p_size AS agree_size
            FROM part a JOIN part b ON a.p_partkey + 1 = b.p_partkey
        )
        SELECT id_a, id_b, agree_brand, agree_type, agree_size,
               {_fs_chain} AS fs_weight
        FROM pairs
    """
    oracles["soundex"] = f"""
        SELECT {_sx('p_name', ", 'g'")} AS soundex,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT p_name) AS BIGINT) AS n_names
        FROM part GROUP BY 1
    """
    oracles["cvm"] = """
        -- cross-multiplied exact integer ECDF gaps; bounded fold
        WITH pts AS (
            SELECT user_id % 2 AS bucket,
                   CAST(floor(value) AS BIGINT) AS v,
                   event_type AS g,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
            GROUP BY 1, 2, 3
        ),
        vals AS (
            SELECT bucket, v,
                   CAST(sum(CASE WHEN g = 'click' THEN c ELSE 0 END)
                        AS BIGINT) AS la,
                   CAST(sum(CASE WHEN g = 'view' THEN c ELSE 0 END)
                        AS BIGINT) AS lb
            FROM pts GROUP BY 1, 2
        ),
        pre AS (
            SELECT bucket, v, la + lb AS l,
                   CAST(sum(la) OVER w_p AS BIGINT) AS ca,
                   CAST(sum(lb) OVER w_p AS BIGINT) AS cb,
                   CAST(sum(la) OVER w_a AS BIGINT) AS na,
                   CAST(sum(lb) OVER w_a AS BIGINT) AS nb
            FROM vals
            WINDOW w_p AS (PARTITION BY bucket ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                   w_a AS (PARTITION BY bucket)
        ),
        cells AS (
            SELECT bucket, v, na, nb,
                   CAST(l AS DOUBLE)
                   * (CAST(CAST(ca * nb - cb * na AS DECIMAL(38,0))
                           AS DOUBLE)
                      * CAST(CAST(ca * nb - cb * na AS DECIMAL(38,0))
                             AS DOUBLE)) AS t
            FROM pre
        ),
        agg AS (
            SELECT bucket, na, nb,
                   list_reduce(list_prepend(0.0,
                       [s.t FOR s IN list_sort(list(struct_pack(
                           v := v, t := t)))]),
                       (acc, x) -> acc + x) AS s
            FROM cells GROUP BY 1, 2, 3
        )
        SELECT bucket, na AS n_a, nb AS n_b, na + nb AS n,
               CASE WHEN na > 0 AND nb > 0
                    THEN s / (CAST(na + nb AS DOUBLE)
                              * CAST(na + nb AS DOUBLE)
                              * CAST(na AS DOUBLE)
                              * CAST(nb AS DOUBLE))
               END AS t
        FROM agg
    """
    oracles["hoover"] = """
        -- cross-multiplied exact decimal deviations; ONE division
        WITH base AS (
            SELECT c_mktsegment AS seg,
                   CAST(greatest(c_acctbal, 0) AS DECIMAL(18,2)) AS x
            FROM customer WHERE c_acctbal IS NOT NULL
        ),
        stats AS (
            SELECT seg, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS DECIMAL(18,2)) AS s
            FROM base GROUP BY 1
        ),
        dev AS (
            SELECT b.seg, st.n, st.s,
                   abs(CAST(st.n AS DECIMAL(38,2))
                       * CAST(b.x AS DECIMAL(38,2))
                       - CAST(st.s AS DECIMAL(38,2))) AS d
            FROM base b JOIN stats st ON b.seg = st.seg
        )
        SELECT seg, n, CAST(s AS DOUBLE) AS total,
               CASE WHEN s > 0
                    THEN CAST(sum(d) AS DOUBLE)
                         / (2.0 * CAST(n AS DOUBLE)
                            * CAST(s AS DOUBLE))
               END AS hoover
        FROM dev GROUP BY 1, 2, 3, s
    """
    oracles["jarque_bera"] = """
        -- exact integer micro-unit power sums (HUGEINT twin of the
        -- Spark DECIMAL(38,0) sums); one fixed IEEE moment tree
        WITH q AS (
            SELECT o_orderpriority AS pri,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS HUGEINT) AS q
            FROM orders WHERE o_totalprice IS NOT NULL
        ),
        agg AS (
            SELECT pri, CAST(count(*) AS BIGINT) AS n,
                   sum(q) AS s1, sum(q*q) AS s2,
                   sum(q*q*q) AS s3, sum(q*q*q*q) AS s4
            FROM q GROUP BY 1
        ),
        m AS (
            SELECT pri, n,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mq,
                   CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                   CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                   CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
            FROM agg
        ),
        c AS (
            SELECT pri, n, mq,
                   r2 - mq*mq AS m2,
                   r3 - 3.0*mq*r2 + 2.0*mq*mq*mq AS m3,
                   r4 - 4.0*mq*r3 + 6.0*mq*mq*r2
                      - 3.0*mq*mq*mq*mq AS m4
            FROM m
        ),
        g AS (
            SELECT pri, n, mq, m2,
                   m3 / (m2 * sqrt(m2)) AS skew,
                   m4 / (m2 * m2) - 3.0 AS ex_kurt
            FROM c
        )
        SELECT pri, n, mq / 100.0 AS mean,
               CASE WHEN n >= 2 AND m2 > 0.0 THEN skew END AS skew,
               CASE WHEN n >= 2 AND m2 > 0.0 THEN ex_kurt
                    END AS ex_kurt,
               CASE WHEN n >= 2 AND m2 > 0.0
                    THEN CAST(n AS DOUBLE) / 6.0
                         * (skew*skew + ex_kurt*ex_kurt / 4.0)
               END AS jb
        FROM g
    """
    oracles["inequality"] = """
        -- exact cells; bounded ln folds (the L257 discipline)
        WITH cells AS (
            SELECT c_mktsegment AS seg,
                   CAST(c_acctbal AS DECIMAL(18,2)) AS v,
                   CAST(count(*) AS BIGINT) AS c
            FROM customer
            WHERE c_acctbal IS NOT NULL AND c_acctbal > 0
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT seg, CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k,
                   sum(v * c) AS s,
                   list_sort(list(struct_pack(v := v, c := c))) AS lv
            FROM cells GROUP BY 1
        ),
        m AS (
            SELECT seg, n, k, lv,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
            FROM agg
        )
        SELECT seg, n, k, mean,
               list_reduce(list_prepend(0.0,
                   [CAST(e.c AS DOUBLE)
                    * ((CAST(e.v AS DOUBLE) / mean)
                       * ln(CAST(e.v AS DOUBLE) / mean))
                    FOR e IN lv]),
                   (acc, t) -> acc + t) / CAST(n AS DOUBLE)
                   AS theil_t,
               list_reduce(list_prepend(0.0,
                   [CAST(e.c AS DOUBLE)
                    * ln(mean / CAST(e.v AS DOUBLE))
                    FOR e IN lv]),
                   (acc, t) -> acc + t) / CAST(n AS DOUBLE)
                   AS theil_l,
               1.0 - exp(list_reduce(list_prepend(0.0,
                       [CAST(e.c AS DOUBLE)
                        * ln(CAST(e.v AS DOUBLE)) FOR e IN lv]),
                       (acc, t) -> acc + t) / CAST(n AS DOUBLE))
                   / mean AS atkinson
        FROM m
    """
    oracles["brunner_munzel"] = """
        -- exact doubled midranks (HUGEINT twin of the Spark
        -- DECIMAL(38,0) sums); plain combinable sums, one tree
        WITH pts AS (
            SELECT user_id % 2 AS bucket,
                   CAST(floor(value) AS BIGINT) AS v,
                   event_type AS g, CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
            GROUP BY 1, 2, 3
        ),
        vals AS (
            SELECT bucket, v,
                   CAST(sum(CASE WHEN g = 'click' THEN c ELSE 0 END)
                        AS BIGINT) AS la,
                   CAST(sum(CASE WHEN g = 'view' THEN c ELSE 0 END)
                        AS BIGINT) AS lb
            FROM pts GROUP BY 1, 2
        ),
        s1 AS (
            SELECT bucket, v, la, lb, la + lb AS l,
                   CAST(sum(la + lb) OVER w_p AS BIGINT) AS cp,
                   CAST(sum(la) OVER w_p AS BIGINT) AS ca,
                   CAST(sum(lb) OVER w_p AS BIGINT) AS cb,
                   CAST(sum(la) OVER w_a AS BIGINT) AS na,
                   CAST(sum(lb) OVER w_a AS BIGINT) AS nb
            FROM vals
            WINDOW w_p AS (PARTITION BY bucket ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                   w_a AS (PARTITION BY bucket)
        ),
        s2 AS (
            SELECT bucket, la, lb, na, nb,
                   CAST(2*cp - l + 1 AS HUGEINT) AS dr,
                   CAST(2*ca - la + 1 AS HUGEINT) AS dra,
                   CAST(2*cb - lb + 1 AS HUGEINT) AS drb,
                   CAST(sum(la * (2*cp - l + 1)) OVER w_a2
                        AS HUGEINT) AS sa,
                   CAST(sum(lb * (2*cp - l + 1)) OVER w_a2
                        AS HUGEINT) AS sb
            FROM s1
            WINDOW w_a2 AS (PARTITION BY bucket)
        ),
        s3 AS (
            SELECT bucket, la, lb, na, nb, sa, sb,
                   CAST(na AS HUGEINT) * dr
                   - CAST(na AS HUGEINT) * dra - sa
                   + CAST(na AS HUGEINT)
                     * (CAST(na AS HUGEINT) + 1) AS da,
                   CAST(nb AS HUGEINT) * dr
                   - CAST(nb AS HUGEINT) * drb - sb
                   + CAST(nb AS HUGEINT)
                     * (CAST(nb AS HUGEINT) + 1) AS db
            FROM s2
        ),
        agg AS (
            SELECT bucket, na, nb, sa, sb,
                   sum(CAST(la AS HUGEINT) * da * da) AS qa,
                   sum(CAST(lb AS HUGEINT) * db * db) AS qb
            FROM s3 GROUP BY 1, 2, 3, 4, 5
        ),
        t AS (
            SELECT bucket, na, nb,
                   CAST(sa AS DOUBLE)
                       / (2.0 * CAST(na AS DOUBLE)) AS ra,
                   CAST(sb AS DOUBLE)
                       / (2.0 * CAST(nb AS DOUBLE)) AS rb,
                   CAST(qa AS DOUBLE)
                       / (4.0 * CAST(na AS DOUBLE)
                          * CAST(na AS DOUBLE)
                          * (CAST(na AS DOUBLE) - 1.0)) AS sa2,
                   CAST(qb AS DOUBLE)
                       / (4.0 * CAST(nb AS DOUBLE)
                          * CAST(nb AS DOUBLE)
                          * (CAST(nb AS DOUBLE) - 1.0)) AS sb2
            FROM agg
        ),
        u AS (
            SELECT bucket, na, nb, ra, rb,
                   CAST(na AS DOUBLE) * sa2 AS va,
                   CAST(nb AS DOUBLE) * sb2 AS vb
            FROM t
        )
        SELECT bucket, na AS n_a, nb AS n_b,
               CASE WHEN na > 0 AND nb > 0
                    THEN (rb - (CAST(nb AS DOUBLE) + 1.0) / 2.0)
                         / CAST(na AS DOUBLE) END AS p_hat,
               CASE WHEN na >= 2 AND nb >= 2 AND va + vb > 0.0
                    THEN CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                         * (rb - ra)
                         / ((CAST(na AS DOUBLE)
                             + CAST(nb AS DOUBLE))
                            * sqrt(va + vb)) END AS w,
               CASE WHEN na >= 2 AND nb >= 2 AND va + vb > 0.0
                    THEN (va + vb) * (va + vb)
                         / (va * va / (CAST(na AS DOUBLE) - 1.0)
                            + vb * vb
                              / (CAST(nb AS DOUBLE) - 1.0))
                    END AS df_bm
        FROM u
    """
    oracles["ansari"] = """
        -- exact doubled tie-block score sums; bounded folds
        WITH pts AS (
            SELECT user_id % 3 AS bucket,
                   CAST(floor(value) AS BIGINT) AS v,
                   event_type AS g, CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
            GROUP BY 1, 2, 3
        ),
        vals AS (
            SELECT bucket, v,
                   CAST(sum(CASE WHEN g = 'click' THEN c ELSE 0 END)
                        AS BIGINT) AS la,
                   CAST(sum(CASE WHEN g = 'view' THEN c ELSE 0 END)
                        AS BIGINT) AS lb
            FROM pts GROUP BY 1, 2
        ),
        s1 AS (
            SELECT bucket, v, la, la + lb AS l,
                   CAST(sum(la + lb) OVER w_p AS BIGINT) AS cp,
                   CAST(sum(la) OVER w_a AS BIGINT) AS na,
                   CAST(sum(lb) OVER w_a AS BIGINT) AS nb
            FROM vals
            WINDOW w_p AS (PARTITION BY bucket ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                   w_a AS (PARTITION BY bucket)
        ),
        s2 AS (
            SELECT bucket, v, la, l, na, nb,
                   CAST(cp - l AS HUGEINT) AS p,
                   CAST(l AS HUGEINT) AS lh,
                   CAST(na + nb AS HUGEINT) AS n,
                   CAST((na + nb + 1) // 2 AS HUGEINT) AS h
            FROM s1
        ),
        s3 AS (
            SELECT bucket, v, la, l, na, nb,
                   (CASE WHEN p + 1 <= least(p + lh, h)
                         THEN least(p + lh, h)
                              * (least(p + lh, h) + 1)
                              - p * (p + 1)
                         ELSE CAST(0 AS HUGEINT) END)
                   + (CASE WHEN p + lh - greatest(p + 1, h + 1) + 1 > 0
                           THEN CAST(2 AS HUGEINT)
                                * (p + lh - greatest(p + 1, h + 1) + 1)
                                * (n + 1)
                                - ((p + lh) * (p + lh + 1)
                                   - (greatest(p + 1, h + 1) - 1)
                                     * greatest(p + 1, h + 1))
                           ELSE CAST(0 AS HUGEINT) END) AS tb
            FROM s2
        ),
        agg AS (
            SELECT bucket, na, nb, sum(tb) AS tbsum,
                   list_sort(list(struct_pack(
                       v := v, la := la, l := l, tb := tb))) AS lv
            FROM s3 GROUP BY 1, 2, 3
        ),
        m AS (
            SELECT bucket, na, nb, lv,
                   CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) AS nd,
                   list_reduce(list_prepend(0.0,
                       [CAST(e.la AS DOUBLE)
                        * (CAST(e.tb AS DOUBLE)
                           / (2.0 * CAST(e.l AS DOUBLE)))
                        FOR e IN lv]),
                       (acc, t) -> acc + t) AS ab,
                   list_reduce(list_prepend(0.0,
                       [CAST(e.tb AS DOUBLE) * CAST(e.tb AS DOUBLE)
                        / (4.0 * CAST(e.l AS DOUBLE)) FOR e IN lv]),
                       (acc, t) -> acc + t) AS ss,
                   CAST(tbsum AS DOUBLE) AS tbs
            FROM agg
        ),
        f AS (
            SELECT bucket, na, nb, ab, ss, nd,
                   tbs / (2.0 * nd) AS sbar,
                   CAST(na AS DOUBLE) * tbs / (2.0 * nd) AS e_ab
            FROM m
        ),
        g AS (
            SELECT bucket, na, nb, ab, e_ab,
                   CAST(na AS DOUBLE) * (nd - CAST(na AS DOUBLE))
                   / (nd * (nd - 1.0))
                   * (ss - nd * sbar * sbar) AS var_ab
            FROM f
        )
        SELECT bucket, na AS n_a, nb AS n_b,
               CASE WHEN na > 0 AND nb > 0 THEN ab END AS ab,
               CASE WHEN na > 0 AND nb > 0 AND na + nb > 1
                    THEN e_ab END AS e_ab,
               CASE WHEN na > 0 AND nb > 0 AND na + nb > 1
                    THEN var_ab END AS var_ab,
               CASE WHEN na > 0 AND nb > 0 AND na + nb > 1
                         AND var_ab > 0.0
                    THEN (ab - e_ab) / sqrt(var_ab) END AS z
        FROM g
    """
    from lmss_entity_extractor_spark.ops.regression import _bp_poly

    _bp_moms = [
        (i, j) for t in range(1, 5) for i in range(t + 1) for j in [t - i]
    ]
    _bp_sums = ",\n                   ".join(
        "sum("
        + " * ".join(["qx"] * i + ["qy"] * j)
        + f") AS h{i}{j}"
        for i, j in _bp_moms
    )
    _bp_casts = ",\n                   ".join(
        f"CAST(h{i}{j} AS DOUBLE) AS m{i}{j}" for i, j in _bp_moms
    )
    oracles["breusch_pagan"] = f"""
        -- 14 exact HUGEINT mixed moments; engine-shared polynomial
        -- tree generated by the same _bp_poly builder Spark parses
        WITH q AS (
            SELECT l_returnflag AS flag,
                   CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS HUGEINT) AS qx,
                   CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT) AS HUGEINT) AS qy
            FROM lineitem
            WHERE l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL
        ),
        agg AS (
            SELECT flag, CAST(count(*) AS BIGINT) AS n,
                   {_bp_sums}
            FROM q GROUP BY 1
        ),
        m AS (
            SELECT flag, n, CAST(n AS DOUBLE) AS nd,
                   {_bp_casts}
            FROM agg
        ),
        f AS (
            SELECT *,
                   CASE WHEN nd * m20 - m10 * m10 > 0.0 THEN
                       (nd * m11 - m10 * m01)
                       / (nd * m20 - m10 * m10) END AS b1,
                   nd * m20 - m10 * m10 AS sxx
            FROM m
        ),
        f2 AS (
            SELECT *, (m01 - b1 * m10) / nd AS b0 FROM f
        ),
        a AS (
            SELECT flag, n, nd, m10, sxx, b1,
                   {_bp_poly(2)} AS a1,
                   {_bp_poly(2, x_shift=1)} AS a2,
                   {_bp_poly(4)} AS a3
            FROM f2
        ),
        r AS (
            SELECT flag, n, nd, b1, sxx,
                   nd * a3 - a1 * a1 AS see,
                   nd * a2 - m10 * a1 AS sxe
            FROM a
        )
        SELECT flag, n,
               CASE WHEN sxx > 0.0 THEN b1 END AS slope,
               CASE WHEN n >= 3 AND sxx > 0.0 AND see > 0.0
                    THEN nd * (sxe * sxe) / (sxx * see) END AS lm,
               CASE WHEN n >= 3 AND sxx > 0.0 AND see > 0.0
                    THEN 1 END AS df_bp
        FROM r
    """
    oracles["quade"] = """
        -- doubled midranks both layers; exact quarter-unit scores
        WITH cell AS (
            SELECT o_custkey % 2 AS bucket, o_custkey % 40 AS blk,
                   o_orderpriority AS trt,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
            FROM orders GROUP BY 1, 2, 3
        ),
        ranked AS (
            SELECT bucket, blk, trt,
                   CAST(2 * rank() OVER
                            (PARTITION BY bucket, blk ORDER BY v)
                        + count(*) OVER
                            (PARTITION BY bucket, blk, v)
                        - 1 AS HUGEINT) AS dr,
                   CAST(count(*) OVER (PARTITION BY bucket, blk)
                        AS HUGEINT) AS k
            FROM cell
        ),
        rng AS (
            SELECT bucket, blk, max(v) - min(v) AS r
            FROM cell GROUP BY 1, 2
        ),
        qr AS (
            SELECT bucket, blk,
                   CAST(2 * rank() OVER
                            (PARTITION BY bucket ORDER BY r)
                        + count(*) OVER (PARTITION BY bucket, r)
                        - 1 AS HUGEINT) AS dq
            FROM rng
        ),
        cells AS (
            SELECT ranked.bucket, ranked.trt, ranked.k,
                   dq * (dr - (k + 1)) AS s4
            FROM ranked JOIN qr
              ON ranked.bucket = qr.bucket AND ranked.blk = qr.blk
        ),
        pt AS (
            SELECT bucket, k, trt, CAST(count(*) AS BIGINT) AS b,
                   sum(s4 * s4) AS a4, sum(s4) AS t4
            FROM cells GROUP BY 1, 2, 3
        ),
        agg AS (
            SELECT bucket, k, CAST(max(b) AS BIGINT) AS n_blocks,
                   sum(a4) AS a, sum(t4 * t4) AS bsum
            FROM pt GROUP BY 1, 2
        ),
        t AS (
            SELECT bucket, k, n_blocks,
                   CAST(n_blocks AS DOUBLE) AS bd,
                   CAST(a AS DOUBLE) / 16.0 AS av,
                   CAST(bsum AS DOUBLE)
                       / (16.0 * CAST(n_blocks AS DOUBLE)) AS bv
            FROM agg
        )
        SELECT bucket, n_blocks, CAST(k AS BIGINT) AS k,
               CASE WHEN n_blocks >= 2 AND k >= 2 AND av > bv
                    THEN (bd - 1.0) * bv / (av - bv) END AS f_stat,
               CASE WHEN n_blocks >= 2 AND k >= 2 AND av > bv
                    THEN CAST(k - 1 AS BIGINT) END AS df1,
               CASE WHEN n_blocks >= 2 AND k >= 2 AND av > bv
                    THEN CAST((n_blocks - 1) * (k - 1) AS BIGINT)
               END AS df2
        FROM t
    """
    oracles["holt"] = """
        -- the identical per-step IEEE tree driven by WITH RECURSIVE
        WITH RECURSIVE daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        series AS (
            SELECT bucket,
                   CAST(row_number() OVER
                        (PARTITION BY bucket ORDER BY d)
                        AS BIGINT) AS i,
                   x
            FROM daily
        ),
        sizes AS (
            SELECT bucket, CAST(max(i) AS INTEGER) AS n
            FROM series GROUP BY 1
        ),
        rec AS (
            SELECT s1.bucket, CAST(1 AS BIGINT) AS t,
                   s1.x AS l, s2.x - s1.x AS b
            FROM series s1 JOIN series s2
              ON s1.bucket = s2.bucket AND s1.i = 1 AND s2.i = 2
            UNION ALL
            SELECT r.bucket, r.t + 1,
                   0.5 * s.x + (1.0 - 0.5) * (r.l + r.b) AS l,
                   0.3 * ((0.5 * s.x + (1.0 - 0.5) * (r.l + r.b))
                          - r.l)
                   + (1.0 - 0.3) * r.b AS b
            FROM rec r JOIN series s
              ON s.bucket = r.bucket AND s.i = r.t + 1
        )
        SELECT z.bucket, z.n, r.l AS level, r.b AS trend,
               r.l + r.b AS forecast
        FROM sizes z JOIN rec r
          ON r.bucket = z.bucket AND r.t = z.n
        WHERE z.n >= 2
        UNION ALL
        SELECT z.bucket, z.n, s.x AS level,
               CAST(NULL AS DOUBLE) AS trend,
               CAST(NULL AS DOUBLE) AS forecast
        FROM sizes z JOIN series s
          ON s.bucket = z.bucket AND s.i = 1
        WHERE z.n = 1
    """
    oracles["yule_walker"] = """
        -- exact L151 ACF pipeline, then Durbin-Levinson through a
        -- recursive CTE carrying LIST state — identical per-step tree
        WITH RECURSIVE daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        stats AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS DECIMAL(18,2)) AS s
            FROM daily GROUP BY 1
        ),
        centred AS (
            SELECT b.bucket, st.n,
                   CAST(CAST(st.n AS DECIMAL(10,0)) * b.x - st.s
                        AS DECIMAL(19,2)) AS c,
                   b.d
            FROM daily b JOIN stats st ON b.bucket = st.bucket
        ),
        lagged AS (
            SELECT bucket, n, c,
                   lag(c, 1) OVER w AS l1,
                   lag(c, 2) OVER w AS l2,
                   lag(c, 3) OVER w AS l3
            FROM centred
            WINDOW w AS (PARTITION BY bucket ORDER BY d)
        ),
        sums AS (
            SELECT bucket, n, sum(c*c) AS den, sum(c*l1) AS num1,
                   sum(c*l2) AS num2, sum(c*l3) AS num3
            FROM lagged GROUP BY 1, 2
        ),
        acfl AS (
            SELECT bucket, n, lag,
                   CASE WHEN den IS NOT NULL AND den <> 0
                            AND num IS NOT NULL
                        THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                   END AS r
            FROM (
                SELECT bucket, n, den, 1 AS lag, num1 AS num FROM sums
                UNION ALL SELECT bucket, n, den, 2, num2 FROM sums
                UNION ALL SELECT bucket, n, den, 3, num3 FROM sums
            )
        ),
        rl AS (
            SELECT bucket, CAST(min(n) AS BIGINT) AS n,
                   list(r ORDER BY lag) AS rs
            FROM acfl GROUP BY 1
        ),
        rec AS (
            SELECT bucket, n, rs, 1 AS m,
                   [rs[1]] AS phis, [rs[1]] AS pacfs,
                   1.0 - rs[1] * rs[1] AS e
            FROM rl
            UNION ALL
            SELECT bucket, n, rs, m + 1,
                   list_concat(
                       list_transform(generate_series(1, m),
                           j -> phis[j] - k * phis[m + 1 - j]),
                       [k]),
                   list_concat(pacfs, [k]),
                   e * (1.0 - k * k)
            FROM (
                SELECT r.*,
                       CASE WHEN e <> 0.0 THEN
                           (rs[m + 1] - list_reduce(
                               list_prepend(0.0,
                                   list_transform(
                                       generate_series(1, m),
                                       j -> phis[j] * rs[m + 1 - j])),
                               (a, b) -> a + b)) / e
                       END AS k
                FROM rec r WHERE m < 3
            )
        )
        SELECT bucket, n, CAST(u.lag AS INTEGER) AS lag,
               pacfs[u.lag] AS pacf, phis[u.lag] AS ar_coef
        FROM rec
        CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS lag) u
        WHERE m = 3
    """
    oracles["periodogram"] = """
        -- order-pinned in-array cos/sin folds over the exact series
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        pl AS (
            SELECT bucket, list(x ORDER BY d) AS xs
            FROM daily GROUP BY 1
        ),
        st AS (
            SELECT bucket, xs, CAST(len(xs) AS INTEGER) AS n,
                   list_reduce(list_prepend(0.0, xs),
                               (a, b) -> a + b)
                       / CAST(len(xs) AS DOUBLE) AS xbar
            FROM pl
        ),
        wide AS (
            SELECT st.*, p.period
            FROM st CROSS JOIN
                 (SELECT unnest([7, 14]) AS period) p
        ),
        folds AS (
            SELECT bucket, period, n,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(0, n - 1),
                           i -> (xs[i + 1] - xbar)
                                * cos(6.283185307179586
                                      * CAST(i AS DOUBLE)
                                      / CAST(period AS DOUBLE)))),
                       (a, b) -> a + b) AS c,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(0, n - 1),
                           i -> (xs[i + 1] - xbar)
                                * sin(6.283185307179586
                                      * CAST(i AS DOUBLE)
                                      / CAST(period AS DOUBLE)))),
                       (a, b) -> a + b) AS s,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(0, n - 1),
                           i -> (xs[i + 1] - xbar)
                                * (xs[i + 1] - xbar))),
                       (a, b) -> a + b) AS den
            FROM wide
        )
        SELECT bucket, period, n,
               CASE WHEN n >= 2 AND den > 0.0
                    THEN 2.0 * (c * c + s * s)
                         / (CAST(n AS DOUBLE) * den)
               END AS power
        FROM folds
    """
    oracles["rmst"] = """
        -- bounded KM grid; accumulator encoded as a 3-double LIST so
        -- list_reduce drives the identical (prev, s, area) tree
        WITH flt AS (
            SELECT l_linestatus AS st,
                   CAST(day(l_shipdate) - 1 AS BIGINT) AS t,
                   CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0
                        END AS e
            FROM lineitem
            WHERE l_shipdate IS NOT NULL
        ),
        pts AS (
            SELECT st, t, CAST(sum(e) AS BIGINT) AS d,
                   CAST(sum(1 - e) AS BIGINT) AS c
            FROM flt GROUP BY 1, 2
        ),
        grid AS (
            SELECT st, t, d, c,
                   CAST(sum(d + c) OVER (PARTITION BY st)
                        - COALESCE(sum(d + c) OVER
                              (PARTITION BY st ORDER BY t
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0)
                        AS BIGINT) AS n
            FROM pts
        ),
        packed AS (
            SELECT st, CAST(max(n) AS BIGINT) AS n,
                   CAST(sum(d) AS BIGINT) AS events,
                   list_sort(list(struct_pack(t := t, d := d,
                                              n := n))) AS lv
            FROM grid GROUP BY 1
        ),
        folded AS (
            SELECT st, n, events,
                   list_reduce(
                       list_prepend([0.0, 1.0, 0.0],
                           list_transform(lv, s ->
                               [CAST(s.t AS DOUBLE),
                                CAST(s.n - s.d AS DOUBLE)
                                    / CAST(s.n AS DOUBLE),
                                0.0])),
                       (a, x) -> [x[1],
                                  a[2] * x[2],
                                  a[3] + a[2]
                                       * (least(x[1], 20.0)
                                          - least(a[1], 20.0))]
                   ) AS acc
            FROM packed
        )
        SELECT st, 20.0 AS tau, n, events,
               acc[3] + acc[2]
                      * greatest(20.0 - least(acc[1], 20.0), 0.0)
                   AS rmst
        FROM folded
    """
    oracles["cox_stuart"] = """
        -- half-offset sign pairs via exact integer equi-join
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        idx AS (
            SELECT bucket,
                   CAST(row_number() OVER
                        (PARTITION BY bucket ORDER BY d)
                        AS BIGINT) AS i,
                   CAST(count(*) OVER (PARTITION BY bucket)
                        AS BIGINT) AS nn,
                   x
            FROM daily
        ),
        first AS (
            SELECT bucket, nn, i + (nn - nn // 2) AS j, x AS x1
            FROM idx WHERE i <= nn // 2
        ),
        pairs AS (
            SELECT f.bucket, f.nn, f.x1, s.x AS x2
            FROM first f JOIN idx s
              ON f.bucket = s.bucket AND f.j = s.i
        ),
        agg AS (
            SELECT bucket, nn,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(CASE WHEN x2 > x1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS plus,
                   CAST(sum(CASE WHEN x2 < x1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS minus
            FROM pairs GROUP BY 1, 2
        )
        SELECT bucket, nn AS n, n_pairs, plus, minus,
               CASE WHEN plus + minus > 0
                    THEN (CAST(plus AS DOUBLE)
                          - CAST(plus + minus AS DOUBLE) / 2.0)
                         / sqrt(CAST(plus + minus AS DOUBLE) / 4.0)
               END AS z
        FROM agg
    """
    oracles["stuart_maxwell"] = """
        -- doubled off-diagonal means keep the closed form integer
        WITH tagged AS (
            SELECT o_custkey, o_orderstatus,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rf,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC)
                       AS rl
            FROM orders
        ),
        paired AS (
            SELECT f.o_custkey % 2 AS bucket,
                   f.o_orderstatus AS b, l.o_orderstatus AS a
            FROM (SELECT * FROM tagged WHERE rf = 1) f
            JOIN (SELECT * FROM tagged WHERE rl = 1) l
              ON f.o_custkey = l.o_custkey
        ),
        cells AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN b='F' AND a='F' THEN 1 ELSE 0
                       END) AS BIGINT) AS n11,
                   CAST(sum(CASE WHEN b='F' AND a='O' THEN 1 ELSE 0
                       END) AS BIGINT) AS n12,
                   CAST(sum(CASE WHEN b='F' AND a='P' THEN 1 ELSE 0
                       END) AS BIGINT) AS n13,
                   CAST(sum(CASE WHEN b='O' AND a='F' THEN 1 ELSE 0
                       END) AS BIGINT) AS n21,
                   CAST(sum(CASE WHEN b='O' AND a='O' THEN 1 ELSE 0
                       END) AS BIGINT) AS n22,
                   CAST(sum(CASE WHEN b='O' AND a='P' THEN 1 ELSE 0
                       END) AS BIGINT) AS n23,
                   CAST(sum(CASE WHEN b='P' AND a='F' THEN 1 ELSE 0
                       END) AS BIGINT) AS n31,
                   CAST(sum(CASE WHEN b='P' AND a='O' THEN 1 ELSE 0
                       END) AS BIGINT) AS n32,
                   CAST(sum(CASE WHEN b='P' AND a='P' THEN 1 ELSE 0
                       END) AS BIGINT) AS n33
            FROM paired GROUP BY 1
        ),
        m AS (
            SELECT bucket, n,
                   (n11+n12+n13) - (n11+n21+n31) AS d1,
                   (n21+n22+n23) - (n12+n22+n32) AS d2,
                   (n31+n32+n33) - (n13+n23+n33) AS d3,
                   n12 + n21 AS m12, n13 + n31 AS m13,
                   n23 + n32 AS m23
            FROM cells
        ),
        f AS (
            SELECT bucket, n, d1, d2, d3,
                   CAST(m23 AS DOUBLE) * CAST(d1 AS DOUBLE)
                       * CAST(d1 AS DOUBLE)
                   + CAST(m13 AS DOUBLE) * CAST(d2 AS DOUBLE)
                       * CAST(d2 AS DOUBLE)
                   + CAST(m12 AS DOUBLE) * CAST(d3 AS DOUBLE)
                       * CAST(d3 AS DOUBLE) AS num,
                   CAST(m12 AS DOUBLE) * CAST(m13 AS DOUBLE)
                   + CAST(m12 AS DOUBLE) * CAST(m23 AS DOUBLE)
                   + CAST(m13 AS DOUBLE) * CAST(m23 AS DOUBLE)
                       AS den
            FROM m
        )
        SELECT bucket, n, d1, d2, d3,
               CASE WHEN den > 0.0 THEN num / den END AS chi2,
               CASE WHEN den > 0.0 THEN 2 END AS dof
        FROM f
    """
    oracles["bartels"] = """
        -- all-integer doubled-midrank sums; ONE division
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT bucket, d,
                   CAST(2 * rank() OVER
                            (PARTITION BY bucket ORDER BY x)
                        + count(*) OVER (PARTITION BY bucket, x)
                        - 1 AS BIGINT) AS dr,
                   CAST(count(*) OVER (PARTITION BY bucket)
                        AS BIGINT) AS nn
            FROM daily
        ),
        led AS (
            SELECT bucket, nn, dr,
                   lead(dr, 1) OVER
                       (PARTITION BY bucket ORDER BY d) AS dn
            FROM ranked
        ),
        agg AS (
            SELECT bucket, nn,
                   sum(CASE WHEN dn IS NOT NULL THEN
                       CAST(dr - dn AS HUGEINT)
                       * CAST(dr - dn AS HUGEINT) END) AS nm4,
                   sum(CAST(dr - (nn + 1) AS HUGEINT)
                       * CAST(dr - (nn + 1) AS HUGEINT)) AS d4
            FROM led GROUP BY 1, 2
        ),
        t AS (
            SELECT bucket, nn,
                   CAST(nm4 AS DOUBLE) / CAST(d4 AS DOUBLE) AS rvn,
                   CAST(nn AS DOUBLE) AS nd, d4
            FROM agg
        )
        SELECT bucket, nn AS n,
               CASE WHEN nn >= 3 AND d4 > 0 THEN rvn END AS rvn,
               CASE WHEN nn >= 3 AND d4 > 0
                    THEN (rvn - 2.0)
                         / sqrt(4.0 * (nd - 2.0)
                                * (5.0 * nd * nd - 2.0 * nd - 9.0)
                                / (5.0 * nd * (nd + 1.0)
                                   * (nd - 1.0) * (nd - 1.0)))
               END AS z
        FROM t
    """
    oracles["turning_points"] = """
        -- exact extrema count; fixed rational moment trees
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT bucket, x,
                   lag(x, 1) OVER w AS pr,
                   lead(x, 1) OVER w AS nx
            FROM daily
            WINDOW w AS (PARTITION BY bucket ORDER BY d)
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN pr IS NOT NULL
                                  AND nx IS NOT NULL
                                  AND ((x > pr AND x > nx)
                                       OR (x < pr AND x < nx))
                            THEN 1 ELSE 0 END) AS BIGINT) AS t_points
            FROM lagged GROUP BY 1
        )
        SELECT bucket, n, t_points,
               CASE WHEN n >= 3
                    THEN 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0
               END AS expected,
               CASE WHEN n >= 3
                     AND (16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0
                         > 0.0
                    THEN (CAST(t_points AS DOUBLE)
                          - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
                         / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0)
                                / 90.0)
               END AS z
        FROM agg
    """
    oracles["croston"] = """
        -- twin SES folds; 3-double LIST accumulator (z, p, prev)
        WITH days AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d
            FROM events
        ),
        buckets AS (
            SELECT DISTINCT user_id % 2 AS bucket FROM events
        ),
        hits AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE event_type = 'signup' AND value > 300
            GROUP BY 1, 2
        ),
        fullgrid AS (
            SELECT b.bucket, g.d,
                   CAST(COALESCE(h.c, 0) AS DOUBLE) AS x
            FROM days g CROSS JOIN buckets b
            LEFT JOIN hits h
              ON h.bucket = b.bucket AND h.d = g.d
        ),
        pl AS (
            SELECT bucket, list(x ORDER BY d) AS xs
            FROM fullgrid GROUP BY 1
        ),
        nz AS (
            SELECT bucket, CAST(len(xs) AS INTEGER) AS n,
                   list_filter(
                       list_transform(generate_series(1, len(xs)),
                           i -> [CAST(i AS DOUBLE), xs[i]]),
                       e -> e[2] != 0.0) AS nzl
            FROM pl
        ),
        folded AS (
            SELECT bucket, n, CAST(len(nzl) AS INTEGER) AS k,
                   CASE WHEN len(nzl) >= 1 THEN
                       list_reduce(
                           list_prepend(
                               [nzl[1][2], nzl[1][1], nzl[1][1]],
                               nzl[2:]),
                           (a, e) -> [0.2 * e[2]
                                      + (1.0 - 0.2) * a[1],
                                      0.2 * (e[1] - a[3])
                                      + (1.0 - 0.2) * a[2],
                                      e[1]])
                   END AS acc
            FROM nz
        )
        SELECT bucket, n, k AS n_demands,
               acc[1] AS z_hat, acc[2] AS p_hat,
               acc[1] / acc[2] AS forecast,
               (1.0 - 0.2 / 2.0) * (acc[1] / acc[2])
                   AS forecast_sba
        FROM folded
    """
    oracles["theta"] = """
        -- exact-position OLS trees + SES list_reduce (first element
        -- as init, matching the Spark fold)
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        pl AS (
            SELECT bucket, list(x ORDER BY d) AS xs
            FROM daily GROUP BY 1
        ),
        st AS (
            SELECT bucket, xs,
                   CAST(len(xs) AS INTEGER) AS n,
                   CAST(len(xs) AS DOUBLE) AS nd,
                   list_reduce(list_prepend(0.0, xs),
                               (a, v) -> a + v) AS sx,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, len(xs)),
                           i -> CAST(i AS DOUBLE) * xs[i])),
                       (a, v) -> a + v) AS six
            FROM pl
        ),
        fit AS (
            SELECT bucket, xs, n, nd, sx, six,
                   nd * (nd + 1.0) / 2.0 AS si,
                   nd * (nd + 1.0) * (2.0 * nd + 1.0) / 6.0 AS sii
            FROM st
        ),
        fb AS (
            SELECT *,
                   CASE WHEN nd * sii - si * si > 0.0 THEN
                       (nd * six - si * sx)
                       / (nd * sii - si * si) END AS b
            FROM fit
        ),
        fa AS (
            SELECT *, (sx - b * si) / nd AS a0 FROM fb
        ),
        ys AS (
            SELECT bucket, n, nd, b, a0,
                   list_transform(generate_series(1, n),
                       i -> 2.0 * xs[i]
                            - (a0 + b * CAST(i AS DOUBLE))) AS yl
            FROM fa
        ),
        sm AS (
            SELECT bucket, n, b, a0, nd,
                   list_reduce(yl,
                       (acc, y) -> 0.5 * y + (1.0 - 0.5) * acc)
                       AS ses
            FROM ys
        )
        SELECT bucket, n,
               CASE WHEN n >= 2 THEN a0 END AS intercept,
               CASE WHEN n >= 2 THEN b END AS slope,
               CASE WHEN n >= 2 THEN ses END AS ses_theta2,
               CASE WHEN n >= 2
                    THEN (ses + (a0 + b * (nd + 1.0))) / 2.0
               END AS forecast
        FROM sm
    """
    oracles["spectral_entropy"] = """
        -- full Fourier grid; staged power list; order-pinned folds
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        pl AS (
            SELECT bucket, list(x ORDER BY d) AS xs
            FROM daily GROUP BY 1
        ),
        st AS (
            SELECT bucket, xs,
                   CAST(len(xs) AS INTEGER) AS n,
                   CAST(len(xs) AS DOUBLE) AS nd,
                   list_reduce(list_prepend(0.0, xs),
                               (a, v) -> a + v)
                       / CAST(len(xs) AS DOUBLE) AS xbar
            FROM pl
        ),
        pw AS (
            SELECT bucket, n,
                   list_transform(generate_series(1, n // 2), k ->
                       list_reduce(list_prepend(0.0,
                           list_transform(generate_series(0, n - 1),
                               i -> (xs[i + 1] - xbar)
                                    * cos(6.283185307179586
                                          * CAST(k AS DOUBLE)
                                          * CAST(i AS DOUBLE)
                                          / nd))),
                           (a, v) -> a + v)
                       * list_reduce(list_prepend(0.0,
                           list_transform(generate_series(0, n - 1),
                               i -> (xs[i + 1] - xbar)
                                    * cos(6.283185307179586
                                          * CAST(k AS DOUBLE)
                                          * CAST(i AS DOUBLE)
                                          / nd))),
                           (a, v) -> a + v)
                       + list_reduce(list_prepend(0.0,
                           list_transform(generate_series(0, n - 1),
                               i -> (xs[i + 1] - xbar)
                                    * sin(6.283185307179586
                                          * CAST(k AS DOUBLE)
                                          * CAST(i AS DOUBLE)
                                          / nd))),
                           (a, v) -> a + v)
                       * list_reduce(list_prepend(0.0,
                           list_transform(generate_series(0, n - 1),
                               i -> (xs[i + 1] - xbar)
                                    * sin(6.283185307179586
                                          * CAST(k AS DOUBLE)
                                          * CAST(i AS DOUBLE)
                                          / nd))),
                           (a, v) -> a + v)) AS ps
            FROM st
        ),
        tot AS (
            SELECT bucket, n, ps,
                   list_reduce(list_prepend(0.0, ps),
                               (a, p) -> a + p) AS t
            FROM pw
        ),
        ent AS (
            SELECT bucket, n, CAST(len(ps) AS INTEGER) AS k_freqs, t,
                   -list_reduce(list_prepend(0.0,
                       list_transform(ps, p ->
                           CASE WHEN p > 0.0
                                THEN (p / t) * ln(p / t)
                                ELSE 0.0 END)),
                       (a, v) -> a + v) AS h
            FROM tot
        )
        SELECT bucket, n, k_freqs,
               CASE WHEN n >= 3 AND t > 0.0 THEN h END AS entropy,
               CASE WHEN n >= 3 AND t > 0.0 AND k_freqs >= 2
                    THEN h / ln(CAST(k_freqs AS DOUBLE))
               END AS entropy_norm
        FROM ent
    """
    oracles["msprt"] = """
        -- exact decimal sufficient stats; one fixed Λ tree
        WITH flt AS (
            SELECT user_id % 2 AS bucket, event_type AS g,
                   CAST(value AS DECIMAL(18,2)) AS x
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
        ),
        agg AS (
            SELECT bucket,
                   CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b,
                   sum(CASE WHEN g = 'click' THEN x END) AS sa,
                   sum(CASE WHEN g = 'view' THEN x END) AS sb,
                   sum(CASE WHEN g = 'click' THEN x * x END) AS qa,
                   sum(CASE WHEN g = 'view' THEN x * x END) AS qb
            FROM flt GROUP BY 1
        ),
        t1 AS (
            SELECT bucket, n_a, n_b,
                   CAST(n_a AS DOUBLE) AS na,
                   CAST(n_b AS DOUBLE) AS nb,
                   CAST(sa AS DOUBLE) AS sad,
                   CAST(sb AS DOUBLE) AS sbd,
                   CAST(qa AS DOUBLE) AS qad,
                   CAST(qb AS DOUBLE) AS qbd
            FROM agg
        ),
        t2 AS (
            SELECT bucket, n_a, n_b, na, nb,
                   sad / na - sbd / nb AS delta,
                   ((qad - sad * sad / na)
                    + (qbd - sbd * sbd / nb))
                   / (na + nb - 2.0)
                   * (1.0 / na + 1.0 / nb) AS v
            FROM t1
        ),
        t3 AS (
            SELECT bucket, n_a, n_b, delta, v,
                   sqrt(v / (v + 100.0))
                   * exp(delta * delta * 100.0
                         / (2.0 * v * (v + 100.0))) AS lam
            FROM t2
        )
        SELECT bucket, n_a, n_b,
               CASE WHEN n_a > 0 AND n_b > 0 THEN delta END AS delta,
               CASE WHEN n_a >= 2 AND n_b >= 2 AND v > 0.0
                    THEN v END AS v,
               CASE WHEN n_a >= 2 AND n_b >= 2 AND v > 0.0
                    THEN lam END AS lam,
               CASE WHEN n_a >= 2 AND n_b >= 2 AND v > 0.0
                    THEN least(1.0, 1.0 / lam)
               END AS p_always_valid
        FROM t3
    """
    oracles["eb_shrink"] = """
        -- bounded key-grid rate folds; one MoM prior tree per group
        WITH cells AS (
            SELECT l_suppkey % 2 AS bucket,
                   l_partkey % 100 AS pkey,
                   CAST(sum(CASE WHEN l_returnflag = 'R'
                            THEN 1 ELSE 0 END) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS t
            FROM lineitem GROUP BY 1, 2
        ),
        packed AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS k,
                   list_sort(list(struct_pack(key := pkey, s := s,
                                              t := t))) AS lv
            FROM cells GROUP BY 1
        ),
        m AS (
            SELECT bucket, k, lv,
                   list_reduce(list_prepend(0.0,
                       [CAST(e.s AS DOUBLE) / CAST(e.t AS DOUBLE)
                        FOR e IN lv]),
                       (a, b) -> a + b) / CAST(k AS DOUBLE) AS mv
            FROM packed
        ),
        vv AS (
            SELECT *,
                   CASE WHEN k >= 2 THEN
                       list_reduce(list_prepend(0.0,
                           [(CAST(e.s AS DOUBLE)
                             / CAST(e.t AS DOUBLE) - mv)
                            * (CAST(e.s AS DOUBLE)
                               / CAST(e.t AS DOUBLE) - mv)
                            FOR e IN lv]),
                           (a, b) -> a + b)
                       / (CAST(k AS DOUBLE) - 1.0) END AS v
            FROM m
        ),
        ab AS (
            SELECT *,
                   CASE WHEN k >= 2 AND v > 0.0
                             AND mv * (1.0 - mv) > v
                        THEN mv * (1.0 - mv) / v - 1.0 END AS abv
            FROM vv
        ),
        al AS (SELECT *, mv * abv AS alpha FROM ab)
        SELECT bucket, u.e.key AS key, u.e.s AS s, u.e.t AS t,
               CAST(u.e.s AS DOUBLE) / CAST(u.e.t AS DOUBLE)
                   AS raw_rate,
               alpha, abv - alpha AS beta,
               (CAST(u.e.s AS DOUBLE) + alpha)
                   / (CAST(u.e.t AS DOUBLE) + abv) AS shrunk_rate
        FROM al CROSS JOIN unnest(al.lv) AS u(e)
    """
    oracles["seasonal_strength"] = f"""
        -- the L163 decomposition nested verbatim; shared-n
        -- squared-deviation folds, ratios at the end
        WITH d AS ({oracles["seasonal"]}),
        flt AS (
            SELECT user_id, event_id AS o, remainder AS r,
                   trend + remainder AS tr,
                   seasonal + remainder AS sr
            FROM d WHERE remainder IS NOT NULL
        ),
        pl AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_used,
                   list_sort(list(struct_pack(o := o, r := r,
                                              tr := tr, sr := sr)))
                       AS lv
            FROM flt GROUP BY 1
        ),
        ss AS (
            SELECT user_id, n_used,
                   list_reduce(list_prepend(0.0,
                       [(e.r - list_reduce(list_prepend(0.0,
                             [q.r FOR q IN lv]), (a, v) -> a + v)
                             / CAST(n_used AS DOUBLE))
                        * (e.r - list_reduce(list_prepend(0.0,
                             [q.r FOR q IN lv]), (a, v) -> a + v)
                             / CAST(n_used AS DOUBLE))
                        FOR e IN lv]),
                       (a, v) -> a + v) AS ssr,
                   list_reduce(list_prepend(0.0,
                       [(e.tr - list_reduce(list_prepend(0.0,
                             [q.tr FOR q IN lv]), (a, v) -> a + v)
                             / CAST(n_used AS DOUBLE))
                        * (e.tr - list_reduce(list_prepend(0.0,
                             [q.tr FOR q IN lv]), (a, v) -> a + v)
                             / CAST(n_used AS DOUBLE))
                        FOR e IN lv]),
                       (a, v) -> a + v) AS sstr,
                   list_reduce(list_prepend(0.0,
                       [(e.sr - list_reduce(list_prepend(0.0,
                             [q.sr FOR q IN lv]), (a, v) -> a + v)
                             / CAST(n_used AS DOUBLE))
                        * (e.sr - list_reduce(list_prepend(0.0,
                             [q.sr FOR q IN lv]), (a, v) -> a + v)
                             / CAST(n_used AS DOUBLE))
                        FOR e IN lv]),
                       (a, v) -> a + v) AS sssr
            FROM pl
        )
        SELECT user_id, n_used,
               CASE WHEN n_used >= 2 AND sstr > 0.0
                    THEN greatest(0.0, 1.0 - ssr / sstr)
               END AS trend_strength,
               CASE WHEN n_used >= 2 AND sssr > 0.0
                    THEN greatest(0.0, 1.0 - ssr / sssr)
               END AS seasonal_strength
        FROM ss
    """
    oracles["quantile_loss"] = """
        -- exact 100x cross-multiplied pinball terms; ONE division
        WITH flt AS (
            SELECT l_returnflag AS flag,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        AS DECIMAL(38,2)) AS y,
                   CAST(CAST(l_quantity * 1050 AS DECIMAL(18,2))
                        AS DECIMAL(38,2)) AS q
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
              AND l_quantity IS NOT NULL
        ),
        agg AS (
            SELECT flag, CAST(count(*) AS BIGINT) AS n,
                   sum(greatest(75 * (y - q),
                                (75 - 100) * (y - q))) AS s100,
                   CAST(sum(CASE WHEN y <= q THEN 1 ELSE 0 END)
                        AS BIGINT) AS cov
            FROM flt GROUP BY 1
        )
        SELECT flag, n, 75 AS q_pct,
               CAST(s100 AS DOUBLE)
                   / (100.0 * CAST(n AS DOUBLE)) AS pinball,
               CAST(cov AS DOUBLE) / CAST(n AS DOUBLE) AS coverage
        FROM agg
    """
    oracles["dickey_fuller"] = """
        -- one lag window; exact decimal OLS sums; one t tree
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT bucket, x,
                   lag(x, 1) OVER
                       (PARTITION BY bucket ORDER BY d) AS xp
            FROM daily
        ),
        flt AS (SELECT * FROM lagged WHERE xp IS NOT NULL),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
                   sum(xp) AS sx, sum(x - xp) AS sy,
                   sum(xp * xp) AS sxx,
                   sum(xp * (x - xp)) AS sxy,
                   sum((x - xp) * (x - xp)) AS syy
            FROM flt GROUP BY 1
        ),
        t1 AS (
            SELECT bucket, n_pairs,
                   CAST(n_pairs AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) AS sxd,
                   CAST(sy AS DOUBLE) AS syd,
                   CAST(sxx AS DOUBLE) AS sxxd,
                   CAST(sxy AS DOUBLE) AS sxyd,
                   CAST(syy AS DOUBLE) AS syyd
            FROM agg
        ),
        t2 AS (
            SELECT *,
                   nd * sxxd - sxd * sxd AS varn,
                   CASE WHEN nd * sxxd - sxd * sxd > 0.0 THEN
                       (nd * sxyd - sxd * syd)
                       / (nd * sxxd - sxd * sxd) END AS rho
            FROM t1
        ),
        t3 AS (
            SELECT *, (syd - rho * sxd) / nd AS alpha FROM t2
        ),
        t4 AS (
            SELECT *,
                   syyd + nd * alpha * alpha
                        + rho * rho * sxxd
                        - 2.0 * alpha * syd
                        - 2.0 * rho * sxyd
                        + 2.0 * alpha * rho * sxd AS sse
            FROM t3
        )
        SELECT bucket, n_pairs,
               CASE WHEN varn > 0.0 THEN rho END AS rho,
               CASE WHEN n_pairs >= 3 AND varn > 0.0 AND sse > 0.0
                    THEN rho / sqrt(sse / (nd - 2.0)
                                    / (sxxd - sxd * sxd / nd))
               END AS t_df
        FROM t4
    """
    oracles["harrell_c"] = """
        -- bounded pair lattice; exact comparable/concordant counts
        WITH base AS (
            SELECT l_orderkey % 500 AS grp,
                   CAST(day(l_shipdate) - 1 AS BIGINT) AS t,
                   CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0
                        END AS e,
                   CAST(l_discount AS DOUBLE) AS r
            FROM lineitem
            WHERE l_shipdate IS NOT NULL
              AND l_returnflag IS NOT NULL
              AND l_discount IS NOT NULL
        ),
        nn AS (
            SELECT grp, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1
        ),
        idx AS (
            SELECT grp, t, e, r,
                   row_number() OVER (PARTITION BY grp
                                      ORDER BY t, e, r) AS i
            FROM base
        ),
        pairs AS (
            SELECT a.grp,
                   a.t AS ta, a.e AS ea, a.r AS ra,
                   b.t AS tb, b.e AS eb, b.r AS rb
            FROM idx a JOIN idx b
              ON a.grp = b.grp AND a.i < b.i
        ),
        cls AS (
            SELECT grp,
                   ((ta < tb AND ea = 1) OR (tb < ta AND eb = 1))
                       AS comp,
                   CASE WHEN ta < tb AND ea = 1 THEN ra
                        ELSE rb END AS er,
                   CASE WHEN ta < tb AND ea = 1 THEN rb
                        ELSE ra END AS lr
            FROM pairs
        ),
        agg AS (
            SELECT grp,
                   CAST(sum(CASE WHEN comp THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_comparable,
                   CAST(sum(CASE WHEN comp AND er > lr THEN 1
                            ELSE 0 END) AS BIGINT) AS n_concordant,
                   CAST(sum(CASE WHEN comp AND er = lr THEN 1
                            ELSE 0 END) AS BIGINT) AS n_tied_risk
            FROM cls GROUP BY 1
        )
        SELECT agg.grp, nn.n, n_comparable, n_concordant,
               n_tied_risk,
               CASE WHEN n_comparable > 0
                    THEN (CAST(n_concordant AS DOUBLE)
                          + 0.5 * CAST(n_tied_risk AS DOUBLE))
                         / CAST(n_comparable AS DOUBLE)
               END AS c
        FROM agg JOIN nn ON agg.grp = nn.grp
    """
    oracles["granger"] = """
        -- nine exact decimal sums; identical Cramer tree text
        WITH d2 AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   COALESCE(sum(CASE WHEN event_type = 'click'
                       THEN CAST(value AS DECIMAL(18,2)) END),
                       CAST(0 AS DECIMAL(18,2))) AS y,
                   COALESCE(sum(CASE WHEN event_type = 'view'
                       THEN CAST(value AS DECIMAL(18,2)) END),
                       CAST(0 AS DECIMAL(18,2))) AS x
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT bucket,
                   CAST(y AS DECIMAL(18,2)) AS yv,
                   lag(CAST(y AS DECIMAL(18,2)), 1) OVER w AS a,
                   lag(CAST(x AS DECIMAL(18,2)), 1) OVER w AS b
            FROM d2
            WINDOW w AS (PARTITION BY bucket ORDER BY d)
        ),
        flt AS (
            SELECT * FROM lagged
            WHERE a IS NOT NULL AND b IS NOT NULL
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_used,
                   sum(yv) AS hsy, sum(a) AS hsa, sum(b) AS hsb,
                   sum(yv * yv) AS hsyy, sum(a * a) AS hsaa,
                   sum(b * b) AS hsbb, sum(yv * a) AS hsya,
                   sum(yv * b) AS hsyb, sum(a * b) AS hsab
            FROM flt GROUP BY 1
        ),
        t1 AS (
            SELECT bucket, n_used,
                   CAST(n_used AS DOUBLE) AS nd,
                   CAST(hsy AS DOUBLE) AS sy,
                   CAST(hsa AS DOUBLE) AS sa,
                   CAST(hsb AS DOUBLE) AS sb,
                   CAST(hsyy AS DOUBLE) AS syy,
                   CAST(hsaa AS DOUBLE) AS saa,
                   CAST(hsbb AS DOUBLE) AS sbb,
                   CAST(hsya AS DOUBLE) AS sya,
                   CAST(hsyb AS DOUBLE) AS syb,
                   CAST(hsab AS DOUBLE) AS sab
            FROM agg
        ),
        t2 AS (
            SELECT *,
                   nd*(saa*sbb - sab*sab) - sa*(sa*sbb - sab*sb)
                     + sb*(sa*sab - saa*sb) AS det
            FROM t1
        ),
        t3 AS (
            SELECT *,
                   CASE WHEN det <> 0.0 THEN
                     (sy*(saa*sbb - sab*sab) - sa*(sya*sbb - sab*syb)
                      + sb*(sya*sab - saa*syb)) / det END AS b0,
                   CASE WHEN det <> 0.0 THEN
                     (nd*(sya*sbb - sab*syb) - sy*(sa*sbb - sab*sb)
                      + sb*(sa*syb - sya*sb)) / det END AS b1,
                   CASE WHEN det <> 0.0 THEN
                     (nd*(saa*syb - sya*sab) - sa*(sa*syb - sya*sb)
                      + sy*(sa*sab - saa*sb)) / det END AS b2
            FROM t2
        ),
        t4 AS (
            SELECT *,
                   syy - b0*sy - b1*sya - b2*syb AS sse_u,
                   nd*saa - sa*sa AS varn,
                   CASE WHEN nd*saa - sa*sa > 0.0 THEN
                     (nd*sya - sa*sy) / (nd*saa - sa*sa) END AS a1
            FROM t3
        ),
        t5 AS (SELECT *, (sy - a1*sa) / nd AS a0 FROM t4),
        t6 AS (
            SELECT *, syy - a0*sy - a1*sya AS sse_r FROM t5
        )
        SELECT bucket, n_used,
               CASE WHEN det <> 0.0 THEN b2 END AS beta_x,
               CASE WHEN n_used >= 4 AND det <> 0.0 AND varn > 0.0
                         AND sse_u > 0.0
                    THEN (sse_r - sse_u) / (sse_u / (nd - 3.0))
               END AS f_stat,
               CASE WHEN n_used >= 4 AND det <> 0.0 AND varn > 0.0
                         AND sse_u > 0.0 THEN 1 END AS df1,
               CASE WHEN n_used >= 4 AND det <> 0.0 AND varn > 0.0
                         AND sse_u > 0.0
                    THEN CAST(n_used - 3 AS BIGINT) END AS df2
        FROM t6
    """
    oracles["arch_lm"] = """
        -- exact HUGEINT micro-unit centred squares; one R2 tree
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS HUGEINT) AS xq
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        stats AS (
            SELECT bucket, CAST(count(*) AS HUGEINT) AS n,
                   sum(xq) AS s
            FROM daily GROUP BY 1
        ),
        cw AS (
            SELECT d.bucket, d.d,
                   (st.n * d.xq - st.s) * (st.n * d.xq - st.s) AS w
            FROM daily d JOIN stats st ON d.bucket = st.bucket
        ),
        lagged AS (
            SELECT bucket, w,
                   lag(w, 1) OVER
                       (PARTITION BY bucket ORDER BY d) AS wp
            FROM cw
        ),
        flt AS (SELECT * FROM lagged WHERE wp IS NOT NULL),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
                   sum(wp) AS sx, sum(w) AS sy,
                   sum(wp * wp) AS sxx, sum(wp * w) AS sxy,
                   sum(w * w) AS syy
            FROM flt GROUP BY 1
        ),
        t AS (
            SELECT bucket, n_pairs,
                   CAST(n_pairs AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) AS sxd,
                   CAST(sy AS DOUBLE) AS syd,
                   CAST(sxx AS DOUBLE) AS sxxd,
                   CAST(sxy AS DOUBLE) AS sxyd,
                   CAST(syy AS DOUBLE) AS syyd
            FROM agg
        ),
        u AS (
            SELECT bucket, n_pairs, nd,
                   (nd * sxyd - sxd * syd)
                       * (nd * sxyd - sxd * syd) AS num2,
                   nd * sxxd - sxd * sxd AS dx,
                   nd * syyd - syd * syd AS dy
            FROM t
        )
        SELECT bucket, n_pairs,
               CASE WHEN n_pairs >= 3 AND dx > 0.0 AND dy > 0.0
                    THEN num2 / (dx * dy) END AS r2,
               CASE WHEN n_pairs >= 3 AND dx > 0.0 AND dy > 0.0
                    THEN nd * (num2 / (dx * dy)) END AS lm
        FROM u
    """
    oracles["var_backtest"] = """
        -- exact exception/transition counts; fixed ln trees with
        -- the 0*ln0 = 0 convention via CASE
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        d2 AS (
            SELECT bucket, d, CAST(v AS DOUBLE) AS x,
                   0.85 * (CAST(sum(v) OVER (PARTITION BY bucket)
                                AS DOUBLE)
                           / CAST(count(*) OVER
                                  (PARTITION BY bucket)
                                  AS DOUBLE)) AS var_floor
            FROM daily
        ),
        lagged AS (
            SELECT bucket,
                   CASE WHEN x < var_floor THEN 1 ELSE 0 END AS e,
                   lag(CASE WHEN x < var_floor THEN 1 ELSE 0 END, 1)
                       OVER (PARTITION BY bucket ORDER BY d) AS ep
            FROM d2
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(e) AS BIGINT) AS x,
                   CAST(sum(CASE WHEN ep = 0 AND e = 0 THEN 1
                            ELSE 0 END) AS BIGINT) AS n00,
                   CAST(sum(CASE WHEN ep = 0 AND e = 1 THEN 1
                            ELSE 0 END) AS BIGINT) AS n01,
                   CAST(sum(CASE WHEN ep = 1 AND e = 0 THEN 1
                            ELSE 0 END) AS BIGINT) AS n10,
                   CAST(sum(CASE WHEN ep = 1 AND e = 1 THEN 1
                            ELSE 0 END) AS BIGINT) AS n11
            FROM lagged GROUP BY 1
        ),
        t AS (
            SELECT *, CAST(n AS DOUBLE) AS nd,
                   CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
                   n00 + n01 AS t0, n10 + n11 AS t1
            FROM agg
        ),
        u AS (
            SELECT *,
                   -2.0 * (
                     (CASE WHEN n - x > 0 THEN
                        CAST(n - x AS DOUBLE) * ln(1.0 - 0.1)
                        ELSE 0.0 END)
                     + (CASE WHEN x > 0 THEN
                          CAST(x AS DOUBLE) * ln(0.1)
                          ELSE 0.0 END)
                     - (CASE WHEN n - x > 0 THEN
                          CAST(n - x AS DOUBLE) * ln(1.0 - rate)
                          ELSE 0.0 END)
                     - (CASE WHEN x > 0 THEN
                          CAST(x AS DOUBLE) * ln(rate)
                          ELSE 0.0 END)) AS lr_pof,
                   CAST(n01 + n11 AS DOUBLE)
                       / CAST(t0 + t1 AS DOUBLE) AS pi,
                   CAST(n01 AS DOUBLE) / CAST(t0 AS DOUBLE) AS pi0,
                   CAST(n11 AS DOUBLE) / CAST(t1 AS DOUBLE) AS pi1
            FROM t
        ),
        w AS (
            SELECT *,
                   -2.0 * (
                     ((CASE WHEN n00 + n10 > 0 THEN
                         CAST(n00 + n10 AS DOUBLE) * ln(1.0 - pi)
                         ELSE 0.0 END)
                      + (CASE WHEN n01 + n11 > 0 THEN
                           CAST(n01 + n11 AS DOUBLE) * ln(pi)
                           ELSE 0.0 END))
                     - ((CASE WHEN n00 > 0 THEN
                           CAST(n00 AS DOUBLE) * ln(1.0 - pi0)
                           ELSE 0.0 END)
                        + (CASE WHEN n01 > 0 THEN
                             CAST(n01 AS DOUBLE) * ln(pi0)
                             ELSE 0.0 END)
                        + (CASE WHEN n10 > 0 THEN
                             CAST(n10 AS DOUBLE) * ln(1.0 - pi1)
                             ELSE 0.0 END)
                        + (CASE WHEN n11 > 0 THEN
                             CAST(n11 AS DOUBLE) * ln(pi1)
                             ELSE 0.0 END))) AS lr_ind
            FROM u
        )
        SELECT bucket, n, x AS n_exceptions, rate,
               CASE WHEN n >= 2 THEN lr_pof END AS lr_pof,
               CASE WHEN t0 > 0 AND t1 > 0 AND t0 + t1 >= 2
                    THEN lr_ind END AS lr_ind,
               CASE WHEN n >= 2 AND t0 > 0 AND t1 > 0
                         AND t0 + t1 >= 2
                    THEN lr_pof + lr_ind END AS lr_cc
        FROM w
    """
    oracles["entropy_rate"] = """
        -- exact transition cells; one bounded fold
        WITH pairs AS (
            SELECT src, dst FROM (
                SELECT event_type AS src,
                       lead(event_type) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS dst
                FROM events
            ) WHERE src IS NOT NULL AND dst IS NOT NULL
        ),
        cells AS (
            SELECT src, dst, CAST(count(*) AS BIGINT) AS c
            FROM pairs GROUP BY 1, 2
        ),
        margins AS (
            SELECT src, CAST(sum(c) AS BIGINT) AS ni
            FROM cells GROUP BY 1
        ),
        packed AS (
            SELECT CAST(sum(c) AS BIGINT) AS n_pairs,
                   CAST(count(DISTINCT cells.src) AS BIGINT)
                       AS n_states,
                   list_sort(list(struct_pack(
                       src := cells.src, dst := dst, c := c,
                       ni := ni))) AS lv
            FROM cells JOIN margins ON cells.src = margins.src
        )
        SELECT n_pairs, n_states,
               CASE WHEN n_pairs > 0 THEN
                   -list_reduce(list_prepend(0.0,
                       [(CAST(e.c AS DOUBLE)
                         / CAST(n_pairs AS DOUBLE))
                        * ln(CAST(e.c AS DOUBLE)
                             / CAST(e.ni AS DOUBLE)) FOR e IN lv]),
                       (a, v) -> a + v) END AS h_rate,
               CASE WHEN n_pairs > 0 AND n_states >= 2 THEN
                   -list_reduce(list_prepend(0.0,
                       [(CAST(e.c AS DOUBLE)
                         / CAST(n_pairs AS DOUBLE))
                        * ln(CAST(e.c AS DOUBLE)
                             / CAST(e.ni AS DOUBLE)) FOR e IN lv]),
                       (a, v) -> a + v)
                   / ln(CAST(n_states AS DOUBLE)) END AS h_norm
        FROM packed
    """
    oracles["meta_pool"] = """
        -- order-pinned weight folds; staged fixed/DL/random trees
        WITH stats AS (
            SELECT n.n_regionkey AS region, c.c_nationkey,
                   CAST(count(*) AS BIGINT) AS cnt,
                   sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
                   sum(CAST(c_acctbal AS DECIMAL(18,2))
                       * CAST(c_acctbal AS DECIMAL(18,2))) AS q
            FROM customer c JOIN nation n
              ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        eff AS (
            SELECT region,
                   CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) AS y,
                   sqrt(((CAST(cnt AS DOUBLE) * CAST(q AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                         / (CAST(cnt AS DOUBLE)
                            * (CAST(cnt AS DOUBLE) - 1.0)))
                        / CAST(cnt AS DOUBLE)) AS se
            FROM stats
        ),
        packed AS (
            SELECT region, CAST(count(*) AS BIGINT) AS k,
                   list_sort(list(struct_pack(y := y, se := se)))
                       AS lv
            FROM eff GROUP BY 1
        ),
        s1 AS (
            SELECT region, k, lv,
                   list_reduce(list_prepend(0.0,
                       [1.0 / (e.se * e.se) FOR e IN lv]),
                       (a, v) -> a + v) AS sw,
                   list_reduce(list_prepend(0.0,
                       [(1.0 / (e.se * e.se)) * e.y FOR e IN lv]),
                       (a, v) -> a + v) AS swy,
                   list_reduce(list_prepend(0.0,
                       [(1.0 / (e.se * e.se))
                        * (1.0 / (e.se * e.se)) FOR e IN lv]),
                       (a, v) -> a + v) AS sww
            FROM packed
        ),
        s2 AS (SELECT *, swy / sw AS yf FROM s1),
        s3 AS (
            SELECT *,
                   list_reduce(list_prepend(0.0,
                       [(1.0 / (e.se * e.se)) * (e.y - yf)
                        * (e.y - yf) FOR e IN lv]),
                       (a, v) -> a + v) AS qstat
            FROM s2
        ),
        s4 AS (
            SELECT *,
                   CASE WHEN k >= 2 AND sw - sww / sw > 0.0
                        THEN greatest(0.0,
                            (qstat - (CAST(k AS DOUBLE) - 1.0))
                            / (sw - sww / sw))
                        ELSE 0.0 END AS tau2
            FROM s3
        ),
        s5 AS (
            SELECT *,
                   list_reduce(list_prepend(0.0,
                       [1.0 / (e.se * e.se + tau2) FOR e IN lv]),
                       (a, v) -> a + v) AS swr,
                   list_reduce(list_prepend(0.0,
                       [(1.0 / (e.se * e.se + tau2)) * e.y
                        FOR e IN lv]),
                       (a, v) -> a + v) AS swry
            FROM s4
        )
        SELECT region, k,
               yf AS effect_fixed,
               sqrt(1.0 / sw) AS se_fixed,
               CASE WHEN k >= 2 THEN qstat END AS q,
               CASE WHEN k >= 2 AND qstat > 0.0
                    THEN greatest(0.0,
                        (qstat - (CAST(k AS DOUBLE) - 1.0)) / qstat)
               END AS i2,
               CASE WHEN k >= 2 THEN tau2 END AS tau2,
               swry / swr AS effect_random,
               sqrt(1.0 / swr) AS se_random
        FROM s5
    """
    oracles["km_ci"] = """
        -- the L159 prefix folds + the Greenwood sum; NULL bands
        -- after the risk set exhausts (NULL propagates in the fold)
        WITH u AS (
            SELECT user_id,
                   (max(event_id) - min(event_id)) % 30 AS dur
            FROM events GROUP BY 1
        ),
        d AS (
            SELECT user_id % 2 AS cohort, dur,
                   CASE WHEN user_id % 5 <> 0 THEN 1 ELSE 0 END AS ev
            FROM u
        ),
        pts AS (
            SELECT cohort, CAST(dur AS BIGINT) AS t,
                   CAST(sum(ev) AS BIGINT) AS d,
                   CAST(sum(1 - ev) AS BIGINT) AS c
            FROM d WHERE dur IS NOT NULL GROUP BY 1, 2
        ),
        risk AS (
            SELECT cohort, t, d, c,
                   CAST(sum(d + c) OVER (PARTITION BY cohort)
                        - coalesce(sum(d + c) OVER (
                              PARTITION BY cohort ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0)
                        AS BIGINT) AS n
            FROM pts
        ),
        packed AS (
            SELECT cohort,
                   list_sort(list(struct_pack(
                       t := t, d := d, c := c, n := n))) AS a
            FROM risk GROUP BY 1
        ),
        rws AS (SELECT cohort, a, unnest(a) AS s FROM packed),
        folded AS (
            SELECT cohort, s.t AS t, s.n AS n_risk,
                   s.d AS n_events,
                   list_reduce(list_prepend(1.0,
                       [CAST(x.n - x.d AS DOUBLE)
                        / CAST(x.n AS DOUBLE)
                        FOR x IN list_filter(a, x -> x.t <= s.t)]),
                       (acc, v) -> acc * v) AS survival,
                   list_reduce(list_prepend(0.0,
                       [CASE WHEN x.n > x.d THEN
                            CAST(x.d AS DOUBLE)
                            / (CAST(x.n AS DOUBLE)
                               * CAST(x.n - x.d AS DOUBLE)) END
                        FOR x IN list_filter(a, x -> x.t <= s.t)]),
                       (acc, v) -> acc + v) AS gw
            FROM rws
        )
        SELECT cohort, t, n_risk, n_events, survival,
               survival * sqrt(gw) AS se,
               CASE WHEN gw IS NOT NULL THEN
                   greatest(0.0,
                       survival - 1.96 * (survival * sqrt(gw)))
               END AS ci_lo,
               CASE WHEN gw IS NOT NULL THEN
                   least(1.0,
                       survival + 1.96 * (survival * sqrt(gw)))
               END AS ci_hi
        FROM folded
    """
    oracles["seasonal_mk"] = """
        -- per-phase L161 pair lattices; exact combined S; fold-
        -- pinned combined Var
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS dd,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        base AS (
            SELECT bucket,
                   CAST(dd - DATE '1970-01-01' AS BIGINT) % 7
                       AS phase,
                   CAST(CAST(dd - DATE '1970-01-01' AS BIGINT)
                        AS DOUBLE) AS t,
                   x
            FROM daily
        ),
        s_tbl AS (
            SELECT a.bucket, a.phase,
                   CAST(sum(CAST(sign(b.x - a.x) AS BIGINT))
                        AS BIGINT) AS s
            FROM base a JOIN base b
              ON a.bucket = b.bucket AND a.phase = b.phase
             AND (a.t < b.t OR (a.t = b.t AND a.x < b.x))
            GROUP BY 1, 2
        ),
        nn AS (
            SELECT bucket, phase, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1, 2
        ),
        ties AS (
            SELECT bucket, phase,
                   CAST(sum(tc * (tc - 1) * (2 * tc + 5))
                        AS BIGINT) AS tie_term
            FROM (SELECT bucket, phase,
                         CAST(count(*) AS BIGINT) AS tc
                  FROM base GROUP BY bucket, phase, x)
            GROUP BY 1, 2
        ),
        per_phase AS (
            SELECT nn.bucket, nn.phase, nn.n,
                   COALESCE(s_tbl.s, 0) AS s,
                   CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                        - ties.tie_term AS DOUBLE) / 18.0 AS var_s
            FROM nn
            LEFT JOIN s_tbl ON nn.bucket = s_tbl.bucket
                           AND nn.phase = s_tbl.phase
            JOIN ties ON nn.bucket = ties.bucket
                     AND nn.phase = ties.phase
        ),
        packed AS (
            SELECT bucket, CAST(sum(n) AS BIGINT) AS n,
                   CAST(sum(s) AS BIGINT) AS s,
                   list_sort(list(struct_pack(ph := phase,
                                              v := var_s))) AS lv
            FROM per_phase GROUP BY 1
        ),
        folded AS (
            SELECT bucket, n, s,
                   list_reduce(list_prepend(0.0,
                       [e.v FOR e IN lv]),
                       (a, v) -> a + v) AS var_s
            FROM packed
        )
        SELECT bucket, 7 AS period, n, s, var_s,
               CASE WHEN var_s > 0.0 THEN
                   CASE WHEN s > 0 THEN
                            CAST(s - 1 AS DOUBLE) / sqrt(var_s)
                        WHEN s < 0 THEN
                            CAST(s + 1 AS DOUBLE) / sqrt(var_s)
                        ELSE 0.0 END
               END AS z
        FROM folded
    """
    oracles["lorenz"] = """
        -- one window pass; exact decimal cumsums; one division each
        WITH base AS (
            SELECT c_mktsegment AS seg,
                   CAST(greatest(c_acctbal, 0) AS DECIMAL(18,2)) AS x
            FROM customer WHERE c_acctbal IS NOT NULL
        ),
        ranked AS (
            SELECT seg, x,
                   CAST(row_number() OVER w_o AS BIGINT) AS rn,
                   sum(x) OVER w_c AS cum,
                   CAST(count(*) OVER w_a AS BIGINT) AS n,
                   sum(x) OVER w_a AS tot
            FROM base
            WINDOW w_o AS (PARTITION BY seg ORDER BY x),
                   w_c AS (PARTITION BY seg ORDER BY x
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW),
                   w_a AS (PARTITION BY seg)
        ),
        pts AS (
            SELECT ranked.*, p.point
            FROM ranked CROSS JOIN
                 (SELECT unnest(generate_series(1, 10)) AS point) p
            WHERE rn = (point * n) // 10
        )
        SELECT seg, CAST(point AS INTEGER) AS point,
               CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) AS pop_share,
               CASE WHEN tot > 0 THEN
                   CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
               END AS cum_share
        FROM pts
    """

    _HOURLY = """
            SELECT user_id % 2 AS bucket,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
    """

    def _rs_m_sql(m: int) -> str:
        blk = (
            f"list_transform(generate_series(b*{m} + 1, "
            f"b*{m} + {m}), i -> xs[i])"
        )
        mean = (
            f"(list_reduce(list_prepend(0.0, {blk}), "
            f"(a, x) -> a + x) / {float(m)})"
        )
        var = (
            f"(list_reduce(list_prepend(0.0, {blk}), "
            f"(a, x) -> a + (x - {mean}) * (x - {mean})) "
            f"/ {float(m)})"
        )
        scan = (
            f"list_reduce(list_prepend("
            f"[0.0, CAST('-infinity' AS DOUBLE), "
            f"CAST('infinity' AS DOUBLE)], "
            f"list_transform({blk}, x -> [x, 0.0, 0.0])), "
            f"(a, e) -> [a[1] + (e[1] - {mean}), "
            f"greatest(a[2], a[1] + (e[1] - {mean})), "
            f"least(a[3], a[1] + (e[1] - {mean}))])"
        )
        rs_list = (
            f"list_transform(generate_series(0, "
            f"CAST(n // {m} AS INTEGER) - 1), "
            f"b -> CASE WHEN {var} > 0.0 THEN "
            f"({scan}[2] - {scan}[3]) / sqrt({var}) END)"
        )
        used = f"list_filter({rs_list}, v -> v IS NOT NULL)"
        return f"""
            SELECT bucket, {m} AS m,
                   CAST(n // {m} AS INTEGER) AS n_blocks,
                   CASE WHEN len({used}) > 0 THEN
                       list_reduce(list_prepend(0.0, {used}),
                                   (a, v) -> a + v)
                       / CAST(len({used}) AS DOUBLE) END AS rs_mean
            FROM pl WHERE n // {m} >= 1
        """

    _RS_BODY = "\n            UNION ALL\n".join(
        _rs_m_sql(m) for m in (8, 16, 32, 64)
    )
    oracles["rs_analysis"] = f"""
        -- per-block mean/var folds + (cum, max, min) 3-list scans,
        -- generated per block size (the Spark op's exact trees)
        WITH hourly AS ({_HOURLY}),
        pl AS (
            SELECT bucket, list(x ORDER BY t) AS xs,
                   CAST(len(list(x ORDER BY t)) AS INTEGER) AS n
            FROM hourly GROUP BY 1
        )
        {_RS_BODY}
    """
    oracles["hurst"] = f"""
        -- the rs table nested verbatim; exact-decimal L135 OLS twin
        WITH rs AS ({oracles["rs_analysis"]}),
        pts AS (
            SELECT bucket,
                   CAST(ln(CAST(m AS DOUBLE)) AS DECIMAL(18,6)) AS lx,
                   CAST(ln(rs_mean) AS DECIMAL(18,6)) AS ly
            FROM rs WHERE rs_mean IS NOT NULL AND rs_mean > 0
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   sum(lx) AS sx, sum(ly) AS sy,
                   sum(lx * lx) AS sxx, sum(lx * ly) AS sxy,
                   sum(ly * ly) AS syy
            FROM pts GROUP BY 1
        ),
        t AS (
            SELECT bucket, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) AS sxd,
                   CAST(sy AS DOUBLE) AS syd,
                   CAST(sxx AS DOUBLE) AS sxxd,
                   CAST(sxy AS DOUBLE) AS sxyd,
                   CAST(syy AS DOUBLE) AS syyd
            FROM agg
        ),
        u AS (
            SELECT bucket, n,
                   nd * sxyd - sxd * syd AS cov_n,
                   nd * sxxd - sxd * sxd AS varx_n,
                   nd * syyd - syd * syd AS vary_n,
                   nd, sxd, syd
            FROM t
        )
        SELECT bucket, n,
               CASE WHEN varx_n <> 0.0 THEN cov_n / varx_n
                    END AS slope,
               CASE WHEN varx_n <> 0.0 THEN
                   (syd - (cov_n / varx_n) * sxd) / nd
               END AS intercept,
               CASE WHEN varx_n <> 0.0 AND vary_n <> 0.0 THEN
                   (cov_n * cov_n) / (varx_n * vary_n)
               END AS r2
        FROM u
    """
    oracles["pentropy"] = f"""
        -- exact ordinal-pattern cells; one bounded fold
        WITH hourly AS ({_HOURLY}),
        tri AS (
            SELECT bucket, x AS x0,
                   lead(x, 1) OVER w AS x1,
                   lead(x, 2) OVER w AS x2
            FROM hourly
            WINDOW w AS (PARTITION BY bucket ORDER BY t)
        ),
        flt AS (
            SELECT * FROM tri
            WHERE x1 IS NOT NULL AND x2 IS NOT NULL
        ),
        cells AS (
            SELECT bucket,
                   (CASE WHEN x0 < x1 THEN 0
                         WHEN x0 = x1 THEN 1 ELSE 2 END) * 9
                   + (CASE WHEN x0 < x2 THEN 0
                           WHEN x0 = x2 THEN 1 ELSE 2 END) * 3
                   + (CASE WHEN x1 < x2 THEN 0
                           WHEN x1 = x2 THEN 1 ELSE 2 END) AS p,
                   CAST(count(*) AS BIGINT) AS c
            FROM flt GROUP BY 1, 2
        ),
        agg AS (
            SELECT bucket, CAST(sum(c) AS BIGINT) AS n_windows,
                   CAST(count(*) AS BIGINT) AS k_patterns,
                   list_sort(list(struct_pack(p := p, c := c)))
                       AS lv
            FROM cells GROUP BY 1
        )
        SELECT bucket, n_windows, k_patterns,
               CASE WHEN n_windows > 0 THEN
                   -list_reduce(list_prepend(0.0,
                       [(CAST(e.c AS DOUBLE)
                         / CAST(n_windows AS DOUBLE))
                        * ln(CAST(e.c AS DOUBLE)
                             / CAST(n_windows AS DOUBLE))
                        FOR e IN lv]),
                       (a, v) -> a + v) END AS h,
               CASE WHEN n_windows > 0 THEN
                   -list_reduce(list_prepend(0.0,
                       [(CAST(e.c AS DOUBLE)
                         / CAST(n_windows AS DOUBLE))
                        * ln(CAST(e.c AS DOUBLE)
                             / CAST(n_windows AS DOUBLE))
                        FOR e IN lv]),
                       (a, v) -> a + v) / ln(6.0) END AS h_norm
        FROM agg
    """
    oracles["cusum_squares"] = """
        -- exact micro-unit square prefix sums; deterministic argmax
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS HUGEINT) AS xq
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        staged AS (
            SELECT bucket,
                   CAST(row_number() OVER w_o AS BIGINT) AS k,
                   sum(xq * xq) OVER w_p AS ck,
                   sum(xq * xq) OVER w_a AS cn,
                   CAST(count(*) OVER w_a AS BIGINT) AS n
            FROM daily
            WINDOW w_o AS (PARTITION BY bucket ORDER BY d),
                   w_p AS (PARTITION BY bucket ORDER BY d
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW),
                   w_a AS (PARTITION BY bucket)
        ),
        scored AS (
            SELECT bucket, k, n,
                   abs(CAST(ck AS DOUBLE) / CAST(cn AS DOUBLE)
                       - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                       AS ad
            FROM staged WHERE cn > 0
        ),
        top AS (
            SELECT *, row_number() OVER
                       (PARTITION BY bucket
                        ORDER BY ad DESC, k ASC) AS rn
            FROM scored
        )
        SELECT bucket, n, k AS k_star, ad AS d_max,
               sqrt(CAST(n AS DOUBLE) / 2.0) * ad AS stat
        FROM top WHERE rn = 1
    """
    oracles["energy"] = """
        -- exact decimal |difference| pair lattices; nested folds
        WITH flt AS (
            SELECT user_id % 2 AS bucket, event_type AS g,
                   CAST(value AS DECIMAL(18,4)) AS x
            FROM events
            WHERE user_id < 30 AND value IS NOT NULL
              AND event_type IN ('click', 'view')
        ),
        packed AS (
            SELECT bucket,
                   list(x ORDER BY x)
                       FILTER (WHERE g = 'click') AS xa,
                   list(x ORDER BY x)
                       FILTER (WHERE g = 'view') AS xb
            FROM flt GROUP BY 1
        ),
        folds AS (
            SELECT bucket,
                   CAST(len(xa) AS INTEGER) AS na,
                   CAST(len(xb) AS INTEGER) AS nb,
                   list_reduce(list_prepend(0.0,
                       list_transform(xa, x ->
                           list_reduce(list_prepend(0.0,
                               list_transform(xb, y ->
                                   CAST(abs(x - y) AS DOUBLE))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) AS sxy,
                   list_reduce(list_prepend(0.0,
                       list_transform(xa, x ->
                           list_reduce(list_prepend(0.0,
                               list_transform(xa, y ->
                                   CAST(abs(x - y) AS DOUBLE))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) AS sxx,
                   list_reduce(list_prepend(0.0,
                       list_transform(xb, x ->
                           list_reduce(list_prepend(0.0,
                               list_transform(xb, y ->
                                   CAST(abs(x - y) AS DOUBLE))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) AS syy
            FROM packed
        ),
        t AS (
            SELECT bucket, na, nb,
                   CAST(na AS DOUBLE) AS nad,
                   CAST(nb AS DOUBLE) AS nbd,
                   sxy, sxx, syy
            FROM folds
        )
        SELECT bucket, na AS n_a, nb AS n_b,
               CASE WHEN na > 0 AND nb > 0 THEN
                   2.0 * sxy / (nad * nbd)
                   - sxx / (nad * nad)
                   - syy / (nbd * nbd) END AS e_dist,
               CASE WHEN na > 0 AND nb > 0 THEN
                   nad * nbd / (nad + nbd)
                   * (2.0 * sxy / (nad * nbd)
                      - sxx / (nad * nad)
                      - syy / (nbd * nbd)) END AS t_stat
        FROM t
    """
    oracles["dcor"] = """
        -- double-centred distance folds; row/grand means in-array
        WITH d2 AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   COALESCE(sum(CASE WHEN event_type = 'click'
                       THEN CAST(value AS DECIMAL(18,2)) END),
                       CAST(0 AS DECIMAL(18,2))) AS y,
                   COALESCE(sum(CASE WHEN event_type = 'view'
                       THEN CAST(value AS DECIMAL(18,2)) END),
                       CAST(0 AS DECIMAL(18,2))) AS x
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
            GROUP BY 1, 2
        ),
        packed AS (
            SELECT bucket,
                   list_sort(list(struct_pack(
                       x := CAST(y AS DECIMAL(18,4)),
                       y := CAST(x AS DECIMAL(18,4))))) AS a
            FROM d2 GROUP BY 1
        ),
        s0 AS (
            SELECT bucket,
                   list_transform(a, s -> s.x) AS xs,
                   list_transform(a, s -> s.y) AS ys,
                   CAST(len(a) AS INTEGER) AS n,
                   CAST(len(a) AS DOUBLE) AS nd
            FROM packed
        ),
        s1 AS (
            SELECT *,
                   list_transform(generate_series(1, n), i ->
                       list_reduce(list_prepend(0.0,
                           list_transform(xs, v ->
                               CAST(abs(xs[i] - v) AS DOUBLE))),
                           (a, v) -> a + v) / nd) AS ra,
                   list_transform(generate_series(1, n), i ->
                       list_reduce(list_prepend(0.0,
                           list_transform(ys, v ->
                               CAST(abs(ys[i] - v) AS DOUBLE))),
                           (a, v) -> a + v) / nd) AS rb
            FROM s0
        ),
        s2 AS (
            SELECT *,
                   list_reduce(list_prepend(0.0, ra),
                               (a, v) -> a + v) / nd AS ga,
                   list_reduce(list_prepend(0.0, rb),
                               (a, v) -> a + v) / nd AS gb
            FROM s1
        ),
        s3 AS (
            SELECT bucket, n,
                   greatest(0.0, list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, n), i ->
                           list_reduce(list_prepend(0.0,
                               list_transform(generate_series(1, n),
                                   j -> (CAST(abs(xs[i] - xs[j])
                                             AS DOUBLE)
                                         - ra[i] - ra[j] + ga)
                                        * (CAST(abs(ys[i] - ys[j])
                                               AS DOUBLE)
                                           - rb[i] - rb[j] + gb))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) / (nd * nd)) AS dcov2,
                   greatest(0.0, list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, n), i ->
                           list_reduce(list_prepend(0.0,
                               list_transform(generate_series(1, n),
                                   j -> (CAST(abs(xs[i] - xs[j])
                                             AS DOUBLE)
                                         - ra[i] - ra[j] + ga)
                                        * (CAST(abs(xs[i] - xs[j])
                                               AS DOUBLE)
                                           - ra[i] - ra[j] + ga))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) / (nd * nd)) AS dvar_x,
                   greatest(0.0, list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, n), i ->
                           list_reduce(list_prepend(0.0,
                               list_transform(generate_series(1, n),
                                   j -> (CAST(abs(ys[i] - ys[j])
                                             AS DOUBLE)
                                         - rb[i] - rb[j] + gb)
                                        * (CAST(abs(ys[i] - ys[j])
                                               AS DOUBLE)
                                           - rb[i] - rb[j] + gb))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) / (nd * nd)) AS dvar_y
            FROM s2
        )
        SELECT bucket, n, dcov2, dvar_x, dvar_y,
               CASE WHEN dvar_x > 0.0 AND dvar_y > 0.0 THEN
                   sqrt(dcov2 / sqrt(dvar_x * dvar_y))
               END AS dcor
        FROM s3
    """
    oracles["cucconi"] = """
        -- exact doubled-rank square sums (HUGEINT); one C tree
        WITH pts AS (
            SELECT user_id % 2 AS bucket,
                   CAST(floor(value) AS BIGINT) AS v,
                   event_type AS g, CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
            GROUP BY 1, 2, 3
        ),
        vals AS (
            SELECT bucket, v,
                   CAST(sum(CASE WHEN g = 'click' THEN c ELSE 0 END)
                        AS BIGINT) AS la,
                   CAST(sum(CASE WHEN g = 'view' THEN c ELSE 0 END)
                        AS BIGINT) AS lb
            FROM pts GROUP BY 1, 2
        ),
        s1 AS (
            SELECT bucket, la, la + lb AS l,
                   CAST(sum(la + lb) OVER w_p AS BIGINT) AS cp,
                   CAST(sum(la) OVER w_a AS BIGINT) AS na,
                   CAST(sum(lb) OVER w_a AS BIGINT) AS nb
            FROM vals
            WINDOW w_p AS (PARTITION BY bucket ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                   w_a AS (PARTITION BY bucket)
        ),
        s2 AS (
            SELECT bucket, la, na, nb,
                   CAST(2*cp - l + 1 AS HUGEINT) AS dr,
                   CAST(2 AS HUGEINT)
                       * (CAST(na + nb AS HUGEINT) + 1)
                       - CAST(2*cp - l + 1 AS HUGEINT) AS cdr
            FROM s1
        ),
        agg AS (
            SELECT bucket, na, nb,
                   sum(CAST(la AS HUGEINT) * dr * dr) AS sr4,
                   sum(CAST(la AS HUGEINT) * cdr * cdr) AS sc4
            FROM s2 GROUP BY 1, 2, 3
        ),
        t AS (
            SELECT bucket, na, nb,
                   CAST(na AS DOUBLE) AS nad,
                   CAST(nb AS DOUBLE) AS nbd,
                   CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) AS nd,
                   CAST(sr4 AS DOUBLE) / 4.0 AS sr2,
                   CAST(sc4 AS DOUBLE) / 4.0 AS sc2
            FROM agg
        ),
        u AS (
            SELECT *,
                   sqrt(nad * nbd * (nd + 1.0) * (2.0 * nd + 1.0)
                        * (8.0 * nd + 11.0) / 5.0) AS den,
                   2.0 * (nd * nd - 4.0)
                       / ((2.0 * nd + 1.0) * (8.0 * nd + 11.0))
                       - 1.0 AS rho
            FROM t
        ),
        w AS (
            SELECT *,
                   (6.0 * sr2 - nad * (nd + 1.0)
                        * (2.0 * nd + 1.0)) / den AS uu,
                   (6.0 * sc2 - nad * (nd + 1.0)
                        * (2.0 * nd + 1.0)) / den AS vv
            FROM u
        )
        SELECT bucket, na AS n_a, nb AS n_b,
               CASE WHEN na >= 1 AND nb >= 1 AND na + nb >= 3
                    THEN uu END AS u,
               CASE WHEN na >= 1 AND nb >= 1 AND na + nb >= 3
                    THEN vv END AS v,
               CASE WHEN na >= 1 AND nb >= 1 AND na + nb >= 3
                    THEN (uu * uu + vv * vv - 2.0 * rho * uu * vv)
                         / (2.0 * (1.0 - rho * rho)) END AS c
        FROM w
    """
    oracles["dtw"] = """
        -- the DP recurrence with LIST accumulators; elements of the
        -- index sequences encoded as 1-double lists so list_reduce's
        -- same-type rule holds (acc row = DOUBLE[], element = [i])
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        packed AS (
            SELECT list(x ORDER BY d)
                       FILTER (WHERE bucket = 0) AS xa,
                   list(x ORDER BY d)
                       FILTER (WHERE bucket = 1) AS xb
            FROM daily
        ),
        sized AS (
            SELECT xa, xb,
                   CAST(len(xa) AS INTEGER) AS n,
                   CAST(len(xb) AS INTEGER) AS m
            FROM packed
        ),
        dp AS (
            SELECT n, m,
                   list_reduce(
                       list_prepend(
                           list_transform(generate_series(0, m),
                               j -> CASE WHEN j = 0 THEN 0.0
                                    ELSE CAST('infinity' AS DOUBLE)
                                    END),
                           list_transform(generate_series(1, n),
                               i -> [CAST(i AS DOUBLE)])),
                       (prev, ei) -> list_reduce(
                           list_prepend(
                               [CAST('infinity' AS DOUBLE)],
                               list_transform(generate_series(1, m),
                                   j -> [CAST(j AS DOUBLE)])),
                           (acc, ej) -> list_append(acc,
                               abs(xa[CAST(ei[1] AS INTEGER)]
                                   - xb[CAST(ej[1] AS INTEGER)])
                               + least(
                                   prev[CAST(ej[1] AS INTEGER)],
                                   prev[CAST(ej[1] AS INTEGER) + 1],
                                   acc[len(acc)])))
                   ) AS final_row
            FROM sized
        )
        SELECT n AS n_a, m AS n_b,
               CASE WHEN n > 0 AND m > 0
                         AND final_row[m + 1]
                             <> CAST('infinity' AS DOUBLE)
                    THEN final_row[m + 1] END AS dtw,
               CASE WHEN n > 0 AND m > 0
                         AND final_row[m + 1]
                             <> CAST('infinity' AS DOUBLE)
                    THEN final_row[m + 1]
                         / CAST(n + m AS DOUBLE) END AS dtw_norm
        FROM dp
    """
    oracles["gini_jk"] = """
        -- micro-unit twin of the exact LOO rank-shift identity (the
        -- Gini ratio is scale-invariant, so HUGEINT sums suffice)
        WITH base AS (
            SELECT c_mktsegment AS seg,
                   CAST(CAST(CAST(greatest(c_acctbal, 0)
                        AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS HUGEINT) AS xq
            FROM customer WHERE c_acctbal IS NOT NULL
        ),
        idx AS (
            SELECT seg, xq,
                   CAST(row_number() OVER w_o AS BIGINT) AS k,
                   sum(xq) OVER w_p AS pk
            FROM base
            WINDOW w_o AS (PARTITION BY seg ORDER BY xq),
                   w_p AS (PARTITION BY seg ORDER BY xq
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
        ),
        ranked AS (
            SELECT seg, xq, k, pk,
                   CAST(count(*) OVER w_a AS BIGINT) AS n,
                   sum(xq) OVER w_a AS s,
                   sum(CAST(k AS HUGEINT) * xq) OVER w_a AS t
            FROM idx
            WINDOW w_a AS (PARTITION BY seg)
        ),
        loo AS (
            SELECT seg, k, n, s, t,
                   CASE WHEN n >= 2
                             AND CAST(s - xq AS DOUBLE) > 0.0 THEN
                       (2.0 * CAST(t - CAST(k AS HUGEINT) * xq
                                   - (s - pk) AS DOUBLE)
                        - (CAST(n - 1 AS DOUBLE) + 1.0)
                          * CAST(s - xq AS DOUBLE))
                       / (CAST(n - 1 AS DOUBLE)
                          * CAST(s - xq AS DOUBLE)) END AS g
            FROM ranked
        ),
        packed AS (
            SELECT seg, n, s, t,
                   list_sort(list(struct_pack(k := k, g := g)))
                       AS lv
            FROM loo GROUP BY 1, 2, 3, 4
        ),
        m AS (
            SELECT seg, n, s, t, lv,
                   list_reduce(list_prepend(0.0,
                       [e.g FOR e IN lv]),
                       (a, v) -> a + v)
                       / CAST(n AS DOUBLE) AS gbar
            FROM packed
        ),
        f AS (
            SELECT seg, n, s, t,
                   list_reduce(list_prepend(0.0,
                       [(e.g - gbar) * (e.g - gbar) FOR e IN lv]),
                       (a, v) -> a + v) AS ssq
            FROM m
        )
        SELECT seg, n,
               CASE WHEN n >= 2 AND CAST(s AS DOUBLE) > 0.0 THEN
                   (2.0 * CAST(t AS DOUBLE)
                    - (CAST(n AS DOUBLE) + 1.0) * CAST(s AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
               END AS gini,
               CASE WHEN n >= 2 AND CAST(s AS DOUBLE) > 0.0 THEN
                   sqrt((CAST(n AS DOUBLE) - 1.0)
                        / CAST(n AS DOUBLE) * ssq)
               END AS se_jack
        FROM f
    """

    _LABEL_SCORE = """
            SELECT user_id % 2 AS bucket,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END AS y,
                   CAST(floor(value) AS DOUBLE) AS s
            FROM events WHERE value IS NOT NULL
    """
    oracles["youden"] = f"""
        -- exact grid counts; deterministic (J desc, t desc) pick
        WITH ls AS ({_LABEL_SCORE}),
        cells AS (
            SELECT bucket, s AS t,
                   CAST(sum(y) AS BIGINT) AS p,
                   CAST(sum(1 - y) AS BIGINT) AS n
            FROM ls GROUP BY 1, 2
        ),
        scored AS (
            SELECT bucket, t,
                   CAST(sum(p) OVER w_p AS BIGINT) AS cp,
                   CAST(sum(n) OVER w_p AS BIGINT) AS cn,
                   CAST(sum(p) OVER w_a AS BIGINT) AS n_pos,
                   CAST(sum(n) OVER w_a AS BIGINT) AS n_neg
            FROM cells
            WINDOW w_p AS (PARTITION BY bucket ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                   w_a AS (PARTITION BY bucket)
        ),
        staged AS (
            SELECT bucket, t, n_pos, n_neg,
                   CAST(cp AS DOUBLE) / CAST(n_pos AS DOUBLE)
                       AS tpr,
                   CAST(cn AS DOUBLE) / CAST(n_neg AS DOUBLE)
                       AS fpr
            FROM scored WHERE n_pos > 0 AND n_neg > 0
        ),
        top AS (
            SELECT *, tpr - fpr AS j,
                   row_number() OVER (PARTITION BY bucket
                       ORDER BY tpr - fpr DESC, t DESC) AS rn
            FROM staged
        )
        SELECT bucket, n_pos, n_neg,
               CAST(t AS DOUBLE) AS threshold, tpr, fpr, j
        FROM top WHERE rn = 1
    """
    oracles["pr_auc"] = f"""
        -- exact grid; order-pinned step-AP fold (descending t)
        WITH ls AS ({_LABEL_SCORE}),
        cells AS (
            SELECT bucket, s AS t,
                   CAST(sum(y) AS BIGINT) AS p,
                   CAST(sum(1 - y) AS BIGINT) AS n
            FROM ls GROUP BY 1, 2
        ),
        pre AS (
            SELECT bucket, t,
                   CAST(sum(p) OVER w_p AS BIGINT) AS cp,
                   CAST(sum(n) OVER w_p AS BIGINT) AS cn
            FROM cells
            WINDOW w_p AS (PARTITION BY bucket ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        ),
        scored AS (
            SELECT bucket, t, cp, cn,
                   COALESCE(lag(cp, 1) OVER
                       (PARTITION BY bucket ORDER BY t DESC), 0)
                       AS cpl
            FROM pre
        ),
        packed AS (
            SELECT bucket,
                   CAST(max(cp) AS BIGINT) AS n_pos,
                   CAST(max(cn) AS BIGINT) AS n_neg,
                   CAST(count(*) AS BIGINT) AS k_thresholds,
                   list_sort(list(struct_pack(
                       o := -t, cp := cp, cpl := cpl, cn := cn)))
                       AS lv
            FROM scored GROUP BY 1
        )
        SELECT bucket, n_pos, n_neg, k_thresholds,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   list_reduce(list_prepend(0.0,
                       [(CAST(e.cp - e.cpl AS DOUBLE)
                         / CAST(n_pos AS DOUBLE))
                        * (CAST(e.cp AS DOUBLE)
                           / CAST(e.cp + e.cn AS DOUBLE))
                        FOR e IN lv]),
                       (a, v) -> a + v) END AS ap
        FROM packed
    """
    oracles["seasonal_ts"] = """
        -- within-phase pair lattices; pooled exact slope median
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS dd,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        base AS (
            SELECT bucket,
                   CAST(dd - DATE '1970-01-01' AS BIGINT) % 7
                       AS phase,
                   CAST(CAST(dd - DATE '1970-01-01' AS BIGINT)
                        AS DOUBLE) AS t,
                   x
            FROM daily
        ),
        slopes AS (
            SELECT a.bucket,
                   (b.x - a.x) / (b.t - a.t) AS sl
            FROM base a JOIN base b
              ON a.bucket = b.bucket AND a.phase = b.phase
             AND a.t < b.t
        ),
        pooled AS (
            SELECT bucket, list_sort(list(sl)) AS s,
                   CAST(count(*) AS INTEGER) AS k
            FROM slopes GROUP BY 1
        )
        SELECT bucket, 7 AS period, k AS n_slopes,
               CASE WHEN k > 0 THEN
                   CASE WHEN k % 2 = 1
                        THEN s[CAST(floor(k / 2) + 1 AS INTEGER)]
                        ELSE (s[CAST(floor((k + 1) / 2) AS INTEGER)]
                              + s[CAST(floor(k / 2) + 1 AS INTEGER)])
                             / 2.0 END
               END AS slope
        FROM pooled
    """
    oracles["records"] = """
        -- one running-max window; harmonic moment folds
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT bucket, x,
                   max(x) OVER (PARTITION BY bucket ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pm
            FROM daily
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN pm IS NULL OR x > pm
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_records
            FROM lagged GROUP BY 1
        ),
        m AS (
            SELECT bucket, n, n_records,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, n),
                           i -> 1.0 / CAST(i AS DOUBLE))),
                       (a, v) -> a + v) AS expected,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, n),
                           i -> 1.0 / CAST(i AS DOUBLE)
                                - 1.0 / (CAST(i AS DOUBLE)
                                         * CAST(i AS DOUBLE)))),
                       (a, v) -> a + v) AS var
            FROM agg
        )
        SELECT bucket, n, n_records, expected,
               CASE WHEN var > 0.0 THEN
                   (CAST(n_records AS DOUBLE) - expected)
                   / sqrt(var) END AS z
        FROM m
    """
    oracles["gumbel"] = """
        -- MoM fit on exact sums; one fixed tree per return period
        WITH dmax AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   max(CAST(value AS DECIMAL(18,2))) AS mx
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   sum(mx) AS s, sum(mx * mx) AS q
            FROM dmax GROUP BY 1
        ),
        t AS (
            SELECT bucket, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(s AS DOUBLE) AS sd,
                   CAST(q AS DOUBLE) AS qd
            FROM agg
        ),
        fit AS (
            SELECT bucket, n,
                   (nd * qd - sd * sd) / (nd * (nd - 1.0)) AS var,
                   sd / nd AS mean
            FROM t
        ),
        mb AS (
            SELECT bucket, n,
                   CASE WHEN n >= 2 AND var > 0.0 THEN
                       sqrt(var) * 0.7796968012336793 END AS beta,
                   CASE WHEN n >= 2 AND var > 0.0 THEN
                       mean - 0.5772156649015329
                              * (sqrt(var) * 0.7796968012336793)
                   END AS mu
            FROM fit
        )
        SELECT bucket, n, mu, beta,
               p.t_return,
               mu - beta * ln(-ln(1.0
                   - 1.0 / CAST(p.t_return AS DOUBLE))) AS level
        FROM mb CROSS JOIN
             (SELECT unnest([10, 100]) AS t_return) p
    """
    oracles["hill"] = """
        -- top-(k+1) order stats; order-pinned ln fold
        WITH flt AS (
            SELECT user_id % 2 AS bucket,
                   CAST(value AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL AND value > 0
        ),
        top AS (
            SELECT bucket, x,
                   CAST(row_number() OVER
                       (PARTITION BY bucket ORDER BY x DESC)
                       AS BIGINT) AS r
            FROM flt
        ),
        lim AS (SELECT * FROM top WHERE r <= 51),
        packed AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS m,
                   min(CASE WHEN r = 51 THEN x END) AS xk1,
                   list_sort(list(struct_pack(r := r, x := x))
                       FILTER (WHERE r <= 50)) AS lv
            FROM lim GROUP BY 1
        ),
        folded AS (
            SELECT bucket, m, xk1,
                   list_reduce(list_prepend(0.0,
                       [ln(e.x / xk1) FOR e IN lv]),
                       (a, v) -> a + v) / 50.0 AS h
            FROM packed
        )
        SELECT bucket, 50 AS k,
               CASE WHEN m = 51 AND xk1 IS NOT NULL AND xk1 > 0.0
                    THEN xk1 END AS x_tail,
               CASE WHEN m = 51 AND xk1 IS NOT NULL AND xk1 > 0.0
                    THEN h END AS hill,
               CASE WHEN m = 51 AND xk1 IS NOT NULL AND xk1 > 0.0
                         AND h > 0.0
                    THEN 1.0 / h END AS alpha
        FROM folded
    """
    oracles["gpd"] = """
        -- exact exceedance sums; one MoM tree per return period
        WITH flt AS (
            SELECT user_id % 2 AS bucket,
                   CAST(value AS DECIMAL(18,2)) AS x,
                   CAST(value AS DOUBLE) AS xd
            FROM events WHERE value IS NOT NULL
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(CASE WHEN xd > 300.0 THEN 1 END)
                        AS BIGINT) AS n_exc,
                   sum(CASE WHEN xd > 300.0
                       THEN x - CAST(300.0 AS DECIMAL(18,2)) END)
                       AS s,
                   sum(CASE WHEN xd > 300.0
                       THEN (x - CAST(300.0 AS DECIMAL(18,2)))
                            * (x - CAST(300.0 AS DECIMAL(18,2)))
                       END) AS q
            FROM flt GROUP BY 1
        ),
        t AS (
            SELECT bucket, n, n_exc,
                   CAST(n_exc AS DOUBLE) AS ne,
                   CAST(s AS DOUBLE) AS sd,
                   CAST(q AS DOUBLE) AS qd
            FROM agg
        ),
        fit AS (
            SELECT bucket, n, n_exc,
                   ne / CAST(n AS DOUBLE) AS rate,
                   CASE WHEN n_exc >= 2 AND
                        (ne * qd - sd * sd) / (ne * (ne - 1.0))
                            > 0.0
                   THEN 0.5 * (1.0 - (sd / ne) * (sd / ne)
                       / ((ne * qd - sd * sd)
                          / (ne * (ne - 1.0)))) END AS xi,
                   CASE WHEN n_exc >= 2 AND
                        (ne * qd - sd * sd) / (ne * (ne - 1.0))
                            > 0.0
                   THEN 0.5 * (sd / ne)
                        * (1.0 + (sd / ne) * (sd / ne)
                           / ((ne * qd - sd * sd)
                              / (ne * (ne - 1.0)))) END AS sigma
            FROM t
        )
        SELECT bucket, n, n_exc, rate, xi, sigma, p.t_return,
               CASE WHEN xi <> 0.0 THEN
                   300.0 + (sigma / xi)
                   * (pow(CAST(p.t_return AS DOUBLE) * rate, xi)
                      - 1.0) END AS level
        FROM fit CROSS JOIN
             (SELECT unnest([1000, 10000]) AS t_return) p
    """
    oracles["var_es"] = """
        -- k-th order statistic + exact decimal tail cumsum
        WITH flt AS (
            SELECT user_id % 2 AS bucket,
                   CAST(value AS DECIMAL(18,2)) AS x
            FROM events WHERE value IS NOT NULL
        ),
        ranked AS (
            SELECT bucket, x,
                   CAST(row_number() OVER w_o AS BIGINT) AS r,
                   sum(x) OVER w_p AS cum,
                   CAST(count(*) OVER w_a AS BIGINT) AS n
            FROM flt
            WINDOW w_o AS (PARTITION BY bucket ORDER BY x DESC),
                   w_p AS (PARTITION BY bucket ORDER BY x DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW),
                   w_a AS (PARTITION BY bucket)
        )
        SELECT bucket, n, r AS k_tail,
               CAST(x AS DOUBLE) AS var_level,
               CAST(cum AS DOUBLE) / CAST(r AS DOUBLE) AS es
        FROM ranked
        WHERE r = greatest(1, CAST(floor(
            CAST(n AS DOUBLE) * 5 / 100) AS BIGINT))
    """
    oracles["sampen"] = """
        -- exact template-match counts; BIGINT-typed nested folds
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        norm AS (
            SELECT bucket, d,
                   CAST(v AS DOUBLE)
                   / (CAST(sum(v) OVER (PARTITION BY bucket)
                           AS DOUBLE)
                      / CAST(count(*) OVER (PARTITION BY bucket)
                             AS DOUBLE)) AS x
            FROM daily
        ),
        pl AS (
            SELECT bucket, list(x ORDER BY d) AS xs,
                   CAST(len(list(x ORDER BY d)) AS INTEGER) AS n
            FROM norm GROUP BY 1
        ),
        cnt AS (
            SELECT bucket, n,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, n - 2 - 1),
                           i -> list_reduce(
                               list_prepend(CAST(0 AS BIGINT),
                                   list_transform(
                                       generate_series(i + 1, n - 2),
                                       j -> CAST(CASE WHEN
                                           abs(xs[i] - xs[j]) <= 0.2
                                           AND abs(xs[i+1] - xs[j+1])
                                               <= 0.2
                                           THEN 1 ELSE 0 END
                                           AS BIGINT))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) AS b,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, n - 3 - 1),
                           i -> list_reduce(
                               list_prepend(CAST(0 AS BIGINT),
                                   list_transform(
                                       generate_series(i + 1, n - 3),
                                       j -> CAST(CASE WHEN
                                           abs(xs[i] - xs[j]) <= 0.2
                                           AND abs(xs[i+1] - xs[j+1])
                                               <= 0.2
                                           AND abs(xs[i+2] - xs[j+2])
                                               <= 0.2
                                           THEN 1 ELSE 0 END
                                           AS BIGINT))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) AS a
            FROM pl
        )
        SELECT bucket, n,
               CASE WHEN n >= 3 THEN b END AS b_matches,
               CASE WHEN n >= 4 THEN a END AS a_matches,
               CASE WHEN n >= 3 AND n >= 4 AND b > 0 AND a > 0
                    THEN -ln(CAST(a AS DOUBLE) / CAST(b AS DOUBLE))
               END AS sampen
        FROM cnt
    """
    oracles["mdd"] = """
        -- one prefix-max window; earliest-trough deterministic pick
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        staged AS (
            SELECT bucket, x,
                   max(x) OVER w_p AS peak,
                   CAST(row_number() OVER w_o AS BIGINT) AS t,
                   CAST(count(*) OVER w_a AS BIGINT) AS n
            FROM daily
            WINDOW w_o AS (PARTITION BY bucket ORDER BY d),
                   w_p AS (PARTITION BY bucket ORDER BY d
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW),
                   w_a AS (PARTITION BY bucket)
        ),
        top AS (
            SELECT *, peak - x AS dd,
                   row_number() OVER (PARTITION BY bucket
                       ORDER BY peak - x DESC, t ASC) AS rn
            FROM staged
        )
        SELECT bucket, n,
               CAST(peak AS DOUBLE) AS peak,
               CAST(x AS DOUBLE) AS trough,
               CAST(dd AS DOUBLE) AS mdd,
               CASE WHEN peak > 0 THEN
                   CAST(dd AS DOUBLE) / CAST(peak AS DOUBLE)
               END AS mdd_rel
        FROM top WHERE rn = 1
    """
    oracles["ccc"] = """
        -- five exact decimal sums; one fixed CCC tree
        WITH pp AS (
            SELECT l_returnflag AS flag,
                   CAST(l_extendedprice AS DECIMAL(18,4)) AS x,
                   CAST(l_quantity * 1050 AS DECIMAL(18,4)) AS y
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
              AND l_quantity IS NOT NULL
        ),
        agg AS (
            SELECT flag, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * CAST(x AS DECIMAL(20,4))) AS sxx,
                   sum(y * CAST(y AS DECIMAL(20,4))) AS syy,
                   sum(x * CAST(y AS DECIMAL(20,4))) AS sxy
            FROM pp GROUP BY 1
        ),
        t AS (
            SELECT flag, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) AS sxd,
                   CAST(sy AS DOUBLE) AS syd,
                   CAST(sxx AS DOUBLE) AS sxxd,
                   CAST(syy AS DOUBLE) AS syyd,
                   CAST(sxy AS DOUBLE) AS sxyd
            FROM agg
        ),
        m AS (
            SELECT flag, n,
                   (nd * sxxd - sxd * sxd) / (nd * nd) AS vx,
                   (nd * syyd - syd * syd) / (nd * nd) AS vy,
                   (nd * sxyd - sxd * syd) / (nd * nd) AS cov,
                   sxd / nd - syd / nd AS dm
            FROM t
        ),
        f AS (
            SELECT flag, n, vx, vy, cov,
                   vx + vy + dm * dm AS den
            FROM m
        )
        SELECT flag, n,
               CASE WHEN n >= 2 AND den > 0.0 AND vx > 0.0
                         AND vy > 0.0
                    THEN cov / sqrt(vx * vy) END AS pearson,
               CASE WHEN n >= 2 AND den > 0.0 AND vx > 0.0
                         AND vy > 0.0 AND cov <> 0.0
                    THEN (2.0 * cov / den)
                         / (cov / sqrt(vx * vy)) END AS c_b,
               CASE WHEN n >= 2 AND den > 0.0
                    THEN 2.0 * cov / den END AS ccc
        FROM f
    """
    oracles["bland_altman"] = """
        -- exact difference sums; limits broadcast back for coverage
        WITH pp AS (
            SELECT l_returnflag AS flag,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        - CAST(l_quantity * 1050 AS DECIMAL(18,4))
                        AS DECIMAL(18,4)) AS d
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
              AND l_quantity IS NOT NULL
        ),
        agg AS (
            SELECT flag, CAST(count(*) AS BIGINT) AS n,
                   sum(d) AS s,
                   sum(d * CAST(d AS DECIMAL(20,4))) AS q
            FROM pp GROUP BY 1
        ),
        t AS (
            SELECT flag, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(s AS DOUBLE) AS sd,
                   CAST(q AS DOUBLE) AS qd
            FROM agg
        ),
        fit AS (
            SELECT flag, n, sd / nd AS bias,
                   CASE WHEN n >= 2 AND
                        (nd * qd - sd * sd) / (nd * (nd - 1.0))
                            > 0.0
                   THEN sqrt((nd * qd - sd * sd)
                             / (nd * (nd - 1.0))) END AS sd_diff,
                   nd
            FROM t
        ),
        lim AS (
            SELECT flag, n, bias, sd_diff,
                   bias - 1.96 * sd_diff AS loa_lo,
                   bias + 1.96 * sd_diff AS loa_hi
            FROM fit
        ),
        cov AS (
            SELECT lim.flag, lim.n, lim.bias, lim.sd_diff,
                   lim.loa_lo, lim.loa_hi,
                   CAST(sum(CASE WHEN CAST(pp.d AS DOUBLE)
                                      >= lim.loa_lo
                                 AND CAST(pp.d AS DOUBLE)
                                      <= lim.loa_hi
                            THEN 1 ELSE 0 END) AS BIGINT) AS inn
            FROM pp JOIN lim ON pp.flag = lim.flag
            GROUP BY 1, 2, 3, 4, 5, 6
        )
        SELECT flag, n, bias, sd_diff, loa_lo, loa_hi,
               CASE WHEN sd_diff IS NOT NULL THEN
                   CAST(inn AS DOUBLE) / CAST(n AS DOUBLE)
               END AS coverage
        FROM cov
    """
    oracles["deming"] = """
        -- the L315 five-sum frame; one closed-form Deming tree
        WITH pp AS (
            SELECT l_returnflag AS flag,
                   CAST(l_extendedprice AS DECIMAL(18,4)) AS x,
                   CAST(l_quantity * 1050 AS DECIMAL(18,4)) AS y
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
              AND l_quantity IS NOT NULL
        ),
        agg AS (
            SELECT flag, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * CAST(x AS DECIMAL(20,4))) AS sxx,
                   sum(y * CAST(y AS DECIMAL(20,4))) AS syy,
                   sum(x * CAST(y AS DECIMAL(20,4))) AS sxy
            FROM pp GROUP BY 1
        ),
        t AS (
            SELECT flag, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) AS sxd,
                   CAST(sy AS DOUBLE) AS syd,
                   CAST(sxx AS DOUBLE) AS sxxd,
                   CAST(syy AS DOUBLE) AS syyd,
                   CAST(sxy AS DOUBLE) AS sxyd
            FROM agg
        ),
        m AS (
            SELECT flag, n, nd, sxd, syd,
                   (nd * sxxd - sxd * sxd) / (nd * nd) AS vx,
                   (nd * syyd - syd * syd) / (nd * nd) AS vy,
                   (nd * sxyd - sxd * syd) / (nd * nd) AS cov
            FROM t
        ),
        f AS (
            SELECT flag, n, nd, sxd, syd,
                   CASE WHEN n >= 3 AND cov <> 0.0 THEN
                       (vy - 1.0 * vx
                        + sqrt((vy - 1.0 * vx) * (vy - 1.0 * vx)
                               + 4.0 * 1.0 * cov * cov))
                       / (2.0 * cov) END AS slope
            FROM m
        )
        SELECT flag, n, slope,
               (syd / nd) - slope * (sxd / nd) AS intercept
        FROM f
    """
    oracles["did"] = """
        -- four exact cells from ONE agg; DiD/se/t fixed trees
        WITH flt AS (
            SELECT event_type,
                   CAST(user_id % 2 AS INTEGER) AS g,
                   CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END AS p,
                   CAST(value AS DECIMAL(18,4)) AS x
            FROM events WHERE value IS NOT NULL
        ),
        agg AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN g=0 AND p=0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n00,
                   sum(CASE WHEN g=0 AND p=0 THEN x END) AS s00,
                   sum(CASE WHEN g=0 AND p=0 THEN x*x END) AS q00,
                   CAST(sum(CASE WHEN g=0 AND p=1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n01,
                   sum(CASE WHEN g=0 AND p=1 THEN x END) AS s01,
                   sum(CASE WHEN g=0 AND p=1 THEN x*x END) AS q01,
                   CAST(sum(CASE WHEN g=1 AND p=0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n10,
                   sum(CASE WHEN g=1 AND p=0 THEN x END) AS s10,
                   sum(CASE WHEN g=1 AND p=0 THEN x*x END) AS q10,
                   CAST(sum(CASE WHEN g=1 AND p=1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n11,
                   sum(CASE WHEN g=1 AND p=1 THEN x END) AS s11,
                   sum(CASE WHEN g=1 AND p=1 THEN x*x END) AS q11
            FROM flt GROUP BY 1
        ),
        m AS (
            SELECT event_type, n, n00, n01, n10, n11,
                   CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) AS m00,
                   CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) AS m01,
                   CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) AS m10,
                   CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) AS m11,
                   (CAST(n00 AS DOUBLE) * CAST(q00 AS DOUBLE)
                    - CAST(s00 AS DOUBLE) * CAST(s00 AS DOUBLE))
                   / (CAST(n00 AS DOUBLE)
                      * (CAST(n00 AS DOUBLE) - 1.0))
                   / CAST(n00 AS DOUBLE) AS v00,
                   (CAST(n01 AS DOUBLE) * CAST(q01 AS DOUBLE)
                    - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE))
                   / (CAST(n01 AS DOUBLE)
                      * (CAST(n01 AS DOUBLE) - 1.0))
                   / CAST(n01 AS DOUBLE) AS v01,
                   (CAST(n10 AS DOUBLE) * CAST(q10 AS DOUBLE)
                    - CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE))
                   / (CAST(n10 AS DOUBLE)
                      * (CAST(n10 AS DOUBLE) - 1.0))
                   / CAST(n10 AS DOUBLE) AS v10,
                   (CAST(n11 AS DOUBLE) * CAST(q11 AS DOUBLE)
                    - CAST(s11 AS DOUBLE) * CAST(s11 AS DOUBLE))
                   / (CAST(n11 AS DOUBLE)
                      * (CAST(n11 AS DOUBLE) - 1.0))
                   / CAST(n11 AS DOUBLE) AS v11
            FROM agg
        ),
        f AS (
            SELECT *,
                   (m11 - m10) - (m01 - m00) AS did,
                   v00 + v01 + v10 + v11 AS sev
            FROM m
        )
        SELECT event_type, n,
               CASE WHEN n00 >= 1 THEN m00 END AS m00,
               CASE WHEN n01 >= 1 THEN m01 END AS m01,
               CASE WHEN n10 >= 1 THEN m10 END AS m10,
               CASE WHEN n11 >= 1 THEN m11 END AS m11,
               CASE WHEN n00 >= 1 AND n01 >= 1 AND n10 >= 1
                         AND n11 >= 1 THEN did END AS did,
               CASE WHEN n00 >= 2 AND n01 >= 2 AND n10 >= 2
                         AND n11 >= 2 AND sev > 0.0
                    THEN sqrt(sev) END AS se,
               CASE WHEN n00 >= 2 AND n01 >= 2 AND n10 >= 2
                         AND n11 >= 2 AND sev > 0.0
                    THEN did / sqrt(sev) END AS t
        FROM f
    """
    oracles["mix_shift"] = """
        -- exact cells; Kitagawa midpoint folds over sorted segments
        WITH cells AS (
            SELECT o_orderpriority AS seg,
                   o_custkey % 2 AS grp,
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1
                            ELSE 0 END) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS t
            FROM orders GROUP BY 1, 2
        ),
        wide AS (
            SELECT seg,
                   CAST(sum(CASE WHEN grp = 0 THEN s END)
                        AS BIGINT) AS sa,
                   CAST(sum(CASE WHEN grp = 0 THEN t END)
                        AS BIGINT) AS ta,
                   CAST(sum(CASE WHEN grp = 1 THEN s END)
                        AS BIGINT) AS sb,
                   CAST(sum(CASE WHEN grp = 1 THEN t END)
                        AS BIGINT) AS tb
            FROM cells GROUP BY 1
        ),
        packed AS (
            SELECT CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(sum(sa) AS BIGINT) AS tsa,
                   CAST(sum(ta) AS BIGINT) AS tta,
                   CAST(sum(sb) AS BIGINT) AS tsb,
                   CAST(sum(tb) AS BIGINT) AS ttb,
                   list_sort(list(struct_pack(
                       seg := seg, sa := sa, ta := ta,
                       sb := sb, tb := tb))) AS lv
            FROM wide
        ),
        f AS (
            SELECT *,
                   list_reduce(list_prepend(0.0,
                       [((CAST(e.ta AS DOUBLE)
                          / CAST(tta AS DOUBLE)
                          + CAST(e.tb AS DOUBLE)
                            / CAST(ttb AS DOUBLE)) / 2.0)
                        * (CAST(e.sa AS DOUBLE)
                           / CAST(e.ta AS DOUBLE)
                           - CAST(e.sb AS DOUBLE)
                             / CAST(e.tb AS DOUBLE))
                        FOR e IN lv]),
                       (a, v) -> a + v) AS rate_effect,
                   list_reduce(list_prepend(0.0,
                       [((CAST(e.sa AS DOUBLE)
                          / CAST(e.ta AS DOUBLE)
                          + CAST(e.sb AS DOUBLE)
                            / CAST(e.tb AS DOUBLE)) / 2.0)
                        * (CAST(e.ta AS DOUBLE)
                           / CAST(tta AS DOUBLE)
                           - CAST(e.tb AS DOUBLE)
                             / CAST(ttb AS DOUBLE))
                        FOR e IN lv]),
                       (a, v) -> a + v) AS mix_effect
            FROM packed
        )
        SELECT n_segments,
               CASE WHEN tta > 0 AND ttb > 0 THEN
                   CAST(tsa AS DOUBLE) / CAST(tta AS DOUBLE)
               END AS rate_a,
               CASE WHEN tta > 0 AND ttb > 0 THEN
                   CAST(tsb AS DOUBLE) / CAST(ttb AS DOUBLE)
               END AS rate_b,
               CASE WHEN tta > 0 AND ttb > 0 THEN
                   CAST(tsa AS DOUBLE) / CAST(tta AS DOUBLE)
                   - CAST(tsb AS DOUBLE) / CAST(ttb AS DOUBLE)
               END AS delta,
               CASE WHEN tta > 0 AND ttb > 0
                    THEN rate_effect END AS rate_effect,
               CASE WHEN tta > 0 AND ttb > 0
                    THEN mix_effect END AS mix_effect
        FROM f
    """
    oracles["yuen"] = """
        -- positional trim boundaries; closed-form winsorized sums
        WITH flt AS (
            SELECT user_id % 2 AS bucket, event_type AS g,
                   CAST(value AS DECIMAL(18,4)) AS x
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
        ),
        ranked AS (
            SELECT bucket, g, x,
                   CAST(row_number() OVER w_o AS BIGINT) AS r,
                   CAST(count(*) OVER w_a AS BIGINT) AS n
            FROM flt
            WINDOW w_o AS (PARTITION BY bucket, g ORDER BY x),
                   w_a AS (PARTITION BY bucket, g)
        ),
        side AS (
            SELECT bucket, g, CAST(max(n) AS BIGINT) AS nn,
                   sum(CASE WHEN r > (n * 20) // 100
                             AND r <= n - (n * 20) // 100
                        THEN x END) AS ts,
                   sum(CASE WHEN r > (n * 20) // 100
                             AND r <= n - (n * 20) // 100
                        THEN x * CAST(x AS DECIMAL(20,4))
                        END) AS tq,
                   max(CASE WHEN r = (n * 20) // 100 + 1
                        THEN x END) AS lo,
                   max(CASE WHEN r = n - (n * 20) // 100
                        THEN x END) AS hi
            FROM ranked GROUP BY 1, 2
        ),
        agg AS (
            SELECT bucket,
                   max(CASE WHEN g = 'click' THEN nn END) AS na,
                   max(CASE WHEN g = 'click' THEN ts END) AS tsa,
                   max(CASE WHEN g = 'click' THEN tq END) AS tqa,
                   max(CASE WHEN g = 'click' THEN lo END) AS loa,
                   max(CASE WHEN g = 'click' THEN hi END) AS hia,
                   max(CASE WHEN g = 'view' THEN nn END) AS nb,
                   max(CASE WHEN g = 'view' THEN ts END) AS tsb,
                   max(CASE WHEN g = 'view' THEN tq END) AS tqb,
                   max(CASE WHEN g = 'view' THEN lo END) AS lob,
                   max(CASE WHEN g = 'view' THEN hi END) AS hib
            FROM side GROUP BY 1
        ),
        st AS (
            SELECT bucket, na, nb,
                   CAST(na AS DOUBLE)
                       - 2.0 * CAST((na * 20) // 100 AS DOUBLE)
                       AS ha,
                   CAST(nb AS DOUBLE)
                       - 2.0 * CAST((nb * 20) // 100 AS DOUBLE)
                       AS hb,
                   CAST(tsa AS DOUBLE) AS tsad,
                   CAST(tqa AS DOUBLE) AS tqad,
                   CAST((na * 20) // 100 AS DOUBLE) AS gad,
                   CAST(loa AS DOUBLE) AS load_,
                   CAST(hia AS DOUBLE) AS hiad,
                   CAST(tsb AS DOUBLE) AS tsbd,
                   CAST(tqb AS DOUBLE) AS tqbd,
                   CAST((nb * 20) // 100 AS DOUBLE) AS gbd,
                   CAST(lob AS DOUBLE) AS lobd,
                   CAST(hib AS DOUBLE) AS hibd,
                   CAST(na AS DOUBLE) AS nad,
                   CAST(nb AS DOUBLE) AS nbd
            FROM agg
        ),
        w AS (
            SELECT bucket, na, nb, ha, hb,
                   tsad / ha AS tma, tsbd / hb AS tmb,
                   ((nad * (tqad + gad * (load_ * load_
                                          + hiad * hiad))
                     - (tsad + gad * (load_ + hiad))
                       * (tsad + gad * (load_ + hiad)))
                    / (nad * (nad - 1.0)))
                   * (nad - 1.0) / (ha * (ha - 1.0)) AS da,
                   ((nbd * (tqbd + gbd * (lobd * lobd
                                          + hibd * hibd))
                     - (tsbd + gbd * (lobd + hibd))
                       * (tsbd + gbd * (lobd + hibd)))
                    / (nbd * (nbd - 1.0)))
                   * (nbd - 1.0) / (hb * (hb - 1.0)) AS db
            FROM st
        )
        SELECT bucket, na AS n_a, nb AS n_b,
               CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                         AND ha >= 2.0 AND hb >= 2.0
                    THEN ha END AS h_a,
               CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                         AND ha >= 2.0 AND hb >= 2.0
                    THEN hb END AS h_b,
               CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                         AND ha >= 2.0 AND hb >= 2.0
                    THEN tma END AS tmean_a,
               CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                         AND ha >= 2.0 AND hb >= 2.0
                    THEN tmb END AS tmean_b,
               CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                         AND ha >= 2.0 AND hb >= 2.0
                         AND da + db > 0.0
                    THEN (tma - tmb) / sqrt(da + db) END AS t,
               CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                         AND ha >= 2.0 AND hb >= 2.0
                         AND da + db > 0.0
                    THEN ((da + db) * (da + db))
                         / (da * da / (ha - 1.0)
                            + db * db / (hb - 1.0)) END AS df_y
        FROM w
    """
    oracles["ipf"] = """
        -- the iteration fold as WITH RECURSIVE carrying the cell
        -- LIST; row/col scaling via in-list conditional sums
        WITH RECURSIVE odd AS (
            SELECT o_orderpriority AS r, o_orderstatus AS c,
                   CAST(count(*) AS DOUBLE) AS w
            FROM orders WHERE o_custkey % 2 = 1 GROUP BY 1, 2
        ),
        rt AS (
            SELECT o_orderpriority AS r,
                   CAST(count(*) AS DOUBLE) AS rt
            FROM orders WHERE o_custkey % 2 = 0 GROUP BY 1
        ),
        ct AS (
            SELECT o_orderstatus AS c,
                   CAST(count(*) AS DOUBLE) AS ct
            FROM orders WHERE o_custkey % 2 = 0 GROUP BY 1
        ),
        joined AS (
            SELECT odd.r, odd.c, odd.w AS w0, rt.rt, ct.ct
            FROM odd JOIN rt ON odd.r = rt.r
                     JOIN ct ON odd.c = ct.c
        ),
        packed AS (
            SELECT list_sort(list(struct_pack(
                       r := r, c := c, w := w0,
                       rt := rt, ct := ct))) AS lv
            FROM joined
        ),
        rec AS (
            SELECT 0 AS i, lv FROM packed
            UNION ALL
            SELECT i + 1,
                   list_transform(rs, e -> struct_pack(
                       r := e.r, c := e.c,
                       w := e.w * e.ct / list_reduce(
                           list_prepend(0.0,
                               list_transform(rs, o ->
                                   CASE WHEN o.c = e.c THEN o.w
                                        ELSE 0.0 END)),
                           (a, v) -> a + v),
                       rt := e.rt, ct := e.ct))
            FROM (
                SELECT i, list_transform(lv, e -> struct_pack(
                           r := e.r, c := e.c,
                           w := e.w * e.rt / list_reduce(
                               list_prepend(0.0,
                                   list_transform(lv, o ->
                                       CASE WHEN o.r = e.r
                                            THEN o.w
                                            ELSE 0.0 END)),
                               (a, v) -> a + v),
                           rt := e.rt, ct := e.ct)) AS rs
                FROM rec WHERE i < 10
            )
        ),
        finalgrid AS (SELECT lv AS fv FROM rec WHERE i = 10),
        ex AS (
            SELECT fv, unnest(fv) AS e FROM finalgrid
        ),
        outt AS (
            SELECT e.r AS r, e.c AS c, e.w AS weight,
                   abs(list_reduce(list_prepend(0.0,
                       list_transform(fv, o ->
                           CASE WHEN o.r = e.r THEN o.w
                                ELSE 0.0 END)),
                       (a, v) -> a + v) - e.rt) AS row_gap,
                   abs(list_reduce(list_prepend(0.0,
                       list_transform(fv, o ->
                           CASE WHEN o.c = e.c THEN o.w
                                ELSE 0.0 END)),
                       (a, v) -> a + v) - e.ct) AS col_gap
            FROM ex
        )
        SELECT outt.r, outt.c, joined.w0 AS seed,
               outt.weight, outt.row_gap, outt.col_gap
        FROM joined JOIN outt
          ON joined.r = outt.r AND joined.c = outt.c
    """
    oracles["kish"] = """
        -- two exact decimal sums; two divisions
        WITH flt AS (
            SELECT c_mktsegment AS seg,
                   CAST(CAST(c_acctbal AS DECIMAL(18,6))
                        AS DECIMAL(38,6)) AS w
            FROM customer WHERE c_acctbal > 0
        ),
        agg AS (
            SELECT seg, CAST(count(*) AS BIGINT) AS n,
                   sum(w) AS s, sum(w * w) AS q
            FROM flt GROUP BY 1
        )
        SELECT seg, n,
               CASE WHEN CAST(q AS DOUBLE) > 0.0 THEN
                   CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(q AS DOUBLE) END AS ess,
               CASE WHEN CAST(q AS DOUBLE) > 0.0 THEN
                   CAST(n AS DOUBLE)
                   / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(q AS DOUBLE)) END AS deff
        FROM agg
    """
    oracles["ht"] = """
        -- exact per-pi cells; bounded HT fold
        WITH flt AS (
            SELECT l_linestatus AS st,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        AS DECIMAL(38,2)) AS y,
                   CASE WHEN l_returnflag = 'R' THEN 0.25
                        ELSE 0.5 END AS pi
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
        ),
        cells AS (
            SELECT st, pi, CAST(count(*) AS BIGINT) AS c,
                   sum(y) AS s, sum(y * y) AS q
            FROM flt GROUP BY 1, 2
        ),
        packed AS (
            SELECT st, CAST(sum(c) AS BIGINT) AS n,
                   list_sort(list(struct_pack(
                       pi := pi, s := s, q := q))) AS lv
            FROM cells GROUP BY 1
        )
        SELECT st, n,
               list_reduce(list_prepend(0.0,
                   [CAST(e.s AS DOUBLE) / e.pi FOR e IN lv]),
                   (a, v) -> a + v) AS total_ht,
               list_reduce(list_prepend(0.0,
                   [(1.0 - e.pi) * CAST(e.q AS DOUBLE)
                    / (e.pi * e.pi) FOR e IN lv]),
                   (a, v) -> a + v) AS var_ht
        FROM packed
    """
    oracles["p_chart"] = """
        -- exact subgroup counts; 3-sigma binomial limit trees
        WITH flt AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0
                        END AS d
            FROM events
        ),
        cells AS (
            SELECT bucket, day,
                   CAST(count(*) AS BIGINT) AS n_i,
                   CAST(sum(d) AS BIGINT) AS x_i
            FROM flt GROUP BY 1, 2
        ),
        centre AS (
            SELECT bucket, CAST(sum(x_i) AS BIGINT) AS tx,
                   CAST(sum(n_i) AS BIGINT) AS tn
            FROM cells GROUP BY 1
        ),
        j AS (
            SELECT cells.*, centre.tx, centre.tn,
                   CAST(centre.tx AS DOUBLE)
                       / CAST(centre.tn AS DOUBLE) AS pbar
            FROM cells JOIN centre ON cells.bucket = centre.bucket
        ),
        t AS (
            SELECT *,
                   3.0 * sqrt(pbar * (1.0 - pbar)
                              / CAST(n_i AS DOUBLE)) AS spread,
                   CAST(x_i AS DOUBLE) / CAST(n_i AS DOUBLE) AS p_i
            FROM j
        )
        SELECT bucket, day AS subgroup, n_i, x_i, p_i,
               pbar AS p_bar,
               CASE WHEN pbar > 0.0 AND pbar < 1.0
                    THEN least(1.0, pbar + spread) END AS ucl,
               CASE WHEN pbar > 0.0 AND pbar < 1.0
                    THEN greatest(0.0, pbar - spread) END AS lcl,
               CASE WHEN pbar > 0.0 AND pbar < 1.0
                    THEN p_i > least(1.0, pbar + spread)
                         OR p_i < greatest(0.0, pbar - spread)
               END AS out_of_control
        FROM t
    """
    oracles["imr"] = """
        -- MR-based sigma; exact sign window for the run rule
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,4)) AS DECIMAL(38,4)) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT bucket,
                   CAST(row_number() OVER w_o AS BIGINT) AS t,
                   x,
                   x - lag(x, 1) OVER w_o AS dd
            FROM daily
            WINDOW w_o AS (PARTITION BY bucket ORDER BY d)
        ),
        stats AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS s, sum(abs(dd)) AS mr
            FROM lagged GROUP BY 1
        ),
        j AS (
            SELECT lagged.*, stats.n,
                   CAST(stats.s AS DOUBLE)
                       / CAST(stats.n AS DOUBLE) AS centre,
                   CAST(stats.mr AS DOUBLE)
                       / (CAST(stats.n AS DOUBLE) - 1.0)
                       / 1.128 AS sigma
            FROM lagged JOIN stats ON lagged.bucket = stats.bucket
        ),
        staged AS (
            SELECT bucket, t, CAST(x AS DOUBLE) AS x, centre, n,
                   CASE WHEN n >= 2 THEN centre + 3.0 * sigma
                        END AS ucl,
                   CASE WHEN n >= 2 THEN centre - 3.0 * sigma
                        END AS lcl,
                   CASE WHEN CAST(x AS DOUBLE) > centre THEN 1
                        WHEN CAST(x AS DOUBLE) < centre THEN -1
                        ELSE 0 END AS sg
            FROM j
        )
        SELECT bucket, t, x, centre, ucl, lcl,
               CASE WHEN ucl IS NOT NULL
                    THEN x > ucl OR x < lcl END AS beyond,
               (count(*) OVER w8 = 8
                AND abs(sum(sg) OVER w8) = 8) AS run8
        FROM staged
        WINDOW w8 AS (PARTITION BY bucket ORDER BY t
                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    """
    oracles["ewma_chart"] = """
        -- list-appending z-path fold (1-double-list elements);
        -- warm-up-widening limit trees
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        pl AS (
            SELECT bucket, list(x ORDER BY d) AS xs,
                   CAST(len(list(x ORDER BY d)) AS INTEGER) AS n
            FROM daily GROUP BY 1
        ),
        st AS (
            SELECT bucket, xs, n,
                   list_reduce(list_prepend(0.0, xs),
                       (a, v) -> a + v)
                       / CAST(n AS DOUBLE) AS centre,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(2, n),
                           i -> abs(xs[i] - xs[i - 1]))),
                       (a, v) -> a + v)
                       / (CAST(n AS DOUBLE) - 1.0) / 1.128 AS sigma
            FROM pl
        ),
        zp AS (
            SELECT bucket, xs, n, centre, sigma,
                   list_reduce(
                       list_prepend(CAST([] AS DOUBLE[]),
                           list_transform(xs, x -> [x])),
                       (acc, e) -> list_append(acc,
                           0.2 * e[1] + (1.0 - 0.2)
                           * (CASE WHEN len(acc) > 0
                                   THEN acc[len(acc)]
                                   ELSE centre END))) AS zs
            FROM st
        )
        SELECT bucket, CAST(u.t AS BIGINT)
                   + CAST(0 AS BIGINT) AS t,
               xs[u.t] AS x, zs[u.t] AS z, centre,
               CASE WHEN n >= 2 THEN
                   centre + 3.0 * sigma
                   * sqrt(0.2 / (2.0 - 0.2)
                          * (1.0 - pow(1.0 - 0.2,
                                       2.0 * CAST(u.t AS DOUBLE))))
               END AS ucl,
               CASE WHEN n >= 2 THEN
                   centre - 3.0 * sigma
                   * sqrt(0.2 / (2.0 - 0.2)
                          * (1.0 - pow(1.0 - 0.2,
                                       2.0 * CAST(u.t AS DOUBLE))))
               END AS lcl,
               CASE WHEN n >= 2 THEN
                   zs[u.t] > centre + 3.0 * sigma
                       * sqrt(0.2 / (2.0 - 0.2)
                              * (1.0 - pow(1.0 - 0.2,
                                  2.0 * CAST(u.t AS DOUBLE))))
                   OR zs[u.t] < centre - 3.0 * sigma
                       * sqrt(0.2 / (2.0 - 0.2)
                              * (1.0 - pow(1.0 - 0.2,
                                  2.0 * CAST(u.t AS DOUBLE))))
               END AS beyond
        FROM zp CROSS JOIN
             (SELECT unnest(generate_series(1, 10000)) AS t) u
        WHERE u.t <= n
    """
    oracles["capability"] = """
        -- MR-based within sigma vs overall sigma; index trees
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        norm AS (
            SELECT bucket, d,
                   CAST(floor((CAST(v AS DOUBLE)
                        / (CAST(sum(v) OVER (PARTITION BY bucket)
                                AS DOUBLE)
                           / CAST(count(*) OVER
                                  (PARTITION BY bucket)
                                  AS DOUBLE))) * 10000.0) / 10000.0
                        AS DECIMAL(18,4)) AS x
            FROM daily
        ),
        lagged AS (
            SELECT bucket, x,
                   x - lag(x, 1) OVER
                       (PARTITION BY bucket ORDER BY d) AS dd
            FROM norm
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS s, sum(x * x) AS q,
                   sum(abs(dd)) AS mr
            FROM lagged GROUP BY 1
        ),
        t AS (
            SELECT bucket, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(s AS DOUBLE) AS sd,
                   CAST(q AS DOUBLE) AS qd,
                   CAST(mr AS DOUBLE) AS mrd
            FROM agg
        ),
        m AS (
            SELECT bucket, n, sd / nd AS mean,
                   sqrt((nd * qd - sd * sd)
                        / (nd * (nd - 1.0))) AS sig_o,
                   mrd / (nd - 1.0) / 1.128 AS sig_w
            FROM t
        )
        SELECT bucket, n, mean,
               CASE WHEN n >= 2 AND sig_w > 0.0
                    THEN sig_w END AS sigma_within,
               CASE WHEN n >= 2 AND sig_o > 0.0
                    THEN sig_o END AS sigma_overall,
               CASE WHEN n >= 2 AND sig_w > 0.0
                    THEN (1.5 - 0.5) / (6.0 * sig_w) END AS cp,
               CASE WHEN n >= 2 AND sig_w > 0.0
                    THEN least(1.5 - mean, mean - 0.5)
                         / (3.0 * sig_w) END AS cpk,
               CASE WHEN n >= 2 AND sig_o > 0.0
                    THEN (1.5 - 0.5) / (6.0 * sig_o) END AS pp,
               CASE WHEN n >= 2 AND sig_o > 0.0
                    THEN least(1.5 - mean, mean - 0.5)
                         / (3.0 * sig_o) END AS ppk
        FROM m
    """
    oracles["robust_shape"] = """
        -- exact octile order statistics; fixed shape trees
        WITH base AS (
            SELECT c_mktsegment AS seg,
                   CAST(c_acctbal AS DECIMAL(18,4)) AS x
            FROM customer WHERE c_acctbal > 0
        ),
        ranked AS (
            SELECT seg, x,
                   CAST(row_number() OVER w_o AS BIGINT) AS r,
                   CAST(count(*) OVER w_a AS BIGINT) AS n
            FROM base
            WINDOW w_o AS (PARTITION BY seg ORDER BY x),
                   w_a AS (PARTITION BY seg)
        ),
        agg AS (
            SELECT seg, CAST(max(n) AS BIGINT) AS n,
                   max(CASE WHEN r = greatest(1, (n * 1) // 8)
                       THEN x END) AS e1,
                   max(CASE WHEN r = greatest(1, (n * 2) // 8)
                       THEN x END) AS e2,
                   max(CASE WHEN r = greatest(1, (n * 3) // 8)
                       THEN x END) AS e3,
                   max(CASE WHEN r = greatest(1, (n * 4) // 8)
                       THEN x END) AS e4,
                   max(CASE WHEN r = greatest(1, (n * 5) // 8)
                       THEN x END) AS e5,
                   max(CASE WHEN r = greatest(1, (n * 6) // 8)
                       THEN x END) AS e6,
                   max(CASE WHEN r = greatest(1, (n * 7) // 8)
                       THEN x END) AS e7
            FROM ranked GROUP BY 1
        ),
        d AS (
            SELECT seg, n,
                   CAST(e1 AS DOUBLE) AS e1,
                   CAST(e2 AS DOUBLE) AS q1,
                   CAST(e3 AS DOUBLE) AS e3,
                   CAST(e4 AS DOUBLE) AS q2,
                   CAST(e5 AS DOUBLE) AS e5,
                   CAST(e6 AS DOUBLE) AS q3,
                   CAST(e7 AS DOUBLE) AS e7
            FROM agg
        )
        SELECT seg, n, q1, q2, q3,
               CASE WHEN q3 - q1 > 0.0 THEN
                   (q3 + q1 - 2.0 * q2) / (q3 - q1) END AS bowley,
               CASE WHEN q3 - q1 > 0.0 THEN
                   ((e7 - e5) + (e3 - e1)) / (q3 - q1)
               END AS moors,
               CASE WHEN q3 + q1 > 0.0 THEN
                   (q3 - q1) / (q3 + q1) END AS qcv
        FROM d
    """
    oracles["dsr"] = """
        -- exact cells; pooled-weight folds with coverage check
        WITH cells AS (
            SELECT o_orderpriority AS s,
                   o_custkey % 2 AS grp,
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1
                            ELSE 0 END) AS BIGINT) AS x,
                   CAST(count(*) AS BIGINT) AS t
            FROM orders GROUP BY 1, 2
        ),
        strata AS (
            SELECT s, CAST(sum(t) AS BIGINT) AS st
            FROM cells GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(st) AS BIGINT) AS tt FROM strata),
        wtd AS (
            SELECT cells.*, strata.st, tot.tt
            FROM cells JOIN strata ON cells.s = strata.s
            CROSS JOIN tot
        ),
        packed AS (
            SELECT grp AS "group",
                   CAST(sum(t) AS BIGINT) AS n_trials,
                   CAST(sum(x) AS BIGINT) AS nx,
                   list_sort(list(struct_pack(
                       s := s, x := x, t := t, st := st,
                       tt := tt))) AS lv
            FROM wtd GROUP BY 1
        ),
        f AS (
            SELECT "group", n_trials, nx,
                   list_reduce(list_prepend(0.0,
                       [(CAST(e.st AS DOUBLE)
                         / CAST(e.tt AS DOUBLE))
                        * (CAST(e.x AS DOUBLE)
                           / CAST(e.t AS DOUBLE)) FOR e IN lv]),
                       (a, v) -> a + v) AS std,
                   list_reduce(list_prepend(0.0,
                       [CAST(e.st AS DOUBLE)
                        / CAST(e.tt AS DOUBLE) FOR e IN lv]),
                       (a, v) -> a + v) AS covered
            FROM packed
        )
        SELECT "group", n_trials,
               CASE WHEN n_trials > 0 THEN
                   CAST(nx AS DOUBLE) / CAST(n_trials AS DOUBLE)
               END AS crude_rate,
               CASE WHEN abs(covered - 1.0) < 1e-12
                    THEN std END AS std_rate
        FROM f
    """
    oracles["mtbf"] = """
        -- exact microsecond segments; one division per mean
        WITH probes AS (
            SELECT user_id % 2 AS bucket, ts,
                   CASE WHEN max(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) = 1
                        THEN 'down' ELSE 'up' END AS state
            FROM events GROUP BY 1, 2
        ),
        tagged AS (
            SELECT bucket, epoch_us(ts) AS t,
                   CASE WHEN state = 'up' THEN 1 ELSE 0 END AS u
            FROM probes
        ),
        marked AS (
            SELECT * FROM (
                SELECT bucket, t, u,
                       lag(u, 1) OVER w AS pu,
                       max(t) OVER (PARTITION BY bucket) AS mx
                FROM tagged
                WINDOW w AS (PARTITION BY bucket ORDER BY t)
            ) WHERE pu IS NULL OR u <> pu
        ),
        seg AS (
            SELECT bucket, t, u, pu,
                   COALESCE(lead(t, 1) OVER
                       (PARTITION BY bucket ORDER BY t), mx)
                       AS tend
            FROM marked
        ),
        fails AS (
            SELECT bucket, t AS fail_t,
                   t - lag(t, 1) OVER
                       (PARTITION BY bucket ORDER BY t) AS tbf
            FROM seg WHERE u = 0 AND pu IS NOT NULL
        ),
        fagg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_failures,
                   sum(tbf) AS tbf_sum,
                   CAST(count(tbf) AS BIGINT) AS tbf_n
            FROM fails GROUP BY 1
        ),
        closed AS (
            SELECT bucket, u, tend - t AS dur
            FROM seg WHERE tend > t
        ),
        cagg AS (
            SELECT bucket,
                   sum(CASE WHEN u = 0 THEN dur END) AS down,
                   CAST(count(CASE WHEN u = 0 THEN 1 END)
                        AS BIGINT) AS ndown,
                   sum(dur) AS total
            FROM closed GROUP BY 1
        ),
        nev AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_events
            FROM probes GROUP BY 1
        )
        SELECT nev.bucket, n_events,
               COALESCE(n_failures, 0) AS n_failures,
               CASE WHEN tbf_n >= 1 THEN
                   CAST(tbf_sum AS DOUBLE)
                   / CAST(tbf_n AS DOUBLE) / 1e6 END AS mtbf_s,
               CASE WHEN ndown >= 1 THEN
                   CAST(down AS DOUBLE)
                   / CAST(ndown AS DOUBLE) / 1e6 END AS mttr_s,
               CASE WHEN total IS NOT NULL AND total > 0 THEN
                   CAST(total - COALESCE(down, 0) AS DOUBLE)
                   / CAST(total AS DOUBLE) END AS availability
        FROM nev
        LEFT JOIN fagg ON nev.bucket = fagg.bucket
        LEFT JOIN cagg ON nev.bucket = cagg.bucket
    """
    oracles["median_ci"] = """
        -- order-statistic rank bounds; positional pivots
        WITH flt AS (
            SELECT c_mktsegment AS seg,
                   CAST(c_acctbal AS DECIMAL(18,4)) AS x
            FROM customer WHERE c_acctbal IS NOT NULL
        ),
        ranked AS (
            SELECT seg, x,
                   CAST(row_number() OVER w_o AS BIGINT) AS r,
                   CAST(count(*) OVER w_a AS BIGINT) AS n
            FROM flt
            WINDOW w_o AS (PARTITION BY seg ORDER BY x),
                   w_a AS (PARTITION BY seg)
        ),
        agg AS (
            SELECT seg, CAST(max(n) AS BIGINT) AS n,
                   max(CASE WHEN r = greatest(1,
                       CAST(floor((CAST(n AS DOUBLE)
                            - 1.96 * sqrt(CAST(n AS DOUBLE)))
                            / 2.0) AS BIGINT)) THEN x END) AS xl,
                   max(CASE WHEN r = least(n,
                       CAST(ceil(1.0 + (CAST(n AS DOUBLE)
                            + 1.96 * sqrt(CAST(n AS DOUBLE)))
                            / 2.0) AS BIGINT)) THEN x END) AS xh,
                   max(CASE WHEN r = CAST(floor((n + 1) / 2)
                       AS BIGINT) THEN x END) AS ml,
                   max(CASE WHEN r = CAST(floor(n / 2) + 1
                       AS BIGINT) THEN x END) AS mh,
                   max(greatest(1,
                       CAST(floor((CAST(n AS DOUBLE)
                            - 1.96 * sqrt(CAST(n AS DOUBLE)))
                            / 2.0) AS BIGINT))) AS lo_rank,
                   max(least(n,
                       CAST(ceil(1.0 + (CAST(n AS DOUBLE)
                            + 1.96 * sqrt(CAST(n AS DOUBLE)))
                            / 2.0) AS BIGINT))) AS hi_rank
            FROM ranked GROUP BY 1
        )
        SELECT seg, n,
               CASE WHEN n % 2 = 1 THEN CAST(mh AS DOUBLE)
                    ELSE (CAST(ml AS DOUBLE) + CAST(mh AS DOUBLE))
                         / 2.0 END AS median,
               CASE WHEN n >= 2 THEN CAST(xl AS DOUBLE)
                    END AS ci_lo,
               CASE WHEN n >= 2 THEN CAST(xh AS DOUBLE)
                    END AS ci_hi,
               CASE WHEN n >= 2 THEN lo_rank END AS lo_rank,
               CASE WHEN n >= 2 THEN hi_rank END AS hi_rank
        FROM agg
    """
    oracles["xi"] = """
        -- exact range-framed rank counts; one division
        WITH flt AS (
            SELECT l_returnflag AS flag,
                   l_quantity AS xv, l_extendedprice AS yv
            FROM lineitem
            WHERE l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL
        ),
        ranked AS (
            SELECT flag, xv, yv,
                   CAST(count(*) OVER w_r AS BIGINT) AS r,
                   CAST(count(*) OVER w_l AS BIGINT) AS l,
                   CAST(count(*) OVER w_a AS BIGINT) AS n
            FROM flt
            WINDOW w_r AS (PARTITION BY flag ORDER BY yv
                       RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW),
                   w_l AS (PARTITION BY flag ORDER BY yv DESC
                       RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW),
                   w_a AS (PARTITION BY flag)
        ),
        led AS (
            SELECT flag, n, r, l,
                   lead(r, 1) OVER
                       (PARTITION BY flag ORDER BY xv, yv) AS rn
            FROM ranked
        ),
        agg AS (
            SELECT flag, n,
                   sum(CASE WHEN rn IS NOT NULL THEN
                       CAST(abs(rn - r) AS HUGEINT) END) AS num,
                   sum(CAST(l AS HUGEINT)
                       * CAST(n - l AS HUGEINT)) AS den
            FROM led GROUP BY 1, 2
        )
        SELECT flag, n,
               CASE WHEN den > 0 THEN
                   1.0 - CAST(n AS DOUBLE)
                         * CAST(num AS DOUBLE)
                         / (2.0 * CAST(den AS DOUBLE))
               END AS xi
        FROM agg
    """
    oracles["holt_winters"] = """
        -- the triple-smoothing fold as WITH RECURSIVE carrying the
        -- seasonal LIST; slot rewrite via an index-free transform
        WITH RECURSIVE daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        pl AS (
            SELECT bucket, list(x ORDER BY d) AS xs,
                   CAST(len(list(x ORDER BY d)) AS INTEGER) AS n
            FROM daily GROUP BY 1
        ),
        st AS (
            SELECT bucket, xs, n,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, 7),
                           i -> xs[i])), (a, v) -> a + v)
                       / 7.0 AS m1,
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(8, 14),
                           i -> xs[i])), (a, v) -> a + v)
                       / 7.0 AS m2
            FROM pl
        ),
        rec AS (
            SELECT bucket, xs, n, 7 AS t,
                   m1 AS l, (m2 - m1) / 7.0 AS b,
                   list_transform(generate_series(1, 7),
                       i -> xs[i] - m1) AS s
            FROM st
            UNION ALL
            SELECT bucket, xs, n, t + 1,
                   lnew AS l,
                   0.1 * (lnew - l) + (1.0 - 0.1) * b AS b,
                   list_transform(generate_series(1, 7), j ->
                       CASE WHEN j = ph + 1 THEN
                           0.2 * (xv - lnew) + (1.0 - 0.2)
                               * s[ph + 1]
                       ELSE s[j] END) AS s
            FROM (
                SELECT r.*,
                       (r.t) % 7 AS ph,
                       r.xs[r.t + 1] AS xv,
                       0.3 * (r.xs[r.t + 1]
                              - r.s[(r.t) % 7 + 1])
                       + (1.0 - 0.3) * (r.l + r.b) AS lnew
                FROM rec r WHERE r.t < n
            )
        )
        SELECT bucket, n,
               CASE WHEN n >= 14 THEN l END AS level,
               CASE WHEN n >= 14 THEN b END AS trend,
               CASE WHEN n >= 14 THEN
                   l + b + s[(n % 7) + 1] END AS forecast
        FROM rec WHERE t = n
    """
    oracles["gwet"] = """
        -- exact agreement + marginal cells; one bounded fold
        WITH base AS (
            SELECT l_partkey % 2 AS bucket,
                   l_returnflag AS ra,
                   CASE WHEN l_linestatus = 'F' THEN 'A'
                        ELSE 'N' END AS rb
            FROM lineitem
            WHERE l_returnflag IS NOT NULL
        ),
        pa AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END)
                        AS BIGINT) AS agree
            FROM base GROUP BY 1
        ),
        cats AS (
            SELECT bucket, c, CAST(count(*) AS BIGINT) AS m
            FROM (SELECT bucket, ra AS c FROM base
                  UNION ALL SELECT bucket, rb AS c FROM base)
            GROUP BY 1, 2
        ),
        packed AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS q,
                   list_sort(list(struct_pack(c := c, m := m)))
                       AS lv
            FROM cats GROUP BY 1
        ),
        j AS (
            SELECT pa.bucket, pa.n, pa.agree, packed.q, packed.lv
            FROM pa JOIN packed ON pa.bucket = packed.bucket
        ),
        f AS (
            SELECT bucket, n, q,
                   CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS pav,
                   list_reduce(list_prepend(0.0,
                       [(CAST(e.m AS DOUBLE)
                         / (2.0 * CAST(n AS DOUBLE)))
                        * (1.0 - CAST(e.m AS DOUBLE)
                                 / (2.0 * CAST(n AS DOUBLE)))
                        FOR e IN lv]),
                       (a, v) -> a + v)
                       / (CAST(q AS DOUBLE) - 1.0) AS pe
            FROM j
        )
        SELECT bucket, n, pav AS p_a,
               CASE WHEN q >= 2 AND n >= 1 THEN pe END AS p_e,
               CASE WHEN q >= 2 AND n >= 1 AND pe <> 1.0 THEN
                   (pav - pe) / (1.0 - pe) END AS ac1
        FROM f
    """
    oracles["mahalanobis"] = """
        -- exact sums; closed-form 2x2 inverse; per-row md2 trees
        WITH flt AS (
            SELECT l_returnflag AS flag,
                   l_orderkey * 10 + l_linenumber AS lid,
                   l_quantity, l_extendedprice,
                   CAST(l_quantity AS DECIMAL(18,4)) AS xq,
                   CAST(l_extendedprice AS DECIMAL(18,4)) AS yq
            FROM lineitem
            WHERE l_orderkey % 50 = 0
              AND l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL
        ),
        stats AS (
            SELECT flag, CAST(count(*) AS BIGINT) AS n,
                   sum(xq) AS sx, sum(yq) AS sy,
                   sum(xq * CAST(xq AS DECIMAL(20,4))) AS sxx,
                   sum(yq * CAST(yq AS DECIMAL(20,4))) AS syy,
                   sum(xq * CAST(yq AS DECIMAL(20,4))) AS sxy
            FROM flt GROUP BY 1
        ),
        j AS (
            SELECT flt.flag, flt.lid, flt.l_quantity,
                   flt.l_extendedprice,
                   stats.n,
                   CAST(stats.n AS DOUBLE) AS nd,
                   CAST(stats.sx AS DOUBLE) AS sxd,
                   CAST(stats.sy AS DOUBLE) AS syd,
                   CAST(stats.sxx AS DOUBLE) AS sxxd,
                   CAST(stats.syy AS DOUBLE) AS syyd,
                   CAST(stats.sxy AS DOUBLE) AS sxyd
            FROM flt JOIN stats ON flt.flag = stats.flag
        ),
        m AS (
            SELECT *,
                   (nd * sxxd - sxd * sxd)
                       / (nd * (nd - 1.0)) AS vx,
                   (nd * syyd - syd * syd)
                       / (nd * (nd - 1.0)) AS vy,
                   (nd * sxyd - sxd * syd)
                       / (nd * (nd - 1.0)) AS cv,
                   CAST(l_quantity AS DOUBLE) - sxd / nd AS dx,
                   CAST(l_extendedprice AS DOUBLE) - syd / nd
                       AS dy
            FROM j
        ),
        f AS (
            SELECT flag, lid, l_quantity, l_extendedprice, n,
                   vx * vy - cv * cv AS det,
                   vy * dx * dx - 2.0 * cv * dx * dy
                       + vx * dy * dy AS numer
            FROM m
        )
        SELECT flag, lid AS id,
               l_quantity AS x, l_extendedprice AS y,
               CASE WHEN n >= 3 AND det > 0.0
                    THEN numer / det END AS md2,
               CASE WHEN n >= 3 AND det > 0.0
                    THEN numer / det > 9.21 END AS is_outlier
        FROM f
    """
    oracles["twoway"] = """
        -- exact cell sums; bounded margin folds; identity SS_E
        WITH o AS (
            SELECT o_totalprice,
                   CAST(row_number() OVER (ORDER BY o_orderkey)
                        AS BIGINT) AS rn,
                   CAST(count(*) OVER () AS BIGINT) AS nn
            FROM orders
        ),
        fac AS (
            SELECT rn % 2 AS fa,
                   CAST(floor(rn / 2) AS BIGINT) % 2 AS fb,
                   CAST(o_totalprice AS DECIMAL(18,4)) AS x
            FROM o WHERE rn <= nn - nn % 4
        ),
        cells AS (
            SELECT fa, fb, CAST(count(*) AS BIGINT) AS m,
                   sum(x) AS s,
                   sum(x * CAST(x AS DECIMAL(20,4))) AS q
            FROM fac GROUP BY 1, 2
        ),
        packed AS (
            SELECT CAST(max(m) AS BIGINT) AS m,
                   CAST(count(DISTINCT fa) AS BIGINT) AS r,
                   CAST(count(DISTINCT fb) AS BIGINT) AS c,
                   sum(s) AS ts, sum(q) AS tq,
                   CAST(sum(m) AS BIGINT) AS n,
                   list_sort(list(struct_pack(
                       a := fa, b := fb,
                       s := CAST(s AS DOUBLE)))) AS lv
            FROM cells
        ),
        t AS (
            SELECT *, CAST(m AS DOUBLE) AS md,
                   CAST(r AS DOUBLE) AS rd,
                   CAST(c AS DOUBLE) AS cd,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(ts AS DOUBLE) / CAST(n AS DOUBLE) AS gbar
            FROM packed
        ),
        ss AS (
            SELECT *,
                   list_reduce(list_prepend(0.0,
                       [(list_reduce(list_prepend(0.0,
                             [CASE WHEN o.a = e.a THEN o.s
                                   ELSE 0.0 END FOR o IN lv]),
                             (x1, v) -> x1 + v) / (md * cd) - gbar)
                        * (list_reduce(list_prepend(0.0,
                             [CASE WHEN o.a = e.a THEN o.s
                                   ELSE 0.0 END FOR o IN lv]),
                             (x1, v) -> x1 + v) / (md * cd) - gbar)
                        FOR e IN lv]),
                       (x1, v) -> x1 + v) / cd * (md * cd) AS ssa,
                   list_reduce(list_prepend(0.0,
                       [(list_reduce(list_prepend(0.0,
                             [CASE WHEN o.b = e.b THEN o.s
                                   ELSE 0.0 END FOR o IN lv]),
                             (x1, v) -> x1 + v) / (md * rd) - gbar)
                        * (list_reduce(list_prepend(0.0,
                             [CASE WHEN o.b = e.b THEN o.s
                                   ELSE 0.0 END FOR o IN lv]),
                             (x1, v) -> x1 + v) / (md * rd) - gbar)
                        FOR e IN lv]),
                       (x1, v) -> x1 + v) / rd * (md * rd) AS ssb,
                   list_reduce(list_prepend(0.0,
                       [(e.s / md
                         - list_reduce(list_prepend(0.0,
                               [CASE WHEN o.a = e.a THEN o.s
                                     ELSE 0.0 END FOR o IN lv]),
                               (x1, v) -> x1 + v) / (md * cd)
                         - list_reduce(list_prepend(0.0,
                               [CASE WHEN o.b = e.b THEN o.s
                                     ELSE 0.0 END FOR o IN lv]),
                               (x1, v) -> x1 + v) / (md * rd)
                         + gbar)
                        * (e.s / md
                           - list_reduce(list_prepend(0.0,
                                 [CASE WHEN o.a = e.a THEN o.s
                                       ELSE 0.0 END FOR o IN lv]),
                                 (x1, v) -> x1 + v) / (md * cd)
                           - list_reduce(list_prepend(0.0,
                                 [CASE WHEN o.b = e.b THEN o.s
                                       ELSE 0.0 END FOR o IN lv]),
                                 (x1, v) -> x1 + v) / (md * rd)
                           + gbar)
                        FOR e IN lv]),
                       (x1, v) -> x1 + v) * md AS ssab,
                   CAST(tq AS DOUBLE) - nd * gbar * gbar
                   - list_reduce(list_prepend(0.0,
                       [(e.s / md - gbar) * (e.s / md - gbar)
                        FOR e IN lv]),
                       (x1, v) -> x1 + v) * md AS sse
            FROM t
        )
        SELECT n, r, c, m,
               CASE WHEN m >= 2 AND r >= 2 AND c >= 2
                         AND sse > 0.0 THEN
                   ssa / (rd - 1.0)
                   / (sse / (nd - rd * cd)) END AS f_a,
               CASE WHEN m >= 2 AND r >= 2 AND c >= 2
                         AND sse > 0.0 THEN
                   ssb / (cd - 1.0)
                   / (sse / (nd - rd * cd)) END AS f_b,
               CASE WHEN m >= 2 AND r >= 2 AND c >= 2
                         AND sse > 0.0 THEN
                   ssab / ((rd - 1.0) * (cd - 1.0))
                   / (sse / (nd - rd * cd)) END AS f_ab,
               CASE WHEN m >= 2 AND r >= 2 AND c >= 2
                    THEN rd - 1.0 END AS df_a,
               CASE WHEN m >= 2 AND r >= 2 AND c >= 2
                    THEN cd - 1.0 END AS df_b,
               CASE WHEN m >= 2 AND r >= 2 AND c >= 2
                    THEN (rd - 1.0) * (cd - 1.0) END AS df_ab,
               CASE WHEN m >= 2 AND r >= 2 AND c >= 2
                    THEN nd - rd * cd END AS df_e
        FROM ss
    """
    oracles["rfm"] = """
        -- deterministic id-tiebroken rank bins (ceil(5*rn/n))
        WITH per_id AS (
            SELECT user_id AS id,
                   max(CAST(date_trunc('day', ts) AS DATE))
                       AS last_d,
                   CAST(count(*) AS BIGINT) AS frequency,
                   sum(CAST(value AS DECIMAL(18,2))) AS mon
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1
        ),
        staged AS (
            SELECT id,
                   CAST(max(last_d) OVER () - last_d AS BIGINT)
                       AS recency_days,
                   frequency,
                   CAST(mon AS DOUBLE) AS monetary,
                   mon,
                   CAST(count(*) OVER () AS BIGINT) AS n
            FROM per_id
        ),
        scored AS (
            SELECT id, recency_days, frequency, monetary,
                   CAST(ceil(5 * row_number() OVER
                       (ORDER BY recency_days DESC, id ASC)
                       / CAST(n AS DOUBLE)) AS INTEGER) AS r_score,
                   CAST(ceil(5 * row_number() OVER
                       (ORDER BY frequency ASC, id ASC)
                       / CAST(n AS DOUBLE)) AS INTEGER) AS f_score,
                   CAST(ceil(5 * row_number() OVER
                       (ORDER BY mon ASC, id ASC)
                       / CAST(n AS DOUBLE)) AS INTEGER) AS m_score
            FROM staged
        )
        SELECT id, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               CAST(r_score AS VARCHAR)
                   || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS rfm
        FROM scored
    """
    oracles["wcorr"] = """
        -- positional clamp bounds; exact clamped sums; one tree
        WITH flt AS (
            SELECT l_returnflag AS flag,
                   CAST(l_quantity AS DECIMAL(18,4)) AS x,
                   CAST(l_extendedprice AS DECIMAL(18,4)) AS y
            FROM lineitem
            WHERE l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL
        ),
        bx AS (
            SELECT flag,
                   max(CASE WHEN r = greatest((n * 10) // 100, 1)
                       THEN v END) AS lo_x,
                   max(CASE WHEN r = least(n - (n * 10) // 100 + 1,
                                           n)
                       THEN v END) AS hi_x
            FROM (SELECT flag, x AS v,
                         CAST(row_number() OVER
                             (PARTITION BY flag ORDER BY x)
                             AS BIGINT) AS r,
                         CAST(count(*) OVER (PARTITION BY flag)
                             AS BIGINT) AS n
                  FROM flt)
            GROUP BY 1
        ),
        byy AS (
            SELECT flag,
                   max(CASE WHEN r = greatest((n * 10) // 100, 1)
                       THEN v END) AS lo_y,
                   max(CASE WHEN r = least(n - (n * 10) // 100 + 1,
                                           n)
                       THEN v END) AS hi_y
            FROM (SELECT flag, y AS v,
                         CAST(row_number() OVER
                             (PARTITION BY flag ORDER BY y)
                             AS BIGINT) AS r,
                         CAST(count(*) OVER (PARTITION BY flag)
                             AS BIGINT) AS n
                  FROM flt)
            GROUP BY 1
        ),
        clamped AS (
            SELECT flt.flag,
                   least(greatest(flt.x, bx.lo_x), bx.hi_x) AS wx,
                   least(greatest(flt.y, byy.lo_y), byy.hi_y) AS wy
            FROM flt
            JOIN bx ON flt.flag = bx.flag
            JOIN byy ON flt.flag = byy.flag
        ),
        agg AS (
            SELECT flag, CAST(count(*) AS BIGINT) AS n,
                   sum(wx) AS sx, sum(wy) AS sy,
                   sum(wx * CAST(wx AS DECIMAL(20,4))) AS sxx,
                   sum(wy * CAST(wy AS DECIMAL(20,4))) AS syy,
                   sum(wx * CAST(wy AS DECIMAL(20,4))) AS sxy
            FROM clamped GROUP BY 1
        ),
        t AS (
            SELECT flag, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) AS sxd,
                   CAST(sy AS DOUBLE) AS syd,
                   CAST(sxx AS DOUBLE) AS sxxd,
                   CAST(syy AS DOUBLE) AS syyd,
                   CAST(sxy AS DOUBLE) AS sxyd
            FROM agg
        )
        SELECT flag, n,
               CASE WHEN n >= 2
                         AND nd * sxxd - sxd * sxd > 0.0
                         AND nd * syyd - syd * syd > 0.0
                    THEN (nd * sxyd - sxd * syd)
                         / sqrt((nd * sxxd - sxd * sxd)
                                * (nd * syyd - syd * syd))
               END AS r_winsor
        FROM t
    """
    oracles["kpss"] = """
        -- denominator-cleared KPSS: exact prefix/lag sums, one tree
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        rows_ AS (
            SELECT bucket, x,
                   CAST(sum(x) OVER (PARTITION BY bucket ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS DECIMAL(18,2)) AS c,
                   CAST(row_number() OVER
                        (PARTITION BY bucket ORDER BY d)
                        AS DECIMAL(10,0)) AS t,
                   lag(x, 1) OVER
                       (PARTITION BY bucket ORDER BY d) AS xl1,
                   lag(x, 2) OVER
                       (PARTITION BY bucket ORDER BY d) AS xl2,
                   lag(x, 3) OVER
                       (PARTITION BY bucket ORDER BY d) AS xl3,
                   lag(x, 4) OVER
                       (PARTITION BY bucket ORDER BY d) AS xl4
            FROM daily
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS s, sum(x * x) AS q,
                   sum(c * c) AS u, sum(t * c) AS v,
                   sum(x * xl1) AS a1, sum(x + xl1) AS b1,
                   sum(x * xl2) AS a2, sum(x + xl2) AS b2,
                   sum(x * xl3) AS a3, sum(x + xl3) AS b3,
                   sum(x * xl4) AS a4, sum(x + xl4) AS b4
            FROM rows_ GROUP BY 1
        ),
        dd AS (
            SELECT bucket, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(s AS DOUBLE) AS sd,
                   CAST(q AS DOUBLE) AS qd,
                   CAST(u AS DOUBLE) AS ud,
                   CAST(v AS DOUBLE) AS vd,
                   coalesce(CAST(a1 AS DOUBLE), 0.0) AS a1,
                   coalesce(CAST(b1 AS DOUBLE), 0.0) AS b1,
                   coalesce(CAST(a2 AS DOUBLE), 0.0) AS a2,
                   coalesce(CAST(b2 AS DOUBLE), 0.0) AS b2,
                   coalesce(CAST(a3 AS DOUBLE), 0.0) AS a3,
                   coalesce(CAST(b3 AS DOUBLE), 0.0) AS b3,
                   coalesce(CAST(a4 AS DOUBLE), 0.0) AS a4,
                   coalesce(CAST(b4 AS DOUBLE), 0.0) AS b4
            FROM agg
        ),
        t2 AS (
            SELECT *,
                   nd * (nd + 1.0) * (2.0 * nd + 1.0) / 6.0 AS wsq,
                   nd * nd * qd - nd * sd * sd
                   + 1.6 * (nd * nd * a1 - nd * sd * b1
                            + (nd - 1.0) * sd * sd)
                   + 1.2 * (nd * nd * a2 - nd * sd * b2
                            + (nd - 2.0) * sd * sd)
                   + 0.8 * (nd * nd * a3 - nd * sd * b3
                            + (nd - 3.0) * sd * sd)
                   + 0.3999999999999999
                     * (nd * nd * a4 - nd * sd * b4
                        + (nd - 4.0) * sd * sd) AS lrvn
            FROM dd
        ),
        t3 AS (
            SELECT *,
                   nd * nd * ud - 2.0 * nd * sd * vd
                   + sd * sd * wsq AS sp2
            FROM t2
        )
        SELECT bucket, n,
               CASE WHEN n >= 6 AND lrvn > 0.0
                    THEN lrvn / (nd * nd * nd) END AS lrv,
               CASE WHEN n >= 6 AND lrvn > 0.0
                    THEN sp2 / (nd * lrvn) END AS eta_kpss
        FROM t3
    """
    oracles["varratio"] = """
        -- rolling exact q-sums; expanded mean corrections; one z tree
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        rows_ AS (
            SELECT bucket, x,
                   CAST(sum(x) OVER (PARTITION BY bucket ORDER BY d
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                        AS DECIMAL(18,2)) AS w,
                   row_number() OVER
                       (PARTITION BY bucket ORDER BY d) AS t
            FROM daily
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS s, sum(x * x) AS qq,
                   sum(CASE WHEN t >= 4 THEN w END) AS sw,
                   sum(CASE WHEN t >= 4 THEN w * w END) AS sww
            FROM rows_ GROUP BY 1
        ),
        dd AS (
            SELECT bucket, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(s AS DOUBLE) AS sd,
                   CAST(qq AS DOUBLE) AS sq,
                   coalesce(CAST(sw AS DOUBLE), 0.0) AS sw,
                   coalesce(CAST(sww AS DOUBLE), 0.0) AS sww
            FROM agg
        ),
        t2 AS (
            SELECT *, sd / nd AS mu,
                   nd - 4.0 + 1.0 AS m,
                   (sq - sd * sd / nd) / nd AS var1
            FROM dd
        ),
        t3 AS (
            SELECT *,
                   (sww - 2.0 * 4.0 * mu * sw
                    + m * 4.0 * 4.0 * mu * mu) / (nd * 4.0)
                   / var1 AS vr
            FROM t2
        )
        SELECT bucket, n,
               CASE WHEN n >= 6 AND var1 > 0.0 THEN vr END AS vr,
               CASE WHEN n >= 6 AND var1 > 0.0
                    THEN sqrt(nd) * (vr - 1.0) / sqrt(3.5) END AS z_vr
        FROM t3
    """
    oracles["kalman"] = """
        -- the (a, P, K) fold as WITH RECURSIVE; same four IEEE ops
        WITH RECURSIVE daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        pl AS (
            SELECT bucket, list(x ORDER BY d) AS xs,
                   CAST(len(list(x ORDER BY d)) AS INTEGER) AS n
            FROM daily GROUP BY 1
        ),
        rec AS (
            SELECT bucket, xs, n, 1 AS t,
                   xs[1] AS a, CAST(1000000.0 AS DOUBLE) AS p,
                   CAST(NULL AS DOUBLE) AS k
            FROM pl
            UNION ALL
            SELECT bucket, xs, n, t + 1,
                   a + kk * (xs[t + 1] - a) AS a,
                   (1.0 - kk) * (p + 1000.0) AS p,
                   kk AS k
            FROM (
                SELECT r.*,
                       (r.p + 1000.0)
                       / ((r.p + 1000.0) + 5000.0) AS kk
                FROM rec r WHERE r.t < n
            )
        )
        SELECT bucket, n, a AS level, p AS p_var, k AS k_last
        FROM rec WHERE t = n
    """
    oracles["engle_granger"] = """
        -- 13 exact lagged cross-sums; polynomial-in-(alpha,beta) trees
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS y,
                   CAST(count(*) AS DECIMAL(18,2)) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT bucket, y, x,
                   lag(y, 1) OVER
                       (PARTITION BY bucket ORDER BY d) AS yp,
                   lag(x, 1) OVER
                       (PARTITION BY bucket ORDER BY d) AS xp
            FROM daily
        ),
        diffs AS (
            SELECT bucket, y, x, yp, xp,
                   CAST(y - yp AS DECIMAL(18,2)) AS dy,
                   CAST(x - xp AS DECIMAL(18,2)) AS dx
            FROM lagged
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy,
                   sum(yp) AS syp, sum(xp) AS sxp,
                   sum(yp * yp) AS sypp, sum(xp * xp) AS sxpp,
                   sum(xp * yp) AS sxyp,
                   sum(dy * dy) AS sdy2, sum(dx * dx) AS sdx2,
                   sum(dx * dy) AS sdxy,
                   sum(dy) AS sdy, sum(dx) AS sdx,
                   sum(yp * dy) AS sypdy, sum(yp * dx) AS sypdx,
                   sum(xp * dy) AS sxpdy, sum(xp * dx) AS sxpdx
            FROM diffs GROUP BY 1
        ),
        dd AS (
            SELECT bucket, n, CAST(n AS DOUBLE) AS nd,
                   coalesce(CAST(sx AS DOUBLE), 0.0) AS sx,
                   coalesce(CAST(sy AS DOUBLE), 0.0) AS sy,
                   coalesce(CAST(sxx AS DOUBLE), 0.0) AS sxx,
                   coalesce(CAST(sxy AS DOUBLE), 0.0) AS sxy,
                   coalesce(CAST(syp AS DOUBLE), 0.0) AS syp,
                   coalesce(CAST(sxp AS DOUBLE), 0.0) AS sxp,
                   coalesce(CAST(sypp AS DOUBLE), 0.0) AS sypp,
                   coalesce(CAST(sxpp AS DOUBLE), 0.0) AS sxpp,
                   coalesce(CAST(sxyp AS DOUBLE), 0.0) AS sxyp,
                   coalesce(CAST(sdy2 AS DOUBLE), 0.0) AS sdy2,
                   coalesce(CAST(sdx2 AS DOUBLE), 0.0) AS sdx2,
                   coalesce(CAST(sdxy AS DOUBLE), 0.0) AS sdxy,
                   coalesce(CAST(sdy AS DOUBLE), 0.0) AS sdy,
                   coalesce(CAST(sdx AS DOUBLE), 0.0) AS sdx,
                   coalesce(CAST(sypdy AS DOUBLE), 0.0) AS sypdy,
                   coalesce(CAST(sypdx AS DOUBLE), 0.0) AS sypdx,
                   coalesce(CAST(sxpdy AS DOUBLE), 0.0) AS sxpdy,
                   coalesce(CAST(sxpdx AS DOUBLE), 0.0) AS sxpdx
            FROM agg
        ),
        t1 AS (
            SELECT *, nd * sxx - sx * sx AS varx, nd - 1.0 AS m
            FROM dd
        ),
        t2 AS (
            SELECT *,
                   CASE WHEN varx > 0.0 THEN
                       (nd * sxy - sx * sy) / varx END AS b
            FROM t1
        ),
        t3 AS (
            SELECT *, (sy - b * sx) / nd AS a FROM t2
        ),
        t4 AS (
            SELECT *,
                   sypp - 2.0 * a * syp - 2.0 * b * sxyp
                        + a * a * m + 2.0 * a * b * sxp
                        + b * b * sxpp AS upp,
                   sypdy - b * sypdx - a * sdy + a * b * sdx
                         - b * sxpdy + b * b * sxpdx AS updu,
                   sdy2 - 2.0 * b * sdxy + b * b * sdx2 AS du2
            FROM t3
        ),
        t5 AS (
            SELECT *,
                   CASE WHEN upp > 0.0 THEN updu / upp END AS rho
            FROM t4
        ),
        t6 AS (
            SELECT *, du2 - rho * updu AS sse FROM t5
        ),
        t7 AS (
            SELECT *,
                   CASE WHEN upp > 0.0 AND m > 1.0 AND sse > 0.0
                        THEN sqrt(sse / (m - 1.0) / upp) END AS se
            FROM t6
        )
        SELECT bucket, n,
               CASE WHEN n >= 4 AND varx > 0.0 THEN a END AS alpha,
               CASE WHEN n >= 4 AND varx > 0.0 THEN b END AS beta,
               CASE WHEN n >= 4 AND varx > 0.0 AND upp > 0.0
                    THEN rho END AS rho,
               CASE WHEN n >= 4 AND varx > 0.0 AND upp > 0.0
                         AND sse > 0.0
                    THEN rho / se END AS t_eg
        FROM t7
    """
    oracles["seq_audit"] = """
        -- exact dupe/gap counts from one grouping
        WITH holed AS (
            SELECT l_orderkey, l_linenumber FROM lineitem
            WHERE l_linenumber <> 3 AND l_orderkey % 10 = 0
        ),
        agg AS (
            SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd,
                   CAST(min(l_linenumber) AS BIGINT) AS min_idx,
                   CAST(max(l_linenumber) AS BIGINT) AS max_idx
            FROM holed GROUP BY 1
        )
        SELECT l_orderkey, n, min_idx, max_idx,
               n - nd AS n_dupes,
               max_idx - min_idx + 1 - nd AS n_gaps,
               (min_idx = 1 AND n - nd = 0
                AND max_idx - min_idx + 1 - nd = 0) AS contiguous
        FROM agg
    """
    oracles["qnorm"] = """
        -- rank window + exact rank sums; one division
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS v
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        idx AS (
            SELECT bucket,
                   CAST(date_diff('day', DATE '1970-01-01', d)
                        AS INTEGER) AS t,
                   v,
                   row_number() OVER
                       (PARTITION BY bucket ORDER BY d) AS rn
            FROM daily
        ),
        trimmed AS (SELECT bucket, t, v FROM idx WHERE rn <= 28),
        ranked AS (
            SELECT bucket, t, v,
                   row_number() OVER
                       (PARTITION BY bucket ORDER BY v, t) AS r
            FROM trimmed
        ),
        ref AS (
            SELECT r, sum(v) AS s, CAST(count(*) AS BIGINT) AS g
            FROM ranked GROUP BY 1
        )
        SELECT ranked.bucket, ranked.t,
               CAST(ranked.v AS DOUBLE) AS value,
               CAST(ref.s AS DOUBLE) / CAST(ref.g AS DOUBLE) AS qnorm
        FROM ranked JOIN ref ON ranked.r = ref.r
    """
    oracles["fk_orphans_audit"] = """
        -- anti join + bounded lexical key sample
        WITH holed AS (
            SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0
        ),
        nonnull AS (
            SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL
        ),
        orphans AS (
            SELECT o_custkey FROM nonnull
            WHERE o_custkey NOT IN (SELECT c_custkey FROM holed)
        ),
        samp AS (
            SELECT list(k ORDER BY k) AS sample_keys
            FROM (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k
                  FROM orphans ORDER BY k LIMIT 5)
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_child,
               (SELECT CAST(count(*) AS BIGINT) FROM nonnull)
                   AS n_fk_nonnull,
               (SELECT CAST(count(*) AS BIGINT) FROM orphans)
                   AS n_orphan_rows,
               (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
                FROM orphans) AS n_orphan_keys,
               CASE WHEN (SELECT count(*) FROM nonnull) > 0 THEN
                   CAST((SELECT count(*) FROM orphans) AS DOUBLE)
                   / CAST((SELECT count(*) FROM nonnull) AS DOUBLE)
               END AS orphan_rate,
               coalesce((SELECT sample_keys FROM samp),
                        []::VARCHAR[]) AS sample_keys
    """
    oracles["fd_audit"] = """
        -- two cascaded NULL-safe groupings; violating groups only
        WITH pairs AS (
            SELECT o_custkey, o_orderpriority,
                   CAST(count(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2
        )
        SELECT o_custkey, CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_dep
        FROM pairs GROUP BY 1 HAVING count(*) > 1
    """
    oracles["risk_panel"] = """
        -- exact return sums + prefix-max drawdown; one tree per ratio
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS v
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        rets AS (
            SELECT bucket, d,
                   CAST(v - lag(v, 1) OVER
                       (PARTITION BY bucket ORDER BY d)
                       AS DECIMAL(18,2)) AS x
            FROM daily
        ),
        flt AS (SELECT * FROM rets WHERE x IS NOT NULL),
        staged AS (
            SELECT bucket, x,
                   CAST(least(x - CAST(0.0 AS DECIMAL(18,2)),
                              CAST(0 AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS dn,
                   CAST(sum(x) OVER (PARTITION BY bucket ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS DECIMAL(18,2)) AS c,
                   d
            FROM flt
        ),
        peaked AS (
            SELECT bucket, x, dn, c,
                   max(c) OVER (PARTITION BY bucket ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS peak
            FROM staged
        ),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS s, sum(x * x) AS q,
                   sum(dn * dn) AS d2,
                   max(peak - c) AS mdd
            FROM peaked GROUP BY 1
        ),
        dd AS (
            SELECT bucket, n, d2 AS d2dec, mdd AS mdddec,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(s AS DOUBLE) AS sd,
                   CAST(q AS DOUBLE) AS qd,
                   CAST(d2 AS DOUBLE) AS d2d,
                   CAST(mdd AS DOUBLE) AS mddd
            FROM agg
        ),
        t2 AS (
            SELECT *, sd / nd AS mu,
                   (qd - sd * sd / nd) / (nd - 1.0) AS sdsq
            FROM dd
        )
        SELECT bucket, n,
               CASE WHEN n >= 2 AND sdsq > 0.0
                    THEN sqrt(252.0) * mu / sqrt(sdsq) END AS sharpe,
               CASE WHEN n >= 2 AND d2d > 0.0
                    THEN sqrt(252.0) * mu / sqrt(d2d / nd)
               END AS sortino,
               mddd AS mdd,
               CASE WHEN n >= 2 AND mddd > 0.0
                    THEN mu * 252.0 / mddd END AS calmar
        FROM t2
    """
    oracles["omega"] = """
        -- two exact partial sums; one division
        WITH daily AS (
            SELECT user_id % 2 AS bucket,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS v
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        rets AS (
            SELECT bucket,
                   CAST(v - lag(v, 1) OVER
                       (PARTITION BY bucket ORDER BY d)
                       AS DECIMAL(18,2)) AS x
            FROM daily
        ),
        flt AS (SELECT * FROM rets WHERE x IS NOT NULL),
        agg AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN x > CAST(0.0 AS DECIMAL(18,2))
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_above,
                   sum(greatest(x - CAST(0.0 AS DECIMAL(18,2)),
                                CAST(0 AS DECIMAL(18,2)))) AS up,
                   sum(greatest(CAST(0.0 AS DECIMAL(18,2)) - x,
                                CAST(0 AS DECIMAL(18,2)))) AS dn
            FROM flt GROUP BY 1
        )
        SELECT bucket, n, n_above,
               CAST(up AS DOUBLE) AS upside,
               CAST(dn AS DOUBLE) AS downside,
               CASE WHEN dn > 0 THEN CAST(up AS DOUBLE)
                                     / CAST(dn AS DOUBLE) END AS omega
        FROM agg
    """
    oracles["chi2_residuals"] = """
        -- the L140 cell/margin pipeline; per-cell fixed trees
        WITH flt AS (
            SELECT o_orderpriority AS x, o_orderstatus AS y
            FROM orders
            WHERE o_orderpriority IS NOT NULL
              AND o_orderstatus IS NOT NULL
        ),
        cells AS (
            SELECT x, y, CAST(count(*) AS BIGINT) AS o
            FROM flt GROUP BY 1, 2
        ),
        rows_ AS (SELECT x, CAST(sum(o) AS BIGINT) AS rt
                  FROM cells GROUP BY 1),
        cols_ AS (SELECT y, CAST(sum(o) AS BIGINT) AS ct
                  FROM cells GROUP BY 1),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
        SELECT x, y, o,
               CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS e,
               CASE WHEN CAST(rt * ct AS DOUBLE)
                         / CAST(n AS DOUBLE) > 0.0
                    THEN (CAST(o AS DOUBLE)
                          - CAST(rt * ct AS DOUBLE)
                            / CAST(n AS DOUBLE))
                         / sqrt(CAST(rt * ct AS DOUBLE)
                                / CAST(n AS DOUBLE))
               END AS pearson_resid,
               CASE WHEN (CAST(rt * ct AS DOUBLE)
                          / CAST(n AS DOUBLE))
                         * (1.0 - CAST(rt AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                         * (1.0 - CAST(ct AS DOUBLE)
                                  / CAST(n AS DOUBLE)) > 0.0
                    THEN (CAST(o AS DOUBLE)
                          - CAST(rt * ct AS DOUBLE)
                            / CAST(n AS DOUBLE))
                         / sqrt((CAST(rt * ct AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                                * (1.0 - CAST(rt AS DOUBLE)
                                         / CAST(n AS DOUBLE))
                                * (1.0 - CAST(ct AS DOUBLE)
                                         / CAST(n AS DOUBLE)))
               END AS adj_resid
        FROM cells
        JOIN rows_ USING (x) JOIN cols_ USING (y)
        CROSS JOIN tot
    """
    oracles["interevent"] = """
        -- exact microsecond gaps (sorted-multiset differences are
        -- tie-order invariant); decimal stats; fixed CV/B trees
        WITH base AS (
            SELECT event_type AS g, epoch_us(ts) AS us
            FROM events WHERE ts IS NOT NULL
        ),
        gaps AS (
            SELECT g,
                   CAST(us - lag(us) OVER (PARTITION BY g
                                           ORDER BY us)
                        AS DECIMAL(20,0)) AS d
            FROM base
        ),
        agg AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n_gaps,
                   sum(d) AS s, sum(d * d) AS q
            FROM gaps WHERE d IS NOT NULL GROUP BY 1
        )
        SELECT g AS event_type, n_gaps,
               CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_us,
               CASE WHEN n_gaps >= 2 THEN
                   sqrt((CAST(n_gaps AS DOUBLE) * CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n_gaps AS DOUBLE)
                           * (CAST(n_gaps AS DOUBLE) - 1.0)))
               END AS sd_us,
               CASE WHEN n_gaps >= 2
                         AND (CAST(n_gaps AS DOUBLE)
                              * CAST(q AS DOUBLE)
                              - CAST(s AS DOUBLE)
                                * CAST(s AS DOUBLE))
                             / (CAST(n_gaps AS DOUBLE)
                                * (CAST(n_gaps AS DOUBLE) - 1.0))
                             >= 0.0
                         AND CAST(s AS DOUBLE)
                             / CAST(n_gaps AS DOUBLE) > 0.0
                    THEN sqrt((CAST(n_gaps AS DOUBLE)
                               * CAST(q AS DOUBLE)
                               - CAST(s AS DOUBLE)
                                 * CAST(s AS DOUBLE))
                              / (CAST(n_gaps AS DOUBLE)
                                 * (CAST(n_gaps AS DOUBLE) - 1.0)))
                         / (CAST(s AS DOUBLE)
                            / CAST(n_gaps AS DOUBLE))
               END AS cv,
               CASE WHEN n_gaps >= 2
                         AND (CAST(n_gaps AS DOUBLE)
                              * CAST(q AS DOUBLE)
                              - CAST(s AS DOUBLE)
                                * CAST(s AS DOUBLE))
                             / (CAST(n_gaps AS DOUBLE)
                                * (CAST(n_gaps AS DOUBLE) - 1.0))
                             >= 0.0
                         AND CAST(s AS DOUBLE)
                             / CAST(n_gaps AS DOUBLE) > 0.0
                         AND sqrt((CAST(n_gaps AS DOUBLE)
                                   * CAST(q AS DOUBLE)
                                   - CAST(s AS DOUBLE)
                                     * CAST(s AS DOUBLE))
                                  / (CAST(n_gaps AS DOUBLE)
                                     * (CAST(n_gaps AS DOUBLE)
                                        - 1.0)))
                             + CAST(s AS DOUBLE)
                               / CAST(n_gaps AS DOUBLE) > 0.0
                    THEN (sqrt((CAST(n_gaps AS DOUBLE)
                                * CAST(q AS DOUBLE)
                                - CAST(s AS DOUBLE)
                                  * CAST(s AS DOUBLE))
                               / (CAST(n_gaps AS DOUBLE)
                                  * (CAST(n_gaps AS DOUBLE) - 1.0)))
                          - CAST(s AS DOUBLE)
                            / CAST(n_gaps AS DOUBLE))
                         / (sqrt((CAST(n_gaps AS DOUBLE)
                                  * CAST(q AS DOUBLE)
                                  - CAST(s AS DOUBLE)
                                    * CAST(s AS DOUBLE))
                                 / (CAST(n_gaps AS DOUBLE)
                                    * (CAST(n_gaps AS DOUBLE)
                                       - 1.0)))
                            + CAST(s AS DOUBLE)
                              / CAST(n_gaps AS DOUBLE))
               END AS burstiness
        FROM agg
    """
    oracles["dispersion"] = """
        -- exact integer counts; one VMR tree
        WITH per AS (
            SELECT event_type AS g, user_id,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE user_id IS NOT NULL
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n,
                   sum(CAST(c AS DECIMAL(20,0))) AS s,
                   sum(CAST(c AS DECIMAL(20,0))
                       * CAST(c AS DECIMAL(20,0))) AS q
            FROM per GROUP BY 1
        )
        SELECT g AS event_type, n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               CASE WHEN n >= 2 THEN
                   (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
               END AS var,
               CASE WHEN n >= 2
                         AND CAST(s AS DOUBLE)
                             / CAST(n AS DOUBLE) > 0.0
                    THEN ((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                          / (CAST(n AS DOUBLE)
                             * (CAST(n AS DOUBLE) - 1.0)))
                         / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               END AS vmr
        FROM agg
    """
    oracles["gk_lambda"] = """
        -- exact integer cell/margin maxima; ONE division per
        -- direction, fold-free
        WITH flt AS (
            SELECT o_orderpriority AS x, o_orderstatus AS y
            FROM orders
            WHERE o_orderpriority IS NOT NULL
              AND o_orderstatus IS NOT NULL
        ),
        cells AS (
            SELECT x, y, CAST(count(*) AS BIGINT) AS o
            FROM flt GROUP BY 1, 2
        ),
        smy AS (
            SELECT CAST(sum(m) AS BIGINT) AS sum_max_y FROM (
                SELECT x, max(o) AS m FROM cells GROUP BY 1
            )
        ),
        smx AS (
            SELECT CAST(sum(m) AS BIGINT) AS sum_max_x FROM (
                SELECT y, max(o) AS m FROM cells GROUP BY 1
            )
        ),
        my AS (
            SELECT CAST(max(t) AS BIGINT) AS max_y,
                   CAST(sum(t) AS BIGINT) AS n FROM (
                SELECT y, sum(o) AS t FROM cells GROUP BY 1
            )
        ),
        mx AS (
            SELECT CAST(max(t) AS BIGINT) AS max_x FROM (
                SELECT x, sum(o) AS t FROM cells GROUP BY 1
            )
        )
        SELECT n,
               CASE WHEN n > max_y
                    THEN CAST(sum_max_y - max_y AS DOUBLE)
                         / CAST(n - max_y AS DOUBLE)
               END AS lambda_yx,
               CASE WHEN n > max_x
                    THEN CAST(sum_max_x - max_x AS DOUBLE)
                         / CAST(n - max_x AS DOUBLE)
               END AS lambda_xy
        FROM my CROSS JOIN mx CROSS JOIN smy CROSS JOIN smx
    """
    # L260: the L152 oracle nested verbatim + the two U divisions
    oracles["theils_u"] = f"""
        WITH m AS ({oracles["mutual_info"]})
        SELECT n, mi, h_x, h_y,
               CASE WHEN h_y > 0.0 THEN mi / h_y END AS u_yx,
               CASE WHEN h_x > 0.0 THEN mi / h_x END AS u_xy
        FROM m
    """
    oracles["diversity"] = """
        -- exact cells; bounded ln folds; order-insensitive max
        WITH cells AS (
            SELECT user_id % 2 AS bucket, event_type AS v,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE event_type IS NOT NULL
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT bucket,
                   CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k,
                   CAST(max(c) AS BIGINT) AS cmax,
                   list_sort(list(struct_pack(v := v, c := c))) AS lv
            FROM cells GROUP BY 1
        )
        SELECT bucket, n, k,
               -list_reduce(list_prepend(0.0,
                   [(CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                    * ln(CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                    FOR e IN lv]),
                   (acc, t) -> acc + t) AS shannon,
               CASE WHEN k > 1 THEN
                   -list_reduce(list_prepend(0.0,
                       [(CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                        * ln(CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                        FOR e IN lv]),
                       (acc, t) -> acc + t)
                   / ln(CAST(k AS DOUBLE)) END AS evenness,
               list_reduce(list_prepend(0.0,
                   [(CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                    FOR e IN lv]),
                   (acc, t) -> acc + t) AS simpson,
               CASE WHEN list_reduce(list_prepend(0.0,
                       [(CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                        FOR e IN lv]),
                       (acc, t) -> acc + t) > 0.0
                    THEN 1.0 / list_reduce(list_prepend(0.0,
                       [(CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                        FOR e IN lv]),
                       (acc, t) -> acc + t) END AS inv_simpson,
               CAST(cmax AS DOUBLE) / CAST(n AS DOUBLE)
                   AS berger_parker
        FROM agg
    """
    oracles["cumulative_incidence"] = """
        -- all-cause KM prefix products feeding per-cause d/n
        -- increments; nested bounded folds over the L159 grid
        WITH u AS (
            SELECT user_id,
                   (max(event_id) - min(event_id)) % 30 AS dur
            FROM events GROUP BY 1
        ),
        d0 AS (
            SELECT user_id % 2 AS cohort, dur,
                   CASE WHEN user_id % 5 = 0 THEN 0
                        ELSE (user_id % 3) % 2 + 1 END AS cause
            FROM u WHERE dur IS NOT NULL
        ),
        pts AS (
            SELECT cohort, CAST(dur AS BIGINT) AS t,
                   CAST(sum(CASE WHEN cause > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS d,
                   CAST(sum(CASE WHEN cause = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c
            FROM d0 GROUP BY 1, 2
        ),
        risk AS (
            SELECT cohort, t, d,
                   CAST(sum(d + c) OVER (PARTITION BY cohort)
                        - coalesce(sum(d + c) OVER (
                              PARTITION BY cohort ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0)
                        AS BIGINT) AS n
            FROM pts
        ),
        packed AS (
            SELECT cohort,
                   list_sort(list(struct_pack(
                       t := t, d := d, n := n))) AS a
            FROM risk GROUP BY 1
        ),
        ck AS (
            SELECT cohort, CAST(cause AS BIGINT) AS cause,
                   CAST(dur AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS dk
            FROM d0 WHERE cause > 0 GROUP BY 1, 2, 3
        ),
        karr AS (
            SELECT cohort, cause,
                   list_sort(list(struct_pack(t := t, dk := dk)))
                       AS k
            FROM ck GROUP BY 1, 2
        ),
        rws AS (
            SELECT karr.cohort, karr.cause, karr.k, packed.a,
                   unnest(karr.k) AS e
            FROM karr JOIN packed USING (cohort)
        )
        SELECT cohort, cause, e.t AS t,
               list_filter(a, x -> x.t = e.t)[1].n AS n_risk,
               e.dk AS n_events,
               list_reduce(list_prepend(0.0,
                   [list_reduce(list_prepend(1.0,
                        [CAST(x.n - x.d AS DOUBLE)
                         / CAST(x.n AS DOUBLE)
                         FOR x IN list_filter(a,
                             x -> x.t < f.t)]),
                        (acc, v) -> acc * v)
                    * (CAST(f.dk AS DOUBLE)
                       / CAST(list_filter(a,
                              x -> x.t = f.t)[1].n AS DOUBLE))
                    FOR f IN list_filter(k, f -> f.t <= e.t)]),
                   (acc, v) -> acc + v) AS cif
        FROM rws
    """
    oracles["icc"] = """
        -- exact decimal per-unit stats; S^2/n fold over the sorted
        -- unit list; fixed MSB/MSW/k0/ICC trees
        WITH base AS (
            SELECT user_id AS u,
                   CAST(CAST(floor(value) AS BIGINT)
                        AS DECIMAL(18,4)) AS x
            FROM events
            WHERE value IS NOT NULL AND user_id IS NOT NULL
        ),
        per AS (
            SELECT u, CAST(count(*) AS BIGINT) AS nj,
                   sum(x) AS s, sum(x * x) AS sxx
            FROM base GROUP BY 1
        ),
        arr AS (
            SELECT CAST(count(*) AS BIGINT) AS n_units,
                   CAST(sum(nj) AS BIGINT) AS n,
                   CAST(sum(s) AS DOUBLE) AS st,
                   CAST(sum(sxx) AS DOUBLE) AS qt,
                   CAST(sum(CAST(nj AS DECIMAL(38,0)) * nj)
                        AS DOUBLE) AS nsq,
                   list_reduce(list_prepend(0.0,
                       [(CAST(v.s AS DOUBLE) * CAST(v.s AS DOUBLE))
                        / CAST(v.nj AS DOUBLE)
                        FOR v IN list_sort(list(struct_pack(
                            u := u, nj := nj, s := s)))]),
                       (acc, t) -> acc + t) AS ssb_units
            FROM per
        )
        SELECT n_units, n,
               CASE WHEN n_units >= 2
                    THEN (ssb_units - (st * st) / CAST(n AS DOUBLE))
                         / (CAST(n_units AS DOUBLE) - 1.0) END AS msb,
               CASE WHEN n > n_units
                    THEN (qt - ssb_units)
                         / (CAST(n AS DOUBLE)
                            - CAST(n_units AS DOUBLE)) END AS msw,
               CASE WHEN n_units >= 2
                    THEN (CAST(n AS DOUBLE) - nsq / CAST(n AS DOUBLE))
                         / (CAST(n_units AS DOUBLE) - 1.0) END AS k0,
               CASE WHEN n_units >= 2 AND n > n_units
                         AND (ssb_units - (st * st)
                                          / CAST(n AS DOUBLE))
                             / (CAST(n_units AS DOUBLE) - 1.0)
                             + ((CAST(n AS DOUBLE)
                                 - nsq / CAST(n AS DOUBLE))
                                / (CAST(n_units AS DOUBLE) - 1.0)
                                - 1.0)
                               * ((qt - ssb_units)
                                  / (CAST(n AS DOUBLE)
                                     - CAST(n_units AS DOUBLE)))
                             <> 0.0
                    THEN ((ssb_units - (st * st) / CAST(n AS DOUBLE))
                          / (CAST(n_units AS DOUBLE) - 1.0)
                          - (qt - ssb_units)
                            / (CAST(n AS DOUBLE)
                               - CAST(n_units AS DOUBLE)))
                         / ((ssb_units - (st * st)
                                         / CAST(n AS DOUBLE))
                            / (CAST(n_units AS DOUBLE) - 1.0)
                            + ((CAST(n AS DOUBLE)
                                - nsq / CAST(n AS DOUBLE))
                               / (CAST(n_units AS DOUBLE) - 1.0)
                               - 1.0)
                              * ((qt - ssb_units)
                                 / (CAST(n AS DOUBLE)
                                    - CAST(n_units AS DOUBLE))))
               END AS icc
        FROM arr
    """
    oracles["tukey"] = """
        -- exact decimal level stats; bounded MSW fold; one q tree
        -- per ordered pair
        WITH base AS (
            SELECT event_type AS g,
                   CAST(CAST(floor(value) AS BIGINT)
                        AS DECIMAL(18,4)) AS x
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        per AS (
            SELECT g, CAST(count(*) AS BIGINT) AS nj,
                   sum(x) AS s, sum(x * x) AS sxx
            FROM base GROUP BY 1
        ),
        arr AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(nj) AS BIGINT) AS n,
                   list_reduce(list_prepend(0.0,
                       [(CAST(v.sxx AS DOUBLE)
                         - (CAST(v.s AS DOUBLE)
                            * CAST(v.s AS DOUBLE))
                           / CAST(v.nj AS DOUBLE))
                        FOR v IN list_sort(list(struct_pack(
                            g := g, sxx := CAST(sxx AS DOUBLE),
                            s := CAST(s AS DOUBLE),
                            nj := CAST(nj AS DOUBLE))))]),
                       (acc, t) -> acc + t) AS ssw
            FROM per
        ),
        stats AS (
            SELECT k, n,
                   CASE WHEN n > k
                             AND ssw / (CAST(n AS DOUBLE)
                                        - CAST(k AS DOUBLE)) > 0.0
                        THEN ssw / (CAST(n AS DOUBLE)
                                    - CAST(k AS DOUBLE)) END AS msw
            FROM arr
        )
        SELECT a.g AS g_a, b.g AS g_b, a.nj AS n_a, b.nj AS n_b,
               CAST(a.s AS DOUBLE) / CAST(a.nj AS DOUBLE) AS mean_a,
               CAST(b.s AS DOUBLE) / CAST(b.nj AS DOUBLE) AS mean_b,
               CASE WHEN stats.msw IS NOT NULL THEN
                   (CAST(a.s AS DOUBLE) / CAST(a.nj AS DOUBLE)
                    - CAST(b.s AS DOUBLE) / CAST(b.nj AS DOUBLE))
                   / sqrt((stats.msw / 2.0)
                          * (1.0 / CAST(a.nj AS DOUBLE)
                             + 1.0 / CAST(b.nj AS DOUBLE)))
               END AS q
        FROM per a JOIN per b ON a.g < b.g CROSS JOIN stats
    """
    oracles["nelson_aalen"] = """
        -- H(t) = sum d/n, Var = sum d/n^2 as t-sorted prefix folds
        -- over the L159 grid
        WITH u AS (
            SELECT user_id,
                   (max(event_id) - min(event_id)) % 30 AS dur
            FROM events GROUP BY 1
        ),
        d AS (
            SELECT user_id % 2 AS cohort, dur,
                   CASE WHEN user_id % 5 <> 0 THEN 1 ELSE 0 END AS ev
            FROM u
        ),
        pts AS (
            SELECT cohort, CAST(dur AS BIGINT) AS t,
                   CAST(sum(ev) AS BIGINT) AS d,
                   CAST(sum(1 - ev) AS BIGINT) AS c
            FROM d WHERE dur IS NOT NULL GROUP BY 1, 2
        ),
        risk AS (
            SELECT cohort, t, d, c,
                   CAST(sum(d + c) OVER (PARTITION BY cohort)
                        - coalesce(sum(d + c) OVER (
                              PARTITION BY cohort ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0)
                        AS BIGINT) AS n
            FROM pts
        ),
        packed AS (
            SELECT cohort,
                   list_sort(list(struct_pack(
                       t := t, d := d, c := c, n := n))) AS a
            FROM risk GROUP BY 1
        ),
        rws AS (SELECT cohort, a, unnest(a) AS s FROM packed)
        SELECT cohort, s.t AS t, s.n AS n_risk, s.d AS n_events,
               s.c AS n_censored,
               list_reduce(list_prepend(0.0,
                   [CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)
                    FOR x IN list_filter(a, x -> x.t <= s.t)]),
                   (acc, v) -> acc + v) AS cumhaz,
               list_reduce(list_prepend(0.0,
                   [CAST(x.d AS DOUBLE)
                    / (CAST(x.n AS DOUBLE) * CAST(x.n AS DOUBLE))
                    FOR x IN list_filter(a, x -> x.t <= s.t)]),
                   (acc, v) -> acc + v) AS var_cumhaz
        FROM rws
    """
    oracles["morans_i"] = """
        -- the L212 grid pairs + floored-mean centring: P/Q/D2 exact
        -- decimals, one delta division, fixed correction trees
        WITH pts AS (
            SELECT c_custkey AS id,
                   CAST((c_custkey * 37) % 18000 AS DOUBLE)
                   / 100.0 - 90.0 AS lat,
                   CAST((c_custkey * 73) % 36000 AS DOUBLE)
                   / 100.0 - 180.0 AS lon,
                   CAST(CAST(floor(c_acctbal) AS BIGINT)
                        AS DECIMAL(12,4)) AS x
            FROM customer
            WHERE c_custkey % 5 = 0 AND c_acctbal IS NOT NULL
        ),
        stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS DECIMAL(24,4)) AS s
            FROM pts
        ),
        m0t AS (
            SELECT n, s,
                   CAST(floor(s / n) AS DECIMAL(12,4)) AS m0
            FROM stats
        ),
        centred AS (
            SELECT id, x - m0 AS dd FROM pts CROSS JOIN m0t
        ),
        d2 AS (
            SELECT CAST(sum(dd * dd) AS DECIMAL(38,8)) AS d2
            FROM centred
        ),
        cells AS (
            SELECT id, lat, lon,
                   CAST(floor(lat / 5.0) AS BIGINT) AS cx,
                   ((CAST(floor(lon / 5.0) AS BIGINT) % 72) + 72)
                       % 72 AS cy
            FROM pts
        ),
        lft AS (
            SELECT id AS a, cx + dx.d AS jx,
                   (((cy + dy.d) % 72) + 72) % 72 AS jy
            FROM cells,
                 (VALUES (-1), (0), (1)) dx(d),
                 (VALUES (-1), (0), (1)) dy(d)
        ),
        pr AS (
            SELECT lft.a, r.id AS b
            FROM lft JOIN cells r
              ON lft.jx = r.cx AND lft.jy = r.cy
            WHERE lft.a < r.id
        ),
        psums AS (
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(ca.dd * cb.dd) AS DECIMAL(38,8)) AS p,
                   CAST(sum(ca.dd + cb.dd) AS DECIMAL(38,4)) AS q
            FROM pr
            JOIN centred ca ON ca.id = pr.a
            JOIN centred cb ON cb.id = pr.b
        )
        SELECT n,
               coalesce(n_pairs, 0) AS n_pairs,
               2.0 * CAST(coalesce(n_pairs, 0) AS DOUBLE) AS w,
               CASE WHEN CAST(coalesce(n_pairs, 0) AS DOUBLE) > 0.0
                         AND CAST(d2 AS DOUBLE)
                             - CAST(n AS DOUBLE)
                               * ((CAST(s - n * m0 AS DOUBLE)
                                   / CAST(n AS DOUBLE))
                                  * (CAST(s - n * m0 AS DOUBLE)
                                     / CAST(n AS DOUBLE))) > 0.0
                    THEN ((CAST(n AS DOUBLE)
                           / (2.0 * CAST(coalesce(n_pairs, 0)
                                         AS DOUBLE)))
                          * (2.0 * ((coalesce(CAST(p AS DOUBLE), 0.0)
                                     - (CAST(s - n * m0 AS DOUBLE)
                                        / CAST(n AS DOUBLE))
                                       * coalesce(CAST(q AS DOUBLE),
                                                  0.0))
                                    + CAST(coalesce(n_pairs, 0)
                                           AS DOUBLE)
                                      * ((CAST(s - n * m0 AS DOUBLE)
                                          / CAST(n AS DOUBLE))
                                         * (CAST(s - n * m0
                                                 AS DOUBLE)
                                            / CAST(n AS DOUBLE))))))
                         / (CAST(d2 AS DOUBLE)
                            - CAST(n AS DOUBLE)
                              * ((CAST(s - n * m0 AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                                 * (CAST(s - n * m0 AS DOUBLE)
                                    / CAST(n AS DOUBLE))))
               END AS i_moran,
               CASE WHEN n > 1
                    THEN -1.0 / (CAST(n AS DOUBLE) - 1.0)
               END AS e_i
        FROM m0t CROSS JOIN d2 CROSS JOIN psums
    """
    oracles["bowker"] = """
        -- paired cells; full-outer (i<j) pair table; one division per
        -- non-empty pair folded in sorted order
        WITH e AS (
            SELECT event_type AS x,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       AS y
            FROM events
        ),
        cells AS (
            SELECT x, y, CAST(count(*) AS BIGINT) AS o FROM e
            WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1, 2
        ),
        a AS (SELECT x AS i, y AS j, o AS nij FROM cells WHERE x < y),
        b AS (SELECT y AS i, x AS j, o AS nji FROM cells WHERE y < x),
        pairs AS (
            SELECT coalesce(a.i, b.i) AS i, coalesce(a.j, b.j) AS j,
                   coalesce(a.nij, 0) AS nij,
                   coalesce(b.nji, 0) AS nji
            FROM a FULL JOIN b ON a.i = b.i AND a.j = b.j
        ),
        ks AS (
            SELECT CAST(count(DISTINCT c) AS BIGINT) AS k FROM (
                SELECT x AS c FROM cells
                UNION ALL SELECT y FROM cells
            )
        ),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        agg AS (
            SELECT CAST(sum(CASE WHEN nij + nji > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dof,
                   list_reduce(list_prepend(0.0,
                       [CASE WHEN v.nij + v.nji > 0
                             THEN (CAST(v.nij - v.nji AS DOUBLE)
                                   * CAST(v.nij - v.nji AS DOUBLE))
                                  / CAST(v.nij + v.nji AS DOUBLE)
                             ELSE 0.0 END
                        FOR v IN list_sort(list(struct_pack(
                            i := i, j := j, nij := nij,
                            nji := nji)))]),
                       (acc, t) -> acc + t) AS chi2
            FROM pairs
        )
        SELECT k, n,
               CASE WHEN dof > 0 THEN chi2 END AS chi2,
               coalesce(dof, 0) AS dof
        FROM ks CROSS JOIN tot CROSS JOIN agg
    """
    oracles["g_test"] = """
        -- observed cells, o*ln(o*N/(rt*ct)) trees, sorted-cell fold
        WITH flt AS (
            SELECT o_orderpriority AS x, o_orderstatus AS y
            FROM orders
            WHERE o_orderpriority IS NOT NULL
              AND o_orderstatus IS NOT NULL
        ),
        cells AS (
            SELECT x, y, CAST(count(*) AS BIGINT) AS o
            FROM flt GROUP BY 1, 2
        ),
        rows_ AS (SELECT x, CAST(sum(o) AS BIGINT) AS rt
                  FROM cells GROUP BY 1),
        cols_ AS (SELECT y, CAST(sum(o) AS BIGINT) AS ct
                  FROM cells GROUP BY 1),
        tot AS (
            SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT x) AS BIGINT) AS r,
                   CAST(count(DISTINCT y) AS BIGINT) AS c
            FROM cells
        ),
        terms AS (
            SELECT tot.n, tot.r, tot.c, cells.x, cells.y,
                   CAST(cells.o AS DOUBLE)
                   * ln(CAST(cells.o AS DOUBLE)
                        * CAST(tot.n AS DOUBLE)
                        / CAST(rows_.rt * cols_.ct AS DOUBLE))
                       AS term
            FROM cells
            JOIN rows_ USING (x) JOIN cols_ USING (y)
            CROSS JOIN tot
        )
        SELECT n, r, c,
               CASE WHEN r >= 2 AND c >= 2 THEN
                   2.0 * list_reduce(list_prepend(0.0,
                       [s.term FOR s IN list_sort(list(struct_pack(
                           x := x, y := y, term := term)))]),
                       (acc, t) -> acc + t)
               END AS g,
               (r - 1) * (c - 1) AS dof
        FROM terms GROUP BY 1, 2, 3
    """
    oracles["topk_churn"] = """
        -- per-period top-10 with the T1 tiebreak; dense-rank period
        -- pairing; exact overlap counts, one jaccard division
        WITH agg AS (
            SELECT CAST(floor(event_id / 100) AS BIGINT) AS p,
                   user_id AS item,
                   CAST(count(*) AS BIGINT) AS s
            FROM events
            WHERE event_id IS NOT NULL AND user_id IS NOT NULL
            GROUP BY 1, 2
        ),
        top AS (
            SELECT p, item FROM (
                SELECT p, item,
                       row_number() OVER (PARTITION BY p
                           ORDER BY s DESC, item ASC) AS rn
                FROM agg
            ) WHERE rn <= 10
        ),
        periods AS (
            SELECT p, CAST(dense_rank() OVER (ORDER BY p) AS BIGINT)
                       AS o
            FROM (SELECT DISTINCT p FROM top)
        ),
        tp AS (
            SELECT top.p, periods.o, top.item
            FROM top JOIN periods USING (p)
        ),
        cur AS (SELECT p AS period, o, item FROM tp),
        prv AS (SELECT p AS prev_period, o + 1 AS o, item FROM tp),
        sc AS (SELECT period, o, CAST(count(*) AS BIGINT) AS nc
               FROM cur GROUP BY 1, 2),
        sp AS (SELECT prev_period, o, CAST(count(*) AS BIGINT) AS np_
               FROM prv GROUP BY 1, 2),
        common AS (
            SELECT cur.period, prv.prev_period, cur.o,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM cur JOIN prv
              ON cur.o = prv.o AND cur.item = prv.item
            GROUP BY 1, 2, 3
        )
        SELECT sc.period, sp.prev_period,
               coalesce(common.n_common, 0) AS n_common,
               CASE WHEN (sc.nc + sp.np_)
                         - coalesce(common.n_common, 0) > 0
                    THEN CAST(coalesce(common.n_common, 0) AS DOUBLE)
                         / CAST((sc.nc + sp.np_)
                                - coalesce(common.n_common, 0)
                                AS DOUBLE) END AS jaccard,
               sc.nc - coalesce(common.n_common, 0) AS entered,
               sp.np_ - coalesce(common.n_common, 0) AS exited
        FROM sc JOIN sp USING (o)
        LEFT JOIN common
          ON common.period = sc.period
         AND common.prev_period = sp.prev_period
         AND common.o = sc.o
    """
    oracles["poisson_rate"] = """
        -- exact count/decimal exposure sums; conditional binomial z
        WITH base AS (
            SELECT event_type AS g,
                   CAST(floor(value) AS BIGINT) AS c,
                   CAST(user_id % 7 + 1 AS DECIMAL(18,4)) AS t
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
        ),
        agg AS (
            SELECT
                CAST(sum(CASE WHEN g = 'click' THEN c ELSE 0 END)
                     AS BIGINT) AS c_a,
                CAST(sum(CASE WHEN g = 'view' THEN c ELSE 0 END)
                     AS BIGINT) AS c_b,
                CAST(sum(CASE WHEN g = 'click' THEN t
                         ELSE CAST(0 AS DECIMAL(18,4)) END)
                     AS DECIMAL(28,4)) AS ta,
                CAST(sum(CASE WHEN g = 'view' THEN t
                         ELSE CAST(0 AS DECIMAL(18,4)) END)
                     AS DECIMAL(28,4)) AS tb
            FROM base
        )
        SELECT c_a, c_b,
               CAST(ta AS DOUBLE) AS t_a,
               CAST(tb AS DOUBLE) AS t_b,
               CASE WHEN ta > 0 THEN CAST(c_a AS DOUBLE)
                                     / CAST(ta AS DOUBLE) END
                   AS rate_a,
               CASE WHEN tb > 0 THEN CAST(c_b AS DOUBLE)
                                     / CAST(tb AS DOUBLE) END
                   AS rate_b,
               CASE WHEN ta > 0 AND tb > 0 AND c_b > 0
                    THEN (CAST(c_a AS DOUBLE) / CAST(ta AS DOUBLE))
                         / (CAST(c_b AS DOUBLE) / CAST(tb AS DOUBLE))
               END AS rate_ratio,
               CASE WHEN c_a + c_b > 0
                         AND CAST(ta AS DOUBLE)
                             / CAST(ta + tb AS DOUBLE) > 0.0
                         AND CAST(ta AS DOUBLE)
                             / CAST(ta + tb AS DOUBLE) < 1.0
                    THEN (CAST(c_a AS DOUBLE)
                          - CAST(c_a + c_b AS DOUBLE)
                            * (CAST(ta AS DOUBLE)
                               / CAST(ta + tb AS DOUBLE)))
                         / sqrt((CAST(c_a + c_b AS DOUBLE)
                                 * (CAST(ta AS DOUBLE)
                                    / CAST(ta + tb AS DOUBLE)))
                                * (1.0 - CAST(ta AS DOUBLE)
                                         / CAST(ta + tb AS DOUBLE)))
               END AS z
        FROM agg
    """
    # L247: the L190 oracle nested verbatim + the W identity
    oracles["kendalls_w"] = f"""
        WITH f AS ({oracles["friedman"]})
        SELECT grp, k, n_blocks, q,
               q / (CAST(n_blocks AS DOUBLE)
                    * (CAST(k AS DOUBLE) - 1.0)) AS w
        FROM f
    """
    oracles["hellinger"] = """
        -- exact cells; bounded sqrt-term fold; clamped metric
        WITH pts AS (
            SELECT user_id % 2 AS bucket,
                   CAST(floor(value) AS BIGINT) AS v,
                   event_type AS g,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
            GROUP BY 1, 2, 3
        ),
        vals AS (
            SELECT bucket, v,
                   CAST(sum(CASE WHEN g = 'click' THEN c ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(sum(CASE WHEN g = 'view' THEN c ELSE 0 END)
                        AS BIGINT) AS b
            FROM pts GROUP BY 1, 2
        ),
        agg AS (
            SELECT bucket,
                   CAST(sum(a) AS BIGINT) AS n_a,
                   CAST(sum(b) AS BIGINT) AS n_b,
                   list_sort(list(struct_pack(v := v, a := a, b := b)))
                       AS lv
            FROM vals GROUP BY 1
        ),
        f AS (
            SELECT bucket, n_a, n_b,
                   list_reduce(list_prepend(0.0,
                       [sqrt((CAST(e.a AS DOUBLE)
                              / CAST(n_a AS DOUBLE))
                             * (CAST(e.b AS DOUBLE)
                                / CAST(n_b AS DOUBLE)))
                        FOR e IN lv]),
                       (acc, t) -> acc + t) AS bc
            FROM agg
        )
        SELECT bucket, n_a, n_b,
               CASE WHEN n_a > 0 AND n_b > 0 THEN bc END AS bc,
               CASE WHEN n_a > 0 AND n_b > 0
                    THEN sqrt(greatest(0.0, 1.0 - bc)) END
                   AS hellinger,
               CASE WHEN n_a > 0 AND n_b > 0 AND bc > 0.0
                    THEN -ln(bc) END AS bhattacharyya
        FROM f
    """
    oracles["page_trend"] = """
        -- the L190 block-rank CTEs + treatment scores by dense_rank;
        -- 2L and 2E exact integers, one fixed z tree
        WITH cell AS (
            SELECT CAST(l_orderkey % 3 AS BIGINT) AS grp,
                   l_orderkey AS b, l_linenumber AS t,
                   max(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
            FROM lineitem
            WHERE l_orderkey IS NOT NULL
              AND l_linenumber IS NOT NULL
              AND l_extendedprice IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        kdf AS (
            SELECT grp, CAST(count(DISTINCT t) AS BIGINT) AS k
            FROM cell GROUP BY 1
        ),
        bs AS (
            SELECT grp, b, CAST(count(*) AS BIGINT) AS bc
            FROM cell GROUP BY 1, 2
        ),
        keep AS (
            SELECT c.grp, c.b, c.t, c.v, kdf.k
            FROM cell c
            JOIN bs USING (grp, b) JOIN kdf USING (grp)
            WHERE bs.bc = kdf.k AND kdf.k >= 2
        ),
        ranked AS (
            SELECT grp, b, t, k,
                   CAST(2 * count(*) OVER (PARTITION BY grp, b
                            ORDER BY v RANGE BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW)
                        - count(*) OVER (PARTITION BY grp, b, v)
                        + 1 AS BIGINT) AS r2
            FROM keep
        ),
        tr AS (
            SELECT grp, k, t,
                   CAST(sum(r2) AS HUGEINT) AS r2j,
                   CAST(count(*) AS BIGINT) AS nb
            FROM ranked GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT grp, k, r2j, nb,
                   CAST(dense_rank() OVER (PARTITION BY grp
                                           ORDER BY t) AS HUGEINT)
                       AS c
            FROM tr
        ),
        agg AS (
            SELECT grp, k,
                   CAST(max(nb) AS BIGINT) AS n_blocks,
                   CAST(sum(c * r2j) AS HUGEINT) AS l2
            FROM scored GROUP BY 1, 2
        )
        SELECT grp, k, n_blocks,
               CAST(l2 AS DOUBLE) / 2.0 AS l_stat,
               CASE WHEN k >= 3
                         AND (((CAST(n_blocks AS DOUBLE)
                                * CAST(k AS DOUBLE))
                               * CAST(k AS DOUBLE))
                              * (CAST(k AS DOUBLE) + 1.0))
                             * (CAST(k AS DOUBLE)
                                * CAST(k AS DOUBLE) - 1.0)
                             / 144.0 > 0.0
                    THEN CAST(l2 - (CAST(n_blocks AS HUGEINT) * k
                                    * (k + 1) * (k + 1)) // 2
                              AS DOUBLE)
                         / (2.0 * sqrt((((CAST(n_blocks AS DOUBLE)
                                          * CAST(k AS DOUBLE))
                                         * CAST(k AS DOUBLE))
                                        * (CAST(k AS DOUBLE) + 1.0))
                                       * (CAST(k AS DOUBLE)
                                          * CAST(k AS DOUBLE)
                                          - 1.0)
                                       / 144.0))
               END AS z
        FROM agg
    """
    oracles["capture_recapture"] = """
        -- exact distinct/overlap counts; fixed estimator trees
        WITH a AS (
            SELECT DISTINCT o_custkey AS i FROM orders
            WHERE o_orderkey % 2 = 0 AND o_custkey IS NOT NULL
        ),
        b AS (
            SELECT DISTINCT o_custkey AS i FROM orders
            WHERE o_orderkey % 3 = 0 AND o_custkey IS NOT NULL
        ),
        c AS (
            SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
                   CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
                   CAST((SELECT count(*) FROM a JOIN b USING (i))
                        AS BIGINT) AS n_overlap
        )
        SELECT n_a, n_b, n_overlap,
               CASE WHEN n_overlap > 0
                    THEN (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                         / CAST(n_overlap AS DOUBLE) END
                   AS lincoln_petersen,
               ((CAST(n_a AS DOUBLE) + 1.0)
                * (CAST(n_b AS DOUBLE) + 1.0))
               / (CAST(n_overlap AS DOUBLE) + 1.0) - 1.0 AS chapman,
               sqrt(((CAST(n_a AS DOUBLE) + 1.0)
                     * (CAST(n_b AS DOUBLE) + 1.0)
                     * (CAST(n_a AS DOUBLE)
                        - CAST(n_overlap AS DOUBLE))
                     * (CAST(n_b AS DOUBLE)
                        - CAST(n_overlap AS DOUBLE)))
                    / ((CAST(n_overlap AS DOUBLE) + 1.0)
                       * (CAST(n_overlap AS DOUBLE) + 1.0)
                       * (CAST(n_overlap AS DOUBLE) + 2.0)))
                   AS se_chapman
        FROM c
    """
    oracles["ks_uniform"] = """
        -- tie-correct ECDF jump candidates vs the exact-decimal
        -- uniform CDF; order-insensitive maxima
        WITH base AS (
            SELECT event_type AS g,
                   CAST(CAST(floor(value) AS BIGINT) % 100
                        AS DECIMAL(18,4)) AS x
            FROM events WHERE value IS NOT NULL
        ),
        pv AS (
            SELECT g, x, CAST(count(*) AS BIGINT) AS l
            FROM base GROUP BY 1, 2
        ),
        pre AS (
            SELECT g, x, l,
                   CAST(sum(l) OVER (PARTITION BY g ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS c,
                   CAST(sum(l) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM pv
        ),
        agg AS (
            SELECT g, n,
                   max(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                       - CAST(x - CAST('0' AS DECIMAL(18,4))
                              AS DOUBLE)
                         / CAST(CAST('99' AS DECIMAL(18,4))
                                - CAST('0' AS DECIMAL(18,4))
                                AS DOUBLE)) AS d_plus,
                   max(CAST(x - CAST('0' AS DECIMAL(18,4)) AS DOUBLE)
                       / CAST(CAST('99' AS DECIMAL(18,4))
                              - CAST('0' AS DECIMAL(18,4)) AS DOUBLE)
                       - CAST(c - l AS DOUBLE)
                         / CAST(n AS DOUBLE)) AS d_minus
            FROM pre GROUP BY 1, 2
        )
        SELECT g AS event_type, n, d_plus, d_minus,
               greatest(d_plus, d_minus) AS d,
               sqrt(CAST(n AS DOUBLE))
               * greatest(d_plus, d_minus) AS stat
        FROM agg
    """
    oracles["anderson_darling"] = """
        -- Scholz-Stephens tie-corrected cells over doubled
        -- mid-cumulatives (exact BIGINTs); ordered per-sample folds
        WITH pts AS (
            SELECT user_id % 2 AS bucket,
                   CAST(floor(value) AS BIGINT) AS v,
                   event_type AS g,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')
            GROUP BY 1, 2, 3
        ),
        vals AS (
            SELECT bucket, v,
                   CAST(sum(CASE WHEN g = 'click' THEN c ELSE 0 END)
                        AS BIGINT) AS la,
                   CAST(sum(CASE WHEN g = 'view' THEN c ELSE 0 END)
                        AS BIGINT) AS lb
            FROM pts GROUP BY 1, 2
        ),
        pre AS (
            SELECT bucket, v, la + lb AS l, la, lb,
                   CAST(coalesce(sum(la + lb) OVER w_prev, 0)
                        AS BIGINT) AS bprev,
                   CAST(coalesce(sum(la) OVER w_prev, 0)
                        AS BIGINT) AS maprev,
                   CAST(coalesce(sum(lb) OVER w_prev, 0)
                        AS BIGINT) AS mbprev,
                   CAST(sum(la) OVER w_all AS BIGINT) AS na,
                   CAST(sum(lb) OVER w_all AS BIGINT) AS nb
            FROM vals
            WINDOW w_prev AS (PARTITION BY bucket ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING),
                   w_all AS (PARTITION BY bucket)
        ),
        cells AS (
            SELECT bucket, v, na, nb,
                   CASE WHEN CAST(2 * bprev + l AS DOUBLE)
                             * (2.0 * CAST(na + nb AS DOUBLE)
                                - CAST(2 * bprev + l AS DOUBLE))
                             - CAST(na + nb AS DOUBLE)
                               * CAST(l AS DOUBLE) > 0.0
                        THEN (CAST(l AS DOUBLE)
                              * ((CAST(na + nb AS DOUBLE)
                                  * CAST(2 * maprev + la AS DOUBLE)
                                  - CAST(na AS DOUBLE)
                                    * CAST(2 * bprev + l AS DOUBLE))
                                 * (CAST(na + nb AS DOUBLE)
                                    * CAST(2 * maprev + la AS DOUBLE)
                                    - CAST(na AS DOUBLE)
                                      * CAST(2 * bprev + l
                                             AS DOUBLE))))
                             / (CAST(na + nb AS DOUBLE)
                                * (CAST(2 * bprev + l AS DOUBLE)
                                   * (2.0 * CAST(na + nb AS DOUBLE)
                                      - CAST(2 * bprev + l
                                             AS DOUBLE))
                                   - CAST(na + nb AS DOUBLE)
                                     * CAST(l AS DOUBLE)))
                        ELSE 0.0 END AS ta,
                   CASE WHEN CAST(2 * bprev + l AS DOUBLE)
                             * (2.0 * CAST(na + nb AS DOUBLE)
                                - CAST(2 * bprev + l AS DOUBLE))
                             - CAST(na + nb AS DOUBLE)
                               * CAST(l AS DOUBLE) > 0.0
                        THEN (CAST(l AS DOUBLE)
                              * ((CAST(na + nb AS DOUBLE)
                                  * CAST(2 * mbprev + lb AS DOUBLE)
                                  - CAST(nb AS DOUBLE)
                                    * CAST(2 * bprev + l AS DOUBLE))
                                 * (CAST(na + nb AS DOUBLE)
                                    * CAST(2 * mbprev + lb AS DOUBLE)
                                    - CAST(nb AS DOUBLE)
                                      * CAST(2 * bprev + l
                                             AS DOUBLE))))
                             / (CAST(na + nb AS DOUBLE)
                                * (CAST(2 * bprev + l AS DOUBLE)
                                   * (2.0 * CAST(na + nb AS DOUBLE)
                                      - CAST(2 * bprev + l
                                             AS DOUBLE))
                                   - CAST(na + nb AS DOUBLE)
                                     * CAST(l AS DOUBLE)))
                        ELSE 0.0 END AS tb
            FROM pre
        ),
        agg AS (
            SELECT bucket, na, nb,
                   list_reduce(list_prepend(0.0,
                       [s.ta FOR s IN list_sort(list(struct_pack(
                           v := v, ta := ta, tb := tb)))]),
                       (acc, t) -> acc + t) AS sa,
                   list_reduce(list_prepend(0.0,
                       [s.tb FOR s IN list_sort(list(struct_pack(
                           v := v, ta := ta, tb := tb)))]),
                       (acc, t) -> acc + t) AS sb
            FROM cells GROUP BY 1, 2, 3
        )
        SELECT bucket, na AS n_a, nb AS n_b, na + nb AS n,
               CASE WHEN na > 0 AND nb > 0
                    THEN ((CAST(na + nb AS DOUBLE) - 1.0)
                          / CAST(na + nb AS DOUBLE))
                         * (sa / CAST(na AS DOUBLE)
                            + sb / CAST(nb AS DOUBLE))
               END AS a2
        FROM agg
    """
    oracles["mantel_haenszel"] = """
        -- exact integer cells; sorted-stratum folds; fixed OR/chi2
        -- trees; singleton strata contribute V = 0
        WITH base AS (
            SELECT l_returnflag AS s,
                   CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS e,
                   CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y
            FROM lineitem WHERE l_quantity IS NOT NULL
        ),
        per AS (
            SELECT s,
                   CAST(sum(CASE WHEN e = 1 AND y = 1 THEN 1
                            ELSE 0 END) AS BIGINT) AS a,
                   CAST(sum(CASE WHEN e = 1 AND y = 0 THEN 1
                            ELSE 0 END) AS BIGINT) AS b,
                   CAST(sum(CASE WHEN e = 0 AND y = 1 THEN 1
                            ELSE 0 END) AS BIGINT) AS c,
                   CAST(sum(CASE WHEN e = 0 AND y = 0 THEN 1
                            ELSE 0 END) AS BIGINT) AS d
            FROM base GROUP BY 1
        ),
        arr AS (
            SELECT CAST(count(*) AS BIGINT) AS k_strata,
                   CAST(sum(((a + b) + c) + d) AS BIGINT) AS n,
                   CAST(sum(a + b) AS BIGINT) AS n_exposed,
                   CAST(sum(a) AS BIGINT) AS suma,
                   list_sort(list(struct_pack(
                       s := s, a := a, b := b, c := c, d := d
                   ))) AS lv
            FROM per
        ),
        folds AS (
            SELECT k_strata, n, n_exposed, suma,
                   list_reduce(list_prepend(0.0,
                       [(CAST(v.a AS DOUBLE) * CAST(v.d AS DOUBLE))
                        / CAST(((v.a + v.b) + v.c) + v.d AS DOUBLE)
                        FOR v IN lv]), (acc, t) -> acc + t) AS num,
                   list_reduce(list_prepend(0.0,
                       [(CAST(v.b AS DOUBLE) * CAST(v.c AS DOUBLE))
                        / CAST(((v.a + v.b) + v.c) + v.d AS DOUBLE)
                        FOR v IN lv]), (acc, t) -> acc + t) AS den,
                   list_reduce(list_prepend(0.0,
                       [(CAST(v.a + v.b AS DOUBLE)
                         * CAST(v.a + v.c AS DOUBLE))
                        / CAST(((v.a + v.b) + v.c) + v.d AS DOUBLE)
                        FOR v IN lv]), (acc, t) -> acc + t) AS esum,
                   list_reduce(list_prepend(0.0,
                       [CASE WHEN CAST(((v.a + v.b) + v.c) + v.d
                                       AS DOUBLE) > 1.0
                             THEN (((CAST(v.a + v.b AS DOUBLE)
                                     * CAST(v.c + v.d AS DOUBLE))
                                    * CAST(v.a + v.c AS DOUBLE))
                                   * CAST(v.b + v.d AS DOUBLE))
                                  / ((CAST(((v.a + v.b) + v.c) + v.d
                                           AS DOUBLE)
                                      * CAST(((v.a + v.b) + v.c) + v.d
                                             AS DOUBLE))
                                     * (CAST(((v.a + v.b) + v.c) + v.d
                                             AS DOUBLE) - 1.0))
                             ELSE 0.0 END
                        FOR v IN lv]), (acc, t) -> acc + t) AS vsum
            FROM arr
        )
        SELECT k_strata, n, n_exposed,
               CASE WHEN den > 0.0 THEN num / den END AS or_mh,
               CASE WHEN vsum > 0.0
                    THEN ((CAST(suma AS DOUBLE) - esum)
                          * (CAST(suma AS DOUBLE) - esum)) / vsum
               END AS chi2_mh
        FROM folds
    """
    oracles["cronbach"] = """
        -- one pass of exact decimal sufficient stats; item-order
        -- variance chain; one alpha tree
        WITH base AS (
            SELECT CAST(CAST(floor(l_quantity) AS BIGINT)
                        AS DECIMAL(18,4)) AS i0,
                   CAST(l_orderkey % 7 AS DECIMAL(18,4)) AS i1,
                   CAST(l_partkey % 7 AS DECIMAL(18,4)) AS i2,
                   CAST(l_suppkey % 7 AS DECIMAL(18,4)) AS i3
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_orderkey IS NOT NULL
              AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   sum(i0) AS s0, sum(i0 * i0) AS q0,
                   sum(i1) AS s1, sum(i1 * i1) AS q1,
                   sum(i2) AS s2, sum(i2 * i2) AS q2,
                   sum(i3) AS s3, sum(i3 * i3) AS q3,
                   sum(((CAST(i0 AS DECIMAL(38,4)) + i1) + i2) + i3)
                       AS st,
                   sum((((CAST(i0 AS DECIMAL(38,4)) + i1) + i2) + i3)
                       * (((CAST(i0 AS DECIMAL(38,4)) + i1) + i2)
                          + i3)) AS qt
            FROM base
        ),
        vars_ AS (
            SELECT n,
                   (((CAST(n AS DOUBLE) * CAST(q0 AS DOUBLE)
                      - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
                     / (CAST(n AS DOUBLE)
                        * (CAST(n AS DOUBLE) - 1.0))
                     + (CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) - 1.0)))
                    + (CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE)
                       - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                      / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0)))
                   + (CAST(n AS DOUBLE) * CAST(q3 AS DOUBLE)
                      - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))
                     / (CAST(n AS DOUBLE)
                        * (CAST(n AS DOUBLE) - 1.0)) AS sum_var,
                   (CAST(n AS DOUBLE) * CAST(qt AS DOUBLE)
                    - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                   / (CAST(n AS DOUBLE)
                      * (CAST(n AS DOUBLE) - 1.0)) AS total_var
            FROM agg
        )
        SELECT n, CAST(4 AS INTEGER) AS k,
               CASE WHEN n >= 2 THEN sum_var END AS sum_item_var,
               CASE WHEN n >= 2 THEN total_var END AS total_var,
               CASE WHEN n >= 2 AND total_var > 0.0
                    THEN (4.0 / 3.0) * (1.0 - sum_var / total_var)
               END AS alpha
        FROM vars_
    """
    oracles["best_split"] = """
        -- exact prefix counts over the distinct-value grid; fixed
        -- gini/gain trees; struct max with smallest-threshold tiebreak
        WITH base AS (
            SELECT l_returnflag AS flag,
                   CAST(floor(l_quantity) AS BIGINT) AS v,
                   CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y
            FROM lineitem WHERE l_quantity IS NOT NULL
        ),
        per AS (
            SELECT flag, v, CAST(count(*) AS BIGINT) AS nv,
                   CAST(sum(y) AS BIGINT) AS pv
            FROM base GROUP BY 1, 2
        ),
        pre AS (
            SELECT flag, v,
                   CAST(sum(nv) OVER (PARTITION BY flag ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS nl,
                   CAST(sum(pv) OVER (PARTITION BY flag ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS pl,
                   CAST(sum(nv) OVER (PARTITION BY flag)
                        AS BIGINT) AS n,
                   CAST(sum(pv) OVER (PARTITION BY flag)
                        AS BIGINT) AS p
            FROM per
        ),
        cand AS (
            SELECT flag, n, p,
                   1.0 - (CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
                       - (CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))
                       AS bg,
                   struct_pack(
                       g := ((1.0 - (CAST(p AS DOUBLE)
                                     / CAST(n AS DOUBLE))
                                    * (CAST(p AS DOUBLE)
                                       / CAST(n AS DOUBLE))
                                  - (CAST(n - p AS DOUBLE)
                                     / CAST(n AS DOUBLE))
                                    * (CAST(n - p AS DOUBLE)
                                       / CAST(n AS DOUBLE)))
                             - (CAST(nl AS DOUBLE) / CAST(n AS DOUBLE))
                               * (1.0 - (CAST(pl AS DOUBLE)
                                         / CAST(nl AS DOUBLE))
                                        * (CAST(pl AS DOUBLE)
                                           / CAST(nl AS DOUBLE))
                                      - (CAST(nl - pl AS DOUBLE)
                                         / CAST(nl AS DOUBLE))
                                        * (CAST(nl - pl AS DOUBLE)
                                           / CAST(nl AS DOUBLE))))
                            - (CAST(n - nl AS DOUBLE)
                               / CAST(n AS DOUBLE))
                              * (1.0 - (CAST(p - pl AS DOUBLE)
                                        / CAST(n - nl AS DOUBLE))
                                       * (CAST(p - pl AS DOUBLE)
                                          / CAST(n - nl AS DOUBLE))
                                     - (CAST((n - nl) - (p - pl)
                                             AS DOUBLE)
                                        / CAST(n - nl AS DOUBLE))
                                       * (CAST((n - nl) - (p - pl)
                                               AS DOUBLE)
                                          / CAST(n - nl AS DOUBLE))),
                       nv := -CAST(v AS DOUBLE),
                       v := v, nl := nl, pl := pl) AS s
            FROM pre WHERE nl < n
        ),
        best AS (
            SELECT flag, n, p, bg, max(s) AS b
            FROM cand GROUP BY 1, 2, 3, 4
        )
        SELECT flag, n, p AS n_pos, bg AS base_gini,
               b.v AS threshold, b.g AS gain,
               b.nl AS n_left, b.pl AS pos_left
        FROM best
    """
    oracles["krippendorff"] = """
        -- balanced nominal alpha: exact integer D_o/D_e identity,
        -- one division
        WITH base AS (
            SELECT CAST(floor(event_id / 5) AS BIGINT) AS u,
                   event_type AS c
            FROM events
            WHERE event_id IS NOT NULL AND event_type IS NOT NULL
        ),
        uc AS (
            SELECT u, c, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1, 2
        ),
        per_unit AS (
            SELECT u, CAST(sum(n) AS BIGINT) AS m,
                   CAST(sum(CAST(n AS DECIMAL(38,0))
                            * CAST(n AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS sq
            FROM uc GROUP BY 1
        ),
        units AS (
            SELECT CAST(count(*) AS BIGINT) AS n_units,
                   CAST(max(m) AS BIGINT) AS m,
                   CAST(sum(CAST(m AS DECIMAL(38,0))
                            * CAST(m AS DECIMAL(38,0)) - sq)
                        AS DECIMAL(38,0)) AS do_
            FROM per_unit
        ),
        margins AS (
            SELECT c, CAST(sum(n) AS BIGINT) AS nc
            FROM uc GROUP BY 1
        ),
        exp_ AS (
            SELECT CAST(count(*) AS BIGINT) AS n_categories,
                   CAST(sum(CAST(nc AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS nt,
                   CAST(sum(CAST(nc AS DECIMAL(38,0))
                            * CAST(nc AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS ncsq
            FROM margins
        )
        SELECT n_units, m, CAST(nt AS BIGINT) AS n, n_categories,
               CAST(do_ AS DOUBLE) AS d_o_num,
               CAST(nt * nt - ncsq AS DOUBLE) AS d_e_num,
               CASE WHEN nt * nt - ncsq <> 0 THEN
                   1.0 - CAST((nt - 1) * do_ AS DOUBLE)
                         / CAST((CAST(m AS DECIMAL(38,0)) - 1)
                                * (nt * nt - ncsq) AS DOUBLE)
               END AS alpha
        FROM exp_ CROSS JOIN units
    """
    oracles["davies_bouldin"] = """
        -- the L234 micro-unit moment sums; scatter + mean-distance
        -- pair folds; exact maxima; one final mean fold
        WITH base AS (
            SELECT CAST(vec_id % 5 AS BIGINT) AS g, embedding
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        ex AS (
            SELECT g,
                   unnest(range(len(embedding))) AS d,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                              * 1048576.0) AS DECIMAL(38,0)) AS u
            FROM base
        ),
        per AS (
            SELECT g, d, CAST(count(*) AS BIGINT) AS nj,
                   CAST(sum(u) AS DECIMAL(38,0)) AS s,
                   CAST(sum(u * u) AS DECIMAL(38,0)) AS q
            FROM ex GROUP BY 1, 2
        ),
        sizes AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(n) AS BIGINT) AS n
            FROM sizes
        ),
        scat AS (
            SELECT g, CAST(max(nj) AS BIGINT) AS nj,
                   sqrt(list_reduce(list_prepend(0.0,
                       [e.qd - (e.sd * e.sd) / e.njd
                        FOR e IN list_sort(list(struct_pack(
                            d := d,
                            qd := CAST(q AS DOUBLE),
                            sd := CAST(s AS DOUBLE),
                            njd := CAST(nj AS DOUBLE))))]),
                       (acc, t) -> acc + t)
                       / CAST(max(nj) AS DOUBLE)) AS sc
            FROM per GROUP BY g
        ),
        means AS (
            SELECT g, d,
                   CAST(s AS DOUBLE) / CAST(nj AS DOUBLE) AS m
            FROM per
        ),
        d2 AS (
            SELECT a.g AS ga, b.g AS gb,
                   list_reduce(list_prepend(0.0,
                       [(e.ma - e.mb) * (e.ma - e.mb)
                        FOR e IN list_sort(list(struct_pack(
                            d := a.d, ma := a.m, mb := b.m)))]),
                       (acc, t) -> acc + t) AS d2
            FROM means a JOIN means b
              ON a.d = b.d AND a.g <> b.g
            GROUP BY 1, 2
        ),
        ratios AS (
            SELECT d2.ga,
                   CASE WHEN d2.d2 > 0.0
                        THEN (sa.sc + sb.sc) / sqrt(d2.d2)
                   END AS r
            FROM d2
            JOIN scat sa ON sa.g = d2.ga
            JOIN scat sb ON sb.g = d2.gb
        ),
        worst AS (
            SELECT ga, max(r) AS w FROM ratios GROUP BY 1
        ),
        o AS (
            SELECT CAST(count(*) AS BIGINT) AS kp,
                   CAST(sum(CASE WHEN w IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS bad,
                   list_reduce(list_prepend(0.0,
                       [s.w FOR s IN list_sort(list(struct_pack(
                           ga := ga, w := w)))]),
                       (acc, t) -> acc + t) AS sumw
            FROM worst
        )
        SELECT k, n,
               CASE WHEN k >= 2 AND bad = 0
                    THEN sumw / CAST(k AS DOUBLE) END AS db
        FROM o CROSS JOIN tot
    """
    # L236: both retrieval pipelines' oracle SQL nested verbatim as
    # CTEs (the L164 pattern) — AP checked on already-checked rows
    oracles["avg_precision"] = f"""
        WITH pred AS ({oracles['knn_lsh']}),
        truth AS ({oracles['knn_bruteforce']}),
        t AS (SELECT DISTINCT query_id AS q, neighbor_id AS i
              FROM truth WHERE rank <= 3),
        nrel AS (SELECT q, CAST(count(*) AS BIGINT) AS n_rel
                 FROM t GROUP BY 1),
        p AS (SELECT query_id AS q, neighbor_id AS i, rank AS r
              FROM pred WHERE rank <= 3),
        j AS (SELECT p.q, p.r,
                     CASE WHEN t.i IS NOT NULL THEN 1 ELSE 0 END AS h
              FROM p LEFT JOIN t ON p.q = t.q AND p.i = t.i),
        piv AS (
            SELECT q,
                   coalesce(max(CASE WHEN r = 1 THEN h END), 0) AS h1,
                   coalesce(max(CASE WHEN r = 2 THEN h END), 0) AS h2,
                   coalesce(max(CASE WHEN r = 3 THEN h END), 0) AS h3
            FROM j GROUP BY 1
        ),
        fo AS (
            SELECT coalesce(nrel.q, piv.q) AS q, nrel.n_rel,
                   coalesce(piv.h1, 0) AS h1,
                   coalesce(piv.h2, 0) AS h2,
                   coalesce(piv.h3, 0) AS h3
            FROM nrel FULL JOIN piv ON nrel.q = piv.q
        )
        SELECT q AS query_id, n_rel,
               (h1 + h2) + h3 AS hits,
               CASE WHEN n_rel IS NOT NULL
                         AND least(n_rel, 3) > 0 THEN
                   (((0.0
                      + CASE WHEN h1 = 1
                             THEN CAST(h1 AS DOUBLE) / 1.0
                             ELSE 0.0 END)
                     + CASE WHEN h2 = 1
                            THEN CAST(h1 + h2 AS DOUBLE) / 2.0
                            ELSE 0.0 END)
                    + CASE WHEN h3 = 1
                           THEN CAST((h1 + h2) + h3 AS DOUBLE) / 3.0
                           ELSE 0.0 END)
                   / CAST(least(n_rel, 3) AS DOUBLE)
               END AS ap
        FROM fo
    """
    oracles["dunn"] = """
        -- the L174 doubled-rank CTEs + a bounded k x k pair join;
        -- sigma2 and z mirror the op's fixed trees
        WITH base AS (
            SELECT event_type AS g, CAST(floor(value) AS BIGINT) AS v
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        pts AS (SELECT v, g, count(*) AS c FROM base GROUP BY 1, 2),
        vals AS (
            SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM pts GROUP BY 1
        ),
        vals2 AS (
            SELECT v, cv,
                   CAST(coalesce(sum(cv) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS bef
            FROM vals
        ),
        pg AS (
            SELECT g, CAST(sum(c) AS BIGINT) AS n_g,
                   CAST(sum(CAST(c AS DECIMAL(19,0))
                            * CAST(2 * bef + cv + 1 AS DECIMAL(19,0)))
                        AS DECIMAL(19,0)) AS r2
            FROM pts JOIN vals2 USING (v) GROUP BY 1
        ),
        ts AS (
            SELECT CAST(sum(cv) AS BIGINT) AS nt,
                   list_reduce(list_prepend(0.0,
                       [CAST(s.cv * s.cv * s.cv - s.cv AS DOUBLE)
                        FOR s IN list_sort(list(struct_pack(
                            v := v, cv := cv)))]),
                       (a, x) -> a + x) AS tt
            FROM vals
        )
        SELECT a.g AS g_a, b.g AS g_b,
               a.n_g AS n_a, b.n_g AS n_b,
               (CAST(a.r2 AS DOUBLE) / CAST(a.n_g AS DOUBLE)) / 2.0
                   AS mean_rank_a,
               (CAST(b.r2 AS DOUBLE) / CAST(b.n_g AS DOUBLE)) / 2.0
                   AS mean_rank_b,
               CASE WHEN (CAST(nt AS DOUBLE)
                          * (CAST(nt AS DOUBLE) + 1.0)) / 12.0
                         - tt / (12.0 * (CAST(nt AS DOUBLE) - 1.0))
                         > 0.0
                    THEN ((CAST(a.r2 AS DOUBLE)
                           / CAST(a.n_g AS DOUBLE)) / 2.0
                          - (CAST(b.r2 AS DOUBLE)
                             / CAST(b.n_g AS DOUBLE)) / 2.0)
                         / sqrt(((CAST(nt AS DOUBLE)
                                  * (CAST(nt AS DOUBLE) + 1.0))
                                 / 12.0
                                 - tt / (12.0
                                         * (CAST(nt AS DOUBLE)
                                            - 1.0)))
                                * (1.0 / CAST(a.n_g AS DOUBLE)
                                   + 1.0 / CAST(b.n_g AS DOUBLE)))
               END AS z
        FROM pg a JOIN pg b ON a.g < b.g CROSS JOIN ts
    """
    oracles["calinski"] = """
        -- micro-unit quantized exact per-(cluster,dim) sums; the SSW
        -- and SSB identities folded over the sorted bounded lists
        WITH base AS (
            SELECT CAST(vec_id % 5 AS BIGINT) AS g, embedding
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        ex AS (
            SELECT g,
                   unnest(range(len(embedding))) AS d,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                              * 1048576.0) AS DECIMAL(38,0)) AS u
            FROM base
        ),
        per AS (
            SELECT g, d, CAST(count(*) AS BIGINT) AS nj,
                   CAST(sum(u) AS DECIMAL(38,0)) AS s,
                   CAST(sum(u * u) AS DECIMAL(38,0)) AS q
            FROM ex GROUP BY 1, 2
        ),
        sizes AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(n) AS BIGINT) AS n
            FROM sizes
        ),
        folds AS (
            SELECT
                list_reduce(list_prepend(0.0,
                    [CAST(e.q AS DOUBLE)
                     - (CAST(e.s AS DOUBLE) * CAST(e.s AS DOUBLE))
                       / CAST(e.nj AS DOUBLE)
                     FOR e IN list_sort(list(struct_pack(
                         g := g, d := d, nj := nj, s := s, q := q
                     )))]),
                    (acc, t) -> acc + t) AS ssw,
                list_reduce(list_prepend(0.0,
                    [(CAST(e.s AS DOUBLE) * CAST(e.s AS DOUBLE))
                     / CAST(e.nj AS DOUBLE)
                     FOR e IN list_sort(list(struct_pack(
                         g := g, d := d, nj := nj, s := s, q := q
                     )))]),
                    (acc, t) -> acc + t) AS parta
            FROM per
        ),
        dims AS (
            SELECT d, CAST(sum(s) AS DECIMAL(38,0)) AS t
            FROM per GROUP BY 1
        ),
        dfold AS (
            SELECT list_sort(list(struct_pack(d := d, t := t))) AS dv
            FROM dims
        )
        SELECT k, n,
               parta - list_reduce(list_prepend(0.0,
                   [(CAST(v.t AS DOUBLE) * CAST(v.t AS DOUBLE))
                    / CAST(n AS DOUBLE) FOR v IN dv]),
                   (acc, t) -> acc + t) AS ssb,
               ssw,
               CASE WHEN k >= 2 AND n > k AND ssw > 0.0
                    THEN ((parta - list_reduce(list_prepend(0.0,
                              [(CAST(v.t AS DOUBLE)
                                * CAST(v.t AS DOUBLE))
                               / CAST(n AS DOUBLE) FOR v IN dv]),
                              (acc, t) -> acc + t))
                          / (CAST(k AS DOUBLE) - 1.0))
                         / (ssw / (CAST(n AS DOUBLE)
                                   - CAST(k AS DOUBLE)))
               END AS ch
        FROM folds CROSS JOIN dfold CROSS JOIN tot
    """
    oracles["sax"] = """
        -- floor(i*w/n) via the SAME double division; exact decimal
        -- segment sums; literal breakpoints; symbol gated on z
        WITH base AS (
            SELECT user_id, event_id,
                   CAST(value AS DECIMAL(18,2)) AS x
            FROM events
            WHERE user_id < 8 AND value IS NOT NULL
              AND event_id IS NOT NULL
        ),
        idx AS (
            SELECT user_id, x,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY event_id) - 1 AS i,
                   CAST(count(*) OVER (PARTITION BY user_id)
                        AS BIGINT) AS n,
                   sum(x) OVER (PARTITION BY user_id) AS s,
                   sum(x * x) OVER (PARTITION BY user_id) AS sxx
            FROM base
        ),
        per AS (
            SELECT user_id, n, s, sxx,
                   CAST(floor(CAST(i * 8 AS DOUBLE)
                              / CAST(n AS DOUBLE)) AS BIGINT)
                       AS segment,
                   CAST(count(*) AS BIGINT) AS n_points,
                   sum(x) AS ss
            FROM idx GROUP BY 1, 2, 3, 4, 5
        ),
        zz AS (
            SELECT user_id, segment, n_points,
                   CAST(ss AS DOUBLE) / CAST(n_points AS DOUBLE)
                       AS paa,
                   CASE WHEN n >= 2
                             AND (CAST(n AS DOUBLE)
                                  * CAST(sxx AS DOUBLE)
                                  - CAST(s AS DOUBLE)
                                    * CAST(s AS DOUBLE))
                                 / (CAST(n AS DOUBLE)
                                    * (CAST(n AS DOUBLE) - 1.0)) > 0
                        THEN (CAST(ss AS DOUBLE)
                              / CAST(n_points AS DOUBLE)
                              - CAST(s AS DOUBLE)
                                / CAST(n AS DOUBLE))
                             / sqrt((CAST(n AS DOUBLE)
                                     * CAST(sxx AS DOUBLE)
                                     - CAST(s AS DOUBLE)
                                       * CAST(s AS DOUBLE))
                                    / (CAST(n AS DOUBLE)
                                       * (CAST(n AS DOUBLE)
                                          - 1.0)))
                   END AS z
            FROM per
        )
        SELECT user_id, segment, n_points, paa, z,
               CASE WHEN z IS NOT NULL THEN
                   ((0 + CASE WHEN z > -0.6744897501960817
                              THEN 1 ELSE 0 END)
                    + CASE WHEN z > 0.0 THEN 1 ELSE 0 END)
                   + CASE WHEN z > 0.6744897501960817
                          THEN 1 ELSE 0 END
               END AS symbol
        FROM zz
    """
    oracles["bartlett"] = """
        -- per-level exact decimal stats; three same-order folds over
        -- the sorted level list; ln the one transcendental
        WITH vals AS (
            SELECT event_type AS lvl,
                   CAST(floor(value) AS DECIMAL(18,4)) AS x
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        per AS (
            SELECT lvl, CAST(count(*) AS BIGINT) AS nj,
                   sum(x) AS s, sum(x * x) AS sxx
            FROM vals GROUP BY 1
        ),
        lv AS (
            SELECT lvl, nj,
                   (CAST(nj AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(nj AS DOUBLE)
                      * (CAST(nj AS DOUBLE) - 1.0)) AS s2
            FROM per
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(nj) AS BIGINT) AS n,
                   CAST(min(nj) AS BIGINT) AS minn,
                   min(s2) AS mins2,
                   list_sort(list(struct_pack(
                       g := lvl, nj := nj, s2 := s2
                   ))) AS lv
            FROM lv
        ),
        folds AS (
            SELECT k, n, minn, mins2,
                   CAST(n AS DOUBLE) - CAST(k AS DOUBLE) AS nmk,
                   list_reduce(list_prepend(0.0,
                       [(CAST(v.nj AS DOUBLE) - 1.0) * v.s2
                        FOR v IN lv]),
                       (acc, t) -> acc + t) AS sp_num,
                   list_reduce(list_prepend(0.0,
                       [(CAST(v.nj AS DOUBLE) - 1.0) * ln(v.s2)
                        FOR v IN lv]),
                       (acc, t) -> acc + t) AS lnsum,
                   list_reduce(list_prepend(0.0,
                       [1.0 / (CAST(v.nj AS DOUBLE) - 1.0)
                        FOR v IN lv]),
                       (acc, t) -> acc + t) AS invsum
            FROM tot
        )
        SELECT k, n,
               CASE WHEN k >= 2 AND minn >= 2 AND mins2 > 0.0
                    THEN nmk * ln(sp_num / nmk) - lnsum
               END AS t,
               CASE WHEN k >= 2 AND minn >= 2 AND mins2 > 0.0
                    THEN 1.0 + (invsum - 1.0 / nmk)
                               / (3.0 * (CAST(k AS DOUBLE) - 1.0))
               END AS c,
               CASE WHEN k >= 2 AND minn >= 2 AND mins2 > 0.0
                    THEN (nmk * ln(sp_num / nmk) - lnsum)
                         / (1.0 + (invsum - 1.0 / nmk)
                                  / (3.0 * (CAST(k AS DOUBLE)
                                            - 1.0)))
               END AS stat
        FROM folds
    """
    oracles["grubbs"] = """
        -- exact decimal stats; per-row |x - mean| fixed trees;
        -- order-insensitive max with larger-value tiebreak
        WITH base AS (
            SELECT event_type, CAST(value AS DECIMAL(18,4)) AS x
            FROM events WHERE value IS NOT NULL
        ),
        stats AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS s, sum(x * x) AS sxx
            FROM base GROUP BY 1
        ),
        dev AS (
            SELECT b.event_type, st.n, st.s, st.sxx,
                   abs(CAST(b.x AS DOUBLE)
                       - CAST(st.s AS DOUBLE)
                         / CAST(st.n AS DOUBLE)) AS d,
                   CAST(b.x AS DOUBLE) AS xd
            FROM base b JOIN stats st USING (event_type)
        ),
        best AS (
            SELECT event_type, n, s, sxx,
                   max(struct_pack(d := d, x := xd)) AS b
            FROM dev GROUP BY 1, 2, 3, 4
        )
        SELECT event_type, n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               CASE WHEN n >= 3
                         AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                             / (CAST(n AS DOUBLE)
                                * (CAST(n AS DOUBLE) - 1.0)) > 0
                    THEN sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                              / (CAST(n AS DOUBLE)
                                 * (CAST(n AS DOUBLE) - 1.0)))
               END AS sd,
               CASE WHEN n >= 3
                         AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                             / (CAST(n AS DOUBLE)
                                * (CAST(n AS DOUBLE) - 1.0)) > 0
                    THEN b.d
                         / sqrt((CAST(n AS DOUBLE)
                                 * CAST(sxx AS DOUBLE)
                                 - CAST(s AS DOUBLE)
                                   * CAST(s AS DOUBLE))
                                / (CAST(n AS DOUBLE)
                                   * (CAST(n AS DOUBLE) - 1.0)))
               END AS grubbs_g,
               b.x AS x_out
        FROM best
    """
    oracles["cochran_armitage"] = """
        -- exact decimal score sums (order-insensitive, no fold
        -- needed); num/var/z fixed IEEE trees
        WITH base AS (
            SELECT l_returnflag AS flag,
                   CAST(floor(l_quantity / 10) AS BIGINT) AS s,
                   CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y
            FROM lineitem WHERE l_quantity IS NOT NULL
        ),
        per AS (
            SELECT flag, s, CAST(count(*) AS BIGINT) AS nj,
                   CAST(sum(y) AS BIGINT) AS aj
            FROM base GROUP BY 1, 2
        ),
        agg AS (
            SELECT flag,
                   CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(nj) AS BIGINT) AS n,
                   CAST(sum(aj) AS BIGINT) AS n_success,
                   sum(CAST(s AS DECIMAL(38,0)) * nj) AS s1,
                   sum(CAST(s AS DECIMAL(38,0))
                       * CAST(s AS DECIMAL(38,0)) * nj) AS s2,
                   sum(CAST(s AS DECIMAL(38,0)) * aj) AS t
            FROM per GROUP BY 1
        )
        SELECT flag, k, n, n_success,
               CASE WHEN (CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE))
                         * (1.0 - CAST(n_success AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                         * (CAST(s2 AS DOUBLE)
                            - (CAST(s1 AS DOUBLE)
                               * CAST(s1 AS DOUBLE))
                              / CAST(n AS DOUBLE)) > 0
                    THEN (CAST(t AS DOUBLE)
                          - (CAST(n_success AS DOUBLE)
                             * CAST(s1 AS DOUBLE))
                            / CAST(n AS DOUBLE))
                         / sqrt((CAST(n_success AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                                * (1.0 - CAST(n_success AS DOUBLE)
                                         / CAST(n AS DOUBLE))
                                * (CAST(s2 AS DOUBLE)
                                   - (CAST(s1 AS DOUBLE)
                                      * CAST(s1 AS DOUBLE))
                                     / CAST(n AS DOUBLE)))
               END AS z
        FROM agg
    """
    oracles["sign_test"] = """
        -- exact integer sign counts; z = (2*n_pos - n)/sqrt(n)
        WITH pairs AS (
            SELECT event_type, value AS x,
                   lead(value) OVER (PARTITION BY user_id
                                     ORDER BY event_id) AS y
            FROM events
        ),
        agg AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN x > y THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos,
                   CAST(sum(CASE WHEN x < y THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_neg,
                   CAST(sum(CASE WHEN x = y THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tie
            FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL
            GROUP BY 1
        )
        SELECT event_type, n_pos, n_neg, n_tie,
               n_pos + n_neg AS n,
               CASE WHEN n_pos + n_neg > 0
                    THEN CAST(2 * n_pos - (n_pos + n_neg) AS DOUBLE)
                         / sqrt(CAST(n_pos + n_neg AS DOUBLE))
               END AS z
        FROM agg
    """
    oracles["mood_median"] = """
        -- pooled discrete median, k x 2 exact cells, sorted-level
        -- fold with two (o-e)^2/e terms per level (left-assoc pair,
        -- same grouping as the Spark lambda)
        WITH vals AS (
            SELECT event_type AS lvl,
                   CAST(floor(value) AS BIGINT) AS v
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        med AS (SELECT quantile_disc(v, 0.5) AS m FROM vals),
        per AS (
            SELECT lvl, CAST(count(*) AS BIGINT) AS nj,
                   CAST(sum(CASE WHEN v > (SELECT m FROM med)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS aj
            FROM vals GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(nj) AS BIGINT) AS n,
                   CAST(sum(aj) AS BIGINT) AS n_above,
                   CAST(count(*) AS BIGINT) AS k,
                   list_sort(list(struct_pack(
                       g := lvl, nj := nj, aj := aj
                   ))) AS lv
            FROM per
        ),
        fold AS (
            SELECT k, n, n_above,
                   list_reduce(
                       list_prepend(0.0, flatten(
                           [[(CAST(s.aj AS DOUBLE)
                              - CAST(s.nj AS DOUBLE)
                                * CAST(n_above AS DOUBLE)
                                / CAST(n AS DOUBLE))
                             * (CAST(s.aj AS DOUBLE)
                                - CAST(s.nj AS DOUBLE)
                                  * CAST(n_above AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                             / (CAST(s.nj AS DOUBLE)
                                * CAST(n_above AS DOUBLE)
                                / CAST(n AS DOUBLE)),
                             (CAST(s.nj - s.aj AS DOUBLE)
                              - CAST(s.nj AS DOUBLE)
                                * CAST(n - n_above AS DOUBLE)
                                / CAST(n AS DOUBLE))
                             * (CAST(s.nj - s.aj AS DOUBLE)
                                - CAST(s.nj AS DOUBLE)
                                  * CAST(n - n_above AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                             / (CAST(s.nj AS DOUBLE)
                                * CAST(n - n_above AS DOUBLE)
                                / CAST(n AS DOUBLE))]
                            FOR s IN lv])),
                       (acc, t) -> acc + t) AS chi2
            FROM tot
        )
        SELECT k, n, n_above,
               CASE WHEN k >= 2 AND n_above > 0 AND n_above < n
                    THEN chi2 END AS chi2,
               k - 1 AS dof
        FROM fold
    """
    oracles["pettitt"] = """
        -- doubled average ranks keep every U_t an exact integer; the
        -- only float is the final 6K^2/(n^3+n^2) tree
        WITH base AS (
            SELECT event_type AS g, event_id AS t,
                   CAST(floor(value) AS BIGINT) % 7 AS x
            FROM events
            WHERE value IS NOT NULL AND event_id IS NOT NULL
        ),
        pv AS (SELECT g, x, count(*) AS cv FROM base GROUP BY 1, 2),
        pv2 AS (
            SELECT g, x,
                   2 * coalesce(sum(cv) OVER (PARTITION BY g ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + cv + 1 AS d
            FROM pv
        ),
        r AS (
            SELECT b.g, b.t, p.d
            FROM base b JOIN pv2 p ON b.g = p.g AND b.x = p.x
        ),
        scan AS (
            SELECT g, t,
                   row_number() OVER (PARTITION BY g ORDER BY t) AS i,
                   sum(d) OVER (PARTITION BY g ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS w2,
                   count(*) OVER (PARTITION BY g) AS n
            FROM r
        ),
        interior AS (
            SELECT g, n, abs(w2 - i * (n + 1)) AS au, i, t
            FROM scan WHERE i < n
        ),
        best AS (
            SELECT g, n, au, i, t,
                   row_number() OVER (PARTITION BY g
                                      ORDER BY au DESC, i ASC) AS rk
            FROM interior
        )
        SELECT g, CAST(n AS BIGINT) AS n, CAST(au AS BIGINT) AS u_abs,
               CAST(i AS BIGINT) AS t_index, t AS t_split,
               (6.0 * CAST(au AS DOUBLE) * CAST(au AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  * CAST(n AS DOUBLE)
                  + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS stat
        FROM best WHERE rk = 1
    """
    return oracles
