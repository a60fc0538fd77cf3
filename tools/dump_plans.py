"""Materialize the formatted physical plans of the flagship queries to
BENCH/PLANS.md — the plan-quality evidence (pushdown, pruning, broadcast
choices, shuffle budget) as a reviewable artifact rather than something
that must be re-derived by running the suite.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# (query, the one-line "why this plan is right at 100 TB")
SHOWCASE = [
    ("filter_project", "predicates + 4-column pruning pushed into the parquet scan"),
    ("region_revenue", "small dims broadcast; the fact table never shuffles for them"),
    ("topk_orders", "TakeOrderedAndProject — no global sort for a LIMIT 10"),
    ("range_join", "interval join as bucketed equi-join, not a nested-loop θ-join"),
    ("knn_ivf", "trained-codebook cell assignment is a narrow projection; probe is a broadcast equi-join"),
    ("curate", "dedup->canonical->quality->chunk->pack composed as ONE plan; quality gate is a narrow scan predicate"),
    ("dedup_minhash", "min-agg is map-side combinable; band join keys on 64-bit signature hashes"),
    ("chunk_docs", "tokenize+slice+explode: zero exchanges"),
    ("asof_join", "union + one window sweep = single keyed shuffle (equi-join lower bound)"),
    ("edges_changelog", "time-travel diff: each version reads ONLY its committed increment dirs (path selection = partition pruning), then one keyed join"),
    ("knn_ivfpq", "IVFADC: one scan computing codes+cell, broadcast equi-join on cell against the (query, probed-cell, ADC-table) frame"),
    ("knn_ivfpq_rerank", "IVFADC + exact re-rank: the ADC shortlist broadcasts into the float-vector join, so exact L2 touches only shortlisted rows — never a full float scan"),
    ("dedup_clusters_star", "large-star/small-star rounds: two keyed shuffles per round over a shrinking canonically-oriented edge set, ~log d rounds"),
    ("decontaminate", "benchmark n-gram hash set broadcast into the corpus scan — the 100 TB side is read once and never shuffled except the per-doc count"),
    ("bgp_match", "each triple pattern is a pushed-filter slice of ONE scan; shared-variable joins are hash equi-joins (type pattern broadcast)"),
    ("rdfs_entail", "schema closures broadcast into every instance-side rule join; the instance table shuffles exactly once (the semantics-required distinct)"),
    ("coalesce_intervals", "gaps-and-islands: ONE per-key window (running-max end) + one combinable groupBy — no global sort"),
    ("quotient_graph", "charset classes via hub-safe collect_set; endpoint mapping = two at-most-one-match equi-joins; summary counts combinable"),
    ("salted_join", "join keys on (key, salt) so a hot key splits R ways; at this toy scale AQE broadcasts the replicated build side (the join key is still salted) — at real scale the same plan is a shuffled join whose hot key occupies R reducers"),
    ("heavy_hitters", "MG candidate pass prunes the shuffle domain to <= partitions*k items; the exact pass semi-joins a broadcast candidate set — the vocabulary never shuffles"),
    ("scd2", "change-point filter + interval chaining both ride ONE keyed exchange (same partitioning+ordering for both windows)"),
    ("pit_join", "point-in-time dimension join as the as-of sweep: one keyed shuffle of facts+versions, no range theta-join"),
    ("bloom_semi_join", "dim's bloom bit-array probed as getbit codegen ON THE FACT SCAN — non-matching rows never reach the join exchange"),
    ("zone_pruned_read", "range read opens only the manifest-overlapping files; the residual BETWEEN rides the pruned scan"),
    ("funnel", "the ordered step chain is one sorted-array aggregate fold per user — a single keyed exchange replaces the per-step self-join ladder"),
    ("cms_join_size", "join cardinality from two KB-sized sketch tables: neither base table is scanned at estimate time"),
    ("gap_fill", "bucket agg, spine mint, fill windows all share the key partitioning — explode happens executor-side, fills are frame-bounded windows"),
    ("kmeans", "trained centroids fold into ONE literal argmax expression — cluster assignment is a zero-shuffle narrow projection over the vector scan"),
    ("random_projection", "the SHA-derived sign matrix is d_out literal dot folds — JL projection is a zero-shuffle projection, no crossJoin, no UDF"),
    ("cusum", "the CUSUM recurrence as prefix-sum + running-min: both sides of the chart ride ONE exchange + ONE sort (plan-asserted in tests)"),
    ("roc_auc", "doubled-rank AUC: one combinable (key,score) groupBy, one keyed window sweep, one combinable agg — no crossJoin over label pairs"),
    ("silhouette", "per-point a/b distances are literal expression columns — clustering quality over 100 TB without the O(n^2) pairwise matrix"),
    ("cuped", "fit stats aggregate combinably, broadcast back, adjustment is a narrow per-row tree — fit-small/apply-wide with zero shuffles"),
    ("gains", "two-phase distributed ranking: range exchange + per-partition window + broadcast offset map — no single-partition sort at any width"),
    ("isotonic", "PAV minimax over the bounded bin table: the fact table aggregates once; the O(B^3) joins are all BroadcastNestedLoop over KB-sized frames"),
    ("kendall_tau", "tau-b pair counts: one cell groupBy + two keyed windows over the bounded grid — no O(n^2) pair join"),
    ("jaro_join", "distinct-value prefix block: the pandas-UDF scorer runs on the vocabulary equi-join, never the fact table"),
    ("friedman", "block-local rank windows key on (group, block) — high-cardinality partitions, no global sort; k-filter joins broadcast"),
    ("jonckheere", "two grid windows (value-prefix within group, group-prefix within value) over the bounded grid; polynomials fold combinably"),
    ("t_closeness", "global value ladder broadcast into the class grid; per-class cumulative window keys on the quasi-identifier"),
    ("soundex", "the WHOLE phonetic algorithm is one generated codegen expression (shared verbatim with the oracle) — no UDF, the only exchange is the final histogram"),
    ("pettitt", "changepoint scan = doubled-rank grid join + ONE keyed window prefix + combinable struct-argmax — no per-split-point self-join"),
    ("hodges_lehmann", "the O(n²) Walsh lattice is an IN-ROW posexplode after one keyed collect — pairs never shuffle"),
    ("best_split", "threshold search = one prefix window over the distinct-value grid + struct-max argmax — no per-candidate rescans"),
    ("anderson_darling", "one distinct-value grid, two prefix windows, ONE sorted-list fold carrying both samples' sums in a struct accumulator"),
    ("calinski", "micro-unit moment sums: one posexplode groupBy to k·d cells, then broadcast-size folds — the vector table scans once"),
    ("morans_i", "spatial weights ARE the L212 grid equi-join; values join by id — no O(n²) weight matrix is ever materialized"),
    ("topk_churn", "per-period window top-k shrinks the fact table to k·periods rows; the churn join is adjacent-rank over that bounded set"),
    ("cumulative_incidence", "the grid² Aalen-Johansen folds run INSIDE per-key arrays — executor-side, zero exchanges beyond the two grid groupBys"),
    ("breusch_pagan", "residual-free heteroskedasticity: 14 exact micro-unit mixed moments in ONE combinable agg, then a generated polynomial tree (shared text with the oracle) — no residual column ever materializes"),
    ("brunner_munzel", "doubled midranks from grid windows feed PLAIN combinable integer sums — the rank-variance needs no folds at all"),
    ("rmst", "the KM curve never materializes: one bounded-grid groupBy + window cumsum, then the (prev, survival, area) fold runs inside the per-group array"),
    ("yule_walker", "Durbin-Levinson recursion folds over the p-row ACF table — the O(p²) solve is array-local; the data-sized work is exactly L151's one window pass"),
    ("croston", "twin SES recurrences fold inside the packed per-key array — the intermittent series shuffles once to pack, then all smoothing is executor-side"),
    ("eb_shrink", "fit-small/apply-wide without a second scan: the MoM prior folds over the bounded key grid and the posterior explodes back IN-ROW — one shuffle total"),
    ("hurst", "three-deep HOF nesting: per-size block scans run INSIDE the packed array, and the Hurst slope is the exact-decimal L135 OLS composed on the 8-row R/S table"),
    ("dtw", "the O(n·m) warping DP never becomes a table: row-by-row LIST-accumulator folds, executor-side, zero exchanges past the pack"),
    ("gini_jk", "n leave-one-out Ginis from ONE window pass — the rank-shift identity turns each LOO refit into a per-row fixed tree"),
    ("hill", "only k+1 rows per key survive the descending row_number filter — the 100 TB scan feeds a KB-sized tail fold"),
    ("var_es", "VaR and ES from the same single descending window: the k-th order statistic row already carries the exact tail cumsum"),
    ("seasonal_mk", "the phase split SHRINKS each pair lattice 7x; combined S is a plain integer sum, combined Var an order-pinned 7-element fold"),
    ("holt_winters", "three smoothing states fold in ONE pass: the seasonal array rides inside the struct accumulator and only its current phase slot is rewritten per step"),
    ("ipf", "the whole iterative-proportional-fitting loop is a fold over a literal iteration sequence — the cell grid never leaves the row"),
    ("xi", "Chatterjee's xi from two RANGE-framed count windows + one lead — the O(n log n) sort-based estimator, no pair lattice"),
    ("mtbf", "state-change filter then lead-pairing: two keyed window passes turn an event log into exact-microsecond reliability segments"),
    ("twoway", "the factorial ANOVA never joins margins: row/column sums are re-derived INSIDE the bounded cell-list folds"),
    ("wcorr", "clamp bounds are two order statistics broadcast back — winsorizing 100 TB costs one extra narrow scan, not a sort of the data"),
]


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    import __spark_entry__ as entry
    from lmss_entity_extractor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dump-plans")
    queries = entry.queries()
    out = [
        "# BENCH/PLANS — formatted physical plans of the flagship queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}` (plan shapes are",
        "scale-invariant; the same shapes are pinned by tests/test_plans.py).",
        "Node ids and attribute #ids vary run to run; structure does not.",
        "",
    ]
    for name, why in SHOWCASE:
        df = queries[name](spark, sf_dir)
        plan = plan_of(df)
        # keep the tree + the scan details; drop the long per-node dumps
        tree = plan.split("\n\n")[0]
        scans = "\n\n".join(
            b for b in plan.split("\n\n")
            if re.match(r"\(\d+\) Scan ", b) or "PartitionFilters" in b
        )
        out += [f"## {name}", "", f"*{why}*", "", "```", tree, "```", ""]
        if scans:
            out += ["```", scans, "```", ""]
    (REPO / "BENCH" / "PLANS.md").write_text("\n".join(out))
    print(f"wrote BENCH/PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
