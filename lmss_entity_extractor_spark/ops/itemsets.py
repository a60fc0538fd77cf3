"""Frequent-itemset mining + association rules (L134): Apriori over
keyed baskets — "which items co-occur" (market-basket analysis, KG
co-mention affinity, tag/label co-occurrence rules).  Complements
L133's GSP: sequences are ORDERED with gaps, itemsets are SETS — the
other half of the classic pattern-mining pair (Agrawal & Srikant,
VLDB'94).

Semantics: a basket is the DISTINCT item set of a key.  ``support`` of
an itemset = number of baskets containing ALL its items.  Frequent
itemsets up to ``max_len`` with support ≥ ``min_support`` are found
level-wise; association rules A → c (single consequent) are minted
from every frequent itemset S of size ≥ 2 with

    confidence = supp(S) / supp(S \\ {c})      — exact integer ratio,
    lift       = supp(S)·N / (supp(A)·supp(c)) — int products, ONE
                 IEEE division each → bit-identical across engines.

Spark shape (level-wise Apriori, hot paths JVM-side):

* one keyed exchange builds per-key sorted DISTINCT item arrays
  (loud cap on basket width — hot keys must fail, not OOM);
* level 1 = explode + combinable distinct-key count;
* level-k candidates = frequent (k−1)-sets × frequent items with
  item > last(prefix) (canonical sorted form — each set minted once);
  candidate count capped loudly;
* containment = ``forall(pat, x -> array_contains(items, x))`` —
  pure whole-stage-codegen over a broadcast candidate table, no
  Python in the scan;
* rules are minted driver-side from the collected lattice (bounded
  by ``candidate_cap``; every subset of a frequent set is frequent,
  so all needed supports are already in the lattice).

The DuckDB oracle re-runs the same lattice with containment as
self-joins on the exploded basket table (the pairwise/triple-wise
relational twin this operator avoids at row scale).

Scale: input scanned once into baskets; each level is one broadcast
pass over (baskets × candidates); support counts are map-side
combinable.  Nothing is all-pairs on rows.

No reference counterpart; pattern-mining analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def keyed_baskets(
    df: DataFrame,
    key: str,
    item: str,
    max_basket: int = 10_000,
) -> DataFrame:
    """``(key, items)`` — each key's sorted DISTINCT NULL-free item
    array.  Refuses loudly if any basket exceeds ``max_basket``."""
    baskets = (
        df.filter(F.col(item).isNotNull())
        .groupBy(F.col(key).alias("key"))
        .agg(F.array_sort(F.collect_set(F.col(item))).alias("items"))
    ).localCheckpoint()
    if validation_enabled():
        hot = baskets.filter(F.size("items") > max_basket).limit(5).collect()
        if hot:
            ks = [r["key"] for r in hot]
            raise ValueError(
                f"basket wider than max_basket={max_basket} for keys "
                f"(showing <=5): {ks} — cap upstream or raise the limit"
            )
    return baskets


def _contains_set(items, pat):
    """All of ``pat`` present in ``items``: JVM-only expression."""
    return F.forall(pat, lambda x: F.array_contains(items, x))


def _mine(
    df: DataFrame,
    key: str,
    item: str,
    min_support: int,
    max_len: int,
    max_basket: int,
    candidate_cap: int,
):
    """Shared lattice walk: returns (spark, n_baskets, {tuple: support})."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    spark = df.sparkSession
    baskets = keyed_baskets(df, key, item, max_basket=max_basket)
    n_baskets = baskets.count()

    level1 = (
        baskets.select(F.explode("items").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .collect()
    )  # bounded: <= alphabet size
    items = sorted(r["s"] for r in level1)
    supports = {(r["s"],): r["support"] for r in level1}
    prev_level = [(r["s"],) for r in level1]

    for _ in range(2, max_len + 1):
        if not prev_level:
            break
        candidates = [
            p + (it,) for p in prev_level for it in items if it > p[-1]
        ]
        if len(candidates) > candidate_cap:
            raise ValueError(
                f"candidate blow-up: {len(candidates)} level candidates "
                f"exceed candidate_cap={candidate_cap} — raise min_support "
                f"or the cap"
            )
        if not candidates:
            break
        cand_df = F.broadcast(
            spark.createDataFrame(
                [(list(c),) for c in candidates], "pat array<string>"
            )
        )
        level = (
            baskets.crossJoin(cand_df)
            .filter(_contains_set(F.col("items"), F.col("pat")))
            .groupBy("pat")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support)
            .collect()
        )
        prev_level = [tuple(r["pat"]) for r in level]
        for r in level:
            supports[tuple(r["pat"])] = r["support"]
    return spark, n_baskets, supports


def frequent_itemsets(
    df: DataFrame,
    key: str,
    item: str,
    min_support: int,
    max_len: int = 3,
    max_basket: int = 10_000,
    candidate_cap: int = 100_000,
) -> DataFrame:
    """``(itemset, length, support)`` — every itemset of size
    1..``max_len`` contained in ≥ ``min_support`` baskets.  ``itemset``
    is the ``' + '``-joined sorted item list (stable string form)."""
    spark, _, supports = _mine(
        df, key, item, min_support, max_len, max_basket, candidate_cap
    )
    rows = [(" + ".join(s), len(s), n) for s, n in supports.items()]
    return spark.createDataFrame(
        rows, "itemset string, length int, support long"
    )


def association_rules(
    df: DataFrame,
    key: str,
    item: str,
    min_support: int,
    min_confidence: float = 0.0,
    max_len: int = 3,
    max_basket: int = 10_000,
    candidate_cap: int = 100_000,
) -> DataFrame:
    """``(antecedent, consequent, support, confidence, lift)`` — one
    rule per (frequent itemset S of size ≥ 2) × (consequent c ∈ S),
    antecedent = S \\ {c}.  ``confidence`` and ``lift`` are single IEEE
    divisions of exact integers — bit-identical on any engine."""
    spark, n_baskets, supports = _mine(
        df, key, item, min_support, max_len, max_basket, candidate_cap
    )
    rows = []
    for s, supp_s in supports.items():
        if len(s) < 2:
            continue
        for c in s:
            a = tuple(x for x in s if x != c)
            rows.append(
                (" + ".join(a), c, supp_s, supports[a], supports[(c,)])
            )
    rules = spark.createDataFrame(
        rows,
        "antecedent string, consequent string, support long, "
        "supp_a long, supp_c long",
    )
    out = rules.select(
        "antecedent",
        "consequent",
        "support",
        (F.col("support") / F.col("supp_a")).alias("confidence"),
        (
            (F.col("support") * F.lit(int(n_baskets)))
            / (F.col("supp_a") * F.col("supp_c"))
        ).alias("lift"),
    )
    return out.filter(F.col("confidence") >= F.lit(float(min_confidence)))


def item_cosine(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_co: int = 1,
) -> DataFrame:
    """``(item, neighbor, co, n_item, n_neighbor, cosine, rnk)`` —
    item-item cosine similarity over baskets (L362): the
    "customers-also-bought" recommender primitive — co-occurrence
    counts normalized by each item's basket count:

        cosine(i, j) = co(i,j) / √(n_i · n_j)

    Presence-based (a basket counts an item once — deduped first);
    co-counts come from ONE within-basket self-join of the deduped
    pairs (i < j, then symmetrized), so the shuffle is bounded by
    basket width, never all-pairs over the catalog; counts are exact
    integers and each cosine is one division by one sqrt of an exact
    product.  Top-``k`` neighbors per item pick by (cosine DESC,
    neighbor ASC) — deterministic.  ``min_co`` prunes noise pairs
    before ranking.  NULL items/baskets refused.

    Scale shape: one dedup groupBy + one keyed self-join (basket-
    bounded) + one combinable co-count agg + broadcast item counts +
    one per-item top-k window.

    No reference counterpart; recommender analytics per SURVEY §2.11
    (composes with L134's association rules — lift ranks by
    surprise, cosine by strength).
    """
    if int(k) < 1:
        raise ValueError("item_cosine: k must be >= 1")
    if int(min_co) < 1:
        raise ValueError("item_cosine: min_co must be >= 1")
    if validation_enabled():
        n_null = df.filter(
            F.col(basket_col).isNull() | F.col(item_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"item_cosine: {n_null} NULL basket/item value(s)"
            )
    pres = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).dropDuplicates()
    n_item = pres.groupBy(F.col("_i").alias("item")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    left = pres.select("_b", F.col("_i").alias("_ia"))
    right = pres.select("_b", F.col("_i").alias("_ib"))
    co = (
        left.join(right, "_b")
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= int(min_co))
    )
    sym = co.select(
        F.col("_ia").alias("item"),
        F.col("_ib").alias("neighbor"),
        "co",
    ).union(
        co.select(
            F.col("_ib").alias("item"),
            F.col("_ia").alias("neighbor"),
            "co",
        )
    )
    scored = (
        sym.join(F.broadcast(n_item), "item")
        .join(
            F.broadcast(
                n_item.select(
                    F.col("item").alias("neighbor"),
                    F.col("n_item").alias("n_neighbor"),
                )
            ),
            "neighbor",
        )
        .select(
            "item",
            "neighbor",
            "co",
            "n_item",
            "n_neighbor",
            (
                F.col("co").cast("double")
                / F.sqrt(
                    (F.col("n_item") * F.col("n_neighbor")).cast(
                        "double"
                    )
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cosine"), F.asc("neighbor")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= int(k))
    )
