"""Sequential pattern mining (L133): GSP-style frequent gapped
subsequences over keyed event streams — "which ordered journeys are
common" (funnel discovery, agent tool-call motif mining, clickstream
analysis).  Complements L132's Markov chains: Markov models the
one-step transition structure, this finds arbitrary-gap motifs.

Semantics: a pattern ⟨p₁ … p_k⟩ is CONTAINED in a key's event sequence
iff the states appear in that order, gaps allowed (standard subsequence
containment, Srikant & Agrawal GSP).  ``support`` = number of DISTINCT
keys containing the pattern (once per key, however many embeddings).
Patterns up to ``max_len`` with support ≥ ``min_support`` are returned.

Spark shape (level-wise Apriori, all hot paths JVM-side):

* one keyed exchange builds the per-key ordered state array
  (``array_sort(collect_list(struct(ord, state)))`` — loud cap on
  sequence length: a 100 TB table with a runaway hot key must fail,
  not OOM an executor);
* level 1 = frequent states (explode + distinct + combinable count);
* level k candidates = frequent (k−1)-patterns × frequent items
  (prefix-pruned by construction; support counting removes the rest —
  candidate count is capped loudly);
* containment is a GREEDY LEFT-TO-RIGHT FOLD — ``aggregate(seq, 0,
  (acc, x) -> acc + 1 when x = pat[acc+1])`` reaches ``len(pat)`` iff
  the pattern embeds (greedy matching is optimal for subsequence
  containment) — pure whole-stage-codegen expressions over a broadcast
  candidate table, no Python in the scan.

The DuckDB oracle runs the same level-wise lattice with the containment
as nested EXISTS self-joins (the quadratic/cubic relational twin this
operator exists to avoid at scale).

Scale: the input is scanned once to build sequences; each level is one
broadcast-join pass over the (keys × candidates) grid with candidates
bounded by ``candidate_cap`` — support counting is map-side
combinable.  Nothing is all-pairs on rows.

No reference counterpart; sequence analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .validate import validation_enabled


def _contains_pattern(seq, pat):
    """Greedy-fold subsequence containment: JVM-only expression."""
    return (
        F.aggregate(
            seq,
            F.lit(0),
            lambda acc, x: F.when(
                x == F.try_element_at(pat, acc + 1), acc + 1
            ).otherwise(acc),
        )
        == F.size(pat)
    )


def keyed_sequences(
    df: DataFrame,
    key: str,
    state: str,
    order_by: str,
    max_seq_len: int = 10_000,
) -> DataFrame:
    """``(key, seq)`` — each key's NULL-free state array in ``order_by``
    order (pass a unique ordering; ties would make the array
    nondeterministic).  Refuses loudly if any sequence exceeds
    ``max_seq_len`` (the hot-key OOM guard)."""
    seqs = (
        df.filter(F.col(state).isNotNull())
        .groupBy(F.col(key).alias("key"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(order_by).alias("o"), F.col(state).alias("s")))),
                lambda x: x["s"],
            ).alias("seq")
        )
    ).localCheckpoint()
    if validation_enabled():
        hot = seqs.filter(F.size("seq") > max_seq_len).limit(5).collect()
        if hot:
            ks = [r["key"] for r in hot]
            raise ValueError(
                f"sequence longer than max_seq_len={max_seq_len} for keys "
                f"(showing <=5): {ks} — cap the window upstream or raise the limit"
            )
    return seqs


def frequent_sequences(
    df: DataFrame,
    key: str,
    state: str,
    order_by: str,
    min_support: int,
    max_len: int = 3,
    max_seq_len: int = 10_000,
    candidate_cap: int = 100_000,
) -> DataFrame:
    """``(pattern, length, support)`` — every gapped subsequence pattern
    of length 1..``max_len`` contained in ≥ ``min_support`` distinct
    key sequences.  ``pattern`` is the ``' -> '``-joined state path
    (a string column, stable for hashing/oracle comparison)."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    spark = df.sparkSession
    seqs = keyed_sequences(df, key, state, order_by, max_seq_len=max_seq_len)

    # level 1: frequent single states (no array pass needed — explode)
    items_df = (
        seqs.select(F.explode(F.array_distinct("seq")).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    level1 = items_df.collect()  # bounded: <= alphabet size
    items = sorted(r["s"] for r in level1)
    out_rows = [([r["s"]], r["support"]) for r in level1]
    prev_level = [[r["s"]] for r in level1]

    for _ in range(2, max_len + 1):
        if not prev_level or not items:
            break
        candidates = [p + [it] for p in prev_level for it in items]
        if len(candidates) > candidate_cap:
            raise ValueError(
                f"candidate blow-up: {len(candidates)} level candidates exceed "
                f"candidate_cap={candidate_cap} — raise min_support or the cap"
            )
        cand_df = F.broadcast(
            spark.createDataFrame([(c,) for c in candidates], "pat array<string>")
        )
        level = (
            seqs.crossJoin(cand_df)
            .filter(_contains_pattern(F.col("seq"), F.col("pat")))
            .groupBy("pat")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support)
            .collect()
        )
        prev_level = [list(r["pat"]) for r in level]
        out_rows.extend((list(r["pat"]), r["support"]) for r in level)

    res = spark.createDataFrame(
        [(p, len(p), s) for (p, s) in out_rows],
        "pat array<string>, length int, support long",
    )
    return res.select(
        F.array_join("pat", " -> ").alias("pattern"), "length", "support"
    )
