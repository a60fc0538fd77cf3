"""Dictionary encoding for RDF triples (HDT-style, Fernández et al.
JWS'13 §4.1): map every distinct term (subject, predicate, object) to a
dense int64 id and rewrite the triple table as (s_id, p_id, o_id).

This is the storage/shuffle lever for a 100 TB graph: every downstream
join, closure, component, and canonicalization shuffles 8-byte ints
instead of 100-byte IRIs/literals, and the dictionary itself is the
compressed column store of the term universe (HDT's "Dictionary"
component; Iceberg/Parquet dictionary pages do this per-file — this
operator does it graph-globally so ids JOIN across files).

Id assignment contract: ``id = dense rank of the term in the globally
sorted distinct-term universe`` (0-based).  That makes ids

* deterministic — same term set, same ids, regardless of parallelism,
  partition count, or input order (pinned by test);
* dense — exactly 0..n_terms-1, so downstream arrays/bitmaps can be
  indexed by id with no holes;
* ANSI-SQL-reproducible — ``row_number() OVER (ORDER BY term) - 1``.

Spark-first shape (the scalable dense-rank): a single-partition
``row_number`` window would serialize the sort on one task, so instead

1. distinct terms (one combinable shuffle),
2. ``repartitionByRange(term)`` — a range exchange: partition p holds a
   contiguous slice of the sorted term universe,
3. within-partition ``row_number`` (sorts each slice independently, in
   parallel),
4. per-partition counts collected to the driver (bounded: one small int
   per partition) → cumulative offsets broadcast back and added.

Any range boundary choice yields the same ids — the global order is
(partition slice order) × (within-slice order) — so the sampled
boundaries never leak into results.

No reference counterpart (`app/*` keeps IRIs as Python strings
end-to-end); extends the KG materialization family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def term_dictionary(
    triples: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    num_ranges: int | None = None,
) -> DataFrame:
    """Build the (term: string, id: bigint) dictionary for ``triples``.

    ``num_ranges`` caps the range-exchange width (default: the session's
    shuffle-partition setting).  Ids are dense 0..n-1 in sorted-term
    order — parallelism-independent.
    """
    spark = triples.sparkSession
    if num_ranges is None:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    terms = (
        triples.select(F.col(s_col).alias("term"))
        .unionByName(triples.select(F.col(p_col).alias("term")))
        .unionByName(triples.select(F.col(o_col).alias("term")))
        .distinct()
        .repartitionByRange(num_ranges, "term")
        .withColumn("_pid", F.spark_partition_id())
    )
    # Within-slice rank: the window is per range-partition, so each sort
    # is local and parallel.  localCheckpoint pins the partitioning so
    # the groupBy below and the ranked read see the SAME partition ids.
    terms = terms.localCheckpoint(eager=False)
    sizes = {
        r["_pid"]: r["n"]
        for r in terms.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy("term")
    return terms.select(
        "term",
        (F.row_number().over(w) - 1 + offset_expr).cast("bigint").alias("id"),
    )


def encode_triples(
    triples: DataFrame,
    dictionary: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Rewrite ``triples`` as (s_id, p_id, o_id) via three keyed joins
    against ``dictionary``.

    Each join shuffles on the term — at 100 TB that is the unavoidable
    dictionary-encode pass (HDT does the same two-scan build); every
    join AFTER this one moves 8-byte ids instead of full terms.  The
    predicate join could broadcast (predicate universes are small), but
    the dictionary here is the full term table; Spark's AQE downgrades
    to broadcast automatically when the dict side turns out tiny.
    """
    out = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    for col, alias in (("s", "s_id"), ("p", "p_id"), ("o", "o_id")):
        d = dictionary.select(
            F.col("term").alias(f"_t_{col}"), F.col("id").alias(alias)
        )
        out = out.join(d, on=out[col] == d[f"_t_{col}"], how="inner").drop(
            f"_t_{col}"
        )
    return out.select("s_id", "p_id", "o_id")


def decode_triples(
    encoded: DataFrame,
    dictionary: DataFrame,
    *,
    s_col: str = "s_id",
    p_col: str = "p_id",
    o_col: str = "o_id",
) -> DataFrame:
    """Invert :func:`encode_triples`: (s_id, p_id, o_id) → (s, p, o)."""
    out = encoded.select(
        F.col(s_col).alias("s_id"),
        F.col(p_col).alias("p_id"),
        F.col(o_col).alias("o_id"),
    )
    for idc, alias in (("s_id", "s"), ("p_id", "p"), ("o_id", "o")):
        d = dictionary.select(
            F.col("id").alias(f"_i_{idc}"), F.col("term").alias(alias)
        )
        out = out.join(d, on=out[idc] == d[f"_i_{idc}"], how="inner").drop(
            f"_i_{idc}"
        )
    return out.select("s", "p", "o")
