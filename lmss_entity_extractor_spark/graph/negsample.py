"""Deterministic negative sampling for KG-embedding training: for each
positive triple, mint k corrupted triples by replacing the subject or
object with a hash-picked entity, then anti-join out accidental true
triples — the "filtered" corruption protocol of TransE (Bordes et al.,
NeurIPS'13 §4) that every KG-embedding trainer (TransE/DistMult/
ComplEx/RotatE) consumes.

Determinism: the replacement entity at (triple, sample index) is a
HASH, not an RNG — the entity whose dense rank equals
``hash(s:p:o:i:side:seed) % |E|`` in the md5-ordered entity pool.
Re-runs, re-partitions, and other engines mint identical negatives
(same md5-prefix hash family as graph/walks.py / ops/dsir.py — the
pick depends on hash VALUES, so the hash must be engine-identical).
Ranking the pool by (md5(entity), entity) rather than by entity id
also decorrelates rank from id order, so the pick is not biased by
how ids were assigned.

Two filters, both part of the published protocol and both documented:

- a corruption that lands on the ORIGINAL entity is dropped (it is
  not a negative); expected loss is k/|E| per positive.
- a corruption that reconstructs ANY positive triple is dropped via
  one anti-join against the positives (the "filtered" setting; skip
  with ``filtered=False`` for the "raw" setting).

Scale shape (10^11 positives, 10^9 entities): pool ranking is one
window over the DISTINCT entity set; each negative is minted by ONE
(rank) equi-join matching exactly one pool row — no fan-out, no
crossJoin, no driver-side sampling; the filter is one keyed anti-join
on (s, p, o).  Everything else is narrow column expressions.

No reference counterpart; extends the KG training-data family
(SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDES = ("subject", "object", "both")


def _pick_hash(s, p, o, i: int, side: str, seed: int):
    """Engine-portable 48-bit pick hash (walks.py spelling)."""
    key = F.concat_ws(
        ":",
        s.cast("string"),
        p.cast("string"),
        o.cast("string"),
        F.lit(str(i)),
        F.lit(side),
        F.lit(str(seed)),
    )
    return F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")


def negative_samples(
    triples: DataFrame,
    *,
    k: int = 1,
    corrupt: str = "object",
    seed: int = 0,
    filtered: bool = True,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Mint up to ``k`` negatives per positive per corrupted side;
    returns (s, p, o, neg_idx, corrupted) where ``corrupted`` ∈
    {'subject','object'} names the replaced position and ``neg_idx``
    is the sample index.  ``corrupt`` ∈ {'subject','object','both'}."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if corrupt not in _SIDES:
        raise ValueError(f"corrupt must be one of {_SIDES}, got {corrupt!r}")

    pos = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).distinct()
    # entity pool: every subject or object, dense-ranked by md5 so the
    # modular pick is unbiased by id assignment.  The rank is built with
    # the graph/dictenc.py scalable dense-rank (VERDICT r5 item 2): a
    # range exchange on the SAME (md5, ent) ordering key slices the pool
    # into contiguous runs of the global order, each slice row_number()s
    # locally in parallel, and per-slice counts (one small int per
    # partition) become cumulative offsets — identical ranks to the old
    # single-partition Window.orderBy at any parallelism, without
    # funnelling a 10^9-entity pool through one task.  No max_entities
    # refusal is needed anymore: nothing here is single-task.
    spark = triples.sparkSession
    num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    pool = (
        pos.select(F.col("s").alias("ent"))
        .union(pos.select(F.col("o").alias("ent")))
        .distinct()
        .withColumn("_h", F.md5(F.col("ent")))
        .repartitionByRange(num_ranges, "_h", "ent")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in pool.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    n_ent = acc
    if n_ent < 2:
        raise ValueError("need at least 2 distinct entities to corrupt")
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy("_h", "ent")
    pool = pool.select(
        "ent", (F.row_number().over(w) - 1 + offset_expr).alias("rk")
    ).localCheckpoint(eager=True)

    sides = ["subject", "object"] if corrupt == "both" else [corrupt]
    minted = []
    for side in sides:
        for i in range(k):
            pick = _pick_hash(F.col("s"), F.col("p"), F.col("o"), i, side, seed) % n_ent
            cand = pos.withColumn("_rk", pick).join(
                pool.withColumnsRenamed({"rk": "_rk", "ent": "_repl"}), "_rk"
            )
            if side == "subject":
                cand = cand.filter(F.col("_repl") != F.col("s")).select(
                    F.col("_repl").alias("s"), "p", "o"
                )
            else:
                cand = cand.filter(F.col("_repl") != F.col("o")).select(
                    "s", "p", F.col("_repl").alias("o")
                )
            minted.append(
                cand.select(
                    "s",
                    "p",
                    "o",
                    F.lit(i).alias("neg_idx"),
                    F.lit(side).alias("corrupted"),
                )
            )
    out = minted[0]
    for m in minted[1:]:
        out = out.unionByName(m)
    if filtered:
        out = out.join(pos, ["s", "p", "o"], "left_anti")
    return out
