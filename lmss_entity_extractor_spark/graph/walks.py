"""Deterministic random walks over an edge list — the DeepWalk /
node2vec corpus generator (Perozzi et al., KDD'14): fixed-length walks
from every node whose node sequences feed skip-gram style embedding
training.  On a KG, walk corpora are the standard way to turn graph
structure into trainable token sequences.

Determinism: the "random" neighbor choice at (current node, step, walk
index) is a HASH, not an RNG — next = neighbor whose dense rank (by id
within the adjacency list) equals ``hash(cur:step:walk:seed) % degree``.
Re-running, re-partitioning, or re-deriving on another engine picks the
identical neighbor, so walks are reproducible corpus artifacts (and the
DuckDB oracle unrolls the identical recurrence).  The hash is the
md5-prefix family shared with ops/dsir.py / ops/winnow.py — the
selection depends on hash VALUES, so the hash must be engine-identical.

Scale shape per step: one keyed join onto the degree table to compute
the pick, then one equi-join on (node, rank) that matches EXACTLY ONE
adjacency row — no per-neighbor fan-out, so a walk stepping through a
10^6-degree hub costs one lookup, not 10^6 candidate rows.  The
adjacency ranking itself is one window over the edge list, built once.
Walks terminate early at dangling nodes (no out-edges).

No reference counterpart; extends the graph analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pick_hash(cur, step: int, walk, seed: int):
    """Engine-portable 48-bit choice hash of (cur, step, walk, seed)."""
    key = F.concat_ws(
        ":",
        cur.cast("string"),
        F.lit(str(step)),
        walk.cast("string"),
        F.lit(str(seed)),
    )
    return F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    seed: int = 0,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(start_node, walk, step, node): ``walks_per_node`` deterministic
    walks of up to ``walk_len`` steps from every node with an out-edge
    (plus the step-0 row for every node, including dangling ones).
    Walks follow edge direction; symmetrize the edge list first for
    undirected walks.  Walks stop early at dangling nodes."""
    if walk_len < 0 or walks_per_node < 1:
        raise ValueError("walk_len must be >= 0 and walks_per_node >= 1")
    adj = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr")).distinct()
    rk = (
        adj.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("node").orderBy("nbr")) - 1,
        )
        .localCheckpoint()
    )
    deg = rk.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        adj.select("node")
        .union(adj.select(F.col("nbr").alias("node")))
        .distinct()
    )
    walks = nodes.crossJoin(
        nodes.sparkSession.range(walks_per_node).select(
            F.col("id").cast("int").alias("walk")
        )
    )
    state = walks.select(
        F.col("node").alias("start_node"), "walk", F.col("node").alias("cur")
    ).localCheckpoint()
    out = state.select(
        "start_node", "walk", F.lit(0).alias("step"), F.col("cur").alias("node")
    )
    for step in range(1, walk_len + 1):
        picked = state.join(deg, state["cur"] == deg["node"]).select(
            "start_node",
            "walk",
            "cur",
            (_pick_hash(F.col("cur"), step, F.col("walk"), seed) % F.col("deg")).alias(
                "_rk"
            ),
        )
        state = (
            picked.join(
                rk,
                (picked["cur"] == rk["node"]) & (picked["_rk"] == rk["rk"]),
            )
            .select("start_node", "walk", F.col("nbr").alias("cur"))
            .localCheckpoint()
        )
        out = out.union(
            state.select(
                "start_node", "walk", F.lit(step).alias("step"), F.col("cur").alias("node")
            )
        )
    return out
