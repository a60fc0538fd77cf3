"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9: the idiomatic Spark seam for stateful logic that
watermarked windows can't express).

``conversation_running_totals`` keeps one state row per conversation
across micro-batches: cumulative turns seen and the highest turn index,
emitting an update row per conversation per batch it appears in.  This
is the streaming twin of the batch pipeline's per-conversation rollups —
a downstream consumer (e.g. "re-link conversations that grew by >N
turns") reads the update stream instead of rescanning the table.

Scale shape: state is keyed by ``conv_id`` and lives in the executor
state store (RocksDB-backed on a real cluster), so the operator
partitions exactly like every other conv-keyed stage; one shuffle on the
grouping key per micro-batch, state size O(live conversations).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns_total", LongType()),
        StructField("n_turns_batch", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)


def _update_conv(key, pdf_iter, state: GroupState):
    n_batch = 0
    max_idx = -1
    for pdf in pdf_iter:
        n_batch += len(pdf)
        idx = pdf["turn_idx"].dropna()  # all-null turn_idx -> float NaN max
        if len(idx):
            max_idx = max(max_idx, int(idx.max()))
    if state.exists:
        n_prev, max_prev = state.get
        n_total = n_prev + n_batch
        max_idx = max(max_idx, max_prev)
    else:
        n_total = n_batch
    state.update((n_total, max_idx))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns_total": [n_total],
            "n_turns_batch": [n_batch],
            "max_turn_idx": [max_idx],
        }
    )


def conversation_running_totals(turn_stream: DataFrame) -> DataFrame:
    """Streaming transcripts -> one update row per (conversation, batch):
    cumulative turn count, this-batch turn count, max turn index seen.

    ``turn_stream`` must be a streaming DataFrame with at least
    ``conv_id`` and ``turn_idx`` columns."""
    return (
        turn_stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    turn_stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication: drop rows whose ``keys`` were
    already seen within the watermark horizon — the streaming twin of
    the batch exact-dedup operator (ops/dedup.py), for at-least-once
    upstreams that redeliver turns.

    Built on ``dropDuplicatesWithinWatermark``: per-key state lives in
    the state store and is EVICTED once the key ages past the watermark
    (unbounded-state-free, unlike plain dropDuplicates on a stream);
    re-deliveries farther apart than the horizon are a documented
    non-goal at this seam — route those to the batch canonicalization,
    which is idempotent across the union anyway."""
    return turn_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def session_counts(
    turn_stream: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming session windows: per-conversation turn counts per
    gap-separated activity burst (``F.session_window`` — the engine
    merges a conversation's partial session ACROSS micro-batches in the
    state store until a gap exceeds ``gap``).

    Append-mode semantics, stated because they are the whole contract:
    a session is EMITTED exactly once, when the watermark passes its
    end (last event + gap) — sessions still open at watermark, or at
    the end of a bounded run, stay in state and never emit.  An
    upstream that needs every trailing session flushed sends a late
    punctuation event (any event past the horizon) — the standard
    flush pattern, exercised in tests.

    Scale: state per conversation is ONE merged window, not the events
    (counts fold incrementally), and eviction rides the watermark —
    bounded like L26/L29."""
    return (
        turn_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_turns",
        )
    )


def pair_turns_with_replies(
    turn_stream: DataFrame,
    reply_window: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-STREAM event-time interval join (the advanced §2.9
    operator beyond stream-static enrichment): each user turn pairs with
    the assistant turns of the same conversation that arrive within
    ``reply_window`` after it.

    Both sides are watermarked so the join state is BOUNDED: a buffered
    user turn can be dropped once the assistant watermark passes
    ``turn.ts + reply_window``, and vice versa — without the time-range
    predicate + watermarks a stream-stream join must buffer both sides
    forever.  Output: (conv_id, user_turn_idx, user_ts, reply_turn_idx,
    reply_ts).  Batch-parity is pinned in tests (same join as a static
    range predicate)."""
    u = (
        turn_stream.filter(F.col("role") == "user")
        .withWatermark("ts", watermark)
        .select(
            F.col("conv_id").alias("u_conv"),
            F.col("turn_idx").alias("user_turn_idx"),
            F.col("ts").alias("user_ts"),
        )
    )
    a = (
        turn_stream.filter(F.col("role") == "assistant")
        .withWatermark("ts", watermark)
        .select(
            F.col("conv_id").alias("a_conv"),
            F.col("turn_idx").alias("reply_turn_idx"),
            F.col("ts").alias("reply_ts"),
        )
    )
    cond = (
        (F.col("u_conv") == F.col("a_conv"))
        & (F.col("reply_ts") > F.col("user_ts"))
        & (F.col("reply_ts") <= F.col("user_ts") + F.expr(f"INTERVAL {reply_window}"))
    )
    return u.join(a, cond, "inner").select(
        F.col("u_conv").alias("conv_id"),
        "user_turn_idx",
        "user_ts",
        "reply_turn_idx",
        "reply_ts",
    )


HH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("err", LongType()),
        StructField("n_shard", LongType()),
    ]
)

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("item", StringType()),
        StructField("count_est", LongType()),
        StructField("max_undercount", LongType()),
        StructField("n_shard", LongType()),
    ]
)


def streaming_heavy_hitters(
    token_stream: DataFrame, col: str, k: int = 64, shards: int = 8
) -> DataFrame:
    """Streaming heavy hitters (L106): the streaming twin of the batch
    two-pass operator (`ops/heavyhitters.py`) — a sharded Misra-Gries
    summary maintained in the state store across micro-batches.

    Items hash to EXACTLY ONE shard (``pmod(xxhash64(item), shards)``),
    so a shard's MG summary sees an item's complete stream: the per-item
    MG invariant ``count_est <= true <= count_est + max_undercount``
    holds GLOBALLY, and any item whose true count exceeds the shard's
    ``max_undercount`` is guaranteed present (the same eviction bound as
    the batch pass 1).  Each batch emits the shard's current survivors
    in update mode — a monitoring stream, exactly the rows pass 2 of
    the batch operator would verify.

    Scale shape: state is O(shards * k) REGARDLESS of stream length —
    the bounded-state answer to "top tokens so far" that an exact
    streaming groupBy-count (unbounded keys in the state store) is not;
    ``shards`` spreads both the shuffle and the per-task update cost.
    """
    if k < 1 or shards < 1:
        raise ValueError(f"k and shards must be >= 1, got k={k} shards={shards}")

    def update(key, pdf_iter, state: GroupState):
        import numpy as np

        if state.exists:
            items, counts, err, n_shard = state.get
            counters = dict(zip(items, counts))
        else:
            counters, err, n_shard = {}, 0, 0
        for pdf in pdf_iter:
            vals = pdf["item"].dropna()
            n_shard += len(vals)
            for item, c in vals.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cnts = np.fromiter(counters.values(), dtype=np.int64)
                m = int(np.partition(cnts, len(cnts) - k - 1)[len(cnts) - k - 1])
                counters = {i: c - m for i, c in counters.items() if c - m > 0}
                err += m
        state.update((list(counters.keys()), list(counters.values()), err, n_shard))
        yield pd.DataFrame(
            {
                "shard": key[0],
                "item": list(counters.keys()),
                "count_est": list(counters.values()),
                "max_undercount": err,
                "n_shard": n_shard,
            }
        )

    toks = (
        token_stream.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .withColumn("shard", F.pmod(F.xxhash64(F.col("item")), F.lit(shards)).cast("int"))
    )
    return toks.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
