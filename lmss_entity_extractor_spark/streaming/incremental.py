"""Incremental processing over a growing transcripts table
(SURVEY.md §2.9 stretch goal).

The reference is strictly request/response batch; the north rule's
"incremental re-run over a growing table" maps to EITHER checkpoint-
manifest batch reruns (pipeline.py — restart-exact, the default) OR this
Structured Streaming form: ``readStream`` over the transcripts directory
with ``Trigger.AvailableNow`` + ``foreachBatch``, so each micro-batch
runs the same extract→link→triple dataflow and appends to an incremental
edges table, with Spark's streaming checkpoint tracking which input
files are already processed.  A periodic ``compact`` pass re-canonicalizes
across batches (identical triples may arrive in different micro-batches).

Event-time semantics: ``streaming_turn_rate`` shows the watermarked
windowed-aggregation form over the ``ts`` column for late-arriving turns.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..graph.canonicalize import canonicalize_triples
from ..graph.triples import emit_triples
from ..linking.stage import extract_and_link


def incremental_edges(
    pipe,
    transcripts_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
) -> int:
    """Process all not-yet-seen transcript parquet files through the KG
    dataflow; append per-batch canonical edges to ``out_dir``.

    Returns the number of micro-batches processed.  Re-running after new
    files land processes only the delta (streaming checkpoint tracks file
    offsets); re-running with no new files is a no-op.
    """
    spark = pipe.spark
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(str(transcripts_dir))
    )
    n_batches = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # fused per-batch dataflow: micro-batches are small, so the
        # per-worker-memo strategy (no persist/extra shuffle) fits here.
        # IDEMPOTENT write: each batch overwrites its own batch_id
        # partition directory, so a batch replayed after a crash between
        # the data write and the streaming-checkpoint commit rewrites the
        # same path instead of appending duplicate edge rows
        links = extract_and_link(batch_df, pipe.bc_artifacts, pipe.config.linker())
        edges = pipe.edges_from_links(links)
        edges.write.mode("overwrite").parquet(str(Path(out_dir) / f"batch_id={batch_id}"))
        n_batches["n"] += 1

    query = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return n_batches["n"]


def compact_incremental_edges(spark: SparkSession, out_dir: str | Path) -> DataFrame:
    """Cross-batch canonicalization: identical (subj, pred, obj) triples
    appended by different micro-batches merge into one row with summed
    provenance counts and min first-seen provenance."""
    inc = spark.read.parquet(str(out_dir))
    return (
        inc.groupBy("subj", "pred", "obj")
        .agg(
            F.sum("n_provenances").alias("n_provenances"),
            F.min(F.struct("first_conv_id", "first_turn_idx")).alias("_first"),
            F.max("max_score").alias("max_score"),
        )
        .select(
            "subj",
            "pred",
            "obj",
            "n_provenances",
            F.col("_first.first_conv_id").alias("first_conv_id"),
            F.col("_first.first_turn_idx").alias("first_turn_idx"),
            F.col("max_score").cast("float").alias("max_score"),
        )
    )


def streaming_turn_rate(
    spark: SparkSession,
    transcripts_dir: str | Path,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
):
    """Watermarked event-time windowed aggregation over the turn stream:
    turns per (window, role), tolerating ``watermark`` of lateness.
    Returns the started query (memory sink, name 'turn_rate')."""
    stream = spark.readStream.schema(schemas.TRANSCRIPTS).parquet(str(transcripts_dir))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("turn_rate")
        .trigger(availableNow=True)
        .start()
    )
