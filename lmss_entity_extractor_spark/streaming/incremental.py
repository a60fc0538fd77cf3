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

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..checkpoints import atomic_write_text, input_snapshot, snapshot_delta
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

    reg_path = Path(out_dir) / "_batches.json"  # "_"-prefixed: invisible to the parquet reader

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # fused per-batch dataflow: micro-batches are small, so the
        # per-worker-memo strategy (no persist/extra shuffle) fits here.
        # IDEMPOTENT write: each batch overwrites its own batch_id
        # partition directory, so a batch replayed after a crash between
        # the data write and the streaming-checkpoint commit rewrites the
        # same path instead of appending duplicate edge rows.
        #
        # Replay safety beyond same-files replays (ADVICE r1): a batch id
        # is only stable while the streaming checkpoint lives.  If the
        # checkpoint is lost and new files landed, file->batch assignment
        # shifts, and stale batch_id=N dirs from the earlier incarnation
        # would duplicate (or orphan) edges in compact_incremental_edges.
        # _batches.json records each batch's exact input-file list; on a
        # mismatch every recorded batch >= this id is stale and its dir is
        # dropped before writing.
        files = sorted(batch_df.inputFiles())
        try:
            reg: dict = json.loads(reg_path.read_text()) if reg_path.exists() else {}
        except json.JSONDecodeError:
            # a corrupt registry (should be impossible with the atomic
            # write below, but disks happen) degrades to "no recorded
            # provenance": entries rebuild as batches are (re)played
            reg = {}
        if reg.get(str(batch_id)) not in (None, files):
            for k in [k for k in reg if int(k) >= batch_id]:
                shutil.rmtree(Path(out_dir) / f"batch_id={k}", ignore_errors=True)
                del reg[k]
        links = extract_and_link(batch_df, pipe.bc_artifacts, pipe.config.linker())
        edges = pipe.edges_from_links(links)
        edges.write.mode("overwrite").parquet(str(Path(out_dir) / f"batch_id={batch_id}"))
        reg[str(batch_id)] = files
        atomic_write_text(reg_path, json.dumps(reg, indent=2, sort_keys=True))
        n_batches["n"] += 1

    query = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return n_batches["n"]


def incremental_edges_snapshot(
    pipe,
    transcripts_dir: str | Path,
    out_dir: str | Path,
    snapshot_name: str = "transcripts_in",
) -> dict:
    """Snapshot-range incremental processing (SURVEY.md §2.9 option (a)
    without Iceberg jars): process exactly the input files ADDED since the
    last recorded snapshot, in one batch read.

    The checkpoint manifest records an ``input_snapshot`` — per-file
    fingerprints plus a content-derived snapshot id, the poor-man's
    Iceberg snapshot.  On each call:

      * delta vs the recorded snapshot is computed file-exactly;
      * ``changed``/``removed`` files break the append-only contract ->
        ValueError (callers fall back to a full ``run_path`` rebuild);
      * added files are read in ONE batch (no per-file loop; Spark splits
        them in parallel) through the fused dataflow, written to
        ``increment=<delta-fingerprint>`` — the dir name derives from the
        processed file set, so a crash between data write and manifest
        update replays into the SAME dir (idempotent overwrite), never
        duplicating edges;
      * the new snapshot + its increment's file list is recorded last
        (write-ahead ordering: data, then manifest).

    Returns ``{"processed_files": [...], "increment": <dir-name-or-None>,
    "snapshot_id": ...}``.  Union of all increments == one batch run over
    the full dir (tests/test_streaming.py asserts byte-identical edges).
    """
    import hashlib

    tdir = Path(transcripts_dir)
    cur = input_snapshot(tdir)
    prev = pipe.ckpt.load_snapshot(snapshot_name)
    delta = snapshot_delta(prev, cur)
    if delta["changed"] or delta["removed"]:
        raise ValueError(
            "incremental read requires an append-only input; "
            f"changed={delta['changed']} removed={delta['removed']} — call "
            "reset_incremental() then rerun (reprocesses the full input as "
            "one increment)"
        )
    added = delta["added"]
    # The snapshot manifest is the single commit point: it carries the
    # full list of committed increment ids alongside the input snapshot
    # (one atomic file write).  An increment dir written by a run that
    # crashed before that commit is an ORPHAN — if more files landed
    # before the retry, the retry's (larger) delta gets a different
    # increment id and the orphan would double-count its edges in
    # compact_incremental_edges — so any dir the manifest doesn't vouch
    # for is dropped before processing.
    committed = (prev or {}).get("committed_increments")
    reconstructed = None
    if committed is None and prev is not None:
        # legacy manifest (predates the committed-increments field): its
        # increments WERE committed but unrecorded — vouch for every dir
        # present rather than wiping edges that will never be reprocessed
        committed = reconstructed = sorted(
            d.name.split("=", 1)[1] for d in Path(out_dir).glob("increment=*")
        ) if Path(out_dir).exists() else []
    committed = committed or []
    if Path(out_dir).exists():
        for d in Path(out_dir).glob("increment=*"):
            if d.name.split("=", 1)[1] not in committed:
                shutil.rmtree(d, ignore_errors=True)
    if not added:
        return {"processed_files": [], "increment": None, "snapshot_id": cur["snapshot_id"]}

    inc_id = hashlib.sha256(
        json.dumps([(f, cur["files"][f]) for f in added]).encode()
    ).hexdigest()[:16]
    inc_dir = Path(out_dir) / f"increment={inc_id}"
    batch_df = pipe.spark.read.schema(schemas.TRANSCRIPTS).parquet(
        *[str(tdir / f) for f in added]
    )
    links = extract_and_link(batch_df, pipe.bc_artifacts, pipe.config.linker())
    pipe.edges_from_links(links).write.mode("overwrite").parquet(str(inc_dir))
    # commit order: data, then the manifest that both records the new
    # snapshot and vouches for the new dir; a crash between the two
    # leaves an orphan that the next call removes and re-derives
    # history = the snapshot log (the Iceberg snapshot-list shape): one
    # entry per committed increment, in commit order — what time-travel
    # reads (edges_as_of) resolve against.  Carried forward inside the
    # manifest so the whole commit stays ONE atomic file write; legacy
    # manifests (pre-history) get their committed increments seeded under
    # the recorded snapshot id so time travel never under-reads them —
    # including gen-1 manifests whose committed set itself had to be
    # reconstructed from on-disk dirs above (ADVICE r3).
    history = _seeded_history(prev, reconstructed)
    history.append({"snapshot_id": cur["snapshot_id"], "increment": inc_id})
    pipe.ckpt.record_snapshot(
        snapshot_name,
        cur,
        extra={
            "increment": inc_id,
            "increment_files": added,
            "committed_increments": committed + [inc_id],
            "history": history,
        },
    )
    return {"processed_files": added, "increment": inc_id, "snapshot_id": cur["snapshot_id"]}


def reset_incremental(
    pipe, out_dir: str | Path, snapshot_name: str = "transcripts_in"
) -> None:
    """Restore incremental processing after the append-only contract broke
    (``incremental_edges_snapshot`` raised on changed/removed files).

    Drops the recorded input snapshot AND every increment dir, so the next
    ``incremental_edges_snapshot`` call sees the whole input as "added" and
    rebuilds the increment table in one batch — the documented "fall back
    to full rebuild", made actually repeatable (ADVICE r2: without this,
    the stale snapshot manifest kept every subsequent call raising)."""
    pipe.ckpt.invalidate_snapshot(snapshot_name)
    if Path(out_dir).exists():
        for d in Path(out_dir).glob("increment=*"):
            shutil.rmtree(d, ignore_errors=True)


def _seeded_history(
    man: dict | None, reconstructed_committed: list[str] | None = None
) -> list[dict]:
    """The manifest's snapshot log; a legacy manifest (predates the
    ``history`` field) gets one entry per committed increment under its
    recorded snapshot id — those increments WERE committed, and omitting
    them would make ``edges_as_of`` silently under-read the table.

    ``reconstructed_committed`` covers the gen-1 case where the manifest
    predates even ``committed_increments`` and the caller re-derived the
    committed set from on-disk increment dirs: seeding must use THAT list,
    or the gen-1 increments vanish from the log at the next commit."""
    if not man:
        return []
    history = list(man.get("history") or [])
    if not history:
        seed = man.get("committed_increments") or reconstructed_committed
        if seed:
            history = [
                {"snapshot_id": man["snapshot_id"], "increment": i} for i in seed
            ]
    return history


def snapshots(pipe, snapshot_name: str = "transcripts_in") -> list[dict]:
    """The snapshot log for time travel: committed (snapshot_id,
    increment) entries in commit order — the Iceberg ``table.snapshots()``
    shape over the manifest catalog.  Empty if nothing is recorded.
    Multiple entries may share a snapshot id (legacy seeding); as-of
    reads resolve to the LAST entry of the requested id."""
    return _seeded_history(pipe.ckpt.load_snapshot(snapshot_name))


def edges_as_of(
    pipe,
    out_dir: str | Path,
    snapshot_id: str,
    snapshot_name: str = "transcripts_in",
) -> DataFrame:
    """Time-travel read: the compacted canonical edges AS OF a recorded
    input snapshot — the Iceberg ``VERSION AS OF`` shape without jars.

    Resolves ``snapshot_id`` against the snapshot log, reads ONLY the
    increment dirs committed up to and including it (later increments
    contribute zero scanned bytes — directory selection, the same pruning
    class as partition filters), and compacts.  Raises ``KeyError`` for
    an unknown id: an unrecorded snapshot silently resolving to "latest"
    would be a correctness trap for auditing reads."""
    history = snapshots(pipe, snapshot_name)
    # resolve to the LAST entry carrying the id: legacy-seeded logs list
    # several increments under one snapshot id, all part of that version
    cut = max(
        (k for k, h in enumerate(history) if h["snapshot_id"] == snapshot_id),
        default=None,
    )
    if cut is None:
        raise KeyError(
            f"snapshot {snapshot_id!r} not in the snapshot log "
            f"(known: {[h['snapshot_id'] for h in history]})"
        )
    paths = [str(Path(out_dir) / f"increment={h['increment']}") for h in history[: cut + 1]]
    return _compact(pipe.spark.read.parquet(*paths))


def edges_diff(
    pipe,
    out_dir: str | Path,
    from_snapshot: str,
    to_snapshot: str,
    snapshot_name: str = "transcripts_in",
) -> DataFrame:
    """Changelog between two recorded snapshots (the Iceberg
    incremental-read shape): canonical edges that are NEW at
    ``to_snapshot`` (``_change = 'insert'``) or whose merged provenance
    changed (``_change = 'update'``, e.g. more provenances observed).
    Unchanged triples are absent, so a downstream consumer processes
    only the delta.  Deletes cannot occur under the append-only input
    contract.  ``from_snapshot`` must precede ``to_snapshot`` in the
    snapshot log."""
    ids = [h["snapshot_id"] for h in snapshots(pipe, snapshot_name)]
    if from_snapshot not in ids or to_snapshot not in ids:
        raise KeyError(f"unknown snapshot (known: {ids})")
    if ids.index(from_snapshot) >= ids.index(to_snapshot):
        raise ValueError(f"{from_snapshot!r} does not precede {to_snapshot!r} in the snapshot log")
    old = edges_as_of(pipe, out_dir, from_snapshot, snapshot_name)
    new = edges_as_of(pipe, out_dir, to_snapshot, snapshot_name)
    key = ["subj", "pred", "obj"]
    o = old.select(
        *key,
        F.struct(*[c for c in old.columns if c not in key]).alias("_old"),
    )
    n = new.select(
        *key,
        F.struct(*[c for c in new.columns if c not in key]).alias("_new"),
    )
    joined = n.join(o, key, "left")  # append-only: new side is a superset
    return (
        joined.filter(F.col("_old").isNull() | (F.col("_old") != F.col("_new")))
        .select(
            *key,
            F.col("_new.*"),
            F.when(F.col("_old").isNull(), F.lit("insert")).otherwise(F.lit("update")).alias("_change"),
        )
    )


def expire_and_compact(pipe, out_dir: str | Path, snapshot_name: str = "transcripts_in") -> str:
    """Table maintenance (the Iceberg ``expire_snapshots`` +
    ``rewrite_data_files`` pair): merge every committed increment into
    ONE pre-compacted increment and truncate the snapshot log to the
    latest snapshot.

    After this, reads touch a single merged file set instead of one dir
    per historical commit (small-file pressure is the real cost of
    long-running incremental tables), and time travel to pre-compaction
    snapshots raises KeyError — expiry is the documented trade, exactly
    as in Iceberg.  Crash-safe by commit ordering: the compacted dir is
    written first, the manifest commit swaps the vouched set atomically,
    and stale dirs are removed last (a crash in between leaves dirs the
    manifest doesn't vouch for, which the next ``run_incremental``
    reaps).  Returns the compacted increment id."""
    import hashlib

    man = pipe.ckpt.load_snapshot(snapshot_name)
    if not man:
        raise ValueError(f"no snapshot recorded under {snapshot_name!r} — nothing to compact")
    committed = list(man.get("committed_increments") or [])
    if not committed:
        raise ValueError("no committed increments — nothing to compact")
    inc_id = "compact-" + hashlib.sha256(json.dumps(committed).encode()).hexdigest()[:16]
    paths = [str(Path(out_dir) / f"increment={i}") for i in committed]
    _compact(pipe.spark.read.parquet(*paths)).write.mode("overwrite").parquet(
        str(Path(out_dir) / f"increment={inc_id}")
    )
    payload = {
        k: v
        for k, v in man.items()
        if k not in ("increment", "increment_files", "committed_increments", "history")
    }
    pipe.ckpt.record_snapshot(
        snapshot_name,
        payload,
        extra={
            "increment": inc_id,
            "committed_increments": [inc_id],
            "history": [{"snapshot_id": man["snapshot_id"], "increment": inc_id}],
        },
    )
    for i in committed:
        if i != inc_id:
            shutil.rmtree(Path(out_dir) / f"increment={i}", ignore_errors=True)
    return inc_id


def delete_rows(
    pipe,
    out_dir: str | Path,
    predicate: str,
    snapshot_name: str = "transcripts_in",
) -> str:
    """Keyed deletion over the incremental edge table (the Iceberg
    ``DELETE FROM`` / GDPR right-to-be-forgotten shape): rewrite every
    committed increment WITHOUT the rows matching ``predicate`` (a SQL
    boolean over the edge columns, e.g.
    ``first_conv_id = 'conv-000007'``), committed as one compacted
    increment.

    Semantics stated, not implied:

    - the rewrite is also a compaction — deletion already touches every
      data file, so merging them costs nothing extra and the log
      truncates to one vouched increment (same trade as
      ``expire_and_compact``: pre-deletion snapshots become
      unreachable, which for a deletion request is the POINT — time
      travel must not resurrect the deleted rows);
    - crash-safe by the same commit ordering: new dir, then manifest,
      then reap;
    - returns the new increment id; the caller re-reads via
      ``compact_incremental_edges`` as usual.

    Scale: one filtered scan + the compaction aggregate — no driver
    materialization; the predicate pushes into the parquet scan."""
    import hashlib

    man = pipe.ckpt.load_snapshot(snapshot_name)
    if not man:
        raise ValueError(f"no snapshot recorded under {snapshot_name!r} — nothing to delete from")
    committed = list(man.get("committed_increments") or [])
    if not committed:
        raise ValueError("no committed increments — nothing to delete from")
    inc_id = (
        "delete-"
        + hashlib.sha256(json.dumps([committed, predicate]).encode()).hexdigest()[:16]
    )
    paths = [str(Path(out_dir) / f"increment={i}") for i in committed]
    kept = pipe.spark.read.parquet(*paths).filter(f"NOT ({predicate})")
    _compact(kept).write.mode("overwrite").parquet(
        str(Path(out_dir) / f"increment={inc_id}")
    )
    payload = {
        k: v
        for k, v in man.items()
        if k not in ("increment", "increment_files", "committed_increments", "history")
    }
    pipe.ckpt.record_snapshot(
        snapshot_name,
        payload,
        extra={
            "increment": inc_id,
            "committed_increments": [inc_id],
            "history": [{"snapshot_id": man["snapshot_id"], "increment": inc_id}],
        },
    )
    for i in committed:
        if i != inc_id:
            shutil.rmtree(Path(out_dir) / f"increment={i}", ignore_errors=True)
    return inc_id


def compact_incremental_edges(spark: SparkSession, out_dir: str | Path) -> DataFrame:
    """Cross-batch canonicalization: identical (subj, pred, obj) triples
    appended by different micro-batches merge into one row with summed
    provenance counts and min first-seen provenance."""
    return _compact(spark.read.parquet(str(out_dir)))


def _compact(inc: DataFrame) -> DataFrame:
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


def pred_view(edges: DataFrame) -> DataFrame:
    """The demonstration aggregate view for IVM: per-predicate edge
    count and total provenance weight."""
    return edges.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("n_provenances").alias("total_prov"),
    )


def maintain_pred_view(
    pipe,
    out_dir: str | Path,
    prev_view: DataFrame,
    from_snapshot: str,
    to_snapshot: str,
    snapshot_name: str = "transcripts_in",
) -> DataFrame:
    """Incremental view maintenance (IVM) of ``pred_view`` across a
    snapshot range: fold ONLY the changelog's contribution into the
    previous view instead of recomputing from the base table —

    - inserted triples contribute (+1 edge, +n_provenances);
    - updated triples contribute (+0 edges, +Δn_provenances) — the
      append-only contract means updates only ever GROW provenance;
    - deletes cannot occur (same contract), so no retraction path.

    The maintained view must equal ``pred_view(edges_as_of(to))``
    exactly — pinned by test.  At 100 TB the difference is reading a
    per-commit delta instead of re-aggregating the full edge table;
    counts are exact integers, so the fold is drift-free by
    construction (no float accumulation to diverge from the
    recompute)."""
    key = ["subj", "pred", "obj"]
    old = edges_as_of(pipe, out_dir, from_snapshot, snapshot_name).select(
        *key, F.col("n_provenances").alias("_np_old")
    )
    new = edges_as_of(pipe, out_dir, to_snapshot, snapshot_name).select(
        *key, F.col("n_provenances").alias("_np_new")
    )
    changed = (
        new.join(old, key, "left")
        .filter(F.col("_np_old").isNull() | (F.col("_np_old") != F.col("_np_new")))
    )
    delta = changed.groupBy("pred").agg(
        F.sum(F.col("_np_old").isNull().cast("long")).alias("_d_edges"),
        F.sum(
            F.col("_np_new") - F.coalesce(F.col("_np_old"), F.lit(0))
        ).alias("_d_prov"),
    )
    merged = prev_view.join(delta, "pred", "full_outer")
    return merged.select(
        "pred",
        (
            F.coalesce(F.col("n_edges"), F.lit(0))
            + F.coalesce(F.col("_d_edges"), F.lit(0))
        ).alias("n_edges"),
        (
            F.coalesce(F.col("total_prov"), F.lit(0))
            + F.coalesce(F.col("_d_prov"), F.lit(0))
        ).alias("total_prov"),
    )
