"""Structured Streaming incremental mode (SURVEY.md §2.9): AvailableNow
foreachBatch over a growing transcripts directory, cross-batch
re-canonicalization parity with the batch dataflow, and a watermarked
event-time aggregation."""

import shutil

import pytest

from lmss_entity_extractor_spark.datagen import write_transcripts_parquet
from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig
from lmss_entity_extractor_spark.streaming.incremental import (
    compact_incremental_edges,
    incremental_edges,
    streaming_turn_rate,
)


def _edge_set(df):
    return {
        (r["subj"], r["pred"], r["obj"], r["n_provenances"], r["first_conv_id"], r["first_turn_idx"])
        for r in df.collect()
    }


@pytest.fixture()
def stream_dirs(tmp_path):
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    return tdir, tmp_path / "inc_edges", tmp_path / "stream_ckpt"


@pytest.mark.spark
def test_incremental_matches_batch_and_resumes(spark, owl_path, tmp_path, stream_dirs):
    tdir, out_dir, ckpt = stream_dirs
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=4, seed=11)
    write_transcripts_parquet(tdir / "part-1.parquet", n_convs=4, seed=22)

    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig())
    n1 = incremental_edges(pipe, tdir, out_dir, ckpt)
    assert n1 >= 1

    # no new files -> no-op
    n2 = incremental_edges(pipe, tdir, out_dir, ckpt)
    assert n2 == 0

    # delta file -> processed incrementally
    write_transcripts_parquet(tdir / "part-2.parquet", n_convs=3, seed=33)
    n3 = incremental_edges(pipe, tdir, out_dir, ckpt)
    assert n3 >= 1

    # cross-batch compaction == one-shot batch dataflow over the full input
    compacted = compact_incremental_edges(spark, out_dir)
    batch = pipe.dataflow(spark.read.parquet(str(tdir)))["edges"]
    assert _edge_set(compacted) == _edge_set(batch)
    shutil.rmtree(tmp_path, ignore_errors=True)


@pytest.mark.spark
def test_snapshot_incremental_processes_only_the_delta(spark, owl_path, tmp_path):
    """VERDICT r1 item 6: snapshot-shaped incremental reads.  Appending
    files reprocesses only the delta; the union of increments is
    byte-identical to a one-shot batch run; orphaned (uncommitted)
    increment dirs are reconciled; a mutated input refuses incremental."""
    from lmss_entity_extractor_spark.streaming.incremental import incremental_edges_snapshot

    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    out_dir = tmp_path / "snap_edges"
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=4, seed=11)
    write_transcripts_parquet(tdir / "part-1.parquet", n_convs=4, seed=22)

    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig())
    r1 = pipe.run_incremental(tdir, out_dir)
    assert sorted(r1["processed_files"]) == ["part-0.parquet", "part-1.parquet"]

    # no new files -> no-op, same snapshot id
    r2 = pipe.run_incremental(tdir, out_dir)
    assert r2["processed_files"] == [] and r2["increment"] is None

    # append one file -> ONLY that file is processed
    write_transcripts_parquet(tdir / "part-2.parquet", n_convs=3, seed=33)
    r3 = pipe.run_incremental(tdir, out_dir)
    assert r3["processed_files"] == ["part-2.parquet"]
    assert r3["snapshot_id"] != r2["snapshot_id"]

    # union of increments == one-shot batch dataflow over the full dir
    compacted = compact_incremental_edges(spark, out_dir)
    batch = pipe.dataflow(spark.read.parquet(str(tdir)))["edges"]
    assert _edge_set(compacted) == _edge_set(batch)

    # time travel: the snapshot log records both commits in order, and a
    # VERSION-AS-OF read at the first snapshot sees exactly the first two
    # files' edges (the later increment contributes nothing)
    log = pipe.snapshots()
    assert [h["snapshot_id"] for h in log] == [r1["snapshot_id"], r3["snapshot_id"]]
    batch_v1 = pipe.dataflow(
        spark.read.parquet(str(tdir / "part-0.parquet"), str(tdir / "part-1.parquet"))
    )["edges"]
    assert _edge_set(pipe.edges_as_of(out_dir, r1["snapshot_id"])) == _edge_set(batch_v1)
    assert _edge_set(pipe.edges_as_of(out_dir, r3["snapshot_id"])) == _edge_set(batch)
    with pytest.raises(KeyError, match="not in the snapshot log"):
        pipe.edges_as_of(out_dir, "deadbeef")

    # an uncommitted (orphan) increment dir is dropped on the next call
    orphan = out_dir / "increment=deadbeefdeadbeef"
    orphan.mkdir()
    (orphan / "junk.parquet").write_bytes(b"not parquet")
    r4 = pipe.run_incremental(tdir, out_dir)
    assert r4["processed_files"] == []
    assert not orphan.exists()
    assert _edge_set(compact_incremental_edges(spark, out_dir)) == _edge_set(batch)

    # mutating an already-snapshotted file breaks append-only -> refuse,
    # and KEEPS refusing (the stale snapshot persists) ...
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=5, seed=99)
    with pytest.raises(ValueError, match="append-only"):
        pipe.run_incremental(tdir, out_dir)
    with pytest.raises(ValueError, match="append-only"):
        pipe.run_incremental(tdir, out_dir)

    # ... until reset_incremental restores the documented full-rebuild
    # fallback: the whole (mutated) input reprocesses as one increment and
    # compaction matches a clean batch run (ADVICE r2)
    pipe.reset_incremental(out_dir)
    r5 = pipe.run_incremental(tdir, out_dir)
    assert sorted(r5["processed_files"]) == sorted(p.name for p in tdir.glob("*.parquet"))
    # the earlier batch dataflow persisted mentions for this same path;
    # drop it so the comparison run reads the mutated input, not the cache
    spark.catalog.clearCache()
    batch_after = pipe.dataflow(spark.read.parquet(str(tdir)))["edges"]
    assert _edge_set(compact_incremental_edges(spark, out_dir)) == _edge_set(batch_after)
    # and incremental processing works again after the reset
    write_transcripts_parquet(tdir / "part-3.parquet", n_convs=2, seed=44)
    r6 = pipe.run_incremental(tdir, out_dir)
    assert r6["processed_files"] == ["part-3.parquet"]
    shutil.rmtree(tmp_path, ignore_errors=True)


@pytest.mark.spark
@pytest.mark.parametrize("strip", [("history",), ("history", "committed_increments")])
def test_time_travel_on_legacy_manifest(spark, owl_path, tmp_path, strip):
    """A manifest written before the history field existed must still
    time-travel correctly: its committed increments are seeded under the
    recorded snapshot id, and post-upgrade commits append on top —
    without the seeding, edges_as_of silently under-read the table.

    The two-field strip is the gen-1 manifest (predates even
    committed_increments): its committed set is reconstructed from
    on-disk increment dirs, and the seeding must use THAT reconstructed
    list (ADVICE r3 — seeding only off the manifest field dropped gen-1
    increments from the log at the next commit)."""
    import json

    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    out_dir = tmp_path / "snap_edges"
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=3, seed=11)
    write_transcripts_parquet(tdir / "part-1.parquet", n_convs=3, seed=22)
    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig())
    r1 = pipe.run_incremental(tdir, out_dir)
    # simulate the legacy manifest: strip the new-generation fields
    mp = pipe.ckpt._snapshot_path("transcripts_in")
    man = json.loads(mp.read_text())
    for field in strip:
        del man[field]
    mp.write_text(json.dumps(man))

    # materialize NOW: a lazy directory read would re-list tdir after
    # part-2 lands below and silently include its edges
    v1_set = _edge_set(pipe.dataflow(spark.read.parquet(str(tdir)))["edges"])
    if strip == ("history",):
        # committed_increments survives, so the log is derivable even
        # before the next commit; gen-1 manifests only regain their log
        # at the next commit (snapshots() can't see out_dir)
        assert [h["snapshot_id"] for h in pipe.snapshots()] == [r1["snapshot_id"]]
        assert _edge_set(pipe.edges_as_of(out_dir, r1["snapshot_id"])) == v1_set

    # post-upgrade commit: as-of the new snapshot sees legacy + new
    write_transcripts_parquet(tdir / "part-2.parquet", n_convs=2, seed=33)
    r2 = pipe.run_incremental(tdir, out_dir)
    spark.catalog.clearCache()
    batch_all = pipe.dataflow(spark.read.parquet(str(tdir)))["edges"]
    assert _edge_set(pipe.edges_as_of(out_dir, r2["snapshot_id"])) == _edge_set(batch_all)
    assert _edge_set(pipe.edges_as_of(out_dir, r1["snapshot_id"])) == v1_set
    shutil.rmtree(tmp_path, ignore_errors=True)


@pytest.mark.spark
def test_edges_diff_and_expire_compact(spark, owl_path, tmp_path):
    """Changelog reads between snapshots (insert/update rows only) and
    the expire+compact maintenance job (single merged increment, log
    truncated, incremental processing continues)."""
    from lmss_entity_extractor_spark.streaming.incremental import (
        edges_diff,
        expire_and_compact,
    )

    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    out_dir = tmp_path / "snap_edges"
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=4, seed=11)
    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig())
    r1 = pipe.run_incremental(tdir, out_dir)
    write_transcripts_parquet(tdir / "part-1.parquet", n_convs=4, seed=11)  # same convs
    r2 = pipe.run_incremental(tdir, out_dir)

    def _map(df):
        return {
            (r.subj, r.pred, r.obj): (r.n_provenances, r.first_conv_id, r.first_turn_idx)
            for r in df.collect()
        }

    old = _map(pipe.edges_as_of(out_dir, r1["snapshot_id"]))
    new = _map(pipe.edges_as_of(out_dir, r2["snapshot_id"]))
    assert set(old) <= set(new)
    diff = edges_diff(pipe, out_dir, r1["snapshot_id"], r2["snapshot_id"])
    got = {(r.subj, r.pred, r.obj): r._change for r in diff.collect()}
    want = {
        k: ("insert" if k not in old else "update")
        for k, v in new.items()
        if k not in old or old[k] != v
    }
    assert got == want and "update" in set(want.values())
    with pytest.raises(ValueError, match="does not precede"):
        edges_diff(pipe, out_dir, r2["snapshot_id"], r1["snapshot_id"])

    # expire + compact: one merged increment, truncated log, same table
    batch = pipe.dataflow(spark.read.parquet(str(tdir)))["edges"]
    inc = expire_and_compact(pipe, out_dir)
    assert [h["increment"] for h in pipe.snapshots()] == [inc]
    assert [d.name for d in out_dir.glob("increment=*")] == [f"increment={inc}"]
    assert _edge_set(compact_incremental_edges(spark, out_dir)) == _edge_set(batch)
    with pytest.raises(KeyError):  # pre-compaction snapshot expired
        pipe.edges_as_of(out_dir, r1["snapshot_id"])
    assert _edge_set(pipe.edges_as_of(out_dir, r2["snapshot_id"])) == _edge_set(batch)

    # incremental processing continues on top of the compacted base
    write_transcripts_parquet(tdir / "part-2.parquet", n_convs=2, seed=33)
    r3 = pipe.run_incremental(tdir, out_dir)
    assert r3["processed_files"] == ["part-2.parquet"]
    spark.catalog.clearCache()
    batch_all = pipe.dataflow(spark.read.parquet(str(tdir)))["edges"]
    assert _edge_set(compact_incremental_edges(spark, out_dir)) == _edge_set(batch_all)
    shutil.rmtree(tmp_path, ignore_errors=True)


@pytest.mark.spark
def test_incremental_reconciles_after_checkpoint_loss(spark, owl_path, tmp_path, stream_dirs):
    """ADVICE r1: if the streaming checkpoint is lost AND new files land
    before the rerun, file->batch assignment shifts; the per-batch
    input-file registry must drop the stale batch dirs so the compacted
    table equals one clean batch run (no duplicated or orphaned edges)."""
    tdir, out_dir, ckpt = stream_dirs
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=3, seed=11)
    write_transcripts_parquet(tdir / "part-1.parquet", n_convs=3, seed=22)

    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig())
    assert incremental_edges(pipe, tdir, out_dir, ckpt) >= 1

    # checkpoint loss + growth before the rerun: assignment shifts
    shutil.rmtree(ckpt)
    write_transcripts_parquet(tdir / "part-2.parquet", n_convs=2, seed=33)
    assert incremental_edges(pipe, tdir, out_dir, ckpt) >= 1

    compacted = compact_incremental_edges(spark, out_dir)
    batch = pipe.dataflow(spark.read.parquet(str(tdir)))["edges"]
    assert _edge_set(compacted) == _edge_set(batch)
    shutil.rmtree(tmp_path, ignore_errors=True)


@pytest.mark.spark
def test_streaming_turn_rate_windows(spark, tmp_path):
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    # ts spans n_convs hours -> many 5-minute windows; all but the newest
    # finalize under the 10-minute watermark
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=6, seed=5)
    q = streaming_turn_rate(spark, tdir)
    q.awaitTermination()
    rates = spark.sql("SELECT * FROM turn_rate").collect()
    assert len(rates) > 0
    assert all(r["n_turns"] > 0 for r in rates)


@pytest.mark.spark
def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-conversation state across
    micro-batches: a conversation split over two files accumulates."""
    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import conversation_running_totals

    tdir = tmp_path / "turns"
    tdir.mkdir()
    # both files carry turns of the SAME conv_id (conv-000000), so the
    # second micro-batch must accumulate onto the first batch's state
    write_transcripts_parquet(tdir / "f1.parquet", n_convs=1, seed=1)
    write_transcripts_parquet(tdir / "f2.parquet", n_convs=1, seed=2)

    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tdir))
    )
    q = (
        conversation_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM conv_totals ORDER BY n_turns_total").collect()
    # same conv_id in both files -> two update rows, cumulative total
    assert len(rows) == 2
    assert rows[0].conv_id == rows[1].conv_id
    assert rows[1].n_turns_total == rows[0].n_turns_total + rows[1].n_turns_batch
    batch_turns = spark.read.parquet(str(tdir)).count()
    assert rows[1].n_turns_total == batch_turns


@pytest.mark.spark
def test_incremental_replay_is_idempotent(spark, owl_path, tmp_path, stream_dirs):
    """Regression: a replayed micro-batch (crash between data write and
    checkpoint commit, simulated by wiping the checkpoint) must not
    duplicate edges — per-batch overwrite into batch_id=N dirs."""
    tdir, out_dir, ckpt = stream_dirs
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=3, seed=5)
    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig())

    incremental_edges(pipe, tdir, out_dir, ckpt)
    first = _edge_set(compact_incremental_edges(spark, out_dir))

    shutil.rmtree(ckpt)  # lose the commit -> full replay of the same files
    incremental_edges(pipe, tdir, out_dir, ckpt)
    replayed = _edge_set(compact_incremental_edges(spark, out_dir))
    assert replayed == first  # append-mode would have doubled n_provenances
    shutil.rmtree(tmp_path, ignore_errors=True)


@pytest.mark.spark
def test_streaming_dedup_across_batches(spark, tmp_path):
    """Redelivered rows (same conv_id/turn_idx, within the watermark)
    are dropped across micro-batches; distinct rows all survive."""
    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import streaming_dedup

    tdir = tmp_path / "turns"
    tdir.mkdir()
    # identical file content delivered twice = an at-least-once redelivery
    write_transcripts_parquet(tdir / "f1.parquet", n_convs=2, seed=9)
    write_transcripts_parquet(tdir / "f2.parquet", n_convs=2, seed=9)

    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tdir))
    )
    q = (
        streaming_dedup(stream, ["conv_id", "turn_idx"], watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT conv_id, turn_idx FROM dedup_stream").collect()
    keys = [(r.conv_id, r.turn_idx) for r in rows]
    assert len(keys) == len(set(keys)), "duplicates survived the stream"
    # exactly the distinct key set of one file's worth of turns
    import pyarrow.parquet as pq

    one = pq.read_table(tdir / "f1.parquet").to_pydict()
    want = set(zip(one["conv_id"], one["turn_idx"]))
    assert set(keys) == want


@pytest.mark.spark
def test_stream_stream_reply_join_matches_batch(spark, tmp_path):
    """Stream-stream event-time interval join == the identical batch
    range join over the same input (processed across micro-batches, so
    cross-batch buffering is exercised)."""
    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import pair_turns_with_replies

    tdir = tmp_path / "turns"
    tdir.mkdir()
    write_transcripts_parquet(tdir / "f1.parquet", n_convs=4, seed=3)
    write_transcripts_parquet(tdir / "f2.parquet", n_convs=4, seed=4)

    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tdir))
    )
    q = (
        pair_turns_with_replies(stream, reply_window="15 minutes", watermark="10 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("replies")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.conv_id, r.user_turn_idx, r.reply_turn_idx)
        for r in spark.sql("SELECT * FROM replies").collect()
    }

    t = spark.read.parquet(str(tdir))
    u = t.filter(t.role == "user").selectExpr("conv_id AS c1", "turn_idx AS ut", "ts AS uts")
    a = t.filter(t.role == "assistant").selectExpr("conv_id AS c2", "turn_idx AS at", "ts AS ats")
    import pyspark.sql.functions as F

    want = {
        (r.c1, r.ut, r.at)
        for r in u.join(
            a,
            (F.col("c1") == F.col("c2"))
            & (F.col("ats") > F.col("uts"))
            & (F.col("ats") <= F.col("uts") + F.expr("INTERVAL 15 minutes")),
        ).collect()
    }
    assert got == want and len(got) > 0


def _write_turn_batch(path, batch_idx, base_ts_s: int, n_rows: int = 40, mtime: float | None = None):
    """One micro-batch worth of transcript turns with fully controlled
    event time: 4 conversations, alternating user/assistant roles,
    ``ts`` advancing by seconds within the batch from ``base_ts_s``
    (epoch seconds).  Keys (conv_id, turn_idx) are globally unique per
    batch so the dedup operator's state grows by exactly ``n_rows``
    inserts per batch.  ``mtime`` pins file order for the file source."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "conv_id": pa.array([f"conv-{i % 4}" for i in range(n_rows)], pa.string()),
            "turn_idx": pa.array(
                [batch_idx * 1000 + i for i in range(n_rows)], pa.int32()
            ),
            # alternate roles per CONVERSATION round (i%4 is the conv, so
            # i%2 would hand each conv a single role and starve the join)
            "role": pa.array(
                ["user" if (i // 4) % 2 == 0 else "assistant" for i in range(n_rows)],
                pa.string(),
            ),
            "text": pa.array([f"turn {batch_idx}/{i}" for i in range(n_rows)], pa.string()),
            "tool": pa.array([None] * n_rows, pa.string()),
            "ts": pa.array(
                np.array([(base_ts_s + i) * 1_000_000 for i in range(n_rows)], dtype="datetime64[us]")
            ),
        }
    )
    pq.write_table(tbl, path)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def _state_totals(query):
    """(numRowsTotal, numRowsRemoved) per micro-batch from the query's
    progress log, skipping batches with no state operator update."""
    out = []
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            out.append((ops[0]["numRowsTotal"], ops[0].get("numRowsRemoved", 0)))
    return out


@pytest.mark.spark
def test_streaming_dedup_state_is_bounded(spark, tmp_path):
    """VERDICT r3 #5: L26 claims watermark-BOUNDED state — drive 10
    micro-batches whose event time advances one hour per batch (far past
    the 10-minute watermark horizon) and assert the state store
    plateaus at ~a batch or two of keys instead of accumulating all 400:
    eviction must actually fire, and the final total must not grow with
    batch count."""
    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import streaming_dedup

    tdir = tmp_path / "turns"
    tdir.mkdir()
    n_batches, rows = 10, 40
    base = 1_700_000_000
    for b in range(n_batches):
        _write_turn_batch(
            tdir / f"b{b:02d}.parquet", b, base + b * 3600, rows, mtime=1_000_000 + b
        )
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tdir))
    )
    q = (
        streaming_dedup(stream, ["conv_id", "turn_idx"], watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_bounded")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # no keys repeat, so every row survives the dedup itself
    assert spark.sql("SELECT count(*) FROM dedup_bounded").collect()[0][0] == n_batches * rows
    totals = _state_totals(q)
    assert len(totals) >= n_batches - 1, totals
    # eviction fired...
    assert sum(rm for _t, rm in totals) > 0, totals
    # ...and state never holds more than ~2 batches of keys (watermark
    # lags one batch), far below the 400 an unbounded operator would pin
    assert max(t for t, _rm in totals) <= 2 * rows, totals
    assert totals[-1][0] <= 2 * rows, totals


@pytest.mark.spark
def test_stream_stream_join_state_is_bounded(spark, tmp_path):
    """VERDICT r3 #5 for L29: both sides of the event-time interval join
    are watermarked, so buffered rows age out once the opposite side's
    watermark passes their join window — 10 one-hour-apart batches with
    a 10-minute watermark must plateau at ~2 batches of buffered rows,
    while every within-batch (user, reply<=5min) pair is still emitted."""
    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import pair_turns_with_replies

    tdir = tmp_path / "turns"
    tdir.mkdir()
    n_batches, rows = 10, 40
    base = 1_700_000_000
    for b in range(n_batches):
        _write_turn_batch(
            tdir / f"b{b:02d}.parquet", b, base + b * 3600, rows, mtime=1_000_000 + b
        )
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tdir))
    )
    q = (
        pair_turns_with_replies(stream, reply_window="5 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("replies_bounded")
        .option("checkpointLocation", str(tmp_path / "ckpt_join"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # each user turn at +i seconds pairs with the same conversation's
    # assistant turns in (ts, ts+5min] inside its own batch (batches are
    # an hour apart, so no cross-batch pairs)
    n_pairs = spark.sql("SELECT count(*) FROM replies_bounded").collect()[0][0]
    assert n_pairs > 0
    t = spark.read.parquet(str(tdir))
    import pyspark.sql.functions as F

    u = t.filter("role = 'user'").selectExpr("conv_id c1", "turn_idx ut", "ts uts")
    a = t.filter("role = 'assistant'").selectExpr("conv_id c2", "turn_idx at", "ts ats")
    want = (
        u.join(
            a,
            (F.col("c1") == F.col("c2"))
            & (F.col("ats") > F.col("uts"))
            & (F.col("ats") <= F.col("uts") + F.expr("INTERVAL 5 minutes")),
        ).count()
    )
    assert n_pairs == want
    totals = _state_totals(q)
    assert sum(rm for _t, rm in totals) > 0, totals
    # join state buffers both sides: <= ~2 batches of rows, not 10
    assert max(t for t, _rm in totals) <= 2 * rows, totals
    assert totals[-1][0] <= 2 * rows, totals


@pytest.mark.spark
def test_streaming_session_windows_merge_and_finalize(spark, tmp_path):
    """L85's streaming twin (stateful.session_counts): five micro-batches
    over 4 conversations — batches 0 and 1 land 10 minutes apart (inside
    the 30-minute gap, so the engine must MERGE batch 1's turns into
    batch 0's still-open session in the state store), batches 2-4 land
    hours apart (own sessions).  A trailing punctuation batch advances
    the watermark so every real session finalizes; the punctuation's own
    sessions stay open and must NOT emit — the append-mode contract."""
    from lmss_entity_extractor_spark import schemas
    from lmss_entity_extractor_spark.streaming.stateful import session_counts

    tdir = tmp_path / "turns"
    tdir.mkdir()
    base = 1_700_000_000
    rows = 40  # 10 per conversation per batch
    starts = [0, 600, 8 * 3600, 16 * 3600, 24 * 3600]
    for b, off in enumerate(starts):
        _write_turn_batch(
            tdir / f"b{b:02d}.parquet", b, base + off, rows, mtime=1_000_000 + b
        )
    # punctuation far past every session end: flushes the real sessions
    _write_turn_batch(
        tdir / "zz_flush.parquet", 9, base + 100 * 3600, 4, mtime=1_000_100
    )
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tdir))
    )
    q = (
        session_counts(stream, gap="30 minutes", watermark="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["session_start"].timestamp(), r["n_turns"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    expected = set()
    for c in range(4):
        # batches 0+1 merged: 20 turns, starting at batch 0's first turn
        expected.add((f"conv-{c}", float(base + c), 20))
        for off in starts[2:]:
            expected.add((f"conv-{c}", float(base + off + c), 10))
    assert got == expected  # punctuation sessions absent: never finalized


@pytest.mark.spark
def test_delete_rows_gdpr(spark, owl_path, tmp_path):
    """Keyed deletion over the incremental edge table (delete_rows):
    every edge first seen in the target conversation vanishes, every
    other edge survives byte-identically, pre-deletion snapshots become
    unreachable (time travel must not resurrect deleted rows), and
    incremental processing continues on the rewritten base."""
    from pyspark.sql import functions as F

    from lmss_entity_extractor_spark.streaming.incremental import delete_rows

    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    out_dir = tmp_path / "snap_edges"
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=4, seed=11)
    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig())
    r1 = pipe.run_incremental(tdir, out_dir)
    write_transcripts_parquet(tdir / "part-1.parquet", n_convs=2, seed=33)
    pipe.run_incremental(tdir, out_dir)

    before = compact_incremental_edges(spark, out_dir)
    victim = before.select("first_conv_id").distinct().orderBy("first_conv_id").limit(1).collect()[0][0]
    keep_expected = _edge_set(before.filter(F.col("first_conv_id") != victim))
    assert keep_expected and len(keep_expected) < len(_edge_set(before))

    with pytest.raises(ValueError, match="nothing to delete"):
        delete_rows(pipe, tmp_path / "empty", "1=1", snapshot_name="missing")

    inc = delete_rows(pipe, out_dir, f"first_conv_id = '{victim}'")
    # one rewritten increment vouched; old dirs reaped
    assert [d.name for d in out_dir.glob("increment=*")] == [f"increment={inc}"]
    after = compact_incremental_edges(spark, out_dir)
    assert _edge_set(after) == keep_expected
    assert after.filter(F.col("first_conv_id") == victim).count() == 0
    # pre-deletion snapshots expired -> no resurrection via time travel
    with pytest.raises(KeyError):
        pipe.edges_as_of(out_dir, r1["snapshot_id"])

    # incremental processing continues over the rewritten base
    write_transcripts_parquet(tdir / "part-2.parquet", n_convs=2, seed=55)
    r3 = pipe.run_incremental(tdir, out_dir)
    assert r3["processed_files"] == ["part-2.parquet"]
    shutil.rmtree(tmp_path, ignore_errors=True)


@pytest.mark.spark
def test_incremental_view_maintenance(spark, owl_path, tmp_path):
    """IVM (maintain_pred_view): the per-predicate aggregate view folded
    forward with ONLY the changelog contribution must equal the view
    recomputed from the v2 table — exactly, not approximately (integer
    counts).  The v1->v2 delta includes genuine updates (same convs
    redelivered -> provenance growth), so both the insert and the
    update arm of the fold are exercised."""
    from lmss_entity_extractor_spark.streaming.incremental import (
        maintain_pred_view,
        pred_view,
    )

    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    out_dir = tmp_path / "snap_edges"
    write_transcripts_parquet(tdir / "part-0.parquet", n_convs=4, seed=11)
    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig())
    r1 = pipe.run_incremental(tdir, out_dir)
    write_transcripts_parquet(tdir / "part-1.parquet", n_convs=4, seed=11)  # same convs
    write_transcripts_parquet(tdir / "part-2.parquet", n_convs=2, seed=77)  # new convs
    r2 = pipe.run_incremental(tdir, out_dir)

    v1 = pred_view(pipe.edges_as_of(out_dir, r1["snapshot_id"]))
    maintained = maintain_pred_view(
        pipe, out_dir, v1, r1["snapshot_id"], r2["snapshot_id"]
    )
    recomputed = pred_view(pipe.edges_as_of(out_dir, r2["snapshot_id"]))

    def _m(df):
        return {r["pred"]: (r["n_edges"], r["total_prov"]) for r in df.collect()}

    got, want = _m(maintained), _m(recomputed)
    assert got == want and want
    # the fixture genuinely exercised the update arm (provenance grew)
    v1m = _m(v1)
    assert any(
        want[p][1] > v1m.get(p, (0, 0))[1] and want[p][0] == v1m.get(p, (0, 0))[0]
        for p in want
        if p in v1m
    ) or any(want[p][1] > v1m[p][1] for p in v1m)
    shutil.rmtree(tmp_path, ignore_errors=True)
