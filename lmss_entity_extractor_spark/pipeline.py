"""End-to-end KG construction pipeline (SURVEY.md §3.1 Spark form).

  transcripts ──filter P4──▶ detect_mentions (Arrow UDF, narrow)
              ──link (Arrow UDF + broadcast matrix, narrow)
              ──emit triples (column ops, narrow)
              ──salted canonicalize (the pipeline's one keyed shuffle)
              ──▶ edges / nodes, partitioned + sorted on write

Stage boundaries materialize to parquet tables under a warehouse
directory with checkpoint manifests (checkpoints.py): a rerun skips
every stage whose (input, config, code) key is unchanged, and output
writes are deterministic — fixed partition count, hash partitioning on
stable keys, ``sortWithinPartitions`` stable ordering (T5) — so resumed
runs reproduce byte-identical row sets at any parallelism level.

The ontology build stage (SURVEY.md §3.2) additionally persists the
reference's "catalog" as real tables: lmss_index, ontology_closure,
top_classes, ontology_embeddings.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas
from .checkpoints import CheckpointManager, config_hash, file_fingerprint, sha256_file
from .extraction.stage import detect_mentions
from .graph.canonicalize import build_nodes, canonicalize_triples
from .graph.triples import emit_triples
from .linking.scorer import LinkerConfig
from .linking.stage import link_mentions
from .ontology.artifacts import OntologyArtifacts, build_artifacts
from .ontology.owl import parse_owl_classes


@dataclass(frozen=True)
class PipelineConfig:
    similarity_threshold: float = 0.7          # API profile (app/main.py:106-108)
    high_confidence_threshold: float = 0.9
    salt_buckets: int = 16
    output_partitions: int = 32                # fixed for deterministic layout
    materialize_intermediate: bool = True      # write mentions/links stages
    broadcast_surfaces: bool = True            # False: shuffle-join the scored
                                               # surfaces (10^8+-unique corpora)
    encoder_spec: str = "hashed-v1"            # registered text encoder (F8);
                                               # part of the config hash, so a
                                               # model swap invalidates resume

    def linker(self) -> LinkerConfig:
        return LinkerConfig(self.similarity_threshold, self.high_confidence_threshold)


class KGPipeline:
    STAGES = ("mentions", "links", "edges", "nodes")

    def __init__(
        self,
        spark: SparkSession,
        owl_path: str | Path,
        warehouse: str | Path,
        config: PipelineConfig = PipelineConfig(),
    ):
        self.spark = spark
        self.owl_path = Path(owl_path)
        self.warehouse = Path(warehouse)
        self.config = config
        self.ckpt = CheckpointManager(self.warehouse)
        self.ontology_hash = sha256_file(self.owl_path)
        self._cfg_hash = config_hash({**asdict(config), "ontology": self.ontology_hash})

        self.index_rows = parse_owl_classes(self.owl_path)
        self.artifacts: OntologyArtifacts = build_artifacts(
            self.index_rows, encoder_spec=config.encoder_spec
        )
        self.bc_artifacts = spark.sparkContext.broadcast(self.artifacts)
        self.metrics: dict = {}

    # ------------------------------------------------------------------ util

    def _write(self, df: DataFrame, stage: str, part_cols: list[str], sort_cols: list[str]) -> None:
        n = self.config.output_partitions
        out = str(self.ckpt.output_path(stage))
        (
            df.repartition(n, *part_cols)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .parquet(out)
        )

    def _read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(str(self.ckpt.output_path(stage)))

    def _stage(self, stage: str, input_fp: str, build, part_cols, sort_cols) -> DataFrame:
        """Run one checkpointed stage: skip when current, else build+write
        (+ per-partition lineage, the skew/audit signal)."""
        from .lineage import observe_stage, write_stage_lineage

        if input_fp != "<volatile>" and self.ckpt.is_current(stage, input_fp, self._cfg_hash):
            self.metrics[f"{stage}_skipped"] = True
            return self._read(stage)
        # observe() aggregates ride the write action for free (K4/A4)
        df, collect_obs = observe_stage(build(), stage, key_col=part_cols[0])
        self._write(df, stage, part_cols, sort_cols)
        self.metrics[f"{stage}_observed"] = collect_obs()
        materialized = self._read(stage)
        lineage = write_stage_lineage(
            materialized,
            self.warehouse,
            stage,
            sort_cols,
            meta={"input_fingerprint": input_fp, "config_hash": self._cfg_hash},
        )
        rows = lineage["rows"]
        self.metrics[f"{stage}_rows"] = rows
        self.metrics[f"{stage}_lineage"] = lineage
        self.ckpt.record(stage, input_fp, self._cfg_hash, rows=rows, extra={"lineage": lineage})
        return materialized

    # --------------------------------------------------------------- ontology

    def write_ontology_tables(self) -> None:
        """Materialize the build-stage catalog (SURVEY.md §3.2): the
        reference's JSON/Turtle artifacts as real tables."""
        fp = self.ontology_hash
        if self.ckpt.is_current("ontology", fp, self._cfg_hash):
            return
        spark = self.spark
        arts = self.artifacts
        spark.createDataFrame(self.index_rows, schema=schemas.LMSS_INDEX).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(self.ckpt.output_path("ontology") / "lmss_index"))
        spark.createDataFrame(arts.closure, schema=schemas.ONTOLOGY_CLOSURE).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(self.ckpt.output_path("ontology") / "ontology_closure"))
        spark.createDataFrame(arts.top_classes, schema=schemas.TOP_CLASSES).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(self.ckpt.output_path("ontology") / "top_classes"))
        spark.createDataFrame(arts.field_embeddings, schema=schemas.ONTOLOGY_EMBEDDINGS).coalesce(
            1
        ).write.mode("overwrite").parquet(str(self.ckpt.output_path("ontology") / "ontology_embeddings"))
        # top-level _SUCCESS marker for the manifest check
        (self.ckpt.output_path("ontology") / "_SUCCESS").write_text("")
        self.ckpt.record("ontology", fp, self._cfg_hash, extra={"classes": arts.size})

    def edges_from_links(self, links: DataFrame) -> DataFrame:
        """The canonical links -> edges composition (emission + salted
        canonicalization) — the single definition used by run(),
        dataflow(), streaming, and the benchmark."""
        return canonicalize_triples(emit_triples(links), self.config.salt_buckets)

    # ------------------------------------------------------------------- run

    def run(self, transcripts: DataFrame, input_fingerprint: str | None = None) -> dict[str, DataFrame]:
        """Run all stages over a transcripts DataFrame.

        ``input_fingerprint`` keys the checkpoint manifests; pass a stable
        fingerprint of the input table (e.g. ``file_fingerprint(path)``)
        to enable resume. Defaults to "<volatile>", which disables
        stage-skipping for ad-hoc DataFrames.
        """
        fp = input_fingerprint or "<volatile>"
        cfg = self.config
        self.write_ontology_tables()

        if cfg.materialize_intermediate:
            mentions = self._stage(
                "mentions",
                fp,
                lambda: detect_mentions(transcripts, self.bc_artifacts),
                ["conv_id"],
                ["conv_id", "turn_idx", "start"],
            )
            links = self._stage(
                "links",
                fp,
                lambda: link_mentions(mentions, self.bc_artifacts, cfg.linker(), cfg.broadcast_surfaces),
                ["conv_id"],
                ["conv_id", "turn_idx", "start"],
            )
        else:
            from pyspark import StorageLevel

            mentions = detect_mentions(transcripts, self.bc_artifacts)
            # two downstream consumers (edges stage + build_nodes) — an
            # unpersisted plan would re-run the UDF-heavy extract+link
            # subtree end-to-end for each
            links = link_mentions(mentions, self.bc_artifacts, cfg.linker(), cfg.broadcast_surfaces).persist(
                StorageLevel.MEMORY_AND_DISK
            )

        edges = self._stage(
            "edges",
            fp,
            lambda: self.edges_from_links(links),
            ["subj"],
            ["subj", "pred", "obj"],
        )
        nodes = self._stage(
            "nodes",
            fp,
            lambda: build_nodes(links, edges, self.bc_artifacts),
            ["node_id"],
            ["node_id"],
        )
        if not cfg.materialize_intermediate:
            # both consumers (edges + nodes) have materialized; release
            # the cache instead of leaking one persisted relation per
            # run() call for the session's lifetime
            links.unpersist()
        return {"mentions": mentions, "links": links, "edges": edges, "nodes": nodes}

    def dataflow(self, transcripts: DataFrame, strategy: str = "staged") -> dict[str, DataFrame]:
        """The full lazy dataflow (no materialization, no checkpoints):
        transcripts -> links -> canonical edges.

        ``strategy="staged"`` (default): extraction stage (persisted) +
        global surface-dedup broadcast-join linking — each distinct
        surface form is fuzzy-scored exactly once cluster-wide.  Measured
        ~2x faster than fused at realistic surface cardinalities and the
        plan shape the checkpointed run() materializes.
        ``strategy="fused"``: one mapInPandas does extraction + linking
        with per-worker surface memoization (no intermediate persist or
        shuffle) — only wins when the distinct-surface set is tiny
        relative to per-worker work, since every worker re-scores the
        surfaces it encounters.

        The staged strategy's returned ``mentions`` frame is persisted
        (two lazy consumers); the CALLER owns its lifetime — call
        ``result["mentions"].unpersist()`` once done to release the
        executor cache (run() manages this itself).
        """
        from .linking.stage import extract_and_link

        cfg = self.config
        if strategy == "fused":
            links = extract_and_link(transcripts, self.bc_artifacts, cfg.linker())
            edges = self.edges_from_links(links)
            return {"links": links, "edges": edges}

        from pyspark import StorageLevel

        # persist: the surface-dedup link strategy consumes mentions twice
        # (distinct side + join probe side); without persistence the
        # UDF-heavy extraction subtree would recompute.  The checkpointed
        # run() achieves the same by materializing the stage to parquet.
        mentions = detect_mentions(
            transcripts, self.bc_artifacts, with_context=False
        ).persist(StorageLevel.MEMORY_AND_DISK)
        links = link_mentions(mentions, self.bc_artifacts, cfg.linker(), cfg.broadcast_surfaces)
        edges = self.edges_from_links(links)
        return {"mentions": mentions, "links": links, "edges": edges}

    def run_path(self, transcripts_path: str | Path) -> dict[str, DataFrame]:
        df = self.spark.read.parquet(str(transcripts_path))
        return self.run(df, input_fingerprint=file_fingerprint(transcripts_path))

    def run_incremental(self, transcripts_dir: str | Path, out_dir: str | Path) -> dict:
        """Snapshot-range twin of ``run_path`` for an append-only input
        dir: processes exactly the files added since the last recorded
        input snapshot (checkpoints.input_snapshot — the Iceberg-snapshot
        shape without jars) into an idempotent increment table under
        ``out_dir``; compact with
        streaming.incremental.compact_incremental_edges."""
        from .streaming.incremental import incremental_edges_snapshot

        return incremental_edges_snapshot(self, transcripts_dir, out_dir)

    def reset_incremental(self, out_dir: str | Path) -> None:
        """Recover from a broken append-only contract: drop the input
        snapshot and all increments so the next ``run_incremental``
        reprocesses the full input as one increment."""
        from .streaming.incremental import reset_incremental

        reset_incremental(self, out_dir)

    def snapshots(self) -> list[dict]:
        """Committed (snapshot_id, increment) log in commit order — the
        Iceberg ``snapshots()`` shape for ``run_incremental`` outputs."""
        from .streaming.incremental import snapshots

        return snapshots(self)

    def edges_as_of(self, out_dir: str | Path, snapshot_id: str) -> DataFrame:
        """Time-travel read (Iceberg ``VERSION AS OF`` shape): compacted
        canonical edges as of a recorded input snapshot; increments
        committed later contribute zero scanned bytes."""
        from .streaming.incremental import edges_as_of

        return edges_as_of(self, out_dir, snapshot_id)

    def write_metrics(self) -> None:
        (self.warehouse / "metrics.json").write_text(json.dumps(self.metrics, indent=2, default=str))
