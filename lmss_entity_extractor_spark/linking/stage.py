"""Spark linking stage: mentions -> links (operators J1/J2/J5/P7/P12).

The link result is a pure function of the mention surface form, so the
default strategy scores each DISTINCT surface exactly once cluster-wide
(mention text is Zipf-distributed — the distinct set is orders of
magnitude smaller than the mention stream) and broadcast-joins the
per-surface results back onto the mention stream.  Without dedup every
executor re-scores the same hot surfaces: per-worker memo caches don't
share across processes.

The scoring runs inside ``mapInPandas`` with a FLAT output schema — not
a struct-returning scalar UDF: Catalyst's projection collapsing
duplicates a struct-valued Python UDF once per extracted field (plus the
null filter), silently multiplying the Python work ~5x.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import widen_small_input
from .scorer import Linker, LinkerConfig

# executor-local linker registry: (broadcast_id, config) -> Linker
_LINKERS: dict = {}

_SURFACE_LINKS_SCHEMA = (
    "text string, branch string, label string, score float, iri string"
)


def _get_linker(bc_artifacts, config: LinkerConfig) -> Linker:
    # key by the artifacts' build_token — a uuid stamped at build time that
    # survives pickling to executors.  Object identity is wrong twice over:
    # pyspark deserializes a fresh Broadcast handle per task (handle identity
    # would rebuild the Linker every task), and id(value) can collide when a
    # replaced broadcast's value is GC'd and CPython recycles the address —
    # which would silently score against a stale ontology.  (pyspark 4.1.2
    # Broadcast exposes no stable public id; `.id` raises AttributeError.)
    artifacts = bc_artifacts.value
    key = (artifacts.build_token, config)
    linker = _LINKERS.get(key)
    if linker is None:
        linker = Linker(artifacts, config)
        _LINKERS[key] = linker
    return linker


def link_surfaces(surfaces: DataFrame, bc_artifacts, config: LinkerConfig) -> DataFrame:
    """(text) -> (text, branch, label, score, iri), unmatched rows
    dropped (P7); branch backfilled to 'Unknown' (P12) by the scorer."""

    def run(batches):
        linker = _get_linker(bc_artifacts, config)
        for pdf in batches:
            texts = pdf["text"].tolist()
            results = linker.link_batch(texts)
            out = {"text": [], "branch": [], "label": [], "score": [], "iri": []}
            for t, r in zip(texts, results):
                if r["iri"] is None:
                    continue
                out["text"].append(t)
                out["branch"].append(r["branch"] if r["branch"] is not None else "Unknown")
                out["label"].append(r["label"])
                out["score"].append(r["score"])
                out["iri"].append(r["iri"])
            yield pd.DataFrame(out)

    return surfaces.select("text").mapInPandas(run, schema=_SURFACE_LINKS_SCHEMA)


def extract_and_link(transcripts: DataFrame, bc_artifacts, config: LinkerConfig = LinkerConfig()) -> DataFrame:
    """Fused single-pass stage: transcripts -> links.

    Mention detection and linking run in ONE ``mapInPandas`` — no
    intermediate mention materialization, no distinct shuffle, no join.
    Each worker memoizes link results per surface form, so the fuzzy
    scoring cost is O(unique surfaces) per worker (replicated across
    workers).  Choose this when surfaces repeat heavily and worker count
    is moderate; choose the staged ``detect_mentions`` +
    ``link_mentions`` path (global surface dedup + broadcast join) when
    the distinct-surface set is large or stages are materialized for
    checkpoint/resume anyway.
    """
    from .. import schemas
    from ..extraction.turn import extract_mentions_from_turn

    out_schema = (
        "conv_id string, turn_idx int, start int, end int, "
        "text string, branch string, label string, score float, iri string"
    )

    def run(batches):
        linker = _get_linker(bc_artifacts, config)
        artifacts = bc_artifacts.value
        cols_names = [
            "conv_id", "turn_idx", "start", "end",
            "text", "branch", "label", "score", "iri",
        ]
        for pdf in batches:
            cols = {c: [] for c in cols_names}
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"].tolist(), pdf["turn_idx"].tolist(), pdf["text"].tolist()
            ):
                for m in extract_mentions_from_turn(text or "", artifacts, with_context=False):
                    r = linker.link_text(m["text"])
                    if r["iri"] is None:
                        continue
                    cols["conv_id"].append(conv_id)
                    cols["turn_idx"].append(turn_idx)
                    cols["start"].append(m["start"])
                    cols["end"].append(m["end"])
                    cols["text"].append(m["text"])
                    cols["branch"].append(r["branch"] if r["branch"] is not None else "Unknown")
                    cols["label"].append(r["label"])
                    cols["score"].append(r["score"])
                    cols["iri"].append(r["iri"])
            yield pd.DataFrame(cols)

    filtered = transcripts.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "conv_id", "turn_idx", "text"
    )
    filtered = widen_small_input(filtered, ["conv_id"], factor=8)
    fanned = filtered.mapInPandas(run, schema=out_schema)
    # mention_id derived JVM-side (same rationale as detect_mentions)
    from ..graph.triples import mention_uri_expr

    mention_id = mention_uri_expr()
    return fanned.withColumn("mention_id", mention_id).select(
        "conv_id", "turn_idx", "mention_id", "start", "end",
        "text", "branch", "label", "score", "iri",
    )


def link_mentions(
    mentions: DataFrame,
    bc_artifacts,
    config: LinkerConfig = LinkerConfig(),
    broadcast_surfaces: bool = True,
) -> DataFrame:
    """mentions -> links (unmatched mentions are dropped, P7).

    ``broadcast_surfaces=True`` (default) broadcasts the scored
    distinct-surface table — right whenever the distinct-surface set fits
    an executor (Zipf-distributed mention text keeps it orders of
    magnitude below the mention count).  At extreme surface cardinality
    (e.g. 10^8+ uniques over a 100 TB corpus) pass ``False``: the join
    becomes a plain equi-join on ``text`` that AQE plans from actual
    sizes (shuffle hash / sort-merge, with skew splitting) instead of
    forcing an executor-memory-sized broadcast build."""
    # AQE coalesces the (tiny) distinct-surface shuffle down to one
    # partition, which would serialize the scoring UDF onto one core —
    # spread it back across the cluster before scoring.
    par = mentions.sparkSession.sparkContext.defaultParallelism
    surface_links = link_surfaces(
        mentions.select("text").distinct().repartition(par), bc_artifacts, config
    )
    join_side = F.broadcast(surface_links) if broadcast_surfaces else surface_links
    linked = mentions.join(join_side, "text")
    return linked.select(
        "conv_id",
        "turn_idx",
        "mention_id",
        "start",
        "end",
        "text",
        "branch",
        "label",
        F.col("score").cast("float").alias("score"),
        "iri",
    )
