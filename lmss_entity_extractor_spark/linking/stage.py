"""Spark linking stage: mentions -> links (operators J1/J2/J5/P7/P12).

One scalar pandas UDF carrying the vectorized linker; each executor
holds a single Linker instance per (broadcast, config) pair, so the
per-surface-form memo cache persists across Arrow batches for the
lifetime of the executor — the reference's O(mentions x classes) scan
collapses to ~O(unique surface forms x classes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import schemas
from .scorer import Linker, LinkerConfig

# executor-local linker registry: (broadcast_id, config) -> Linker
_LINKERS: dict = {}


def _get_linker(bc_artifacts, config: LinkerConfig) -> Linker:
    key = (id(bc_artifacts), config)
    linker = _LINKERS.get(key)
    if linker is None:
        linker = Linker(bc_artifacts.value, config)
        _LINKERS[key] = linker
    return linker


def link_mentions(mentions: DataFrame, bc_artifacts, config: LinkerConfig = LinkerConfig()) -> DataFrame:
    """mentions -> links (unmatched mentions are dropped, P7)."""

    @pandas_udf(schemas.LINK_RESULT)
    def link_udf(texts: pd.Series) -> pd.DataFrame:
        linker = _get_linker(bc_artifacts, config)
        results = linker.link_batch(texts)
        return pd.DataFrame(results, columns=["iri", "label", "score", "branch"])

    linked = mentions.withColumn("_link", link_udf(F.col("text")))
    return (
        linked.filter(F.col("_link.iri").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            "mention_id",
            "start",
            "end",
            "text",
            F.coalesce(F.col("_link.branch"), F.lit("Unknown")).alias("branch"),
            F.col("_link.label").alias("label"),
            F.col("_link.score").cast("float").alias("score"),
            F.col("_link.iri").alias("iri"),
        )
    )
