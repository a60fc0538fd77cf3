"""Spark extraction stage: transcripts -> mentions (operator U1).

The reference runs one spaCy pipeline call per document
(/root/reference/app/entity_extraction.py:157-204).  Here the whole
candidate-generate + merge lifecycle runs inside ``mapInPandas``: each
Arrow batch of turns fans out to mention rows with zero driver
involvement and no per-row Python at the DataFrame level.  The ontology
dictionary arrives via a Spark broadcast; the compiled surface regex is
built once per executor (lazily, on first batch).

Plan shape: narrow — scan -> filter(non-blank text, P4) -> mapInPandas.
No shuffle is introduced; mention rows inherit the input partitioning
(bucketed by conv_id at the source), which later stages reuse.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from ..encoder import encode_batch
from .turn import extract_mentions_from_turn

_MENTION_COLS = [f.name for f in schemas.MENTIONS.fields]
_CORE_COLS = [c for c in _MENTION_COLS if c not in ("context", "source", "confidence")]


def detect_mentions(
    transcripts: DataFrame,
    bc_artifacts,
    with_vector: bool = False,
    with_context: bool = True,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> mentions.

    ``with_context=False`` skips the context/source/confidence columns —
    the fused linking dataflow doesn't consume them, and the ±100-char
    context strings dominate the Arrow transfer bytes of the fan-out.
    """
    if with_context:
        out_schema = schemas.MENTIONS_WITH_VECTOR if with_vector else schemas.MENTIONS
        cols_list = _MENTION_COLS
    else:
        from pyspark.sql.types import StructType

        out_schema = StructType([f for f in schemas.MENTIONS.fields if f.name in _CORE_COLS])
        cols_list = _CORE_COLS

    def run(batches):
        artifacts = bc_artifacts.value
        for pdf in batches:
            # columnar accumulation: building one list per output column is
            # several times faster than a list-of-tuples DataFrame for the
            # multi-million-row mention fan-out
            cols: dict[str, list] = {c: [] for c in cols_list}
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"].tolist(), pdf["turn_idx"].tolist(), pdf["text"].tolist()
            ):
                for m in extract_mentions_from_turn(
                    text or "", artifacts, with_context=with_context
                ):
                    cols["conv_id"].append(conv_id)
                    cols["turn_idx"].append(turn_idx)
                    cols["mention_id"].append(
                        f"mention://{conv_id}/{turn_idx}/{m['start']}-{m['end']}"
                    )
                    cols["text"].append(m["text"])
                    cols["start"].append(m["start"])
                    cols["end"].append(m["end"])
                    cols["mtype"].append(m["mtype"])
                    if with_context:
                        cols["source"].append(m["source"])
                        cols["context"].append(m["context"])
                        cols["confidence"].append(m["confidence"])
            out = pd.DataFrame(cols)
            if with_vector:
                out["vector"] = (
                    list(map(list, encode_batch(cols["text"]))) if cols["text"] else []
                )
            yield out

    # Empty-input guard (P4, /root/reference/app/entity_extraction.py:160-162)
    # pushed into the scan as a real predicate instead of a UDF branch.
    filtered = transcripts.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "conv_id", "turn_idx", "text"
    )
    # The UDF stages inherit the scan's split count; a small input (one
    # parquet file) would serialize the whole CPU-bound extraction onto
    # one core.  Widen to the session's parallelism when the input is
    # narrower — on a real cluster reading many splits this is a no-op.
    target = transcripts.sparkSession.sparkContext.defaultParallelism * 4
    if filtered.rdd.getNumPartitions() < target:
        filtered = filtered.repartition(target, "conv_id")
    return filtered.mapInPandas(run, schema=out_schema)
