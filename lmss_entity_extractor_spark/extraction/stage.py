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


def detect_mentions(transcripts: DataFrame, bc_artifacts, with_vector: bool = False) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> mentions."""
    out_schema = schemas.MENTIONS_WITH_VECTOR if with_vector else schemas.MENTIONS

    def run(batches):
        artifacts = bc_artifacts.value
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                for seq, m in enumerate(extract_mentions_from_turn(text or "", artifacts)):
                    rows.append(
                        (
                            conv_id,
                            int(turn_idx),
                            f"mention://{conv_id}/{turn_idx}/{m['start']}-{m['end']}",
                            m["text"],
                            m["start"],
                            m["end"],
                            m["mtype"],
                            m["source"],
                            m["context"],
                            m["confidence"],
                        )
                    )
            out = pd.DataFrame(rows, columns=_MENTION_COLS)
            if with_vector:
                out["vector"] = list(map(list, encode_batch(out["text"]))) if len(rows) else []
            yield out

    # Empty-input guard (P4, /root/reference/app/entity_extraction.py:160-162)
    # pushed into the scan as a real predicate instead of a UDF branch.
    return (
        transcripts.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("conv_id", "turn_idx", "text")
        .mapInPandas(run, schema=out_schema)
    )
