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
from ..session import widen_small_input
from ..encoder import get_encoder
from .turn import extract_mentions_from_turns

_MENTION_COLS = [f.name for f in schemas.MENTIONS.fields]
_CORE_COLS = [c for c in _MENTION_COLS if c not in ("context", "source", "confidence")]
# fixed candidate-type vocabulary: transferred from the UDF as a 1-byte
# code and decoded JVM-side (a ~10-byte string per row otherwise)
_MTYPES = ["NER_LMSS", "NOUN_PHRASE", "KEYWORD"]
_MTYPE_CODE = {t: i for i, t in enumerate(_MTYPES)}


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
    import os

    from pyspark.sql.types import StructType

    # A/B lever resolved DRIVER-side and captured into the UDF closure:
    # reading the env var inside the generator would consult the Python
    # WORKER's environment, which silently differs from the driver shell
    # on any non-local deployment (the A/B would no-op without error)
    per_turn_kernel = os.environ.get("SPARK_GRAFT_PER_TURN_EXTRACT") == "1"

    base = schemas.MENTIONS_WITH_VECTOR if with_vector else schemas.MENTIONS
    if with_context:
        full_schema = base
        cols_list = _MENTION_COLS
    else:
        keep = set(_CORE_COLS) | ({"vector"} if with_vector else set())
        full_schema = StructType([f for f in base.fields if f.name in keep])
        cols_list = _CORE_COLS
    # mention_id is derived JVM-side after the UDF: building the ~45-byte
    # URI per row in Python and shipping it through Arrow was the largest
    # transfer column of the fan-out
    # mention_id/source/confidence are all derivable JVM-side; only
    # context (a Python text slice) must cross the Arrow boundary
    derived = ("mention_id", "source", "confidence")
    udf_cols = [c for c in cols_list if c not in derived]
    from pyspark.sql.types import ByteType, StructField

    out_schema = StructType(
        [
            StructField("mtype", ByteType()) if f.name == "mtype" else f
            for f in full_schema.fields
            if f.name not in derived
        ]
    )

    def run(batches):
        artifacts = bc_artifacts.value
        encoder = get_encoder(artifacts.encoder_spec) if with_vector else None
        for pdf in batches:
            # columnar accumulation: building one list per output column is
            # several times faster than a list-of-tuples DataFrame for the
            # multi-million-row mention fan-out
            cols: dict[str, list] = {c: [] for c in udf_cols}
            texts = pdf["text"].tolist()
            # cross-turn batched extraction: the fuzzy channel's numpy
            # work amortizes over cache-sized chunks of the Arrow batch
            # (1.4x kernel on one core; bit-identical — tests pin it).
            # per_turn_kernel (driver-side env capture above) forces the
            # per-turn kernel: A/B lever for saturated-host comparisons.
            if per_turn_kernel:
                from .turn import extract_mentions_from_turn

                mention_lists = [
                    extract_mentions_from_turn(t or "", artifacts, with_context=with_context)
                    for t in texts
                ]
            else:
                mention_lists = extract_mentions_from_turns(
                    [t or "" for t in texts], artifacts, with_context=with_context
                )
            for conv_id, turn_idx, ms in zip(
                pdf["conv_id"].tolist(), pdf["turn_idx"].tolist(), mention_lists
            ):
                for m in ms:
                    cols["conv_id"].append(conv_id)
                    cols["turn_idx"].append(turn_idx)
                    cols["text"].append(m["text"])
                    cols["start"].append(m["start"])
                    cols["end"].append(m["end"])
                    cols["mtype"].append(_MTYPE_CODE[m["mtype"]])
                    if with_context:
                        cols["context"].append(m["context"])
            out = pd.DataFrame(cols)
            if with_vector:
                out["vector"] = (
                    list(map(list, encoder.encode_batch(cols["text"]))) if cols["text"] else []
                )
            yield out

    # Empty-input guard (P4, /root/reference/app/entity_extraction.py:160-162)
    # pushed into the scan as a real predicate instead of a UDF branch.
    filtered = transcripts.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "conv_id", "turn_idx", "text"
    )
    # A small input (one parquet file) would serialize the whole
    # CPU-bound extraction onto one core; widen via the plan-free
    # file-count check (session.widen_small_input).
    filtered = widen_small_input(filtered, ["conv_id"], factor=4)
    fanned = filtered.mapInPandas(run, schema=out_schema)
    from ..graph.triples import mention_uri_expr

    mention_id = mention_uri_expr()
    decoded_mtype = F.element_at(
        F.array(*[F.lit(t) for t in _MTYPES]), F.col("mtype").cast("int") + 1
    )
    fanned = fanned.withColumn("mention_id", mention_id).withColumn("mtype", decoded_mtype)
    if with_context:
        # F11 source tag + the reference's constant confidence placeholder
        fanned = fanned.withColumn("source", F.split(F.col("mtype"), "_").getItem(0))
        fanned = fanned.withColumn("confidence", F.lit(1.0).cast("float"))
    return fanned.select(*(cols_list + (["vector"] if with_vector else [])))
