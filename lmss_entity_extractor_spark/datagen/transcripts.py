"""Deterministic synthetic conversation transcripts (FIXTURES.md §1).

Schema is exactly the mandated input shape (BASELINE.json ``input_hint``):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.  Text is templated legal-domain prose seeded from the
reference's own sample text (/root/reference/app/run_extraction.py:73-77)
with injected ontology labels, alias/case variants, typo'd variants (for
fuzzy matching), leading-stop-word phrases, overlapping-span
constructions, and mention-free turns.  A configurable fraction of
conversations are "hot" (many times the median turn count) to exercise
skew salting in canonicalization (SURVEY.md §2 A7).

Everything is a pure function of (seed, n_convs, knobs) — no wall clock,
no RNG state leakage — so pytest fixtures, the oracle, and bench runs at
different parallelism levels all see byte-identical input.
"""

from __future__ import annotations

import datetime as dt
import random
from pathlib import Path

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "docgen", "cite_check", "none")

# Sentence templates; {m} slots are filled with mention phrases.
TEMPLATES = [
    "The intellectual property lawyer specializes in {m} and {m2} cases.",
    "She also handles {m} and {m2}.",
    "Recently, she's been working on a high-profile case involving {m} and {m2} in {m3}.",
    "Our client retained counsel for the {m} matter pending before the {m2}.",
    "The court ruled that {m} applies to this dispute.",
    "Please summarize the filing deadlines for {m}.",
    "I ran the {m} over the table and the {m2} finished first.",
    "The plan used a {m} followed by a {m2} on the sorted keys.",
    "An expert witness testified about {m} during the trial in {m3}.",
    "Opposing counsel cited precedent from {m3} concerning {m}.",
    "the {m} was reviewed by the paralegal before the hearing.",
    "Both {m} and {m2} were raised in the amended complaint.",
]

NO_MENTION_TEXTS = [
    "Thanks, that makes sense to me.",
    "Could you repeat that more slowly?",
    "I will follow up tomorrow morning.",
    "Noted. Nothing further on my side.",
    "",
    "   ",
    "The meeting is scheduled for next week at the usual time.",
]


def _typo(s: str, rng: random.Random) -> str:
    """Swap two adjacent inner characters of the longest word — a
    deterministic 'fat-finger' variant that exact matching misses but
    fuzzy candidate generation should recover."""
    words = s.split()
    if not words:
        return s
    k = max(range(len(words)), key=lambda i: len(words[i]))
    w = words[k]
    if len(w) >= 4:
        i = 1 + rng.randrange(len(w) - 3)
        w = w[:i] + w[i + 1] + w[i] + w[i + 2:]
        words[k] = w
    return " ".join(words)


def _variant(surface: str, rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.55:
        return surface
    if roll < 0.70:
        return surface.upper() if rng.random() < 0.5 else surface.title()
    if roll < 0.85:
        return _typo(surface, rng)
    # leading stop words — exercises the strip rule (P6)
    return rng.choice(["the ", "a ", "some of the ", "that "]) + surface


def gen_transcript_rows(
    n_convs: int = 100,
    seed: int = 42,
    mention_surfaces: list[str] | None = None,
    hot_frac: float = 0.02,
    hot_multiplier: int = 100,
    base_turns: int = 8,
) -> list[tuple[str, int, str, str, str | None, dt.datetime]]:
    """Generate rows (conv_id, turn_idx, role, text, tool, ts)."""
    if mention_surfaces is None:
        from .ontology_fixture import FIXTURE_CLASSES

        mention_surfaces = []
        for _, label, _, alts in FIXTURE_CLASSES:
            if label.startswith("ZZZ"):
                continue
            mention_surfaces.append(label)
            mention_surfaces.extend(alts)

    rng = random.Random(seed)
    epoch = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    n_hot = max(0, int(round(n_convs * hot_frac)))
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        is_hot = c < n_hot
        n_turns = base_turns * (hot_multiplier if is_hot else 1)
        n_turns = max(1, int(n_turns * (0.5 + rng.random())))
        conv_offset = dt.timedelta(hours=c)
        for t in range(n_turns):
            role = ROLES[t % len(ROLES)]
            tool = rng.choice(TOOLS[:-1]) if role == "tool" else None
            if rng.random() < 0.2:
                text = rng.choice(NO_MENTION_TEXTS)
            else:
                tpl = rng.choice(TEMPLATES)
                fills = {}
                for slot in ("m", "m2", "m3"):
                    if "{" + slot + "}" in tpl:
                        fills[slot] = _variant(rng.choice(mention_surfaces), rng)
                text = tpl.format(**fills)
            ts = epoch + conv_offset + dt.timedelta(minutes=t)
            rows.append((conv_id, t, role, text, tool, ts))
    return rows


def rows_to_pandas(rows):
    import pandas as pd

    # microsecond timestamps: Spark's parquet reader rejects TIMESTAMP(NANOS)
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32", "ts": "datetime64[us]"})


def write_transcripts_parquet(path: str | Path, **kwargs) -> Path:
    """Write a deterministic transcripts parquet (driver-side, small/medium
    scale; bench-scale generation goes through Spark in bench.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = rows_to_pandas(gen_transcript_rows(**kwargs))
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, p)
    return p


def transcripts_from_documents(docs, convs: int = 64):
    """Deterministically reshape the driver-provided ``documents`` table
    into the mandated transcripts shape (BASELINE.json ``input_hint``):
    conv_id = doc_id mod ``convs`` (dense turn_idx per conv), role cycled,
    fixed epoch + doc_id minutes as ts.  Pure column expressions — no UDF,
    no shuffle — so the flagship entry query runs on driver testdata
    without external inputs."""
    from pyspark.sql import functions as F

    return docs.select(
        F.concat(F.lit("conv-"), F.lpad((F.col("doc_id") % convs).cast("string"), 6, "0")).alias(
            "conv_id"
        ),
        (F.col("doc_id") / convs).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            ((F.col("doc_id") / convs).cast("int") % 3 + 1).cast("int"),
        ).alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(mins=F.col("doc_id").cast("int"))).alias("ts"),
    )


def transcripts_spark_df(spark, n_convs: int = 100, seed: int = 42, **kwargs):
    """Distributed generation: parallelize conv ids, generate each
    conversation's turns on executors (scales to bench sizes without a
    driver bottleneck)."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )

    # Generation is per-conversation deterministic: re-seed from (seed, c).
    def gen_conv(c: int):
        sub = gen_transcript_rows(
            n_convs=1, seed=seed * 1_000_003 + c, hot_frac=0.0, **kwargs
        )
        hot = c % 50 == 0  # deterministic 2% hot convs
        out = []
        reps = 100 if hot else 1
        conv_offset = dt.timedelta(hours=c)
        for r in range(reps):
            for (_, t, role, text, tool, ts) in sub:
                idx = r * len(sub) + t
                # re-derive ts from the GLOBAL turn index + per-conv
                # offset: reusing sub's ts verbatim gave every rep the
                # same timestamps (non-monotonic in turn_idx) and every
                # conv an identical ts range — degenerate for any
                # event-time consumer
                out.append(
                    (f"conv-{c:06d}", idx, role, text, tool,
                     ts + conv_offset + dt.timedelta(minutes=r * len(sub)))
                )
        return out

    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    rdd = spark.sparkContext.parallelize(range(n_convs), n_parts).flatMap(gen_conv)
    return spark.createDataFrame(rdd, schema)
