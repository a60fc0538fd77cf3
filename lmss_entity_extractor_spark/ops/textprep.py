"""Training-data text preparation: chunking, PII scrubbing, stratified
sampling.  All pure JVM column expressions — no UDF anywhere — so every
operator whole-stage-codegens and scales as a narrow map over the
corpus (chunking adds the unavoidable explode fan-out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_WS = r"\s+"


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking: chunk i covers whitespace tokens
    [i*stride, i*stride + chunk_tokens); with stride < chunk_tokens
    consecutive chunks overlap by chunk_tokens - stride tokens (the
    standard LLM-pretraining window).  Tail chunks are shorter, never
    dropped; every document emits >= 1 chunk (empty text -> one empty
    chunk).  Returns (id, chunk_idx, chunk_text, n_chunk_tokens).

    Scale shape: tokenization + slicing happen inside one projection and
    the fan-out is an executor-side explode — one narrow pass, output
    rows ~ n_tokens/stride per doc.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), _WS)
    # split('') yields [''] — ONE phantom element; count real tokens as 0
    # for empty/whitespace-only docs so their single empty chunk carries
    # n_chunk_tokens=0 and contributes nothing to pack_chunks' cumsum
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(F.size(toks))
    # chunk count = 1 + ceil(max(n - chunk_tokens, 0)/stride): the last
    # start is the first one whose window reaches the final token.  The
    # naive ceil(n/stride) emits extra trailing starts whose windows are
    # FULLY CONTAINED in the previous chunk (n mod stride <=
    # chunk_tokens - stride), shipping duplicate text into the training
    # stream — exactly what the dedup stage upstream removed.
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)).cast("int")
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * F.lit(stride)
    )
    exploded = docs.select(
        F.col(id_col),
        n.alias("_n_real"),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    ).filter(
        # with stride > chunk_tokens the last computed start can land at
        # or past the end — drop those empty trailing windows (the
        # single chunk of an empty doc, start 0, always survives)
        F.col("_start") < F.greatest(F.col("_n_real"), F.lit(1))
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
        F.greatest(
            F.least(F.col("_n_real") - F.col("_start"), F.lit(chunk_tokens)), F.lit(0)
        ).alias("n_chunk_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    capacity: int,
    shard_col: str,
    order_cols: list[str],
    token_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Sequence packing for pretraining batches: lay the chunks of each
    shard end-to-end in a deterministic order and cut the token stream
    into fixed-``capacity`` bins — ``bin_id`` = the bin containing the
    chunk's first token (chunks may straddle a boundary, the
    packed-sequence-with-crossings convention).

    Scale shape: packing is inherently sequential, so it runs as a
    window cumsum **per shard** — shards pack independently and in
    parallel (one keyed shuffle); bin ids are (shard, bin).  A global
    single-stream packing would serialize the world through one
    partition, which is exactly what the shard key exists to avoid.

    Appends ``tok_offset`` (chunk's start offset in its shard's stream)
    and ``bin_id``.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    offset = (cum - F.col(token_col)).alias("tok_offset")
    return chunks.select(
        "*",
        offset,
        F.floor((cum - F.col(token_col)) / F.lit(capacity)).cast("int").alias("bin_id"),
    )


# Conservative, engine-portable patterns (identical regex semantics in
# Spark's Java regex and DuckDB's RE2 for these constructs).
PII_PATTERNS = (
    # email FIRST: an address whose local part contains a phone/SSN-shaped
    # digit run (john.555-123-4567@x.com) must redact as ONE email —
    # running a digit pattern first would splice '<PHONE>' into the
    # address and leave the identifying 'john.'/'@x.com' fragments behind
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # then SSN (3-2-4) before phone (3-3-4) so neither eats the other
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
)


def scrub_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / US phone numbers / SSNs with typed placeholder
    tokens, and count each category (the audit signal a data-governance
    pass needs).  Redaction order is part of the contract — see
    PII_PATTERNS.  Returns (id, scrubbed_text, n_email, n_ssn, n_phone)."""
    scrubbed: Column = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0))).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(F.col(id_col), scrubbed.alias("scrubbed_text"), *counts)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    label_col: str,
    rate_per_mille: Column,
    modulus: int = 1000,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``knuth_hash(key) % modulus < rate_per_mille`` where
    ``rate_per_mille`` is a per-row column (typically derived from
    ``label_col``) giving the stratum's keep-rate out of ``modulus``.

    The hash is Knuth's multiplicative hash over the NUMERIC key —
    chosen over xxhash64/md5 deliberately: it is exactly reproducible in
    ANSI SQL (pure integer arithmetic), so the sample is verifiable by
    any engine, and it is a pure function of the key — re-running at any
    parallelism, or appending new rows, never changes which existing
    rows are kept (the property "sample(T union D) restricted to T ==
    sample(T)" that reservoir/fraction sampling lacks).

    The key is folded mod 2^31 before the multiply so the product stays
    within int64 for ANY long key (2^31 * 2654435761 < 2^63) — Spark
    runs ANSI mode, where a silent-overflow formulation would error at
    scale instead of hashing.
    """
    return df.withColumn("_rate", rate_per_mille).filter(
        F.pmod(knuth_hash(key_col), F.lit(modulus)) < F.col("_rate")
    ).drop("_rate")


def knuth_hash(key_col: str):
    """Knuth multiplicative hash over a numeric key column — THE shared
    cross-engine sampling hash (stratified_sample, mixture_sample, and
    their DuckDB oracles all derive from this one definition): fold the
    key mod 2^31 (pmod — non-negative for ANY long, incl. negatives),
    multiply by 2654435761, take mod 2^32.  Pure integer arithmetic,
    reproducible in ANSI SQL; the fold keeps the product inside int64
    under ANSI mode."""
    folded = F.pmod(F.col(key_col).cast("long"), F.lit(2147483648))
    return F.pmod(folded * F.lit(2654435761), F.lit(4294967296))
