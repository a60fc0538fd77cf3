"""Deduplication operators for large-scale document/training-data
pipelines: exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

All the relational variants are pure DataFrame compositions (JVM-side,
whole-stage-codegen'd, shuffle only on the natural keys); SimHash is the
one Arrow-vectorized numpy UDF.  Hash functions are md5-hex based so the
same computation is expressible in the DuckDB oracle (portable across
engines, unlike xxhash64/DuckDB-hash).

Scale notes (100 TB):
  * exact dedup — one hash-partitioned groupBy on a 32-char digest, fully
    map-side combinable;
  * jaccard / minhash — the shingle explode multiplies rows ~O(tokens),
    but the candidate join keys (shingle, band signature) distribute well;
    stop-shingles (appearing in > max_df docs) must be dropped BEFORE the
    self-join or one hot shingle produces a quadratic bucket — that filter
    is built in here;
  * pair generation dedups with doc_a < doc_b so each pair exists once.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..session import widen_small_input


def _tokens(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def _clean_tokens(text_col: str):
    """Lowercased whitespace tokens with empties dropped (array<string>);
    '' and all-whitespace texts produce an empty array.  The single
    source of truth for the word tokenizer shared by the curation ops
    (repetition, LM scoring, BM25-style splitting)."""
    return F.filter(_tokens(text_col), lambda t: t != F.lit(""))


def _shingles(text_col: str, n: int):
    """Distinct word n-gram shingles of a text column (array<string>)."""
    toks = _tokens(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: (text_hash, n_docs, canonical_id) for
    groups with >1 member.  Hash-groupBy; canonical = min id."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity:
    (doc_a, doc_b, n_shared, n_a, n_b) with jaccard >= threshold.

    shared / (|A| + |B| - shared) >= t  — computed by exploding distinct
    shingles and self-joining on the shingle.  Shingles occurring in more
    than ``max_shingle_df`` documents are dropped first (stop-shingle
    guard: a hot shingle would create a quadratic join bucket)."""
    # join/shuffle on the 64-bit shingle hash, not the raw n-gram string:
    # same result up to astronomically-unlikely collisions, ~4x fewer
    # shuffle bytes.  The stop-shingle filter is a count window over the
    # same hash partitioning, so the self-join's exchange is reused
    # instead of re-exploding the corpus per consumer.
    from pyspark.sql import Window

    # the shingle explode multiplies a small doc table into a huge
    # intermediate; widen BEFORE the explode or the tokenize+hash map
    # work serializes onto the input's (few) splits — measured 1.1x
    # "scaling" from local[4]->local[16] on a 2-split input until this
    docs = widen_small_input(docs, [id_col], factor=2)
    sh = docs.select(
        F.col(id_col).alias("doc"), F.explode(_shingles(text_col, n)).alias("shingle")
    ).filter(F.length("shingle") > 0).select("doc", F.xxhash64("shingle").alias("sh_h"))
    sh = sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("sh_h"))).filter(
        F.col("df") <= max_shingle_df
    ).select("doc", "sh_h")

    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, "sh_h")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_shingles", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_shingles", "n_b"), "doc_b")
        .filter(
            F.col("n_shared") >= F.lit(threshold) * (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
        )
        .select("doc_a", "doc_b", "n_shared", "n_a", "n_b")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + banded LSH.

    Hash family: h_i(s) = md5(i || ':' || s) — lexicographic min of hex
    digests per (doc, i) is the minhash (portable to any engine with
    md5).  Signatures are split into ``bands`` bands of
    ``num_hashes/bands`` rows; docs sharing any band signature become a
    candidate pair.  Returns distinct (doc_a, doc_b).

    Scale shape (r6 rework, same pairs to the row): the per-shingle
    hash family materializes as ``num_hashes`` COLUMNS, so one
    map-side-combinable ``groupBy(doc)`` of column-wise mins replaces
    the 8x row explode + two stacked aggregations (min over 8x rows,
    then collect_list/sort per band) of the row form — the shuffle
    carries one row per doc regardless of corpus token count, and the
    band signatures are pure projections of the minhash columns (the
    sort order of the ``"i:minhash"`` fragments inside a band is a
    query-build-time constant: h_idx rendered as a string).  The band
    table is then hash-partitioned on the join key so the self-join's
    two sides are IDENTICAL exchanges over one subtree — ReuseExchange
    computes the corpus scan + md5 work once, where the alias'd
    broadcast self-join of the row form ran the whole subtree twice."""
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes

    # widen before the explode: the 8x md5 per shingle is the heavy map
    # work and must not inherit a narrow input's split count
    docs = widen_small_input(docs, [id_col], factor=2)
    sh = docs.select(F.col(id_col).alias("doc"), F.explode(_shingles(text_col, n)).alias("shingle"))
    sh = sh.filter(F.length("shingle") > 0)

    hashed = sh.select(
        "doc",
        *[
            F.md5(F.concat(F.lit(str(i)), F.lit(":"), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    sig = hashed.groupBy("doc").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )
    # per band: xxhash64 of the "|"-joined "h_idx:minhash" fragments in
    # the exact order array_sort put them (fragments differ at the
    # h_idx-as-string prefix, so their sort order is known statically)
    def _band_hash(b: int):
        idxs = sorted(range(b * rows_per_band, (b + 1) * rows_per_band), key=str)
        frags: list = []
        for k, i in enumerate(idxs):
            if k:
                frags.append(F.lit("|"))
            frags.append(F.lit(f"{i}:"))
            frags.append(F.col(f"m{i}"))
        return F.xxhash64(F.concat(*frags))

    band_sig = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _band_hash(b).alias("bs_h"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bs_h").alias("bs_h"))

    # identical exchanges on both sides of the self-join => the planner's
    # ReuseExchange evaluates the signature subtree once
    band_sig = band_sig.repartition("band", "bs_h")
    a = band_sig.alias("a")
    b = band_sig.alias("b")
    return (
        a.join(b, ["band", "bs_h"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (Arrow-vectorized numpy UDF — bit
    manipulation is the one piece built-ins don't express well).

    sig bit b = sign of sum over tokens of (+1 if bit b of the first 8
    md5 bytes of the token else -1).  md5 (not blake2b) so the whole
    signature is reproducible in ANSI SQL — the driver's DuckDB oracle
    recomputes it bit-for-bit from the hex digest (same family choice as
    the MinHash oracle).  Returns (doc_id, simhash:bigint)."""
    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        cache: dict[str, np.ndarray] = {}
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            if not toks:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                signs = cache.get(tok)
                if signs is None:
                    digest = hashlib.md5(tok.encode()).digest()[:8]
                    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
                    signs = bits.astype(np.int64) * 2 - 1
                    cache[tok] = signs
                acc += signs
            sig_bits = (acc > 0).astype(np.uint8)
            sig = int.from_bytes(np.packbits(sig_bits).tobytes(), "big")
            # fold to signed int64 for Spark's LongType
            out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.Series(out)

    return widen_small_input(docs, [id_col], factor=2).select(
        F.col(id_col), simhash(F.col(text_col)).alias("simhash")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    ``bucket_col`` (e.g. a cluster/label/LSH-bucket column) restricts the
    self-join to same-bucket pairs — the scale path; None compares all
    pairs (baseline, quadratic)."""
    from .similarity import cosine_expr

    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                          *( [F.col(bucket_col).alias("bkt")] if bucket_col else [] ))
    a, b = e.alias("a"), e.alias("b")
    on = [F.col("a.bkt") == F.col("b.bkt")] if bucket_col else []
    joined = a.join(b, on) if on else a.crossJoin(b)
    return (
        joined.filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos", cosine_expr(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cos") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, n_shared, n_a, n_b, cont_a, cont_b) — shingle
    CONTAINMENT near-duplicates (Broder's other resemblance measure):
    cont_a = |Sa∩Sb|/|Sa| is ~1 when A is quoted/embedded inside B even
    though Jaccard is tiny — the "document swallowed a document" case
    exact dedup and Jaccard both miss.  Pairs kept when EITHER side's
    containment >= threshold; the filter is integer-exact
    (n_shared >= t·n) and each emitted ratio is one IEEE division.

    Same scale discipline as `ngram_jaccard_pairs`: 64-bit shingle-hash
    join keys, stop-shingle guard before the self-join."""
    from pyspark.sql import Window

    sh = docs.select(
        F.col(id_col).alias("doc"), F.explode(_shingles(text_col, n)).alias("shingle")
    ).filter(F.length("shingle") > 0).select("doc", F.xxhash64("shingle").alias("sh_h"))
    sh = sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("sh_h"))).filter(
        F.col("df") <= max_shingle_df
    ).select("doc", "sh_h")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, "sh_h")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(
            sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed(
                "n_shingles", "n_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed(
                "n_shingles", "n_b"
            ),
            "doc_b",
        )
        .filter(
            (F.col("n_shared") >= F.lit(threshold) * F.col("n_a"))
            | (F.col("n_shared") >= F.lit(threshold) * F.col("n_b"))
        )
    )
    return out.select(
        "doc_a",
        "doc_b",
        "n_shared",
        "n_a",
        "n_b",
        (F.col("n_shared").cast("double") / F.col("n_a").cast("double")).alias(
            "cont_a"
        ),
        (F.col("n_shared").cast("double") / F.col("n_b").cast("double")).alias(
            "cont_b"
        ),
    )
