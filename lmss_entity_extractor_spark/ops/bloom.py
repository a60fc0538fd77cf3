"""Bloom-filter join pruning (L110): build a compact bit-array summary
of one join side's keys and push it into the OTHER side's scan as a
pure-codegen filter, so rows that cannot match never reach the join
shuffle.

This is the explicit-operator form of Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, which only fires
on shuffle-join patterns the optimizer recognizes): at 100 TB the
dominant cost of a selective fact×dim join is shuffling fact rows that
will not survive, and a few-hundred-KB bit array broadcast into the
scan removes them BEFORE the exchange.

Design (all JVM-side, no Python in the hot path):

* build — dim keys are hashed ``num_hashes`` ways with ``xxhash64(key,
  seed_i)``; set bit positions are aggregated distributed
  (``explode → groupBy(word) → bit_or``: map-side combinable, at most
  ``num_bits/64`` result rows) and densified driver-side into ONE
  ``array<long>`` literal — the same collect-then-rebroadcast shape
  Spark's runtime filter uses.  The collect is bounded by the bit-array
  size, never by the dim row count.
* probe — each fact row tests all ``num_hashes`` bits with
  ``element_at``/``shiftright``/bitwise-AND column expressions inside
  whole-stage codegen.  No UDF, no join, no shuffle: the filter sits
  directly on the scan and combines with parquet predicate pushdown.
* exactness — ``bloom_semi_join`` follows the probe with the exact
  ``LEFT SEMI`` join, so false positives are removed and the result
  equals the plain semi-join row-for-row (the contract oracle).  The
  probe alone (``bloom_probe``) is exposed for pipelines that tolerate
  the documented false-positive rate.

Sizing: the plan carries ``num_bits/64`` longs (default 2^20 bits =
16 K longs = 128 KB).  ~1% FP at n keys needs ~10n bits; the builder
refuses configs past 2^30 bits (128 MB) where a literal stops being
sane and an exchanged bitmap-join variant would be the right tool.

No reference counterpart (the reference joins are single-process); this
is the 100-TB enabler for its mention×ontology and search join shapes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

_MAX_BITS = 1 << 30


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` bit positions for a key: xxhash64 seeded by
    hashing the key together with the hash index (independent streams),
    folded into [0, num_bits)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    dim: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> list[int]:
    """One distributed pass over ``dim`` → the dense bloom word array
    (``num_bits/64`` Python ints, ready for :func:`bloom_probe`).

    NULL keys are dropped (SQL join semantics: NULL matches nothing).
    """
    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_bits > _MAX_BITS:
        raise ValueError(
            f"num_bits {num_bits} > {_MAX_BITS}: a plan literal this large is "
            "the wrong tool — use a bitmap join instead"
        )
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in [1, 16], got {num_hashes}")
    if key_col not in dim.columns:
        raise ValueError(f"column {key_col!r} not in dim DataFrame")

    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos")
    words = (
        dim.filter(key.isNotNull())
        .select(pos)
        .distinct()
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for row in words:
        dense[row["word_idx"]] = row["word"]
    return dense


def bloom_might_contain(
    key: Column, bloom_words: list[int], num_hashes: int = 5
) -> Column:
    """Codegen membership-test expression: true iff every hashed bit is
    set.  NULL keys test false (they cannot equi-join)."""
    num_bits = len(bloom_words) * 64
    arr = F.lit(bloom_words)
    positions = F.array(*_positions(key, num_bits, num_hashes))
    # one transform over the positions array so the (large) word-array
    # literal is embedded in the plan ONCE, not once per hash
    bits = F.transform(
        positions,
        lambda pos: F.getbit(
            F.element_at(arr, (pos / 64).cast("int") + 1), F.pmod(pos, F.lit(64))
        )
        == 1,
    )
    return key.isNotNull() & F.forall(bits, lambda b: b)


def bloom_probe(
    fact: DataFrame,
    key_col: str,
    bloom_words: list[int],
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``fact`` down to rows whose key MIGHT be in the built set
    (false positives possible at the configured rate, false negatives
    never).  Pure scan-side filter — no shuffle, no UDF."""
    if key_col not in fact.columns:
        raise ValueError(f"column {key_col!r} not in fact DataFrame")
    return fact.filter(bloom_might_contain(F.col(key_col), bloom_words, num_hashes))


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact ``fact LEFT SEMI JOIN dim``, bloom-pruned: the bit array
    built from ``dim`` filters ``fact`` at the scan, then the exact semi
    join removes false positives.  Row-for-row equal to the plain
    semi-join (contract query ``bloom_semi_join``)."""
    words = bloom_build(dim, dim_key, num_bits=num_bits, num_hashes=num_hashes)
    pruned = bloom_probe(fact, fact_key, words, num_hashes=num_hashes)
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )


def expected_fp_rate(n_keys: int, num_bits: int, num_hashes: int = 5) -> float:
    """Textbook bound (1 - e^(-kn/m))^k — published so callers can size
    ``num_bits`` for their dim cardinality."""
    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_keys / num_bits)) ** num_hashes
