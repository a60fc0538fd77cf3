"""Deterministic text encoder: seeded hashed token/char-n-gram embedding.

Stands in for ``SentenceTransformer("all-MiniLM-L6-v2").encode``
(/root/reference/app/entity_extraction.py:154,176,
/root/reference/app/lmss_parser.py:20,130,
/root/reference/app/lmss_search.py:112-113), which is not installable in
this environment.  The encoder is pinned on BOTH sides of the parity gate
(Spark pipeline and single-process oracle), so linking decisions — which
depend only on cosine *rankings* — are compared apples-to-apples
(SURVEY.md §7 deviation (a)).

Properties:
  * pure function of the input string; no RNG, no global state,
  * stable across processes/executors (keyed BLAKE2b feature hashing),
  * l2-normalized output (zero vector for feature-less input),
  * identical normalized texts => identical vectors => cosine 1.0, which
    is what makes the reference's high-confidence fast path
    (/root/reference/app/lmss_classification.py:75-84) reachable.

Batch encoding is vectorized with numpy over a per-process feature cache;
inside Spark it is called from Arrow-batched pandas UDFs (no per-row
Python at the DataFrame level).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .textproc import full_process

DIM = 64
_KEY = b"lmss-spark-encoder-v1"
_TOKEN_WEIGHT = 1.0
_TRIGRAM_WEIGHT = 0.5

# feature string -> (bucket, sign) ; process-local, content-addressed so
# concurrent executors agree without coordination.
_feature_cache: dict[str, tuple[int, float]] = {}


def _feature_slot(feat: str) -> tuple[int, float]:
    slot = _feature_cache.get(feat)
    if slot is None:
        h = int.from_bytes(
            hashlib.blake2b(feat.encode("utf-8"), digest_size=8, key=_KEY).digest(),
            "big",
        )
        slot = (h % DIM, 1.0 if (h >> 62) & 1 else -1.0)
        if len(_feature_cache) < 1_000_000:
            _feature_cache[feat] = slot
    return slot


def _features(text: str) -> list[tuple[str, float]]:
    norm = full_process(text)
    if not norm:
        return []
    out: list[tuple[str, float]] = []
    for tok in norm.split():
        out.append(("t:" + tok, _TOKEN_WEIGHT))
        padded = "#" + tok + "#"
        if len(padded) < 3:
            out.append(("g:" + padded, _TRIGRAM_WEIGHT))
        else:
            for i in range(len(padded) - 2):
                out.append(("g:" + padded[i : i + 3], _TRIGRAM_WEIGHT))
    return out


def encode(text: str) -> np.ndarray:
    """Encode one string to a unit-norm float32 vector of dim ``DIM``."""
    vec = np.zeros(DIM, dtype=np.float64)
    for feat, w in _features(text):
        bucket, sign = _feature_slot(feat)
        vec[bucket] += sign * w
    n = np.linalg.norm(vec)
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


def encode_batch(texts) -> np.ndarray:
    """Encode an iterable of strings into an (N, DIM) float32 matrix.

    Deduplicates repeated surface forms before encoding — mention text is
    Zipf-distributed across a transcript corpus, so this is the hot-path
    optimization that replaces the reference's per-mention encode calls.
    """
    texts = list(texts)
    uniq: dict[str, int] = {}
    order: list[str] = []
    idx = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        t = t if isinstance(t, str) else ""
        j = uniq.get(t)
        if j is None:
            j = len(order)
            uniq[t] = j
            order.append(t)
        idx[i] = j
    mat = np.empty((len(order), DIM), dtype=np.float32)
    for j, t in enumerate(order):
        mat[j] = encode(t)
    return mat[idx]


def cosine(v1: np.ndarray, v2: np.ndarray) -> float:
    """Cosine similarity with the reference's zero-size/zero-norm guard
    (/root/reference/app/lmss_search.py:106-110)."""
    if v1.size == 0 or v2.size == 0:
        return 0.0
    n1 = np.linalg.norm(v1)
    n2 = np.linalg.norm(v2)
    if n1 == 0 or n2 == 0:
        return 0.0
    return float(np.dot(v1, v2) / (n1 * n2))
