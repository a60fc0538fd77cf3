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


# ---------------------------------------------------------------------------
# Pluggable encoder seam (SURVEY.md §2.8 F8: "optional real model via
# mapInPandas with per-executor lazy singleton").
#
# Everything that encodes text — artifact build, linker scoring, search,
# the with_vector extraction path, and the single-process oracle —
# resolves its encoder through ``get_encoder(spec)``, where ``spec`` is a
# short string stamped into ``OntologyArtifacts`` at build time.  The
# spec (not the model!) travels through pickling/broadcast; each executor
# process materializes the model lazily exactly once per spec.  To plug
# a real sentence-transformer in on a cluster:
#
#     # in a module shipped via --py-files, at import time:
#     from lmss_entity_extractor_spark.encoder import register_encoder
#     register_encoder("minilm-l6-v2", _load_minilm)
#     ...
#     artifacts = build_artifacts(rows, encoder_spec="minilm-l6-v2")
#
# Registration must run at import time in code that reaches executors
# (the registry is process-local); the built-in specs below are always
# available because importing this module registers them.
# ---------------------------------------------------------------------------

from typing import Callable, Protocol, runtime_checkable


@runtime_checkable
class Encoder(Protocol):
    """What the pipeline needs from a text encoder."""

    dim: int

    def encode(self, text: str) -> np.ndarray:  # unit-norm float32 (dim,)
        ...

    def encode_batch(self, texts) -> np.ndarray:  # float32 (N, dim)
        ...


class HashedEncoder:
    """The pinned deterministic hashed encoder (module functions above)."""

    dim = DIM

    def encode(self, text: str) -> np.ndarray:
        return encode(text)

    def encode_batch(self, texts) -> np.ndarray:
        return encode_batch(texts)


DEFAULT_ENCODER_SPEC = "hashed-v1"

_encoder_registry: dict[str, Callable[[], Encoder]] = {}
_encoder_singletons: dict[str, Encoder] = {}


def register_encoder(spec: str, factory: Callable[[], Encoder]) -> None:
    """Register an encoder factory under ``spec``.  The factory runs at
    most once per process (lazy singleton) — the right place to load a
    heavyweight model.  Must be called at import time in a module that is
    shipped to executors; re-registering a spec replaces the factory and
    drops any cached singleton (test/refresh hook)."""
    _encoder_registry[spec] = factory
    _encoder_singletons.pop(spec, None)


def get_encoder(spec: str = DEFAULT_ENCODER_SPEC) -> Encoder:
    """Resolve ``spec`` to the process-local encoder singleton.

    Two spec forms:

    * bare (``"hashed-v1"``) — must already be registered in this process
      (built-ins above, or a user module imported on both driver and
      executors);
    * qualified (``"my_encoders:my-model"``) — self-registering: the
      module path before the colon is imported first (it calls
      ``register_encoder("my_encoders:my-model", ...)`` at import time),
      then the full spec resolves.  This is how a THIRD-PARTY encoder
      travels to executors: ship the module via ``spark-submit
      --py-files`` (or ``sc.addPyFile``) and put its name in the spec —
      the spec string itself, carried inside broadcast artifacts, then
      reconstructs the encoder in every fresh worker process."""
    enc = _encoder_singletons.get(spec)
    if enc is None:
        factory = _encoder_registry.get(spec)
        if factory is None and ":" in spec:
            import importlib

            importlib.import_module(spec.split(":", 1)[0])
            factory = _encoder_registry.get(spec)
        if factory is None:
            raise KeyError(
                f"no encoder registered under {spec!r} in this process; "
                "register_encoder() must run at import time in code shipped "
                "to executors (qualified 'module:name' specs import their "
                f"module automatically; known: {sorted(_encoder_registry)})"
            )
        enc = _encoder_singletons[spec] = factory()
    return enc


def _load_minilm() -> Encoder:
    """Factory for the reference's real model
    (/root/reference/app/entity_extraction.py:154).  Resolves lazily so
    the spec can be *registered* everywhere but only *selected* where
    sentence-transformers is actually installed."""
    from sentence_transformers import SentenceTransformer  # not in this sandbox

    model = SentenceTransformer("all-MiniLM-L6-v2")

    class _ST:
        dim = int(model.get_sentence_embedding_dimension())

        def encode(self, text: str) -> np.ndarray:
            return model.encode([text], normalize_embeddings=True)[0].astype(np.float32)

        def encode_batch(self, texts) -> np.ndarray:
            return model.encode(list(texts), normalize_embeddings=True).astype(np.float32)

    return _ST()


class Md5BagEncoder:
    """Second built-in encoder — different hash family (md5), different
    dimension (32), token-bag only (no trigrams).  Exists to prove the
    encoder seam end-to-end: artifacts built with this spec must flow
    through broadcast -> executor-side Linker -> search -> oracle with
    exact parity and a non-default dim (tests/test_encoder.py)."""

    dim = 32

    def encode(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float64)
        norm = full_process(text)
        for tok in norm.split() if norm else ():
            h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
            vec[h % self.dim] += 1.0 if (h >> 62) & 1 else -1.0
        n = np.linalg.norm(vec)
        if n > 0:
            vec /= n
        return vec.astype(np.float32)

    def encode_batch(self, texts) -> np.ndarray:
        texts = list(texts)
        if not texts:
            return np.empty((0, self.dim), dtype=np.float32)
        return np.stack([self.encode(t if isinstance(t, str) else "") for t in texts])


register_encoder(DEFAULT_ENCODER_SPEC, HashedEncoder)
register_encoder("hashed-md5-32", Md5BagEncoder)
register_encoder("minilm-l6-v2", _load_minilm)


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
