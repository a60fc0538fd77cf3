"""Vectorized entity linker (operators J1/J2/A5/P7/P12 + J5 branch map).

Reference semantics (/root/reference/app/lmss_classification.py:62-109):
for one mention, scan *all* ontology entities in index order; skip
entities with no embedding; the first entity whose cosine similarity
reaches the high-confidence threshold wins immediately with
score = cosine (the fast path — note it bypasses the similarity
threshold); otherwise the combined score (cosine + token_set_ratio)/2 is
argmax'd with strict ``>`` (first maximum in index order wins) and kept
only if it reaches the similarity threshold.  Branch resolution walks
``rdfs:subClassOf`` ancestors (self first) and returns the first hit in
the top-class set, else "Unknown"
(/root/reference/app/lmss_classification.py:161-171).

Spark-first redesign (SURVEY.md §2 J1): the per-(mention x class) loop —
O(M*C) rdflib graph queries in the reference — becomes one numpy matrix
product against the broadcast mean-embedding matrix per *unique surface
form* per Arrow batch, with fuzzy ratios computed only for mentions that
miss the fast path, and the whole link result memoized per surface form
(mention text is Zipf-distributed, so the cache hit rate approaches 1 at
scale).  Branch lookup is a precomputed broadcast dict, not a join.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..encoder import get_encoder
from ..ontology.artifacts import OntologyArtifacts
from ..textproc import cached_token_set_ratio


@dataclass(frozen=True)
class LinkerConfig:
    # API profile defaults (/root/reference/app/main.py:106-108); the CLI
    # profile uses 0.3/0.9 (/root/reference/app/run_classifier.py:37-38).
    similarity_threshold: float = 0.7
    high_confidence_threshold: float = 0.9


NO_LINK = {"iri": None, "label": None, "score": None, "branch": None}


class Linker:
    def __init__(self, artifacts: OntologyArtifacts, config: LinkerConfig = LinkerConfig(), cache_size: int = 200_000):
        self.artifacts = artifacts
        self.config = config
        # per-process lazy singleton resolved from the spec stamped at
        # artifact build time (F8) — same model on every executor
        self._encoder = get_encoder(artifacts.encoder_spec)
        # float64 scoring on both pipeline and oracle sides for exact parity
        self._matrix = artifacts.mean_matrix.astype(np.float64)
        self._has_emb = artifacts.row_has_embedding
        self._labels_lower = [lbl.lower() for lbl in artifacts.labels]
        self._cache: dict[str, dict] = {}
        self._cache_size = cache_size

    # -- core scoring -------------------------------------------------------

    def semantic_scores(self, text: str) -> np.ndarray:
        """Cosine of the mention embedding against every class mean
        embedding (rows are pre-normalized; un-embedded rows score 0)."""
        v = self._encoder.encode(text).astype(np.float64)
        return self._matrix @ v

    def link_text(self, text: str) -> dict:
        """Link one surface form; memoized. Returns NO_LINK-shaped dict
        when no match clears the threshold."""
        hit = self._cache.get(text)
        if hit is not None:
            return hit

        cfg = self.config
        arts = self.artifacts
        sem = self.semantic_scores(text)

        result = NO_LINK
        fast = np.flatnonzero((sem >= cfg.high_confidence_threshold) & self._has_emb)
        if fast.size:
            pos = int(fast[0])  # first in frozen index order (J2)
            result = self._emit(pos, float(sem[pos]))
        else:
            # Argmax semantics of the reference scan — first index
            # attaining the maximum combined score — is equivalent to
            # (max score, min index among exact ties), which is
            # order-independent.  Scanning in DESCENDING cosine order
            # enables an exact dominance prune: combined <= (sem+1)/2,
            # so once best_score exceeds that bound for the remaining
            # (lower-sem) candidates, their fuzzy ratio need not be
            # computed at all.  Typically eliminates >90% of the
            # O(classes) fuzzy evaluations with bit-identical results.
            lowered = text.lower()
            best_pos, best_score = -1, 0.0
            candidates = np.flatnonzero(self._has_emb)
            order = candidates[np.argsort(-sem[candidates], kind="stable")]
            for pos in order:
                pos = int(pos)
                ceiling = (sem[pos] + 1.0) / 2.0
                if ceiling < best_score or (ceiling == best_score and pos > best_pos >= 0):
                    # no remaining candidate in this order can beat/ tie-
                    # improve best: sem is non-increasing from here on
                    if ceiling < best_score:
                        break
                    continue
                fuzzy = cached_token_set_ratio(lowered, self._labels_lower[pos]) / 100.0
                combined = (sem[pos] + fuzzy) / 2.0
                if combined > best_score or (combined == best_score and 0 <= pos < best_pos):
                    best_score = combined
                    best_pos = pos
            if best_pos >= 0 and best_score > 0.0 and best_score >= cfg.similarity_threshold:
                result = self._emit(best_pos, best_score)

        if len(self._cache) < self._cache_size:
            self._cache[text] = result
        return result

    def _emit(self, pos: int, score: float) -> dict:
        iri = self.artifacts.iris[pos]
        return {
            "iri": iri,
            "label": self.artifacts.labels[pos],
            "score": score,
            # null-branch backfill P12 (/root/reference/app/main.py:256-259)
            "branch": self.artifacts.branch_map.get(iri, "Unknown"),
        }

    def link_batch(self, texts) -> list[dict]:
        return [self.link_text(t if isinstance(t, str) else "") for t in texts]
