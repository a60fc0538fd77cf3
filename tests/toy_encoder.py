"""Test-local third-party encoder module, shipped to executors via
``sc.addPyFile`` (the test twin of ``spark-submit --py-files``).

Self-registers under the qualified spec ``"toy_encoder:test-sha1-24"`` at
import time — the F8 seam contract: the spec string inside broadcast
artifacts names this module, so every fresh worker process imports it and
reconstructs the encoder without any driver-side coordination."""

import hashlib

import numpy as np

from lmss_entity_extractor_spark.encoder import register_encoder


class ToySha1Encoder:
    """Distinct hash family (sha1) and dim (24) from both built-ins, so
    oracle agreement can only come from both sides resolving this spec."""

    dim = 24

    def encode(self, text: str) -> np.ndarray:
        from lmss_entity_extractor_spark.textproc import full_process

        vec = np.zeros(self.dim, dtype=np.float64)
        norm = full_process(text)
        for tok in norm.split() if norm else ():
            h = int.from_bytes(hashlib.sha1(tok.encode("utf-8")).digest()[:8], "big")
            vec[h % self.dim] += 1.0 if h & 1 else -1.0
        n = np.linalg.norm(vec)
        if n > 0:
            vec /= n
        return vec.astype(np.float32)

    def encode_batch(self, texts) -> np.ndarray:
        texts = list(texts)
        if not texts:
            return np.empty((0, self.dim), dtype=np.float32)
        return np.stack([self.encode(t if isinstance(t, str) else "") for t in texts])


register_encoder("toy_encoder:test-sha1-24", ToySha1Encoder)
