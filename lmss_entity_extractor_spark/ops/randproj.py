"""Sparse random projection (L170): Johnson-Lindenstrauss dimension
reduction with the Achlioptas sparse sign matrix — the cheap,
training-free alternative to PCA (L80) for shrinking embedding columns
before ANN/dedup: s_ij ∈ {+1, 0, −1} with probability {1/6, 2/3, 1/6},
output scaled by √(3/d_out) so distances are preserved in expectation.

Determinism: the sign matrix is derived from SHA-256 of (seed, i, j) —
no RNG state, same seed → the same matrix on any machine, any
parallelism, forever.  The matrix folds into d_out generated literal
dot expressions (the L155 `_dot_sql` machinery): projection is a
narrow, JVM-side, ZERO-SHUFFLE projection over 100 TB of vectors —
no crossJoin, no UDF — and the oracle re-generates the identical
literals from the same derivation, so every output value is checked
bit-for-bit.

No reference counterpart; ANN/embedding family per SURVEY §2.11
(feeds L5/L7-L9 after reduction; PCA L80 is the data-dependent twin).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dlit, _dot_sql


def jl_sign_matrix(dim: int, out_dim: int, seed: int = 0) -> list[list[float]]:
    """``out_dim`` rows of ``dim`` signs in {+1.0, 0.0, −1.0} with the
    Achlioptas {1/6, 2/3, 1/6} density, derived from SHA-256(seed,i,j)."""
    rows = []
    for j in range(out_dim):
        row = []
        for i in range(dim):
            h = hashlib.sha256(f"{seed}:{i}:{j}".encode()).digest()
            b = h[0] % 6
            row.append(1.0 if b == 0 else (-1.0 if b == 1 else 0.0))
        rows.append(row)
    return rows


def rp_project(
    df: DataFrame,
    dim: int,
    out_dim: int,
    seed: int = 0,
    vec_col: str = "embedding",
    out_col: str = "rp",
) -> DataFrame:
    """Adds ``out_col`` = the √(3/d_out)-scaled sparse projection as an
    ``array<double>`` of length ``out_dim`` — one zero-shuffle
    projection."""
    if out_dim < 1 or dim < 1:
        raise ValueError("rp_project: dim and out_dim must be >= 1")
    signs = jl_sign_matrix(dim, out_dim, seed)
    scale = math.sqrt(3.0 / out_dim)
    comps = ", ".join(
        f"({_dot_sql(vec_col, row)} * {_dlit(scale)})" for row in signs
    )
    return df.withColumn(out_col, F.expr(f"array({comps})"))
