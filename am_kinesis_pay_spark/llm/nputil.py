"""Shared numpy helpers for the embedding kernels (driver + Arrow UDFs).

Zero-norm safety (ADVICE r5): a zero-norm embedding or centroid row
normalized with a plain divide yields a NaN row; ``np.argmax`` treats
NaN as maximal, so ONE zero-vector centroid would capture every
vector's cell assignment — silently diverging from the DuckDB oracles'
NULL-division / NULLS-LAST semantics. Clamping the norm to 1.0 keeps a
zero vector as the zero vector (cosine 0 against everything), which is
what the SQL side computes after its ``+ 0`` guards, and masking any
residual NaN similarity to -inf keeps argmax/argsort deterministic even
if an upstream embedding itself contains NaN.
"""

from __future__ import annotations

import numpy as np


def unit_rows(a: np.ndarray) -> np.ndarray:
    """Row-normalize ``a``; rows with zero norm pass through unchanged
    (divide by 1.0) instead of becoming NaN rows."""
    n = np.linalg.norm(a, axis=1, keepdims=True)
    return a / np.where(n == 0.0, 1.0, n)


def nan_to_neginf(sims: np.ndarray) -> np.ndarray:
    """Mask NaN similarities to -inf so argmax/argsort never select
    them (numpy sorts NaN as maximal, the opposite of SQL NULLS LAST)."""
    return np.where(np.isnan(sims), -np.inf, sims)
