"""Single-cell helper routines replacing the scanpy calls the reference makes.

- ``normalize_total`` replaces ``sc.pp.normalize_total`` as used by
  ``get_normalized_expression`` (`/root/reference/alpine/main.py:297-298`):
  scale each cell's counts to ``target_sum`` (median of per-cell totals when
  None, scanpy's default).
- ``knn_graph`` + the Leiden wrapper used by the optimizer's scoring live in
  ``alpine_tpu/optimize/scoring.py``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def normalize_total(X: np.ndarray, target_sum: Optional[float] = None) -> np.ndarray:
    """Per-cell total-count normalization of (cells x genes) X."""
    X = np.asarray(X, dtype=np.float32)
    counts = X.sum(axis=1)
    if target_sum is None:
        nz = counts[counts > 0]
        target_sum = float(np.median(nz)) if nz.size else 1.0
    safe = np.where(counts == 0, 1.0, counts)
    return (X * (target_sum / safe)[:, None]).astype(np.float32)
