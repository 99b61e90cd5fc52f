"""Blockwise exact k-nearest-neighbours on the accelerator.

The reference's CV objective builds a 15-NN graph per validation fold
(`/root/reference/alpine/optimization.py:271`: `sc.pp.neighbors`, which
delegates to pynndescent's *approximate* search on the host CPU).  Here the
graph is exact; at atlas scale (tens of thousands of validation cells,
embedding width up to a few hundred components) host exact kNN is minutes
per fold, while one (n × n) blocked distance computation is MXU work —
2·n²·d MACs streamed block-by-block, with a running top-k merge so the
full distance matrix never materialises.

Semantics match `sklearn.neighbors.NearestNeighbors(n_neighbors=k)` on the
fit data: euclidean distances, self included (distance 0 first), ascending
order, ties broken by lower index.  Distances use the |x|² + |y|² − 2·x·y
expansion (same as sklearn's brute path) in float32 with HIGHEST matmul
precision.

Placement is explicit: pass `device=` (repo invariant — an explicit device
is never silently ignored); the embedding travels as an argument, never a
baked constant (axon HTTP-413 rule).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import numpy as np


def _build_knn_fn():
    import jax
    import jax.numpy as jnp
    from jax import lax

    @partial(jax.jit, static_argnames=("k", "block"))
    def knn(X, valid, k: int, block: int):
        n_pad, _ = X.shape
        nb = n_pad // block
        sq = (X * X).sum(axis=1)  # (n_pad,)
        Xb = X.reshape(nb, block, X.shape[1])
        validb = valid.reshape(nb, block)
        sqb = sq.reshape(nb, block)
        row_ids = jnp.arange(n_pad, dtype=jnp.int32)

        def step(carry, inp):
            best_s, best_i = carry  # (n_pad, k) similarity = -dist², ids
            Yb, vb, sqy, base = inp
            dots = lax.dot_general(
                X, Yb, (((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST)  # (n_pad, block)
            s = 2.0 * dots - sq[:, None] - sqy[None, :]
            # snap float dust to an exact zero distance: for duplicate rows
            # the expansion leaves O(d·2^-24)·‖x‖² residue, which would defeat
            # the duplicate-point rho handling downstream (UMAP treats zero
            # distances as "same point")
            s = jnp.where(s >= -1e-5 * (sq[:, None] + sqy[None, :]), 0.0, s)
            cols = base + jnp.arange(block, dtype=jnp.int32)
            s = jnp.where(vb[None, :], s, -jnp.inf)
            # the self column always ranks first (true distance is 0; the
            # expansion can leave float dust there)
            s = jnp.where(cols[None, :] == row_ids[:, None], jnp.inf, s)
            bs, bpos = lax.top_k(s, min(k, block))
            bi = cols[bpos]
            cat_s = jnp.concatenate([best_s, bs], axis=1)
            cat_i = jnp.concatenate([best_i, bi], axis=1)
            ms, mpos = lax.top_k(cat_s, k)
            mi = jnp.take_along_axis(cat_i, mpos, axis=1)
            return (ms, mi), None

        init = (jnp.full((n_pad, k), -jnp.inf, X.dtype),
                jnp.zeros((n_pad, k), jnp.int32))
        bases = (jnp.arange(nb, dtype=jnp.int32) * block)
        (best_s, best_i), _ = lax.scan(step, init, (Xb, validb, sqb, bases))
        d2 = jnp.where(jnp.isinf(best_s), 0.0, -best_s)
        return jnp.sqrt(jnp.maximum(d2, 0.0)), best_i

    return knn


_KNN_FN = None


def exact_knn(
    emb: np.ndarray,
    k: int,
    device=None,
    block: int = 2048,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact euclidean kNN of every row of `emb` against all rows (self
    included).  Returns (distances, indices), each (n, min(k, n)), sorted
    ascending.  Runs on `device` (a `jax.Device`; None = backend default)."""
    global _KNN_FN
    import jax

    emb = np.ascontiguousarray(np.asarray(emb, dtype=np.float32))
    n, d = emb.shape
    k = min(k, n)
    if k <= 0 or n == 0:
        return np.zeros((n, 0), np.float64), np.zeros((n, 0), np.int64)

    block = max(min(block, 1 << (max(n - 1, 1)).bit_length()), 8)
    n_pad = int(math.ceil(n / block)) * block
    X = np.zeros((n_pad, d), dtype=np.float32)
    X[:n] = emb
    valid = np.zeros((n_pad,), dtype=bool)
    valid[:n] = True

    if _KNN_FN is None:
        _KNN_FN = _build_knn_fn()
    if device is not None:
        X = jax.device_put(X, device)
        valid = jax.device_put(valid, device)
    dist, idx = _KNN_FN(X, valid, k=k, block=block)
    # fetch to host (this is also the only reliable sync through axon)
    dist = np.asarray(dist, dtype=np.float64)[:n]
    idx = np.asarray(idx, dtype=np.int64)[:n]
    return dist, idx
