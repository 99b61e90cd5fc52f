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
fit data: euclidean distances, self included (pinned first), ascending
order, ties broken by lower index.  Candidate SELECTION uses the
|x|² + |y|² − 2·x·y expansion (same as sklearn's brute path) in float32
with HIGHEST matmul precision, computed on MEAN-CENTERED coordinates:
euclidean distances are translation-invariant, and centering shrinks the
expansion's cancellation loss from ~d·2⁻²⁴·‖x‖² (NMF embeddings are
all-nonnegative, so raw norms sit far from the origin) to the same bound
at the data's intrinsic radius ‖x−μ‖ — the selection ranking resolves the
k-boundary at that much finer scale.  The selected k distances are then
REFINED by direct subtraction of the RAW coordinates, which is
bitwise-exact zero for duplicate rows (downstream UMAP rho handling
depends on it) and accurate to the scale of the *difference* for near
neighbours.  The residual inexactness is selection-only: a true neighbour
is lost only if more than the 2k+8 oversampled candidates crowd within
centered-expansion noise of the k-th distance.

Placement is explicit: pass `device=` (repo invariant — an explicit device
is never silently ignored); the embedding travels as an argument, never a
baked constant (axon HTTP-413 rule).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import numpy as np


def _build_knn_fn():
    import jax
    import jax.numpy as jnp
    from jax import lax

    @partial(jax.jit, static_argnames=("k", "block"))
    def knn(X, mean, valid, k: int, block: int):
        n_pad, _ = X.shape
        nb = n_pad // block
        # oversample the expansion-ranked candidates: the refinement pass
        # (below) re-measures them exactly, so expansion noise at the top-k
        # boundary only matters if a true neighbour falls outside the top-ks
        # ranking — a much wider distance margin
        ks = min(2 * k + 8, n_pad)
        # selection runs on centered coordinates (distance-invariant; see
        # module docstring) — refinement below uses the RAW X
        Xc = X - mean[None, :]
        sq = (Xc * Xc).sum(axis=1)  # (n_pad,)
        Xb = X.reshape(nb, block, X.shape[1])
        Xcb = Xc.reshape(nb, block, X.shape[1])
        validb = valid.reshape(nb, block)
        sqb = sq.reshape(nb, block)
        row_ids = jnp.arange(n_pad, dtype=jnp.int32)

        def step(carry, inp):
            best_s, best_i = carry  # (n_pad, ks) similarity = -dist², ids
            Yb, vb, sqy, base = inp
            dots = lax.dot_general(
                Xc, Yb, (((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST)  # (n_pad, block)
            s = 2.0 * dots - sq[:, None] - sqy[None, :]
            cols = base + jnp.arange(block, dtype=jnp.int32)
            s = jnp.where(vb[None, :], s, -jnp.inf)
            # the self column always ranks first (true distance is 0; the
            # expansion can leave float dust there)
            s = jnp.where(cols[None, :] == row_ids[:, None], jnp.inf, s)
            bs, bpos = lax.top_k(s, min(ks, block))
            bi = cols[bpos]
            cat_s = jnp.concatenate([best_s, bs], axis=1)
            cat_i = jnp.concatenate([best_i, bi], axis=1)
            ms, mpos = lax.top_k(cat_s, ks)
            mi = jnp.take_along_axis(cat_i, mpos, axis=1)
            return (ms, mi), None

        init = (jnp.full((n_pad, ks), -jnp.inf, X.dtype),
                jnp.zeros((n_pad, ks), jnp.int32))
        bases = (jnp.arange(nb, dtype=jnp.int32) * block)
        (best_s, best_i), _ = lax.scan(step, init, (Xcb, validb, sqb, bases))

        # refine the selected candidates by direct subtraction: the
        # expansion's cancellation error (~d·2⁻²⁴·‖x‖²) is fine for RANKING
        # but reports near neighbours at noise-level distances; the
        # difference form is exact 0 for duplicate rows and accurate at the
        # difference's own scale.  O(n·ks·d) — negligible vs the O(n²·d)
        # search, blocked so the (block, ks, d) gather never materialises
        # at full n
        def refine(carry, inp):
            xb, bi, bs = inp
            diff = xb[:, None, :] - X[bi]
            d2 = jnp.sum(diff * diff, axis=-1)
            d2 = jnp.where(bs == -jnp.inf, jnp.inf, d2)  # unfilled slots
            return carry, d2
        _, d2 = lax.scan(
            refine, 0,
            (Xb, best_i.reshape(nb, block, ks),
             best_s.reshape(nb, block, ks)))
        d2 = d2.reshape(n_pad, ks)

        # final top-k on the REFINED distances, ascending with sklearn's tie
        # rule (lower index first); self stays pinned to column 0 (kernel
        # contract — scoring drops self by INDEX, so duplicate twins after
        # it are handled either way)
        # (guard on filled slots: unfilled -inf entries carry the init
        # best_i = 0, which must not inherit row 0's self pin)
        sort_key = jnp.where(
            (best_i == row_ids[:, None]) & (best_s != -jnp.inf), -1.0, d2)
        order = jnp.lexsort((best_i, sort_key), axis=-1)[:, :k]
        d2 = jnp.take_along_axis(d2, order, axis=1)
        best_i = jnp.take_along_axis(best_i, order, axis=1)
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
    # mean over the REAL rows (float64 accumulate), used only to center the
    # selection-ranking coordinates on device — pad rows are valid-masked
    mean = emb.mean(axis=0, dtype=np.float64).astype(np.float32)

    if _KNN_FN is None:
        _KNN_FN = _build_knn_fn()
    if device is not None:
        X = jax.device_put(X, device)
        mean = jax.device_put(mean, device)
        valid = jax.device_put(valid, device)
    dist, idx = _KNN_FN(X, mean, valid, k=k, block=block)
    # fetch to host (this is also the only reliable sync through axon)
    dist = np.asarray(dist, dtype=np.float64)[:n]
    idx = np.asarray(idx, dtype=np.int64)[:n]
    return dist, idx
