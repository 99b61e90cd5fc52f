"""Epoch/minibatch sampling utilities.

Mirrors the behavior of the reference sampler
(`/root/reference/alpine/utils/sampling.py`):

- "random": a fresh permutation of all cells per iteration (sampling.py:14)
- "weighted": class-balanced sampling WITH replacement over the joint
  covariate labels (sampling.py:18-33), where the joint label of a cell is
  the tuple of per-covariate one-hot argmaxes (sampling.py:36-55 — a Python
  per-sample loop in the reference; vectorized here with mixed-radix mixing)

Index generation itself happens on device inside the jitted fit scan
(`alpine_tpu/ops/mu.py:fit_scan`); this module provides the host-side weight
computation plus numpy equivalents of the reference's helper API.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def joint_label_ids(Ys: Sequence[np.ndarray]) -> np.ndarray:
    """Vectorized joint-label construction.  ``Ys[i]`` is (labels_i, cells);
    a cell's joint label id identifies its tuple of per-covariate argmaxes.
    All-zero columns (NaN covariates) take argmax 0, matching torch.argmax on
    a zero vector (reference sampling.py:49).

    Implementation: unique-row factorization of the (cells, n_cov) argmax
    codes — collision-free for any covariate count/cardinality (a
    mixed-radix int64 mix would silently wrap once the radix product
    exceeds 2^63, e.g. 10 covariates x 100 labels).  Only grouping
    identity matters downstream (balanced_sample_probabilities counts per
    group), so the id values themselves are arbitrary."""
    if not Ys:
        raise ValueError("joint_label_ids requires at least one dummy matrix")
    codes = np.stack([np.argmax(Y, axis=0) for Y in Ys], axis=1)
    _, ids = np.unique(codes, axis=0, return_inverse=True)
    return ids.astype(np.int64).reshape(-1)


def create_joint_labels_from_dummy_matrices(Ys: Sequence[np.ndarray]) -> List[str]:
    """String-form joint labels, API-compatible with the reference helper
    (sampling.py:36-55): 'cov{i}_label{j}' parts joined with '+'."""
    argmaxes = [np.argmax(np.asarray(Y), axis=0) for Y in Ys]
    n = argmaxes[0].shape[0] if argmaxes else 0
    return [
        "+".join(f"cov{t}_label{argmaxes[t][s]}" for t in range(len(Ys)))
        for s in range(n)
    ]


def balanced_sample_probabilities(joint_ids: np.ndarray) -> np.ndarray:
    """Per-cell sampling probabilities equivalent to
    sklearn ``compute_sample_weight("balanced")`` followed by torch's
    ``WeightedRandomSampler`` normalization (reference sampling.py:22-33):
    weight_i = n / (n_classes * count[class_i]), normalized to sum 1."""
    _, inv, counts = np.unique(joint_ids, return_inverse=True, return_counts=True)
    w = len(joint_ids) / (len(counts) * counts[inv].astype(np.float64))
    w /= w.sum()
    return w.astype(np.float32)


def joint_label_codes(Ys: Sequence[np.ndarray]) -> np.ndarray:
    """Per-cell GLOBALLY CANONICAL joint-label codes: mixed-radix int over
    the per-covariate one-hot argmaxes, first covariate most significant —
    exactly the lexicographic order ``np.unique(codes, axis=0)`` sorts by,
    so sorting cells by this code reproduces joint_label_ids' group order.

    Unlike joint_label_ids (whose ids depend on which groups are PRESENT in
    the local data), the code of a label tuple is the same on every process
    — multi-process weighted_fast uses it to agree on a global group
    enumeration without exchanging cells.  Codes are transported across
    processes as float64, so the radix product must stay below 2^53."""
    if not Ys:
        raise ValueError("joint_label_codes requires at least one dummy matrix")
    radices = [int(Y.shape[0]) for Y in Ys]
    prod = 1
    for r in radices:
        prod *= max(r, 1)
    if prod >= 2 ** 53:
        raise ValueError(
            "multi-process weighted_fast needs a canonical joint-label code, "
            f"but the joint label space ({'x'.join(map(str, radices))} = "
            f"{prod}) exceeds 2^53; use sampling_method='random' or fewer/"
            "coarser covariates."
        )
    code = np.zeros(Ys[0].shape[1], dtype=np.int64)
    for Y in Ys:
        code = code * int(Y.shape[0]) + np.argmax(Y, axis=0).astype(np.int64)
    return code


def check_group_sizes(sizes: np.ndarray) -> None:
    """The grouped balanced sampler draws within-group positions as
    floor(float32_uniform * m_g); above 2^24 cells per group float32
    granularity makes some positions unreachable and silently biases the
    draw.  Single guard shared by balanced_group_tables and the
    multi-process layout builder."""
    if len(sizes) and int(np.max(sizes)) >= 2 ** 24:
        raise ValueError(
            f"weighted_fast supports joint-label groups up to 2^24 cells "
            f"(largest group here: {int(np.max(sizes))}); use "
            "sampling_method='weighted' for larger groups."
        )


def window_group_tables(start_span: np.ndarray, sizes_span: np.ndarray,
                        base_off: np.ndarray, n_windows: int,
                        width: int) -> np.ndarray:
    """Per-window [start_loc, off, m_loc] tables for the grouped balanced
    sampler's window form (ops.mu.grouped_balanced_counts, 4-tuple tables):
    subdivide one contiguous group-sorted SPAN of cells — the whole padded
    dataset on a single-host mesh, or one process's padded chunk
    multi-process — into ``n_windows`` contiguous windows of ``width``
    columns (device shards; the span tail may be zero-padding, which no
    group covers).

    ``start_span[g]``/``sizes_span[g]`` are group g's start column and cell
    count within the span; ``base_off[g]`` is the span's own within-group
    global offset (0 for a whole-dataset span; for a multi-process chunk,
    the group's total count in earlier chunks).  Returns int32
    (n_windows, 3, J): window w covers span columns [w·width, (w+1)·width)
    and holds group g's global within-group positions [off, off + m_loc)
    at local columns [start_loc, start_loc + m_loc)."""
    start = np.asarray(start_span, np.int64)[None, :]
    size = np.asarray(sizes_span, np.int64)[None, :]
    base = np.asarray(base_off, np.int64)[None, :]
    w = np.arange(int(n_windows), dtype=np.int64)[:, None] * int(width)
    lo = np.clip(w, start, start + size)
    hi = np.clip(w + int(width), start, start + size)
    return np.stack([lo - w, base + (lo - start), hi - lo],
                    axis=1).astype(np.int32)


def balanced_group_tables(joint_ids: np.ndarray):
    """(order, start, sizes) for the grouped balanced sampler
    (ops.mu.grouped_balanced_counts): `order` sorts cells by joint group
    (stable — within-group caller order preserved), after which group g
    occupies columns [start[g], start[g] + sizes[g]).  The model layer
    applies `order` as its weighted_fast cell_perm and ships
    (start, sizes) to the device."""
    ids = np.asarray(joint_ids)
    order = np.argsort(ids, kind="stable")
    _, sizes = np.unique(ids, return_counts=True)
    check_group_sizes(sizes)
    start = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    return (order.astype(np.int64), start.astype(np.int32),
            sizes.astype(np.int32))


def generate_epoch_indices(
    joint_labels, sampling_method: str, rng: np.random.Generator
) -> np.ndarray:
    """Host-side numpy equivalent of the reference entry point
    (sampling.py:6-16).  The production path generates indices on device;
    this exists for API parity and tests."""
    n = len(joint_labels)
    if sampling_method == "random":
        return rng.permutation(n)
    if sampling_method == "weighted":
        # np.unique gives a deterministic, collision-free grouping of the
        # string labels (hash() is process-salted and collision-prone)
        _, ids = np.unique(np.asarray(joint_labels), return_inverse=True)
        # renormalize in float64 (divide by the FLOAT64 sum): dividing the
        # f64 vector by the float32 p.sum() leaves a ~1e-7 residual that
        # intermittently exceeds np.random.choice's sqrt(eps) tolerance
        # and raises "probabilities do not sum to 1"
        p64 = balanced_sample_probabilities(ids).astype(np.float64)
        return rng.choice(n, size=n, replace=True, p=p64 / p64.sum())
    raise ValueError(
        f"Unknown sampling method: {sampling_method}. Only 'weighted', and 'random' are supported."
    )


def get_batch_indices(epoch_indices: np.ndarray, batch_num: int, batch_size: int) -> np.ndarray:
    """Contiguous chunk of the epoch permutation (reference sampling.py:58-67)."""
    start = batch_num * batch_size
    end = min(start + batch_size, len(epoch_indices))
    if start >= len(epoch_indices):
        return np.empty(0, dtype=np.int64)
    return epoch_indices[start:end]


def get_num_batches(total_samples: int, batch_size: int) -> int:
    """Ceiling division (reference sampling.py:70-71)."""
    return (total_samples + batch_size - 1) // batch_size
