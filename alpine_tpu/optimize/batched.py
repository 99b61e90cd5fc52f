"""vmap-batched cross-validation folds for the ComponentOptimizer.

The reference runs each trial's k CV folds sequentially — k complete ALPINE
trainings one after another in a Python loop
(`/root/reference/alpine/optimization.py:241-283`).  At CV-fold sizes a TPU
is badly underutilized by a single fit, so here all folds of a trial run as
ONE jitted program via `jax.vmap` over the fold axis (SURVEY.md §2
"TPU-native equivalents (b)": batched trials/folds via vmap over the W/H/B
pytrees).

Mechanics:
- train/validation matrices are zero-padded to the max fold size and
  stacked on a leading fold axis.  Zero cell-columns are exactly neutral in
  every MU numerator/denominator (the same argument as the minibatch
  padding in ops/mu.py), so padded fits follow the same trajectories as
  unpadded ones up to the shared initialization.
- W0/H0/Bs0 are drawn once from the trial seed and broadcast across folds
  (the reference also re-seeds identically per fold, main.py:440-442, but
  draws shapes per fold; a shared padded init is the documented batched
  equivalent).
- the per-fold validation transform is vmapped the same way; only the
  unguided embeddings return to host, where Leiden scoring runs per fold.

TPE itself stays sequential (it conditions on all previous trials —
batching across trials would change the algorithm; the reference has the
same property)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alpine_tpu.ops import mu
from alpine_tpu.utils import sampling


def _fold_sharding(mesh, n_folds: int):
    """NamedShardings placing the leading fold axis across the mesh's single
    axis.  The device count must DIVIDE n_folds for an even partition, so we
    use the largest divisor of n_folds that fits the mesh; returns None when
    that is 1 (no useful sharding)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    avail = mesh.devices.size
    use = max(d for d in range(1, min(avail, n_folds) + 1) if n_folds % d == 0)
    if use <= 1:
        return None
    sub = Mesh(mesh.devices.ravel()[:use], (mesh.axis_names[0],))
    ax = sub.axis_names[0]
    return (lambda ndim: NamedSharding(sub, P(ax, *([None] * (ndim - 1)))),
            NamedSharding(sub, P()))


@dataclass
class FoldData:
    """Stacked, zero-padded, device-placed CV fold tensors.

    These depend only on (adata, folds, weighted, mesh) — NOT on a trial's
    hyperparameters — so the optimizer builds them ONCE per search
    (prepare_fold_data) instead of re-stacking and re-uploading the data
    tensors on every TPE trial."""

    folds: Sequence[Tuple[np.ndarray, np.ndarray]]
    g: int
    n_labels: Tuple[int, ...]
    n_tr: int
    n_va: int
    Xtr: jax.Array              # (n_folds, g, n_tr), stored at x_dtype
    Xva: jax.Array              # (n_folds, g, n_va), at x_dtype's COMPUTE width
    Ystr: Tuple[jax.Array, ...]  # each (n_folds, labels_i, n_tr)
    weights: Optional[jax.Array]  # (n_folds, n_tr) or None
    valid_cols: jax.Array       # (n_folds, 1, n_tr) bool: real vs pad cells
    put_rep: callable
    put_fold: callable
    x_dtype: str = "float32"    # storage dtype name (mu.x_storage_dtype)
    tile: int = 0               # >0: folds staged for "tiled" sampling


def prepare_fold_data(
    X_cells_by_genes: np.ndarray,
    Ys_cells_by_labels: Sequence[np.ndarray],
    folds: Sequence[Tuple[np.ndarray, np.ndarray]],
    *,
    weighted: bool,
    mesh=None,
    device=None,
    x_dtype: str = "float32",
    tile: int = 0,
    shuffle_seed: int = 0,
) -> FoldData:
    """Build the trial-invariant stacked fold tensors and place them.
    `mesh` shards the fold axis across a 1-D mesh; `device` (a jax.Device)
    pins everything to that device — without it an explicit
    ComponentOptimizer(device="cpu") would silently run its batched fits on
    the default accelerator.

    `x_dtype` stores the stacked training X (and Ys) at the narrow storage
    width (2-4x less device memory for the ~n_splits dataset copies kept
    across a whole search, and narrower X-sided matmuls in the fits); the
    validation X is stored at the corresponding COMPUTE width (the
    projection reads it as a plain float operand).  Integer dtypes assume
    the caller resolved them from validated count data (the optimizer uses
    utils.adata.suggest_data_dtype over the full dataset — every fold
    subset is then exactly representable).

    `tile > 0` stages the folds for "tiled" minibatch sampling
    (mu.MUConfig.tile): the common training width is rounded up to a tile
    multiple (zero pad-columns are exactly neutral — same argument as the
    fold padding itself) and each fold's training columns get a seeded
    per-fold shuffle, the batched equivalent of the model layer's global
    cell pre-shuffle (models/alpine.py cell_perm): stratified fold indices
    arrive grouped by class, so without it every tile of adjacent columns
    would be a biased cluster sample.  The training H is never returned
    from the batched CV fit, so no un-permute is needed; per-fold DISTINCT
    shuffles also decorrelate the fold fits' shared tile-permutation key."""
    if tile and weighted:
        raise ValueError("tiled and weighted sampling are exclusive")
    n_folds = len(folds)
    g = X_cells_by_genes.shape[1]
    # asarray, not astype: astype always copies, and X is usually float32
    # already — at atlas scale the avoidable copy is GBs of host RSS
    X_all = np.asarray(X_cells_by_genes, np.float32)
    Ys_all = [np.asarray(y, np.float32) for y in Ys_cells_by_labels]
    n_labels = tuple(y.shape[1] for y in Ys_all)
    storage_dt = np.dtype(mu.x_storage_dtype(x_dtype))
    compute_dt = np.dtype(mu.x_compute_dtype(storage_dt))

    n_tr = max(len(tr) for tr, _ in folds)
    n_va = max(len(va) for _, va in folds)
    if tile:
        n_tr = -(-n_tr // tile) * tile  # tile-aligned cell axis (mu._tiled_setup)

    # stage DIRECTLY at the target widths (assignment casts per fold
    # slice): staging everything float32 and casting at upload would hold
    # n_folds stacked f32 copies PLUS the narrow copy at peak — ~4-5x the
    # transient host memory of a narrow-dtype search.  Integer casts
    # truncate, which is exact here: the caller resolved integer dtypes
    # from validated counts, so every value is an exact small integer.
    Xtr = np.zeros((n_folds, g, n_tr), storage_dt)
    Xva = np.zeros((n_folds, g, n_va), compute_dt)
    Ystr = [np.zeros((n_folds, nl, n_tr), storage_dt) for nl in n_labels]
    weights = np.zeros((n_folds, n_tr), np.float32) if weighted else None
    for f, (tr, va) in enumerate(folds):
        if tile:
            perm = np.random.default_rng(shuffle_seed + f).permutation(len(tr))
            tr = np.asarray(tr)[perm]
        Xtr[f, :, : len(tr)] = X_all[tr].T
        Xva[f, :, : len(va)] = X_all[va].T
        for i, y in enumerate(Ys_all):
            Ystr[i][f, :, : len(tr)] = y[tr].T
        if weighted:
            ids = sampling.joint_label_ids([y[tr].T for y in Ys_all])
            w = sampling.balanced_sample_probabilities(ids)
            weights[f, : len(tr)] = w / w.sum()

    # optional fold-axis device parallelism: shard the stacked fold tensors
    # across a 1-D mesh so each device fits (a subset of) the folds — the
    # TPU-slice equivalent of running the reference's sequential fold loop
    # on k GPUs at once (SURVEY.md §2 equivalents (b))
    put_fold = put_rep = None
    if mesh is not None and n_folds > 1:
        sharding = _fold_sharding(mesh, n_folds)
        if sharding is not None:
            fold_sh, rep_sh = sharding
            put_fold = lambda x: jax.device_put(x, fold_sh(x.ndim))
            put_rep = lambda x: jax.device_put(x, rep_sh)
    if put_fold is None:
        # no usable fold sharding: still honor the requested placement —
        # a mesh whose device count doesn't divide the folds falls back to
        # its first device, never silently to the JAX default
        if device is None and mesh is not None:
            device = mesh.devices.flat[0]
        if device is not None:
            put_fold = put_rep = lambda x: jax.device_put(x, device)
        else:
            put_fold = put_rep = lambda x: x

    col = np.arange(n_tr)[None, None, :]
    tr_sizes = np.asarray([len(tr) for tr, _ in folds])[:, None, None]
    return FoldData(
        folds=folds, g=g, n_labels=n_labels, n_tr=n_tr, n_va=n_va,
        # already staged at the narrow widths above — the upload is also
        # what lands on device (no transient f32 double-residency host- or
        # device-side); one-hot Ys are exact in any storage dtype
        Xtr=put_fold(jnp.asarray(Xtr)),
        Xva=put_fold(jnp.asarray(Xva)),
        Ystr=tuple(put_fold(jnp.asarray(y)) for y in Ystr),
        weights=put_fold(jnp.asarray(weights)) if weighted else None,
        valid_cols=put_fold(jnp.asarray(col < tr_sizes)),
        put_rep=put_rep, put_fold=put_fold, x_dtype=x_dtype, tile=tile,
    )


def batched_fold_embeddings(
    X_cells_by_genes: np.ndarray = None,
    Ys_cells_by_labels: Sequence[np.ndarray] = None,
    folds: Sequence[Tuple[np.ndarray, np.ndarray]] = None,
    *,
    blocks: Tuple[int, ...],
    lam: Sequence[float],
    orth_w: float,
    alpha_w: float,
    l1_ratio: float,
    eps: float,
    loss_kl: bool,
    use_als: bool,
    batch_size,
    weighted: bool,
    max_iter: int,
    weighted_counts: bool = False,
    scale: bool,
    seed: int,
    precision: str = "highest",
    mesh=None,
    true_blocks: Tuple[int, ...] = None,
    fold_data: Optional[FoldData] = None,
    x_dtype: str = "float32",
    tile: int = 0,
) -> List[np.ndarray]:
    """Fit one model per fold (batched) and return each fold's validation
    unguided embedding as (n_val_fold, k_unguided) numpy arrays.

    When `true_blocks` is given, `blocks` is a bucket-padded shape
    (mu.bucket_blocks) compiled once per bucket across optimizer trials;
    phantom components are zero-initialized (exactly neutral,
    tests/test_bucketing.py) and sliced off the returned embeddings.

    Pass a prebuilt `fold_data` (prepare_fold_data) to skip re-stacking and
    re-uploading the trial-invariant data tensors — the optimizer does this
    once per search."""
    if true_blocks is None:
        true_blocks = blocks
    if fold_data is None:
        fold_data = prepare_fold_data(
            X_cells_by_genes, Ys_cells_by_labels, folds,
            weighted=weighted, mesh=mesh, x_dtype=x_dtype,
            tile=tile, shuffle_seed=seed,
        )
    fd = fold_data
    n_folds = len(fd.folds)
    if fd.tile:
        # same contract as the model layer (models/alpine.py): tiled IS a
        # minibatch mode — a batch covering any training fold would run
        # that fold full-batch while claiming the tiled mode
        min_tr = min(len(tr) for tr, _ in fd.folds)
        if batch_size is None or batch_size >= min_tr:
            raise ValueError(
                "sampling_method='tiled' is a minibatch mode: batch_size "
                f"must be smaller than every training fold ({min_tr} cells)."
            )

    cfg = mu.MUConfig(
        blocks=blocks,
        n_labels=fd.n_labels,
        n_cells=fd.n_tr,
        loss_kl=loss_kl,
        use_als=use_als,
        batch_size=None if (batch_size is None or batch_size >= fd.n_tr)
        else batch_size,
        weighted=weighted,
        # choice-identical per-fold counts (mu.multinomial_counts): fold
        # scores match the gathered 'weighted' path to float noise, with
        # no per-epoch gathers (the grouped-table sampler is not used
        # here — per-fold joint-group counts can differ, breaking vmap)
        weighted_counts=weighted_counts,
        tile=fd.tile,
        max_iter=max_iter,
        precision=precision,
        # storage regime of the (possibly prebuilt) fold tensors, not the
        # call's default — a mismatch would silently re-cast X in-jit
        x_dtype=fd.x_dtype,
        backend="xla",  # the fused pallas path is single-program; vmap uses XLA
    )
    key = jax.random.PRNGKey(seed)
    init_key, fit_key = jax.random.split(key)
    W0, H0, Bs0 = mu.init_matrices(cfg, fd.g, init_key, eps)
    if true_blocks != blocks:
        W0, H0, Bs0 = mu.mask_block_padding(blocks, true_blocks, W0, H0, Bs0)
    # zero out H0's padded columns PER FOLD: a phantom cell with nonzero H
    # would contribute to HHt / rowsum(H) on the first iteration, breaking
    # the zero-padding neutrality argument.  With zero columns the padding
    # is exactly neutral (see tests/test_batched.py padding-neutrality).
    H0_stack = jnp.where(fd.valid_cols,
                         jnp.broadcast_to(H0, (n_folds,) + H0.shape), 0.0)
    hyper = (
        jnp.asarray(np.asarray(lam, np.float32)),
        jnp.float32(orth_w), jnp.float32(alpha_w), jnp.float32(l1_ratio),
        jnp.float32(eps),
    )

    in_axes = (None, 0, None, 0, 0, None, None, 0 if weighted else None)
    vfit = jax.vmap(
        lambda W, H, Bs, X, Ys, hy, k, w: mu.fit_scan(cfg, W, H, Bs, X, Ys, hy, k, w),
        in_axes=in_axes,
    )
    Ws, Hs, Bss, _ = vfit(
        fd.put_rep(W0), fd.put_fold(H0_stack),
        tuple(fd.put_rep(b) for b in Bs0),
        fd.Xtr, fd.Ystr, hyper, fit_key,
        fd.weights if weighted else None,
    )

    if scale:
        Ws, Hs, Bss = jax.vmap(lambda W, H, Bs: mu.scale_matrices(cfg, W, H, Bs))(
            Ws, Hs, Bss
        )

    # batched validation transform (reference main.py:678-724 per fold);
    # key derivation must not collide with fit_key = split(key)[1] (see
    # mu.transform_key) and must match the model layer's transform draw
    t_key = mu.transform_key(key)
    H0v = jnp.maximum(
        jax.random.uniform(t_key, (sum(blocks), fd.n_va), dtype=jnp.float32), eps
    )
    vtrans = jax.vmap(
        lambda W, X: mu.transform_scan(W, X, H0v, jnp.float32(eps),
                                       n_iter=max_iter, precision=precision),
        in_axes=(0, 0),
    )
    Hva = np.asarray(jax.device_get(vtrans(Ws, fd.Xva)))

    # genuine unguided rows: the first true_blocks[-1] rows of the (possibly
    # bucket-padded) last block; phantom rows are exactly zero
    off_last = sum(blocks[:-1])
    k_unguided = true_blocks[-1]
    out = []
    for f, (_, va) in enumerate(fd.folds):
        out.append(Hva[f, off_last:off_last + k_unguided, : len(va)].T.copy())
    return out
