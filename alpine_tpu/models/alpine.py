"""The ALPINE estimator — sklearn-style semi-supervised NMF, TPU-native.

API parity target: class `ALPINE` in `/root/reference/alpine/main.py:46-781`
(constructor args main.py:47-61; fit :82; transform :149; fit_transform :169;
compute_loss :187; get_decomposed_matrices :238; get_covariate_gene_scores
:246; get_normalized_expression :275; store_embeddings :303).  Matches the
reference signature-for-signature, error-message-for-error-message, and
obsm/varm/layers-key-for-key, with these documented divergences:

- `device` accepts "cpu"/"tpu"/"gpu"/"auto"/a `jax.Device`/a 1-D
  `jax.sharding.Mesh` ("cuda"/"mps" are accepted as aliases of the default
  accelerator so reference call sites run unchanged).  Passing a Mesh shards
  the cell axis of X/H/Y across it (see `alpine_tpu/parallel/mesh.py`).
- RNG: JAX threaded PRNG keyed on `random_state` replaces torch's global
  seed; draws differ from torch, so parity is defined on update math and
  convergence quality, not bitwise trajectories (SURVEY.md §7 hard part 1).
- the `batch_size`/`max_iter` fit-arg validation bug of the reference
  (`and` where `or` was meant, main.py:420-428, so the checks never fire) is
  fixed here: invalid values actually raise.
- `matmul_precision` (extra kwarg, default "highest") selects true-f32 MXU
  matmuls; "default" allows XLA's fast TPU path for throughput runs.
- `data_dtype` (extra kwarg, default "auto"): X storage in HBM.  "auto"
  resolves per dataset at fit time (utils.adata.suggest_data_dtype):
  validated integer counts — the typical raw single-cell input — store as
  the narrowest EXACT integer dtype (int8/int16; zero numerics risk, 2-4x
  less traffic on the X passes that dominate each iteration), fractional
  data stays float32.  The resolution is recorded as `data_dtype_`;
  explicit "float32"/"bfloat16"/"int8"/"int16" override it.

Training runs as a single jitted `lax.scan` (see `alpine_tpu/ops/mu.py`);
the per-iteration loss history is accumulated on device and fetched once
(versus the reference's per-epoch `.item()` host syncs, main.py:731-747).
"""

from __future__ import annotations

import os
import warnings
from copy import copy, deepcopy
from dataclasses import replace
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
import numpy as np
import pandas as pd

from alpine_tpu import profiling
from alpine_tpu.cache import enable_compilation_cache

enable_compilation_cache()
from alpine_tpu.io.checkpoint import FitCheckpointer, load_model, save_model
from alpine_tpu.models.state import AlpineMatrices, split_h, split_w
from alpine_tpu.ops import mu, pallas_kernels
from alpine_tpu.ops.elbow import find_elbow
from alpine_tpu.parallel.mesh import Placement, resolve_device
from alpine_tpu.utils import sampling
from alpine_tpu.cache import env_flag
from alpine_tpu.utils.adata import (
    dense_x, is_anndata, is_sparse_x, suggest_data_dtype, x_min,
)
from alpine_tpu.utils.encoder import FeatureEncoders

Float32Array = np.ndarray


class ALPINE:
    def __init__(
        self,
        n_components: int,
        n_covariate_components: List[int],
        lam: List[float],
        orth_W: float = 0.0,
        alpha_W: float = 0.0,
        l1_ratio_W: float = 0.0,
        use_als: bool = False,
        scale_needed: bool = True,
        loss_type: str = "kl-divergence",
        device="auto",
        eps: float = 1e-6,
        random_state: int = 42,
        matmul_precision: str = "highest",
        data_dtype: str = "auto",
        component_bucket: Optional[int] = None,
    ):
        self.n_components = n_components
        self.n_covariate_components = n_covariate_components
        self.lam = lam
        self.orth_W = orth_W
        self.alpha_W = alpha_W
        self.l1_ratio_W = l1_ratio_W
        self.use_als = use_als
        self.scale_needed = scale_needed
        self.device = resolve_device(device)
        enable_compilation_cache(allow_backend_check=True)
        self.loss_type = loss_type
        self.eps = eps
        self.random_state = random_state
        self.matmul_precision = matmul_precision
        self.data_dtype = data_dtype
        # Compile block shapes padded beyond the true sizes (phantom
        # components are zero-initialized — exactly neutral, see
        # mu.mask_block_padding / tests/test_bucketing.py) so optimizer
        # trials with nearby component splits reuse ONE compiled program
        # instead of paying a 20-120 s remote TPU compile per trial.
        # int N: each block rounds up to a multiple of N; an explicit tuple
        # gives the padded size per block (>= true size); None (default)
        # compiles exact shapes.  Stored matrices are always true-sized.
        if isinstance(component_bucket, (tuple, list)):
            component_bucket = tuple(int(b) for b in component_bucket)
            true = tuple(n_covariate_components) + (n_components,)
            if len(component_bucket) != len(true) or any(
                b < t for b, t in zip(component_bucket, true)
            ):
                raise ValueError(
                    "component_bucket tuple must give a padded size >= the "
                    "true size for every block (covariates first, unguided "
                    "last)."
                )
        elif component_bucket is not None and (
            not isinstance(component_bucket, int) or component_bucket < 1
        ):
            raise ValueError(
                "component_bucket must be a positive integer, a tuple of "
                "padded block sizes, or None."
            )
        self.component_bucket = component_bucket

        self._validate_init_args()

        # derived attributes (reference main.py:79-80)
        self.n_all_components = self.n_covariate_components + [self.n_components]
        self.total_components = sum(self.n_all_components)

    # ------------------------------------------------------------------ fit
    def fit(
        self,
        adata,
        covariate_keys: List[str],
        batch_size: Optional[int] = None,
        max_iter: Optional[int] = None,
        sampling_method: str = "random",
        verbose: bool = False,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 50,
        checkpoint_backend: str = "npz",
        n_restarts: int = 1,
    ) -> "ALPINE":
        self._validate_fit_args(
            adata, covariate_keys, batch_size, max_iter, sampling_method, verbose
        )
        if checkpoint_dir is not None and not isinstance(checkpoint_dir, str):
            raise TypeError("checkpoint_dir must be a string or None.")
        if not isinstance(checkpoint_every, int) or checkpoint_every <= 0:
            raise ValueError("checkpoint_every must be a positive integer.")
        if not isinstance(n_restarts, int) or n_restarts <= 0:
            raise ValueError("n_restarts must be a positive integer.")
        if n_restarts > 1 and checkpoint_dir is not None:
            raise ValueError("n_restarts > 1 is incompatible with checkpointing.")
        if n_restarts > 1 and self._mesh_devices() > 1:
            # reject BEFORE the X upload/padding (the deep check in
            # _run_restarts would otherwise fire only after an atlas-scale
            # transfer, or crash in device_put on non-divisible cell counts)
            raise ValueError(
                "n_restarts > 1 is not supported with a sharded (Mesh) device."
            )
        if checkpoint_dir is not None and checkpoint_backend not in ("npz", "orbax"):
            # FitCheckpointer would raise this anyway — but only after the
            # atlas-scale upload and a possible 200-iteration warm-up fit
            raise ValueError("checkpoint backend must be 'npz' or 'orbax'")
        if sampling_method in ("weighted", "weighted_fast") and not covariate_keys:
            raise ValueError(
                "weighted sampling requires at least one covariate "
                "(balancing is over the joint covariate labels)."
            )

        placement = Placement(self.device)
        # multi-process (DCN) fit: every process passes ITS equal-size cell
        # shard as `adata`; arrays are assembled per-process into global
        # sharded arrays (parallel/distributed.py holds the bootstrap and
        # the recipe; tests/test_multiprocess.py the 2-process proof)
        mp = placement.is_multiprocess
        if sampling_method == "tiled" and (
            self.use_als
            or (placement.is_sharded and len(placement.mesh.axis_names) != 1)
        ):
            # tiled sampling is joint-mode only (ALS's block-cyclic batch
            # updates have no tiled trajectory defined or tested) and rides
            # the shard-local minibatch path on meshes; a 2-D mesh cannot
            # take that path and would fall back to global GSPMD gathers —
            # exactly the all-to-all traffic the sharded sampling design
            # forbids (tests/test_sharding.py).  Multi-process 1-D meshes
            # ARE supported: each process applies a seeded LOCAL shuffle to
            # its own chunk (below) and the per-shard tile permutations
            # need no global exchange.
            raise ValueError(
                "tiled sampling requires joint mode on a 1-D cell mesh "
                "(or one device); use sampling_method='random'."
            )
        if sampling_method == "weighted_fast" and self.use_als:
            # the counts strategy (mu.joint_weighted_counts_update) is a
            # FULL-EPOCH reformulation: per-batch counts would cost one
            # full X pass per batch, and ALS's block-cyclic updates have
            # no counts form — reject instead of silently running slower
            # or falling back to a different trajectory.  (A sub-covering
            # batch_size is rejected below once the cell count is known; a
            # covering one is normalized to full-epoch like everywhere
            # else in the stack.)
            raise ValueError(
                "sampling_method='weighted_fast' supports full-epoch joint "
                "mode only (batch_size=None, use_als=False); minibatch or "
                "ALS weighted fits use sampling_method='weighted'."
            )
        if sampling_method == "tiled" and batch_size is None:
            # without a batch size the fit would silently run as a plain
            # full-batch fit (no tile permutation at all) while claiming
            # the tiled mode — reject instead of misrepresenting what ran
            raise ValueError(
                "sampling_method='tiled' is a minibatch mode: pass "
                "batch_size (< n_cells); full-batch fits use "
                "sampling_method='random'."
            )
        if mp and sampling_method == "weighted":
            # the gathered draw needs a seeded GLOBAL pre-shuffle, which
            # needs a host-side cell exchange across processes.
            # weighted_fast has no such need: its counts never gather, so
            # the exact global balanced draw is replicated from the shared
            # key and each process scatter-adds only its own cells' counts
            # (zero communication) — supported multi-process.
            raise ValueError(
                "sampling_method='weighted' is not supported in "
                "multi-process fits; use 'weighted_fast' (the exact "
                "balanced counts strategy — supported multi-process) "
                "or 'random'."
            )
        # mp checkpointing IS supported: each rank snapshots the replicated
        # W/Bs/losses plus its OWN H columns (the global H is never
        # addressable from one process), under a per-rank config tag;
        # resume is collectively validated (run_checkpointed)

        # all fallible preprocessing runs on LOCALS first — a failed re-fit
        # must never leave a previously fitted estimator half-mutated
        # (e.g. a fresh empty encoder paired with the old matrices)
        # (genes x cells) layout, as in the reference (main.py:104);
        # dense_x densifies sparse (CSR/CSC) inputs — capability beyond the
        # reference, which requires a dense ndarray (main.py:395-400)
        X: Float32Array = dense_x(adata.X).T
        n_local = X.shape[1]  # this process's cells (== global unless mp)

        # data_dtype="auto" (the default): validated integer counts store as
        # the narrowest EXACT integer dtype (int8/int16 — zero numerics
        # risk, 2-4x less HBM traffic on the dominant X passes); fractional
        # (normalized/log) data stays float32.  Resolved per dataset; the
        # choice is recorded as `data_dtype_` (used by transform and
        # persisted by save/load) and an explicit data_dtype overrides it.
        resolved_dtype = (
            suggest_data_dtype(adata.X) if self.data_dtype == "auto"
            else self.data_dtype
        )

        fe = FeatureEncoders(covariate_keys)
        Y: List[Float32Array] = fe.fit_transform(adata.obs)
        Ys = [y.T.copy() for y in Y]  # (labels_i, cells), main.py:446-449

        n_sample = n_local
        mp_locals = None  # per-chunk cell counts, ordered along the mesh
        if mp:
            # per-process inputs must be mutually consistent BEFORE the
            # expensive fit: same genes, same device ownership, and
            # identical covariate label sets (hashed — equal counts with
            # different labels would silently misalign the one-hot rows)
            import hashlib

            from alpine_tpu.parallel import distributed as dist

            def label_hash(key):
                blob = "\x1f".join(map(str, fe.encoded_labels[key]))
                return int.from_bytes(
                    hashlib.sha256(blob.encode()).digest()[:6], "big"
                )

            def ctor_digest():
                # every ctor setting the lockstep trajectory depends on:
                # use_als/loss_type/shapes change the compiled psum
                # schedule (mixed fleets hang), scalar hypers are traced
                # but desynchronize the replicated W/Bs (silently wrong
                # results everywhere)
                blob = repr((
                    self.n_components, tuple(self.n_covariate_components),
                    tuple(float(v) for v in np.atleast_1d(self.lam)),
                    float(self.orth_W), float(self.alpha_W),
                    float(self.l1_ratio_W), self.loss_type, self.use_als,
                    self.scale_needed, float(self.eps), self.random_state,
                    self.matmul_precision, self.component_bucket,
                ))
                return int.from_bytes(
                    hashlib.sha256(blob.encode()).digest()[:6], "big"
                )

            # every fit argument that shapes the COLLECTIVE SEQUENCE must
            # be part of this FIRST collective — a mixed fleet would
            # otherwise misalign the sequence itself (silent hang/garbage)
            # before any later check fires:
            #  - data_dtype regime: an "auto" rank runs the harmonization
            #    allgather below, an explicit-dtype rank skips it; differing
            #    explicit dtypes compile different lockstep programs
            #  - checkpoint_dir presence: run_checkpointed's host allgather
            #    of resume states has no counterpart on a non-checkpointing
            #    rank (checkpoint_every additionally keys the snapshot
            #    schedule that the resume validation compares)
            #  - max_iter: None runs a 200-iteration warm-up fit (psums) the
            #    explicit rank never issues; differing values change the
            #    per-iteration psum schedule
            #  - batch_size: full-batch vs minibatch compile different
            #    programs with different collective schedules
            # All must die HERE with a clear error.
            dist.assert_same_across_processes(
                [adata.shape[1], placement.local_cell_shards,
                 mu.DATA_DTYPES.index(self.data_dtype), ctor_digest(),
                 int(checkpoint_dir is not None),
                 checkpoint_every if checkpoint_dir is not None else -1,
                 -1 if max_iter is None else int(max_iter),
                 -1 if batch_size is None else int(batch_size)]
                + [y.shape[0] for y in Ys]
                + [label_hash(k) for k in covariate_keys],
                "per-process fit inputs (gene count, per-process device "
                "count, data_dtype setting, model hyperparameters, "
                "checkpointing, max_iter, batch_size, covariate label "
                "sets)",
            )
            if self.data_dtype == "auto":
                # harmonize: local shards may resolve differently (one
                # shard's max count <= 127, another's not); every process
                # must compile and store under ONE regime — take the widest
                # resolution.  Collective-safe: the assert above guarantees
                # every rank is in auto mode.
                codes = dist.process_allgather_rows(np.asarray(
                    [mu.STORAGE_DTYPES.index(resolved_dtype)], np.int64
                ))
                resolved_dtype = mu.STORAGE_DTYPES[int(codes.max())]
            # shard sizes need NOT be equal (h5ad row-range ingestion gives
            # near-equal ones): collect each chunk's cell count, ordered by
            # its position along the mesh cell axis — this fixes the global
            # cell count, the per-chunk H0 column offsets, and the common
            # padded shard width every process pads to
            mp_locals = dist.chunk_cell_sizes(placement, n_local)
            # an EXPLICIT integer dtype can be un-castable on one shard
            # only (e.g. a count > 127 lives on process 1); that process
            # raising alone would leave the others blocked at the next
            # collective — validate collectively (the shared
            # dtype_can_store predicate) so every process raises.  The
            # gate below is process-uniform (ctor args must match across
            # processes), so skipping is collective-safe; auto-resolved
            # dtypes cannot fail (suggest + harmonization above guarantee
            # representability) and re-scanning X here would double the
            # O(genes·cells) host validation pass for nothing.
            if self.data_dtype != "auto" and resolved_dtype in ("int8",
                                                                "int16"):
                from alpine_tpu.utils.adata import dtype_can_store

                bad = float(not dtype_can_store(resolved_dtype, X))
                if dist.process_allgather_rows(np.asarray([bad])).any():
                    limit = np.iinfo(resolved_dtype).max
                    raise ValueError(
                        f"data_dtype='{resolved_dtype}' cannot represent "
                        "the data on at least one process's shard "
                        f"(requires integer values in [0, {limit}])."
                    )
            n_sample = int(mp_locals.sum())  # GLOBAL cell count

        # commit estimator state only after the encoders fitted
        self.fe = fe
        self.data_dtype_ = resolved_dtype
        if verbose and self.data_dtype == "auto":
            # one copy of the log line per fit, not one per process
            coordinator = True
            if mp:
                from alpine_tpu.parallel import distributed as dist

                coordinator = dist.is_coordinator()
            if coordinator:
                print(f"ALPINE fit: data_dtype='auto' resolved to "
                      f"'{resolved_dtype}'")
        self.feature_names: List[str] = adata.var_names.tolist()
        self.n_features: int = adata.shape[1]
        self.covariate_keys: List[str] = covariate_keys
        self.sampling_method: str = sampling_method
        self.verbose: bool = verbose
        self.batch_size: int = batch_size if batch_size is not None else n_sample

        n_labels = tuple(y.shape[0] for y in Ys)
        # restarts run the XLA (vmapped) path, which needs no tile padding;
        # the sharded kernel path needs tile-aligned shards even unguided.
        # Multi-process: every process pads its LOCAL chunk to one common
        # aligned width (derived from the LARGEST chunk — all processes
        # compute the same target from the allgathered chunk sizes, then
        # each adds its own shortfall); the pads therefore sit interleaved
        # in the global array, which is exactly neutral.
        pad_cells = int(mp_locals.max()) if mp else n_sample
        pad_devices = (placement.local_cell_shards if mp
                       else placement.cell_shards)
        pad = (self._pallas_pad(pad_cells, n_labels, n_devices=pad_devices,
                                include_unguided=placement.is_sharded,
                                global_cells=n_sample)
               if n_restarts == 1 else 0)
        # shard-local minibatch sampling (mu.fit_scan_minibatch_sharded)
        # runs inside shard_map, which needs equal cell shards
        shard_local_mb = (
            n_restarts == 1
            and placement.is_sharded
            and len(placement.mesh.axis_names) == 1
            and not self.use_als
            and (self.batch_size < n_sample
                 or sampling_method in ("weighted", "weighted_fast"))
        )
        if mp and self.use_als and self.batch_size < n_sample:
            # ALS is excluded from the shard-local sampler (no tested
            # block-cyclic minibatch trajectory there), and the global
            # sampler (fit_scan) assumes cell padding is a SUFFIX —
            # multi-process chunks pad interleaved, so it would sample pad
            # columns and never train the displaced real cells (silently
            # wrong embeddings).  Process-uniform raise: use_als and
            # batch_size were asserted equal in the first collective.
            raise ValueError(
                "ALS minibatch fits are not supported in multi-process "
                "mode; use full-batch ALS (batch_size=None) or joint-mode "
                "minibatch (use_als=False)."
            )
        # ANY sharded fit needs equal cell shards (device_put / shard_map);
        # zero columns are exactly neutral and the KL pad constant is
        # stripped from the loss (mu.compute_loss_parts kl_pad)
        if placement.is_sharded and pad == 0 and n_restarts == 1:
            pad = (-pad_cells) % pad_devices
        # tiled sampling permutes whole tiles, so the cell axis must be a
        # tile multiple — per SHARD on a mesh (shard-local permutations):
        # pad to tile x n_shards so every equal shard is tile-aligned.
        # Zero pad columns are exactly neutral; multi-process fits were
        # rejected above.
        if sampling_method == "tiled" and batch_size >= n_sample:
            # a covering batch would silently disable the tile permutation
            # (fit_scan turns tiling off for full-batch configs) — reject,
            # matching the batch_size=None check above
            raise ValueError(
                f"sampling_method='tiled' is a minibatch mode: batch_size "
                f"({batch_size}) must be < n_cells ({n_sample}); full-batch "
                f"fits use sampling_method='random'."
            )
        if (sampling_method == "weighted_fast" and batch_size is not None
                and batch_size < n_sample):
            # a COVERING batch_size is full-epoch everywhere else in the
            # stack (_make_cfg normalizes it to None), so accept it here
            # too; only a genuinely sub-covering batch has no counts form
            raise ValueError(
                f"sampling_method='weighted_fast' supports full-epoch joint "
                f"mode only: batch_size ({batch_size}) must be None or >= "
                f"n_cells ({n_sample}); minibatch weighted fits use "
                f"sampling_method='weighted'."
            )
        tiled_mb = sampling_method == "tiled"
        if tiled_mb:
            unit = mu.DEFAULT_TILE * (pad_devices
                                      if placement.is_sharded else 1)
            pad = (-pad_cells) % unit
        if mp:
            # pad_cells + pad is the agreed per-chunk width (identical on
            # every process: all its inputs are global); THIS chunk pads by
            # its own shortfall, so near-equal shards stay collective-safe
            pad = pad_cells + pad - n_local
        placement.check_gene_axis(self.n_features)
        # Real atlases are usually sorted by sample/batch — exactly the
        # covariates weighted sampling balances — so contiguous cell shards
        # would hold single covariate levels and per-shard renormalization
        # would cancel the balancing.  One fixed global shuffle (seeded,
        # undone on the way out) makes every shard a random subsample, so
        # shard-local draws follow the global balanced distribution.
        # Tiled sampling needs the same decorrelation for a different
        # reason: storage-adjacent cells (usually sorted by sample/batch)
        # would otherwise always share a tile, making every tile a biased
        # cluster sample; after the shuffle, tiles are exchangeable random
        # subsamples.
        cell_perm = None
        wf_tables = None  # (start, sizes) for the grouped balanced sampler
        wf_window = None  # shard-local weighted_fast: window-sampler layout
        mp_h0_cols = None  # mp weighted_fast: global sorted H0 column/cell
        if sampling_method == "weighted_fast" and mp:
            # multi-process exact balanced draw (round-4 verdict item 1):
            # each process GROUP-SORTS its own chunk (a local cell_perm);
            # the global group layout — which, under the stable sort, is
            # exactly the single-process group-sort of the chunk-
            # concatenated dataset — is agreed through one small host
            # allgather of (code, count) pairs.  Every device then draws
            # the SAME global (group, position) stream from the shared key
            # and scatter-adds only the draws in its own window
            # (mu.grouped_balanced_counts window form): fixed shapes, zero
            # communication, and the trajectory MATCHES the single-process
            # weighted_fast fit (same key) up to psum summation order.
            from alpine_tpu.parallel import distributed as dist

            codes = sampling.joint_label_codes(Ys)
            cell_perm = np.argsort(codes, kind="stable")
            g_codes, m_gp = dist.allgather_group_layout(placement, codes)
            m_g = m_gp.sum(axis=0)
            sampling.check_group_sizes(m_g)
            chunk = placement.process_chunk_index
            base_off = m_gp[:chunk].sum(axis=0)
            local_sizes = m_gp[chunk]
            local_start = np.concatenate([[0],
                                          np.cumsum(local_sizes)[:-1]])
            # this chunk's cells at their notional global group-sorted
            # positions: the single-process fit pairs sorted position q
            # with H0 column q, so the mp H0 slice must gather exactly
            # those columns for the trajectories to coincide
            gid_sorted = np.searchsorted(g_codes, codes[cell_perm])
            g_start = np.concatenate([[0], np.cumsum(m_g)[:-1]])
            mp_h0_cols = (g_start[gid_sorted] + base_off[gid_sorted]
                          + np.arange(n_local) - local_start[gid_sorted])
            wf_window = (local_start, local_sizes, base_off, m_g)
        elif sampling_method == "weighted_fast":
            # group-sort the cells (stable) so the grouped balanced sampler
            # (mu.grouped_balanced_counts) draws with two uniform vectors
            # instead of a per-cell inverse-CDF (~100x less sampling time
            # at atlas scale); the sort is a cell_perm like any other —
            # undone on extraction, carried by the transform X-cache
            order, start, sizes = sampling.balanced_group_tables(
                sampling.joint_label_ids(Ys))
            cell_perm = order
            if shard_local_mb:
                # single-host 1-D mesh: the global group sort makes every
                # shard a contiguous window of the sorted order — same
                # replicated exact sampler as mp, windows derived from the
                # global tables (base offsets 0), H0 needs no gather (the
                # sort IS the perm, columns pair positionally)
                wf_window = (start.astype(np.int64), sizes.astype(np.int64),
                             np.zeros(len(sizes), np.int64),
                             sizes.astype(np.int64))
            else:
                wf_tables = (start, sizes)
        elif tiled_mb and mp:
            # multi-process tiled: a GLOBAL shuffle would need an
            # all-process cell exchange, but tiles only need to be
            # exchangeable random subsamples OF THE SHARD they are drawn
            # from (shard-local sampling is stratified by shard anyway) —
            # a seeded LOCAL shuffle of this process's own chunk achieves
            # that with no exchange.  Seed folds in the chunk index so
            # equal-size chunks don't share one permutation pattern.
            cell_perm = np.random.default_rng(
                (self.random_state, placement.process_chunk_index)
            ).permutation(n_local)
        elif (shard_local_mb and sampling_method == "weighted") or tiled_mb:
            cell_perm = np.random.default_rng(self.random_state).permutation(
                n_sample
            )
        # bf16 FIRST so the permute/pad copies below are half-size too
        X_dev = self._cast_x_host(X)
        if cell_perm is not None:
            X_dev = X_dev[:, cell_perm]
        Ys_dev = ([y[:, cell_perm] for y in Ys] if cell_perm is not None
                  else list(Ys))
        if pad:
            # zero columns are exactly neutral (tests/test_batched.py
            # padding-neutrality); pre-padding host-side avoids a transient
            # in-jit copy of X at atlas scale
            X_dev = np.pad(X_dev, ((0, 0), (0, pad)))
            Ys_dev = [np.pad(y, ((0, 0), (0, pad))) for y in Ys_dev]
        Xd = placement.put_x_matrix(X_dev)
        Ysd = tuple(placement.put_cells_matrix(y) for y in Ys_dev)
        # device copy of X for a same-data transform: the host->device
        # upload dominates atlas-scale wall-clock through the axon tunnel
        # (measured ~30 s for 800 MB vs 0.3 s of transform compute).  Keyed
        # by a fingerprint of adata.X; INSTALLED only after the fit
        # succeeds (a failed fit must not strand the dataset in HBM on an
        # instance whose transform can never use it); dropped from pickles
        # (__getstate__) and releasable via free_device_cache().
        # shuffled fits (weighted-sharded / tiled) cache the PERMUTED device
        # X along with the permutation: transform re-pairs its H0 columns
        # and un-permutes its result (the projection is per-cell
        # independent, so the permuted run is column-for-column the same)
        new_x_cache = (
            None
            if env_flag("ALPINE_TPU_NO_X_CACHE")
            else (Xd, self._x_fingerprint(adata.X), n_local, pad, cell_perm)
        )

        # weighted sampling probabilities (host-side, once; reference
        # recomputes per epoch on the host, sampling.py:18-33); the
        # covariate requirement was validated up front
        weights = None
        if wf_tables is not None:
            # grouped sampler tables (the cell axis was group-sorted above)
            weights = (
                placement.put_replicated(jnp.asarray(wf_tables[0])),
                placement.put_replicated(jnp.asarray(wf_tables[1])),
            )
        elif wf_window is not None:
            # sharded weighted_fast: the replicated exact sampler's
            # (m_global, per-device window tables) pair — each device's
            # window covers its own padded cell shard (pad tails hold no
            # groups, so they are never drawn)
            local_start, local_sizes, base_off, m_g = wf_window
            if mp:
                n_windows = placement.local_cell_shards
                width = (n_local + pad) // n_windows
            else:
                n_windows = placement.cell_shards
                width = (n_sample + pad) // n_windows
            shard_tab = sampling.window_group_tables(
                local_start, local_sizes, base_off, n_windows, width)
            weights = (
                placement.put_replicated(jnp.asarray(m_g, jnp.int32)),
                placement.put_shard_rows(jnp.asarray(shard_tab)),
            )
        elif sampling_method in ("weighted", "weighted_fast"):
            ids = sampling.joint_label_ids(Ys)
            w_host = sampling.balanced_sample_probabilities(ids)
            if shard_local_mb:
                # zero weight on pad columns: never drawn; per-shard
                # renormalization happens inside the shard_map body
                if cell_perm is not None:
                    w_host = w_host[cell_perm]
                if pad:
                    w_host = np.pad(w_host, (0, pad))
                weights = placement.put_cells_vector(jnp.asarray(w_host))
            else:
                weights = placement.put_replicated(jnp.asarray(w_host))

        self.timings_: Dict[str, float] = {}
        timer = profiling.StepTimer(self.timings_)
        hyper = self._hyper()

        def init_state(cfg):
            key = jax.random.PRNGKey(self.random_state)
            init_key, fit_key = jax.random.split(key)
            W0, H0, Bs0 = mu.init_matrices(cfg, self.n_features, init_key, self.eps)
            if self.component_bucket:
                # phantom components start (and provably stay) exactly zero
                W0, H0, Bs0 = mu.mask_block_padding(
                    cfg.blocks, tuple(self.n_all_components), W0, H0, Bs0
                )
            if mp:
                # every process draws the IDENTICAL global H0 (same seed,
                # same global shape — so the trajectory matches the
                # single-process fit), then keeps only its chunk's columns
                if mp_h0_cols is not None:
                    # weighted_fast: the single-process fit pairs GLOBAL
                    # GROUP-SORTED position q with H0 column q; gather this
                    # chunk's cells' sorted positions so the trajectories
                    # coincide (contiguous chunk columns would pair
                    # different H0 values with the same cells)
                    H0 = H0[:, jnp.asarray(mp_h0_cols)]
                else:
                    off = int(mp_locals[: placement.process_chunk_index].sum())
                    H0 = H0[:, off:off + n_local]
            if pad:
                # match the pre-padded X (zero columns are exactly neutral)
                H0 = jnp.pad(H0, ((0, 0), (0, pad)))
            W0 = placement.put_w_matrix(W0)
            H0 = placement.put_cells_matrix(H0)
            Bs0 = tuple(placement.put_replicated(b) for b in Bs0)
            return W0, H0, Bs0, fit_key

        def do_fit(cfg, W0, H0, Bs0, fit_key):
            if cfg.use_pallas and placement.is_sharded:
                return mu.fit_scan_sharded(cfg, placement.mesh, W0, H0, Bs0,
                                           Xd, Ysd, hyper)
            if shard_local_mb and not cfg.full_batch:
                # shard-local sampling: gathers/scatters stay on-device,
                # only small-accumulator psums cross the ICI
                return mu.fit_scan_minibatch_sharded(
                    cfg, placement.mesh, W0, H0, Bs0, Xd, Ysd, hyper,
                    fit_key, weights,
                )
            return mu.fit_scan(cfg, W0, H0, Bs0, Xd, Ysd, hyper, fit_key, weights)

        def run(n_iter: int):
            cfg = self._make_cfg(Ys, n_sample, n_iter, trim_h=not mp)
            if n_restarts > 1:
                return cfg, self._run_restarts(cfg, n_restarts, Xd, Ysd, hyper,
                                               weights, placement)
            W0, H0, Bs0, fit_key = init_state(cfg)
            return cfg, do_fit(cfg, W0, H0, Bs0, fit_key)

        def run_checkpointed(n_iter: int):
            """Chunked scan with periodic snapshots (SURVEY.md §5 failure
            recovery).  Resume is deterministic: chunk c always uses
            fold_in(fit_key, c), so a restarted fit replays the identical
            key schedule."""
            ckpt = FitCheckpointer(
                checkpoint_dir,
                config_key={
                    "blocks": self.n_all_components,
                    "n_labels": [y.shape[0] for y in Ys],
                    "n_cells": n_sample,
                    "lam": self.lam, "orth_W": self.orth_W,
                    "alpha_W": self.alpha_W, "l1_ratio_W": self.l1_ratio_W,
                    "loss_type": self.loss_type, "use_als": self.use_als,
                    # numerics regime: a snapshot must not resume under a
                    # different storage/compute dtype or matmul precision
                    # (the RESOLVED dtype: "auto" may resolve differently
                    # on different data)
                    "data_dtype": self.data_dtype_,
                    "matmul_precision": self.matmul_precision,
                    "batch_size": self.batch_size,
                    "sampling": self.sampling_method,
                    # tiled trajectories depend on the tile width (and on
                    # the pre-shuffle, which self.random_state seeds)
                    "tile": (mu.DEFAULT_TILE
                             if self.sampling_method == "tiled" else 0),
                    "bucket": self.component_bucket,
                    # shard-local minibatch sampling distributions and key
                    # schedules depend on the shard count, so a snapshot
                    # must not resume on a different device topology
                    "cell_shards": self._mesh_devices(),
                    "seed": self.random_state, "max_iter": n_iter,
                    # the chunk key schedule depends on the chunk size, so a
                    # different checkpoint_every must not resume this snapshot
                    "checkpoint_every": checkpoint_every,
                    # multi-process fits snapshot PER RANK (each file holds
                    # that rank's H columns): distinct tags per process, and
                    # a snapshot must not resume on a different topology
                    "n_processes": placement.n_processes,
                    "process_index": placement.process_chunk_index,
                    # near-equal shards: the per-chunk cell layout decides
                    # every chunk's H0 slice and pad — a snapshot from one
                    # layout must not resume under another even when the
                    # global cell count matches
                    "cell_layout": (None if mp_locals is None
                                    else tuple(int(v) for v in mp_locals)),
                },
                backend=checkpoint_backend,
            )
            cfg0 = self._make_cfg(Ys, n_sample, n_iter, trim_h=not mp)
            W, H, Bs, fit_key = init_state(cfg0)
            done, losses_parts = 0, []
            resumed = ckpt.load()
            if mp:
                # a preemption can leave ranks with snapshots at different
                # iterations (or none at all); resuming unequal states would
                # desynchronize the chunk loop and deadlock the collectives.
                # Every rank sees the same allgathered table, so every rank
                # takes the same branch.
                from alpine_tpu.parallel import distributed as dist

                done_local = -1 if resumed is None else int(resumed[0])
                ranks_done = dist.process_allgather_rows(
                    np.asarray([done_local], np.int64)
                )
                if not (ranks_done == done_local).all():
                    if dist.is_coordinator():
                        import warnings

                        warnings.warn(
                            "fit checkpoints disagree across processes "
                            f"(iterations {sorted(set(ranks_done.ravel().tolist()))}); "
                            "restarting the fit from scratch on every rank."
                        )
                    resumed = None
            if resumed is not None:
                done, W_np, H_np, Bs_np, losses0 = resumed
                if pad:
                    # snapshots store the unpadded H (each rank's LOCAL
                    # columns in mp fits); re-pad to the device layout
                    # (zero columns are exactly neutral)
                    H_np = np.pad(H_np, ((0, 0), (0, pad)))
                W = placement.put_w_matrix(jnp.asarray(W_np))
                H = placement.put_cells_matrix(jnp.asarray(H_np))
                Bs = tuple(placement.put_replicated(jnp.asarray(b)) for b in Bs_np)
                losses_parts.append(losses0)
                if verbose and (not mp or dist.is_coordinator()):
                    print(f"ALPINE fit: resumed from iteration {done}")
            chunk_idx = done // checkpoint_every
            # cfg0 is a valid fallback (scale_matrices needs only the block
            # structure) for the resume-after-complete case where the loop
            # body never runs
            cfg = cfg0
            while done < n_iter:
                chunk = min(checkpoint_every, n_iter - done)
                cfg = self._make_cfg(Ys, n_sample, chunk, trim_h=not mp)
                ck = jax.random.fold_in(fit_key, chunk_idx)
                progress_base["iters"] = done  # chunk-local it -> global bar
                W, H, Bs, L = do_fit(cfg, W, H, Bs, ck)
                L = np.asarray(jax.device_get(L))
                losses_parts.append(L)
                done += chunk
                chunk_idx += 1
                # multi-process: the global H is not addressable from one
                # rank — snapshot THIS rank's columns, stripped of its
                # interleaved pad (re-padded on resume).  W/Bs/losses are
                # replicated and fully addressable everywhere.
                H_save = (placement.local_cells_columns(H)[:, :n_local]
                          if mp else H)
                ckpt.save(done, W, H_save, Bs, np.concatenate(losses_parts))
                if (verbose and not self._callbacks_supported()
                        and (not mp or dist.is_coordinator())):
                    # per-chunk progress on backends without host callbacks
                    print(
                        f"ALPINE fit: iteration {done}/{n_iter}, "
                        f"objective loss {L[-1, 0]:.6g}",
                        flush=True,
                    )
            ckpt.clear()
            return cfg, (W, H, Bs, np.concatenate(losses_parts))

        def run_progress_chunks(n_iter: int):
            """Verbose fallback when host callbacks are unsupported (the
            axon tunnel): run the scan in chunks and print per-chunk
            progress instead of going silent until the end.  Full-batch
            only — the trajectory is identical to the single scan (the XLA
            carry is just (W, H, Bs); the pallas path recomputes its
            carried XHt/HHt at chunk boundaries, a ~1e-7 effect).  Chunk
            sizes repeat, so this costs at most two extra compiles."""
            cfg0 = self._make_cfg(Ys, n_sample, n_iter, trim_h=not mp)
            W, H, Bs, fit_key = init_state(cfg0)
            chunk_size = max(1, min(50, -(-n_iter // 10)))
            done, parts, cfg = 0, [], cfg0
            # one copy of each progress line per fit, not one per process
            # (same gate as run_checkpointed's per-chunk print)
            coordinator = True
            if mp:
                from alpine_tpu.parallel import distributed as dist

                coordinator = dist.is_coordinator()
            while done < n_iter:
                c = min(chunk_size, n_iter - done)
                cfg = self._make_cfg(Ys, n_sample, c, trim_h=not mp)
                W, H, Bs, L = do_fit(cfg, W, H, Bs, fit_key)
                L = np.asarray(jax.device_get(L))
                parts.append(L)
                done += c
                if coordinator:
                    print(
                        f"ALPINE fit: iteration {done}/{n_iter}, "
                        f"objective loss {L[-1, 0]:.6g}",
                        flush=True,
                    )
            return cfg, (W, H, Bs, np.concatenate(parts))

        # progress bar contract (reference main.py:489-494, 669-671):
        # per-iteration tqdm updates with the objective loss, fed by a host
        # callback from inside the jitted scan when verbose=True
        pbar = None
        prev_hook = mu.get_progress_hook()
        # chunked/checkpointed fits re-run the scan with per-chunk iteration
        # indices starting at 0; run_checkpointed advances this base so the
        # absolute bar position stays global
        progress_base = {"iters": 0}
        if verbose and self._callbacks_supported():
            try:
                from tqdm import tqdm

                pbar = tqdm(total=max_iter or 200, desc="Iteration", ncols=100)

                def _hook(loss, it):
                    # absolute position: under sharded execution the device
                    # callback may fire once per shard per iteration, and
                    # bar.n = base+it+1 is idempotent where update(1)
                    # overcounts
                    pbar.set_postfix({"objective loss": float(loss[0])},
                                     refresh=False)
                    pbar.n = progress_base["iters"] + int(it) + 1
                    pbar.refresh()

                mu.set_progress_hook(_hook)
            except Exception:
                pbar = None

        try:
            # warm-up elbow search (reference main.py:114-131)
            if max_iter is None:
                with timer.phase("warmup"):
                    _, (_, _, _, losses) = run(200)
                    recon = np.asarray(losses[:, 1])
                self.max_iter: int = self._compute_best_iter(recon)
                if pbar is not None:
                    pbar.reset(total=self.max_iter)
            else:
                self.max_iter = max_iter

            chunked_progress = (
                verbose and pbar is None and n_restarts == 1
                and self.batch_size >= n_sample
                and sampling_method not in ("weighted", "weighted_fast")
            )
            with timer.phase("fit"):
                if checkpoint_dir is not None:
                    cfg, (Wd, Hd, Bsd, losses) = run_checkpointed(self.max_iter)
                elif chunked_progress:
                    cfg, (Wd, Hd, Bsd, losses) = run_progress_chunks(self.max_iter)
                else:
                    cfg, (Wd, Hd, Bsd, losses) = run(self.max_iter)
        finally:
            if pbar is not None:
                # restore (not just clear) so an outer fit whose hook this
                # one displaced keeps its bar alive; the hook is process-
                # global, one VERBOSE fit at a time is the supported shape
                mu.set_progress_hook(prev_hook)
                pbar.close()

        if self.scale_needed:
            Wd, Hd, Bsd = mu.scale_matrices(cfg, Wd, Hd, Bsd)

        # loss history DataFrame contract (reference main.py:666-676)
        losses_np = np.asarray(jax.device_get(losses))
        colnames = ["total loss", "reconstruction loss"] + [
            f"prediction loss({k})" for k in self.covariate_keys
        ]
        self.loss_history = pd.DataFrame(losses_np, columns=colnames)
        if verbose and len(losses_np):
            print(
                f"ALPINE fit: {self.max_iter} iterations, "
                f"final objective loss {losses_np[-1, 0]:.6g}"
            )

        W_np = np.asarray(jax.device_get(Wd), dtype=np.float32)
        if mp:
            # each process keeps its OWN cells' H columns (the global H is
            # sharded across processes; W/Bs/losses are replicated) — the
            # estimator and the adata it writes stay per-process
            H_np = placement.local_cells_columns(Hd)[:, :n_local].astype(
                np.float32)
        else:
            H_np = np.asarray(jax.device_get(Hd), dtype=np.float32)
        if cell_perm is not None:
            # undo the weighted-sharding shuffle: H columns back to the
            # caller's cell order
            H_np = H_np[:, np.argsort(cell_perm)]
        Bs_np = [np.asarray(jax.device_get(b), dtype=np.float32) for b in Bsd]
        if self.component_bucket:
            # drop the phantom components: stored matrices are true-sized
            valid = np.asarray(
                mu.block_valid_mask(cfg.blocks, tuple(self.n_all_components))
            )
            W_np = W_np[:, valid]
            H_np = H_np[valid]
            Bs_np = [b[:, :kt] for b, kt in zip(Bs_np, self.n_covariate_components)]
        m = AlpineMatrices(
            X=X,
            Ys=[np.asarray(y, dtype=np.float32) for y in Ys],
            Ws=split_w(W_np, self.n_all_components),
            Hs=split_h(H_np, self.n_all_components),
            Bs=Bs_np,
        )
        self.matrices: Dict[str, Union[Float32Array, List[Float32Array]]] = m.to_numpy()

        # the fit succeeded: NOW pair the device-resident X with this fit
        # (any previous fit's cache is superseded)
        self._x_cache = new_x_cache

        self.store_embeddings(adata)
        return self

    def _run_restarts(self, cfg, n_restarts, Xd, Ysd, hyper, weights, placement):
        """Multi-restart fitting, batched via vmap over independent
        initializations (NMF is non-convex; restarts are the standard
        remedy).  Restart 0 reuses the default fit's key derivation, so
        with the same backend the winner can never be worse than the
        single fit; restarts r>0 draw from fold_in(key, r).  The restart
        with the lowest final total loss wins (NaN-diverged restarts are
        excluded).  Runs the XLA backend (the fused kernel path is
        single-program); progress reporting is disabled under vmap."""
        from dataclasses import replace as dc_replace

        if placement.is_sharded:
            raise ValueError(
                "n_restarts > 1 is not supported with a sharded (Mesh) device."
            )
        cfg = dc_replace(cfg, backend="xla", progress=False)
        base = jax.random.PRNGKey(self.random_state)
        keys = jnp.stack(
            [base] + [jax.random.fold_in(base, r) for r in range(1, n_restarts)]
        )
        keys = placement.put_replicated(keys)

        def one_init(k):
            ik, fk = jax.random.split(k)
            W0, H0, Bs0 = mu.init_matrices(cfg, self.n_features, ik, self.eps)
            if self.component_bucket:
                W0, H0, Bs0 = mu.mask_block_padding(
                    cfg.blocks, tuple(self.n_all_components), W0, H0, Bs0
                )
            return W0, H0, Bs0, fk

        W0s, H0s, Bs0s, fks = jax.jit(jax.vmap(one_init))(keys)
        vfit = jax.vmap(
            lambda W, H, Bs, k: mu.fit_scan(cfg, W, H, Bs, Xd, Ysd, hyper, k,
                                            weights),
            in_axes=(0, 0, 0, 0),
        )
        Ws, Hs, Bss, losses = vfit(W0s, H0s, Bs0s, fks)
        finals = np.asarray(jax.device_get(losses[:, -1, 0]))
        if np.isnan(finals).all():
            best = 0  # surface the divergence rather than hide it
        else:
            best = int(np.nanargmin(finals))
        pick = lambda a: jax.tree_util.tree_map(lambda x: x[best], a)
        return pick(Ws), pick(Hs), pick(Bss), losses[best]

    # ------------------------------------------------------------ transform
    def transform(self, adata, n_iter: Optional[int] = None) -> None:
        if not hasattr(self, "matrices"):
            raise RuntimeError("Model is not trained yet. Please fit the model first.")
        if not is_anndata(adata):
            raise TypeError("adata must be an AnnData object.")
        if not isinstance(n_iter, (int, type(None))) or (
            n_iter is not None and n_iter <= 0
        ):
            raise ValueError("n_iter must be a positive integer or None.")
        n_iter = n_iter if n_iter is not None else self.max_iter
        self._transform(adata, n_iter)

    def fit_transform(
        self,
        adata,
        covariate_keys: List[str],
        batch_size: Optional[int] = None,
        max_iter: Optional[int] = None,
        sampling_method: str = "random",
        verbose: bool = False,
    ) -> None:
        self.fit(
            adata,
            covariate_keys,
            batch_size=batch_size,
            max_iter=max_iter,
            sampling_method=sampling_method,
            verbose=verbose,
        ).transform(adata)

    # --------------------------------------------------------------- loss
    def compute_loss(self, adata):
        """Post-hoc numpy recomputation of the total loss from stored
        embeddings (reference main.py:187-236)."""
        if not hasattr(self, "matrices"):
            raise RuntimeError("Model is not trained yet. Please fit the model first.")
        if not is_anndata(adata):
            raise TypeError("adata must be an AnnData object.")
        if "ALPINE_embedding" not in adata.obsm:
            raise ValueError(
                "ALPINE_embedding not found in adata.obsm. Please transform the data first."
            )

        def kl_divergence(y, y_hat):
            y_hat = np.clip(y_hat, a_min=self.eps, a_max=None)
            return np.sum(
                y * np.log(np.clip(y / y_hat, a_min=self.eps, a_max=None)) - y + y_hat
            )

        X = dense_x(adata.X).T

        Ws, Hs = [], []
        for covariate in self.covariate_keys:
            Hs.append(copy(np.asarray(adata.obsm[covariate]).T))
            Ws.append(copy(np.asarray(adata.varm[covariate])))
        Hs.append(copy(np.asarray(adata.obsm["ALPINE_embedding"]).T))
        Ws.append(copy(np.asarray(adata.varm["ALPINE_weights"])))

        W = np.concatenate(Ws, axis=1)
        H = np.concatenate(Hs, axis=0)
        recon_loss = np.linalg.norm(X - W @ H, ord="fro") ** 2

        Ys = self.fe.transform(adata.obs)
        Bs = self.matrices["Bs"]

        if self.loss_type == "kl-divergence":
            pred_loss = [kl_divergence(Ys[i].T, Bs[i] @ Hs[i]) for i in range(len(Ys))]
        else:
            pred_loss = [
                np.linalg.norm(Ys[i].T - Bs[i] @ Hs[i], ord="fro") ** 2
                for i in range(len(Ys))
            ]

        return recon_loss + sum(self.lam[i] * pl for i, pl in enumerate(pred_loss))

    # --------------------------------------------------------- persistence
    def save(self, path: str) -> None:
        """Serialize the fitted model to `<path>.npz` (+ encoder sidecar).
        Model-level persistence is new vs the reference, which relied on
        users pickling the whole object (README.md:212-215)."""
        save_model(self, path)

    @classmethod
    def load(cls, path: str, device="auto") -> "ALPINE":
        """Reconstruct a fitted model saved with `save`."""
        return load_model(path, device=device)

    # ----------------------------------------------------------- accessors
    def get_decomposed_matrices(self):
        if not hasattr(self, "matrices"):
            raise RuntimeError("Model is not trained yet. Please fit the model first.")
        return self.matrices

    def get_covariate_gene_scores(self, adata=None):
        """Per-covariate (genes x labels) scores: W_i @ (H_i Y_iᵀ / rowsum(Y_i))
        (reference main.py:246-273)."""
        if not hasattr(self, "matrices"):
            raise RuntimeError("Model is not trained yet. Please fit the model first.")

        cov_gene_scores = {}
        for i, covariate in enumerate(self.covariate_keys):
            W = self.matrices["Ws"][i]
            H = self.matrices["Hs"][i]
            Y = self.matrices["Ys"][i]

            HY = H @ Y.T / Y.sum(axis=1)
            cond_genes = W @ HY

            colnames = self.fe.encoded_labels[covariate]
            cov_gene_scores[covariate] = pd.DataFrame(
                cond_genes, index=self.feature_names, columns=colnames
            )

        if adata is None:
            return cov_gene_scores
        for condition, df in cov_gene_scores.items():
            adata.varm[condition + "_gene_scores"] = df
        return None

    def get_normalized_expression(self, adata, library_size: Optional[float] = None,
                                  on_device: bool = False,
                                  cell_block_size: Optional[int] = None,
                                  out: Optional[np.ndarray] = None) -> None:
        """Batch-corrected expression from the unguided block only
        (reference main.py:275-301).

        BLOCKWISE at any scale (round-5): the (cells × genes) result is
        reconstructed and normalized ``cell_block_size`` cells at a time
        directly into the output array, so peak transient host memory is
        one slab — never a second full copy (the reference materializes
        the product plus normalize_total's copy, main.py:292-298; at
        500k×2k that is 3×4 GB).  Values are block-independent up to BLAS
        kernel-selection ulps (~1e-7 relative): the per-cell math is
        identical, the per-cell totals come from the same C-contiguous f32
        row sums, and the scaling multiplies the same f32 factors.

        ``on_device=True`` runs each slab's (genes×k)@(k×block) matmul on
        the accelerator (fast when directly attached; over a tunneled
        chip the fetch usually costs more than the host matmul saves).
        ``out`` — preallocated (cells × genes) float32 array to fill and
        store (e.g. an ``np.memmap`` for out-of-core export at atlas
        scale); default allocates in memory.  ``cell_block_size`` defaults
        to ~256 MB slabs."""
        if not hasattr(self, "matrices"):
            raise RuntimeError("Model is not trained yet. Please fit the model first.")
        elif not is_anndata(adata):
            raise TypeError("adata must be an AnnData object.")
        elif "ALPINE_embedding" not in adata.obsm:
            raise ValueError(
                "ALPINE_embedding not found in adata.obsm. Please transform the data first."
            )
        elif (library_size is not None) and (library_size <= 0):
            raise ValueError("library_size must be a positive float.")

        W: Float32Array = self.matrices["Ws"][-1]
        H: Float32Array = np.asarray(adata.obsm["ALPINE_embedding"]).T
        n_cells, g = H.shape[1], W.shape[0]
        if cell_block_size is None:
            # ~256 MB f32 slabs: large enough to stream, small vs the result
            cell_block_size = max(1, min(n_cells, (64 << 20) // max(g, 1)))
        if not isinstance(cell_block_size, int) or cell_block_size <= 0:
            raise ValueError("cell_block_size must be a positive integer.")
        if out is None:
            out = np.empty((n_cells, g), np.float32)
        elif out.shape != (n_cells, g) or out.dtype != np.float32:
            raise ValueError(
                f"out must be a float32 array of shape {(n_cells, g)}, got "
                f"{out.dtype} {out.shape}."
            )

        # pass 1: reconstruct slabs into `out` + per-cell totals (math in
        # ops/mu — repo invariant; pinned to the model's device so an
        # explicit device="cpu" is never silently ignored)
        dev = self.device
        target = dev.devices.flat[0] if isinstance(dev, Mesh) else (
            dev if hasattr(dev, "platform") else None)
        counts = np.empty(n_cells, np.float32)
        mu.reconstruct_expression_blocks(
            W, H, out, counts, cell_block_size, device=target,
            precision=self.matmul_precision, on_device=on_device)

        # pass 2: scale rows in place (normalize_total semantics,
        # reference main.py:297-298 / utils.single_cell.normalize_total)
        if library_size is None:
            nz = counts[counts > 0]
            library_size = float(np.median(nz)) if nz.size else 1.0
        safe = np.where(counts == 0, np.float32(1.0), counts)
        fac = (library_size / safe).astype(np.float32)
        for lo in range(0, n_cells, cell_block_size):
            hi = min(lo + cell_block_size, n_cells)
            out[lo:hi] *= fac[lo:hi, None]

        adata.layers["normalized_expression"] = out

    def store_embeddings(self, adata) -> None:
        """Write obsm/varm keys (reference main.py:303-320): unguided block to
        'ALPINE_embedding'/'ALPINE_weights'; per covariate its H/W blocks and
        '{cov}_dummy_matrix'."""
        if not hasattr(self, "matrices"):
            raise RuntimeError("Model is not trained yet. Please fit the model first.")
        elif not is_anndata(adata):
            raise TypeError("adata must be an AnnData object.")

        adata.obsm["ALPINE_embedding"] = copy(self.matrices["Hs"][-1].T)
        adata.varm["ALPINE_weights"] = copy(self.matrices["Ws"][-1])

        dummy_matrices = self.fe.transform(adata.obs)

        for i, covariate in enumerate(self.covariate_keys):
            adata.obsm[covariate] = copy(self.matrices["Hs"][i].T)
            adata.obsm[f"{covariate}_dummy_matrix"] = dummy_matrices[i]
            adata.varm[covariate] = copy(self.matrices["Ws"][i])

    # ------------------------------------------------------------ internals
    def _callbacks_supported(self) -> bool:
        """Some PJRT backends (e.g. tunneled TPUs) lack host callbacks; probe
        once per device so verbose fits degrade to a summary line instead of
        crashing."""
        dev = self.device
        if hasattr(dev, "platform"):  # jax.Device
            target = dev
            key = (dev.platform, dev.id)
        else:  # Mesh: probe one of ITS devices, keyed by the full device
            # set (a constant key would reuse a CPU-mesh probe result for a
            # TPU mesh in the same process)
            target = dev.devices.flat[0]
            key = (target.platform, tuple(d.id for d in dev.devices.flat))
        cache = ALPINE._callback_probe_cache
        if key not in cache:
            try:
                x = jnp.zeros(())
                if target is not None:
                    x = jax.device_put(x, target)
                val = jax.jit(
                    lambda v: (jax.debug.callback(lambda _: None, v), v)[1]
                )(x)
                np.asarray(val)
                cache[key] = True
            except Exception:
                cache[key] = False
        return cache[key]

    _callback_probe_cache: Dict = {}

    def _mesh_devices(self) -> int:
        return self.device.devices.size if isinstance(self.device, Mesh) else 1

    @property
    def _storage_dtype(self) -> str:
        """The resolved X storage dtype (`data_dtype_`, set at fit); before
        any fit, the constructor dtype with "auto" read as float32."""
        dt = getattr(self, "data_dtype_", None)
        if dt is None:
            dt = "float32" if self.data_dtype == "auto" else self.data_dtype
        return dt

    def _cfg_blocks(self) -> tuple:
        """The COMPILED block shapes (bucket-padded when component_bucket is
        set) — the single source shared by _make_cfg and the kernel-gate
        arithmetic, which must see the same K."""
        blocks = tuple(self.n_all_components)
        if isinstance(self.component_bucket, tuple):
            return self.component_bucket
        if self.component_bucket:
            return mu.bucket_blocks(blocks, self.component_bucket)
        return blocks

    def _pallas_pad(self, n_sample: int, n_labels: tuple,
                    n_devices: Optional[int] = None,
                    include_unguided: bool = False,
                    global_cells: Optional[int] = None) -> int:
        """Columns of host-side zero padding so the fused kernel's tile grid
        divides EVERY device's cell shard (0 when the pallas path won't be
        used).  The sharded path needs tile alignment even without
        covariates (shard_map shards must be equal).  ``n_sample`` is the
        cell count being padded (the LOCAL chunk in multi-process fits);
        ``global_cells`` is the fit's global count, which is what the
        minibatch-mode decision keys on (defaults to ``n_sample``)."""
        itemsize = mu.x_storage_itemsize(self._storage_dtype)
        cast = mu.x_cast_itemsize(self._storage_dtype)
        K = sum(self._cfg_blocks())
        if not (self._use_tpu_kernels()
                and (self.n_covariate_components or include_unguided)
                and pallas_kernels.h_update_supported(
                    self.n_features, itemsize, K, n_labels,
                    cast_itemsize=cast)):
            return 0
        n_global = n_sample if global_cells is None else global_cells
        if self.batch_size is not None and self.batch_size < n_global:
            return 0  # minibatch mode uses the XLA path
        eff_devices = self._mesh_devices() if n_devices is None else n_devices
        counts_mode = False
        if self.use_als or self.sampling_method == "weighted":
            return 0
        if self.sampling_method == "weighted_fast":
            # the counts-mode fused kernel runs single-device only (the
            # sharded weighted_fast path is the replicated-draw XLA
            # sampler; a Mesh of ONE device still routes through
            # fit_scan_sharded); batch_size was validated covering (full-
            # epoch) for weighted_fast
            if (eff_devices > 1 or not self.n_covariate_components
                    or isinstance(self.device, Mesh)):
                return 0
            counts_mode = True
        pad = pallas_kernels.pad_target(
            self.n_features, n_sample,
            eff_devices,
            itemsize, K, n_labels, cast_itemsize=cast,
            counts_mode=counts_mode,
        )
        return 0 if pad is None else pad

    def _use_tpu_kernels(self) -> bool:
        """Fused Pallas kernels apply on a TPU device or a 1-D TPU mesh
        (per-shard kernels + psums of the small accumulators)."""
        if env_flag("ALPINE_TPU_DISABLE_PALLAS"):
            return False
        dev = self.device
        if isinstance(dev, Mesh):
            return (len(dev.axis_names) == 1
                    and dev.devices.flat[0].platform == "tpu")
        return (not isinstance(dev, type(None))
                and hasattr(dev, "platform")
                and dev.platform == "tpu")

    def _make_cfg(self, Ys: List[Float32Array], n_sample: int, n_iter: int,
                  trim_h: bool = True) -> mu.MUConfig:
        cfg = self._make_cfg_base(Ys, n_sample, n_iter)
        return cfg if trim_h else replace(cfg, trim_h=False)

    def _make_cfg_base(self, Ys, n_sample: int, n_iter: int) -> mu.MUConfig:
        blocks = self._cfg_blocks()
        cfg = mu.MUConfig(
            blocks=blocks,
            n_labels=tuple(y.shape[0] for y in Ys),
            n_cells=n_sample,
            loss_kl=(self.loss_type == "kl-divergence"),
            use_als=self.use_als,
            batch_size=None if self.batch_size >= n_sample else self.batch_size,
            weighted=(self.sampling_method in ("weighted", "weighted_fast")),
            weighted_counts=(self.sampling_method == "weighted_fast"),
            tile=(mu.DEFAULT_TILE if self.sampling_method == "tiled" else 0),
            max_iter=n_iter,
            precision=self.matmul_precision,
            x_dtype=self._storage_dtype,
            progress=(getattr(self, "verbose", False)
                      and self._callbacks_supported()),
        )
        # counts-mode weighted_fast rides the fused kernel too (in-kernel
        # count-scaled stats + masked H update) — single device only; the
        # sharded weighted_fast path is the replicated-draw XLA sampler
        counts_fused = (
            cfg.weighted_counts and cfg.batch_size is None
            and cfg.n_cov > 0 and self._mesh_devices() == 1
            # a Mesh — even of one device — routes pallas fits into
            # fit_scan_sharded, which has no counts mode; mesh
            # weighted_fast rides the replicated-draw XLA sampler
            and not isinstance(self.device, Mesh)
        )
        if (
            (cfg.full_batch or counts_fused)
            and not cfg.use_als
            and self._use_tpu_kernels()
            and pallas_kernels.h_update_supported(
                self.n_features, mu.x_storage_itemsize(self._storage_dtype),
                cfg.K, cfg.n_labels,
                cast_itemsize=mu.x_cast_itemsize(self._storage_dtype),
                counts_mode=counts_fused)
        ):
            cfg = replace(cfg, backend="pallas")
        return cfg

    def _hyper(self):
        return (
            jnp.asarray(np.asarray(self.lam, dtype=np.float32)),
            jnp.float32(self.orth_W),
            jnp.float32(self.alpha_W),
            jnp.float32(self.l1_ratio_W),
            jnp.float32(self.eps),
        )

    def free_device_cache(self) -> None:
        """Release the device-resident X kept for same-data transforms.
        The cache holds the full expression matrix in accelerator memory
        (e.g. ~800 MB at 100k x 2k); drop it when keeping several fitted
        models alive or before fitting another atlas-scale model."""
        self._x_cache = None

    def __getstate__(self):
        # Device arrays must not leak into pickles (they would force a full
        # device->host fetch and bloat the file by the whole dataset), and
        # jax.Device / Mesh objects are not picklable at all — yet pickling
        # the whole estimator is the reference's documented persistence
        # workflow (README.md:212-215).
        from alpine_tpu.parallel.mesh import describe_device

        state = dict(self.__dict__)
        state["_x_cache"] = None
        state["device"] = describe_device(state.get("device"))
        return state

    def __setstate__(self, state):
        from alpine_tpu.parallel.mesh import restore_device

        state["device"] = restore_device(state.get("device"))
        # pickles from before data_dtype="auto" carry a concrete data_dtype
        # and no resolved data_dtype_; mirror it so transform keeps working
        if "data_dtype_" not in state and state.get("data_dtype") not in (
                None, "auto"):
            state["data_dtype_"] = state["data_dtype"]
        self.__dict__.update(state)

    def _cast_x_host(self, arr: np.ndarray, *, strict: bool = True) -> np.ndarray:
        """Narrow-storage modes cast X HOST-side: shrinks the host->device
        transfer (the dominant atlas-scale cost through the tunnel) and
        avoids the transient double-residency of an in-jit cast.

        bfloat16: ||X||^2 and the loss then see the bf16-rounded values the
        updates use — consistent, and inside the documented opt-in
        approximation.

        int8/int16: EXACT storage for raw-count data (the usual single-cell
        input) — the stored X values carry none of bfloat16's rounding
        (X-sided matmuls still run in the compute dtype: bf16 for int8 —
        same compute accuracy as bfloat16 mode — and full f32 for int16).
        The cast is verified by round-trip equality — any value the integer
        dtype cannot represent exactly (too large, negative, fractional, or
        NaN) raises, so a quantizing cast can never silently corrupt data
        regardless of caller-side checks.  With `strict=False` (the
        transform path) non-representable data falls back to the
        compute-width float storage instead of raising: the projection math
        never needed integer storage, and reference transform accepts any
        non-negative X.

        Works from the RESOLVED dtype (`data_dtype_`, set at fit):
        data_dtype="auto" resolves to the narrowest exact integer dtype for
        validated count data, so strict failures cannot occur for the auto
        path — only explicit narrow dtypes can reject data here.  Direct
        calls before any fit fall back to the constructor dtype (so the
        quantizing-cast guarantees hold for any caller)."""
        dt = self._storage_dtype
        if dt == "bfloat16":
            import ml_dtypes

            return np.asarray(arr, dtype=ml_dtypes.bfloat16)
        if dt in ("int8", "int16"):
            with np.errstate(invalid="ignore"):  # NaN→int is diagnosed below
                cast = arr.astype(dt)
            # round-trip equality + sign: -5.0 round-trips through int8, but
            # negative storage would corrupt the non-negativity the MU math
            # assumes — enforce it HERE, not only at the fit/transform call
            # sites, so the documented guarantee holds for any caller
            if np.array_equal(arr, cast) and (
                    not cast.size or int(cast.min()) >= 0):
                return cast
            if not strict:
                if dt == "int8":
                    import ml_dtypes

                    return np.asarray(arr, dtype=ml_dtypes.bfloat16)
                return arr  # int16's compute dtype is float32 — as passed
            if np.isnan(arr).any():
                raise ValueError(
                    f"data_dtype='{dt}' requires integer-valued "
                    "adata.X, but it contains NaN."
                )
            limit = np.iinfo(dt).max
            if float(arr.max(initial=0.0)) > limit or float(
                    arr.min(initial=0.0)) < 0:
                alternatives = ("'int16', 'bfloat16', or 'float32'"
                                if dt == "int8"
                                else "'bfloat16' or 'float32'")
                raise ValueError(
                    f"data_dtype='{dt}' requires all values "
                    f"of adata.X to be >= 0 and <= {limit}; found range "
                    f"[{arr.min()}, {arr.max()}]. Use {alternatives} instead."
                )
            raise ValueError(
                f"data_dtype='{dt}' requires integer-valued "
                "adata.X (raw counts); found fractional values. Use "
                "'bfloat16' or 'float32' for normalized/transformed data."
            )
        return arr

    @staticmethod
    def _x_fingerprint(X_host) -> tuple:
        """Identity for a host X: shape + a 4096-element strided sample +
        full-array float64 sum, minimum, and a POSITION-WEIGHTED row-sum
        hash (cheap passes over the data, ~0.5 s at 800 MB vs the ~30 s
        upload it saves).  Used to reuse the fit's device-resident X when
        transform is called on the same data.  The full sum catches value
        edits; the minimum means data turned negative can never match (the
        uncached path then re-validates and raises); the row-sum dot with a
        fixed pseudo-random vector catches cell REORDERING, which leaves
        sums/min/strided samples invariant for sparse integer-valued counts.
        Sparse inputs fingerprint their .data stream + row sums without
        densifying (a sparse and a dense X with equal values hash
        differently — only a harmless cache miss).
        Disable via ALPINE_TPU_NO_X_CACHE=1."""
        if is_sparse_x(X_host):
            from alpine_tpu.utils.adata import as_compressed

            Xc = as_compressed(X_host)
            data = np.asarray(Xc.data)
            flat = data.reshape(-1)
            total = float(data.sum(dtype=np.float64))
            minimum = x_min(Xc)
            row_sums = np.asarray(Xc.sum(axis=1), dtype=np.float64).ravel()
            # column sums (position-weighted below ALONGSIDE the row hash):
            # the .data stream and row sums are invariant under per-row
            # remaps of column indices (e.g. a gene-annotation update), so
            # without this a stale device-X cache could be silently reused
            col_sums = np.asarray(Xc.sum(axis=0), dtype=np.float64).ravel()
            colkey = np.random.default_rng(0xC01).random(len(col_sums))
            col_hash = float(np.dot(col_sums, colkey))
            shape = ("sparse",) + tuple(Xc.shape) + (int(Xc.nnz), col_hash)
        else:
            arr = np.asarray(X_host)
            flat = arr.reshape(-1)
            total = float(arr.sum(dtype=np.float64))
            minimum = float(arr.min())
            row_sums = (arr.sum(axis=-1, dtype=np.float64)
                        if arr.ndim == 2 else flat)
            shape = arr.shape
        stride = max(1, flat.size // 4096)
        sample = np.asarray(flat[::stride][:4096], dtype=np.float32)
        poskey = np.random.default_rng(0xA1F1E).random(len(row_sums))
        return (shape, sample.tobytes(), total, minimum,
                float(np.dot(np.asarray(row_sums, dtype=np.float64), poskey)))

    def _transform(self, adata, n_iter: int) -> None:
        """Out-of-sample projection: plain Frobenius MU onto frozen W
        (reference main.py:678-724)."""
        if adata.shape[1] != self.n_features:
            # the reference lets this surface as an opaque matmul shape
            # error deep in the projection; fail with the actual reason
            raise ValueError(
                f"adata has {adata.shape[1]} genes but the model was fit "
                f"on {self.n_features}; transform requires the same gene "
                "axis (same order) as the training data."
            )
        placement = Placement(self.device)
        n_sample = adata.shape[0]

        mp = placement.is_multiprocess
        cached = getattr(self, "_x_cache", None)
        use_cache = (cached is not None
                     and not env_flag("ALPINE_TPU_NO_X_CACHE")
                     and cached[2] == n_sample
                     and cached[1] == self._x_fingerprint(adata.X))
        mp_locals = None
        if mp:
            # collectives must run UNCONDITIONALLY and in the same order on
            # every process — a consistency check inside the cache-miss
            # branch would deadlock whenever processes disagree on the hit
            from alpine_tpu.parallel import distributed as dist

            # include the model's resolved storage regime: ranks holding
            # models fitted/loaded under different data_dtype_ would
            # compile different lockstep programs (e.g. mismatched
            # save/load files per host)
            dist.assert_same_across_processes(
                [adata.shape[1], placement.local_cell_shards,
                 mu.STORAGE_DTYPES.index(self._storage_dtype)],
                "per-process transform inputs (genes, per-process device "
                "count, model storage dtype)",
            )
            # near-equal shards allowed (h5ad row-range ingestion): agree
            # on the global width, the per-chunk H0 offsets and one common
            # padded chunk width, exactly as fit does
            mp_locals = dist.chunk_cell_sizes(placement, n_sample)
            # ...and the cache decision itself must be collective: a mixed
            # hit/miss would give processes different pad widths (hence
            # different compiled programs) — use the cache only if EVERY
            # process hit it
            hits = dist.process_allgather_rows(
                np.asarray([float(use_cache)]))
            use_cache = bool(hits.all())
        X = None
        cache_perm = None
        if use_cache:
            # same data the model was fit on: reuse the device-resident X
            # (already validated non-negative and pad-aligned at fit time).
            # cached[3] is the fit's LOCAL cell-axis pad (== global pad in
            # single-process mode); cached[4] is the fit's seeded global
            # cell shuffle (weighted-sharded / tiled fits) — the device X
            # is stored permuted, so H0 is re-paired below and the result
            # un-permuted (exact: the projection is per-cell independent)
            X = cached[0]
            pad = cached[3]
            cache_perm = cached[4]
        if X is None:
            if not (x_min(adata.X) >= 0):  # NaN fails this like a negative
                raise ValueError("All elements in adata.X must be non-negative.")
            X_array: Float32Array = dense_x(adata.X).T
            # shard_map / device_put need equal cell shards; zero columns
            # are neutral for the projection (columns are independent) and
            # are sliced off below (round-1 advisor finding: non-divisible
            # cell counts crashed the sharded transform).  Multi-process:
            # adata is THIS process's shard; every process pads its chunk
            # to ONE common aligned width (from the largest chunk — shards
            # may be near-equal) so each local device gets an equal piece
            if mp:
                n_max = int(mp_locals.max())
                target = n_max + (-n_max) % placement.local_cell_shards
                pad = target - n_sample
            else:
                pad = (-n_sample) % placement.cell_shards
            placement.check_gene_axis(self.n_features)
            # narrow cast first: half-size pad.  strict=False: out-of-sample
            # data need not be integer-representable (the reference's
            # transform accepts any non-negative X); int-fit models project
            # fractional queries at the compute-dtype width instead
            X_array = self._cast_x_host(X_array, strict=False)
            if pad:
                X_array = np.pad(X_array, ((0, 0), (0, pad)))
            X = placement.put_x_matrix(X_array)

        # NOT fold_in(key, 1): that is bit-identical to split(key)[1] — the
        # fit key — so the transform H0's bitstream coincided with the
        # fit's per-iteration sampling keys (see mu.transform_key)
        key = mu.transform_key(jax.random.PRNGKey(self.random_state))
        if mp:
            # draw the GLOBAL H0 identically on every process (matching the
            # single-device draw at the same global width), keep this
            # chunk's columns, zero-pad the local tail
            n_global = int(mp_locals.sum())
            off = int(mp_locals[: placement.process_chunk_index].sum())
            H0 = jnp.maximum(
                jax.random.uniform(
                    key, (self.total_components, n_global), dtype=jnp.float32
                )[:, off:off + n_sample],
                self.eps,
            )
            if cache_perm is not None:
                # mp-tiled fits cache the LOCALLY-permuted device X: keep
                # the caller-order H0-column ↔ cell pairing on it, exactly
                # like the single-process branch below
                H0 = H0[:, cache_perm]
            if pad:
                H0 = jnp.pad(H0, ((0, 0), (0, pad)))
        else:
            H0 = jnp.maximum(
                jax.random.uniform(
                    key, (self.total_components, n_sample + pad),
                    dtype=jnp.float32
                ),
                self.eps,
            )
            if cache_perm is not None:
                # keep the caller-order (seed-determined) H0-column ↔ cell
                # pairing on the permuted cached X: column p of the device
                # X is caller cell cache_perm[p]
                H0 = H0.at[:, :n_sample].set(H0[:, :n_sample][:, cache_perm])
        H0 = placement.put_cells_matrix(H0)
        W = placement.put_w_matrix(
            jnp.asarray(np.concatenate(self.matrices["Ws"], axis=1))
        )

        use_fused = self._use_tpu_kernels()
        H = mu.run_transform(
            W, X, H0, jnp.float32(self.eps), n_iter=n_iter,
            precision=self.matmul_precision, fused=use_fused,
            mesh=placement.mesh if use_fused and placement.is_sharded else None,
        )
        if mp:
            # each process keeps its own cells' columns (local pad trimmed)
            H_np = placement.local_cells_columns(H)[:, :n_sample].astype(
                np.float32)
        else:
            H_np = np.asarray(jax.device_get(H), dtype=np.float32)[:, :n_sample]
        if cache_perm is not None:
            # device column p was caller cell cache_perm[p]
            H_np = H_np[:, np.argsort(cache_perm)]
        Hs = split_h(H_np, self.n_all_components)

        for i, covariate in enumerate(self.covariate_keys):
            adata.obsm[covariate] = Hs[i].T
            adata.varm[covariate] = deepcopy(self.matrices["Ws"][i])
        adata.obsm["ALPINE_embedding"] = Hs[-1].T
        adata.varm["ALPINE_weights"] = deepcopy(self.matrices["Ws"][-1])

    def _compute_best_iter(self, train_loss) -> int:
        """Kneedle elbow of log10(recon loss) (reference main.py:755-770)."""
        elbow = find_elbow(
            np.log10(np.asarray(train_loss, dtype=np.float64)),
            curve="convex",
            direction="decreasing",
            polynomial_degree=2,
        )
        if elbow is not None and elbow > 0:
            return int(elbow)
        warnings.warn("Kneedle elbow not found, using default max_iter=200")
        return 200

    # ----------------------------------------------------------- validation
    def _validate_init_args(self) -> None:
        """Constructor arg validation (reference main.py:322-381, identical
        messages)."""
        if self.n_components <= 0:
            raise ValueError("n_components must be greater than 0.")

        if not isinstance(self.n_covariate_components, list):
            raise TypeError("n_covariate_components must be a list.")
        for n in self.n_covariate_components:
            if not isinstance(n, int) or n < 0:
                raise ValueError(
                    "Each element in n_covariate_components must be a non-negative integer."
                )

        if not isinstance(self.lam, list):
            raise TypeError("lam must be in a list.")
        for lam in self.lam:
            if not isinstance(lam, float) or lam < 0:
                raise ValueError("Each element in lam must be a non-negative float.")

        if not isinstance(self.alpha_W, float) or self.alpha_W < 0:
            raise ValueError("alpha_W must be a non-negative float.")

        if not isinstance(self.orth_W, float) or self.orth_W < 0:
            raise ValueError("orth_W must be a non-negative float.")

        if (
            not isinstance(self.l1_ratio_W, float)
            or self.l1_ratio_W < 0
            or self.l1_ratio_W > 1
        ):
            raise ValueError("l1_ratio_W must be a float between 0 and 1.")

        if not isinstance(self.scale_needed, bool):
            raise TypeError("scale_needed must be a boolean.")

        if not isinstance(self.loss_type, str):
            raise TypeError("loss_type must be a string.")
        valid_loss_types = ["kl-divergence", "frobenius"]
        if self.loss_type not in valid_loss_types:
            raise ValueError(f"loss_type must be one of {valid_loss_types}.")

        if not isinstance(self.eps, float) or self.eps < 0:
            raise ValueError("eps must be a non-negative float.")

        if not isinstance(self.random_state, int) or self.random_state < 0:
            raise ValueError("random_state must be a non-negative integer.")

        if self.matmul_precision not in ("highest", "default"):
            raise ValueError("matmul_precision must be 'highest' or 'default'.")

        if self.data_dtype not in mu.DATA_DTYPES:
            choices = ", ".join(f"'{d}'" for d in mu.DATA_DTYPES)
            raise ValueError(f"data_dtype must be one of: {choices}.")

    def _validate_fit_args(
        self, adata, covariate_keys, batch_size, max_iter, sampling_method, verbose
    ) -> None:
        """Fit arg validation (reference main.py:383-434).  NOTE: the
        reference's batch_size/max_iter checks are unreachable due to an
        `and`-instead-of-`or` bug (main.py:420-428); they are fixed here to
        actually enforce positive integers."""
        if not is_anndata(adata):
            raise TypeError("adata must be an AnnData object.")

        # sparse (CSR/CSC) X is accepted and densified at ingestion —
        # capability beyond the reference's dense-only contract
        # (main.py:395-400); the error strings below match the reference
        if not (isinstance(adata.X, np.ndarray) or is_sparse_x(adata.X)):
            raise TypeError("adata.X must be a numpy array.")
        elif len(adata.X.shape) != 2:
            raise ValueError("adata.X must be a 2D numpy array.")
        elif not (x_min(adata.X) >= 0):  # NaN fails this like a negative
            raise ValueError("All elements in adata.X must be non-negative.")

        if not isinstance(covariate_keys, list):
            raise TypeError("covariate_keys must be a list.")
        elif not len(covariate_keys) == len(self.n_covariate_components):
            raise ValueError(
                "Length of covariate_keys must match length of n_covariate_components."
            )
        else:
            for key in covariate_keys:
                if not isinstance(key, str):
                    raise TypeError("Each element in covariate_keys must be a string.")
                if key not in adata.obs.columns:
                    raise ValueError(f"Covariate key '{key}' not found in adata.obs.")
                if not adata.obs[key].dtype.kind == "O":
                    raise TypeError(
                        f"Covariate '{key}' in adata.obs must be a categorical or object type variable."
                    )

        if batch_size is not None and (not isinstance(batch_size, int) or batch_size <= 0):
            raise TypeError("batch_size must be a positive integer.")

        if max_iter is not None and (not isinstance(max_iter, int) or max_iter <= 0):
            raise TypeError("max_iter must be a positive integer.")

        if not isinstance(sampling_method, str):
            raise TypeError("sampling_method must be a string.")
        # "tiled" is a TPU-native extension (tile-granular permutation after
        # a seeded global shuffle; see mu.MUConfig.tile); the unknown-method
        # message keeps the reference text (main.py:430-434)
        if sampling_method not in ("random", "weighted", "weighted_fast",
                                   "tiled"):
            raise ValueError(
                f"Unknown sampling method: {sampling_method}. Only 'weighted', and 'random' are supported."
            )

        if not isinstance(verbose, bool):
            raise TypeError("verbose must be a boolean.")
