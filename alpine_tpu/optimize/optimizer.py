"""ComponentOptimizer — TPE Bayesian hyperparameter search with CV scoring.

Behavior parity target: class `ComponentOptimizer` in
`/root/reference/alpine/optimization.py:15-604` — search over
n_total_components (quniform), per-covariate lam (qloguniform), orth_W /
alpha_W / l1_ratio_W (uniform) and per-block split ratios; each trial scored
by StratifiedKFold cross-validation, clustering the validation fold's
unguided embedding and summing ARI + homogeneity against every covariate
(low = covariate-free embedding = good; the score is *minimized*,
optimization.py:216).  Public API, error messages, printed strings and the
history-DataFrame layout (including its descending-score sort quirk,
optimization.py:473-475) are contracts; the implementation below is
structured around a declarative `SearchSpace` + free allocation/scoring
helpers rather than the reference's inline construction.

Divergences from the reference (all forced by the environment, documented):
- hyperopt -> `alpine_tpu.optimize.tpe` (self-contained TPE, same API
  shape).  Native hyperopt Trials pickles can be imported best-effort via
  `alpine_tpu.optimize.tpe.import_hyperopt_trials`.
- scanpy neighbors+leiden -> `alpine_tpu.optimize.scoring` (sklearn kNN
  graph + native C++ Leiden, `alpine_tpu/native/leiden.cpp`).
- `device` defaults to "auto" (JAX default backend) rather than "cuda".
- reference `extend_training` passes the flat best-point dict straight to
  its component distributor (optimization.py:320, a KeyError); here both
  search entry points share one working `_decode_best`.

Like the reference, TPE is sequential by nature (each suggestion conditions
on all previous trials); the inner CV fits run on the accelerator and only
embeddings return to host for scoring.  On a MULTI-PROCESS mesh the search
runs trial-level parallel rounds instead (tpe.fmin_parallel — the same
tradeoff hyperopt's parallel workers make): every process deterministically
computes the round's n_processes suggestions, evaluates ONE on its local
devices, and only the scores cross processes, so Trials stay identical
everywhere.
"""

from __future__ import annotations

import pickle
from copy import copy
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.model_selection import StratifiedKFold

from alpine_tpu.models.alpine import ALPINE
from alpine_tpu.optimize import scoring
from alpine_tpu.optimize.tpe import (
    STATUS_FAIL,
    STATUS_OK,
    Trials,
    fmin,
    hp,
    tpe,
)
from alpine_tpu.utils.adata import is_anndata

# hyperparameters drawn by every search, as (name, kwarg-of-range) pairs;
# ranges are validated and turned into TPE expressions table-driven
_UNIFORM_DIMS = ("orth_W", "alpha_W", "l1_ratio_W")


def allocate_components(
    total: int, ratios: Sequence[float], floors: Sequence[int]
) -> Tuple[int, List[int]]:
    """Partition a total component budget into guided blocks + unguided rest.

    Provisionally reserves ceil(total/2) for the guided side, hands covariate
    i its normalized-ratio share of that reserve (rounded, floored at
    ``floors[i]``), and leaves whatever remains of the *full* budget to the
    unguided block — which can therefore go small or negative when floors
    bite; the caller rejects such draws.  Exact behavior parity with
    reference `_distribute_components` (optimization.py:153-176).
    """
    weights = np.asarray([float(r) for r in ratios], dtype=float)
    weights = weights / weights.sum()
    reserve = total - total // 2
    guided = [
        max(int(floor), int(round(reserve * w)))
        for floor, w in zip(floors, weights[:-1])
    ]
    return total - sum(guided), guided


@dataclass(frozen=True)
class SearchSpace:
    """Declarative search-space: owns range validation, the TPE expression
    tree, and decoding of raw TPE points into model hyperparameters."""

    n_total_components_range: Tuple[int, int]
    lam_range: Tuple[float, float]
    orth_W_range: Tuple[float, float]
    alpha_W_range: Tuple[float, float]
    l1_ratio_W_range: Tuple[float, float]
    n_covariates: int

    def validate(self) -> None:
        """Identical messages to reference optimization.py:552-596."""
        lo, hi = None, None
        rng = self.n_total_components_range
        if not isinstance(rng, tuple) or len(rng) != 2:
            raise TypeError("n_total_components_range must be a tuple of two integers")
        lo, hi = rng
        if lo >= hi:
            raise ValueError(
                "n_total_components_range must be a tuple with the first element less than the second"
            )
        if lo < 2:
            raise ValueError(
                "n_total_components_range must be a tuple with the first element greater than or equal to 2"
            )

        for name in ("lam_range",) + tuple(f"{d}_range" for d in _UNIFORM_DIMS):
            rng = getattr(self, name)
            if not isinstance(rng, tuple) or len(rng) != 2:
                raise TypeError(f"{name} must be a tuple of two floats")
            if not all(isinstance(x, float) for x in rng):
                raise TypeError(f"All elements of {name} must be floats")
            if rng[0] >= rng[1]:
                raise ValueError(
                    f"{name} must be a tuple with the first element less than the second"
                )
        if self.l1_ratio_W_range[1] > 1.0:
            raise ValueError(
                "l1_ratio_W_range's second element must be less than or equal to 1.0"
            )

    def to_tpe(self) -> Dict:
        """TPE expression tree; same labels/distributions as the reference's
        space (optimization.py:95-120): quniform component total, uniform
        regularizers, qloguniform lambdas, one uniform ratio per block."""
        tree = {
            "n_total_components": hp.quniform(
                "n_total_components", *self.n_total_components_range, 1
            ),
            "splits": [
                hp.uniform(f"split_{i}", 0, 1) for i in range(self.n_covariates + 1)
            ],
        }
        for dim in _UNIFORM_DIMS:
            tree[dim] = hp.uniform(dim, *getattr(self, f"{dim}_range"))
        lo, hi = self.lam_range
        for i in range(self.n_covariates):
            tree[f"lam_{i}"] = hp.qloguniform(f"lam_{i}", np.log(lo), np.log(hi), 1)
        return tree

    def structure_point(self, flat: Dict) -> Dict:
        """Lift a flat label->value dict (fmin's `best`) into the structured
        form `objective` receives (with the "splits" list)."""
        point = {k: flat[k] for k in ("n_total_components",) + _UNIFORM_DIMS}
        point["splits"] = [flat[f"split_{i}"] for i in range(self.n_covariates + 1)]
        for i in range(self.n_covariates):
            point[f"lam_{i}"] = flat[f"lam_{i}"]
        return point


class ComponentOptimizer:
    # validated eagerly so a bad value fails at construction instead of
    # crashing the search after N completed trial fits.  "tiled" is the
    # TPU-native tile-permutation minibatch sampler (mu.MUConfig.tile):
    # minibatch searches stream tile-granular gathers instead of paying the
    # chip's random-gather engine on every CV fit (round-3 verdict item 3).
    _VALID_SAMPLING = ("random", "weighted", "weighted_fast", "tiled")

    def __init__(
        self,
        adata,
        covariate_keys: List[str],
        use_als: bool = False,
        loss_type: str = "kl-divergence",
        max_iter: Optional[int] = None,
        batch_size: Optional[int] = None,
        sampling_method: str = "random",
        device="auto",
        random_state: int = 42,
        fold_batching: bool = True,
        shape_bucket="auto",
        data_dtype: str = "auto",
    ):
        self._validate_init_args(
            adata, covariate_keys, loss_type, max_iter, batch_size, device, random_state
        )
        if not isinstance(fold_batching, bool):
            raise TypeError("fold_batching must be a boolean")
        if shape_bucket is not None and shape_bucket != "auto" and (
            not isinstance(shape_bucket, int) or shape_bucket < 1
        ):
            raise ValueError("shape_bucket must be 'auto', a positive integer, or None")
        if sampling_method not in self._VALID_SAMPLING:
            raise ValueError(
                f"Unknown sampling method: {sampling_method}. Only 'weighted', "
                "'random', 'weighted_fast', and 'tiled' are supported."
            )
        if sampling_method == "weighted_fast":
            # mirror the model layer's contract: full-epoch joint mode.
            # Trial fits use the counts strategy (mu.weighted_counts) —
            # the batched CV path draws choice-identical per-fold counts,
            # so fold scores match 'weighted' to float noise while the
            # per-epoch gathers disappear.
            if batch_size is not None:
                raise ValueError(
                    "sampling_method='weighted_fast' supports full-epoch "
                    "joint mode only (batch_size=None); minibatch weighted "
                    "searches use sampling_method='weighted'."
                )
            if use_als:
                raise ValueError(
                    "weighted_fast requires joint mode (use_als=False)."
                )
        if sampling_method == "tiled":
            # mirror the model layer's contract (models/alpine.py) at
            # construction, not after N completed trial fits: tiled is a
            # joint-mode minibatch sampler
            if batch_size is None:
                raise ValueError(
                    "sampling_method='tiled' is a minibatch mode: pass "
                    "batch_size; full-batch searches use "
                    "sampling_method='random'."
                )
            if use_als:
                raise ValueError(
                    "tiled sampling requires joint mode (use_als=False)."
                )
        from alpine_tpu.ops import mu

        if data_dtype not in mu.DATA_DTYPES:
            choices = ", ".join(f"'{d}'" for d in mu.DATA_DTYPES)
            raise ValueError(f"data_dtype must be one of: {choices}.")

        from alpine_tpu.parallel.mesh import Placement, resolve_device

        # multi-process meshes get TRIAL-level parallelism: TPE suggests
        # n_processes points per round, each process evaluates one on ITS
        # OWN devices, and only the scores are exchanged (see _run_tpe).
        # The fits themselves must stay process-local — CV folds are
        # host-side subsets of the full dataset, and a multi-process fit
        # would re-interpret each fold as a per-process shard.
        self._setup_execution(Placement(resolve_device(device)))

        self.adata = adata.copy()
        self.covariate_keys: List[str] = covariate_keys
        self.use_als: bool = use_als
        self.loss_type: str = loss_type
        self.max_iter: Optional[int] = max_iter
        self.batch_size: Optional[int] = batch_size
        self.sampling_method: str = sampling_method
        self.device = device
        self.random_state: int = random_state
        # vmap-batch the CV folds of each trial into one XLA program
        # (new capability vs the reference's sequential fold loop,
        # optimization.py:241-283; see optimize/batched.py).  Requires a
        # frozen max_iter, so the first trial under max_iter auto-detection
        # still runs sequentially.
        self.fold_batching: bool = fold_batching
        # Trial fits compile with bucket-padded block shapes (zero phantom
        # components — exactly neutral, tests/test_bucketing.py) so a
        # 100-eval search compiles O(#buckets) programs instead of O(#evals)
        # (SURVEY §7 hard-part 2; 20-120 s per remote TPU compile).  "auto"
        # (default) pads to shared geometric levels (mu.auto_bucket_blocks,
        # bounding distinct shapes per sweep); an int rounds each block to
        # that multiple; None disables.  Bucketing only changes each trial's
        # RNG init draws, not the update math; fit_the_best_param refits at
        # exact shapes.
        self.shape_bucket = shape_bucket
        # X storage dtype for every trial fit.  "auto" resolves ONCE from
        # the full dataset (utils.adata.suggest_data_dtype) so all folds and
        # trials share one storage regime (per-fold resolution could pick
        # int8 on one fold and int16 on another — a pointless recompile and
        # a cross-fold inconsistency); integer counts get exact narrow
        # storage, fractional data stays float32.
        from alpine_tpu.utils.adata import dtype_can_store, suggest_data_dtype

        self.data_dtype: str = data_dtype
        self.data_dtype_: str = (
            suggest_data_dtype(self.adata.X) if data_dtype == "auto"
            else data_dtype
        )
        # an EXPLICIT integer dtype must be validated HERE: the batched CV
        # path casts the stacked fold tensors directly (prepare_fold_data),
        # where a non-representable value would silently truncate/wrap and
        # poison every trial's score instead of raising like ALPINE.fit
        if not dtype_can_store(self.data_dtype_, self.adata.X):
            limit = np.iinfo(self.data_dtype_).max
            raise ValueError(
                f"data_dtype='{self.data_dtype_}' requires adata.X to hold "
                f"integer values in [0, {limit}]; use 'auto' to select a "
                "storage dtype that fits the data."
            )
        self.best_param: dict = {}

        if self._mp_workers > 1:
            # every process must have constructed the optimizer with the
            # IDENTICAL full dataset and settings: the TPE streams (and so
            # the collectives below) stay in lockstep only if every process
            # derives the same suggestions from the same state.  Validated
            # here, before any expensive trial fit.
            self._assert_consistent_across_processes()

        self.max_iter_detect = self.max_iter is None
        if self.max_iter_detect:
            print(
                "Owing to max_iter being None, it will be determine by the "
                "average of the first n_splits iterations."
            )

    # ---------------------------------------------------- multi-process
    def _setup_execution(self, placement) -> None:
        """Derive where this process's trial fits run.  Single-process:
        the user's `device` as-is.  Multi-process 1-D mesh: this process's
        LOCAL sub-mesh (trial-level parallelism; each process's CV fits —
        and their fold batching — use only its own devices)."""
        self._mp_workers, self._mp_rank = 1, 0
        if not placement.is_multiprocess:
            self._exec_device = placement.target
            return
        if len(placement.mesh.axis_names) != 1:
            raise NotImplementedError(
                "multi-process searches support 1-D (cell-axis) meshes "
                "only; use distributed.global_cell_mesh()."
            )
        import jax
        from jax.sharding import Mesh

        if placement.n_processes != jax.process_count():
            raise ValueError(
                "a multi-process search mesh must span every process "
                f"(mesh has {placement.n_processes} of "
                f"{jax.process_count()} processes) — the per-round score "
                "exchange is a global collective."
            )
        pid = jax.process_index()
        local = [d for d in placement.mesh.devices.flat
                 if d.process_index == pid]
        # contiguity (and device ownership) validated by Placement
        _ = placement.process_chunk_index
        self._mp_workers = placement.n_processes
        # worker index == jax.process_index(): the loss exchange
        # (process_allgather) orders rows by process index
        self._mp_rank = pid
        self._exec_device = Mesh(np.asarray(local),
                                 (placement.mesh.axis_names[0],))

    def _assert_consistent_across_processes(self) -> None:
        """Cross-check that every process built this optimizer from the
        same data and settings (cheap digests; exact for the integer
        fields).  A divergence would desynchronize the TPE streams and
        deadlock the per-round collectives — fail now, with the reason."""
        import zlib

        from alpine_tpu.parallel import distributed as dist

        fp = ALPINE._x_fingerprint(self.adata.X)
        shape, sample_bytes, total, minimum, row_hash = fp
        labels = "\x1f".join(
            "\x1e".join(
                "nan" if pd.isna(v) else str(v)
                for v in np.asarray(self.adata.obs[key], dtype=object)
            )
            for key in self.covariate_keys
        )
        settings = repr((
            self.covariate_keys, self.use_als, self.loss_type,
            self.max_iter, self.batch_size, self.sampling_method,
            self.random_state, self.fold_batching, self.shape_bucket,
            self.data_dtype_,
        ))
        dist.assert_same_across_processes(
            [
                float(zlib.crc32(repr(shape).encode())),
                float(zlib.crc32(sample_bytes)),
                total, minimum, row_hash,
                float(zlib.crc32(labels.encode())),
                float(zlib.crc32(settings.encode())),
            ],
            "ComponentOptimizer inputs (adata digest, covariate labels, "
            "settings)",
        )

    def _search_state_digest(self, additional_evals: int) -> List[float]:
        """Float digest of everything the lockstep TPE rounds depend on.
        Must cover the search-space BOUNDS (not just its labels) and the
        CONTENTS of any pre-loaded trials: same-shaped spaces with different
        ranges, or same-length trials files with different points, would
        fork the per-process suggestion streams while every count-based
        check still passes — each worker would then evaluate ITS version of
        point j and the exchanged losses would silently disagree in meaning."""
        import zlib

        # Expression is a frozen dataclass -> its repr carries kind/low/
        # high/q exactly; the space tree is rendered key-sorted
        space_repr = repr([(k, self.space[k]) for k in sorted(self.space)])
        trials_repr = repr([
            (
                t.get("tid"),
                sorted((k, tuple(v))
                       for k, v in t.get("misc", {}).get("vals", {}).items()),
                t.get("result", {}).get("loss"),
                t.get("result", {}).get("status"),
            )
            for t in self.trials.trials
        ])
        return [
            float(len(self.trials.trials)),
            float(additional_evals),
            float(self.n_splits),
            float(zlib.crc32(space_repr.encode())),
            float(zlib.crc32(trials_repr.encode())),
            float(zlib.crc32(repr((
                self.min_covariate_components,
                -1 if self.max_iter is None else self.max_iter,
            )).encode())),
        ]

    def _remote_trial_result(self, point: Dict, loss: float) -> Dict:
        """Trial record for a point another process evaluated this round.
        Everything except the exchanged loss is deterministically derivable
        from the point, so every process appends identical records."""
        params = self._point_to_params(point)
        if params is None:
            return {"loss": np.inf, "status": STATUS_FAIL}
        record = dict(params)
        record["lam"] = list(record["lam"])
        # parallel rounds only run once max_iter is frozen (see round_size
        # in _run_tpe), so the evaluating process recorded this same value
        record["max_iter"] = self.max_iter
        record["score"] = loss
        return {"loss": loss, "status": STATUS_OK, "params": record}

    # ------------------------------------------------------------- search
    def search_hyperparams(
        self,
        n_total_components_range: Tuple[int, int] = (10, 100),
        lam_range: Tuple[float, float] = (1.0, 1e4),
        orth_W_range: Tuple[float, float] = (0.0, 1.0),
        alpha_W_range: Tuple[float, float] = (0.0, 100.0),
        l1_ratio_W_range: Tuple[float, float] = (0.0, 1.0),
        min_covariate_components: Optional[List[int]] = None,
        n_splits: int = 3,
        max_evals: int = 100,
        trials_filename: Optional[str] = None,
    ):
        space = SearchSpace(
            n_total_components_range,
            lam_range,
            orth_W_range,
            alpha_W_range,
            l1_ratio_W_range,
            n_covariates=len(self.covariate_keys),
        )
        space.validate()
        self._check_cv_args(n_splits, max_evals)

        self.iter_records: List = []
        self.n_splits: int = n_splits
        self._search_space = space
        self.space = space.to_tpe()
        self.min_covariate_components = self._resolve_floors(min_covariate_components)

        if trials_filename is not None:
            self.load_trials(trials_filename)
        else:
            self.trials = Trials()

        return self._run_tpe(max_evals)

    def extend_training(self, extra_evals=50):
        """Continue the Bayesian optimization with more evaluations
        (reference optimization.py:289-333)."""
        if not hasattr(self, "trials"):
            raise RuntimeError("Please run bayesian_search() before extending training.")
        return copy(self._run_tpe(extra_evals))

    def _run_tpe(self, additional_evals: int):
        """Drive fmin for `additional_evals` more trials on top of whatever
        the Trials object already holds, then decode + record the best.

        Multi-process meshes run trial-level parallel rounds
        (tpe.fmin_parallel): every process computes the same n_processes
        suggestions per round from its identical rng/trials state,
        evaluates ONE of them on its local devices, and only the scores
        cross processes (one float per trial, allgathered).  While
        max_iter elbow detection is live the rounds stay replicated
        (size 1) so every process replays the freeze identically."""
        if self._mp_workers > 1:
            from alpine_tpu.optimize.tpe import fmin_parallel
            from alpine_tpu.parallel import distributed as dist

            # the round loop below is a sequence of collectives — fail
            # fast (with the reason) if the processes disagree on what
            # search they are running
            dist.assert_same_across_processes(
                self._search_state_digest(additional_evals),
                "search state (completed trials, max_evals, n_splits, "
                "space bounds, loaded trial contents, floors, max_iter)",
            )
            best = fmin_parallel(
                self.objective,
                self.space,
                fn_remote=self._remote_trial_result,
                exchange_losses=lambda v: dist.process_allgather_rows(
                    np.asarray([v], np.float64)
                ).ravel(),
                n_workers=self._mp_workers,
                worker_index=self._mp_rank,
                algo=tpe.suggest,
                max_evals=len(self.trials.trials) + additional_evals,
                trials=self.trials,
                rstate=np.random.default_rng(self.random_state),
                # max_iter detection mutates optimizer state per evaluation
                # — replicate those rounds on every process
                round_size=lambda: (1 if self.max_iter is None
                                    else self._mp_workers),
            )
            # replicated (size-1) rounds evaluate locally with NO exchange;
            # on real hardware low-bit float differences between each
            # process's devices could silently fork the TPE streams there.
            # Verify the final trial record and the frozen max_iter agree
            # everywhere — a fork becomes a clear error, not garbage trials.
            dist.assert_same_across_processes(
                [float(t["result"].get("loss", np.inf))
                 for t in self.trials.trials]
                + [float(-1 if self.max_iter is None else self.max_iter)],
                "post-search trials (replicated rounds diverged across "
                "processes — per-device float drift in max_iter detection?)",
            )
        else:
            best = fmin(
                self.objective,
                self.space,
                algo=tpe.suggest,
                max_evals=len(self.trials.trials) + additional_evals,
                trials=self.trials,
                rstate=np.random.default_rng(self.random_state),
            )
        if best is None:
            raise RuntimeError("Hyperparameter optimization did not return any result.")
        return self._decode_best(best)

    def _decode_best(self, best: Dict) -> dict:
        """Flat fmin point -> self.best_param (the ALPINE ctor kwargs)."""
        params = self._point_to_params(self._search_space.structure_point(best))
        if params is None:  # fmin returns the best *successful* trial's
            # point, so an invalid allocation here cannot happen; guard anyway
            raise RuntimeError("Best trial decodes to an invalid component split.")
        self.best_param = dict(params, random_state=self.random_state)
        return self.best_param

    def _resolve_floors(self, min_covariate_components):
        """Per-covariate component floors; default = observed level count."""
        if min_covariate_components is None:
            return [self.adata.obs[key].nunique() for key in self.covariate_keys]
        if isinstance(min_covariate_components, list):
            if len(min_covariate_components) != len(self.covariate_keys):
                raise ValueError(
                    "min_covariate_components should have the same length as the number of covariates."
                )
        if any(comp < 2 for comp in min_covariate_components):
            raise ValueError(
                "min_covariate_components should be greater than or equal to 2."
            )
        return min_covariate_components

    # ------------------------------------------------------------ trials
    def _point_to_params(self, point: Dict) -> Optional[dict]:
        """Decode one structured TPE point into model hyperparameters, or
        None when the component allocation is invalid (the reference's
        cond_1/cond_2 rejection, optimization.py:184-187)."""
        n_unguided, guided = allocate_components(
            int(point["n_total_components"]),
            [float(s) for s in point["splits"]],
            self.min_covariate_components,
        )
        if sum(guided) > n_unguided or any(n < 2 for n in guided):
            return None
        return {
            "n_components": n_unguided,
            "n_covariate_components": guided,
            "lam": [float(point[f"lam_{i}"]) for i in range(len(guided))],
            "orth_W": point["orth_W"],
            "alpha_W": point["alpha_W"],
            "l1_ratio_W": point["l1_ratio_W"],
        }

    def _distribute_components(self, space):
        """Back-compat shim over `allocate_components` (reference
        optimization.py:153-176)."""
        return allocate_components(
            int(space["n_total_components"]),
            [float(s) for s in space["splits"]],
            self.min_covariate_components,
        )

    def objective(self, space):
        """One trial.  Invalid component distributions fail with loss=inf
        (reference optimization.py:178-218)."""
        params = self._point_to_params(space)
        if params is None:
            return {"loss": np.inf, "status": STATUS_FAIL}

        score = self.calc_score(params)

        record = dict(params)
        record["lam"] = list(record["lam"])
        # the max_iter this trial actually ran: the frozen/user value, or —
        # for the trial that ran elbow detection — its last fold's elbow.
        # (self.max_iter, not max_iter_detect, is the discriminator: once
        # frozen, later trials run batched and append no iter_records, and a
        # repeated search starts with an empty iter_records list.)
        record["max_iter"] = (
            self.max_iter if self.max_iter is not None else self.iter_records[-1]
        )
        record["score"] = score

        # freeze max_iter to the mean elbow once one full CV round ran
        if self.max_iter is None and len(self.iter_records) >= self.n_splits:
            self.max_iter = int(sum(self.iter_records) / len(self.iter_records))

        return {"loss": score, "status": STATUS_OK, "params": record}

    # ------------------------------------------------------------ scoring
    def _stratified_folds(self):
        """StratifiedKFold index pairs over the joint covariate label
        ("_"-joined strings, reference optimization.py:229-241).  Missing
        covariate values stringify to "nan" — one stratification class, the
        reference's effective behavior — rather than tripping sklearn's NaN
        check (newer pandas string dtypes keep NaN through astype(str))."""
        def as_str(key):
            col = np.asarray(self.adata.obs[key], dtype=object)
            return np.array(
                ["nan" if pd.isna(v) else str(v) for v in col], dtype=object
            )

        labels = as_str(self.covariate_keys[0])
        for key in self.covariate_keys[1:]:
            labels = labels + "_" + as_str(key)
        splitter = StratifiedKFold(
            n_splits=self.n_splits, shuffle=True, random_state=self.random_state
        )
        return list(splitter.split(self.adata.X, labels))

    def _scoring_device(self):
        """Accelerator for the fold kNN search (ops/knn.py), or None for the
        host sklearn path.  A mesh contributes its first device; a CPU
        device stays on the float64-exact host path."""
        from jax.sharding import Mesh

        from alpine_tpu.parallel.mesh import resolve_device

        resolved = resolve_device(self._exec_device)
        dev = resolved.devices.flat[0] if isinstance(resolved, Mesh) else resolved
        return dev if getattr(dev, "platform", "cpu") != "cpu" else None

    def _leakage_score(self, embedding: np.ndarray, rows: np.ndarray) -> float:
        """Cluster a validation embedding and average ARI+homogeneity leakage
        across covariates (reference optimization.py:271-278; scanpy
        neighbors+leiden replaced by the in-repo kNN + native Leiden; on an
        accelerator the exact kNN search runs there blockwise)."""
        clusters = scoring.leiden(
            np.asarray(embedding), n_neighbors=15, resolution=1.0,
            seed=self.random_state, device=self._scoring_device(),
        )
        per_cov = [
            scoring.embedding_score(clusters, self.adata.obs[key].to_numpy()[rows])
            for key in self.covariate_keys
        ]
        return float(np.mean(per_cov))

    def calc_score(self, args) -> float:
        """Stratified-CV covariate-leakage score for one hyperparameter
        setting (reference optimization.py:220-287): fit on train folds,
        transform validation, score the unguided embedding; mean over folds."""
        folds = self._stratified_folds()
        if self.fold_batching and self.max_iter is not None:
            embeddings = self._batched_fold_embeddings(args, folds)
        else:
            embeddings = (self._fit_one_fold(args, tr, va) for tr, va in folds)
        scores = [
            self._leakage_score(emb, val_idx)
            for (_, val_idx), emb in zip(folds, embeddings)
        ]
        return float(np.mean(scores))

    def _bucketed(self, true_blocks):
        """Padded compile shape for one trial's blocks (None = exact)."""
        from alpine_tpu.ops.mu import auto_bucket_blocks, bucket_blocks

        if self.shape_bucket == "auto":
            return auto_bucket_blocks(true_blocks)
        if self.shape_bucket:
            return bucket_blocks(true_blocks, self.shape_bucket)
        return None

    def _fit_one_fold(self, args, train_idx, val_idx) -> np.ndarray:
        """Fit on one training fold, return the validation fold's unguided
        embedding (host-side)."""
        train_adata = self.adata[train_idx].copy()
        val_adata = self.adata[val_idx].copy()

        true_blocks = tuple(args["n_covariate_components"]) + (args["n_components"],)
        model = ALPINE(
            use_als=self.use_als,
            random_state=self.random_state,
            loss_type=self.loss_type,
            device=self._exec_device,
            component_bucket=self._bucketed(true_blocks),
            data_dtype=self.data_dtype_,
            **args,
        )
        model.fit(
            adata=train_adata,
            covariate_keys=self.covariate_keys,
            max_iter=self.max_iter,
            batch_size=self.batch_size,
            sampling_method=self.sampling_method,
            verbose=False,
        )
        model.store_embeddings(train_adata)
        model.transform(val_adata)

        if self.max_iter_detect and self.max_iter is None:
            # only while elbow detection is live: after the freeze the fits
            # run at the frozen value and must not drift the recorded mean
            self.iter_records.append(model.max_iter)
        return np.asarray(val_adata.obsm["ALPINE_embedding"])

    def _fold_data(self, folds):
        """Trial-invariant stacked fold tensors, built and device-placed
        ONCE per search (they depend only on the data, folds and sampling
        mode — re-uploading them every TPE trial wastes the interconnect)."""
        from jax.sharding import Mesh

        from alpine_tpu.optimize.batched import prepare_fold_data
        from alpine_tpu.parallel.mesh import resolve_device
        from alpine_tpu.utils.encoder import FeatureEncoders

        key = (self.n_splits, self.sampling_method, self.data_dtype_)
        cached = getattr(self, "_fold_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        encoders = FeatureEncoders(self.covariate_keys)
        Ys = encoders.fit_transform(self.adata.obs)  # (cells x labels) each
        resolved = resolve_device(self._exec_device)
        from alpine_tpu.utils.adata import dense_x

        from alpine_tpu.ops.mu import DEFAULT_TILE

        fd = prepare_fold_data(
            dense_x(self.adata.X), Ys, folds,
            weighted=(self.sampling_method in ("weighted", "weighted_fast")),
            mesh=resolved if isinstance(resolved, Mesh) else None,
            device=None if isinstance(resolved, Mesh) else resolved,
            x_dtype=self.data_dtype_,
            tile=DEFAULT_TILE if self.sampling_method == "tiled" else 0,
            shuffle_seed=self.random_state,
        )
        self._fold_cache = (key, fd)
        return fd

    def _batched_fold_embeddings(self, args, folds) -> List[np.ndarray]:
        """All CV folds of this trial as one vmapped program
        (optimize/batched.py); returns one validation embedding per fold."""
        from alpine_tpu.optimize.batched import batched_fold_embeddings

        true_blocks = tuple(args["n_covariate_components"]) + (args["n_components"],)
        blocks = self._bucketed(true_blocks) or true_blocks
        return batched_fold_embeddings(
            fold_data=self._fold_data(folds),
            blocks=blocks,
            true_blocks=true_blocks,
            lam=[float(l) for l in args["lam"]],
            orth_w=float(args["orth_W"]),
            alpha_w=float(args["alpha_W"]),
            l1_ratio=float(args["l1_ratio_W"]),
            eps=1e-6,
            loss_kl=(self.loss_type == "kl-divergence"),
            use_als=self.use_als,
            batch_size=self.batch_size,
            weighted=(self.sampling_method in ("weighted", "weighted_fast")),
            weighted_counts=(self.sampling_method == "weighted_fast"),
            max_iter=self.max_iter,
            scale=True,
            seed=self.random_state,
            x_dtype=self.data_dtype_,
        )

    # -------------------------------------------------------- persistence
    def __getstate__(self):
        # the fold cache holds device-resident arrays (never pickle them),
        # and jax Device/Mesh objects serialize as descriptors
        from alpine_tpu.parallel.mesh import describe_device

        state = dict(self.__dict__)
        state.pop("_fold_cache", None)
        # derived from `device` + the live process topology; rebuilt on load
        state.pop("_exec_device", None)
        state.pop("_mp_workers", None)
        state.pop("_mp_rank", None)
        state["device"] = describe_device(state.get("device"))
        return state

    def __setstate__(self, state):
        from alpine_tpu.parallel.mesh import Placement, restore_device, resolve_device

        state["device"] = restore_device(state.get("device"))
        # pickles from before the data_dtype kwarg ran float32 fits; keep
        # that regime on resume rather than re-resolving to a narrow dtype
        state.setdefault("data_dtype", "float32")
        state.setdefault("data_dtype_", state["data_dtype"]
                         if state["data_dtype"] != "auto" else "float32")
        self.__dict__.update(state)
        # recompute the execution topology against the LIVE runtime (the
        # pickling host's device objects are meaningless here)
        self._setup_execution(Placement(resolve_device(self.device)))
        if self._mp_workers > 1:
            # same guard as construction: each rank unpickles its own copy
            # (adata travels inside the pickle), and a stale rank would mix
            # losses computed on different datasets into one Trials object
            self._assert_consistent_across_processes()

    def save_trials(self, filename: str):
        """Pickle the current trials (reference optimization.py:335-345)."""
        with open(filename, "wb") as f:
            pickle.dump(self.trials, f)
        print(f"Trials saved to {filename}")

    def load_trials(self, filename: str):
        """Load pickled trials (reference optimization.py:347-357).  Accepts
        both this module's Trials pickles and, best-effort, real hyperopt
        Trials pickles (import shim in optimize/tpe.py)."""
        from alpine_tpu.optimize.tpe import import_hyperopt_trials, load_foreign_pickle

        loaded = load_foreign_pickle(filename)
        if not isinstance(loaded, Trials):
            loaded = import_hyperopt_trials(loaded)
        self.trials = loaded
        print(f"Trials loaded from {filename}")

    # -------------------------------------------------------- inspection
    def get_hyperparameter(self, idx):
        """Hyperparameters of the idx-th row of the (score-sorted) history
        (reference optimization.py:359-385)."""
        wanted = self.get_train_history().iloc[idx]["tid"]
        for trial in self.trials.trials:
            if trial["tid"] == wanted:
                return trial["result"]["params"]

    #: get_train_history column layout (matches the reference's post-reorder
    #: frame, optimization.py:452-470): component columns first, then the
    #: scalar params in trial-record order, per-covariate lambdas last.
    @staticmethod
    def _history_row(params: Dict, loss: float, tid) -> Dict:
        guided = params["n_covariate_components"]
        row = {"n_components": params["n_components"]}
        row.update({f"n_covariate_components_{i}": k for i, k in enumerate(guided)})
        row["n_total_components"] = params["n_components"] + sum(guided)
        for key in ("orth_W", "alpha_W", "l1_ratio_W", "max_iter"):
            row[key] = params[key]
        row["score"] = loss
        row["tid"] = tid
        row.update({f"lam_{i}": v for i, v in enumerate(params["lam"])})
        return row

    def get_train_history(self) -> pd.DataFrame:
        """DataFrame of successful trials with expanded per-covariate
        columns, sorted by score DESCENDING (a reference quirk preserved for
        API compat; the optimizer itself minimizes — optimization.py:473-475
        vs :216)."""
        rows = [
            self._history_row(t["result"]["params"], t["result"]["loss"], t["tid"])
            for t in self.trials.trials
            if t.get("result", {}).get("status") == STATUS_OK
        ]
        if not rows:
            # the reference crashes with an opaque KeyError here; fail clearly
            raise RuntimeError(
                "No successful trials recorded yet — run search_hyperparams "
                "(all trials may have failed the component-distribution check)."
            )
        frame = pd.DataFrame(rows)
        return frame.sort_values("score", ascending=False).reset_index(drop=True)

    def fit_the_best_param(self):
        """Refit on the full data with the best found parameters
        (reference optimization.py:479-510).  NOTE: the reference passes
        random_state twice (inside **best_param AND explicitly,
        optimization.py:496-501), which raises TypeError; fixed here by
        relying on best_param["random_state"] alone.

        In a multi-process search every process holds the identical full
        dataset, so this refit runs REPLICATED on each process's local
        devices — identical fitted models everywhere.  For a sharded
        final fit instead, pass ``best_param`` to
        ``ALPINE(device=distributed.global_cell_mesh(), **opt.best_param)``
        and fit each process's local cell shard."""
        if not self.best_param:  # __init__ sets {}; a hasattr guard (as in
            # the reference) could never fire
            raise RuntimeError(
                "Please run bayesian_search() to find the best parameters first."
            )

        # the search is over: release the device-resident fold tensors
        # (~n_splits copies of the dataset in HBM) before the full-data fit
        # uploads X again
        self.free_device_cache()
        model = ALPINE(
            **self.best_param,
            use_als=self.use_als,
            loss_type=self.loss_type,
            device=self._exec_device,
            data_dtype=self.data_dtype_,
        )
        model.fit(
            adata=self.adata,
            covariate_keys=self.covariate_keys,
            max_iter=self.max_iter,
            batch_size=self.batch_size,
            verbose=False,
        )
        return model

    def free_device_cache(self) -> None:
        """Release the device-resident stacked CV fold tensors kept across
        trials (≈ n_splits copies of the dataset in accelerator memory).
        They rebuild on demand if another search runs."""
        self._fold_cache = None

    # -------------------------------------------------------- validation
    @staticmethod
    def _validate_init_args(
        adata, covariate_keys, loss_type, max_iter, batch_size, device, random_state
    ) -> None:
        """(reference optimization.py:512-550, identical messages)"""
        if not is_anndata(adata):
            raise TypeError("adata must be an instance of AnnData")

        if not isinstance(covariate_keys, list):
            raise TypeError("covariate_keys must be a list")
        if not all(isinstance(key, str) for key in covariate_keys):
            raise TypeError("All covariate_keys must be strings")
        if not all(key in adata.obs.columns for key in covariate_keys):
            raise ValueError("All covariate_keys must be present in adata.obs")

        if loss_type not in ("kl-divergence", "frobenius"):
            raise ValueError("loss_type must be either 'kl-divergence' or 'frobenius'")

        for name, value in (("max_iter", max_iter), ("batch_size", batch_size)):
            if value is not None and (not isinstance(value, int) or value < 0):
                raise ValueError(f"{name} must be a non-negative integer")

        if not isinstance(random_state, int):
            raise TypeError("random_state must be an integer")

    @staticmethod
    def _check_cv_args(n_splits, max_evals) -> None:
        """(reference optimization.py:598-604, identical messages)"""
        if not isinstance(n_splits, int):
            raise TypeError("n_splits must be an integer")
        if n_splits < 2:
            raise ValueError("n_splits must be greater than or equal to 2")
        if not isinstance(max_evals, int) or max_evals <= 0:
            raise ValueError("max_evals must be a positive integer")

    def _validate_search_args(
        self,
        n_total_components_range,
        lam_range,
        orth_W_range,
        alpha_W_range,
        l1_ratio_W_range,
        n_splits,
        max_evals,
    ) -> None:
        """Back-compat shim: range checks live on SearchSpace.validate()."""
        SearchSpace(
            n_total_components_range, lam_range, orth_W_range, alpha_W_range,
            l1_ratio_W_range, n_covariates=len(self.covariate_keys),
        ).validate()
        self._check_cv_args(n_splits, max_evals)
