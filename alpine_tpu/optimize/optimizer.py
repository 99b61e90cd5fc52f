"""ComponentOptimizer — TPE Bayesian hyperparameter search with CV scoring.

API parity target: class `ComponentOptimizer` in
`/root/reference/alpine/optimization.py:15-604`: search over
n_total_components (quniform), per-covariate lam (qloguniform), orth_W /
alpha_W / l1_ratio_W (uniform) and per-block split ratios; each trial is
scored by StratifiedKFold cross-validation, clustering the validation fold's
unguided embedding and summing ARI + homogeneity against every covariate
(low = covariate-free embedding = good; the score is *minimized*,
optimization.py:216).

Divergences from the reference (all forced by the environment, documented):
- hyperopt -> `alpine_tpu.optimize.tpe` (self-contained TPE, same API shape);
  pickled Trials from this module are NOT interchangeable with hyperopt's.
- scanpy neighbors+leiden -> `alpine_tpu.optimize.scoring` (sklearn kNN
  graph + native C++ Leiden, `alpine_tpu/native/leiden.cpp`).
- `device` defaults to "auto" (JAX default backend) rather than "cuda".

Like the reference, TPE is sequential by nature (each suggestion conditions
on all previous trials); the inner CV fits run on the accelerator and only
embeddings return to host for scoring.
"""

from __future__ import annotations

import pickle
from copy import copy
from typing import List, Optional, Tuple

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


class ComponentOptimizer:
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
    ):
        self._validate_init_args(
            adata, covariate_keys, loss_type, max_iter, batch_size, device, random_state
        )
        if not isinstance(fold_batching, bool):
            raise TypeError("fold_batching must be a boolean")

        self.adata = adata.copy()
        self.covariate_keys: List[str] = covariate_keys
        self.use_als: bool = use_als
        self.loss_type: str = loss_type
        self.max_iter: Optional[int] = max_iter
        self.batch_size: Optional[int] = batch_size
        if sampling_method not in self._VALID_SAMPLING:
            raise ValueError(
                f"Unknown sampling method: {sampling_method}. Only 'weighted', "
                "and 'random' are supported."
            )
        self.sampling_method: str = sampling_method
        self.device = device
        self.random_state: int = random_state
        # vmap-batch the CV folds of each trial into one XLA program
        # (new capability vs the reference's sequential fold loop,
        # optimization.py:241-283; see optimize/batched.py).  Requires a
        # frozen max_iter, so the first trial under max_iter auto-detection
        # still runs sequentially.
        self.fold_batching: bool = fold_batching
        self.best_param: dict = {}

        if self.max_iter is None:
            print(
                "Owing to max_iter being None, it will be determine by the "
                "average of the first n_splits iterations."
            )
            self.max_iter_detect = True
        else:
            self.max_iter_detect = False

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
        self._validate_search_args(
            n_total_components_range,
            lam_range,
            orth_W_range,
            alpha_W_range,
            l1_ratio_W_range,
            n_splits,
            max_evals,
        )

        self.iter_records: List = []
        self.n_splits: int = n_splits

        if trials_filename is not None:
            self.load_trials(trials_filename)
        else:
            self.trials = Trials()

        if min_covariate_components is None:
            self.min_covariate_components = [
                self.adata.obs[key].nunique() for key in self.covariate_keys
            ]
        else:
            if isinstance(min_covariate_components, list):
                if len(min_covariate_components) != len(self.covariate_keys):
                    raise ValueError(
                        "min_covariate_components should have the same length as the number of covariates."
                    )
            if any(comp < 2 for comp in min_covariate_components):
                raise ValueError(
                    "min_covariate_components should be greater than or equal to 2."
                )
            self.min_covariate_components = min_covariate_components

        # search space (reference optimization.py:95-120)
        self.space = {
            "n_total_components": hp.quniform(
                "n_total_components",
                n_total_components_range[0],
                n_total_components_range[1],
                1,
            ),
            "orth_W": hp.uniform("orth_W", orth_W_range[0], orth_W_range[1]),
            "alpha_W": hp.uniform("alpha_W", alpha_W_range[0], alpha_W_range[1]),
            "l1_ratio_W": hp.uniform(
                "l1_ratio_W", l1_ratio_W_range[0], l1_ratio_W_range[1]
            ),
            "splits": [
                hp.uniform(f"split_{i}", 0, 1)
                for i in range(len(self.covariate_keys) + 1)
            ],
        }
        for i in range(len(self.covariate_keys)):
            self.space[f"lam_{i}"] = hp.qloguniform(
                f"lam_{i}", np.log(lam_range[0]), np.log(lam_range[1]), 1
            )

        best = fmin(
            self.objective,
            self.space,
            algo=tpe.suggest,
            max_evals=max_evals + len(self.trials.trials),
            trials=self.trials,
            rstate=np.random.default_rng(self.random_state),
        )

        if best is None:
            raise RuntimeError("Hyperparameter optimization did not return any result.")

        component_params = {
            "n_total_components": best["n_total_components"],
            "splits": [best[f"split_{i}"] for i in range(len(self.covariate_keys) + 1)],
        }
        n_components, n_covariate_components = self._distribute_components(
            component_params
        )

        self.best_param["n_components"] = n_components
        self.best_param["n_covariate_components"] = n_covariate_components
        self.best_param["lam"] = [
            float(best[f"lam_{i}"]) for i in range(len(self.covariate_keys))
        ]
        self.best_param["alpha_W"] = best["alpha_W"]
        self.best_param["orth_W"] = best["orth_W"]
        self.best_param["l1_ratio_W"] = best["l1_ratio_W"]
        self.best_param["random_state"] = self.random_state

        return self.best_param

    def _distribute_components(self, space):
        """Split n_total into unguided + per-covariate blocks by normalized
        ratios, floored at min_covariate_components
        (reference optimization.py:153-176)."""
        total_components = int(space["n_total_components"])
        splits = [float(s) for s in space["splits"]]
        normalized_splits = np.array(splits) / np.sum(splits)

        n_components = int(total_components / 2)
        rest_components = total_components - n_components

        n_covariate_components = [
            int(round(rest_components * ratio)) for ratio in normalized_splits[:-1]
        ]
        n_covariate_components = [
            max(self.min_covariate_components[i], n)
            for i, n in enumerate(n_covariate_components)
        ]
        total_covariate_components = sum(n_covariate_components)
        n_components = total_components - total_covariate_components

        return n_components, n_covariate_components

    def objective(self, space):
        """One trial (reference optimization.py:178-218).  Invalid component
        distributions fail with loss=inf."""
        lam = [space[f"lam_{i}"] for i in range(len(self.covariate_keys))]
        n_components, n_covariate_components = self._distribute_components(space)

        cond_1 = sum(n_covariate_components) <= n_components
        cond_2 = all(n >= 2 for n in n_covariate_components)

        if not (cond_1 and cond_2):
            return {"loss": np.inf, "status": STATUS_FAIL}

        args = {
            "n_components": n_components,
            "n_covariate_components": n_covariate_components,
            "lam": lam,
            "orth_W": space["orth_W"],
            "alpha_W": space["alpha_W"],
            "l1_ratio_W": space["l1_ratio_W"],
        }
        score = self.calc_score(args)

        trial_history = {
            "n_components": n_components,
            "n_covariate_components": n_covariate_components,
            "lam": list(lam),
            "orth_W": space["orth_W"],
            "alpha_W": space["alpha_W"],
            "l1_ratio_W": space["l1_ratio_W"],
            "max_iter": self.iter_records[-1] if self.max_iter_detect else self.max_iter,
            "score": score,
        }

        if self.max_iter_detect:
            if len(self.iter_records) >= self.n_splits:
                self.max_iter = int(sum(self.iter_records) / len(self.iter_records))

        return {"loss": score, "status": STATUS_OK, "params": trial_history}

    def calc_score(self, args):
        """Stratified-CV covariate-leakage score (reference
        optimization.py:220-287): fit on train folds, transform validation,
        cluster the unguided embedding, mean over covariates of
        ARI + homogeneity vs the clusters, averaged over folds."""
        n_covariate_components = args["n_covariate_components"]
        n_components = args["n_components"]
        lam = args["lam"]

        if len(self.covariate_keys) == 1:
            joint_labels = self.adata.obs[self.covariate_keys[0]].astype(str)
        else:
            joint_labels = self.adata.obs[self.covariate_keys[0]].astype(str)
            for key in self.covariate_keys[1:]:
                joint_labels = joint_labels + "_" + self.adata.obs[key].astype(str)

        skf = StratifiedKFold(
            n_splits=self.n_splits, shuffle=True, random_state=self.random_state
        )
        folds = list(skf.split(self.adata.X, joint_labels))

        if self.fold_batching and self.max_iter is not None:
            return self._calc_score_batched(args, folds)

        scores = []
        for train_idx, val_idx in folds:
            train_adata = self.adata[train_idx].copy()
            val_adata = self.adata[val_idx].copy()

            model = ALPINE(
                n_covariate_components=n_covariate_components,
                n_components=n_components,
                lam=[float(l) for l in lam],
                orth_W=float(args["orth_W"]),
                alpha_W=float(args["alpha_W"]),
                l1_ratio_W=float(args["l1_ratio_W"]),
                use_als=self.use_als,
                random_state=self.random_state,
                loss_type=self.loss_type,
                device=self.device,
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

            clusters = scoring.leiden(
                np.asarray(val_adata.obsm["ALPINE_embedding"]),
                n_neighbors=15,
                resolution=1.0,
                seed=self.random_state,
            )
            val_adata.obs["leiden"] = pd.Categorical(clusters.astype(str))

            embedding_score = 0.0
            for key in self.covariate_keys:
                embedding_score += scoring.embedding_score(
                    clusters, val_adata.obs[key].to_numpy()
                )
            embedding_score /= len(self.covariate_keys)
            scores.append(embedding_score)

            if self.max_iter_detect:
                self.iter_records.append(model.max_iter)

        return float(np.mean(scores))

    def _calc_score_batched(self, args, folds) -> float:
        """All CV folds of this trial as one vmapped program
        (optimize/batched.py); scoring stays host-side per fold."""
        from alpine_tpu.optimize.batched import batched_fold_embeddings
        from alpine_tpu.utils.encoder import FeatureEncoders

        fe = FeatureEncoders(self.covariate_keys)
        Ys = fe.fit_transform(self.adata.obs)  # (cells x labels) each

        from jax.sharding import Mesh

        from alpine_tpu.parallel.mesh import resolve_device

        resolved = resolve_device(self.device)
        mesh = resolved if isinstance(resolved, Mesh) else None

        blocks = tuple(args["n_covariate_components"]) + (args["n_components"],)
        embeddings = batched_fold_embeddings(
            np.asarray(self.adata.X, dtype=np.float32),
            Ys,
            folds,
            blocks=blocks,
            lam=[float(l) for l in args["lam"]],
            orth_w=float(args["orth_W"]),
            alpha_w=float(args["alpha_W"]),
            l1_ratio=float(args["l1_ratio_W"]),
            eps=1e-6,
            loss_kl=(self.loss_type == "kl-divergence"),
            use_als=self.use_als,
            batch_size=self.batch_size,
            weighted=(self.sampling_method == "weighted"),
            max_iter=self.max_iter,
            scale=True,
            seed=self.random_state,
            mesh=mesh,
        )

        scores = []
        for (_, val_idx), emb in zip(folds, embeddings):
            clusters = scoring.leiden(
                emb, n_neighbors=15, resolution=1.0, seed=self.random_state
            )
            s = 0.0
            for key in self.covariate_keys:
                s += scoring.embedding_score(
                    clusters, self.adata.obs[key].to_numpy()[val_idx]
                )
            scores.append(s / len(self.covariate_keys))
        return float(np.mean(scores))

    # ------------------------------------------------------- continuation
    def extend_training(self, extra_evals=50):
        """Continue the Bayesian optimization with more evaluations
        (reference optimization.py:289-333)."""
        if not hasattr(self, "trials"):
            raise RuntimeError("Please run bayesian_search() before extending training.")

        best = fmin(
            fn=self.objective,
            space=self.space,
            algo=tpe.suggest,
            max_evals=len(self.trials.trials) + extra_evals,
            trials=self.trials,
            rstate=np.random.default_rng(self.random_state),
        )
        if best is None:
            raise RuntimeError("Hyperparameter optimization did not return any result.")

        component_params = {
            "n_total_components": best["n_total_components"],
            "splits": [best[f"split_{i}"] for i in range(len(self.covariate_keys) + 1)],
        }
        n_components, n_covariate_components = self._distribute_components(
            component_params
        )

        self.best_param["n_components"] = n_components
        self.best_param["n_covariate_components"] = n_covariate_components
        self.best_param["lam"] = [
            float(best[f"lam_{i}"]) for i in range(len(self.covariate_keys))
        ]
        self.best_param["orth_W"] = best["orth_W"]
        self.best_param["alpha_W"] = best["alpha_W"]
        self.best_param["l1_ratio_W"] = best["l1_ratio_W"]
        self.best_param["random_state"] = self.random_state

        return copy(self.best_param)

    def save_trials(self, filename: str):
        """Pickle the current trials (reference optimization.py:335-345)."""
        with open(filename, "wb") as f:
            pickle.dump(self.trials, f)
        print(f"Trials saved to {filename}")

    def load_trials(self, filename: str):
        """Load pickled trials (reference optimization.py:347-357)."""
        with open(filename, "rb") as f:
            self.trials = pickle.load(f)
        print(f"Trials loaded from {filename}")

    # -------------------------------------------------------- inspection
    def get_hyperparameter(self, idx):
        """Hyperparameters of the idx-th row of the (score-sorted) history
        (reference optimization.py:359-385)."""
        history_df = self.get_train_history()
        trial = history_df.iloc[idx]
        trial_tid = trial["tid"]
        for t in self.trials.trials:
            if t["tid"] == trial_tid:
                return t["result"]["params"]

    def get_train_history(self):
        """DataFrame of successful trials with expanded per-covariate
        columns, sorted by score DESCENDING (a reference quirk preserved for
        API compat; the optimizer itself minimizes — optimization.py:473-475
        vs :216)."""
        history = []
        for trial in self.trials.trials:
            if "result" in trial and trial["result"]["status"] == STATUS_OK:
                trial_info = dict(trial["result"]["params"])
                trial_info["score"] = trial["result"]["loss"]
                trial_info["tid"] = trial["tid"]
                history.append(trial_info)

        if not history:
            # the reference crashes with an opaque KeyError here; fail clearly
            raise RuntimeError(
                "No successful trials recorded yet — run search_hyperparams "
                "(all trials may have failed the component-distribution check)."
            )

        history_df = pd.DataFrame(history)

        n_covariate_df = pd.DataFrame(
            history_df["n_covariate_components"].tolist(),
            columns=[
                f"n_covariate_components_{i}"
                for i in range(len(history_df["n_covariate_components"].iloc[0]))
            ],
        )
        lam_df = pd.DataFrame(
            history_df["lam"].tolist(),
            columns=[f"lam_{i}" for i in range(len(history_df["lam"].iloc[0]))],
        )
        history_df = pd.concat(
            [history_df.drop(columns=["n_covariate_components", "lam"]),
             n_covariate_df, lam_df],
            axis=1,
        )

        history_df["n_total_components"] = history_df["n_components"] + history_df[
            [f"n_covariate_components_{i}" for i in range(len(n_covariate_df.columns))]
        ].sum(axis=1)

        columns_order = (
            ["n_components"]
            + [f"n_covariate_components_{i}" for i in range(len(n_covariate_df.columns))]
            + ["n_total_components"]
            + [
                col
                for col in history_df.columns
                if col
                not in ["n_components", "n_total_components"]
                + [
                    f"n_covariate_components_{i}"
                    for i in range(len(n_covariate_df.columns))
                ]
            ]
        )
        history_df = history_df[columns_order]
        history_df = history_df.sort_values(by="score", ascending=False).reset_index(
            drop=True
        )
        return history_df

    def fit_the_best_param(self):
        """Refit on the full data with the best found parameters
        (reference optimization.py:479-510).  NOTE: the reference passes
        random_state twice (inside **best_param AND explicitly,
        optimization.py:496-501), which raises TypeError; fixed here by
        relying on best_param["random_state"] alone."""
        if not hasattr(self, "best_param"):
            raise RuntimeError(
                "Please run bayesian_search() to find the best parameters first."
            )

        model = ALPINE(
            **self.best_param,
            use_als=self.use_als,
            loss_type=self.loss_type,
            device=self.device,
        )
        model.fit(
            adata=self.adata,
            covariate_keys=self.covariate_keys,
            max_iter=self.max_iter,
            batch_size=self.batch_size,
            verbose=False,
        )
        return model

    # -------------------------------------------------------- validation
    def _validate_init_args(
        self, adata, covariate_keys, loss_type, max_iter, batch_size, device,
        random_state,
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

        if loss_type not in ["kl-divergence", "frobenius"]:
            raise ValueError("loss_type must be either 'kl-divergence' or 'frobenius'")

        if max_iter is not None:
            if not isinstance(max_iter, int) or max_iter < 0:
                raise ValueError("max_iter must be a non-negative integer")

        if batch_size is not None:
            if not isinstance(batch_size, int) or batch_size < 0:
                raise ValueError("batch_size must be a non-negative integer")

        if not isinstance(random_state, int):
            raise TypeError("random_state must be an integer")

    # validated eagerly so a bad value fails at construction instead of
    # crashing the search after N completed trial fits
    _VALID_SAMPLING = ("random", "weighted")

    def _validate_search_args(
        self,
        n_total_components_range: Tuple[int, int],
        lam_range: Tuple[float, float],
        orth_W_range: Tuple[float, float],
        alpha_W_range: Tuple[float, float],
        l1_ratio_W_range: Tuple[float, float],
        n_splits: int,
        max_evals: int,
    ) -> None:
        """(reference optimization.py:552-604, identical messages)"""
        if (
            not isinstance(n_total_components_range, tuple)
            or len(n_total_components_range) != 2
        ):
            raise TypeError("n_total_components_range must be a tuple of two integers")
        else:
            if n_total_components_range[0] >= n_total_components_range[1]:
                raise ValueError(
                    "n_total_components_range must be a tuple with the first element less than the second"
                )
            if n_total_components_range[0] < 2:
                raise ValueError(
                    "n_total_components_range must be a tuple with the first element greater than or equal to 2"
                )

        def _validate_tuple_range(arg, name, dtype=float):
            if not isinstance(arg, tuple) or len(arg) != 2:
                raise TypeError(f"{name} must be a tuple of two {dtype.__name__}s")
            if not all(isinstance(x, dtype) for x in arg):
                raise TypeError(f"All elements of {name} must be {dtype.__name__}s")
            if arg[0] >= arg[1]:
                raise ValueError(
                    f"{name} must be a tuple with the first element less than the second"
                )

        _validate_tuple_range(lam_range, "lam_range", float)
        _validate_tuple_range(orth_W_range, "orth_W_range", float)
        _validate_tuple_range(alpha_W_range, "alpha_W_range", float)
        _validate_tuple_range(l1_ratio_W_range, "l1_ratio_W_range", float)
        if l1_ratio_W_range[1] > 1.0:
            raise ValueError(
                "l1_ratio_W_range's second element must be less than or equal to 1.0"
            )

        if not isinstance(n_splits, int):
            raise TypeError("n_splits must be an integer")
        if n_splits < 2:
            raise ValueError("n_splits must be greater than or equal to 2")

        if not isinstance(max_evals, int) or max_evals <= 0:
            raise ValueError("max_evals must be a positive integer")
