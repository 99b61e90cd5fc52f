"""Model persistence and mid-fit checkpointing.

The reference has NO model-level persistence (users pickle the estimator,
cf. `/root/reference/README.md:212-215`; only hyperopt Trials are pickled,
`optimization.py:335-357`).  SURVEY.md §5 calls for a TPU-native upgrade:

- `save_model` / `load_model`: portable NPZ + pickle bundle of a fitted
  ALPINE estimator (factor matrices, hyperparameters, loss history, fitted
  one-hot encoders).  `ALPINE.save()` / `ALPINE.load()` wrap these.
- `FitCheckpointer`: periodic snapshots of the in-progress training state
  (W, H, Bs, iteration, loss history) so long atlas-scale fits survive
  preemption; `fit(..., checkpoint_dir=..., checkpoint_every=N)` runs the
  scan in chunks and resumes from the latest matching snapshot.

Snapshots are keyed by a config hash (shapes + hyperparameters + seed) so a
stale snapshot from a different run is never resumed.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import warnings
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np

FORMAT_VERSION = 1


# ------------------------------------------------------------- fitted model


def save_model(model, path: str) -> None:
    """Serialize a fitted ALPINE estimator to `<path>` (a single .npz plus a
    sidecar .pkl for the sklearn encoders)."""
    if not hasattr(model, "matrices"):
        raise RuntimeError("Model is not trained yet. Please fit the model first.")

    arrays: Dict[str, np.ndarray] = {}
    m = model.matrices
    arrays["X"] = m["X"]
    for name in ("Ys", "Ws", "Hs", "Bs"):
        for i, a in enumerate(m[name]):
            arrays[f"{name}_{i}"] = a
    meta = {
        "format_version": FORMAT_VERSION,
        "n_components": model.n_components,
        "n_covariate_components": model.n_covariate_components,
        "lam": model.lam,
        "orth_W": model.orth_W,
        "alpha_W": model.alpha_W,
        "l1_ratio_W": model.l1_ratio_W,
        "use_als": model.use_als,
        "scale_needed": model.scale_needed,
        "loss_type": model.loss_type,
        "eps": model.eps,
        "random_state": model.random_state,
        "matmul_precision": model.matmul_precision,
        "data_dtype": model.data_dtype,
        # the RESOLVED storage dtype (data_dtype="auto" picks per dataset);
        # transform-after-load must cast query data the same way the fit did
        "data_dtype_": getattr(model, "data_dtype_", None),
        "max_iter": model.max_iter,
        "covariate_keys": model.covariate_keys,
        "feature_names": model.feature_names,
        "n_features": model.n_features,
        "counts": {name: len(m[name]) for name in ("Ys", "Ws", "Hs", "Bs")},
    }
    arrays["_meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    ).copy()
    arrays["_loss_history"] = model.loss_history.to_numpy()
    arrays["_loss_columns"] = np.array(
        [c.encode("utf-8") for c in model.loss_history.columns]
    )
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz", **arrays)

    with open(_encoder_path(path), "wb") as f:
        pickle.dump(model.fe, f)


def _encoder_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".encoders.pkl"


def load_model(path: str, device="auto"):
    """Reconstruct a fitted ALPINE estimator saved by `save_model`."""
    import pandas as pd

    from alpine_tpu.models.alpine import ALPINE

    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path, allow_pickle=False) as data:
        return _restore_model(ALPINE, pd, data, path, device)


def _restore_model(ALPINE, pd, data, path, device):
    meta = json.loads(bytes(data["_meta"]).decode("utf-8"))
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version: {meta.get('format_version')}")

    model = ALPINE(
        n_components=meta["n_components"],
        n_covariate_components=meta["n_covariate_components"],
        lam=meta["lam"],
        orth_W=meta["orth_W"],
        alpha_W=meta["alpha_W"],
        l1_ratio_W=meta["l1_ratio_W"],
        use_als=meta["use_als"],
        scale_needed=meta["scale_needed"],
        loss_type=meta["loss_type"],
        eps=meta["eps"],
        random_state=meta["random_state"],
        device=device,
        matmul_precision=meta.get("matmul_precision", "highest"),
        data_dtype=meta.get("data_dtype", "float32"),
    )
    model.max_iter = meta["max_iter"]
    resolved = meta.get("data_dtype_")
    if resolved is None:
        # pre-"auto" save files always carried a concrete data_dtype
        resolved = meta.get("data_dtype", "float32")
        resolved = "float32" if resolved == "auto" else resolved
    model.data_dtype_ = resolved
    model.covariate_keys = meta["covariate_keys"]
    model.feature_names = meta["feature_names"]
    model.n_features = meta["n_features"]
    model.matrices = {
        "X": data["X"],
        **{
            name: [data[f"{name}_{i}"] for i in range(meta["counts"][name])]
            for name in ("Ys", "Ws", "Hs", "Bs")
        },
    }
    model.loss_history = pd.DataFrame(
        data["_loss_history"],
        columns=[c.decode("utf-8") for c in data["_loss_columns"]],
    )
    with open(_encoder_path(path), "rb") as f:
        model.fe = pickle.load(f)
    return model


# --------------------------------------------------------- mid-fit snapshots


class FitCheckpointer:
    """Periodic snapshots of the training carry for preemption-safe fits.

    backend="npz" (default) writes a single atomic .npz; backend="orbax"
    uses orbax-checkpoint's PyTreeCheckpointer (async-capable, handles
    sharded arrays natively — preferable on multi-host TPU pods)."""

    def __init__(self, directory: str, config_key: Dict[str, Any],
                 backend: str = "npz"):
        if backend not in ("npz", "orbax"):
            raise ValueError("checkpoint backend must be 'npz' or 'orbax'")
        # orbax requires absolute paths; absolutize for both backends
        self.directory = os.path.abspath(directory)
        self.backend = backend
        os.makedirs(self.directory, exist_ok=True)
        blob = json.dumps(config_key, sort_keys=True, default=str).encode("utf-8")
        self.tag = hashlib.sha256(blob).hexdigest()[:16]

    @property
    def path(self) -> str:
        suffix = "" if self.backend == "orbax" else ".npz"
        return os.path.join(self.directory, f"fit_snapshot_{self.tag}{suffix}")

    def _pytree(self, iteration, W, H, Bs, losses):
        return {
            "iteration": np.asarray(iteration),
            "W": np.asarray(W),
            "H": np.asarray(H),
            "losses": np.asarray(losses),
            "Bs": [np.asarray(b) for b in Bs],
        }

    def save(self, iteration: int, W, H, Bs, losses: np.ndarray) -> None:
        if self.backend == "orbax":
            import shutil

            import orbax.checkpoint as ocp

            # write to a sibling temp dir, then atomically swap in, so the
            # previous snapshot survives a preemption mid-write
            tmp = self.path + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(tmp, self._pytree(iteration, W, H, Bs, losses))
            old = self.path + ".old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(self.path):
                os.rename(self.path, old)
            os.rename(tmp, self.path)
            shutil.rmtree(old, ignore_errors=True)
            return
        arrays = {
            "iteration": np.asarray(iteration),
            "W": np.asarray(W),
            "H": np.asarray(H),
            "losses": np.asarray(losses),
        }
        for i, b in enumerate(Bs):
            arrays[f"B_{i}"] = np.asarray(b)
        arrays["n_bs"] = np.asarray(len(Bs))
        tmp = self.path + ".tmp.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, self.path)  # atomic: never a torn snapshot

    def load(self) -> Optional[Tuple[int, np.ndarray, np.ndarray, tuple, np.ndarray]]:
        """Restore a snapshot, or None when there is none / it is unreadable.

        Only expected corruption modes (truncated/invalid file, missing
        fields) degrade to a from-scratch fit — with a warning naming the
        snapshot so an atlas-scale restart is never silent.  Unexpected
        errors propagate."""
        path = self.path
        if not os.path.exists(path):
            # a preemption between save()'s two renames leaves only the
            # previous snapshot at '.old' — still a fully valid checkpoint
            if self.backend == "orbax" and os.path.exists(path + ".old"):
                path = path + ".old"
            else:
                return None
        try:
            if self.backend == "orbax":
                import orbax.checkpoint as ocp

                with ocp.PyTreeCheckpointer() as ckptr:
                    t = ckptr.restore(path)
                return (int(t["iteration"]), t["W"], t["H"],
                        tuple(t["Bs"]), t["losses"])
            with np.load(path, allow_pickle=False) as data:
                n_bs = int(data["n_bs"])
                return (
                    int(data["iteration"]),
                    data["W"],
                    data["H"],
                    tuple(data[f"B_{i}"] for i in range(n_bs)),
                    data["losses"],
                )
        except (OSError, ValueError, KeyError, zipfile.BadZipFile) as e:
            warnings.warn(
                f"Fit checkpoint at {path!r} is unreadable "
                f"({type(e).__name__}: {e}); restarting the fit from scratch."
            )
            return None

    def clear(self) -> None:
        if self.backend == "orbax":
            import shutil

            # also sweep temp artifacts a preemption mid-save leaves behind
            shutil.rmtree(self.path, ignore_errors=True)
            shutil.rmtree(self.path + ".old", ignore_errors=True)
            shutil.rmtree(self.path + ".tmp", ignore_errors=True)
        else:
            for leftover in (self.path, self.path + ".tmp.npz"):
                if os.path.exists(leftover):
                    os.remove(leftover)
