"""Minimal AnnData-compatible container.

The reference library consumes/produces ``anndata.AnnData`` objects
(``/root/reference/alpine/main.py:82-147``: reads ``adata.X`` / ``adata.obs``,
writes ``adata.obsm`` / ``adata.varm`` / ``adata.layers``).  ``anndata`` is not
available in this environment, so this module provides a small, dependency-free
container with the subset of the AnnData API that ALPINE touches:

- ``X`` (2-D ndarray or scipy sparse matrix — real single-cell AnnData
  usually carries CSR counts; the estimator densifies at ingestion since
  the TPU compute path is dense), ``obs`` / ``var`` (pandas DataFrames)
- ``obsm`` / ``varm`` / ``layers`` / ``uns`` mappings
- ``obs_names`` / ``var_names`` / ``shape`` / ``n_obs`` / ``n_vars``
- row subsetting ``adata[idx]`` and ``.copy()`` (used by the optimizer's CV
  folds, ``/root/reference/alpine/optimization.py:242-243``)

If the real ``anndata`` package is importable we accept its objects everywhere
(duck typing); ``is_anndata`` recognizes both.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any, Dict, Optional

import numpy as np
import pandas as pd

try:  # pragma: no cover - environment dependent
    import anndata as _real_anndata
except Exception:  # pragma: no cover
    _real_anndata = None


def is_sparse_x(X: Any) -> bool:
    """Duck-typed scipy sparse check (matrix or sparse-array API) — avoids a
    hard scipy dependency for users who never pass sparse data."""
    return hasattr(X, "toarray") and hasattr(X, "nnz") and hasattr(X, "shape")


def as_compressed(X: Any):
    """Canonicalize a sparse X to a compressed format with summed
    duplicates.  COO/DIA/BSR etc. are not subscriptable (row subsetting
    would crash) and may carry duplicate entries whose .data values
    misrepresent the dense matrix (e.g. +5/-3 at one position = dense 2);
    .tocsr() fixes both.  A hand-built CSR/CSC can carry duplicates too —
    sum them on a COPY (never mutate the caller's matrix) so .data-based
    logic (x_min, fingerprints) sees true per-position values."""
    if not is_sparse_x(X):
        return X
    if not hasattr(X, "indptr"):
        return X.tocsr()
    if not getattr(X, "has_canonical_format", True):
        X = X.copy()
        X.sum_duplicates()
    return X


def dense_x(X: Any) -> np.ndarray:
    """Dense float32 COPY of an ``adata.X`` (ndarray or scipy sparse).  The
    reference requires a dense ndarray (`main.py:395-400`); accepting sparse
    input here is a deliberate capability beyond it — real AnnData objects
    usually hold CSR counts, and the TPU compute path is dense regardless."""
    if is_sparse_x(X):
        return np.asarray(X.toarray(), dtype=np.float32)
    return np.asarray(X).astype(np.float32)


def suggest_data_dtype(X: Any) -> str:
    """Recommend the narrowest EXACT `ALPINE(data_dtype=...)` for a dataset.

    Raw single-cell counts are small integers: "int8" (counts ≤ 127) halves
    even bfloat16's HBM/transfer traffic with no rounding at all, and
    "int16" (≤ 32767) gives full float32 math at bfloat16's bandwidth.
    Fractional (normalized/log-transformed) data returns "float32" — use
    "bfloat16" manually if its ~3-digit rounding is acceptable.  Accepts a
    dense array, a scipy sparse matrix, or an AnnData-like object."""
    if hasattr(X, "X") and hasattr(X, "obs"):  # AnnData-like
        X = X.X
    if is_sparse_x(X):
        data = np.asarray(as_compressed(X).data)
    else:
        data = np.asarray(X)
    if data.size == 0:
        return "float32"
    if np.mod(data, 1.0).any() or not (float(data.min(initial=0.0)) >= 0):
        return "float32"
    top = float(data.max(initial=0.0))
    if top <= np.iinfo(np.int8).max:
        return "int8"
    if top <= np.iinfo(np.int16).max:
        return "int16"
    return "float32"


def dtype_can_store(data_dtype: str, X: Any) -> bool:
    """Whether an X is EXACTLY representable under a storage dtype name —
    THE single predicate behind every narrow-cast validation (the model
    layer's strict cast, the optimizer's up-front check, the multi-process
    collective check).  Float dtypes always store (bfloat16 rounds by
    documented design); integer dtypes require what suggest_data_dtype
    certifies: non-negative integers within range."""
    if data_dtype not in ("int8", "int16"):
        return True
    suggested = suggest_data_dtype(X)
    if suggested == "float32":  # fractional, negative, or NaN somewhere
        return False
    return np.iinfo(suggested).max <= np.iinfo(data_dtype).max


def x_min(X: Any) -> float:
    """Minimum value of an adata.X without densifying (sparse implicit zeros
    count as 0).  NaN anywhere propagates to a NaN return — validate with
    `not (x_min(X) >= 0)` so NaN fails like any negative would."""
    if is_sparse_x(X):
        Xc = as_compressed(X)  # sums duplicate entries (on a copy)
        data = np.asarray(Xc.data)
        explicit_min = float(data.min()) if data.size else 0.0
        has_implicit_zero = Xc.nnz < Xc.shape[0] * Xc.shape[1]
        return min(explicit_min, 0.0) if has_implicit_zero else explicit_min
    arr = np.asarray(X)
    return float(arr.min()) if arr.size else 0.0


class _AxisMapping(dict):
    """dict that validates the leading-axis length of inserted arrays."""

    def __init__(self, length: int, axis_name: str):
        super().__init__()
        self._length = length
        self._axis_name = axis_name

    def __setitem__(self, key: str, value: Any) -> None:
        # during unpickling, dict items are re-inserted BEFORE the instance
        # attributes restore; skip validation until _length exists
        length = self.__dict__.get("_length")
        if (length is not None and hasattr(value, "shape")
                and len(value.shape) >= 1 and value.shape[0] != length):
            raise ValueError(
                f"value for {self._axis_name}[{key!r}] has leading dimension "
                f"{value.shape[0]}, expected {length}"
            )
        super().__setitem__(key, value)


class AnnData:
    """A lightweight stand-in for ``anndata.AnnData`` (rows = cells/obs,
    columns = genes/vars), sufficient for the ALPINE API surface."""

    def __init__(
        self,
        X: np.ndarray,
        obs: Optional[pd.DataFrame] = None,
        var: Optional[pd.DataFrame] = None,
        obsm: Optional[Dict[str, Any]] = None,
        varm: Optional[Dict[str, Any]] = None,
        layers: Optional[Dict[str, Any]] = None,
        uns: Optional[Dict[str, Any]] = None,
    ):
        X = as_compressed(X) if is_sparse_x(X) else np.asarray(X)
        if len(X.shape) != 2:
            raise ValueError("X must be a 2-D array (obs x var).")
        self.X = X
        n_obs, n_vars = X.shape
        self.obs = (
            obs.copy()
            if obs is not None
            else pd.DataFrame(index=pd.RangeIndex(n_obs).astype(str))
        )
        if len(self.obs) != n_obs:
            raise ValueError("obs length does not match X rows")
        self.var = (
            var.copy()
            if var is not None
            else pd.DataFrame(index=pd.RangeIndex(n_vars).astype(str))
        )
        if len(self.var) != n_vars:
            raise ValueError("var length does not match X columns")
        self.obsm = _AxisMapping(n_obs, "obsm")
        if obsm:
            for k, v in obsm.items():
                self.obsm[k] = v
        self.varm = _AxisMapping(n_vars, "varm")
        if varm:
            for k, v in varm.items():
                self.varm[k] = v
        self.layers = _AxisMapping(n_obs, "layers")
        if layers:
            for k, v in layers.items():
                self.layers[k] = v
        self.uns: Dict[str, Any] = dict(uns) if uns else {}

    # -- AnnData-compatible properties -------------------------------------
    @property
    def shape(self):
        return self.X.shape

    @property
    def n_obs(self) -> int:
        return self.X.shape[0]

    @property
    def n_vars(self) -> int:
        return self.X.shape[1]

    @property
    def obs_names(self) -> pd.Index:
        return self.obs.index

    @property
    def var_names(self) -> pd.Index:
        return self.var.index

    # -- subsetting / copying ----------------------------------------------
    def __getitem__(self, idx) -> "AnnData":
        """Row (obs) subsetting, as used by CV folds. Returns a new object
        holding sliced copies (the reference immediately calls ``.copy()``)."""
        if isinstance(idx, tuple):
            raise NotImplementedError("only obs-axis subsetting is supported")
        if np.isscalar(idx) and not isinstance(idx, (slice, bool)):
            # real anndata returns a 1-obs view for adata[i]; a bare
            # integer index on a dense X would drop to 1-D and fail the
            # 2-D constructor check
            idx = np.asarray([idx])
        Xs = self.X[idx] if is_sparse_x(self.X) else np.asarray(self.X[idx])
        out = AnnData(
            Xs,
            obs=self.obs.iloc[idx] if not isinstance(idx, slice) else self.obs[idx],
            var=self.var,
        )
        for k, v in self.obsm.items():
            out.obsm[k] = np.asarray(v)[idx]
        for k, v in self.layers.items():
            out.layers[k] = np.asarray(v)[idx]
        for k, v in self.varm.items():
            out.varm[k] = v
        out.uns = deepcopy(self.uns)
        return out

    def copy(self) -> "AnnData":
        out = AnnData(self.X.copy(), obs=self.obs.copy(), var=self.var.copy())
        for name in ("obsm", "varm", "layers"):
            src, dst = getattr(self, name), getattr(out, name)
            for k, v in src.items():
                dst[k] = v.copy() if hasattr(v, "copy") else deepcopy(v)
        out.uns = deepcopy(self.uns)
        return out

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"AnnData(n_obs={self.n_obs}, n_vars={self.n_vars}, "
            f"obs={list(self.obs.columns)}, obsm={list(self.obsm)}, "
            f"varm={list(self.varm)}, layers={list(self.layers)})"
        )


def is_anndata(obj: Any) -> bool:
    """True for our AnnData or (if installed) a real ``anndata.AnnData``."""
    if isinstance(obj, AnnData):
        return True
    if _real_anndata is not None and isinstance(obj, _real_anndata.AnnData):
        return True
    return False
