"""Exercise the `_real_anndata` branch of utils.adata (round-2 verdict
item 8): the environment lacks the real `anndata` package, so its branch
of `is_anndata` and the model's obsm/varm writes against real-AnnData
semantics (X as a property, obs with categorical dtype, view-returning
subsetting) never ran in CI.  This double is a minimal module shaped like
`anndata` (per its public docs: views from subsetting, `.copy()`
materialization, categorical obs, plain-dict obsm/varm/layers) that gets
installed as `alpine_tpu.utils.adata._real_anndata` for the duration of a
test, making `is_anndata`'s isinstance branch and the full fit/transform/
export path run against it."""

import sys
import types

import numpy as np
import pandas as pd
import pytest

import alpine_tpu.utils.adata as adata_mod


class _FakeAnnData:
    """anndata.AnnData-shaped double: X is a PROPERTY (anndata backs it
    with storage and views), obs/var are DataFrames (obs columns often
    pd.Categorical), obsm/varm/layers are mapping attributes, and
    integer-array subsetting returns a lazy VIEW whose .copy()
    materializes (writing to a view raises, surfacing any library code
    path that forgets to copy first)."""

    def __init__(self, X, obs, var=None):
        self._X = np.asarray(X)
        self.obs = obs
        n_obs, n_vars = self._X.shape
        self.var = (var if var is not None
                    else pd.DataFrame(index=[f"g{i}" for i in range(n_vars)]))
        self.obsm, self.varm, self.layers, self.uns = {}, {}, {}, {}
        self._is_view = False

    @property
    def X(self):
        return self._X

    @property
    def shape(self):
        return self._X.shape

    @property
    def n_obs(self):
        return self._X.shape[0]

    @property
    def n_vars(self):
        return self._X.shape[1]

    @property
    def obs_names(self):
        return self.obs.index

    @property
    def var_names(self):
        return self.var.index

    def __getitem__(self, idx):
        view = _FakeAnnData(self._X[idx], self.obs.iloc[idx], self.var)
        for k, v in self.obsm.items():
            view.obsm[k] = np.asarray(v)[idx]
        view._is_view = True

        class _Guard(dict):
            def __setitem__(self, key, value):
                raise RuntimeError(
                    "writing to an AnnData view; .copy() it first"
                )

        g = _Guard()
        g.update(view.obsm)
        view.obsm = g
        return view

    def copy(self):
        out = _FakeAnnData(self._X.copy(), self.obs.copy(), self.var.copy())
        out.obsm.update({k: np.asarray(v).copy() for k, v in self.obsm.items()})
        out.varm.update({k: v for k, v in self.varm.items()})
        out.layers.update({k: v for k, v in self.layers.items()})
        return out


@pytest.fixture
def real_anndata_module(monkeypatch):
    mod = types.ModuleType("anndata")
    mod.AnnData = _FakeAnnData
    monkeypatch.setattr(adata_mod, "_real_anndata", mod)
    monkeypatch.setitem(sys.modules, "anndata", mod)
    return mod


def _double(n=150, g=30, seed=0):
    r = np.random.default_rng(seed)
    X = r.poisson(2.0, (n, g)).clip(0, 100).astype(np.float32)
    labels = pd.Categorical(
        [f"b{j}" for j in r.integers(0, 2, n)], categories=["b0", "b1"]
    )
    cond = np.array([f"c{j}" for j in r.integers(0, 3, n)], dtype=object)
    cond[r.random(n) < 0.1] = None  # partially-labeled covariate
    obs = pd.DataFrame({"batch": labels, "condition": cond},
                       index=[f"cell{i}" for i in range(n)])
    return _FakeAnnData(X, obs)


def test_is_anndata_real_branch(real_anndata_module):
    from alpine_tpu.utils.adata import is_anndata

    assert is_anndata(_double())
    assert not is_anndata(object())
    # our own container still recognized alongside the real package
    assert is_anndata(adata_mod.AnnData(np.zeros((3, 4), np.float32)))


@pytest.mark.slow
def test_fit_transform_export_through_real_anndata(real_anndata_module):
    """Full model path against real-AnnData semantics: X property,
    categorical obs (dtype kind 'O'), NaN covariate values, obsm/varm
    writes, view-returning subsetting for a held-out transform."""
    from alpine_tpu import ALPINE

    adata = _double()
    m = ALPINE(n_components=6, n_covariate_components=[2, 3],
               lam=[1.0, 2.0], device="cpu", random_state=0)
    m.fit(adata, ["batch", "condition"], max_iter=10)
    assert m.data_dtype_ == "int8"  # auto resolution saw the X property
    assert adata.obsm["ALPINE_embedding"].shape == (150, 6)
    assert adata.obsm["batch"].shape == (150, 2)
    assert adata.obsm["batch_dummy_matrix"].shape == (150, 2)
    assert adata.varm["ALPINE_weights"].shape == (30, 6)

    # held-out projection through a view -> copy (the reference/optimizer
    # subsetting pattern, optimization.py:242-243)
    held = adata[np.arange(30)].copy()
    m.transform(held, n_iter=5)
    assert held.obsm["ALPINE_embedding"].shape == (30, 6)

    # writing to a raw view must still be an error (guard is active)
    with pytest.raises(RuntimeError, match="view"):
        adata[np.arange(5)].obsm["x"] = np.zeros((5, 2))

    m.get_covariate_gene_scores(adata)
    assert adata.varm["batch_gene_scores"].shape == (30, 2)
    m.get_normalized_expression(adata, library_size=1e4)
    assert np.allclose(
        np.asarray(adata.layers["normalized_expression"]).sum(axis=1),
        1e4, rtol=1e-3,
    )
    loss = m.compute_loss(adata)
    assert np.isfinite(loss)


@pytest.mark.slow
def test_optimizer_through_real_anndata(real_anndata_module):
    """ComponentOptimizer's copy()/view-subset CV flow over the double."""
    from alpine_tpu import ComponentOptimizer

    adata = _double(n=90, g=20, seed=1)
    adata.obs["condition"] = pd.Categorical(
        [f"c{j}" for j in np.random.default_rng(2).integers(0, 2, 90)]
    )
    co = ComponentOptimizer(adata, ["batch"], max_iter=5, random_state=0,
                            device="cpu")
    best = co.search_hyperparams(
        n_total_components_range=(8, 14), lam_range=(1.0, 10.0),
        n_splits=2, max_evals=2,
    )
    assert "n_components" in best
