"""Edge-case robustness: tiny problems, single-label covariates, odd shapes,
degenerate data."""

import numpy as np
import pandas as pd
import pytest

from alpine_tpu import ALPINE
from alpine_tpu.utils.adata import AnnData

from .conftest import make_synthetic_adata


def test_single_label_covariate():
    """A covariate with one category one-hots to a single column."""
    adata = make_synthetic_adata(n_cells=40, n_genes=15, covariates=())
    adata.obs["flat"] = np.array(["only"] * 40, dtype=object)
    m = ALPINE(n_components=4, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0)
    m.fit(adata, ["flat"], max_iter=5)
    assert m.matrices["Bs"][0].shape == (1, 2)
    assert np.isfinite(m.loss_history.values).all()


def test_n_components_one():
    adata = make_synthetic_adata(n_cells=30, n_genes=10, covariates=())
    m = ALPINE(n_components=1, n_covariate_components=[], lam=[],
               device="cpu", random_state=0)
    m.fit(adata, [], max_iter=5)
    assert adata.obsm["ALPINE_embedding"].shape == (30, 1)


def test_odd_nondivisible_shapes():
    """Shapes with no relation to 8/128 tiling must work everywhere."""
    adata = make_synthetic_adata(n_cells=131, n_genes=37,
                                 covariates=(("batch", 3),), seed=7)
    m = ALPINE(n_components=7, n_covariate_components=[3], lam=[2.0],
               device="cpu", random_state=0)
    m.fit(adata, ["batch"], max_iter=6, batch_size=17)
    m.transform(adata, n_iter=4)
    assert np.isfinite(adata.obsm["ALPINE_embedding"]).all()


def test_zero_rows_and_columns_in_x():
    """All-zero genes and cells must not produce NaN/Inf (clamped dens)."""
    adata = make_synthetic_adata(n_cells=50, n_genes=20,
                                 covariates=(("batch", 2),), seed=8)
    adata.X[:, 0] = 0.0  # dead gene
    adata.X[0, :] = 0.0  # empty cell
    m = ALPINE(n_components=5, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0)
    m.fit(adata, ["batch"], max_iter=8)
    assert np.isfinite(m.loss_history.values).all()
    for name in ("Ws", "Hs", "Bs"):
        for a in m.matrices[name]:
            assert np.isfinite(a).all()


def test_batch_size_one():
    adata = make_synthetic_adata(n_cells=12, n_genes=8,
                                 covariates=(("batch", 2),), seed=9)
    m = ALPINE(n_components=3, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0)
    m.fit(adata, ["batch"], max_iter=3, batch_size=1)
    assert np.isfinite(m.loss_history.values).all()


def test_batch_size_larger_than_n():
    adata = make_synthetic_adata(n_cells=10, n_genes=8,
                                 covariates=(("batch", 2),), seed=10)
    m = ALPINE(n_components=3, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0)
    m.fit(adata, ["batch"], max_iter=3, batch_size=1000)
    assert len(m.loss_history) == 3


def test_weighted_sampling_no_covariates_fails_cleanly():
    """Weighted sampling derives joint labels from the dummy matrices; with
    no covariates there is nothing to balance (the reference crashes with an
    IndexError at sampling.py:41; we raise a clear error)."""
    adata = make_synthetic_adata(n_cells=20, n_genes=8, covariates=())
    m = ALPINE(n_components=3, n_covariate_components=[], lam=[],
               device="cpu", random_state=0)
    with pytest.raises((ValueError, IndexError)):
        m.fit(adata, [], max_iter=2, sampling_method="weighted")


def test_transform_smaller_and_larger_cohorts():
    adata = make_synthetic_adata(n_cells=60, n_genes=16,
                                 covariates=(("batch", 2),), seed=11)
    m = ALPINE(n_components=4, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0)
    m.fit(adata, ["batch"], max_iter=5)
    tiny = make_synthetic_adata(n_cells=3, n_genes=16,
                                covariates=(("batch", 2),), seed=12)
    m.transform(tiny, n_iter=3)
    assert tiny.obsm["ALPINE_embedding"].shape == (3, 4)
    big = make_synthetic_adata(n_cells=200, n_genes=16,
                               covariates=(("batch", 2),), seed=13)
    m.transform(big, n_iter=3)
    assert big.obsm["ALPINE_embedding"].shape == (200, 4)


def test_integer_input_matrix():
    """Count matrices arrive as ints; fit must cast to float32."""
    r = np.random.default_rng(0)
    X = r.integers(0, 50, (30, 12)).astype(np.int64)
    obs = pd.DataFrame(
        {"batch": np.array(["a", "b"] * 15, dtype=object)},
        index=[f"c{i}" for i in range(30)],
    )
    adata = AnnData(X, obs=obs)
    m = ALPINE(n_components=4, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0)
    m.fit(adata, ["batch"], max_iter=4)
    assert m.matrices["X"].dtype == np.float32
