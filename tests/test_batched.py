"""Tests for vmap-batched CV folds."""

import numpy as np
import pytest
from sklearn.model_selection import StratifiedKFold

from alpine_tpu.optimize.batched import batched_fold_embeddings
from alpine_tpu.utils.encoder import FeatureEncoders

from .conftest import make_synthetic_adata


def _setup(n_cells=90, seed=11):
    adata = make_synthetic_adata(n_cells=n_cells, n_genes=25,
                                 covariates=(("batch", 2),), seed=seed)
    fe = FeatureEncoders(["batch"])
    Ys = fe.fit_transform(adata.obs)
    skf = StratifiedKFold(n_splits=3, shuffle=True, random_state=0)
    folds = list(skf.split(adata.X, adata.obs["batch"].astype(str)))
    return adata, Ys, folds


COMMON = dict(lam=[5.0], orth_w=0.0, alpha_w=0.0, l1_ratio=0.0, eps=1e-6,
              loss_kl=True, use_als=False, batch_size=None, weighted=False,
              max_iter=10, scale=True, seed=0)


def test_batched_fold_embeddings_shapes_and_determinism():
    adata, Ys, folds = _setup()
    embs1 = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6), **COMMON)
    embs2 = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6), **COMMON)
    assert len(embs1) == 3
    for (_, va), e1, e2 in zip(folds, embs1, embs2):
        assert e1.shape == (len(va), 6)
        assert np.isfinite(e1).all()
        np.testing.assert_array_equal(e1, e2)


def test_batched_weighted_and_minibatch():
    adata, Ys, folds = _setup()
    kw = dict(COMMON)
    kw.update(weighted=True, batch_size=32)
    embs = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 5), **kw)
    assert all(np.isfinite(e).all() for e in embs)


def test_batched_padding_neutrality():
    """Folds of unequal size: a fold padded by k zero-columns must produce
    the same W as the same fold run alone at its padded size."""
    adata, Ys, folds = _setup(n_cells=91)  # 91 -> folds of 60/61 train cells
    sizes = {len(tr) for tr, _ in folds}
    assert len(sizes) > 1  # genuinely ragged
    embs = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6), **COMMON)
    single = batched_fold_embeddings(adata.X, Ys, folds[:1], blocks=(2, 6), **COMMON)
    # fold 0 alone may have a smaller pad target; only compare when the max
    # train size matches
    if len(folds[0][0]) == max(len(tr) for tr, _ in folds):
        np.testing.assert_allclose(embs[0], single[0], rtol=1e-4)


def test_optimizer_batched_vs_sequential_scores():
    """The batched scorer must agree with the sequential path to clustering
    tolerance on an easy, strongly-structured problem."""
    from alpine_tpu import ComponentOptimizer

    adata = make_synthetic_adata(n_cells=90, n_genes=25,
                                 covariates=(("batch", 2),), seed=3)
    args = {"n_components": 6, "n_covariate_components": [2], "lam": [5.0],
            "orth_W": 0.0, "alpha_W": 0.0, "l1_ratio_W": 0.0}

    co_b = ComponentOptimizer(adata, ["batch"], max_iter=10, device="cpu",
                              random_state=0, fold_batching=True)
    co_s = ComponentOptimizer(adata, ["batch"], max_iter=10, device="cpu",
                              random_state=0, fold_batching=False)
    co_b.n_splits = co_s.n_splits = 3
    co_b.iter_records = []
    co_s.iter_records = []
    sb = co_b.calc_score(args)
    ss = co_s.calc_score(args)
    assert np.isfinite(sb) and np.isfinite(ss)
    # same scoring semantics; different inits => clustering-level agreement
    assert abs(sb - ss) < 0.75


def test_optimizer_search_with_batching():
    from alpine_tpu import ComponentOptimizer

    adata = make_synthetic_adata(n_cells=80, n_genes=20,
                                 covariates=(("batch", 2),), seed=5)
    co = ComponentOptimizer(adata, ["batch"], max_iter=6, device="cpu",
                            random_state=0, fold_batching=True)
    best = co.search_hyperparams(
        n_total_components_range=(8, 14), lam_range=(1.0, 50.0),
        n_splits=2, max_evals=3,
    )
    assert best["n_components"] >= 2
    assert len(co.trials.trials) == 3


def test_batched_folds_over_mesh():
    """Fold-axis sharding over a device mesh gives the same embeddings as
    the unsharded batched path."""
    import jax

    if len(jax.devices()) < 3:
        pytest.skip("needs multiple devices")
    from alpine_tpu.parallel.mesh import make_cell_mesh

    adata, Ys, folds = _setup()
    plain = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6), **COMMON)
    mesh = make_cell_mesh(3)
    sharded = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6),
                                      mesh=mesh, **COMMON)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


def test_optimizer_mesh_device_batched():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from alpine_tpu import ComponentOptimizer
    from alpine_tpu.parallel.mesh import make_cell_mesh

    adata = make_synthetic_adata(n_cells=80, n_genes=20,
                                 covariates=(("batch", 2),), seed=5)
    co = ComponentOptimizer(adata, ["batch"], max_iter=6,
                            device=make_cell_mesh(2), random_state=0)
    args = {"n_components": 6, "n_covariate_components": [2], "lam": [5.0],
            "orth_W": 0.0, "alpha_W": 0.0, "l1_ratio_W": 0.0}
    co.n_splits = 2
    co.iter_records = []
    s = co.calc_score(args)
    assert np.isfinite(s)
