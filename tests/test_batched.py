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


@pytest.mark.slow
def test_batched_weighted_and_minibatch():
    adata, Ys, folds = _setup()
    kw = dict(COMMON)
    kw.update(weighted=True, batch_size=32)
    embs = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 5), **kw)
    assert all(np.isfinite(e).all() for e in embs)


def test_padding_neutrality_exact():
    """Direct neutrality check at the engine level: appending zero columns
    to X/Y AND zero columns to H0 must leave W, the Bs, and the real H
    columns bit-comparable to the unpadded fit (the argument the batched CV
    stacking relies on)."""
    import jax
    import jax.numpy as jnp

    from alpine_tpu.ops import mu

    r = np.random.default_rng(0)
    g, n, pad = 18, 30, 7
    X = r.random((g, n)).astype(np.float32)
    Y = np.zeros((2, n), np.float32)
    Y[r.integers(0, 2, n), np.arange(n)] = 1.0
    hyper = (jnp.asarray([3.0], jnp.float32), jnp.float32(0.2),
             jnp.float32(0.1), jnp.float32(0.4), jnp.float32(1e-6))
    key = jax.random.PRNGKey(0)

    cfg_a = mu.MUConfig(blocks=(2, 5), n_labels=(2,), n_cells=n, max_iter=8)
    W0, H0, Bs0 = mu.init_matrices(cfg_a, g, key, 1e-6)
    Wa, Ha, Bsa, La = mu.fit_scan(cfg_a, W0, H0, Bs0, jnp.asarray(X),
                                  (jnp.asarray(Y),), hyper, key, None)

    cfg_b = mu.MUConfig(blocks=(2, 5), n_labels=(2,), n_cells=n + pad,
                        max_iter=8)
    Xp = np.concatenate([X, np.zeros((g, pad), np.float32)], axis=1)
    Yp = np.concatenate([Y, np.zeros((2, pad), np.float32)], axis=1)
    H0p = jnp.concatenate([H0, jnp.zeros((7, pad), jnp.float32)], axis=1)
    Wb, Hb, Bsb, Lb = mu.fit_scan(cfg_b, W0, H0p, Bs0, jnp.asarray(Xp),
                                  (jnp.asarray(Yp),), hyper, key, None)

    # exact in exact arithmetic; padded reductions use a different
    # accumulation tree, so allow ~1-ulp f32 noise
    np.testing.assert_allclose(np.asarray(Wa), np.asarray(Wb), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Bsa[0]), np.asarray(Bsb[0]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Ha), np.asarray(Hb)[:, :n], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(Hb)[:, n:], 0.0)


def test_batched_ragged_folds_match_each_other():
    """Ragged folds (91 cells / 3 folds): batched embeddings must be finite
    and deterministic; the padded smaller folds follow genuinely neutral
    trajectories (neutrality itself proven in test_padding_neutrality_exact)."""
    adata, Ys, folds = _setup(n_cells=91)
    sizes = {len(tr) for tr, _ in folds}
    assert len(sizes) > 1  # genuinely ragged
    embs = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6), **COMMON)
    embs2 = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6), **COMMON)
    for e1, e2 in zip(embs, embs2):
        assert np.isfinite(e1).all()
        np.testing.assert_array_equal(e1, e2)


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


def test_fold_sharding_divisibility():
    """A mesh that does not divide n_folds must fall back gracefully
    (regression: 3 folds over a 2-device mesh crashed device_put)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from alpine_tpu.parallel.mesh import make_cell_mesh

    adata, Ys, folds = _setup()  # 3 folds
    assert len(folds) == 3
    mesh = make_cell_mesh(2)  # 2 does not divide 3
    embs = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6),
                                   mesh=mesh, **COMMON)
    plain = batched_fold_embeddings(adata.X, Ys, folds, blocks=(2, 6), **COMMON)
    for a, b in zip(embs, plain):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)
