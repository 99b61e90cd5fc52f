"""Component-shape bucketing (SURVEY §7 hard-part 2): padding blocks with
zero-initialized phantom components must be EXACTLY neutral, so optimizer
trials with nearby component splits can share one compiled program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpine_tpu.ops import mu

EPS = 1e-6


def _problem(seed, g=24, n=120, n_labels=(2, 3)):
    r = np.random.default_rng(seed)
    X = jnp.asarray(r.random((g, n), dtype=np.float32))
    Ys = []
    for nl in n_labels:
        y = np.zeros((nl, n), np.float32)
        y[r.integers(0, nl, n), np.arange(n)] = 1.0
        Ys.append(jnp.asarray(y))
    return X, tuple(Ys)


def test_bucket_blocks():
    assert mu.bucket_blocks((3, 5, 17), 8) == (8, 8, 24)
    assert mu.bucket_blocks((8, 16), 8) == (8, 16)
    assert mu.bucket_blocks((1,), 4) == (4,)


@pytest.mark.parametrize("loss_kl", [True, False])
def test_bucket_padding_is_exactly_neutral(loss_kl):
    """Same genuine initial values, once at exact shapes and once embedded
    in bucket-padded blocks: the genuine components must follow the SAME
    trajectory and the losses must be identical."""
    g, n = 24, 120
    true_blocks, n_labels = (3, 5, 7), (2, 3)
    pad_blocks = mu.bucket_blocks(true_blocks, 8)  # (8, 8, 8)
    X, Ys = _problem(0, g, n, n_labels)
    hyper = (jnp.asarray([2.0, 0.5], jnp.float32), jnp.float32(0.2),
             jnp.float32(0.4), jnp.float32(0.3), jnp.float32(EPS))
    key = jax.random.PRNGKey(7)

    cfg_t = mu.MUConfig(blocks=true_blocks, n_labels=n_labels, n_cells=n,
                        loss_kl=loss_kl, max_iter=12)
    Wt0, Ht0, Bst0 = mu.init_matrices(cfg_t, g, key, EPS)
    Wt, Ht, Bst, Lt = mu.fit_scan(cfg_t, Wt0, Ht0, Bst0, X, Ys, hyper, key, None)

    # embed the SAME genuine values into padded blocks, zeros elsewhere
    cfg_p = mu.MUConfig(blocks=pad_blocks, n_labels=n_labels, n_cells=n,
                        loss_kl=loss_kl, max_iter=12)
    Kp = sum(pad_blocks)
    Wp0 = np.zeros((g, Kp), np.float32)
    Hp0 = np.zeros((Kp, n), np.float32)
    Bsp0 = []
    ot = 0
    for i, (kp, kt) in enumerate(zip(pad_blocks, true_blocks)):
        op = sum(pad_blocks[:i])
        Wp0[:, op:op + kt] = np.asarray(Wt0)[:, ot:ot + kt]
        Hp0[op:op + kt] = np.asarray(Ht0)[ot:ot + kt]
        if i < len(n_labels):
            b = np.zeros((n_labels[i], kp), np.float32)
            b[:, :kt] = np.asarray(Bst0[i])
            Bsp0.append(jnp.asarray(b))
        ot += kt
    Wp, Hp, Bsp, Lp = mu.fit_scan(cfg_p, jnp.asarray(Wp0), jnp.asarray(Hp0),
                                  tuple(Bsp0), X, Ys, hyper, key, None)

    # exact in real arithmetic; float32 reduction order differs with the
    # padded contraction width (observed ~2e-6 relative)
    np.testing.assert_allclose(np.asarray(Lp), np.asarray(Lt),
                               rtol=1e-4, atol=1e-4)
    valid = np.asarray(mu.block_valid_mask(pad_blocks, true_blocks))
    np.testing.assert_allclose(np.asarray(Wp)[:, valid], np.asarray(Wt),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Hp)[valid], np.asarray(Ht),
                               rtol=1e-3, atol=1e-6)
    for i, kt in enumerate(true_blocks[:-1]):
        np.testing.assert_allclose(np.asarray(Bsp[i])[:, :kt],
                                   np.asarray(Bst[i]), rtol=1e-3, atol=1e-6)
    # phantom components stayed exactly zero
    assert not np.asarray(Wp)[:, ~valid].any()
    assert not np.asarray(Hp)[~valid].any()


def test_mask_block_padding_and_scale_guard():
    g, n = 10, 30
    pad_blocks, true_blocks = (8, 8), (3, 5)
    n_labels = (2,)
    cfg = mu.MUConfig(blocks=pad_blocks, n_labels=n_labels, n_cells=n)
    key = jax.random.PRNGKey(0)
    W, H, Bs = mu.init_matrices(cfg, g, key, EPS)
    W, H, Bs = mu.mask_block_padding(pad_blocks, true_blocks, W, H, Bs)
    valid = np.asarray(mu.block_valid_mask(pad_blocks, true_blocks))
    assert not np.asarray(W)[:, ~valid].any()
    assert not np.asarray(H)[~valid].any()
    assert not np.asarray(Bs[0])[:, 3:].any()
    assert np.asarray(W)[:, valid].all()  # genuine entries untouched (>= eps)

    # scale_matrices must not NaN on the all-zero phantom columns
    Ws, Hs, Bss = mu.scale_matrices(cfg, W, H, Bs)
    assert np.isfinite(np.asarray(Ws)).all()
    assert np.isfinite(np.asarray(Hs)).all()
    np.testing.assert_allclose(np.asarray(Ws).sum(axis=0)[valid], 1.0,
                               rtol=1e-6)


def test_alpine_component_bucket_end_to_end():
    """ALPINE(component_bucket=8): compiled shapes are bucketed, stored
    matrices are true-sized, and the whole estimator surface works."""
    from .conftest import make_synthetic_adata
    from alpine_tpu import ALPINE

    adata = make_synthetic_adata(n_cells=80, n_genes=25, seed=3)
    m = ALPINE(n_components=7, n_covariate_components=[3, 2], lam=[2.0, 1.0],
               device="cpu", random_state=0, component_bucket=8)
    m.fit(adata, ["batch", "condition"], max_iter=10)
    assert [w.shape[1] for w in m.matrices["Ws"]] == [3, 2, 7]
    assert [h.shape[0] for h in m.matrices["Hs"]] == [3, 2, 7]
    assert [b.shape[1] for b in m.matrices["Bs"]] == [3, 2]
    tl = m.loss_history["total loss"].to_numpy()
    assert np.isfinite(tl).all() and tl[-1] < tl[0]
    assert adata.obsm["ALPINE_embedding"].shape == (80, 7)
    fresh = make_synthetic_adata(n_cells=40, n_genes=25, seed=4)
    m.transform(fresh, n_iter=5)
    assert fresh.obsm["ALPINE_embedding"].shape == (40, 7)


@pytest.mark.slow
def test_optimizer_shape_bucket_caps_compiles():
    """A search whose trials draw different component splits must reuse one
    bucketed program per distinct bucket tuple instead of compiling per
    trial (SURVEY §7 hard-part 2)."""
    from .conftest import make_synthetic_adata
    from alpine_tpu import ComponentOptimizer
    from alpine_tpu.optimize import batched

    adata = make_synthetic_adata(n_cells=90, n_genes=25,
                                 covariates=(("batch", 2),), seed=11)

    recorded = []
    orig = batched.batched_fold_embeddings

    def spy(*args, **kwargs):
        recorded.append(kwargs["blocks"])
        return orig(*args, **kwargs)

    batched.batched_fold_embeddings = spy
    try:
        co = ComponentOptimizer(adata, ["batch"], max_iter=6, device="cpu",
                                random_state=1, shape_bucket=8)
        co.search_hyperparams(
            n_total_components_range=(8, 30), lam_range=(1.0, 100.0),
            n_splits=2, max_evals=6,
        )
    finally:
        batched.batched_fold_embeddings = orig

    assert recorded, "batched scoring path was not used"
    for blocks in recorded:
        assert all(k % 8 == 0 for k in blocks), blocks
    # trials spanning a 4x total-component range share a handful of buckets
    assert len(set(recorded)) < len(recorded) or len(recorded) == 1
    # best-param decode still reports true (unbucketed) sizes
    total = co.best_param["n_components"] + sum(
        co.best_param["n_covariate_components"])
    assert 8 <= total <= 30


def test_auto_bucket_blocks():
    # shared guided level + own unguided level
    assert mu.auto_bucket_blocks((5, 11, 27)) == (12, 12, 32)
    assert mu.auto_bucket_blocks((2, 2, 25)) == (2, 2, 32)
    assert mu.auto_bucket_blocks((30,)) == (32,)
    # beyond the level table: 128-multiples
    assert mu.auto_bucket_blocks((1100,)) == (1152,)
    padded = mu.auto_bucket_blocks((13, 4, 50))
    assert padded == (16, 16, 64)
    assert all(p >= t for p, t in zip(padded, (13, 4, 50)))


def test_alpine_component_bucket_tuple():
    """An explicit padded-shape tuple (what the optimizer's auto mode
    passes) works end-to-end and validates against the true sizes."""
    from .conftest import make_synthetic_adata
    from alpine_tpu import ALPINE

    adata = make_synthetic_adata(n_cells=60, n_genes=20, seed=5)
    m = ALPINE(n_components=5, n_covariate_components=[3, 2], lam=[1.0, 1.0],
               device="cpu", random_state=0, component_bucket=(4, 4, 8))
    m.fit(adata, ["batch", "condition"], max_iter=6)
    assert [w.shape[1] for w in m.matrices["Ws"]] == [3, 2, 5]

    with pytest.raises(ValueError, match="padded size >= the true size"):
        ALPINE(n_components=5, n_covariate_components=[3], lam=[1.0],
               device="cpu", component_bucket=(2, 8))


@pytest.mark.slow
def test_optimizer_auto_bucket_bounds_shapes():
    """auto bucketing: distinct compiled shapes across a sweep stay far
    below the trial count (shared guided level kills the combinatorics)."""
    from .conftest import make_synthetic_adata
    from alpine_tpu import ComponentOptimizer
    from alpine_tpu.optimize import batched

    adata = make_synthetic_adata(n_cells=90, n_genes=25,
                                 covariates=(("batch", 2), ("condition", 3)),
                                 seed=12)
    recorded = []
    orig = batched.batched_fold_embeddings

    def spy(*args, **kwargs):
        recorded.append(kwargs["blocks"])
        return orig(*args, **kwargs)

    batched.batched_fold_embeddings = spy
    try:
        co = ComponentOptimizer(adata, ["batch", "condition"], max_iter=5,
                                device="cpu", random_state=2)  # default auto
        co.search_hyperparams(
            n_total_components_range=(14, 60), lam_range=(1.0, 100.0),
            n_splits=2, max_evals=8,
        )
    finally:
        batched.batched_fold_embeddings = orig

    assert len(recorded) >= 4  # several valid trials ran
    for blocks in recorded:
        # guided blocks share one level per trial, all sizes on the level
        # grid -> distinct shapes saturate at O(levels^2) as a sweep grows
        # (measured: benchmarks/run_configs.py config 4)
        assert blocks[0] == blocks[1]
        assert all(k in mu._GEO_LEVELS for k in blocks), blocks
    assert len(set(recorded)) <= 8, recorded
