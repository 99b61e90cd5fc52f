"""Tiled minibatch sampling (mu.MUConfig.tile) — the TPU-native extension
that permutes 128-column tiles instead of single cells so minibatch gathers
move at streaming bandwidth (the reference's per-cell draws, sampling.py:6-16,
are random-gather-bound; benchmarks/gather_floor.py).

Correctness anchors:
- tile == 1 on an unpadded cell axis is BITWISE the per-cell 'random' path
  (same permutation draw, same fill index, same update sequence);
- a single batch covering every tile is the full-batch update on a column
  permutation of X (W/Bs permutation-invariant, H scattered back);
- the float64 oracle driven with the same tile permutations reproduces the
  trajectory;
- zero pad columns (cell axis padded to a tile multiple) stay exactly zero.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from alpine_tpu import ALPINE
from alpine_tpu.ops import mu

from .conftest import make_synthetic_adata
from .oracle import oracle_joint_step, _cat_h, _cat_w

BLOCKS = (3, 4, 6)
N_LABELS = (2, 3)
G = 25
EPS = 1e-6


def _problem(seed=0, n=40):
    r = np.random.default_rng(seed)
    X = (r.random((G, n)).astype(np.float32) * 3).round(3)
    Ys = []
    for nl in N_LABELS:
        y = np.zeros((nl, n), np.float32)
        y[r.integers(0, nl, n), np.arange(n)] = 1.0
        Ys.append(y)
    Ws = [r.random((G, k)).astype(np.float32) + 0.1 for k in BLOCKS]
    Hs = [r.random((k, n)).astype(np.float32) + 0.1 for k in BLOCKS]
    Bs = [r.random((nl, k)).astype(np.float32) + 0.1
          for nl, k in zip(N_LABELS, BLOCKS)]
    return X, Ys, Ws, Hs, Bs


def _hyper(lam=(1.0, 2.0), orth=0.2, alpha=0.1, l1=0.5):
    return (jnp.asarray(lam, jnp.float32), jnp.float32(orth),
            jnp.float32(alpha), jnp.float32(l1), jnp.float32(EPS))


def _fit(cfg, X, Ys, Ws, Hs, Bs, seed=11, hyper=None):
    W = jnp.asarray(_cat_w(Ws))
    H = jnp.asarray(_cat_h(Hs))
    Bs_d = tuple(jnp.asarray(b) for b in Bs)
    key = jax.random.PRNGKey(seed)
    return mu.fit_scan(cfg, W, H, Bs_d, jnp.asarray(X),
                       tuple(jnp.asarray(y) for y in Ys),
                       hyper or _hyper(), key, None)


def test_tile1_matches_per_cell_sampling():
    """tile=1 with no cell padding reduces to the reference per-cell
    permutation branch: identical permutation draws, identical batch
    sequence, same update math — results agree to XLA fusion-order
    rounding (the reshape-gather compiles to a different fusion, so
    float32 sums reassociate at the ~1e-6 level)."""
    n, bs, iters = 37, 10, 3  # non-divisible: exercises the fill-index pad
    X, Ys, Ws, Hs, Bs = _problem(seed=7, n=n)
    base = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                       loss_kl=True, batch_size=bs, max_iter=iters)
    Wr, Hr, Bsr, Lr = _fit(base, X, Ys, Ws, Hs, Bs)
    Wt, Ht, Bst, Lt = _fit(replace(base, tile=1), X, Ys, Ws, Hs, Bs)
    np.testing.assert_allclose(np.asarray(Wr), np.asarray(Wt),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Hr), np.asarray(Ht),
                               rtol=1e-5, atol=1e-7)
    for br, bt in zip(Bsr, Bst):
        np.testing.assert_allclose(np.asarray(br), np.asarray(bt),
                                   rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Lr), np.asarray(Lt),
                               rtol=1e-5, atol=1e-7)


def test_single_batch_epoch_is_a_column_permutation_of_full_batch():
    """When one batch covers every tile, a tiled epoch is the full-batch
    joint update applied to a column permutation of X — W/Bs agree with the
    unpermuted full-batch update (cell-axis contractions are permutation-
    invariant) and H is scattered back to its original columns."""
    n, t, iters = 48, 8, 4
    X, Ys, Ws, Hs, Bs = _problem(seed=3, n=n)
    tiled = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                        loss_kl=True, batch_size=n - 1, tile=t,
                        max_iter=iters)
    full = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                       loss_kl=True, max_iter=iters)
    Wt, Ht, Bst, Lt = _fit(tiled, X, Ys, Ws, Hs, Bs)
    Wf, Hf, Bsf, Lf = _fit(full, X, Ys, Ws, Hs, Bs)
    np.testing.assert_allclose(np.asarray(Wt), np.asarray(Wf),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ht), np.asarray(Hf),
                               rtol=1e-4, atol=1e-6)
    for bt, bf in zip(Bst, Bsf):
        np.testing.assert_allclose(np.asarray(bt), np.asarray(bf),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Lt), np.asarray(Lf),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n,t", [(40, 8), (37, 8)])  # 37 -> 3 zero pad cols
def test_tiled_scan_matches_oracle_loop(n, t):
    """Drive the float64 oracle with the same tile permutations the jitted
    tiled scan draws; trajectories must agree (incl. a padded cell axis —
    zero columns are exact fixed points of every update)."""
    bs, iters = 16, 3  # bs_t = 2 tiles per batch
    X, Ys, Ws, Hs, Bs = _problem(seed=9, n=n)
    pad = (-n) % t
    Xp = np.pad(X, ((0, 0), (0, pad)))
    Ysp = [np.pad(y, ((0, 0), (0, pad))) for y in Ys]
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                      loss_kl=True, batch_size=bs, tile=t, max_iter=iters)
    key = jax.random.PRNGKey(11)
    Wn, Hn, Bsn, _ = _fit(cfg, Xp, Ysp, Ws, Hs, Bs, seed=11)

    total = n + pad
    n_tiles = total // t
    bs_t = -(-min(bs, n) // t)
    oWs = [w.copy() for w in Ws]
    oHs = [np.pad(h, ((0, 0), (0, pad))) for h in Hs]
    oBs = [b.copy() for b in Bs]
    oX = np.pad(X, ((0, 0), (0, pad)))
    oYs = [np.pad(y, ((0, 0), (0, pad))) for y in Ys]
    keys = jax.random.split(key, iters)
    for it in range(iters):
        perm = np.asarray(jax.random.permutation(keys[it], n_tiles))
        for b0 in range(0, n_tiles, bs_t):
            tiles = perm[b0:b0 + bs_t]
            idx = (tiles[:, None] * t + np.arange(t)[None, :]).ravel()
            X_b = oX[:, idx]
            Ys_b = [y[:, idx] for y in oYs]
            Hs_b = [h[:, idx] for h in oHs]
            oWs, Hs_b, oBs = oracle_joint_step(
                oWs, Hs_b, oBs, X_b, Ys_b, [1.0, 2.0], 0.2, 0.1, 0.5,
                EPS, True)
            for j in range(len(oHs)):
                oHs[j][:, idx] = Hs_b[j]

    np.testing.assert_allclose(np.asarray(Wn), _cat_w(oWs),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Hn), _cat_h(oHs)[:, :n],
                               rtol=5e-4, atol=1e-5)
    for bj, bo in zip(Bsn, oBs):
        np.testing.assert_allclose(np.asarray(bj), bo, rtol=5e-4, atol=1e-5)


def test_tiled_pad_columns_stay_exactly_zero():
    n, t = 37, 8
    X, Ys, Ws, Hs, Bs = _problem(seed=5, n=n)
    pad = (-n) % t
    Xp = np.pad(X, ((0, 0), (0, pad)))
    Ysp = [np.pad(y, ((0, 0), (0, pad))) for y in Ys]
    Hsp = [np.pad(h, ((0, 0), (0, pad))) for h in Hs]
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                      loss_kl=True, batch_size=16, tile=t, max_iter=4,
                      trim_h=False)
    _, Hn, _, _ = _fit(cfg, Xp, Ysp, Ws, Hsp, Bs)
    assert Hn.shape[1] == n + pad
    np.testing.assert_array_equal(np.asarray(Hn[:, n:]), 0.0)


def test_tiled_requires_tile_multiple_cell_axis():
    n = 37
    X, Ys, Ws, Hs, Bs = _problem(seed=5, n=n)
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                      loss_kl=True, batch_size=16, tile=8, max_iter=2)
    with pytest.raises(ValueError, match="multiple"):
        _fit(cfg, X, Ys, Ws, Hs, Bs)


# ---------------------------------------------------------------- model API


def test_model_tiled_fit_runs_and_converges():
    adata = make_synthetic_adata(n_cells=300, n_genes=30)
    m = ALPINE(n_components=8, n_covariate_components=[2, 3],
               lam=[1.0, 2.0], device="cpu", random_state=0)
    m.fit(adata, ["batch", "condition"], batch_size=130,
          sampling_method="tiled", max_iter=12)
    L = m.loss_history["total loss"].to_numpy()
    assert np.isfinite(L).all() and L[-1] < L[0]
    emb = adata.obsm["ALPINE_embedding"]
    assert emb.shape == (300, 8) and np.isfinite(emb).all()
    assert (emb >= 0).all()


def test_model_tiled_unshuffles_h_to_caller_cell_order():
    """The seeded pre-shuffle must be undone on the way out: each cell's
    returned H column has to explain ITS OWN expression row.  A converged
    fit reconstructs X ≈ W@H per cell only when the alignment is right —
    with a forgotten/wrong unshuffle the per-cell reconstruction
    correlation collapses to the permuted-pairing baseline."""
    adata = make_synthetic_adata(n_cells=300, n_genes=30)
    m = ALPINE(n_components=8, n_covariate_components=[2, 3],
               lam=[1.0, 2.0], device="cpu", random_state=0)
    m.fit(adata, ["batch", "condition"], batch_size=130,
          sampling_method="tiled", max_iter=80)
    W = np.hstack(m.matrices["Ws"])
    H = np.vstack(m.matrices["Hs"])
    R = W @ H  # (genes, cells) reconstruction in the CALLER's cell order
    X = np.asarray(adata.X, np.float32).T

    def mean_cell_corr(a, b):
        a = a - a.mean(0)
        b = b - b.mean(0)
        denom = np.linalg.norm(a, axis=0) * np.linalg.norm(b, axis=0) + 1e-12
        return float(((a * b).sum(0) / denom).mean())

    aligned = mean_cell_corr(X, R)
    # the same reconstruction scored against a shuffled pairing: what a
    # missing unshuffle would look like
    perm = np.random.default_rng(1).permutation(X.shape[1])
    misaligned = mean_cell_corr(X, R[:, perm])
    assert aligned > 0.9, aligned
    assert aligned > misaligned + 0.2, (aligned, misaligned)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_tiled_minibatch_fit(monkeypatch):
    """Tiled sampling on a 1-D mesh rides the shard-local path: per-shard
    tile permutations, every shard padded to a tile multiple, convergence
    comparable to the single-device tiled fit, and NO all-to-all /
    all-gather in the compiled HLO (gathers stay on-device)."""
    from alpine_tpu.parallel.mesh import make_cell_mesh

    # a production 128-cell tile swallows this whole toy problem; a small
    # tile gives both sides comparable sampling granularity (the tile
    # width is a constant, not a semantic)
    monkeypatch.setattr(mu, "DEFAULT_TILE", 8)
    n_cells = 181  # non-divisible: pad to tile x 8 per shard
    adata_a = make_synthetic_adata(n_cells=n_cells, n_genes=30, seed=9)
    adata_b = adata_a.copy()
    kw = dict(n_components=6, n_covariate_components=[2], lam=[2.0],
              random_state=0)
    fit_kw = dict(max_iter=60, batch_size=64, sampling_method="tiled")

    single = ALPINE(device="cpu", **kw)
    single.fit(adata_a, ["batch"], **fit_kw)

    mesh = make_cell_mesh(8)
    sharded = ALPINE(device=mesh, **kw)
    sharded.fit(adata_b, ["batch"], **fit_kw)

    ls = single.loss_history["total loss"].to_numpy()
    lm = sharded.loss_history["total loss"].to_numpy()
    assert np.isfinite(lm).all()
    # different (per-shard) tile streams -> statistical agreement
    assert lm[-1] < lm[0] * 0.9
    np.testing.assert_allclose(lm[-1], ls[-1], rtol=0.1)
    assert adata_b.obsm["ALPINE_embedding"].shape == (n_cells, 6)

    # the compiled program must not move cell columns between shards
    t = 4  # small tile keeps the lowering cheap; the property is the same
    cfg = mu.MUConfig(blocks=(2, 6), n_labels=(2,), n_cells=n_cells,
                      batch_size=64, tile=t, max_iter=2)
    fn = mu._build_sharded_minibatch_fit(cfg, mesh)
    n_padded = n_cells + (-n_cells) % (8 * t)
    X = jnp.zeros((30, n_padded)); H = jnp.ones((8, n_padded))
    Ys = (jnp.zeros((2, n_padded)),)
    Bs = (jnp.ones((2, 2)),)
    hyper = (jnp.asarray([2.0], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e-6))
    W = jnp.ones((30, 8))
    key = jax.random.PRNGKey(0)
    w = jnp.ones((n_padded,), jnp.float32)
    hlo = fn.lower(W, H, Bs, X, Ys, hyper, key, w).compile().as_text()
    assert "all-to-all" not in hlo
    assert "all-gather" not in hlo


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_tiled_requires_tile_aligned_shards():
    from alpine_tpu.parallel.mesh import make_cell_mesh

    mesh = make_cell_mesh(8)
    # 8 shards of 10 columns: not a multiple of tile=4
    cfg = mu.MUConfig(blocks=(2, 6), n_labels=(2,), n_cells=80,
                      batch_size=16, tile=4, max_iter=2)
    fn = mu._build_sharded_minibatch_fit(cfg, mesh)
    X = jnp.zeros((12, 80)); H = jnp.ones((8, 80))
    Ys = (jnp.zeros((2, 80)),)
    Bs = (jnp.ones((2, 2)),)
    hyper = (jnp.asarray([2.0], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e-6))
    W = jnp.ones((12, 8))
    with pytest.raises(ValueError, match="multiple"):
        fn.lower(W, H, Bs, X, Ys, hyper, jax.random.PRNGKey(0),
                 jnp.ones((80,), jnp.float32))


def test_tiled_rejects_als_mode():
    """Joint mode only: ALS's block-cyclic batch updates have no tiled
    trajectory defined — rejected at the model layer on ANY device, and
    defensively in the mu core."""
    adata = make_synthetic_adata(n_cells=64, n_genes=20)
    m = ALPINE(n_components=6, n_covariate_components=[2, 2],
               lam=[1.0, 1.0], device="cpu", random_state=0, use_als=True)
    with pytest.raises(ValueError, match="tiled sampling"):
        m.fit(adata, ["batch", "condition"], batch_size=16,
              sampling_method="tiled", max_iter=3)

    X, Ys, Ws, Hs, Bs = _problem(seed=5, n=40)
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=40,
                      loss_kl=True, batch_size=16, tile=8, max_iter=2,
                      use_als=True)
    with pytest.raises(ValueError, match="joint mode"):
        _fit(cfg, X, Ys, Ws, Hs, Bs)


def test_tiled_rejects_full_batch():
    """Without a (covering-exclusive) batch_size the fit would silently run
    as a plain full-batch fit — no tile permutation, no pre-shuffle — while
    claiming the tiled mode (and compiling a separate but trajectory-
    identical program keyed on tile).  Rejected instead, both for a missing
    batch_size and for one that covers every cell."""
    adata = make_synthetic_adata(n_cells=64, n_genes=20)
    m = ALPINE(n_components=6, n_covariate_components=[2, 2],
               lam=[1.0, 1.0], device="cpu", random_state=0)
    with pytest.raises(ValueError, match="minibatch mode"):
        m.fit(adata, ["batch", "condition"], sampling_method="tiled",
              max_iter=3)
    with pytest.raises(ValueError, match="minibatch mode"):
        m.fit(adata, ["batch", "condition"], batch_size=64,
              sampling_method="tiled", max_iter=3)
    with pytest.raises(ValueError, match="minibatch mode"):
        m.fit(adata, ["batch", "condition"], batch_size=1000,
              sampling_method="tiled", max_iter=3)


@pytest.mark.slow
def test_tiled_fit_transform_cache_matches_uncached():
    """Tiled fits cache the PERMUTED device X; a same-data transform must
    reuse it and return each cell's OWN projection (H0 re-paired, result
    un-permuted).  H0 draws are pad-width-dependent (pre-existing wrinkle,
    same as sharded transforms), so hit/miss agree at CONVERGENCE (the
    frozen-W projection is per-column convex), and a wrong un-permute
    would misassign whole cells — far outside the convergence tolerance."""
    adata = make_synthetic_adata(n_cells=300, n_genes=30)
    m = ALPINE(n_components=8, n_covariate_components=[2, 3],
               lam=[1.0, 2.0], device="cpu", random_state=0)
    m.fit(adata, ["batch", "condition"], batch_size=130,
          sampling_method="tiled", max_iter=10)
    assert m._x_cache is not None and m._x_cache[4] is not None

    ad_hit = adata.copy()
    m.transform(ad_hit, n_iter=400)
    m.free_device_cache()
    ad_miss = adata.copy()
    m.transform(ad_miss, n_iter=400)
    hit = ad_hit.obsm["ALPINE_embedding"]
    miss = ad_miss.obsm["ALPINE_embedding"]

    def row_corr(a, b):
        a = a - a.mean(1, keepdims=True)
        b = b - b.mean(1, keepdims=True)
        denom = (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
                 + 1e-12)
        return (a * b).sum(1) / denom

    # per-cell H is not perfectly unique (correlated W columns), so the
    # aligned correlation plateaus ~0.94; random pairing sits near 0
    aligned = row_corr(hit, miss)
    assert aligned.mean() > 0.9, aligned.mean()
    # contrast: a forgotten/wrong un-permute pairs cells at random
    perm = np.random.default_rng(1).permutation(hit.shape[0])
    misaligned = row_corr(hit, miss[perm])
    assert aligned.mean() > misaligned.mean() + 0.5


def test_model_tiled_rejected_on_2d_mesh_and_als():
    import jax as _jax
    from jax.sharding import Mesh

    adata = make_synthetic_adata(n_cells=64, n_genes=20)
    devs = np.array(_jax.devices("cpu")[:4]).reshape(2, 2)
    mesh2d = Mesh(devs, ("genes", "cells"))
    m = ALPINE(n_components=6, n_covariate_components=[2, 2],
               lam=[1.0, 1.0], device=mesh2d, random_state=0)
    with pytest.raises(ValueError, match="tiled sampling"):
        m.fit(adata, ["batch", "condition"], batch_size=16,
              sampling_method="tiled", max_iter=3)

    mesh1d = Mesh(np.array(_jax.devices("cpu")[:2]), ("cells",))
    m_als = ALPINE(n_components=6, n_covariate_components=[2, 2],
                   lam=[1.0, 1.0], device=mesh1d, random_state=0,
                   use_als=True)
    with pytest.raises(ValueError, match="tiled sampling"):
        m_als.fit(adata, ["batch", "condition"], batch_size=16,
                  sampling_method="tiled", max_iter=3)


def test_component_optimizer_tiled_validation():
    """tiled plumbs through the optimizer (round-3 verdict item 3), with
    the model layer's contract enforced at construction: it is a
    joint-mode minibatch sampler."""
    from alpine_tpu import ComponentOptimizer

    adata = make_synthetic_adata(n_cells=60, n_genes=15)
    with pytest.raises(ValueError, match="minibatch mode"):
        ComponentOptimizer(adata, ["batch"], sampling_method="tiled")
    with pytest.raises(ValueError, match="joint mode"):
        ComponentOptimizer(adata, ["batch"], sampling_method="tiled",
                           batch_size=16, use_als=True)


def test_prepare_fold_data_tiled_stage():
    """Tiled fold staging: the common training width is tile-aligned, each
    fold's training columns are a seeded per-fold shuffle of the fold (same
    multiset of cells, different order per fold), and pad columns are zero."""
    from alpine_tpu.optimize.batched import prepare_fold_data

    r = np.random.default_rng(0)
    n, g, t = 50, 7, 16
    X = (r.random((n, g)) * 3).round(2).astype(np.float32)
    Y = np.zeros((n, 2), np.float32)
    Y[np.arange(n), r.integers(0, 2, n)] = 1.0
    folds = [(np.arange(0, 30), np.arange(30, 50)),
             (np.arange(20, 50), np.arange(0, 20))]
    fd = prepare_fold_data(X, [Y], folds, weighted=False, tile=t,
                           shuffle_seed=7)
    assert fd.tile == t and fd.n_tr % t == 0 and fd.n_tr >= 30
    Xtr = np.asarray(fd.Xtr)
    for f, (tr, _) in enumerate(folds):
        cols = {tuple(c) for c in Xtr[f].T[: len(tr)]}
        want = {tuple(c) for c in X[tr]}
        assert cols == want  # shuffled, nothing lost
        assert (Xtr[f][:, len(tr):] == 0).all()  # pad stays zero
    # per-fold shuffles are DISTINCT (decorrelates the shared tile keys)
    assert not np.array_equal(Xtr[0][:, :30], X[folds[0][0]].T)


@pytest.mark.slow
def test_component_optimizer_tiled_search_scores_match_random():
    """On planted-batch data, a tiled minibatch search must score folds
    statistically indistinguishably from the reference 'random' sampler:
    the first TPE suggestions are identical across the two searches (same
    rng, rng-only startup), so scores pair per-trial and only the sampling
    trajectory differs."""
    from alpine_tpu import ComponentOptimizer

    # >2 tiles of 128 per training fold so the tile permutation is real
    adata = make_synthetic_adata(n_cells=600, n_genes=18,
                                 covariates=(("batch", 2),), seed=3)
    scores = {}
    for method in ("random", "tiled"):
        co = ComponentOptimizer(
            adata, ["batch"], max_iter=8, device="cpu", random_state=0,
            batch_size=128, sampling_method=method,
        )
        co.search_hyperparams(
            n_total_components_range=(8, 12), lam_range=(1.0, 100.0),
            n_splits=2, max_evals=2,
        )
        hist = co.get_train_history().sort_values("n_total_components")
        scores[method] = hist["score"].values
        if method == "tiled":
            # the batched CV fold tensors really staged the tiled layout
            assert co._fold_cache[1].tile > 0
    assert np.isfinite(scores["random"]).all()
    assert np.isfinite(scores["tiled"]).all()
    # paired per-trial comparison: same hyperparams, different sampling
    # trajectories — scores agree to sampling noise, not to machine eps
    assert np.allclose(scores["random"], scores["tiled"], atol=0.1)


def test_unknown_sampling_method_message_unchanged():
    adata = make_synthetic_adata(n_cells=40, n_genes=10)
    m = ALPINE(n_components=6, n_covariate_components=[2, 2],
               lam=[1.0, 1.0], device="cpu", random_state=0)
    with pytest.raises(ValueError, match="Only 'weighted', and 'random'"):
        m.fit(adata, ["batch", "condition"], sampling_method="bogus",
              max_iter=3)
