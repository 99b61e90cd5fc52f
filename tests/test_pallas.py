"""Pallas kernel parity vs the XLA path (interpret mode on CPU; the same
kernels run compiled on TPU — see bench.py / verify skill)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpine_tpu.ops import mu
from alpine_tpu.ops import pallas_kernels as pk

BLOCKS = (3, 4, 6)
N_LABELS = (2, 3)
G, N = 30, 300
EPS = 1e-6


def _problem(seed=0):
    r = np.random.default_rng(seed)
    X = jnp.asarray(r.random((G, N), dtype=np.float32))
    Ys = []
    for nl in N_LABELS:
        y = np.zeros((nl, N), np.float32)
        y[r.integers(0, nl, N), np.arange(N)] = 1.0
        Ys.append(jnp.asarray(y))
    return X, tuple(Ys)


def test_fused_h_update_matches_jnp():
    r = np.random.default_rng(1)
    X = jnp.asarray(r.random((G, N), dtype=np.float32))
    W = jnp.asarray(r.random((G, 13), dtype=np.float32))
    H = jnp.asarray(r.random((13, N), dtype=np.float32) + 0.1)
    WtW = W.T @ W
    eps = jnp.float32(EPS)

    Hn, XHt, HHt, ld = pk.fused_h_update(X, W, H, WtW, eps, interpret=True)
    WtX = W.T @ X
    Hn_ref = H * (2 * WtX) / jnp.maximum(2 * (WtW @ H), eps)
    np.testing.assert_allclose(np.asarray(Hn), np.asarray(Hn_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(XHt), np.asarray(X @ Hn_ref.T),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(HHt), np.asarray(Hn_ref @ Hn_ref.T),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(ld), float(jnp.sum(WtX * Hn_ref)),
                               rtol=1e-4)


def test_fused_iteration_matches_jnp():
    """The production whole-iteration kernel: H update, guided terms, loss
    partials and next-iteration B statistics vs a jnp reference."""
    r = np.random.default_rng(4)
    n = 256  # tile multiple on CPU interpret path
    blocks, n_labels = (3, 9), (2,)
    K = sum(blocks)
    X = jnp.asarray(r.random((G, n), dtype=np.float32))
    W = jnp.asarray(r.random((G, K), dtype=np.float32))
    H = jnp.asarray(r.random((K, n), dtype=np.float32) + 0.1)
    WtW = W.T @ W
    Y = np.zeros((2, n), np.float32)
    Y[r.integers(0, 2, n), np.arange(n)] = 1.0
    Ys = (jnp.asarray(Y),)
    Bs = (jnp.asarray(r.random((2, 3)).astype(np.float32) + 0.1),)
    lam = jnp.asarray([7.0], jnp.float32)
    eps = jnp.float32(EPS)

    Hn, XHt, HHt, ld, preds, bnums, bdens = pk.fused_iteration(
        X, W, H, WtW, Ys, Bs, lam, eps, blocks=blocks, loss_kl=True,
        interpret=True)

    WtX = W.T @ X
    Hi = H[0:3]
    num = (2 * WtX).at[0:3].add(
        lam[0] * (Bs[0].T @ (Ys[0] / jnp.maximum(Bs[0] @ Hi, eps))))
    den = (2 * (WtW @ H)).at[0:3].add(
        lam[0] * jnp.broadcast_to(jnp.sum(Bs[0], axis=0)[:, None], Hi.shape))
    Hn_ref = H * num / jnp.maximum(den, eps)
    np.testing.assert_allclose(np.asarray(Hn), np.asarray(Hn_ref),
                               rtol=1e-5, atol=1e-6)

    Hni = Hn_ref[0:3]
    yh = jnp.maximum(Bs[0] @ Hni, eps)
    pred_ref = jnp.sum(Ys[0] * jnp.log(jnp.maximum(Ys[0] / yh, eps))
                       - Ys[0] + yh)
    np.testing.assert_allclose(float(preds[0]), float(pred_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bnums[0]),
                               np.asarray((Ys[0] / yh) @ Hni.T),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bdens[0]),
                               np.asarray(jnp.sum(Hni, axis=1)),
                               rtol=1e-4)


def test_fused_transform_matches_loop():
    r = np.random.default_rng(2)
    W = jnp.asarray(r.random((G, 11), dtype=np.float32))
    X = jnp.asarray(r.random((G, N), dtype=np.float32))
    H0 = jnp.asarray(r.random((11, N), dtype=np.float32) + 0.1)
    num2 = 2.0 * (W.T @ X)
    WtW2 = 2.0 * (W.T @ W)
    got = pk.fused_transform(num2, H0, WtW2, jnp.float32(EPS), n_iter=12,
                             interpret=True)
    want = H0
    for _ in range(12):
        want = want * (num2 / jnp.maximum(WtW2 @ want, EPS))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("n_cov,loss_kl", [(0, True), (2, True), (2, False)])
def test_pallas_fit_scan_matches_xla(n_cov, loss_kl):
    """The full pallas training path (carried XHt/HHt and B statistics,
    fused H update, fused loss) must reproduce the XLA scan trajectory, for
    both prediction-loss types."""
    X, Ys = _problem()
    if n_cov == 0:
        blocks, n_labels, Ys_use, lam = (6,), (), (), jnp.zeros((0,), jnp.float32)
    else:
        blocks, n_labels, Ys_use = BLOCKS, N_LABELS, Ys
        lam = jnp.asarray([3.0, 1.5], jnp.float32)
    hyper = (lam, jnp.float32(0.2), jnp.float32(0.4), jnp.float32(0.3),
             jnp.float32(EPS))
    key = jax.random.PRNGKey(0)

    cfg_x = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=N,
                        loss_kl=loss_kl, max_iter=15, backend="xla")
    W0, H0, Bs0 = mu.init_matrices(cfg_x, G, key, EPS)
    Wx, Hx, Bsx, Lx = mu.fit_scan(cfg_x, W0, H0, Bs0, X, Ys_use, hyper, key, None)

    cfg_p = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=N,
                        loss_kl=loss_kl, max_iter=15, backend="pallas_interpret")
    Wp, Hp, Bsp, Lp = mu.fit_scan(cfg_p, W0, H0, Bs0, X, Ys_use, hyper, key, None)

    np.testing.assert_allclose(np.asarray(Lx), np.asarray(Lp), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(Wx), np.asarray(Wp), rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Hx), np.asarray(Hp), rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("blocks,n_labels,loss_kl", [
    ((1, 1), (1,), True),          # minimal guided + unguided blocks
    ((1, 1), (1,), False),
    ((2, 3, 4, 5), (2, 5, 3), True),   # three covariates, mixed labels
    ((2, 3, 4, 5), (2, 5, 3), False),
    ((2, 1), (17,), True),         # labels >> K (tall Y/B blocks)
    ((5, 1), (2,), True),          # minimal unguided tail
    ((1, 2, 9), (1, 1), False),    # single-label covariates
], ids=["min-kl", "min-frob", "3cov-kl", "3cov-frob", "tall-y", "tail1",
        "single-label"])
@pytest.mark.slow
def test_pallas_fit_scan_odd_block_structures(blocks, n_labels, loss_kl):
    """The combined-covariate dots (block-embedded Bg, packed stats rows)
    must reproduce the XLA trajectory for edge block structures: k_i=1
    blocks, single-label and many-label covariates, label counts larger
    than K, minimal unguided tails."""
    r = np.random.default_rng(3)
    X = jnp.asarray(r.random((G, N), dtype=np.float32))
    Ys = []
    for nl in n_labels:
        y = np.zeros((nl, N), np.float32)
        y[r.integers(0, nl, N), np.arange(N)] = 1.0
        Ys.append(jnp.asarray(y))
    Ys = tuple(Ys)
    lam = jnp.asarray(r.random(len(n_labels)) + 0.5, jnp.float32)
    hyper = (lam, jnp.float32(0.1), jnp.float32(0.2), jnp.float32(0.3),
             jnp.float32(EPS))
    key = jax.random.PRNGKey(7)

    cfg_x = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=N,
                        loss_kl=loss_kl, max_iter=8, backend="xla")
    W0, H0, Bs0 = mu.init_matrices(cfg_x, G, key, EPS)
    Wx, Hx, Bsx, Lx = mu.fit_scan(cfg_x, W0, H0, Bs0, X, Ys, hyper, key, None)

    cfg_p = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=N,
                        loss_kl=loss_kl, max_iter=8,
                        backend="pallas_interpret")
    Wp, Hp, Bsp, Lp = mu.fit_scan(cfg_p, W0, H0, Bs0, X, Ys, hyper, key, None)

    assert np.isfinite(np.asarray(Lp)).all()
    np.testing.assert_allclose(np.asarray(Lx), np.asarray(Lp), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(Wx), np.asarray(Wp), rtol=5e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(Hx), np.asarray(Hp), rtol=5e-3,
                               atol=1e-5)
    for bx, bp in zip(Bsx, Bsp):
        np.testing.assert_allclose(np.asarray(bx), np.asarray(bp),
                                   rtol=5e-3, atol=1e-5)


def test_pallas_rejects_unsupported_modes():
    cfg = mu.MUConfig(blocks=(4,), n_labels=(), n_cells=N, use_als=True,
                      backend="pallas_interpret", max_iter=2)
    X, _ = _problem()
    key = jax.random.PRNGKey(0)
    W0, H0, Bs0 = mu.init_matrices(cfg, G, key, EPS)
    with pytest.raises(ValueError, match="full-batch joint"):
        mu.fit_scan(cfg, W0, H0, Bs0, X, (),
                    (jnp.zeros((0,)), jnp.float32(0), jnp.float32(0),
                     jnp.float32(0), jnp.float32(EPS)), key, None)


def test_bfloat16_data_mode_close_to_f32():
    """bfloat16 X storage must track the float32 trajectory closely
    (opt-in throughput mode; X quantization is the only difference)."""
    X, Ys = _problem()
    hyper = (jnp.asarray([2.0, 1.0], jnp.float32), jnp.float32(0),
             jnp.float32(0), jnp.float32(0), jnp.float32(EPS))
    key = jax.random.PRNGKey(0)
    out = {}
    for dt in ("float32", "bfloat16"):
        cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                          loss_kl=True, max_iter=20, x_dtype=dt)
        W0, H0, Bs0 = mu.init_matrices(cfg, G, key, EPS)
        out[dt] = mu.fit_scan(cfg, W0, H0, Bs0, X.astype(cfg.xdt), Ys,
                              hyper, key, None)
    L32 = np.asarray(out["float32"][3])
    L16 = np.asarray(out["bfloat16"][3])
    np.testing.assert_allclose(L16, L32, rtol=5e-3)


def test_data_dtype_model_kwarg():
    import pandas as pd
    from alpine_tpu import ALPINE
    from .conftest import make_synthetic_adata

    adata = make_synthetic_adata(n_cells=60, n_genes=20,
                                 covariates=(("batch", 2),))
    m = ALPINE(n_components=5, n_covariate_components=[2], lam=[1.0],
               device="cpu", data_dtype="bfloat16", random_state=0)
    m.fit(adata, ["batch"], max_iter=8)
    assert np.isfinite(m.loss_history.values).all()
    with pytest.raises(ValueError, match="data_dtype"):
        ALPINE(n_components=5, n_covariate_components=[], lam=[],
               data_dtype="fp8")


def test_sharded_pallas_fit_matches_single_device():
    """shard_map + per-shard fused kernels (interpret mode on the virtual
    CPU mesh) must reproduce the single-device trajectory, including the
    ragged-n padding path."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    G2, N2 = 30, 1024  # 1024/4 = 256 per shard (tile multiple)
    r = np.random.default_rng(3)
    X = jnp.asarray(r.random((G2, N2), dtype=np.float32))
    Ys = []
    for nl in N_LABELS:
        y = np.zeros((nl, N2), np.float32)
        y[r.integers(0, nl, N2), np.arange(N2)] = 1.0
        Ys.append(jnp.asarray(y))
    Ys = tuple(Ys)
    hyper = (jnp.asarray([2.0, 1.0], jnp.float32), jnp.float32(0.1),
             jnp.float32(0.2), jnp.float32(0.3), jnp.float32(EPS))
    key = jax.random.PRNGKey(0)
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N2,
                      loss_kl=True, max_iter=8, backend="pallas_interpret")
    W0, H0, Bs0 = mu.init_matrices(cfg, G2, key, EPS)

    Ws, Hs, Bss, Ls = mu.fit_scan(cfg, W0, H0, Bs0, X, Ys, hyper, key, None)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cells",))
    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "cells")))
    rp = lambda a: jax.device_put(a, NamedSharding(mesh, P()))
    Wm, Hm, Bsm, Lm = mu.fit_scan_sharded(
        cfg, mesh, rp(W0), sh(H0), tuple(rp(b) for b in Bs0),
        sh(X), tuple(sh(y) for y in Ys), hyper)

    np.testing.assert_allclose(np.asarray(Ls), np.asarray(Lm), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wm), rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hm), rtol=1e-3,
                               atol=1e-5)


def test_sharded_pallas_unguided():
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    G2, N2 = 20, 1024
    r = np.random.default_rng(5)
    X = jnp.asarray(r.random((G2, N2), dtype=np.float32))
    hyper = (jnp.zeros((0,), jnp.float32), jnp.float32(0), jnp.float32(0),
             jnp.float32(0), jnp.float32(EPS))
    key = jax.random.PRNGKey(1)
    cfg = mu.MUConfig(blocks=(7,), n_labels=(), n_cells=N2, loss_kl=True,
                      max_iter=6, backend="pallas_interpret")
    W0, H0, Bs0 = mu.init_matrices(cfg, G2, key, EPS)
    _, _, _, Ls = mu.fit_scan(cfg, W0, H0, Bs0, X, (), hyper, key, None)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cells",))
    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "cells")))
    rp = lambda a: jax.device_put(a, NamedSharding(mesh, P()))
    _, _, _, Lm = mu.fit_scan_sharded(cfg, mesh, rp(W0), sh(H0), (),
                                      sh(X), (), hyper)
    np.testing.assert_allclose(np.asarray(Ls), np.asarray(Lm), rtol=1e-4)


def test_pad_target_consistency():
    """The single source of padding arithmetic must guarantee that every
    shard of the padded width is divisible by the tile the kernel picks at
    that width (regression: model/kernel tile disagreement crashed sharded
    fits at e.g. 2000 genes, 2 devices, 1025 cells)."""
    from alpine_tpu.ops.pallas_kernels import _choose_tile_n, pad_target

    # (itemsize, cast) covers every storage dtype's exact widths — int16
    # (2, 4), bfloat16 (2, 0), int8 (1, 2), f32 (4, 0) — plus the
    # conservative dtype-less default (None)
    for g in (30, 500, 2000, 11000, 20000):
        for itemsize, cast in ((2, None), (2, 4), (2, 0), (1, 2), (4, None),
                               (4, 0)):
            for K, n_labels in ((None, ()), (40, (2, 3)), (200, (4, 7))):
                for ndev in (1, 2, 4, 8):
                    for n in (128, 300, 1025, 2048, 99999):
                        if n < ndev:
                            continue
                        p = pad_target(g, n, ndev, itemsize, K, n_labels,
                                       cast_itemsize=cast)
                        if p is None:
                            continue
                        W = n + p
                        assert W % ndev == 0
                        s = W // ndev
                        t = _choose_tile_n(g, s, itemsize, K, n_labels,
                                           cast_itemsize=cast)
                        assert s % t == 0, (g, itemsize, cast, K, ndev, n,
                                            s, t)


def test_sharded_fused_transform_matches_scan():
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    r = np.random.default_rng(7)
    g, K2, n = 24, 9, 1000  # ragged across 4 shards (250 each)
    W = jnp.asarray(r.random((g, K2), dtype=np.float32))
    X = jnp.asarray(r.random((g, n), dtype=np.float32))
    H0 = jnp.asarray(r.random((K2, n), dtype=np.float32) + 0.1)
    want = mu.transform_scan(W, X, H0, jnp.float32(EPS), n_iter=15)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cells",))
    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "cells")))
    got = mu.run_transform(jax.device_put(W, NamedSharding(mesh, P())),
                           sh(X), sh(H0), jnp.float32(EPS), n_iter=15,
                           fused=True, mesh=mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-5)


def test_sharded_fused_transform_nondivisible_cells():
    """Cell counts that don't divide the mesh must pad-and-slice, not crash
    (round-1 advisor finding: shard_map divisibility ValueError)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    r = np.random.default_rng(11)
    g, K2, n = 16, 7, 997  # 997 % 8 != 0
    W = jnp.asarray(r.random((g, K2), dtype=np.float32))
    X = jnp.asarray(r.random((g, n), dtype=np.float32))
    H0 = jnp.asarray(r.random((K2, n), dtype=np.float32) + 0.1)
    want = mu.transform_scan(W, X, H0, jnp.float32(EPS), n_iter=10)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("cells",))
    # uncommitted inputs: run_transform pads to the mesh in-jit and slices back
    got = mu.run_transform(W, X, H0, jnp.float32(EPS), n_iter=10,
                           fused=True, mesh=mesh, interpret=True)
    assert got.shape == (K2, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-5)


def test_pallas_kl_pred_pad_bias_removed():
    """The padded cell axis must NOT bias the KL prediction loss: with a
    large eps any residual clamp(B@0,eps)=eps-per-pad-column bias would be
    glaring.  Run two iterations pallas-vs-xla and compare the prediction
    columns tightly (round-1 verdict item: loss_history must be
    backend-invariant)."""
    import numpy as np

    X, Ys = _problem(seed=9)
    big_eps = 1e-2  # bias, if present, would be n_labels * n_pad * 1e-2
    hyper = (jnp.asarray([3.0, 1.5], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(big_eps))
    key = jax.random.PRNGKey(3)

    cfg_x = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                        loss_kl=True, max_iter=2, backend="xla")
    W0, H0, Bs0 = mu.init_matrices(cfg_x, G, key, big_eps)
    *_, Lx = mu.fit_scan(cfg_x, W0, H0, Bs0, X, Ys, hyper, key, None)

    cfg_p = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                        loss_kl=True, max_iter=2, backend="pallas_interpret")
    *_, Lp = mu.fit_scan(cfg_p, W0, H0, Bs0, X, Ys, hyper, key, None)

    # prediction columns (index 2:) must agree at float32 accumulation
    # accuracy, far below the would-be bias of ~n_pad * 1e-2
    np.testing.assert_allclose(np.asarray(Lx)[:, 2:], np.asarray(Lp)[:, 2:],
                               rtol=2e-5)


def test_sharded_pallas_int8_matches_single_device():
    """int8 X through the sharded fused-kernel path (per-shard in-VMEM
    dequant + psums) must reproduce the single-device int8 trajectory."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    G2, N2 = 30, 1024
    r = np.random.default_rng(9)
    X = jnp.asarray(r.poisson(2.0, (G2, N2)).clip(0, 127).astype(np.int8))
    Ys = []
    for nl in N_LABELS:
        y = np.zeros((nl, N2), np.float32)
        y[r.integers(0, nl, N2), np.arange(N2)] = 1.0
        Ys.append(jnp.asarray(y))
    Ys = tuple(Ys)
    hyper = (jnp.asarray([2.0, 1.0], jnp.float32), jnp.float32(0.1),
             jnp.float32(0.2), jnp.float32(0.3), jnp.float32(EPS))
    key = jax.random.PRNGKey(0)
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N2,
                      loss_kl=True, max_iter=8, x_dtype="int8",
                      backend="pallas_interpret")
    W0, H0, Bs0 = mu.init_matrices(cfg, G2, key, EPS)

    Ws, Hs, Bss, Ls = mu.fit_scan(cfg, W0, H0, Bs0, X, Ys, hyper, key, None)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cells",))
    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "cells")))
    rp = lambda a: jax.device_put(a, NamedSharding(mesh, P()))
    Wm, Hm, Bsm, Lm = mu.fit_scan_sharded(
        cfg, mesh, rp(W0), sh(H0), tuple(rp(b) for b in Bs0),
        sh(X), tuple(sh(y) for y in Ys), hyper)

    # int8 computes in bfloat16, so per-shard partial sums vs the single
    # program's reduction order diverge at bf16 rounding over the
    # trajectory (measured ~2e-4 after the transposed-XHt0 reordering)
    np.testing.assert_allclose(np.asarray(Ls), np.asarray(Lm), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wm), rtol=1e-3,
                               atol=1e-6)


def test_fused_kernel_gate_uses_storage_itemsize():
    """Narrow X storage fits 2-4x more genes in the X-tile budget, and the
    legacy (K-less) gate must use the STORAGE itemsize.  With K given, the
    working-set gate now also accepts f32 at whole-transcriptome scale by
    stepping the tile down to a single lane (round-2 verdict item 3)."""
    g = 20_000  # whole-transcriptome scale
    assert pk._max_tile(g, 4) is None       # legacy X-budget-only gate
    assert pk._max_tile(g, 2) is not None
    assert pk._max_tile(g, 1) is not None
    # shape-aware gate: f32 g=20k fits at tile=128 even at K=200
    assert pk._max_tile(g, 4, K=200, n_labels=(4, 7)) == 128
    if pk.pltpu is not None:
        assert pk.h_update_supported(g, 1)
        assert pk.h_update_supported(g, 4, 200, (4, 7))


def test_bf16_gate_not_charged_phantom_dequant_copy():
    """2-byte storage is ambiguous: int16 makes a real 4-byte in-VMEM
    dequant copy, bfloat16 none.  Callers that know the dtype pass the
    exact cast width (mu.x_cast_itemsize) so large-gene bf16 shapes near
    the VMEM cap keep the fused kernel; bare-itemsize callers keep the
    conservative (int16) answer."""
    from alpine_tpu.ops import mu

    g, K = 34_000, 160
    if pk.pltpu is not None:
        # int16's real copy puts this shape over budget ...
        assert not pk.h_update_supported(g, 2, K, (), cast_itemsize=4)
        # ... bfloat16 (no copy) keeps the kernel ...
        assert pk.h_update_supported(g, 2, K, (), cast_itemsize=0)
        # ... and dtype-less callers stay conservative
        assert not pk.h_update_supported(g, 2, K, ())
    # exact widths come from ONE name-keyed mapping
    assert mu.x_cast_itemsize("int8") == 2
    assert mu.x_cast_itemsize("int16") == 4
    assert mu.x_cast_itemsize("bfloat16") == 0
    assert mu.x_cast_itemsize("float32") == 0
    # gate arithmetic agrees with the kernels' dtype-derived widths
    import jax.numpy as jnp

    for name in ("int8", "int16", "bfloat16", "float32"):
        assert (pk._cast_itemsize_for_dtype(jnp.dtype(mu.x_storage_dtype(name)))
                == mu.x_cast_itemsize(name))


def test_working_set_gate_rejects_oversized_shapes():
    """Shapes whose grid-invariant blocks (W + XHt at f32) alone exceed the
    scoped VMEM limit must be rejected BY THE GATE — the round-2 gap was a
    Mosaic compile failure (or hang) past an X-only check."""
    g = 20_000
    # fixed blocks at K=2000: 2*g*K*4 = 320 MB >> the 64 MB limit
    assert pk._max_tile(g, 4, K=2000, n_labels=(4, 7)) is None
    if pk.pltpu is not None:
        assert not pk.h_update_supported(g, 4, 2000, (4, 7))

    # the model layer must fall back to XLA cleanly for such shapes (and
    # still pick the kernel for supported ones) — simulate the TPU branch
    if pk.pltpu is None:
        return
    from alpine_tpu import ALPINE

    Ys_shapes = [np.zeros((4, 64), np.float32), np.zeros((7, 64), np.float32)]

    def make(n_comp, n_genes):
        m = ALPINE(n_components=n_comp, n_covariate_components=[4, 6],
                   lam=[1.0, 1.0], device="cpu", random_state=0,
                   data_dtype="float32")
        m.n_features = n_genes
        m.batch_size = 64
        m.sampling_method = "random"
        m._use_tpu_kernels = lambda: True
        return m

    cfg = make(1990, 20_000)._make_cfg(Ys_shapes, 64, 3)
    assert cfg.backend == "xla"  # working set over budget -> clean fallback
    cfg = make(190, 20_000)._make_cfg(Ys_shapes, 64, 3)
    assert cfg.backend == "pallas"  # f32 g=20k now KEEPS the fused kernel


def test_working_set_accounting_is_monotone_and_covers_fixed_blocks():
    ws = pk.working_set_bytes
    # monotone in tile
    assert ws(2000, 40, 256, 2, (2, 3)) > ws(2000, 40, 128, 2, (2, 3))
    # fixed blocks dominate at large K: W + XHt = 2*g*K*4
    base = ws(20_000, 200, 128, 4, ())
    assert base > 2 * 20_000 * 200 * 4


def test_min_lane_tile_interpret_parity():
    """When the X-tile budget would demand a sub-lane tile (large genes),
    the kernel now runs at the 128-lane minimum; interpret-mode trajectory
    must still match XLA exactly as before."""
    import alpine_tpu.ops.pallas_kernels as pkm

    old = pkm._X_TILE_BYTES
    pkm._X_TILE_BYTES = 64 * 1024  # force base < 128 lanes at g=300 f32
    try:
        g, n = 300, 256
        assert pkm._max_tile(g, 4) is None  # legacy gate would reject
        assert pkm._max_tile(g, 4, K=15, n_labels=(2, 3)) == 128
        r = np.random.default_rng(5)
        X = jnp.asarray(r.random((g, n), dtype=np.float32))
        Ys = []
        for nl in (2, 3):
            y = np.zeros((nl, n), np.float32)
            y[r.integers(0, nl, n), np.arange(n)] = 1.0
            Ys.append(jnp.asarray(y))
        Ys = tuple(Ys)
        hyper = (jnp.asarray([1.0, 2.0], jnp.float32), jnp.float32(0.1),
                 jnp.float32(0.1), jnp.float32(0.2), jnp.float32(EPS))
        key = jax.random.PRNGKey(0)
        out = {}
        for backend in ("pallas_interpret", "xla"):
            cfg = mu.MUConfig(blocks=(4, 5, 6), n_labels=(2, 3), n_cells=n,
                              loss_kl=True, max_iter=5, backend=backend)
            W0, H0, Bs0 = mu.init_matrices(cfg, g, key, EPS)
            out[backend] = mu.fit_scan(cfg, W0, H0, Bs0, X, Ys, hyper, key,
                                       None)
        np.testing.assert_allclose(
            np.asarray(out["pallas_interpret"][3]),
            np.asarray(out["xla"][3]), rtol=2e-4,
        )
    finally:
        pkm._X_TILE_BYTES = old
