"""Semantic-exactness gate: run the jitted engine in float64 and compare to
the float64 numpy oracle.  Passing at ~1e-12 proves the update MATH is
identical to the reference transcription — the f32 production tolerances in
test_mu_math.py are then purely rounding, not semantics (BASELINE.md's
"loss trajectories within 1e-5 of reference semantics")."""

import jax
import numpy as np
import pytest

from alpine_tpu.ops import mu

from .oracle import _cat_h, _cat_w, oracle_joint_step, oracle_als_step, oracle_loss

BLOCKS = (3, 4, 6)
N_LABELS = (2, 3)
G, N = 20, 35
EPS = 1e-6


@pytest.mark.parametrize("use_als,loss_kl", [(False, True), (False, False),
                                             (True, True), (True, False)])
def test_f64_trajectory_exact(use_als, loss_kl):
    import jax.numpy as jnp

    r = np.random.default_rng(0)
    X = r.random((G, N)) * 2
    Ys = []
    for nl in N_LABELS:
        y = np.zeros((nl, N))
        y[r.integers(0, nl, N), np.arange(N)] = 1.0
        Ys.append(y)
    Ws = [r.random((G, k)) + 0.1 for k in BLOCKS]
    Hs = [r.random((k, N)) + 0.1 for k in BLOCKS]
    Bs = [r.random((nl, k)) + 0.1 for nl, k in zip(N_LABELS, BLOCKS)]
    lam = [2.0, 0.5]
    hp_np = dict(lam=lam, orth_w=0.3, alpha_w=0.7, l1=0.4, eps=EPS)

    with jax.enable_x64(True):
        cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                          loss_kl=loss_kl, use_als=use_als, x_dtype="float64")
        hyper = (jnp.asarray(lam, jnp.float64), jnp.float64(0.3),
                 jnp.float64(0.7), jnp.float64(0.4), jnp.float64(EPS))
        W = jnp.asarray(_cat_w(Ws))
        H = jnp.asarray(_cat_h(Hs))
        Bs_d = tuple(jnp.asarray(b) for b in Bs)
        Xd = jnp.asarray(X)
        Ys_d = tuple(jnp.asarray(y) for y in Ys)

        update = mu.als_batch_update if use_als else mu.joint_batch_update
        oracle = oracle_als_step if use_als else oracle_joint_step
        oWs, oHs, oBs = Ws, Hs, Bs
        for step in range(10):
            W, Bs_d, H, _ = update(cfg, hyper, W, Bs_d, H, Xd, Ys_d)
            oWs, oHs, oBs = oracle(oWs, oHs, oBs, X, Ys, lam, 0.3, 0.7, 0.4,
                                   EPS, loss_kl)
        np.testing.assert_allclose(np.asarray(W), _cat_w(oWs), rtol=1e-11)
        np.testing.assert_allclose(np.asarray(H), _cat_h(oHs), rtol=1e-11)
        for b, ob in zip(Bs_d, oBs):
            np.testing.assert_allclose(np.asarray(b), ob, rtol=1e-11)

        # loss, too
        normX2 = jnp.sum(Xd * Xd)
        got = np.asarray(mu.compute_loss_parts(cfg, hyper, W, H, Bs_d, Xd,
                                               Ys_d, normX2))
        want = oracle_loss(oWs, oHs, oBs, X, Ys, lam, EPS, loss_kl)
        np.testing.assert_allclose(got, want, rtol=1e-9)
