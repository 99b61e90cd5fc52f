"""Math-level parity of the jitted MU core against a float64 numpy oracle that
literally transcribes the reference equations (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpine_tpu.ops import mu

from .oracle import (
    oracle_als_step,
    oracle_joint_step,
    oracle_loss,
    _cat_h,
    _cat_w,
    _split_h,
    _split_w,
)

BLOCKS = (3, 4, 6)
N_LABELS = (2, 3)
G, N = 25, 40
EPS = 1e-6


def _random_problem(seed=0, n=N):
    r = np.random.default_rng(seed)
    X = r.random((G, n)).astype(np.float32) * 3
    Ys = []
    for nl in N_LABELS:
        y = np.zeros((nl, n), np.float32)
        y[r.integers(0, nl, n), np.arange(n)] = 1.0
        Ys.append(y)
    Ws = [r.random((G, k)).astype(np.float32) + 0.1 for k in BLOCKS]
    Hs = [r.random((k, n)).astype(np.float32) + 0.1 for k in BLOCKS]
    Bs = [r.random((nl, k)).astype(np.float32) + 0.1 for nl, k in zip(N_LABELS, BLOCKS)]
    return X, Ys, Ws, Hs, Bs


def _to_device(Ws, Hs, Bs):
    W = jnp.asarray(_cat_w(Ws).astype(np.float32))
    H = jnp.asarray(_cat_h(Hs).astype(np.float32))
    Bs = tuple(jnp.asarray(b) for b in Bs)
    return W, H, Bs


HYPER_CASES = [
    dict(lam=[1.0, 2.0], orth_w=0.0, alpha_w=0.0, l1=0.0),
    dict(lam=[10.0, 0.5], orth_w=0.3, alpha_w=0.7, l1=0.4),
    dict(lam=[0.0, 0.0], orth_w=1.0, alpha_w=2.0, l1=1.0),
]


@pytest.mark.parametrize("loss_kl", [True, False])
@pytest.mark.parametrize("hyper_case", HYPER_CASES)
@pytest.mark.parametrize("use_als", [False, True])
def test_batch_update_matches_oracle(loss_kl, hyper_case, use_als):
    X, Ys, Ws, Hs, Bs = _random_problem()
    lam = hyper_case["lam"]
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                      loss_kl=loss_kl, use_als=use_als)
    hyper = (
        jnp.asarray(lam, jnp.float32),
        jnp.float32(hyper_case["orth_w"]),
        jnp.float32(hyper_case["alpha_w"]),
        jnp.float32(hyper_case["l1"]),
        jnp.float32(EPS),
    )
    W, H, Bs_d = _to_device(Ws, Hs, Bs)
    update = mu.als_batch_update if use_als else mu.joint_batch_update
    Wn, Bsn, Hn, _ = update(cfg, hyper, W, Bs_d, H,
                            jnp.asarray(X), tuple(jnp.asarray(y) for y in Ys))

    step = oracle_als_step if use_als else oracle_joint_step
    Wo, Ho, Bo = step(Ws, Hs, Bs, X, Ys, lam,
                      hyper_case["orth_w"], hyper_case["alpha_w"],
                      hyper_case["l1"], EPS, loss_kl)

    np.testing.assert_allclose(np.asarray(Wn), _cat_w(Wo), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Hn), _cat_h(Ho), rtol=2e-4, atol=1e-6)
    for b_new, b_oracle in zip(Bsn, Bo):
        np.testing.assert_allclose(np.asarray(b_new), b_oracle, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("loss_kl", [True, False])
def test_loss_matches_oracle(loss_kl):
    X, Ys, Ws, Hs, Bs = _random_problem(seed=3)
    lam = [1.5, 3.0]
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N, loss_kl=loss_kl)
    hyper = (jnp.asarray(lam, jnp.float32), jnp.float32(0), jnp.float32(0),
             jnp.float32(0), jnp.float32(EPS))
    W, H, Bs_d = _to_device(Ws, Hs, Bs)
    Xd = jnp.asarray(X)
    got = np.asarray(
        mu.compute_loss_parts(cfg, hyper, W, H, Bs_d, Xd,
                              tuple(jnp.asarray(y) for y in Ys), jnp.sum(Xd * Xd))
    )
    want = oracle_loss(Ws, Hs, Bs, X, Ys, lam, EPS, loss_kl)
    # the trace-identity recon incurs fp32 cancellation; compare relative
    np.testing.assert_allclose(got, want, rtol=5e-4)


@pytest.mark.parametrize("use_als,loss_kl", [(False, True), (False, False),
                                             (True, True), (True, False)])
def test_full_batch_loss_monotone(use_als, loss_kl):
    """Full-batch MU must not increase the objective (classic NMF guarantee;
    SURVEY.md §4.1)."""
    X, Ys, Ws, Hs, Bs = _random_problem(seed=1)
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                      loss_kl=loss_kl, use_als=use_als, max_iter=50)
    hyper = (jnp.asarray([1.0, 2.0], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(EPS))
    W, H, Bs_d = _to_device(Ws, Hs, Bs)
    *_, losses = mu.fit_scan(cfg, W, H, Bs_d, jnp.asarray(X),
                             tuple(jnp.asarray(y) for y in Ys), hyper,
                             jax.random.PRNGKey(0), None)
    tot = np.asarray(losses[:, 0])
    assert np.all(np.diff(tot) <= 1e-4 * np.abs(tot[:-1]) + 1e-4), tot


def test_fixed_point():
    """At an exact factorization with exact label fit and no regularizers,
    the MU ratio is ~1 and the state barely moves."""
    r = np.random.default_rng(5)
    Ws = [r.random((G, k)).astype(np.float32) + 0.5 for k in BLOCKS]
    Hs = [r.random((k, N)).astype(np.float32) + 0.5 for k in BLOCKS]
    Bs = [r.random((nl, k)).astype(np.float32) + 0.5 for nl, k in zip(N_LABELS, BLOCKS)]
    X = _cat_w(Ws) @ _cat_h(Hs)
    Ys = [Bs[i] @ Hs[i] for i in range(2)]  # exact prediction targets

    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N, loss_kl=False)
    hyper = (jnp.asarray([1.0, 1.0], jnp.float32), jnp.float32(0), jnp.float32(0),
             jnp.float32(0), jnp.float32(EPS))
    W, H, Bs_d = _to_device(Ws, Hs, Bs)
    Wn, Bsn, Hn, _ = mu.joint_batch_update(
        cfg, hyper, W, Bs_d, H, jnp.asarray(X.astype(np.float32)),
        tuple(jnp.asarray(y.astype(np.float32)) for y in Ys))
    np.testing.assert_allclose(np.asarray(Wn), np.asarray(W), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Hn), np.asarray(H), rtol=1e-4)


def test_minibatch_scan_matches_oracle_loop():
    """Drive the float64 oracle with the exact same per-iteration permutations
    the jitted scan uses; trajectories must agree."""
    n, bs, iters = 37, 10, 3  # deliberately non-divisible for the padding path
    X, Ys, Ws, Hs, Bs = _random_problem(seed=7, n=n)
    lam = [1.0, 2.0]
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                      loss_kl=True, batch_size=bs, max_iter=iters)
    hyper = (jnp.asarray(lam, jnp.float32), jnp.float32(0.2), jnp.float32(0.1),
             jnp.float32(0.5), jnp.float32(EPS))
    W, H, Bs_d = _to_device(Ws, Hs, Bs)
    key = jax.random.PRNGKey(11)
    Wn, Hn, Bsn, _ = mu.fit_scan(cfg, W, H, Bs_d, jnp.asarray(X),
                                 tuple(jnp.asarray(y) for y in Ys), hyper, key, None)

    # replicate on the oracle
    oWs = [w.copy() for w in Ws]
    oHs = [h.copy() for h in Hs]
    oBs = [b.copy() for b in Bs]
    keys = jax.random.split(key, iters)
    for it in range(iters):
        perm = np.asarray(jax.random.permutation(keys[it], n))
        for b0 in range(0, n, bs):
            idx = perm[b0:b0 + bs]
            X_b = X[:, idx]
            Ys_b = [y[:, idx] for y in Ys]
            Hs_b = [h[:, idx] for h in oHs]
            oWs, Hs_b, oBs = oracle_joint_step(
                oWs, Hs_b, oBs, X_b, Ys_b, lam, 0.2, 0.1, 0.5, EPS, True)
            for j in range(len(oHs)):
                oHs[j][:, idx] = Hs_b[j]

    np.testing.assert_allclose(np.asarray(Wn), _cat_w(oWs), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Hn), _cat_h(oHs), rtol=5e-4, atol=1e-5)


def test_scale_matrices_invariance():
    """W@H and each B@H_i are invariant under _scale_matrices
    (reference main.py:772-781); W columns sum to 1 afterwards."""
    X, Ys, Ws, Hs, Bs = _random_problem(seed=9)
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N)
    W, H, Bs_d = _to_device(Ws, Hs, Bs)
    Wn, Hn, Bsn = mu.scale_matrices(cfg, W, H, Bs_d)
    np.testing.assert_allclose(np.asarray(Wn @ Hn), np.asarray(W @ H), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Wn).sum(0), 1.0, rtol=1e-5)
    for i, (o, k) in enumerate(zip(cfg.offsets[:2], cfg.blocks[:2])):
        np.testing.assert_allclose(np.asarray(Bsn[i] @ Hn[o:o + k]),
                                   np.asarray(Bs_d[i] @ H[o:o + k]), rtol=1e-4)


def test_transform_matches_reference_recurrence():
    """transform_scan == the reference's literal H *= 2WᵀX / clamp(2Wᵀ(WH))
    loop (main.py:705-709), with numerator/WᵀW hoisting being exact."""
    r = np.random.default_rng(13)
    W = r.random((G, sum(BLOCKS))).astype(np.float32)
    X = r.random((G, N)).astype(np.float32)
    H0 = r.random((sum(BLOCKS), N)).astype(np.float32)
    got = np.asarray(mu.transform_scan(jnp.asarray(W), jnp.asarray(X),
                                       jnp.asarray(H0), jnp.float32(EPS), n_iter=25))
    H = H0.astype(np.float64)
    W64, X64 = W.astype(np.float64), X.astype(np.float64)
    for _ in range(25):
        num = 2 * W64.T @ X64
        den = np.maximum(2 * W64.T @ (W64 @ H), EPS)
        H = H * num / den
    np.testing.assert_allclose(got, H, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("trial", [0, 1, 2,
                                   pytest.param(3, marks=pytest.mark.slow),
                                   pytest.param(4, marks=pytest.mark.slow)])
def test_fuzz_random_configs_match_oracle(trial):
    """Randomized block structures, label counts, hyperparameters, and loss
    types: every sampled configuration's batch update must match the
    float64 oracle."""
    r = np.random.default_rng(1000 + trial)
    n_cov = int(r.integers(0, 4))
    blocks = tuple(int(r.integers(1, 7)) for _ in range(n_cov)) + (
        int(r.integers(2, 12)),)
    n_labels = tuple(int(r.integers(1, 6)) for _ in range(n_cov))
    g = int(r.integers(5, 40))
    n = int(r.integers(8, 60))
    loss_kl = bool(r.integers(0, 2))
    use_als = bool(r.integers(0, 2))
    lam = [float(x) for x in r.random(n_cov) * 100]
    orth_w, alpha_w = float(r.random() * 2), float(r.random() * 3)
    l1 = float(r.random())

    X = r.random((g, n)).astype(np.float32) * 5
    Ys = []
    for nl in n_labels:
        y = np.zeros((nl, n), np.float32)
        y[r.integers(0, nl, n), np.arange(n)] = 1.0
        Ys.append(y)
    Ws = [r.random((g, k)).astype(np.float32) + 0.05 for k in blocks]
    Hs = [r.random((k, n)).astype(np.float32) + 0.05 for k in blocks]
    Bs = [r.random((nl, k)).astype(np.float32) + 0.05
          for nl, k in zip(n_labels, blocks)]

    cfg = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=n,
                      loss_kl=loss_kl, use_als=use_als)
    hyper = (jnp.asarray(lam, jnp.float32), jnp.float32(orth_w),
             jnp.float32(alpha_w), jnp.float32(l1), jnp.float32(EPS))
    W = jnp.asarray(_cat_w(Ws)) if Ws else jnp.zeros((g, 0))
    H = jnp.asarray(_cat_h(Hs))
    update = mu.als_batch_update if use_als else mu.joint_batch_update
    Wn, Bsn, Hn, _ = update(cfg, hyper, W, tuple(jnp.asarray(b) for b in Bs),
                            H, jnp.asarray(X), tuple(jnp.asarray(y) for y in Ys))

    step = oracle_als_step if use_als else oracle_joint_step
    Wo, Ho, Bo = step(Ws, Hs, Bs, X, Ys, lam, orth_w, alpha_w, l1, EPS, loss_kl)
    np.testing.assert_allclose(np.asarray(Wn), _cat_w(Wo), rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Hn), _cat_h(Ho), rtol=5e-4, atol=1e-6)
    for b_new, b_oracle in zip(Bsn, Bo):
        np.testing.assert_allclose(np.asarray(b_new), b_oracle,
                                   rtol=5e-4, atol=1e-6)
