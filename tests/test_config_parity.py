"""Behavioral parity per BASELINE.md config (SURVEY.md §4.2): the FULL
model-level pipeline (encoding, init, training, scaling, loss history) must
match an end-to-end numpy-oracle replication of the reference semantics.

The oracle pipeline reuses only our RNG draws for initialization (RNG parity
with torch is impossible by design — SURVEY §7 hard part 1); everything
downstream is the literal reference math in float64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpine_tpu import ALPINE
from alpine_tpu.ops import mu
from alpine_tpu.utils.encoder import FeatureEncoders

from .conftest import make_synthetic_adata
from .oracle import oracle_als_step, oracle_joint_step, oracle_loss


def _oracle_pipeline(adata, covariate_keys, *, blocks, lam, orth_w, alpha_w,
                     l1, eps, loss_kl, use_als, max_iter, scale, seed):
    """Replicates ALPINE.fit end-to-end with oracle math (reference
    main.py:82-147): encode, init (shared draws), MU loop, scaling."""
    X = adata.X.astype(np.float32).T
    fe = FeatureEncoders(covariate_keys)
    Ys = [y.T for y in fe.fit_transform(adata.obs)]
    n = X.shape[1]
    n_cov = len(covariate_keys)

    cfg = mu.MUConfig(blocks=tuple(blocks),
                      n_labels=tuple(y.shape[0] for y in Ys), n_cells=n,
                      loss_kl=loss_kl, use_als=use_als)
    key = jax.random.PRNGKey(seed)
    init_key, _ = jax.random.split(key)
    W0, H0, Bs0 = mu.init_matrices(cfg, X.shape[0], init_key, eps)

    # split into per-block lists for the oracle
    Ws, Hs, o = [], [], 0
    W0n, H0n = np.asarray(W0, np.float64), np.asarray(H0, np.float64)
    for k in blocks:
        Ws.append(W0n[:, o:o + k].copy())
        Hs.append(H0n[o:o + k].copy())
        o += k
    Bs = [np.asarray(b, np.float64) for b in Bs0]

    step = oracle_als_step if use_als else oracle_joint_step
    history = []
    for _ in range(max_iter):
        Ws, Hs, Bs = step(Ws, Hs, Bs, X, Ys, lam, orth_w, alpha_w, l1, eps,
                          loss_kl)
        history.append(oracle_loss(Ws, Hs, Bs, X, Ys, lam, eps, loss_kl))

    if scale:  # reference _scale_matrices (main.py:772-781)
        for i in range(len(Ws)):
            s = Ws[i].sum(axis=0)
            Ws[i] = Ws[i] / s
            Hs[i] = Hs[i] * s[:, None]
            if i < n_cov:
                Bs[i] = Bs[i] / s
    return np.asarray(history), Ws, Hs, Bs


CONFIGS = [
    # (name, covariates, model kwargs)  — BASELINE.md configs 1-3 downscaled
    ("config1_unguided_frobenius", (),
     dict(n_components=12, n_covariate_components=[], lam=[],
          loss_type="frobenius")),
    ("config2_single_covariate_kl", (("batch", 2),),
     dict(n_components=10, n_covariate_components=[3], lam=[1e3])),
    ("config3_multi_covariate_regularized", (("batch", 2), ("condition", 3)),
     dict(n_components=10, n_covariate_components=[3, 4], lam=[1e3, 1e3],
          orth_W=0.5, alpha_W=1.0, l1_ratio_W=0.3)),
]


@pytest.mark.parametrize("name,covs,kwargs", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_pipeline_matches_oracle(name, covs, kwargs):
    adata = make_synthetic_adata(n_cells=80, n_genes=30, covariates=covs,
                                 seed=17)
    keys = [c[0] for c in covs]
    model = ALPINE(device="cpu", random_state=7, **kwargs)
    model.fit(adata, keys, max_iter=12)

    history, Ws, Hs, Bs = _oracle_pipeline(
        adata, keys,
        blocks=kwargs["n_covariate_components"] + [kwargs["n_components"]],
        lam=kwargs["lam"],
        orth_w=kwargs.get("orth_W", 0.0),
        alpha_w=kwargs.get("alpha_W", 0.0),
        l1=kwargs.get("l1_ratio_W", 0.0),
        eps=1e-6,
        loss_kl=(kwargs.get("loss_type", "kl-divergence") == "kl-divergence"),
        use_als=False, max_iter=12, scale=True, seed=7,
    )

    # loss-history parity (total + recon + preds), the BASELINE gate
    np.testing.assert_allclose(model.loss_history.values, history, rtol=1e-4)

    # final factor parity after scaling
    for i in range(len(Ws)):
        np.testing.assert_allclose(model.matrices["Ws"][i], Ws[i],
                                   rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(model.matrices["Hs"][i], Hs[i],
                                   rtol=2e-3, atol=1e-5)
    for i in range(len(Bs)):
        np.testing.assert_allclose(model.matrices["Bs"][i], Bs[i],
                                   rtol=2e-3, atol=1e-6)


def test_als_pipeline_matches_oracle():
    covs = (("batch", 2),)
    adata = make_synthetic_adata(n_cells=60, n_genes=25, covariates=covs,
                                 seed=19)
    model = ALPINE(n_components=8, n_covariate_components=[2], lam=[50.0],
                   use_als=True, loss_type="frobenius", device="cpu",
                   random_state=3)
    model.fit(adata, ["batch"], max_iter=10)

    history, *_ = _oracle_pipeline(
        adata, ["batch"], blocks=[2, 8], lam=[50.0], orth_w=0.0, alpha_w=0.0,
        l1=0.0, eps=1e-6, loss_kl=False, use_als=True, max_iter=10,
        scale=True, seed=3,
    )
    np.testing.assert_allclose(model.loss_history.values, history, rtol=1e-4)
