"""Integration-quality test: on data with a strong, plantable batch effect,
the optimizer's score must clearly separate good hyperparameters (large lam
-> covariate captured by the guided block -> unguided embedding clean) from
bad ones (lam ~ 0 -> batch leaks into the unguided embedding)."""

import numpy as np
import pandas as pd
import pytest

from alpine_tpu import ComponentOptimizer
from alpine_tpu.utils.adata import AnnData


def _batch_effect_adata(n=240, g=60, seed=0):
    r = np.random.default_rng(seed)
    k = 5
    W = r.gamma(2.0, 1.0, (g, k))
    H = r.gamma(2.0, 1.0, (k, n))
    X = W @ H
    batch = r.integers(0, 2, n)
    # strong additive batch signature on half the genes
    sig = np.zeros((g, 1))
    sig[: g // 2] = 6.0
    X = X + sig @ batch[None, :].astype(float)
    X = (X + r.random((g, n))).astype(np.float32).T
    obs = pd.DataFrame(
        {"batch": np.array([f"b{b}" for b in batch], dtype=object)},
        index=[f"c{i}" for i in range(n)],
    )
    return AnnData(X, obs=obs)


def test_score_separates_lam_regimes():
    adata = _batch_effect_adata()
    co = ComponentOptimizer(adata, ["batch"], max_iter=40, device="cpu",
                            random_state=0)
    co.n_splits = 3
    co.iter_records = []

    base = {"n_components": 8, "n_covariate_components": [2],
            "orth_W": 0.0, "alpha_W": 0.0, "l1_ratio_W": 0.0}
    score_high = co.calc_score({**base, "lam": [1e4]})
    score_zero = co.calc_score({**base, "lam": [1e-3]})
    # lower score = less covariate leakage = better (optimization.py:216)
    assert score_high < score_zero, (score_high, score_zero)
    assert score_zero > 0.25  # leakage is actually detected
