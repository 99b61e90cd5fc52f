"""Odd-but-legal configuration matrix (found bugs in round 2: ragged mesh
full-batch/ALS crashes, NaN stratification): every combination must fit,
transform, and produce finite losses.  Single-device half of the fuzz
harness; the mesh half lives in test_sharding.py."""

import numpy as np
import pandas as pd
import pytest

from alpine_tpu import ALPINE
from alpine_tpu.utils.adata import AnnData


def _data(n, g, n_cov=1, levels=2, na=0.0, seed=0, integer=False):
    r = np.random.default_rng(seed)
    X = (r.gamma(2.0, 1.0, (g, 3)) @ r.gamma(2.0, 1.0, (3, n))
         + r.random((g, n))).astype(np.float32).T
    if integer:  # int data_dtype modes require count data
        X = np.floor(X).clip(0, 127)
    obs = pd.DataFrame(index=[f"c{i}" for i in range(n)])
    keys = []
    for j in range(n_cov):
        lab = np.array([f"l{v}" for v in r.integers(0, levels, n)], dtype=object)
        if na:
            lab[r.random(n) < na] = None
        obs[f"cov{j}"] = lab
        keys.append(f"cov{j}")
    return AnnData(X, obs=obs), keys


CASES = [
    ("k1_unguided", dict(n_components=1, n_covariate_components=[2], lam=[1.0]),
     dict(max_iter=3), dict(n=30, g=10)),
    ("k1_cov", dict(n_components=4, n_covariate_components=[1], lam=[1.0]),
     dict(max_iter=3), dict(n=30, g=10)),
    ("single_level_cov", dict(n_components=4, n_covariate_components=[2], lam=[1.0]),
     dict(max_iter=3), dict(n=30, g=10, levels=1)),
    ("many_labels", dict(n_components=4, n_covariate_components=[3], lam=[1.0]),
     dict(max_iter=3), dict(n=60, g=10, levels=20)),
    ("heavy_nan", dict(n_components=4, n_covariate_components=[2], lam=[1.0]),
     dict(max_iter=3), dict(n=50, g=10, na=0.8)),
    ("batch_size_1", dict(n_components=3, n_covariate_components=[2], lam=[1.0]),
     dict(max_iter=2, batch_size=1), dict(n=12, g=8)),
    ("weighted_near_full", dict(n_components=3, n_covariate_components=[2], lam=[1.0]),
     dict(max_iter=2, batch_size=11, sampling_method="weighted"), dict(n=12, g=8)),
    ("three_cov_frob_als",
     dict(n_components=5, n_covariate_components=[2, 2, 2], lam=[1.0, 1.0, 1.0],
          loss_type="frobenius", use_als=True),
     dict(max_iter=3), dict(n=40, g=12, n_cov=3)),
    ("bucket_minibatch",
     dict(n_components=5, n_covariate_components=[2], lam=[1.0], component_bucket=8),
     dict(max_iter=3, batch_size=16), dict(n=40, g=12)),
    ("bucket_als",
     dict(n_components=5, n_covariate_components=[2], lam=[1.0],
          component_bucket=8, use_als=True),
     dict(max_iter=3), dict(n=40, g=12)),
    ("bucket_weighted",
     dict(n_components=5, n_covariate_components=[2], lam=[1.0], component_bucket=8),
     dict(max_iter=3, batch_size=16, sampling_method="weighted"), dict(n=40, g=12)),
    ("huge_eps", dict(n_components=3, n_covariate_components=[2], lam=[1.0], eps=0.5),
     dict(max_iter=3), dict(n=20, g=8)),
    ("int8_minibatch",
     dict(n_components=3, n_covariate_components=[2], lam=[1.0], data_dtype="int8"),
     dict(max_iter=3, batch_size=16), dict(n=40, g=12, integer=True)),
    ("int16_als",
     dict(n_components=3, n_covariate_components=[2], lam=[1.0],
          data_dtype="int16", use_als=True),
     dict(max_iter=3), dict(n=40, g=12, integer=True)),
    ("int8_bucket_weighted",
     dict(n_components=5, n_covariate_components=[2], lam=[1.0],
          component_bucket=8, data_dtype="int8"),
     dict(max_iter=3, batch_size=16, sampling_method="weighted"),
     dict(n=40, g=12, integer=True)),
    ("restarts", dict(n_components=3, n_covariate_components=[2], lam=[1.0]),
     dict(max_iter=3, n_restarts=3), dict(n=20, g=8)),
]


@pytest.mark.parametrize("desc,mkw,fkw,dkw", CASES, ids=[c[0] for c in CASES])
def test_odd_config(desc, mkw, fkw, dkw):
    adata, keys = _data(**dkw)
    m = ALPINE(device="cpu", random_state=0, **mkw)
    m.fit(adata, keys, **fkw)
    tl = m.loss_history["total loss"].to_numpy()
    assert np.isfinite(tl).all()
    m.transform(adata, n_iter=2)
    assert adata.obsm["ALPINE_embedding"].shape == (dkw["n"], mkw["n_components"])
    m.get_covariate_gene_scores()
    m.get_normalized_expression(adata, library_size=100.0)
    assert np.isfinite(adata.layers["normalized_expression"]).all()
