"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4.3)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's TPU plugin force-prepends itself to jax_platforms,
# overriding JAX_PLATFORMS=cpu; pin CPU explicitly so tests are hermetic.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_synthetic_adata(
    n_cells=120,
    n_genes=40,
    covariates=(("batch", 2), ("condition", 3)),
    na_frac=0.0,
    seed=0,
):
    """Small synthetic AnnData with categorical covariates; X is a noisy
    non-negative low-rank matrix so NMF has structure to find."""
    from alpine_tpu.utils.adata import AnnData

    r = np.random.default_rng(seed)
    k = 6
    W = r.gamma(2.0, 1.0, size=(n_genes, k))
    H = r.gamma(2.0, 1.0, size=(k, n_cells))
    X = (W @ H + r.random((n_genes, n_cells))).astype(np.float32).T  # cells x genes

    obs = pd.DataFrame(index=[f"cell{i}" for i in range(n_cells)])
    for name, n_levels in covariates:
        labels = np.array([f"{name}_{j}" for j in r.integers(0, n_levels, n_cells)],
                          dtype=object)
        if na_frac > 0:
            mask = r.random(n_cells) < na_frac
            labels[mask] = None
        obs[name] = labels
    var = pd.DataFrame(index=[f"gene{i}" for i in range(n_genes)])
    return AnnData(X, obs=obs, var=var)


@pytest.fixture
def synthetic_adata():
    return make_synthetic_adata()
