"""Cell-axis sharding: a fit over an 8-device mesh must agree with the
single-device fit (SURVEY.md §4.3).  Runs on 8 virtual CPU devices
(conftest sets --xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest

from alpine_tpu import ALPINE
from alpine_tpu.parallel.mesh import make_cell_mesh

from .conftest import make_synthetic_adata


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fit_matches_single_device():
    adata_a = make_synthetic_adata(n_cells=128, n_genes=32, seed=2)
    adata_b = adata_a.copy()

    kw = dict(n_components=6, n_covariate_components=[2, 3], lam=[1.0, 2.0],
              random_state=0)
    single = ALPINE(device="cpu", **kw)
    single.fit(adata_a, ["batch", "condition"], max_iter=12)

    mesh = make_cell_mesh(8)
    sharded = ALPINE(device=mesh, **kw)
    sharded.fit(adata_b, ["batch", "condition"], max_iter=12)

    np.testing.assert_allclose(
        single.loss_history.values, sharded.loss_history.values, rtol=1e-4
    )
    np.testing.assert_allclose(
        adata_a.obsm["ALPINE_embedding"], adata_b.obsm["ALPINE_embedding"],
        rtol=5e-3, atol=1e-5,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_transform():
    adata = make_synthetic_adata(n_cells=96, n_genes=32, seed=3)
    mesh = make_cell_mesh(8)
    model = ALPINE(n_components=5, n_covariate_components=[2], lam=[1.0],
                   device=mesh, random_state=0)
    model.fit(adata, ["batch"], max_iter=8)
    fresh = make_synthetic_adata(n_cells=64, n_genes=32, seed=4)
    model.transform(fresh, n_iter=5)
    assert fresh.obsm["ALPINE_embedding"].shape == (64, 5)

    # cell counts that don't divide the mesh are padded host-side and
    # sliced back (round-1 advisor finding)
    ragged = make_synthetic_adata(n_cells=61, n_genes=32, seed=5)
    model.transform(ragged, n_iter=5)
    assert ragged.obsm["ALPINE_embedding"].shape == (61, 5)
    assert np.isfinite(ragged.obsm["ALPINE_embedding"]).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_2d_gene_cell_mesh_fit():
    """2-D (genes x cells) mesh: gene-sharded W/X, cell-sharded H/Y must
    match the single-device fit."""
    from alpine_tpu.parallel.mesh import make_gene_cell_mesh

    adata_a = make_synthetic_adata(n_cells=128, n_genes=32, seed=6)
    adata_b = adata_a.copy()
    kw = dict(n_components=6, n_covariate_components=[2], lam=[2.0],
              random_state=0)

    single = ALPINE(device="cpu", **kw)
    single.fit(adata_a, ["batch"], max_iter=10)

    mesh = make_gene_cell_mesh(2, 4)
    sharded = ALPINE(device=mesh, **kw)
    sharded.fit(adata_b, ["batch"], max_iter=10)

    np.testing.assert_allclose(single.loss_history.values,
                               sharded.loss_history.values, rtol=1e-4)
    sharded.transform(adata_b, n_iter=5)
    assert adata_b.obsm["ALPINE_embedding"].shape == (128, 6)


def test_mesh_validation():
    from jax.sharding import Mesh

    from alpine_tpu.parallel.mesh import resolve_device

    if len(jax.devices()) >= 4:
        bad = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("a", "b"))
        with pytest.raises(ValueError, match="genes"):
            resolve_device(bad)
