"""Sparse adata.X acceptance (capability beyond the reference, which
requires a dense ndarray — reference main.py:395-400).

Real single-cell AnnData objects usually hold CSR counts; the estimator
densifies at ingestion (the TPU compute path is dense), so a sparse fit
must be EXACTLY the dense fit on the same values."""

import numpy as np
import pytest
from scipy import sparse

from alpine_tpu import ALPINE
from alpine_tpu.utils.adata import AnnData, dense_x, is_sparse_x, x_min

from .conftest import make_synthetic_adata


def _sparsify(adata, fmt="csr"):
    """Copy of adata with a sparse X holding the same values (zeroing a
    fraction first so the matrix is genuinely sparse)."""
    X = np.asarray(adata.X).copy()
    r = np.random.default_rng(7)
    X[r.random(X.shape) < 0.6] = 0.0
    dense = AnnData(X, obs=adata.obs.copy(), var=adata.var.copy())
    mat = sparse.csr_matrix(X) if fmt == "csr" else sparse.csc_matrix(X)
    return dense, AnnData(mat, obs=adata.obs.copy(), var=adata.var.copy())


def _model(**kw):
    defaults = dict(
        n_components=8,
        n_covariate_components=[2, 3],
        lam=[1.0, 2.0],
        device="cpu",
        random_state=0,
    )
    defaults.update(kw)
    return ALPINE(**defaults)


def test_helpers():
    X = sparse.csr_matrix(np.array([[0.0, 2.0], [3.0, 0.0]], np.float32))
    assert is_sparse_x(X) and not is_sparse_x(X.toarray())
    np.testing.assert_array_equal(dense_x(X), X.toarray())
    assert x_min(X) == 0.0
    Xneg = sparse.csr_matrix(np.array([[5.0, -1.0], [3.0, 4.0]], np.float32))
    assert x_min(Xneg) == -1.0
    # all-nonzero sparse: the minimum is the explicit minimum, not 0
    Xfull = sparse.csr_matrix(np.full((2, 2), 3.0, np.float32))
    assert x_min(Xfull) == 3.0


@pytest.mark.parametrize("fmt", ["csr", "csc"])
def test_sparse_fit_matches_dense(fmt):
    dense, sp = _sparsify(make_synthetic_adata(), fmt)
    md = _model().fit(dense, ["batch", "condition"], max_iter=12)
    ms = _model().fit(sp, ["batch", "condition"], max_iter=12)
    np.testing.assert_array_equal(
        md.loss_history.values, ms.loss_history.values
    )
    np.testing.assert_array_equal(
        dense.obsm["ALPINE_embedding"], sp.obsm["ALPINE_embedding"]
    )


def test_sparse_transform_and_compute_loss():
    dense, sp = _sparsify(make_synthetic_adata())
    m = _model().fit(sp, ["batch", "condition"], max_iter=10)
    # same-data transform (exercises the sparse fingerprint / device cache)
    m.transform(sp, n_iter=5)
    assert sp.obsm["ALPINE_embedding"].shape == (120, 8)
    # new sparse data
    _, new = _sparsify(make_synthetic_adata(n_cells=30, seed=5))
    m.transform(new, n_iter=5)
    assert np.isfinite(new.obsm["ALPINE_embedding"]).all()
    assert np.isfinite(m.compute_loss(new))


def test_sparse_negative_rejected():
    _, sp = _sparsify(make_synthetic_adata())
    sp.X.data[0] = -1.0
    with pytest.raises(ValueError, match="non-negative"):
        _model().fit(sp, ["batch", "condition"], max_iter=3)


def test_sparse_int8_mode():
    """Sparse counts + integer storage compose (densify then exact cast)."""
    r = np.random.default_rng(0)
    X = r.poisson(0.5, (100, 30)).clip(0, 127).astype(np.float32)
    import pandas as pd

    obs = pd.DataFrame(
        {"batch": np.array([f"b{j}" for j in r.integers(0, 2, 100)], object)},
        index=[f"c{i}" for i in range(100)],
    )
    sp = AnnData(sparse.csr_matrix(X), obs=obs)
    m = ALPINE(n_components=5, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0, data_dtype="int8")
    m.fit(sp, ["batch"], max_iter=8)
    assert np.isfinite(m.loss_history.values).all()


@pytest.mark.slow
def test_sparse_optimizer_search():
    from alpine_tpu import ComponentOptimizer

    _, sp = _sparsify(make_synthetic_adata(n_cells=90))
    opt = ComponentOptimizer(sp, ["batch", "condition"], max_iter=8,
                             device="cpu", random_state=0)
    opt.search_hyperparams(n_total_components_range=(12, 16),
                           lam_range=(0.1, 10.0), max_evals=2, n_splits=2)
    # one of the two draws is rejected by the component-distribution
    # constraint (same with dense X); the surviving trial must have scored
    hist = opt.get_train_history()
    assert len(hist) >= 1
    assert np.isfinite(hist["score"].values).all()


def test_sparse_h5ad_roundtrip(tmp_path):
    from alpine_tpu.io.h5ad import read_h5ad, write_h5ad

    _, sp = _sparsify(make_synthetic_adata())
    path = str(tmp_path / "sp.h5ad")
    write_h5ad(sp, path)
    back = read_h5ad(path)
    np.testing.assert_allclose(np.asarray(back.X), dense_x(sp.X))


def test_coo_input_canonicalized():
    """COO (not subscriptable, may carry duplicate entries) canonicalizes
    to CSR at container construction; duplicates sum correctly."""
    coo = sparse.coo_matrix(
        (np.array([5.0, -3.0, 2.0], np.float32),
         (np.array([0, 0, 1]), np.array([1, 1, 0]))), shape=(3, 2))
    # duplicate (+5, -3) at (0,1) -> dense 2.0: non-negative, x_min must
    # not false-reject on the raw .data stream
    assert x_min(coo) == 0.0
    ad = AnnData(coo)
    assert hasattr(ad.X, "indptr")  # compressed now
    sub = ad[np.arange(2)]
    np.testing.assert_array_equal(
        dense_x(sub.X), np.array([[0.0, 2.0], [2.0, 0.0]], np.float32))


def test_sparse_fingerprint_detects_column_remap():
    """Moving nonzeros to different gene columns leaves .data, row sums and
    totals unchanged — the fingerprint must still differ, or transform
    would silently reuse the stale device-X cache."""
    from alpine_tpu.models.alpine import ALPINE as _A

    X = sparse.csr_matrix(
        (np.array([1.0, 2.0, 3.0], np.float32),
         np.array([0, 2, 1]), np.array([0, 1, 2, 3])), shape=(3, 4))
    remapped = sparse.csr_matrix(
        (np.array([1.0, 2.0, 3.0], np.float32),
         np.array([1, 3, 2]), np.array([0, 1, 2, 3])), shape=(3, 4))
    assert _A._x_fingerprint(X) != _A._x_fingerprint(remapped)


def test_sparse_nan_rejected():
    _, sp = _sparsify(make_synthetic_adata())
    sp.X.data[0] = np.nan
    with pytest.raises(ValueError, match="non-negative"):
        _model().fit(sp, ["batch", "condition"], max_iter=3)


def test_sparse_container_slicing_and_copy():
    _, sp = _sparsify(make_synthetic_adata())
    sub = sp[np.arange(10)]
    assert is_sparse_x(sub.X) and sub.shape == (10, 40)
    assert sub.obs.shape[0] == 10
    cp = sp.copy()
    assert is_sparse_x(cp.X)
    np.testing.assert_array_equal(dense_x(cp.X), dense_x(sp.X))


def test_x_min_noncanonical_csr_duplicates():
    """A hand-built CSR with duplicate entries (+5, -3 at one position =
    dense 2) must not be false-rejected: x_min sums duplicates on a copy."""
    X = sparse.csr_matrix(
        (np.array([5.0, -3.0], np.float32), np.array([0, 0]),
         np.array([0, 2, 2])), shape=(2, 2))
    assert not X.has_canonical_format
    assert x_min(X) == 0.0
    assert not X.has_canonical_format  # caller's matrix untouched


def test_container_scalar_index():
    """adata[0] returns a 1-obs subset like real anndata (a bare integer on
    a dense X would drop to 1-D and crash the constructor)."""
    ad = make_synthetic_adata()
    sub = ad[0]
    assert sub.shape == (1, 40)
    assert list(sub.obs.index) == [ad.obs.index[0]]
