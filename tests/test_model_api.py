"""API-contract tests for the ALPINE estimator: obsm/varm/layers keys, loss
history shape, validation errors, transform, scaling (SURVEY.md §4.4)."""

import numpy as np
import pandas as pd
import pytest

from alpine_tpu import ALPINE
from alpine_tpu.utils.adata import AnnData

from .conftest import make_synthetic_adata


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


def test_fit_writes_embeddings_and_history(synthetic_adata):
    model = _model()
    out = model.fit(synthetic_adata, ["batch", "condition"], max_iter=15)
    assert out is model

    # store_embeddings keys (reference main.py:303-320)
    assert "ALPINE_embedding" in synthetic_adata.obsm
    assert "ALPINE_weights" in synthetic_adata.varm
    for cov in ("batch", "condition"):
        assert cov in synthetic_adata.obsm
        assert f"{cov}_dummy_matrix" in synthetic_adata.obsm
        assert cov in synthetic_adata.varm

    n, g = synthetic_adata.shape
    assert synthetic_adata.obsm["ALPINE_embedding"].shape == (n, 8)
    assert synthetic_adata.varm["ALPINE_weights"].shape == (g, 8)
    assert synthetic_adata.obsm["batch"].shape == (n, 2)
    assert synthetic_adata.varm["condition"].shape == (g, 3)

    # loss_history contract (main.py:666-676)
    assert list(model.loss_history.columns) == [
        "total loss",
        "reconstruction loss",
        "prediction loss(batch)",
        "prediction loss(condition)",
    ]
    assert len(model.loss_history) == 15
    tot = model.loss_history["total loss"].values
    assert np.all(np.diff(tot) <= 1e-4 * np.abs(tot[:-1]) + 1e-4)

    # matrices dict (main.py:143, 28-43)
    m = model.get_decomposed_matrices()
    assert set(m) == {"X", "Ys", "Ws", "Hs", "Bs"}
    assert [w.shape[1] for w in m["Ws"]] == [2, 3, 8]
    assert [b.shape for b in m["Bs"]] == [(2, 2), (3, 3)]

    # scaling applied by default (main.py:139-140): W columns sum to 1
    for w in m["Ws"]:
        np.testing.assert_allclose(w.sum(axis=0), 1.0, rtol=1e-4)


def test_transform_and_compute_loss(synthetic_adata):
    model = _model()
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=10)

    new = make_synthetic_adata(n_cells=30, seed=123)
    model.transform(new, n_iter=10)
    assert new.obsm["ALPINE_embedding"].shape == (30, 8)
    assert "batch" in new.obsm and "condition" in new.obsm

    loss = model.compute_loss(new)
    assert np.isfinite(loss) and loss > 0

    # transform with default n_iter (= trained max_iter)
    model.transform(new)


def test_unguided_only_fit():
    """Config 1 of BASELINE.md: pure unguided NMF (no covariates)."""
    adata = make_synthetic_adata(covariates=())
    model = ALPINE(
        n_components=6, n_covariate_components=[], lam=[],
        loss_type="frobenius", device="cpu", random_state=1,
    )
    model.fit(adata, [], max_iter=20)
    assert adata.obsm["ALPINE_embedding"].shape == (120, 6)
    assert list(model.loss_history.columns) == ["total loss", "reconstruction loss"]
    tot = model.loss_history["total loss"].values
    assert tot[-1] < tot[0]


def test_fit_with_nan_covariates():
    """NaN covariates are the semi-supervision entry point: all-zero Y rows
    (reference encoder.py:26-34) must not break the fit."""
    adata = make_synthetic_adata(na_frac=0.3)
    model = _model()
    model.fit(adata, ["batch", "condition"], max_iter=10)
    Y = adata.obsm["batch_dummy_matrix"]
    assert (Y.sum(axis=1) == 0).any()  # some all-zero rows survive
    assert np.isfinite(model.loss_history.values).all()


@pytest.mark.slow
def test_minibatch_and_weighted_fit(synthetic_adata):
    model = _model()
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=8, batch_size=32)
    assert len(model.loss_history) == 8

    model2 = _model()
    model2.fit(
        synthetic_adata, ["batch", "condition"], max_iter=8,
        batch_size=32, sampling_method="weighted",
    )
    assert np.isfinite(model2.loss_history.values).all()


def test_als_mode(synthetic_adata):
    model = _model(use_als=True, loss_type="frobenius")
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=10)
    tot = model.loss_history["total loss"].values
    assert np.all(np.diff(tot) <= 1e-4 * np.abs(tot[:-1]) + 1e-4)


def test_auto_max_iter(synthetic_adata):
    """max_iter=None triggers the 200-iteration warm-up + Kneedle elbow
    (reference main.py:114-131)."""
    model = _model()
    model.fit(synthetic_adata, ["batch", "condition"])
    assert 1 <= model.max_iter <= 200
    assert len(model.loss_history) == model.max_iter


def test_get_covariate_gene_scores(synthetic_adata):
    model = _model()
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=10)
    scores = model.get_covariate_gene_scores()
    assert set(scores) == {"batch", "condition"}
    df = scores["batch"]
    assert df.shape == (synthetic_adata.n_vars, 2)
    assert list(df.index) == synthetic_adata.var_names.tolist()

    model.get_covariate_gene_scores(synthetic_adata)
    assert "batch_gene_scores" in synthetic_adata.varm
    pd.testing.assert_frame_equal(synthetic_adata.varm["batch_gene_scores"], df)


def test_get_normalized_expression(synthetic_adata):
    model = _model()
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=10)
    model.transform(synthetic_adata, n_iter=10)
    model.get_normalized_expression(synthetic_adata)
    layer = synthetic_adata.layers["normalized_expression"]
    assert layer.shape == synthetic_adata.shape
    # per-cell totals equal the median library size (scanpy normalize_total)
    sums = layer.sum(axis=1)
    np.testing.assert_allclose(sums, np.median(sums), rtol=1e-3)

    model.get_normalized_expression(synthetic_adata, library_size=1e4)
    np.testing.assert_allclose(
        synthetic_adata.layers["normalized_expression"].sum(axis=1), 1e4, rtol=1e-3
    )


def test_get_normalized_expression_blockwise(synthetic_adata, tmp_path):
    """The blockwise path (round-5: bounded host memory at atlas scale) is
    value-equal across block sizes to BLAS kernel-selection ulps (the
    per-cell math is block-independent; gemm micro-kernels vary with slab
    width by ~1 ulp), with the library-size median computed from identical
    row sums, and supports a preallocated / memory-mapped `out` for
    out-of-core export."""
    model = _model()
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=10)
    model.transform(synthetic_adata, n_iter=10)
    n, g = synthetic_adata.shape

    outs = {}
    for bs in (None, 7, n, 10 * n):
        ad = synthetic_adata.copy()
        ad.obsm["ALPINE_embedding"] = synthetic_adata.obsm["ALPINE_embedding"]
        model.get_normalized_expression(ad, cell_block_size=bs)
        outs[bs] = ad.layers["normalized_expression"]
    # covering blocks (one slab = the unblocked computation) are bitwise
    np.testing.assert_array_equal(outs[n], outs[10 * n])
    for bs in (7, n, 10 * n):
        np.testing.assert_allclose(outs[None], outs[bs], rtol=1e-6,
                                   atol=2e-6)

    # out-of-core export: fill a memmap without an in-memory full copy
    mm = np.memmap(tmp_path / "expr.f32", dtype=np.float32, mode="w+",
                   shape=(n, g))
    model.get_normalized_expression(synthetic_adata, cell_block_size=9,
                                    out=mm)
    np.testing.assert_allclose(np.asarray(mm), outs[None], rtol=1e-6,
                               atol=2e-6)
    assert synthetic_adata.layers["normalized_expression"] is mm

    with pytest.raises(ValueError, match="out must be"):
        model.get_normalized_expression(
            synthetic_adata, out=np.empty((n, g + 1), np.float32))
    with pytest.raises(ValueError, match="cell_block_size"):
        model.get_normalized_expression(synthetic_adata, cell_block_size=0)


# ------------------------------------------------------------------ errors


def test_init_validation_errors():
    with pytest.raises(ValueError, match="n_components must be greater than 0."):
        _model(n_components=0)
    with pytest.raises(TypeError, match="n_covariate_components must be a list."):
        _model(n_covariate_components=(2, 3))
    with pytest.raises(ValueError, match="non-negative integer"):
        _model(n_covariate_components=[2, -1])
    with pytest.raises(TypeError, match="lam must be in a list."):
        _model(lam=1.0)
    with pytest.raises(ValueError, match="Each element in lam"):
        _model(lam=[1.0, -2.0])
    with pytest.raises(ValueError, match="alpha_W"):
        _model(alpha_W=-1.0)
    with pytest.raises(ValueError, match="orth_W"):
        _model(orth_W=-0.5)
    with pytest.raises(ValueError, match="l1_ratio_W"):
        _model(l1_ratio_W=1.5)
    with pytest.raises(TypeError, match="scale_needed must be a boolean."):
        _model(scale_needed=1)
    with pytest.raises(ValueError, match="loss_type must be one of"):
        _model(loss_type="poisson")
    with pytest.raises(ValueError, match="eps"):
        _model(eps=-1e-6)
    with pytest.raises(ValueError, match="random_state"):
        _model(random_state=-1)


def test_fit_validation_errors(synthetic_adata):
    model = _model()
    with pytest.raises(TypeError, match="adata must be an AnnData object."):
        model.fit(np.zeros((3, 3)), ["batch", "condition"])

    neg = synthetic_adata.copy()
    neg.X[0, 0] = -1.0
    with pytest.raises(ValueError, match="non-negative"):
        model.fit(neg, ["batch", "condition"])

    with pytest.raises(ValueError, match="Length of covariate_keys"):
        model.fit(synthetic_adata, ["batch"])
    with pytest.raises(ValueError, match="not found in adata.obs"):
        model.fit(synthetic_adata, ["batch", "nope"])
    # fixed validation (reference's checks never fire, main.py:420-428)
    with pytest.raises(TypeError, match="batch_size must be a positive integer."):
        model.fit(synthetic_adata, ["batch", "condition"], batch_size=-5)
    with pytest.raises(TypeError, match="max_iter must be a positive integer."):
        model.fit(synthetic_adata, ["batch", "condition"], max_iter=0)
    with pytest.raises(ValueError, match="Unknown sampling method"):
        model.fit(synthetic_adata, ["batch", "condition"], sampling_method="bogus")
    with pytest.raises(TypeError, match="verbose must be a boolean."):
        model.fit(synthetic_adata, ["batch", "condition"], verbose=1)


def test_untrained_errors(synthetic_adata):
    model = _model()
    msg = "Model is not trained yet. Please fit the model first."
    with pytest.raises(RuntimeError, match=msg):
        model.transform(synthetic_adata)
    with pytest.raises(RuntimeError, match=msg):
        model.compute_loss(synthetic_adata)
    with pytest.raises(RuntimeError, match=msg):
        model.get_decomposed_matrices()
    with pytest.raises(RuntimeError, match=msg):
        model.get_covariate_gene_scores()
    with pytest.raises(RuntimeError, match=msg):
        model.get_normalized_expression(synthetic_adata)
    with pytest.raises(RuntimeError, match=msg):
        model.store_embeddings(synthetic_adata)


def test_transform_errors(synthetic_adata):
    model = _model()
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=5)
    with pytest.raises(TypeError, match="adata must be an AnnData object."):
        model.transform("nope")
    with pytest.raises(ValueError, match="n_iter must be a positive integer or None."):
        model.transform(synthetic_adata, n_iter=0)
    fresh = make_synthetic_adata(seed=5)
    with pytest.raises(ValueError, match="ALPINE_embedding not found"):
        model.compute_loss(fresh)
    with pytest.raises(ValueError, match="ALPINE_embedding not found"):
        model.get_normalized_expression(fresh)
    model.transform(fresh, n_iter=3)
    with pytest.raises(ValueError, match="library_size must be a positive float."):
        model.get_normalized_expression(fresh, library_size=-1.0)


@pytest.mark.slow
def test_multi_restart_fit(synthetic_adata):
    """n_restarts vmaps independent initializations and keeps the best;
    restart 0 reuses the default key derivation, so on the same (XLA)
    backend the winner cannot be worse than the single fit."""
    a1, a2 = synthetic_adata.copy(), synthetic_adata.copy()
    single = _model()
    single.fit(a1, ["batch", "condition"], max_iter=10)
    multi = _model()
    multi.fit(a2, ["batch", "condition"], max_iter=10, n_restarts=4)
    assert len(multi.loss_history) == 10
    assert (multi.loss_history["total loss"].iloc[-1]
            <= single.loss_history["total loss"].iloc[-1] * (1 + 1e-6))

    with pytest.raises(ValueError, match="n_restarts"):
        _model().fit(a2, ["batch", "condition"], max_iter=2, n_restarts=0)
    with pytest.raises(ValueError, match="incompatible"):
        _model().fit(a2, ["batch", "condition"], max_iter=2, n_restarts=2,
                     checkpoint_dir="/tmp/x")


def test_multi_restart_rejects_mesh():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from alpine_tpu.parallel.mesh import make_cell_mesh

    adata = make_synthetic_adata(n_cells=64, n_genes=16)
    m = _model(device=make_cell_mesh(2))
    with pytest.raises(ValueError, match="sharded"):
        m.fit(adata, ["batch", "condition"], max_iter=2, n_restarts=2)


def test_verbose_progress_without_callbacks(synthetic_adata, capsys, monkeypatch):
    """On backends without host callbacks (the axon TPU tunnel), a verbose
    full-batch fit must emit per-chunk progress lines instead of going
    silent — and the chunked scan must reproduce the single-scan trajectory
    exactly (the XLA full-batch carry is just (W, H, Bs))."""
    from alpine_tpu.models.alpine import ALPINE as _ALPINE

    kw = dict(n_components=5, n_covariate_components=[2], lam=[1.0],
              device="cpu", random_state=0)

    quiet = _ALPINE(**kw)
    quiet.fit(synthetic_adata.copy(), ["batch"], max_iter=30)

    monkeypatch.setattr(_ALPINE, "_callbacks_supported", lambda self: False)
    loud = _ALPINE(**kw)
    loud.fit(synthetic_adata.copy(), ["batch"], max_iter=30, verbose=True)
    out = capsys.readouterr().out
    assert "iteration 30/30" in out
    assert out.count("objective loss") >= 2  # multiple chunks reported

    np.testing.assert_allclose(loud.loss_history.values,
                               quiet.loss_history.values, rtol=1e-6)


def test_transform_reuses_fit_device_x(synthetic_adata, monkeypatch):
    """transform(same adata) must NOT re-upload X (the host->device copy
    dominates atlas wall-clock through the axon tunnel); different data
    must miss the cache; results must match the uncached path exactly."""
    import alpine_tpu.models.alpine as alpine_mod

    kw = dict(n_components=5, n_covariate_components=[2], lam=[1.0],
              device="cpu", random_state=0)
    m = alpine_mod.ALPINE(**kw)
    m.fit(synthetic_adata, ["batch"], max_iter=10)

    calls = []
    orig = alpine_mod.Placement.put_x_matrix
    monkeypatch.setattr(alpine_mod.Placement, "put_x_matrix",
                        lambda self, arr: calls.append(arr.shape) or orig(self, arr))

    m.transform(synthetic_adata, n_iter=5)
    assert calls == [], "same-data transform re-uploaded X"
    emb_cached = synthetic_adata.obsm["ALPINE_embedding"].copy()

    # different data (same shape): fingerprint must miss
    other = synthetic_adata.copy()
    other.X = other.X + 1.0
    m.transform(other, n_iter=5)
    assert len(calls) == 1

    # cache off -> identical result
    monkeypatch.setenv("ALPINE_TPU_NO_X_CACHE", "1")
    m.transform(synthetic_adata, n_iter=5)
    assert len(calls) == 2
    np.testing.assert_array_equal(synthetic_adata.obsm["ALPINE_embedding"],
                                  emb_cached)


def test_x_cache_in_place_mutation_and_pickle(synthetic_adata, monkeypatch):
    """In-place edits of adata.X after fit must miss the device-X cache
    (full-sum fingerprint), negative edits must hit the validation error,
    and pickling a fitted model must not drag the device array along."""
    import pickle

    import alpine_tpu.models.alpine as alpine_mod

    m = alpine_mod.ALPINE(n_components=5, n_covariate_components=[2],
                          lam=[1.0], device="cpu", random_state=0)
    m.fit(synthetic_adata, ["batch"], max_iter=8)

    calls = []
    orig = alpine_mod.Placement.put_x_matrix
    monkeypatch.setattr(alpine_mod.Placement, "put_x_matrix",
                        lambda self, arr: calls.append(1) or orig(self, arr))

    # single-element in-place edit -> full-sum fingerprint misses
    synthetic_adata.X[3, 7] += 0.5
    m.transform(synthetic_adata, n_iter=3)
    assert calls == [1]

    # in-place edit that turns a value negative -> miss + validation error
    synthetic_adata.X[0, 0] = -1.0
    with pytest.raises(ValueError, match="non-negative"):
        m.transform(synthetic_adata, n_iter=3)

    # pickling drops the device cache but the model stays usable
    assert m._x_cache is not None
    m2 = pickle.loads(pickle.dumps(m))
    assert m2._x_cache is None
    synthetic_adata.X[0, 0] = 0.0
    m2.transform(synthetic_adata, n_iter=3)
    assert synthetic_adata.obsm["ALPINE_embedding"].shape[1] == 5

    # explicit release
    m.free_device_cache()
    assert m._x_cache is None


def test_bfloat16_mode_end_to_end(synthetic_adata):
    """data_dtype='bfloat16' (X uploaded pre-cast, half the transfer) must
    converge to the f32 fit's loss level and keep the full API working."""
    kw = dict(n_components=5, n_covariate_components=[2], lam=[1.0],
              device="cpu", random_state=0)
    a32, a16 = synthetic_adata.copy(), synthetic_adata.copy()

    f32 = ALPINE(data_dtype="float32", **kw)
    f32.fit(a32, ["batch"], max_iter=20)
    bf16 = ALPINE(data_dtype="bfloat16", **kw)
    bf16.fit(a16, ["batch"], max_iter=20)

    l32 = f32.loss_history["total loss"].to_numpy()
    l16 = bf16.loss_history["total loss"].to_numpy()
    assert np.isfinite(l16).all()
    np.testing.assert_allclose(l16, l32, rtol=6e-2)

    bf16.transform(a16, n_iter=5)  # cached bf16 device X
    assert a16.obsm["ALPINE_embedding"].shape == (synthetic_adata.shape[0], 5)
    assert a16.obsm["ALPINE_embedding"].dtype == np.float32


def test_get_normalized_expression_on_device_matches_host(synthetic_adata):
    model = _model()
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=8)
    model.get_normalized_expression(synthetic_adata, library_size=100.0)
    host = np.asarray(synthetic_adata.layers["normalized_expression"]).copy()
    model.get_normalized_expression(synthetic_adata, library_size=100.0,
                                    on_device=True)
    dev = np.asarray(synthetic_adata.layers["normalized_expression"])
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_failed_refit_leaves_previous_fit_intact():
    """A failing re-fit must not half-mutate a fitted estimator (e.g. a
    fresh empty encoder paired with the old matrices)."""
    adata = make_synthetic_adata()
    model = _model()
    model.fit(adata, ["batch", "condition"], max_iter=8)
    old_loss = model.compute_loss(adata)

    bad = make_synthetic_adata()
    bad.obs["batch"] = np.array([None] * bad.n_obs, dtype=object)  # all-NaN
    with pytest.raises(Exception):
        model.fit(bad, ["batch", "condition"], max_iter=8)

    # previous fit still fully functional
    assert np.isclose(model.compute_loss(adata), old_loss)
    new = make_synthetic_adata(n_cells=20, seed=3)
    model.transform(new, n_iter=3)
    assert np.isfinite(new.obsm["ALPINE_embedding"]).all()


def test_bad_checkpoint_backend_rejected_before_work(tmp_path):
    model = _model()
    with pytest.raises(ValueError, match="npz.*orbax"):
        model.fit(make_synthetic_adata(), ["batch", "condition"], max_iter=5,
                  checkpoint_dir=str(tmp_path), checkpoint_backend="zarr")
    assert not hasattr(model, "matrices")


def test_failed_fit_does_not_install_x_cache(monkeypatch):
    """A fit that dies mid-scan must not strand the device-resident X on an
    instance whose transform can never use it."""
    from alpine_tpu.ops import mu as _mu

    model = _model()

    def boom(*a, **kw):
        raise RuntimeError("injected scan failure")

    monkeypatch.setattr(_mu, "fit_scan", boom)
    with pytest.raises(RuntimeError, match="injected"):
        model.fit(make_synthetic_adata(), ["batch", "condition"], max_iter=5)
    assert getattr(model, "_x_cache", None) is None


def test_transform_rejects_mismatched_gene_axis(synthetic_adata):
    """A query with a different gene count must fail with a clear message,
    not an opaque matmul shape error deep in the projection (the
    reference's behavior)."""
    m = ALPINE(n_components=5, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0)
    m.fit(synthetic_adata, ["batch"], max_iter=4)
    wrong = make_synthetic_adata(n_cells=30, n_genes=17)
    with pytest.raises(ValueError, match="17 genes.*fit on 40"):
        m.transform(wrong, n_iter=3)
