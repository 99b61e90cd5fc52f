"""Integer X-storage modes (data_dtype='int8'/'int16').

Raw single-cell counts are small integers, so integer storage is EXACT —
unlike bfloat16's rounding — while moving fewer HBM bytes:

- int16 dequantizes to float32 (exact for counts <= 32767), so its
  trajectory must be BIT-IDENTICAL to data_dtype='float32' on count data.
- int8 dequantizes to bfloat16 (exact: ints <= 256 fit bf16's 8-bit
  mantissa), so its trajectory must be BIT-IDENTICAL to
  data_dtype='bfloat16' on counts <= 127 — at half the traffic.

Scope: the bit-identity holds on the XLA path (what these CPU tests run
and what sharded/minibatch/ALS fits use).  On the TPU Pallas path the
tile width follows the storage itemsize, so int8-vs-bf16 trajectories
there agree only to f32 summation order (~1e-5 over a few iterations —
covered by tests/test_tpu_hardware.py at its tolerance), not bitwise."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from alpine_tpu import ALPINE
from alpine_tpu.ops import mu
from alpine_tpu.utils.adata import AnnData


def make_count_adata(n_cells=120, n_genes=40, max_count=100, seed=0):
    """Synthetic AnnData whose X is integer counts (Poisson-ish low rank)."""
    r = np.random.default_rng(seed)
    k = 6
    W = r.gamma(2.0, 1.0, size=(n_genes, k))
    H = r.gamma(2.0, 0.5, size=(k, n_cells))
    X = r.poisson(W @ H).clip(0, max_count).astype(np.float32).T
    obs = pd.DataFrame(index=[f"cell{i}" for i in range(n_cells)])
    obs["batch"] = [f"b{j}" for j in r.integers(0, 2, n_cells)]
    obs["condition"] = [f"c{j}" for j in r.integers(0, 3, n_cells)]
    var = pd.DataFrame(index=[f"gene{i}" for i in range(n_genes)])
    return AnnData(X, obs=obs, var=var)


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


def _fit(data_dtype, adata=None, **fit_kw):
    adata = adata if adata is not None else make_count_adata()
    model = _model(data_dtype=data_dtype)
    model.fit(adata, ["batch", "condition"], max_iter=12, **fit_kw)
    return model


def _assert_same_fit(m_a, m_b):
    np.testing.assert_array_equal(
        m_a.loss_history.values, m_b.loss_history.values
    )
    for wa, wb in zip(m_a.matrices["Ws"], m_b.matrices["Ws"]):
        np.testing.assert_array_equal(wa, wb)
    for ha, hb in zip(m_a.matrices["Hs"], m_b.matrices["Hs"]):
        np.testing.assert_array_equal(ha, hb)
    for ba, bb in zip(m_a.matrices["Bs"], m_b.matrices["Bs"]):
        np.testing.assert_array_equal(ba, bb)


def test_config_dtype_mapping():
    base = dict(blocks=(2, 3), n_labels=(2,), n_cells=16)
    assert mu.MUConfig(**base, x_dtype="int8").xdt == jnp.int8
    assert mu.MUConfig(**base, x_dtype="int8").x_compute == jnp.bfloat16
    assert mu.MUConfig(**base, x_dtype="int16").xdt == jnp.int16
    assert mu.MUConfig(**base, x_dtype="int16").x_compute == jnp.float32
    assert mu.MUConfig(**base, x_dtype="bfloat16").x_compute == jnp.bfloat16
    assert mu.MUConfig(**base, x_dtype="float32").x_compute == jnp.float32


def test_int16_matches_float32_exactly():
    _assert_same_fit(_fit("int16"), _fit("float32"))


def test_int8_matches_bfloat16_exactly():
    _assert_same_fit(_fit("int8"), _fit("bfloat16"))


@pytest.mark.slow
def test_int8_matches_bfloat16_minibatch():
    a = _fit("int8", batch_size=48)
    b = _fit("bfloat16", batch_size=48)
    _assert_same_fit(a, b)


def test_int16_matches_float32_als():
    a, b = make_count_adata(), make_count_adata()
    ma = _model(data_dtype="int16", use_als=True)
    ma.fit(a, ["batch", "condition"], max_iter=10)
    mb = _model(data_dtype="float32", use_als=True)
    mb.fit(b, ["batch", "condition"], max_iter=10)
    _assert_same_fit(ma, mb)


def test_int8_pallas_interpret_matches_xla():
    """The fused kernels dequantize int8 tiles in VMEM; interpret mode must
    track the XLA int8 path within the usual pallas-vs-xla tolerance."""
    r = np.random.default_rng(3)
    g, n, blocks, n_labels = 24, 256, (3, 5), (2,)
    X = jnp.asarray(r.poisson(2.0, (g, n)).clip(0, 127).astype(np.int8))
    Y = np.zeros((2, n), np.float32)
    Y[r.integers(0, 2, n), np.arange(n)] = 1.0
    Ys = (jnp.asarray(Y),)
    hyper = (jnp.asarray([1.5], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e-6))
    key = jax.random.PRNGKey(7)

    outs = {}
    for backend in ("xla", "pallas_interpret"):
        cfg = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=n,
                          loss_kl=True, max_iter=8, x_dtype="int8",
                          backend=backend)
        W0, H0, Bs0 = mu.init_matrices(cfg, g, key, 1e-6)
        outs[backend] = mu.fit_scan(cfg, W0, H0, Bs0, X, Ys, hyper, key, None)

    for a, b in zip(outs["xla"][:2], outs["pallas_interpret"][:2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs["xla"][3]),
                               np.asarray(outs["pallas_interpret"][3]),
                               rtol=2e-3)


def _with_big_count(adata, value=200.0):
    adata.X[0, 0] = value
    return adata


def test_int8_rejects_large_counts():
    adata = _with_big_count(make_count_adata())
    assert adata.X.max() > 127
    with pytest.raises(ValueError, match="int8.*<= 127"):
        _fit("int8", adata)
    # int16 accepts the same data and matches float32
    _assert_same_fit(
        _fit("int16", _with_big_count(make_count_adata())),
        _fit("float32", _with_big_count(make_count_adata())),
    )


def test_int_dtypes_reject_fractional_data():
    adata = make_count_adata()
    adata.X[3, 7] = 1.5
    with pytest.raises(ValueError, match="integer-valued"):
        _fit("int8", adata)
    with pytest.raises(ValueError, match="integer-valued"):
        _fit("int16", adata)


def test_nan_x_rejected_every_dtype():
    """NaN in adata.X must be rejected in every data_dtype (regression: the
    x_min refactor briefly let NaN through the non-negativity check)."""
    for dt in ("float32", "bfloat16", "int16", "int8"):
        adata = make_count_adata()
        adata.X[2, 3] = np.nan
        with pytest.raises(ValueError, match="non-negative"):
            _fit(dt, adata)


def test_int_cast_nan_message():
    """If NaN reaches the quantizing cast itself, the error must say NaN —
    not 'fractional values'."""
    model = _model(data_dtype="int8")
    arr = np.asarray([[1.0, np.nan]], np.float32)
    with pytest.raises(ValueError, match="NaN"):
        model._cast_x_host(arr)


def test_int16_range_message_does_not_suggest_int16():
    model = _model(data_dtype="int16")
    arr = np.asarray([[40000.0, 1.0]], np.float32)
    with pytest.raises(ValueError) as e:
        model._cast_x_host(arr)
    assert "Use 'bfloat16' or 'float32' instead" in str(e.value)


def test_invalid_data_dtype_message():
    with pytest.raises(ValueError, match="int8"):
        _model(data_dtype="float16")


def test_int8_transform_same_and_new_data():
    adata = make_count_adata()
    model = _fit("int8", adata)
    # same-data transform (device-X cache path)
    model.transform(adata, n_iter=5)
    assert adata.obsm["ALPINE_embedding"].shape == (120, 8)
    # new count data
    new = make_count_adata(n_cells=40, seed=9)
    model.transform(new, n_iter=5)
    assert np.isfinite(new.obsm["ALPINE_embedding"]).all()
    # transform accepts non-int8-representable query data by falling back
    # to the compute-width float storage (the projection math never needed
    # integer storage; the reference accepts any non-negative X) — it must
    # NOT quantize silently and NOT reject
    big = _with_big_count(make_count_adata(n_cells=16, seed=10))
    model.transform(big, n_iter=5)
    assert np.isfinite(big.obsm["ALPINE_embedding"]).all()
    frac = make_count_adata(n_cells=16, seed=11)
    frac.X[0, 0] = 1.5
    model.transform(frac, n_iter=5)
    assert np.isfinite(frac.obsm["ALPINE_embedding"]).all()


@pytest.mark.slow
def test_int16_weighted_sampling_matches_float32():
    a = _fit("int16", sampling_method="weighted", batch_size=60)
    b = _fit("float32", sampling_method="weighted", batch_size=60)
    _assert_same_fit(a, b)


def test_int16_sharded_matches_single_device():
    """Integer X storage over a cell mesh: the sharded fit (GSPMD psums of
    the small accumulators) must track the single-device trajectory."""
    from alpine_tpu.parallel.mesh import make_cell_mesh

    adata_m, adata_s = make_count_adata(), make_count_adata()
    mm = _model(data_dtype="int16", device=make_cell_mesh())
    mm.fit(adata_m, ["batch", "condition"], max_iter=10)
    ms = _model(data_dtype="int16", device="cpu")
    ms.fit(adata_s, ["batch", "condition"], max_iter=10)
    np.testing.assert_allclose(
        mm.loss_history.values, ms.loss_history.values, rtol=1e-5
    )


def test_checkpoint_not_resumed_across_data_dtype(tmp_path):
    """A mid-fit snapshot written under one data_dtype must NOT be resumed
    by a fit running another: the numerics regime is part of the snapshot's
    config key, so the int8 fit below starts fresh instead of silently
    continuing a float32 trajectory in bfloat16 compute."""
    from alpine_tpu.io.checkpoint import FitCheckpointer

    ckpt_dir = str(tmp_path / "ckpt")
    calls = {"n": 0}
    orig_save = FitCheckpointer.save

    def interrupting_save(self, iteration, W, H, Bs, losses):
        orig_save(self, iteration, W, H, Bs, losses)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt

    FitCheckpointer.save = interrupting_save
    try:
        with pytest.raises(KeyboardInterrupt):
            _model(data_dtype="float32").fit(
                make_count_adata(), ["batch", "condition"], max_iter=12,
                checkpoint_dir=ckpt_dir, checkpoint_every=4,
            )
    finally:
        FitCheckpointer.save = orig_save
    assert any(f.startswith("fit_snapshot") for f in os.listdir(ckpt_dir))

    mixed = _model(data_dtype="int8")
    mixed.fit(make_count_adata(), ["batch", "condition"], max_iter=12,
              checkpoint_dir=ckpt_dir, checkpoint_every=4)
    fresh = _model(data_dtype="int8")
    fresh.fit(make_count_adata(), ["batch", "condition"], max_iter=12,
              checkpoint_dir=str(tmp_path / "fresh"), checkpoint_every=4)
    np.testing.assert_array_equal(
        mixed.loss_history.values, fresh.loss_history.values
    )


def test_cast_x_host_rejects_negative_values():
    """The quantizing cast itself must refuse values its dtype would wrap
    (e.g. -300.0 -> int8 -44), independent of the callers' >= 0 checks."""
    model = _model(data_dtype="int8")
    arr = np.asarray([[3.0, -300.0], [1.0, 2.0]], np.float32)
    with pytest.raises(ValueError, match=">= 0"):
        model._cast_x_host(arr)


def test_int8_save_load_roundtrip(tmp_path):
    model = _fit("int8")
    path = str(tmp_path / "model.npz")
    model.save(path)
    loaded = ALPINE.load(path)
    assert loaded.data_dtype == "int8"
    for wa, wb in zip(model.matrices["Ws"], loaded.matrices["Ws"]):
        np.testing.assert_array_equal(wa, wb)


def test_suggest_data_dtype():
    from scipy import sparse

    from alpine_tpu import suggest_data_dtype

    counts = make_count_adata()  # Poisson counts <= 100
    assert suggest_data_dtype(counts) == "int8"
    assert suggest_data_dtype(counts.X) == "int8"
    assert suggest_data_dtype(sparse.csr_matrix(counts.X)) == "int8"
    big = _with_big_count(make_count_adata(), 300.0)
    assert suggest_data_dtype(big) == "int16"
    huge = _with_big_count(make_count_adata(), 40000.0)
    assert suggest_data_dtype(huge) == "float32"
    frac = make_count_adata()
    frac.X[0, 0] = 1.5
    assert suggest_data_dtype(frac) == "float32"
    # the suggestion is always accepted by fit
    model = _model(data_dtype=suggest_data_dtype(counts))
    model.fit(counts, ["batch", "condition"], max_iter=3)


# ---------------------------------------------------------------------------
# data_dtype="auto" (the default): resolve the narrowest EXACT storage
# ---------------------------------------------------------------------------


def test_auto_is_the_default_and_resolves_int8_on_counts():
    """Out of the box, count data gets exact int8 storage — the fit must be
    indistinguishable from an explicit data_dtype='int8' fit."""
    auto = ALPINE(n_components=8, n_covariate_components=[2, 3],
                  lam=[1.0, 2.0], device="cpu", random_state=0)
    assert auto.data_dtype == "auto"
    adata = make_count_adata()
    auto.fit(adata, ["batch", "condition"], max_iter=12)
    assert auto.data_dtype_ == "int8"
    _assert_same_fit(auto, _fit("int8"))


def test_auto_resolves_int16_on_larger_counts():
    def data():
        a = make_count_adata(max_count=5000)
        a.X = a.X.copy()
        a.X[0, 0] = 5000.0  # force a count beyond int8's range
        return a

    m = _fit("auto", adata=data())
    assert m.data_dtype_ == "int16"
    _assert_same_fit(m, _fit("float32", adata=data()))


def test_auto_resolves_float32_on_fractional_data():
    from .conftest import make_synthetic_adata

    adata = make_synthetic_adata()  # gamma-noise: fractional values
    m = _model(data_dtype="auto", n_covariate_components=[2, 3])
    m.fit(adata, ["batch", "condition"], max_iter=8)
    assert m.data_dtype_ == "float32"


def test_explicit_dtype_overrides_auto():
    m = _fit("bfloat16")  # counts would auto-resolve to int8
    assert m.data_dtype_ == "bfloat16"


def test_auto_save_load_keeps_resolution(tmp_path):
    """transform-after-load must cast query data with the dtype the FIT
    resolved, not re-resolve (a fractional query through an int8-fit model
    takes the strict=False compute-width fallback)."""
    adata = make_count_adata()
    m = _fit("auto", adata=adata)
    assert m.data_dtype_ == "int8"
    path = str(tmp_path / "model")
    m.save(path)
    loaded = ALPINE.load(path, device="cpu")
    assert loaded.data_dtype == "auto"
    assert loaded.data_dtype_ == "int8"
    frac = make_count_adata(seed=3)
    frac.X = frac.X + 0.25  # fractional out-of-sample query
    loaded.transform(frac, n_iter=5)
    assert np.isfinite(frac.obsm["ALPINE_embedding"]).all()


def test_auto_pickle_roundtrip_keeps_resolution():
    import pickle

    m = _fit("auto")
    blob = pickle.dumps(m)
    back = pickle.loads(blob)
    assert back.data_dtype == "auto"
    assert back.data_dtype_ == m.data_dtype_


def test_pre_auto_pickle_gets_resolved_dtype():
    """Estimator pickles from before the 'auto' default carried only a
    concrete data_dtype; __setstate__ must mirror it into data_dtype_."""
    m = _fit("int16")
    state = m.__getstate__()
    state.pop("data_dtype_")
    fresh = ALPINE.__new__(ALPINE)
    fresh.__setstate__(state)
    assert fresh.data_dtype_ == "int16"


def test_optimizer_auto_dtype_threading():
    """ComponentOptimizer resolves once from the full dataset and threads
    the storage dtype through both the per-fold and the batched CV paths."""
    from alpine_tpu.optimize.batched import prepare_fold_data
    from alpine_tpu.optimize.optimizer import ComponentOptimizer

    adata = make_count_adata(n_cells=90, n_genes=24)
    co = ComponentOptimizer(adata, ["batch"], max_iter=5, random_state=0)
    assert co.data_dtype == "auto"
    assert co.data_dtype_ == "int8"

    co_f32 = ComponentOptimizer(adata, ["batch"], max_iter=5,
                                data_dtype="float32")
    assert co_f32.data_dtype_ == "float32"

    with pytest.raises(ValueError, match="data_dtype"):
        ComponentOptimizer(adata, ["batch"], data_dtype="int4")

    # fold tensors land at the storage width (train) / compute width (val)
    idx = np.arange(90)
    folds = [(idx[:60], idx[60:]), (idx[30:], idx[:30])]
    Ys = [np.eye(2, dtype=np.float32)[np.arange(90) % 2]]
    fd = prepare_fold_data(np.asarray(adata.X), Ys, folds, weighted=False,
                           x_dtype="int8")
    assert fd.Xtr.dtype == jnp.int8
    assert fd.Xva.dtype == jnp.bfloat16
    assert fd.x_dtype == "int8"


@pytest.mark.slow
def test_optimizer_search_runs_with_auto_int8():
    """A short end-to-end search on count data under the auto default (the
    batched fold path must accept integer-stored X)."""
    from alpine_tpu.optimize.optimizer import ComponentOptimizer

    adata = make_count_adata(n_cells=90, n_genes=24)
    co = ComponentOptimizer(adata, ["batch"], max_iter=5, random_state=0)
    best = co.search_hyperparams(
        n_total_components_range=(8, 16), lam_range=(1.0, 10.0),
        n_splits=2, max_evals=2,
    )
    assert "n_components" in best
    hist = co.get_train_history()
    assert np.isfinite(hist["score"]).all()


def test_optimizer_rejects_unrepresentable_explicit_dtype():
    """The batched CV path casts fold tensors directly, where an invalid
    explicit dtype would silently truncate/wrap — the optimizer must
    validate representability up front (review finding, round 3)."""
    from alpine_tpu.optimize.optimizer import ComponentOptimizer

    frac = make_count_adata(n_cells=60, n_genes=12)
    frac.X = frac.X + 0.5  # fractional
    with pytest.raises(ValueError, match="integer values"):
        ComponentOptimizer(frac, ["batch"], max_iter=5, data_dtype="int8")

    big = make_count_adata(n_cells=60, n_genes=12)
    big.X = big.X.copy()
    big.X[0, 0] = 300.0  # > int8 range
    with pytest.raises(ValueError, match="int8"):
        ComponentOptimizer(big, ["batch"], max_iter=5, data_dtype="int8")
    # int16 still fine for the same data
    ComponentOptimizer(big, ["batch"], max_iter=5, data_dtype="int16")


def test_dtype_can_store_predicate():
    from alpine_tpu.utils.adata import dtype_can_store

    counts = np.asarray([[0.0, 5.0, 127.0]], np.float32)
    assert dtype_can_store("int8", counts)
    assert dtype_can_store("int16", counts)
    assert dtype_can_store("bfloat16", np.asarray([[0.5]]))  # rounds by design
    assert not dtype_can_store("int8", np.asarray([[128.0]], np.float32))
    assert not dtype_can_store("int8", np.asarray([[0.5]], np.float32))
    assert not dtype_can_store("int16", np.asarray([[-1.0]], np.float32))
    assert not dtype_can_store("int8", np.asarray([[np.nan]], np.float32))
