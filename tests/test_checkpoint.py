"""Tests: model save/load roundtrip, mid-fit snapshots + deterministic
resume, profiling hooks."""

import os

import numpy as np
import pandas as pd
import pytest

from alpine_tpu import ALPINE
from alpine_tpu import profiling

from .conftest import make_synthetic_adata


def _model(**kw):
    defaults = dict(n_components=6, n_covariate_components=[2], lam=[5.0],
                    device="cpu", random_state=0)
    defaults.update(kw)
    return ALPINE(**defaults)


def test_save_load_roundtrip(tmp_path, synthetic_adata):
    model = _model(n_covariate_components=[2, 3], lam=[1.0, 2.0])
    model.fit(synthetic_adata, ["batch", "condition"], max_iter=10)
    path = str(tmp_path / "model")
    model.save(path)

    loaded = ALPINE.load(path, device="cpu")
    for name in ("Ws", "Hs", "Bs", "Ys"):
        for a, b in zip(model.matrices[name], loaded.matrices[name]):
            np.testing.assert_array_equal(a, b)
    pd.testing.assert_frame_equal(model.loss_history, loaded.loss_history)
    assert loaded.max_iter == model.max_iter
    assert loaded.covariate_keys == ["batch", "condition"]

    # loaded model must transform new data identically
    fresh_a = make_synthetic_adata(n_cells=40, seed=9)
    fresh_b = make_synthetic_adata(n_cells=40, seed=9)
    model.transform(fresh_a, n_iter=5)
    loaded.transform(fresh_b, n_iter=5)
    np.testing.assert_allclose(fresh_a.obsm["ALPINE_embedding"],
                               fresh_b.obsm["ALPINE_embedding"], rtol=1e-5)

    # encoder survives: gene scores identical
    sa = model.get_covariate_gene_scores()
    sb = loaded.get_covariate_gene_scores()
    pd.testing.assert_frame_equal(sa["batch"], sb["batch"])


def test_save_unfitted_raises(tmp_path):
    with pytest.raises(RuntimeError, match="not trained"):
        _model().save(str(tmp_path / "x"))


def test_checkpointed_fit_matches_plain(tmp_path, synthetic_adata):
    """Chunked+snapshotted full-batch fit must equal the single-scan fit
    (full-batch ignores the per-chunk key schedule)."""
    a1, a2 = synthetic_adata.copy(), synthetic_adata.copy()
    plain = _model()
    plain.fit(a1, ["batch"], max_iter=12)

    ck = _model()
    ck.fit(a2, ["batch"], max_iter=12,
           checkpoint_dir=str(tmp_path), checkpoint_every=5)
    np.testing.assert_allclose(plain.loss_history.values,
                               ck.loss_history.values, rtol=1e-4)
    np.testing.assert_allclose(a1.obsm["ALPINE_embedding"],
                               a2.obsm["ALPINE_embedding"], rtol=2e-3, atol=1e-5)
    # snapshot cleared on success
    assert not any(f.startswith("fit_snapshot") for f in os.listdir(tmp_path))


def test_checkpoint_resume(tmp_path, synthetic_adata):
    """Simulate preemption: run 5 of 12 iterations, then a fresh model must
    resume from the snapshot and finish with the identical trajectory."""
    from alpine_tpu.io.checkpoint import FitCheckpointer

    a1, a2 = synthetic_adata.copy(), synthetic_adata.copy()

    full = _model()
    full.fit(a1, ["batch"], max_iter=12,
             checkpoint_dir=str(tmp_path / "full"), checkpoint_every=4)

    # partial run: monkeypatch FitCheckpointer.clear to keep the snapshot,
    # and run only 8 iterations' worth of chunks by interrupting via
    # an exception after the 2nd chunk
    partial_dir = str(tmp_path / "partial")
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
            _model().fit(a2, ["batch"], max_iter=12,
                         checkpoint_dir=partial_dir, checkpoint_every=4)
    finally:
        FitCheckpointer.save = orig_save

    resumed = _model()
    resumed.fit(a2, ["batch"], max_iter=12,
                checkpoint_dir=partial_dir, checkpoint_every=4)
    np.testing.assert_allclose(full.loss_history.values,
                               resumed.loss_history.values, rtol=1e-4)


def test_profiling_timer(synthetic_adata):
    model = _model()
    model.fit(synthetic_adata, ["batch"], max_iter=5)
    assert "fit" in model.timings_ and model.timings_["fit"] > 0


def test_trace_context(tmp_path, synthetic_adata):
    with profiling.trace(str(tmp_path / "trace")):
        model = _model()
        model.fit(synthetic_adata, ["batch"], max_iter=3)
    # a profile directory should have been produced
    assert any("plugins" in r or "profile" in r.lower() or d
               for r, d, _ in os.walk(tmp_path / "trace"))


def test_save_load_preserves_precision_settings(tmp_path, synthetic_adata):
    """Regression: matmul_precision/data_dtype must survive a round trip."""
    m = _model(matmul_precision="default", data_dtype="bfloat16")
    m.fit(synthetic_adata, ["batch"], max_iter=4)
    p = str(tmp_path / "m")
    m.save(p)
    loaded = ALPINE.load(p, device="cpu")
    assert loaded.matmul_precision == "default"
    assert loaded.data_dtype == "bfloat16"


def test_resume_after_complete_snapshot(tmp_path, synthetic_adata):
    """Regression: a snapshot written at done == max_iter (killed before
    clear()) must resume without crashing and produce the full history."""
    from alpine_tpu.io.checkpoint import FitCheckpointer

    d = str(tmp_path / "c")
    orig_clear = FitCheckpointer.clear
    FitCheckpointer.clear = lambda self: None  # simulate dying before clear
    try:
        m1 = _model()
        m1.fit(synthetic_adata, ["batch"], max_iter=8,
               checkpoint_dir=d, checkpoint_every=4)
    finally:
        FitCheckpointer.clear = orig_clear

    m2 = _model()
    m2.fit(synthetic_adata.copy(), ["batch"], max_iter=8,
           checkpoint_dir=d, checkpoint_every=4)
    np.testing.assert_allclose(m1.loss_history.values,
                               m2.loss_history.values, rtol=1e-5)


def test_orbax_checkpoint_backend(tmp_path, synthetic_adata):
    """Orbax-backed mid-fit snapshots: same results as the npz backend."""
    pytest.importorskip("orbax.checkpoint")
    a1, a2 = synthetic_adata.copy(), synthetic_adata.copy()
    m_npz = _model()
    m_npz.fit(a1, ["batch"], max_iter=8,
              checkpoint_dir=str(tmp_path / "n"), checkpoint_every=4)
    m_orb = _model()
    m_orb.fit(a2, ["batch"], max_iter=8,
              checkpoint_dir=str(tmp_path / "o"), checkpoint_every=4,
              checkpoint_backend="orbax")
    np.testing.assert_allclose(m_npz.loss_history.values,
                               m_orb.loss_history.values, rtol=1e-6)


def test_orbax_relative_path_and_overwrite(tmp_path, monkeypatch):
    """Regression: orbax requires absolute paths (we absolutize), and saves
    must never destroy the previous snapshot before the new one commits."""
    pytest.importorskip("orbax.checkpoint")
    from alpine_tpu.io.checkpoint import FitCheckpointer

    monkeypatch.chdir(tmp_path)
    ck = FitCheckpointer("relative_dir", {"x": 1}, backend="orbax")
    W = np.ones((2, 2), np.float32)
    ck.save(1, W, W, (), np.zeros((1, 2), np.float32))
    assert ck.load()[0] == 1
    ck.save(2, W, W, (), np.zeros((2, 2), np.float32))
    assert ck.load()[0] == 2
    ck.clear()
    assert ck.load() is None


def test_corrupt_snapshot_warns_not_silent(tmp_path):
    """A truncated/garbage snapshot must degrade to a fresh fit WITH a
    warning naming the file (round-1 advisor finding), and unexpected
    errors must not be swallowed."""
    import warnings as _warnings

    from alpine_tpu.io.checkpoint import FitCheckpointer

    ck = FitCheckpointer(str(tmp_path), {"k": 1})
    with open(ck.path, "wb") as f:
        f.write(b"not a zip archive")
    with pytest.warns(UserWarning, match="unreadable"):
        assert ck.load() is None


def test_orbax_old_snapshot_fallback(tmp_path):
    """A preemption between save()'s two renames leaves only '<path>.old';
    load() must restore it instead of silently restarting from scratch."""
    import os as _os

    pytest.importorskip("orbax.checkpoint")
    from alpine_tpu.io.checkpoint import FitCheckpointer

    ck = FitCheckpointer(str(tmp_path), {"x": 1}, backend="orbax")
    W = np.ones((2, 2), np.float32)
    ck.save(3, W, W, (), np.zeros((3, 2), np.float32))
    # simulate dying after `rename(path, path+'.old')` but before
    # `rename(tmp, path)`
    _os.rename(ck.path, ck.path + ".old")
    restored = ck.load()
    assert restored is not None and restored[0] == 3
    ck.clear()
    assert not _os.path.exists(ck.path + ".old")
    assert ck.load() is None


def test_checkpointed_verbose_bar_reaches_global_total(synthetic_adata, monkeypatch):
    """Chunked/checkpointed fits re-run the scan with per-chunk iteration
    indices starting at 0; the absolute-position progress hook must add the
    chunk base so the bar ends at max_iter, not at the last chunk's size."""
    positions = []

    class FakeBar:
        def __init__(self, total=None, **kw):
            self.total = total
            self.n = 0

        def set_postfix(self, *a, **kw):
            pass

        def refresh(self):
            positions.append(self.n)

        def close(self):
            pass

    import tqdm as tqdm_mod

    monkeypatch.setattr(tqdm_mod, "tqdm", FakeBar)
    import os as _os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        m = _model()
        m.fit(synthetic_adata.copy(), ["batch"], max_iter=12, verbose=True,
              checkpoint_dir=d, checkpoint_every=5)
    assert positions, "hook never fired"
    assert max(positions) == 12, positions
    # monotone non-decreasing: no per-chunk resets
    assert all(b >= a for a, b in zip(positions, positions[1:])), positions


def test_clear_removes_crash_leaked_tmp(tmp_path):
    """A preemption mid-save leaves a full-size .tmp snapshot; clear() must
    sweep it along with the snapshot itself."""
    from alpine_tpu.io.checkpoint import FitCheckpointer

    ck = FitCheckpointer(str(tmp_path), {"x": 1})
    W = np.ones((2, 2), np.float32)
    ck.save(1, W, W, (), np.zeros((1, 2), np.float32))
    with open(ck.path + ".tmp.npz", "wb") as f:
        f.write(b"partial write from a preempted save")
    ck.clear()
    assert not os.path.exists(ck.path)
    assert not os.path.exists(ck.path + ".tmp.npz")
