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


# ------------------------------------------------- shard-local minibatching


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_minibatch_update_matches_unsharded():
    """joint_batch_update with r=psum under shard_map on a cell-sharded
    batch must equal the unsharded update bit-for-bit-ish: the psum hook
    only changes WHERE cell-axis contractions reduce, not the math."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from alpine_tpu.ops import mu

    r = np.random.default_rng(0)
    g, n = 12, 64
    blocks, n_labels = (3, 5), (2,)
    cfg = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=n)
    X = jnp.asarray(r.random((g, n), dtype=np.float32))
    Y = np.zeros((2, n), np.float32)
    Y[r.integers(0, 2, n), np.arange(n)] = 1.0
    Ys = (jnp.asarray(Y),)
    W = jnp.asarray(r.random((g, 8), dtype=np.float32) + 0.1)
    H = jnp.asarray(r.random((8, n), dtype=np.float32) + 0.1)
    Bs = (jnp.asarray(r.random((2, 3), dtype=np.float32) + 0.1),)
    hyper = (jnp.asarray([2.0], jnp.float32), jnp.float32(0.1),
             jnp.float32(0.2), jnp.float32(0.3), jnp.float32(1e-6))

    Wu, Bsu, Hu, _ = jax.jit(
        lambda *a: mu.joint_batch_update(cfg, *a)
    )(hyper, W, Bs, H, X, Ys)

    shard_map, sm_kwargs = mu._get_shard_map()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("cells",))
    cells, rep = P(None, "cells"), P()

    def body(W, Bs, H, X, Ys):
        psum = lambda v: jax.lax.psum(v, "cells")
        W, Bs, H, _ = mu.joint_batch_update(cfg, hyper, W, Bs, H, X, Ys, r=psum)
        return W, Bs, H

    Ws, Bss, Hs = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(rep, (rep,), cells, cells, (cells,)),
        out_specs=(rep, (rep,), cells),
        **sm_kwargs,
    ))(W, Bs, H, X, Ys)

    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wu), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hu), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Bss[0]), np.asarray(Bsu[0]),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("sampling", ["random", "weighted"])
@pytest.mark.slow
def test_sharded_minibatch_fit(sampling):
    """Minibatch fits on a mesh use shard-local sampling (SURVEY §7
    hard-part 3): they must run (including non-divisible cell counts),
    converge comparably to the single-device minibatch fit, and their
    compiled HLO must contain NO all-to-all / all-gather — only the
    all-reduce psums of the small accumulators."""
    n_cells = 181  # not divisible by 8: exercises the shard pad
    adata_a = make_synthetic_adata(n_cells=n_cells, n_genes=30, seed=9)
    adata_b = adata_a.copy()
    kw = dict(n_components=6, n_covariate_components=[2], lam=[2.0],
              random_state=0)
    fit_kw = dict(max_iter=25, batch_size=64, sampling_method=sampling)

    single = ALPINE(device="cpu", **kw)
    single.fit(adata_a, ["batch"], **fit_kw)

    mesh = make_cell_mesh(8)
    sharded = ALPINE(device=mesh, **kw)
    sharded.fit(adata_b, ["batch"], **fit_kw)

    ls = single.loss_history["total loss"].to_numpy()
    lm = sharded.loss_history["total loss"].to_numpy()
    assert np.isfinite(lm).all()
    # different (per-shard) sample streams -> statistical, not bitwise,
    # agreement: both must converge to the same level
    assert lm[-1] < lm[0] * 0.9
    np.testing.assert_allclose(lm[-1], ls[-1], rtol=0.1)
    assert adata_b.obsm["ALPINE_embedding"].shape == (n_cells, 6)

    # the compiled program must not move cell columns between shards
    import jax.numpy as jnp

    from alpine_tpu.ops import mu
    cfg = mu.MUConfig(blocks=(2, 6), n_labels=(2,), n_cells=n_cells,
                      batch_size=64, weighted=(sampling == "weighted"),
                      max_iter=2)
    fn = mu._build_sharded_minibatch_fit(cfg, mesh)
    n_padded = n_cells + (-n_cells) % 8
    X = jnp.zeros((30, n_padded)); H = jnp.ones((8, n_padded))
    Ys = (jnp.zeros((2, n_padded)),)
    Bs = (jnp.ones((2, 2)),)
    hyper = (jnp.asarray([2.0], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e-6))
    W = jnp.ones((30, 8))
    key = jax.random.PRNGKey(0)
    w = jnp.ones((n_padded,), jnp.float32)
    hlo = fn.lower(W, H, Bs, X, Ys, hyper, key, w).compile().as_text()
    assert "all-to-all" not in hlo
    assert "all-gather" not in hlo


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_weighted_sharded_fit_on_batch_sorted_data():
    """Batch-SORTED data (the real atlas layout) on a mesh with weighted
    sampling: the model layer's global shuffle must keep shards balanced
    and the returned H must be in the CALLER's cell order (verified by the
    post-hoc numpy loss recomputation from the stored embeddings)."""
    import pandas as pd

    from alpine_tpu.utils.adata import AnnData

    r = np.random.default_rng(3)
    n, g, k = 160, 24, 4
    W = r.gamma(2.0, 1.0, (g, k))
    H = r.gamma(2.0, 1.0, (k, n))
    X = (W @ H + r.random((g, n))).astype(np.float32).T
    # sorted by batch: first 120 cells are b0, last 40 are b1 (imbalanced)
    batch = np.array(["b0"] * 120 + ["b1"] * 40, dtype=object)
    obs = pd.DataFrame({"batch": batch}, index=[f"c{i}" for i in range(n)])
    adata = AnnData(X, obs=obs)

    mesh = make_cell_mesh(8)
    m = ALPINE(n_components=5, n_covariate_components=[2], lam=[2.0],
               device=mesh, random_state=0)
    m.fit(adata, ["batch"], max_iter=15, batch_size=40,
          sampling_method="weighted")
    tl = m.loss_history["total loss"].to_numpy()
    assert np.isfinite(tl).all() and tl[-1] < tl[0]

    # column order check: recomputing the loss from the STORED embeddings
    # against the caller-order adata must agree with the device-side loss
    # (a wrong unpermute would misalign cells and blow this up)
    recomputed = float(m.compute_loss(adata))
    assert np.isclose(recomputed, tl[-1], rtol=2e-2), (recomputed, tl[-1])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_als_mode_on_mesh_matches_single_device():
    """ALS (block-cyclic) fits run the GSPMD path on a mesh; trajectories
    must match the single-device fit."""
    adata_a = make_synthetic_adata(n_cells=128, n_genes=24, seed=13)
    adata_b = adata_a.copy()
    kw = dict(n_components=5, n_covariate_components=[2], lam=[2.0],
              use_als=True, random_state=0)

    single = ALPINE(device="cpu", **kw)
    single.fit(adata_a, ["batch"], max_iter=10)

    sharded = ALPINE(device=make_cell_mesh(8), **kw)
    sharded.fit(adata_b, ["batch"], max_iter=10)

    np.testing.assert_allclose(single.loss_history.values,
                               sharded.loss_history.values, rtol=1e-4)
    np.testing.assert_allclose(
        adata_a.obsm["ALPINE_embedding"], adata_b.obsm["ALPINE_embedding"],
        rtol=5e-3, atol=1e-5,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("use_als", [False, True])
@pytest.mark.slow
def test_ragged_cell_count_full_batch_mesh(use_als):
    """Full-batch fits on a mesh with cells % devices != 0 (found by
    fuzzing: only the pallas/minibatch paths padded) must run AND match
    the single-device trajectory exactly — the zero pad columns are
    neutral and the KL pad constant is stripped from the loss."""
    n_cells = 101
    adata_a = make_synthetic_adata(n_cells=n_cells, n_genes=20, seed=21)
    adata_b = adata_a.copy()
    kw = dict(n_components=4, n_covariate_components=[2], lam=[2.0],
              use_als=use_als, random_state=0)

    single = ALPINE(device="cpu", **kw)
    single.fit(adata_a, ["batch"], max_iter=10)
    sharded = ALPINE(device=make_cell_mesh(8), **kw)
    sharded.fit(adata_b, ["batch"], max_iter=10)

    np.testing.assert_allclose(single.loss_history.values,
                               sharded.loss_history.values, rtol=1e-4)
    assert adata_b.obsm["ALPINE_embedding"].shape == (n_cells, 4)
    np.testing.assert_allclose(
        adata_a.obsm["ALPINE_embedding"], adata_b.obsm["ALPINE_embedding"],
        rtol=5e-3, atol=1e-5,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_mesh_models_pickle_roundtrip():
    """Estimators holding a Mesh device must pickle (device descriptors)
    and stay usable after load."""
    import pickle

    from alpine_tpu import ComponentOptimizer

    adata = make_synthetic_adata(n_cells=96, n_genes=16, seed=30)
    mesh = make_cell_mesh(8)
    m = ALPINE(n_components=4, n_covariate_components=[2], lam=[1.0],
               device=mesh, random_state=0)
    m.fit(adata, ["batch"], max_iter=5)
    m2 = pickle.loads(pickle.dumps(m))
    from jax.sharding import Mesh
    assert isinstance(m2.device, Mesh) and m2.device.devices.size == 8
    fresh = adata.copy()
    m2.transform(fresh, n_iter=3)
    assert fresh.obsm["ALPINE_embedding"].shape == (96, 4)

    co = ComponentOptimizer(adata, ["batch"], max_iter=5, device=mesh,
                            random_state=0)
    co.search_hyperparams(n_total_components_range=(8, 12),
                          lam_range=(1.0, 10.0), n_splits=2, max_evals=2)
    co2 = pickle.loads(pickle.dumps(co))
    assert len(co2.trials.trials) == 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_ragged_mesh_checkpointed_fit(tmp_path):
    """Chunked fits (checkpointing / verbose progress chunks) on a mesh
    with ragged cell counts: chunk 1 returns H sliced to n_cells, and the
    next chunk must re-pad it against the padded X (review-confirmed crash:
    fit_scan lacked the H0 re-pad its siblings had)."""
    adata = make_synthetic_adata(n_cells=101, n_genes=16, seed=31)
    m = ALPINE(n_components=4, n_covariate_components=[2], lam=[1.0],
               device=make_cell_mesh(8), random_state=0)
    m.fit(adata, ["batch"], max_iter=10,
          checkpoint_dir=str(tmp_path), checkpoint_every=4)
    tl = m.loss_history["total loss"].to_numpy()
    assert len(tl) == 10 and np.isfinite(tl).all()
    assert adata.obsm["ALPINE_embedding"].shape == (101, 4)

    # same path via verbose progress chunks (callbacks forced unsupported)
    import alpine_tpu.models.alpine as am
    orig = am.ALPINE._callbacks_supported
    am.ALPINE._callbacks_supported = lambda self: False
    try:
        m2 = ALPINE(n_components=4, n_covariate_components=[2], lam=[1.0],
                    device=make_cell_mesh(8), random_state=0)
        m2.fit(adata.copy(), ["batch"], max_iter=10, verbose=True)
    finally:
        am.ALPINE._callbacks_supported = orig
    np.testing.assert_allclose(m2.loss_history.values[-1],
                               m.loss_history.values[-1], rtol=1e-4)


def test_sharded_verbose_progress_reports_absolute_iterations():
    """Under shard_map the host callback fires per device per iteration;
    the hook receives the ITERATION INDEX so consumers can set absolute
    progress (bar.n = it+1) instead of overcounting by n_shards."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from alpine_tpu.ops import mu

    n, g, max_iter = 64, 10, 6
    r = np.random.default_rng(0)
    X = jnp.asarray(r.random((g, n), dtype=np.float32))
    Y = np.zeros((2, n), np.float32)
    Y[r.integers(0, 2, n), np.arange(n)] = 1.0
    Ys = (jnp.asarray(Y),)
    hyper = (jnp.asarray([1.0], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e-6))
    key = jax.random.PRNGKey(0)
    cfg = mu.MUConfig(blocks=(2, 4), n_labels=(2,), n_cells=n,
                      batch_size=16, max_iter=max_iter, progress=True)
    W0, H0, Bs0 = mu.init_matrices(cfg, g, key, 1e-6)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cells",))
    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "cells")))
    rp = lambda a: jax.device_put(a, NamedSharding(mesh, P()))

    seen = []
    mu.set_progress_hook(lambda loss, it: seen.append(int(it)))
    try:
        out = mu.fit_scan_minibatch_sharded(
            cfg, mesh, rp(W0), sh(H0), tuple(rp(b) for b in Bs0),
            sh(X), tuple(sh(y) for y in Ys), hyper, key)
        np.asarray(out[3])  # force completion (callbacks flush)
    finally:
        mu.set_progress_hook(None)
    assert seen, "progress hook never fired"
    # indices are 0..max_iter-1 (possibly repeated per shard) — never more
    assert min(seen) == 0 and max(seen) == max_iter - 1
    assert set(seen) == set(range(max_iter))


@pytest.mark.slow
def test_comm_audit_cell_count_invariance():
    """The compiled sharded fit's all-reduce payload must not grow with the
    cell count (communication is O(genes*K + K^2)/iter), and must contain
    no all-to-all or all-gather (benchmarks/comm_audit.py is the runnable
    artifact; this pins the invariant in CI)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "comm_audit",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "benchmarks", "comm_audit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    a, b = mod.audit(2048), mod.audit(8192)
    assert a["allreduce_instructions"] > 0
    assert a["allreduce_bytes"] == b["allreduce_bytes"]
    assert a["all_to_all"] == 0 and a["all_gather"] == 0


def test_restarts_on_mesh_rejected_before_upload():
    """n_restarts>1 with a Mesh must raise the clean error up front — even
    with a shard-count-indivisible cell count (which used to crash in
    device_put after mutating model state)."""
    import pytest as _pytest

    from .conftest import make_synthetic_adata
    from alpine_tpu import ALPINE
    from alpine_tpu.parallel.mesh import make_cell_mesh

    adata = make_synthetic_adata(n_cells=61)  # 61 % 8 != 0
    m = ALPINE(n_components=4, n_covariate_components=[2], lam=[1.0],
               device=make_cell_mesh(), random_state=0)
    with _pytest.raises(ValueError, match="n_restarts > 1 is not supported"):
        m.fit(adata, ["batch"], max_iter=3, n_restarts=2)


def test_fold_data_placement_falls_back_to_mesh_device():
    """A mesh whose device count has no divisor among the folds must still
    pin the fold tensors to the mesh's devices, never the JAX default."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from alpine_tpu.optimize.batched import prepare_fold_data

    devs = jax.devices()
    if len(devs) < 3:
        pytest.skip("needs 3 virtual devices")
    mesh = Mesh(np.asarray(devs[1:3]), ("fold",))
    r = np.random.default_rng(0)
    X = r.random((30, 10)).astype(np.float32)
    Ys = [np.zeros((30, 2), np.float32)]
    idx = np.arange(30)
    folds = [(idx[:20], idx[20:]), (idx[5:25], idx[:5]), (idx[10:], idx[:10])]
    fd = prepare_fold_data(X, Ys, folds, weighted=False, mesh=mesh)
    placed = {d for d in fd.Xtr.devices()}
    assert placed == {devs[1]}, placed


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_callback_probe_cache_keys_on_mesh_devices():
    """The host-callback capability probe must be cached per distinct device
    set — a constant ("mesh", "mesh") key would reuse one mesh's probe
    result for a different mesh/platform in the same process (round-2
    verdict weak item 7)."""
    kw = dict(n_components=3, n_covariate_components=[], lam=[])
    devs = jax.devices()
    m1 = ALPINE(device=make_cell_mesh(1), **kw)
    m2 = ALPINE(device=make_cell_mesh(2), **kw)
    single = ALPINE(device=devs[0], **kw)

    ALPINE._callback_probe_cache.clear()
    m1._callbacks_supported()
    m2._callbacks_supported()
    single._callbacks_supported()
    keys = set(ALPINE._callback_probe_cache)
    # three distinct cache entries: 1-device mesh, 2-device mesh, plain device
    assert len(keys) == 3, keys
    # every key carries the actual platform, never a "mesh" placeholder
    assert all(k[0] == devs[0].platform for k in keys), keys


def test_local_cells_columns_width_guard():
    """A replicated (or fully-resharded) array held as ONE addressable
    shard passes the overlap check trivially — the guard must also verify
    the local width is exactly this process's share of the cell axis, or
    every process would silently keep the global array's first n_local
    columns as 'its' embedding."""
    from types import SimpleNamespace

    from alpine_tpu.parallel.mesh import Placement

    def fake_h(col_slices, n_cols):
        shards = [SimpleNamespace(index=(slice(None), sl),
                                  data=np.ones((3, (sl.stop or n_cols)
                                                - (sl.start or 0))))
                  for sl in col_slices]
        return SimpleNamespace(shape=(3, n_cols), addressable_shards=shards)

    stub = SimpleNamespace(is_multiprocess=True, cell_shards=4,
                           local_cell_shards=1)
    # replicated: one shard spanning all 8 columns on a 1-of-4 process
    with pytest.raises(ValueError, match="replicated or was resharded"):
        Placement.local_cells_columns(stub, fake_h([slice(None)], 8))
    # correct cell-sharded output: this process's 2 of 8 columns
    out = Placement.local_cells_columns(stub, fake_h([slice(2, 4)], 8))
    assert out.shape == (3, 2)
    # two local shards that overlap (replication across local devices)
    stub2 = SimpleNamespace(is_multiprocess=True, cell_shards=2,
                            local_cell_shards=2)
    with pytest.raises(ValueError, match="overlap"):
        Placement.local_cells_columns(
            stub2, fake_h([slice(0, 8), slice(0, 8)], 8))


def test_process_chunk_index_handles_unequal_device_runs(monkeypatch):
    """The chunk rank is the position of this process's first device among
    every process's first device — idxs[0] // len(idxs) silently collides
    ranks when processes own unequal device counts (p0: 2 devices, p1: 6
    -> both 0) and the downstream 'not a permutation' error would blame
    the wrong thing."""
    from types import SimpleNamespace

    from alpine_tpu.parallel.mesh import Placement

    def fake_placement(owner_by_pos):
        devs = np.empty(len(owner_by_pos), dtype=object)
        for i, pid in enumerate(owner_by_pos):
            devs[i] = SimpleNamespace(process_index=pid)
        return SimpleNamespace(is_multiprocess=True,
                               mesh=SimpleNamespace(devices=devs))

    p = fake_placement([0, 0, 1, 1, 1, 1, 1, 1])  # p0: 2 devs, p1: 6
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert Placement.process_chunk_index.fget(p) == 0
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert Placement.process_chunk_index.fget(p) == 1
    # chunk order need not follow process order (custom meshes)
    q = fake_placement([1, 1, 1, 0])
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert Placement.process_chunk_index.fget(q) == 1
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert Placement.process_chunk_index.fget(q) == 0
    # non-contiguous ownership still raises
    nc = fake_placement([0, 1, 0, 1])
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="contiguous"):
        Placement.process_chunk_index.fget(nc)
