"""Multi-process (DCN) execution: 2 real OS processes, per-process shard
ingestion, cross-process collectives (gloo CPU transport), and agreement
with the single-process fit (round-2 verdict item 2 — "make multi-host
real").

The parent (this test, pinned to CPU by conftest) computes the expected
single-device trajectory, then launches two workers that each:

- `jax.distributed.initialize` against a localhost coordinator,
- build ONLY their own half of the cells and fit over the global 4-device
  mesh (2 local devices per process) — per-process ingestion via
  `jax.make_array_from_process_local_data` (parallel/mesh.py Placement),
- compare the loss trajectory and their local embedding rows against the
  parent's single-device fit,
- run a shard-local minibatch fit and an out-of-sample transform.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # see pyproject: excluded from the default gate

from .conftest import make_synthetic_adata

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import numpy as np

port, pid, nprocs, workdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")

from alpine_tpu.parallel import distributed as dist
dist.initialize(coordinator_address=f"localhost:{port}",
                num_processes=nprocs, process_id=pid)
assert dist.process_count() == nprocs
assert len(jax.devices()) == 2 * nprocs, jax.devices()

from tests.conftest import make_synthetic_adata
from alpine_tpu import ALPINE

full = make_synthetic_adata(n_cells=96, n_genes=32, seed=2)
n_local = 96 // nprocs
lo, hi = pid * n_local, (pid + 1) * n_local
adata_local = full[np.arange(lo, hi)].copy()

mesh = dist.global_cell_mesh()
kw = dict(n_components=6, n_covariate_components=[2, 3], lam=[1.0, 2.0],
          random_state=0, data_dtype="float32")
model = ALPINE(device=mesh, **kw)
model.fit(adata_local, ["batch", "condition"], max_iter=12)

expected_losses = np.load(os.path.join(workdir, "expected_losses.npy"))
expected_emb = np.load(os.path.join(workdir, "expected_embedding.npy"))
np.testing.assert_allclose(model.loss_history.values, expected_losses,
                           rtol=1e-4)
np.testing.assert_allclose(adata_local.obsm["ALPINE_embedding"],
                           expected_emb[lo:hi], rtol=5e-3, atol=1e-5)

# shard-local minibatch over the multi-process mesh
mb = ALPINE(device=mesh, **kw)
mb.fit(adata_local, ["batch", "condition"], max_iter=6, batch_size=24)
L = mb.loss_history["total loss"].to_numpy()
assert np.isfinite(L).all() and L[-1] < L[0], L

# out-of-sample transform on a fresh local shard
fresh = make_synthetic_adata(n_cells=96, n_genes=32, seed=7)
fresh_local = fresh[np.arange(lo, hi)].copy()
model.transform(fresh_local, n_iter=5)
emb = fresh_local.obsm["ALPINE_embedding"]
assert emb.shape == (n_local, 6) and np.isfinite(emb).all()

# --- near-equal shards via h5ad row-range ingestion (out-of-core path) ---
# 95 cells over 2 processes -> 48/47: every step below exercises ragged
# per-chunk pads (process 1 pads one extra zero column to the common width)
from alpine_tpu.io.h5ad import h5ad_dims, read_h5ad

h5 = os.path.join(workdir, "unequal.h5ad")
n_obs, n_vars = h5ad_dims(h5)
assert (n_obs, n_vars) == (95, 32), (n_obs, n_vars)
lo2, hi2 = dist.process_cell_range(n_obs)
assert (hi2 - lo2) == (48 if pid == 0 else 47), (lo2, hi2)
local2 = read_h5ad(h5, obs_range=(lo2, hi2))
uq = ALPINE(device=mesh, **kw)
uq.fit(local2, ["batch", "condition"], max_iter=12)
exp_u_losses = np.load(os.path.join(workdir, "expected_unequal_losses.npy"))
exp_u_emb = np.load(os.path.join(workdir, "expected_unequal_embedding.npy"))
np.testing.assert_allclose(uq.loss_history.values, exp_u_losses, rtol=1e-4)
np.testing.assert_allclose(local2.obsm["ALPINE_embedding"],
                           exp_u_emb[lo2:hi2], rtol=5e-3, atol=1e-5)

# near-equal shards also ride the shard-local minibatch path (pad columns
# are neutral dead slots in the per-shard draws)
uqmb = ALPINE(device=mesh, **kw)
uqmb.fit(local2, ["batch", "condition"], max_iter=6, batch_size=24)
Lu = uqmb.loss_history["total loss"].to_numpy()
assert np.isfinite(Lu).all() and Lu[-1] < Lu[0], Lu

# transform with near-equal fresh shards (changed X -> cache miss, so the
# ragged-pad ingestion path runs rather than the fit's cached device X)
f2 = read_h5ad(h5, obs_range=(lo2, hi2))
f2.X = f2.X + 0.25
uq.transform(f2, n_iter=5)
assert f2.obsm["ALPINE_embedding"].shape == (hi2 - lo2, 6)
assert np.isfinite(f2.obsm["ALPINE_embedding"]).all()

# an explicit int dtype that only ONE shard cannot represent must raise
# on EVERY process (collective validation; a lone raise would deadlock
# the others at the next collective)
bad_local = full[np.arange(lo, hi)].copy()
bad_local.X = np.floor(bad_local.X).clip(0, 100)
if pid == 1:
    bad_local.X[0, 0] = 300.0  # > int8 max, on process 1's shard only
mbad = ALPINE(device=mesh, data_dtype="int8", **{k: v for k, v in kw.items()
                                                 if k != "data_dtype"})
try:
    mbad.fit(bad_local, ["batch", "condition"], max_iter=2)
    raise AssertionError("expected ValueError for unrepresentable shard")
except ValueError as e:
    assert "cannot represent" in str(e), e

# --- multi-process checkpoint/resume (per-rank snapshots) ---
from alpine_tpu.io.checkpoint import FitCheckpointer

# full checkpointed fit: the chunked mp trajectory equals the plain one
ck = ALPINE(device=mesh, **kw)
ck.fit(adata_local, ["batch", "condition"], max_iter=12,
       checkpoint_dir=os.path.join(workdir, "mp_ckpt"), checkpoint_every=4)
np.testing.assert_allclose(ck.loss_history.values, expected_losses,
                           rtol=1e-4)

# preemption on BOTH ranks after the iteration-8 snapshot, then resume:
# the restarted fit must actually load iteration 8 and finish with the
# uninterrupted trajectory
ckdir2 = os.path.join(workdir, "mp_ckpt_resume")
orig_save, orig_load = FitCheckpointer.save, FitCheckpointer.load
def interrupting_save(self, iteration, W, H, Bs, losses):
    orig_save(self, iteration, W, H, Bs, losses)
    if iteration >= 8:
        raise KeyboardInterrupt
FitCheckpointer.save = interrupting_save
try:
    try:
        ALPINE(device=mesh, **kw).fit(
            adata_local, ["batch", "condition"], max_iter=12,
            checkpoint_dir=ckdir2, checkpoint_every=4)
        raise AssertionError("expected KeyboardInterrupt")
    except KeyboardInterrupt:
        pass
finally:
    FitCheckpointer.save = orig_save
loaded = {}
def recording_load(self):
    r = orig_load(self)
    loaded["it"] = None if r is None else int(r[0])
    return r
FitCheckpointer.load = recording_load
try:
    res = ALPINE(device=mesh, **kw)
    res.fit(adata_local, ["batch", "condition"], max_iter=12,
            checkpoint_dir=ckdir2, checkpoint_every=4)
finally:
    FitCheckpointer.load = orig_load
assert loaded["it"] == 8, loaded
np.testing.assert_allclose(res.loss_history.values, expected_losses,
                           rtol=1e-4)
np.testing.assert_allclose(adata_local.obsm["ALPINE_embedding"],
                           expected_emb[lo:hi], rtol=5e-3, atol=1e-5)

# disagreeing snapshots (rank 1's is missing): every rank must restart
# from scratch — same final trajectory, and NO collective deadlock
ckdir3 = os.path.join(workdir, "mp_ckpt_disagree")
FitCheckpointer.save = interrupting_save
try:
    try:
        ALPINE(device=mesh, **kw).fit(
            adata_local, ["batch", "condition"], max_iter=12,
            checkpoint_dir=ckdir3, checkpoint_every=4)
    except KeyboardInterrupt:
        pass
finally:
    FitCheckpointer.save = orig_save
if pid == 1:
    import glob
    for f in glob.glob(os.path.join(ckdir3, "fit_snapshot_*")):
        os.remove(f)
import warnings as _w
with _w.catch_warnings():
    _w.simplefilter("ignore")  # coordinator warns about the disagreement
    dis = ALPINE(device=mesh, **kw)
    dis.fit(adata_local, ["batch", "condition"], max_iter=12,
            checkpoint_dir=ckdir3, checkpoint_every=4)
np.testing.assert_allclose(dis.loss_history.values, expected_losses,
                           rtol=1e-4)

# --- multi-process ComponentOptimizer (trial-level parallel search) ---
from alpine_tpu import ComponentOptimizer

opt = ComponentOptimizer(full, ["batch"], device=mesh, max_iter=6,
                         random_state=0, data_dtype="float32")
assert opt._mp_workers == nprocs and opt._mp_rank == pid
# count how many trials THIS process actually fit (the work must be split)
n_eval = {"n": 0}
orig_calc = ComponentOptimizer.calc_score
def counting_calc(self, args):
    n_eval["n"] += 1
    return orig_calc(self, args)
ComponentOptimizer.calc_score = counting_calc
try:
    best = opt.search_hyperparams(
        n_total_components_range=(8, 16), lam_range=(1.0, 100.0),
        n_splits=2, max_evals=6)
finally:
    ComponentOptimizer.calc_score = orig_calc
assert len(opt.trials.trials) == 6
# identical trials on every process (losses exchanged, records rebuilt)
losses = np.asarray([t["result"].get("loss", np.inf)
                     for t in opt.trials.trials], np.float64)
statuses = np.asarray([1.0 if t["result"]["status"] == "ok" else 0.0
                       for t in opt.trials.trials])
dist.assert_same_across_processes(np.concatenate([losses, statuses]),
                                  "multi-process search trials")
dist.assert_same_across_processes(
    [float(best["n_components"]), float(best["lam"][0])],
    "multi-process search best_param")
# the work was split: each process evaluated only its own round indices
n_ok = int(statuses.sum())
counts = dist.process_allgather_rows(np.asarray([n_eval["n"]], np.int64))
assert counts.sum() == n_ok, (counts, n_ok)
if n_ok >= 2:
    assert (counts > 0).sum() >= 2, counts  # both processes contributed
# replicated refit: identical model everywhere
bestfit = opt.fit_the_best_param()
dist.assert_same_across_processes(
    bestfit.loss_history["total loss"].to_numpy()[-1:],
    "fit_the_best_param final loss")

# pickle round-trip re-runs the construction-time consistency digest (a
# collective — both ranks must do it in lockstep) and rebuilds the topology
import pickle as _pickle
opt_rt = _pickle.loads(_pickle.dumps(opt))
assert opt_rt._mp_workers == nprocs and opt_rt._mp_rank == pid

# max_iter DETECTION under real collectives: the first trial runs as a
# replicated size-1 round on every process (elbow detection side effects
# replayed), then the frozen-max_iter rounds go parallel — the k=1 -> k=n
# transition and the post-search drift digest cross real gloo here
opt_det = ComponentOptimizer(full, ["batch"], device=mesh, max_iter=None,
                             random_state=1, data_dtype="float32")
det_eval = {"n": 0}
def det_counting_calc(self, args):
    det_eval["n"] += 1
    return orig_calc(self, args)
ComponentOptimizer.calc_score = det_counting_calc
try:
    opt_det.search_hyperparams(
        n_total_components_range=(8, 16), lam_range=(1.0, 100.0),
        n_splits=2, max_evals=5)
finally:
    ComponentOptimizer.calc_score = orig_calc
assert opt_det.max_iter is not None  # detection ran and froze
det_losses = np.asarray([t["result"].get("loss", np.inf)
                         for t in opt_det.trials.trials], np.float64)
assert len(det_losses) == 5
dist.assert_same_across_processes(
    np.concatenate([det_losses, [float(opt_det.max_iter)]]),
    "max_iter-detection search (trials + frozen max_iter)")
# the replicated detection rounds ran on EVERY process, the parallel
# remainder was split: total local evals exceed a pure split but stay
# below every-process-evaluates-everything
det_counts = dist.process_allgather_rows(
    np.asarray([det_eval["n"]], np.int64)).ravel()
det_ok = int(sum(1 for t in opt_det.trials.trials
                 if t["result"]["status"] == "ok"))
assert det_counts.sum() > det_ok or det_ok == 0, (det_counts, det_ok)
assert det_counts.sum() < nprocs * det_ok + nprocs, (det_counts, det_ok)

# mixed data_dtype REGIMES across ranks must die in the FIRST collective
# with a clear error on every rank: a rank in auto mode runs a
# harmonization allgather that explicit ranks skip, so letting the fit
# proceed would misalign the collective sequences themselves (hang)
mix_kw = {k: v for k, v in kw.items() if k != "data_dtype"}
mix = ALPINE(device=mesh, data_dtype=("auto" if pid == 1 else "float32"),
             **mix_kw)
try:
    mix.fit(adata_local, ["batch", "condition"], max_iter=2)
    raise AssertionError("expected ValueError for mixed data_dtype")
except ValueError as e:
    assert "differs across processes" in str(e), e

# mixed checkpoint_dir PRESENCE must die the same way: the checkpointing
# rank runs run_checkpointed's resume-state allgather, which has no
# counterpart on the plain rank — without the first-collective check the
# fleet deadlocks with no error anywhere
mixck = ALPINE(device=mesh, **kw)
try:
    mixck.fit(adata_local, ["batch", "condition"], max_iter=2,
              checkpoint_dir=(os.path.join(workdir, "mix_ck")
                              if pid == 0 else None))
    raise AssertionError("expected ValueError for mixed checkpoint_dir")
except ValueError as e:
    assert "differs across processes" in str(e), e

# full-batch ALS multi-process: block-cyclic updates over the sharded X
# (interleaved zero pad columns are exact fixed points of every block
# update) — trajectory must match the single-device ALS fit
als = ALPINE(device=mesh, use_als=True, **{k: v for k, v in kw.items()})
als.fit(adata_local, ["batch", "condition"], max_iter=8)
exp_als = np.load(os.path.join(workdir, "expected_als_losses.npy"))
np.testing.assert_allclose(als.loss_history.values, exp_als, rtol=1e-4)

# ALS + minibatch is rejected multi-process on EVERY rank (the global
# sampler assumes suffix padding; interleaved per-chunk pads would be
# sampled while displaced real cells go untrained)
mals = ALPINE(device=mesh, use_als=True,
              **{k: v for k, v in kw.items()})
try:
    mals.fit(adata_local, ["batch", "condition"], max_iter=2, batch_size=24)
    raise AssertionError("expected ValueError for mp ALS minibatch")
except ValueError as e:
    assert "ALS minibatch" in str(e), e

# multi-process TILED minibatch (round-4: the lifted support-matrix cell):
# per-chunk seeded LOCAL shuffles + per-shard tile permutations — no
# global exchange.  Loss must decrease, and the H column returned for a
# marked outlier cell must be the right one in CALLER order (pairing
# survives the local shuffle + interleaved pads).
td = full[np.arange(lo, hi)].copy()
tX = np.asarray(td.X).copy()
marked = 5
tX[marked] += 50.0
td.X = tX
tl = ALPINE(device=mesh, **kw)
tl.fit(td, ["batch", "condition"], max_iter=6, batch_size=24,
       sampling_method="tiled")
Lt = tl.loss_history["total loss"].to_numpy()
assert np.isfinite(Lt).all() and Lt[-1] < Lt[0], Lt
emb_t = np.concatenate([td.obsm[k] for k in
                        ("batch", "condition", "ALPINE_embedding")], axis=1)
assert emb_t.shape[0] == n_local
assert np.linalg.norm(emb_t, axis=1).argmax() == marked

# ...and the mp joint-minibatch paths train EVERY real cell: an untrained
# cell would keep its H0 column bit-identical across different max_iter
# runs (the ALS-minibatch failure mode this matrix rejects).  Checked for
# both the random shard-local sampler and the tiled one.
for smeth in ("random", "tiled"):
    skw = dict(batch_size=24, sampling_method=smeth) if smeth == "tiled" \
        else dict(batch_size=24)
    a3 = full[np.arange(lo, hi)].copy()
    a6 = full[np.arange(lo, hi)].copy()
    f3 = ALPINE(device=mesh, **kw)
    f3.fit(a3, ["batch", "condition"], max_iter=3, **skw)
    f6 = ALPINE(device=mesh, **kw)
    f6.fit(a6, ["batch", "condition"], max_iter=6, **skw)
    h3 = np.concatenate([f3.matrices["Hs"][j] for j in range(3)], axis=0)
    h6 = np.concatenate([f6.matrices["Hs"][j] for j in range(3)], axis=0)
    changed = (h3 != h6).any(axis=0)
    assert changed.all(), (smeth, int((~changed).sum()), "untrained cells")

# gathered 'weighted' stays rejected multi-process on EVERY rank (its
# global pre-shuffle needs a host-side cell exchange)
mw = ALPINE(device=mesh, **kw)
try:
    mw.fit(adata_local, ["batch", "condition"], max_iter=2,
           sampling_method="weighted")
    raise AssertionError("expected ValueError for mp weighted")
except ValueError as e:
    assert "not supported in multi-process" in str(e), e

# weighted_fast IS supported multi-process (round-5: the replicated exact
# balanced draw — every process draws the same global stream from the
# shared key and scatter-adds only its own cells) and must MATCH the
# single-process weighted_fast trajectory on the same key: losses exactly
# the same sequence (to psum summation order) and each rank's local
# embeddings equal to the single-process fit's rows
wf = ALPINE(device=mesh, **kw)
wf_local = full[np.arange(lo, hi)].copy()
wf.fit(wf_local, ["batch", "condition"], max_iter=10,
       sampling_method="weighted_fast")
exp_wf_losses = np.load(os.path.join(workdir, "expected_wf_losses.npy"))
exp_wf_emb = np.load(os.path.join(workdir, "expected_wf_embedding.npy"))
np.testing.assert_allclose(wf.loss_history.values, exp_wf_losses, rtol=1e-4)
np.testing.assert_allclose(wf_local.obsm["ALPINE_embedding"],
                           exp_wf_emb[lo:hi], rtol=5e-3, atol=1e-5)

# ... including NEAR-EQUAL chunks (48/47 via the h5ad row-range recipe):
# ragged per-chunk group layouts + interleaved pads must still realize the
# single-process draw
wfu = ALPINE(device=mesh, **kw)
wfu_local = read_h5ad(h5, obs_range=(lo2, hi2))
wfu.fit(wfu_local, ["batch", "condition"], max_iter=10,
        sampling_method="weighted_fast")
exp_wfu = np.load(os.path.join(workdir, "expected_wf_unequal_losses.npy"))
np.testing.assert_allclose(wfu.loss_history.values, exp_wfu, rtol=1e-4)

# ... and SKEWED JOINT-group layouts: the (b1, c1) joint group is
# ENTIRELY ABSENT from chunk 0 (while every chunk still sees both levels
# of each covariate — the per-process one-hot label sets must match) —
# the allgathered layout places the absent group's chunk-0 windows as
# empty (m_loc = 0, never drawn locally) and the global draw still
# matches single-process
skew = np.load(os.path.join(workdir, "skew_X.npy"))
skew_batch = np.load(os.path.join(workdir, "skew_batch.npy"),
                     allow_pickle=True)
skew_cond = np.load(os.path.join(workdir, "skew_cond.npy"),
                    allow_pickle=True)
import pandas as _pd
from alpine_tpu import AnnData as _AD
skew_obs = _pd.DataFrame({"batch": skew_batch, "condition": skew_cond},
                         index=[f"s{i}" for i in range(skew.shape[0])])
skew_full = _AD(skew, obs=skew_obs)
skew_local = skew_full[np.arange(lo, hi)].copy()
wfs = ALPINE(device=mesh, **{**kw, "n_covariate_components": [2, 2],
                             "lam": [1.0, 1.0]})
wfs.fit(skew_local, ["batch", "condition"], max_iter=8,
        sampling_method="weighted_fast")
exp_skew = np.load(os.path.join(workdir, "expected_wf_skew_losses.npy"))
np.testing.assert_allclose(wfs.loss_history.values, exp_skew, rtol=1e-4)

# mixed ctor hyperparameters (lam here) must die in the first collective:
# scalar hypers are traced, so a mixed fleet would not crash — the
# replicated W/Bs would silently desynchronize instead
mix_lam = ALPINE(device=mesh,
                 **{**kw, "lam": [1.0, 2.0] if pid == 0 else [1.0, 3.0]})
try:
    mix_lam.fit(adata_local, ["batch", "condition"], max_iter=2)
    raise AssertionError("expected ValueError for mixed lam")
except ValueError as e:
    assert "differs across processes" in str(e), e

# coordinator gating helper
assert dist.is_coordinator() == (pid == 0)
print(f"WORKER-{pid}-OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_fit(tmp_path):
    from alpine_tpu import ALPINE

    # expected single-device trajectory (identical global H0/W0 draws: the
    # multi-process path slices the same global init per process)
    full = make_synthetic_adata(n_cells=96, n_genes=32, seed=2)
    single = ALPINE(n_components=6, n_covariate_components=[2, 3],
                    lam=[1.0, 2.0], random_state=0, data_dtype="float32",
                    device="cpu")
    single.fit(full, ["batch", "condition"], max_iter=12)
    np.save(tmp_path / "expected_losses.npy", single.loss_history.values)
    np.save(tmp_path / "expected_embedding.npy",
            full.obsm["ALPINE_embedding"])

    # full-batch ALS — the only ALS configuration allowed multi-process
    # (minibatch ALS is rejected); trajectory must match single-device
    single_als = ALPINE(n_components=6, n_covariate_components=[2, 3],
                        lam=[1.0, 2.0], random_state=0,
                        data_dtype="float32", use_als=True, device="cpu")
    single_als.fit(full, ["batch", "condition"], max_iter=8)
    np.save(tmp_path / "expected_als_losses.npy",
            single_als.loss_history.values)

    # near-equal-shard dataset (95 cells -> 48/47): workers ingest it by
    # h5ad row range (the out-of-core recipe); expected trajectory comes
    # from the single-device fit on the full data
    from alpine_tpu.io.h5ad import write_h5ad

    full95 = make_synthetic_adata(n_cells=95, n_genes=32, seed=3)
    write_h5ad(full95, str(tmp_path / "unequal.h5ad"))
    single95 = ALPINE(n_components=6, n_covariate_components=[2, 3],
                      lam=[1.0, 2.0], random_state=0, data_dtype="float32",
                      device="cpu")
    single95.fit(full95, ["batch", "condition"], max_iter=12)
    np.save(tmp_path / "expected_unequal_losses.npy",
            single95.loss_history.values)
    np.save(tmp_path / "expected_unequal_embedding.npy",
            full95.obsm["ALPINE_embedding"])

    # single-process weighted_fast expectations (the mp replicated exact
    # sampler must reproduce these trajectories bit-for-draw)
    full_wf = make_synthetic_adata(n_cells=96, n_genes=32, seed=2)
    single_wf = ALPINE(n_components=6, n_covariate_components=[2, 3],
                       lam=[1.0, 2.0], random_state=0, data_dtype="float32",
                       device="cpu")
    single_wf.fit(full_wf, ["batch", "condition"], max_iter=10,
                  sampling_method="weighted_fast")
    np.save(tmp_path / "expected_wf_losses.npy",
            single_wf.loss_history.values)
    np.save(tmp_path / "expected_wf_embedding.npy",
            full_wf.obsm["ALPINE_embedding"])
    single95_wf = ALPINE(n_components=6, n_covariate_components=[2, 3],
                         lam=[1.0, 2.0], random_state=0,
                         data_dtype="float32", device="cpu")
    single95_wf.fit(make_synthetic_adata(n_cells=95, n_genes=32, seed=3),
                    ["batch", "condition"], max_iter=10,
                    sampling_method="weighted_fast")
    np.save(tmp_path / "expected_wf_unequal_losses.npy",
            single95_wf.loss_history.values)

    # skewed-JOINT-group dataset: every chunk sees BOTH levels of each
    # covariate (the per-process one-hot label sets must match — an
    # existing mp contract), but the joint combination (b1, c1) appears
    # ONLY in process 1's half — so one joint group is entirely absent
    # from chunk 0 (the empty-window corner of the replicated exact
    # sampler: m_loc = 0 for that group on every chunk-0 device)
    rs = np.random.default_rng(11)
    skew_X = (rs.gamma(2.0, 1.0, (32, 6)) @ rs.gamma(2.0, 1.0, (6, 96))
              + rs.random((32, 96))).astype(np.float32).T
    skew_batch = np.array([f"b{v}" for v in rs.integers(0, 2, 96)],
                          dtype=object)
    skew_cond = np.array([f"c{v}" for v in rs.integers(0, 2, 96)],
                         dtype=object)
    first = skew_batch[:48] == "b1"
    skew_cond[:48][first] = "c0"  # chunk 0: no (b1, c1) cells
    assert (skew_cond[:48][skew_batch[:48] == "b1"] == "c0").all()
    assert ((skew_batch[48:] == "b1") & (skew_cond[48:] == "c1")).any()
    np.save(tmp_path / "skew_X.npy", skew_X)
    np.save(tmp_path / "skew_batch.npy", skew_batch)
    np.save(tmp_path / "skew_cond.npy", skew_cond)
    import pandas as pd
    from alpine_tpu import AnnData

    skew_full = AnnData(
        skew_X, obs=pd.DataFrame({"batch": skew_batch, "condition": skew_cond},
                                 index=[f"s{i}" for i in range(96)]))
    single_skew = ALPINE(n_components=6, n_covariate_components=[2, 2],
                         lam=[1.0, 1.0], random_state=0,
                         data_dtype="float32", device="cpu")
    single_skew.fit(skew_full, ["batch", "condition"], max_iter=8,
                    sampling_method="weighted_fast")
    np.save(tmp_path / "expected_wf_skew_losses.npy",
            single_skew.loss_history.values)

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid), "2",
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=_REPO, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER-{pid}-OK" in out, out[-2000:]


def test_placement_multiprocess_detection():
    """Single-process meshes must never take the make_array path."""
    import jax

    from alpine_tpu.parallel.mesh import Placement, make_cell_mesh

    p = Placement(make_cell_mesh(min(2, len(jax.devices()))))
    assert not p.is_multiprocess
    assert p.local_cell_shards == p.cell_shards
    assert p.n_processes == 1
    assert p.process_chunk_index == 0


def test_assert_same_across_processes_single_is_noop():
    from alpine_tpu.parallel import distributed as dist

    dist.assert_same_across_processes([1, 2, 3], "anything")  # no raise


def test_optimizer_multiprocess_mesh_setup(monkeypatch):
    """Multi-process meshes run TRIAL-level parallel searches: the
    optimizer derives this process's LOCAL sub-mesh for its own fits (CV
    folds are host-side subsets of the full data — a multi-process fit
    would re-interpret them as per-process shards).  2-D multi-process
    meshes are rejected with guidance.  The real 2-process search runs in
    the worker of test_two_process_sharded_fit."""
    import jax
    from jax.sharding import Mesh

    from alpine_tpu import ComponentOptimizer
    from alpine_tpu.parallel import mesh as mesh_mod
    from .conftest import make_synthetic_adata

    monkeypatch.setattr(
        mesh_mod.Placement, "is_multiprocess",
        property(lambda self: self.mesh is not None),
    )
    adata = make_synthetic_adata(n_cells=40, n_genes=10)
    # 1-D "multi-process" mesh (single process here, so the consistency
    # collectives are no-ops): constructs, local exec mesh derived
    opt = ComponentOptimizer(adata, ["batch"],
                             device=mesh_mod.make_cell_mesh(1), max_iter=5)
    assert isinstance(opt._exec_device, Mesh)
    assert all(d.process_index == jax.process_index()
               for d in opt._exec_device.devices.flat)
    # 2-D multi-process meshes: rejected up front
    if len(jax.devices()) >= 2:
        with pytest.raises(NotImplementedError, match="1-D"):
            ComponentOptimizer(adata, ["batch"],
                               device=mesh_mod.make_gene_cell_mesh(2, 1))
    # non-mesh devices unaffected by the (patched) property
    ComponentOptimizer(adata, ["batch"], device="cpu", max_iter=5)


def test_pallas_pad_minibatch_keys_on_global_cells():
    """Multi-process fits pad the LOCAL chunk but decide minibatch-vs-full
    mode on the GLOBAL cell count: a global batch_size between the two must
    yield no fused-kernel tile pad (the fit runs the shard-local minibatch
    XLA path), while a full-batch fit of the same shape keeps its pad."""
    from alpine_tpu import ALPINE

    def make():
        m = ALPINE(n_components=6, n_covariate_components=[2], lam=[1.0],
                   device="cpu", random_state=0, data_dtype="float32")
        m.n_features = 2000
        m.sampling_method = "random"
        m._use_tpu_kernels = lambda: True  # simulate the TPU branch
        return m

    m = make()
    m.batch_size = 60_000  # n_local (50k) < batch_size < n_global (100k)
    assert m._pallas_pad(50_000, (2,), n_devices=4, include_unguided=True,
                         global_cells=100_000) == 0
    # same local shape, full-batch global fit: the tile pad applies
    m2 = make()
    m2.batch_size = 100_000
    pad = m2._pallas_pad(50_000, (2,), n_devices=4, include_unguided=True,
                         global_cells=100_000)
    assert pad is not None and pad >= 0
