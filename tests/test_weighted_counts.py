"""weighted_fast (counts-based weighted sampling, mu.MUConfig.weighted_counts).

The TPU-native fast strategy for full-epoch weighted fits: the epoch's n
with-replacement draws become a multinomial count vector and the drawn-
multiset statistics are count-scaled full-batch contractions on the
ungathered X (mu.joint_weighted_counts_update holds the algebra).  The
correctness anchor is EXACT-ARITHMETIC equivalence to the gathered
weighted path driven by the SAME draw — so the tests compare the two
implementations directly (same key, same weights) and to a float64
gathered oracle step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from alpine_tpu import ALPINE
from alpine_tpu.ops import mu

from .conftest import make_synthetic_adata
from .oracle import oracle_joint_step, _cat_h, _cat_w

BLOCKS = (3, 4, 6)
N_LABELS = (2, 3)
G = 25
EPS = 1e-6


def _problem(seed=0, n=40):
    r = np.random.default_rng(seed)
    X = (r.random((G, n)).astype(np.float32) * 3).round(3)
    Ys = []
    for nl in N_LABELS:
        y = np.zeros((nl, n), np.float32)
        y[r.integers(0, nl, n), np.arange(n)] = 1.0
        Ys.append(y)
    Ws = [r.random((G, k)).astype(np.float32) + 0.1 for k in BLOCKS]
    Hs = [r.random((k, n)).astype(np.float32) + 0.1 for k in BLOCKS]
    Bs = [r.random((nl, k)).astype(np.float32) + 0.1
          for nl, k in zip(N_LABELS, BLOCKS)]
    w = np.abs(r.random(n).astype(np.float32)) + 0.05
    w /= w.sum()
    return X, Ys, Ws, Hs, Bs, w


def _hyper(lam=(1.0, 2.0), orth=0.2, alpha=0.1, l1=0.5):
    return (jnp.asarray(lam, jnp.float32), jnp.float32(orth),
            jnp.float32(alpha), jnp.float32(l1), jnp.float32(EPS))


def _fit(cfg, X, Ys, Ws, Hs, Bs, w, seed=11):
    key = jax.random.PRNGKey(seed)
    return mu.fit_scan(cfg, jnp.asarray(_cat_w(Ws)), jnp.asarray(_cat_h(Hs)),
                       tuple(jnp.asarray(b) for b in Bs), jnp.asarray(X),
                       tuple(jnp.asarray(y) for y in Ys), _hyper(), key,
                       jnp.asarray(w))


def test_multinomial_counts_match_bincount():
    """The count vector is EXACTLY the bincount of the gathered path's
    choice draw over the same key (same draw, different bookkeeping)."""
    n, npad = 57, 64
    r = np.random.default_rng(3)
    w = r.random(n).astype(np.float32)
    w /= w.sum()
    key = jax.random.PRNGKey(5)
    c = np.asarray(mu.multinomial_counts(key, n, jnp.asarray(w), npad))
    idx = np.asarray(jax.random.choice(key, n, shape=(n,), replace=True,
                                       p=jnp.asarray(w)))
    np.testing.assert_array_equal(c, np.bincount(idx, minlength=npad))
    assert c[n:].sum() == 0 and c.sum() == n


@pytest.mark.parametrize("loss_kl", [True, False])
def test_counts_trajectory_matches_gathered(loss_kl):
    """Same key, same weights: the counts fit and the gathered fit follow
    the same draw sequence, so trajectories agree to float summation order
    (the only difference between the two formulations)."""
    n, iters = 53, 4
    X, Ys, Ws, Hs, Bs, w = _problem(seed=7, n=n)
    base = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                       loss_kl=loss_kl, weighted=True, max_iter=iters)
    Wg, Hg, Bsg, Lg = _fit(base, X, Ys, Ws, Hs, Bs, w)
    Wc, Hc, Bsc, Lc = _fit(replace(base, weighted_counts=True),
                           X, Ys, Ws, Hs, Bs, w)
    np.testing.assert_allclose(np.asarray(Wg), np.asarray(Wc),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Hg), np.asarray(Hc),
                               rtol=2e-4, atol=1e-6)
    for bg, bc in zip(Bsg, Bsc):
        np.testing.assert_allclose(np.asarray(bg), np.asarray(bc),
                                   rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Lg), np.asarray(Lc),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("trial", [0,
                                   pytest.param(1, marks=pytest.mark.slow),
                                   pytest.param(2, marks=pytest.mark.slow)])
def test_fuzz_counts_matches_gathered(trial):
    """Randomized configs (block structures, covariate counts, hypers,
    loss type, cell counts): the counts fit must track the gathered fit
    driven by the same key across the whole config space — the fuzz-level
    pin that the count-scaling algebra covers every term."""
    r = np.random.default_rng(100 + trial)
    n_cov = int(r.integers(1, 4))
    blocks = tuple(int(b) for b in r.integers(2, 7, n_cov + 1))
    n_labels = tuple(int(l) for l in r.integers(2, 5, n_cov))
    g, n = int(r.integers(10, 30)), int(r.integers(20, 70))
    loss_kl = bool(r.integers(0, 2))
    X = (r.random((g, n)).astype(np.float32) * 3).round(3)
    Ys = []
    for nl in n_labels:
        y = np.zeros((nl, n), np.float32)
        y[r.integers(0, nl, n), np.arange(n)] = 1.0
        Ys.append(y)
    K = sum(blocks)
    W0 = r.random((g, K)).astype(np.float32) + 0.1
    H0 = r.random((K, n)).astype(np.float32) + 0.1
    Bs0 = [r.random((nl, k)).astype(np.float32) + 0.1
           for nl, k in zip(n_labels, blocks)]
    w = r.random(n).astype(np.float32) + 0.05
    w /= w.sum()
    hyper = (jnp.asarray(r.random(n_cov).astype(np.float32) * 3),
             jnp.float32(r.random() * 0.5), jnp.float32(r.random()),
             jnp.float32(r.random()), jnp.float32(EPS))
    outs = {}
    for counts in (False, True):
        cfg = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=n,
                          loss_kl=loss_kl, weighted=True,
                          weighted_counts=counts, max_iter=3)
        outs[counts] = mu.fit_scan(
            cfg, jnp.asarray(W0), jnp.asarray(H0),
            tuple(jnp.asarray(b) for b in Bs0), jnp.asarray(X),
            tuple(jnp.asarray(y) for y in Ys), hyper,
            jax.random.PRNGKey(trial), jnp.asarray(w))
    (Wg, Hg, Bsg, Lg), (Wc, Hc, Bsc, Lc) = outs[False], outs[True]
    for a, b in [(Wg, Wc), (Hg, Hc), (Lg, Lc)] + list(zip(Bsg, Bsc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_counts_step_matches_float64_gathered_oracle():
    """One counts step vs the float64 oracle run on the GATHERED multiset
    of the same draw — the reference's own update applied to the drawn
    batch (main.py:589-663), at f64-vs-f32 tolerance."""
    n = 41
    X, Ys, Ws, Hs, Bs, w = _problem(seed=2, n=n)
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                      loss_kl=True, weighted=True, weighted_counts=True,
                      max_iter=1)
    key = jax.random.PRNGKey(9)
    Wn, Hn, Bsn, _ = _fit(cfg, X, Ys, Ws, Hs, Bs, w, seed=9)

    it_key = jax.random.split(key, 1)[0]
    idx = np.asarray(jax.random.choice(it_key, n, shape=(n,), replace=True,
                                       p=jnp.asarray(w)))
    X_b = X[:, idx].astype(np.float64)
    Ys_b = [y[:, idx].astype(np.float64) for y in Ys]
    Hs_b = [h[:, idx].astype(np.float64) for h in Hs]
    oWs, oHs_b, oBs = oracle_joint_step(
        [wm.astype(np.float64) for wm in Ws], Hs_b,
        [b.astype(np.float64) for b in Bs], X_b, Ys_b,
        [1.0, 2.0], 0.2, 0.1, 0.5, EPS, True)
    # scatter the updated drawn columns back (duplicates: identical values)
    oHs = [h.astype(np.float64).copy() for h in Hs]
    for j in range(len(oHs)):
        oHs[j][:, idx] = oHs_b[j]

    np.testing.assert_allclose(np.asarray(Wn), _cat_w(oWs),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Hn), _cat_h(oHs),
                               rtol=5e-4, atol=1e-5)
    for bj, bo in zip(Bsn, oBs):
        np.testing.assert_allclose(np.asarray(bj), bo, rtol=5e-4, atol=1e-5)


def test_undrawn_columns_keep_h():
    """Cells with count 0 must keep their H exactly (the reference never
    updates columns outside the drawn batch)."""
    n = 40
    X, Ys, Ws, Hs, Bs, w = _problem(seed=4, n=n)
    # concentrate all probability on the first 10 cells
    w = np.zeros(n, np.float32)
    w[:10] = 0.1
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                      loss_kl=True, weighted=True, weighted_counts=True,
                      max_iter=3)
    _, Hn, _, _ = _fit(cfg, X, Ys, Ws, Hs, Bs, w)
    np.testing.assert_array_equal(np.asarray(Hn)[:, 10:], _cat_h(Hs)[:, 10:])


@pytest.mark.slow
def test_grouped_balanced_counts_distribution():
    """The grouped sampler draws the idealized balanced distribution:
    group masses exactly equal, uniform within group.  Check empirical
    per-cell means over many epochs against n * w_balanced, and that
    every draw lands in real (non-pad) columns with total n."""
    from alpine_tpu.utils import sampling as smp

    r = np.random.default_rng(0)
    n, npad = 300, 320
    ids = r.integers(0, 4, n)
    ids[:5] = 4  # one rare group (5 cells in 300)
    order, start, sizes = smp.balanced_group_tables(ids)
    tables = (jnp.asarray(start), jnp.asarray(sizes))
    key = jax.random.PRNGKey(0)
    total = np.zeros(npad)
    reps = 400
    for i in range(reps):
        c = np.asarray(mu.grouped_balanced_counts(
            jax.random.fold_in(key, i), n, tables, npad))
        assert c.sum() == n and (c[n:] == 0).all()
        total += c
    mean = total / reps
    w = smp.balanced_sample_probabilities(ids)[order]
    # standard error of a count mean ~ sqrt(n*w/reps); allow 5 sigma
    se = np.sqrt(n * w / reps)
    assert (np.abs(mean[:n] - n * w) < 5 * se + 0.2).all()


@pytest.mark.slow
def test_model_weighted_fast_fit_runs_and_converges():
    """Model-level: sampling_method='weighted_fast' (grouped sampler +
    counts update) fits end-to-end, is seed-deterministic, restores the
    caller's cell order through the group-sort, and lands at a final loss
    comparable to the gathered 'weighted' fit (different draw stream —
    same distribution, so the optima agree to sampling noise)."""
    adata = make_synthetic_adata(n_cells=120, n_genes=20, seed=6)

    def run(method, data):
        m = ALPINE(n_components=6, n_covariate_components=[2, 3],
                   lam=[1.0, 1.0], device="cpu", random_state=0)
        m.fit(data, ["batch", "condition"], max_iter=25,
              sampling_method=method, verbose=False)
        return m

    m1, m2 = run("weighted_fast", adata), run("weighted_fast", adata)
    np.testing.assert_array_equal(m1.matrices["Hs"][-1], m2.matrices["Hs"][-1])
    L = m1.loss_history["total loss"].values
    assert np.isfinite(L).all() and L[-1] < L[0]
    mw = run("weighted", adata)
    Lw = mw.loss_history["total loss"].values
    assert abs(L[-1] - Lw[-1]) / Lw[-1] < 0.05

    # mark one cell with an extreme profile: its returned H column (in
    # CALLER order) must be the outlier — proves the group-sort cell_perm
    # is undone correctly on extraction
    marked = 17
    marked_adata = adata.copy()
    X = np.asarray(marked_adata.X).copy()
    X[marked] += 40.0
    marked_adata.X = X
    mm = run("weighted_fast", marked_adata)
    norms = np.linalg.norm(np.concatenate(mm.matrices["Hs"], axis=0), axis=0)
    assert norms.argmax() == marked


def test_window_counts_partition_global_draw():
    """The window form of grouped_balanced_counts is an EXACT partition of
    the global draw: for any split of the group-sorted axis into contiguous
    windows (uneven group/window boundaries included), the per-window count
    vectors concatenate to the single-device count vector bit-for-bit —
    the invariant behind the topology-invariant weighted_fast trajectory."""
    from alpine_tpu.utils import sampling as smp

    r = np.random.default_rng(11)
    n = 83
    ids = np.sort(r.integers(0, 5, n))  # group-sorted axis, ragged sizes
    _, start, sizes = smp.balanced_group_tables(ids)
    m_g = jnp.asarray(sizes)
    key = jax.random.PRNGKey(7)
    c_global = np.asarray(mu.grouped_balanced_counts(
        key, n, (jnp.asarray(start), m_g), n))

    for n_windows, width in ((4, 21), (3, 28), (1, 83)):
        tab = smp.window_group_tables(start, sizes, np.zeros_like(sizes),
                                      n_windows, width)
        parts = [
            np.asarray(mu.grouped_balanced_counts(
                key, n,
                (jnp.asarray(tab[w, 0]), m_g, jnp.asarray(tab[w, 1]),
                 jnp.asarray(tab[w, 2])),
                width))
            for w in range(n_windows)
        ]
        got = np.concatenate(parts)[:n]
        np.testing.assert_array_equal(got, c_global)
        assert got.sum() == n


def test_batched_counts_rows_match_per_iteration():
    """grouped_balanced_counts_batched row t must be bit-identical to the
    per-iteration draw with keys[t] — in both the global (2-tuple) and the
    window (4-tuple) table forms — so the ALPINE_TPU_COUNTS_PRESCAN=1
    path can never change a trajectory."""
    from alpine_tpu.utils import sampling as smp

    r = np.random.default_rng(5)
    n, n_pad, T = 90, 96, 6
    ids = np.sort(r.integers(0, 5, n))
    _, start, sizes = smp.balanced_group_tables(ids)
    keys = jax.random.split(jax.random.PRNGKey(2), T)
    g2 = (jnp.asarray(start), jnp.asarray(sizes))
    tab = smp.window_group_tables(start, sizes, np.zeros_like(sizes), 2, 48)
    g4 = (jnp.asarray(tab[1, 0]), jnp.asarray(sizes),
          jnp.asarray(tab[1, 1]), jnp.asarray(tab[1, 2]))
    for tables, width in ((g2, n_pad), (g4, 48)):
        batched = np.asarray(
            mu.grouped_balanced_counts_batched(keys, n, tables, width))
        for t in range(T):
            single = np.asarray(
                mu.grouped_balanced_counts(keys[t], n, tables, width))
            np.testing.assert_array_equal(batched[t], single)


def test_allgather_group_layout_single_process():
    """The mp group-layout allgather degenerates correctly to one process
    (process_allgather returns the local row): global codes sorted, counts
    exact — the same code path the 2-process worker exercises with real
    collectives."""
    from alpine_tpu.parallel import distributed as dist
    from alpine_tpu.parallel.mesh import Placement, make_cell_mesh

    codes = np.asarray([7, 3, 3, 9, 7, 7, 11], np.int64)
    g_codes, m_gp = dist.allgather_group_layout(
        Placement(make_cell_mesh(1)), codes)
    np.testing.assert_array_equal(g_codes, [3, 7, 9, 11])
    np.testing.assert_array_equal(m_gp, [[2, 3, 1, 1]])


def test_joint_label_codes_sort_matches_joint_label_ids():
    """The canonical mixed-radix codes must induce EXACTLY the group order
    and grouping of joint_label_ids (np.unique's lexicographic row sort) —
    the premise that makes the mp chunk-local sort consistent with the
    single-process global sort."""
    from alpine_tpu.utils import sampling as smp

    r = np.random.default_rng(3)
    n = 200
    Ys = []
    for nl in (2, 3, 4):
        y = np.zeros((nl, n), np.float32)
        y[r.integers(0, nl, n), np.arange(n)] = 1.0
        Ys.append(y)
    ids = smp.joint_label_ids(Ys)
    codes = smp.joint_label_codes(Ys)
    # same grouping and same ORDER: ids are the rank of the code
    uniq_codes = np.unique(codes)
    np.testing.assert_array_equal(ids, np.searchsorted(uniq_codes, codes))
    # radix-product guard
    with pytest.raises(ValueError, match="2\\^53"):
        smp.joint_label_codes([np.zeros((10 ** 4, 5), np.float32)
                               for _ in range(4)])


@pytest.mark.slow
def test_sharded_weighted_fast_matches_single_device():
    """weighted_fast's trajectory is TOPOLOGY-INVARIANT: on a 1-D mesh the
    replicated exact sampler realizes the same global draw as the
    single-device fit (same key), so the fits agree to psum summation
    order — a strictly stronger contract than the old shard-stratified
    divergence."""
    from alpine_tpu.parallel.mesh import make_cell_mesh

    adata = make_synthetic_adata(n_cells=96, n_genes=18, seed=8)
    outs = {}
    for device in ("cpu", make_cell_mesh(4)):
        m = ALPINE(n_components=5, n_covariate_components=[2, 2],
                   lam=[1.0, 1.0], device=device, random_state=1)
        m.fit(adata, ["batch", "condition"], max_iter=5,
              sampling_method="weighted_fast", verbose=False)
        outs[str(device)[:3]] = (m.matrices["Hs"][-1],
                                 m.loss_history["total loss"].values)
    (h1, l1), (h2, l2) = outs.values()
    np.testing.assert_allclose(h1, h2, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(l1, l2, rtol=5e-5)


@pytest.mark.parametrize("loss_kl", [True,
                                     pytest.param(False, marks=pytest.mark.slow)])
def test_counts_pallas_matches_counts_xla(loss_kl):
    """The counts-mode fused kernel (in-kernel count-scaled stats + masked
    H update, fed this-draw/next-draw count rows) must reproduce the XLA
    counts path driven by the same keys and grouped tables — including a
    zero-padded cell axis (pads draw count 0 and keep H exactly 0)."""
    from alpine_tpu.utils import sampling as smp

    n, iters, pad = 48, 4, 80  # pad to 128 = the kernel's minimum lane tile
    X, Ys, Ws, Hs, Bs, _ = _problem(seed=13, n=n)
    ids = np.asarray(smp.joint_label_ids(Ys))
    order, start, sizes = smp.balanced_group_tables(ids)
    Xs = X[:, order]
    Yss = [y[:, order] for y in Ys]
    Hss = [h[:, order] for h in Hs]
    tables = (jnp.asarray(start), jnp.asarray(sizes))

    Xp = np.pad(Xs, ((0, 0), (0, pad)))
    Ysp = [np.pad(y, ((0, 0), (0, pad))) for y in Yss]
    Hsp = [np.pad(h, ((0, 0), (0, pad))) for h in Hss]

    outs = {}
    for backend in ("xla", "pallas_interpret"):
        cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=n,
                          loss_kl=loss_kl, weighted=True,
                          weighted_counts=True, max_iter=iters,
                          backend=backend, trim_h=False)
        key = jax.random.PRNGKey(21)
        outs[backend] = mu.fit_scan(
            cfg, jnp.asarray(_cat_w(Ws)), jnp.asarray(_cat_h(Hsp)),
            tuple(jnp.asarray(b) for b in Bs), jnp.asarray(Xp),
            tuple(jnp.asarray(y) for y in Ysp), _hyper(), key, tables)
    (Wx, Hx, Bsx, Lx), (Wp, Hp, Bsp, Lp) = outs["xla"], outs["pallas_interpret"]
    np.testing.assert_allclose(np.asarray(Wx), np.asarray(Wp),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Hx), np.asarray(Hp),
                               rtol=2e-4, atol=1e-6)
    for bx, bp in zip(Bsx, Bsp):
        np.testing.assert_allclose(np.asarray(bx), np.asarray(bp),
                                   rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Lx), np.asarray(Lp),
                               rtol=2e-4, atol=1e-6)
    # pad columns never drawn, exactly zero on both paths
    np.testing.assert_array_equal(np.asarray(Hp)[:, n:], 0.0)


def test_counts_mode_pad_and_tile_agree():
    """Regression (round-4 review finding 1): the counts-mode working-set
    surcharge can step the kernel tile DOWN, so the pad computed for a
    weighted_fast fit must use counts_mode too — at g=1000, K=192, int8
    the two tile choices genuinely differ, and the crash was the padded
    width not dividing by the kernel's tile."""
    from alpine_tpu.ops import pallas_kernels as pk

    g, K, n, itemsize, labels = 1000, 192, 20000, 1, (2, 3)
    t_plain = pk._choose_tile_n(g, n, itemsize, K, labels, cast_itemsize=2)
    t_counts = pk._choose_tile_n(g, n, itemsize, K, labels, cast_itemsize=2,
                                 counts_mode=True)
    assert t_counts < t_plain  # the shape that triggered the crash
    pad = pk.pad_target(g, n, 1, itemsize, K, labels, cast_itemsize=2,
                        counts_mode=True)
    assert (n + pad) % t_counts == 0


def test_counts_fused_gating_excludes_meshes(monkeypatch):
    """Regression (round-4 review finding 2): a Mesh — even of ONE device
    — routes pallas fits into fit_scan_sharded, which has no counts mode;
    the backend must stay 'xla' there while a plain TPU device gets the
    counts-mode fused kernel."""
    import jax
    from jax.sharding import Mesh

    from alpine_tpu.models import alpine as alpine_mod

    monkeypatch.setattr(alpine_mod.ALPINE, "_use_tpu_kernels",
                        lambda self: True)
    adata = make_synthetic_adata(n_cells=40, n_genes=12, seed=1)
    Ys = [np.zeros((2, 40), np.float32), np.zeros((3, 40), np.float32)]

    def cfg_for(device):
        m = ALPINE(n_components=4, n_covariate_components=[2, 2],
                   lam=[1.0, 1.0], device=device, random_state=0)
        m.sampling_method = "weighted_fast"
        m.batch_size = 40
        m.verbose = False
        m.n_features = 12
        return m._make_cfg_base(Ys, 40, 3)

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("cells",))
    assert cfg_for(mesh1).backend == "xla"
    assert cfg_for(jax.devices()[0]).backend == "pallas"


@pytest.mark.slow
def test_2d_mesh_weighted_fast_matches_single_device():
    """The 2-D-mesh weighted_fast cell of the support matrix (GSPMD
    counts): the grouped sampler + counts update compile over the mesh as
    the semantically identical program, so the trajectory must match the
    single-device fit."""
    from alpine_tpu.parallel.mesh import make_gene_cell_mesh

    adata = make_synthetic_adata(n_cells=64, n_genes=16, seed=9)
    outs = {}
    for device in ("cpu", make_gene_cell_mesh(2, 4)):
        m = ALPINE(n_components=4, n_covariate_components=[2, 2],
                   lam=[1.0, 1.0], device=device, random_state=0)
        m.fit(adata, ["batch", "condition"], max_iter=4,
              sampling_method="weighted_fast", verbose=False)
        outs[str(device)[:3]] = (m.matrices["Hs"][-1],
                                 m.loss_history["total loss"].values)
    (h1, l1), (h2, l2) = outs.values()
    np.testing.assert_allclose(h1, h2, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(l1, l2, rtol=5e-5)


@pytest.mark.slow
def test_optimizer_weighted_fast_scores_match_weighted():
    """ComponentOptimizer(sampling_method='weighted_fast'): the batched CV
    path draws choice-IDENTICAL per-fold counts (mu.multinomial_counts over
    the same keys as the gathered path), so per-trial fold scores must
    match a 'weighted' search to float noise; construction mirrors the
    model's validation."""
    from alpine_tpu import ComponentOptimizer

    adata = make_synthetic_adata(n_cells=150, n_genes=16, seed=5)
    with pytest.raises(ValueError, match="full-epoch"):
        ComponentOptimizer(adata, ["batch"], sampling_method="weighted_fast",
                           batch_size=32)
    with pytest.raises(ValueError, match="joint mode"):
        ComponentOptimizer(adata, ["batch"], sampling_method="weighted_fast",
                           use_als=True)
    scores = {}
    for method in ("weighted", "weighted_fast"):
        co = ComponentOptimizer(adata, ["batch"], max_iter=8, device="cpu",
                                random_state=0, sampling_method=method)
        co.search_hyperparams(
            n_total_components_range=(8, 12), lam_range=(1.0, 100.0),
            n_splits=2, max_evals=2,
        )
        hist = co.get_train_history().sort_values("n_total_components")
        scores[method] = hist["score"].values
    np.testing.assert_allclose(scores["weighted"], scores["weighted_fast"],
                               rtol=1e-3, atol=1e-5)


def test_weighted_fast_transform_cache_matches_uncached():
    """weighted_fast fits cache the GROUP-SORTED device X; a same-data
    transform must reuse it and return each cell's OWN projection (H0
    re-paired on the permuted X, result un-permuted) — same contract as
    the tiled cache test.  Hit/miss agree at convergence; a wrong
    un-permute misassigns whole cells."""
    adata = make_synthetic_adata(n_cells=200, n_genes=24, seed=3)
    m = ALPINE(n_components=6, n_covariate_components=[2, 3],
               lam=[1.0, 2.0], device="cpu", random_state=0)
    m.fit(adata, ["batch", "condition"], max_iter=10,
          sampling_method="weighted_fast")
    assert m._x_cache is not None and m._x_cache[4] is not None

    ad_hit = adata.copy()
    m.transform(ad_hit, n_iter=400)
    m.free_device_cache()
    ad_miss = adata.copy()
    m.transform(ad_miss, n_iter=400)
    hit = ad_hit.obsm["ALPINE_embedding"]
    miss = ad_miss.obsm["ALPINE_embedding"]

    def row_corr(a, b):
        a = a - a.mean(1, keepdims=True)
        b = b - b.mean(1, keepdims=True)
        denom = (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
                 + 1e-12)
        return (a * b).sum(1) / denom

    aligned = row_corr(hit, miss)
    assert aligned.mean() > 0.9, aligned.mean()
    perm = np.random.default_rng(1).permutation(hit.shape[0])
    assert row_corr(hit, miss[perm]).mean() < 0.5


@pytest.mark.slow
def test_weighted_fast_feature_interactions(tmp_path):
    """weighted_fast composes with the other fit features: component
    bucketing keeps phantom components exactly neutral under the counts
    mask/scale; chunked (checkpointed) fits are deterministic (same seed →
    identical trajectory; like every stochastic mode, the chunk key
    schedule intentionally differs from the unchunked fit); multi-restart
    fits run."""
    adata = make_synthetic_adata(n_cells=60, n_genes=15, seed=0)
    kw = dict(n_components=5, n_covariate_components=[2, 2], lam=[1.0, 1.0],
              device="cpu", random_state=0)

    mb = ALPINE(component_bucket=8, **kw)
    mb.fit(adata, ["batch", "condition"], max_iter=4,
           sampling_method="weighted_fast")
    # stored matrices are true-sized (phantoms sliced off) and finite
    assert mb.matrices["Hs"][-1].shape[0] == 5
    assert all(np.isfinite(h).all() for h in mb.matrices["Hs"])

    runs = []
    for i in range(2):
        m = ALPINE(**kw)
        m.fit(adata, ["batch", "condition"], max_iter=6,
              sampling_method="weighted_fast",
              checkpoint_dir=str(tmp_path / f"ck{i}"), checkpoint_every=2)
        runs.append(m.loss_history.values)
    np.testing.assert_array_equal(runs[0], runs[1])

    mr = ALPINE(**kw)
    mr.fit(adata, ["batch", "condition"], max_iter=4,
           sampling_method="weighted_fast", n_restarts=3)
    assert np.isfinite(mr.loss_history.values).all()


def test_weighted_fast_validation():
    adata = make_synthetic_adata(n_cells=40, n_genes=12, seed=1)
    m = ALPINE(n_components=4, n_covariate_components=[2, 2],
               lam=[1.0, 1.0], device="cpu", random_state=0)
    with pytest.raises(ValueError, match="full-epoch joint"):
        m.fit(adata, ["batch", "condition"], max_iter=3, batch_size=16,
              sampling_method="weighted_fast")
    # a COVERING batch_size is full-epoch everywhere else in the stack —
    # accept it here too (round-4 advice), with the identical trajectory
    runs = []
    for bs in (None, 40, 64):
        mc = ALPINE(n_components=4, n_covariate_components=[2, 2],
                    lam=[1.0, 1.0], device="cpu", random_state=0)
        mc.fit(adata, ["batch", "condition"], max_iter=3, batch_size=bs,
               sampling_method="weighted_fast")
        runs.append(mc.loss_history.values)
    np.testing.assert_array_equal(runs[0], runs[1])
    np.testing.assert_array_equal(runs[0], runs[2])
    m_als = ALPINE(n_components=4, n_covariate_components=[2, 2],
                   lam=[1.0, 1.0], device="cpu", random_state=0,
                   use_als=True)
    with pytest.raises(ValueError, match="full-epoch joint"):
        m_als.fit(adata, ["batch", "condition"], max_iter=3,
                  sampling_method="weighted_fast")
    # weighted_fast balances over covariates like weighted
    m2 = ALPINE(n_components=4, n_covariate_components=[],
                lam=[], device="cpu", random_state=0)
    with pytest.raises(ValueError, match="requires at least one covariate"):
        m2.fit(adata, [], max_iter=3, sampling_method="weighted_fast")
