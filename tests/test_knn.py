"""ops/knn.py — blockwise accelerator exact kNN vs sklearn ground truth.

The optimizer's CV scoring clusters each validation fold's embedding on a
15-NN graph; on an accelerator the search runs as blocked MXU work
(`scoring.knn_graph(device=...)`).  These tests pin the device path to
sklearn's exact answer on the jax CPU backend (conftest pins the platform),
including padding, small-n and duplicate-row edge cases.
"""

import numpy as np
import pytest
from sklearn.neighbors import NearestNeighbors

import jax

from alpine_tpu.ops.knn import exact_knn
from alpine_tpu.optimize import scoring


def _sk(emb, k):
    nn = NearestNeighbors(n_neighbors=k).fit(emb)
    return nn.kneighbors(emb)


def _cpu_dev():
    return jax.devices("cpu")[0]


@pytest.mark.parametrize("n,d,k,block", [
    (500, 16, 16, 128),   # several scan steps + row padding
    (130, 7, 15, 2048),   # single padded block
    (64, 3, 64, 16),      # k == n, k > block
])
def test_exact_knn_matches_sklearn(n, d, k, block):
    r = np.random.default_rng(n + d)
    emb = r.normal(0, 1, (n, d)).astype(np.float32)
    dist, idx = exact_knn(emb, k, device=_cpu_dev(), block=block)
    sd, si = _sk(emb, k)
    assert dist.shape == (n, k) and idx.shape == (n, k)
    assert idx[:, 0].tolist() == list(range(n))  # self first
    np.testing.assert_allclose(dist, sd, atol=1e-3, rtol=1e-4)
    # identical neighbours wherever consecutive distances aren't ties
    gaps = np.diff(sd, axis=1) > 1e-4
    stable = np.concatenate([gaps, np.ones((n, 1), bool)], axis=1)
    stable &= np.concatenate([np.ones((n, 1), bool), gaps], axis=1)
    assert (idx == si)[stable].all()


def test_exact_knn_tiny_and_k_clamp():
    r = np.random.default_rng(9)
    emb = r.normal(0, 1, (5, 2)).astype(np.float32)  # no equidistant ties
    dist, idx = exact_knn(emb, 15, device=_cpu_dev())  # k clamped to n
    assert dist.shape == (5, 5)
    sd, si = _sk(emb, 5)
    np.testing.assert_allclose(dist, sd, atol=1e-4)
    np.testing.assert_array_equal(idx, si)


def test_exact_knn_duplicate_rows():
    r = np.random.default_rng(0)
    emb = r.normal(0, 1, (40, 6)).astype(np.float32)
    emb = np.concatenate([emb, emb[:8]])  # exact duplicates
    dist, idx = exact_knn(emb, 10, device=_cpu_dev(), block=16)
    assert idx[:, 0].tolist() == list(range(len(emb)))  # self still first
    # duplicate pairs report an EXACT zero distance (the refinement pass
    # subtracts identical rows bitwise) — the downstream UMAP rho handling
    # depends on it
    for i in range(8):
        row = dist[i][idx[i] == 40 + i]
        assert row.size == 1 and row[0] == 0.0, (i, dist[i], idx[i])
    sd, _ = _sk(emb, 10)
    np.testing.assert_allclose(np.sort(dist, axis=1), np.sort(sd, axis=1),
                               atol=1e-3)


def test_exact_knn_near_neighbors_large_norms():
    """Near neighbours on large-norm points: the |x|²+|y|²−2xy expansion
    alone loses them to cancellation (≈‖x‖²·d·2⁻²⁴ noise ≫ the true
    distances); the refinement pass must report them accurately, not as
    spurious exact zeros (which would flip the downstream UMAP duplicate
    handling and change CV scores vs the float64 host path)."""
    r = np.random.default_rng(7)
    base = r.uniform(0, 100, 50).astype(np.float32)
    emb = np.stack([base + i * 0.01 for i in range(32)]).astype(np.float32)
    dist, idx = exact_knn(emb, 8, device=_cpu_dev(), block=16)
    sd, si = _sk(emb, 8)
    assert idx[:, 0].tolist() == list(range(32))
    np.testing.assert_allclose(dist, sd, rtol=5e-3, atol=1e-4)
    assert (dist[:, 1:] > 0.0).all()  # no distinct pair collapses to 0
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(si, axis=1))


@pytest.mark.parametrize("with_duplicates", [False, True])
def test_knn_graph_device_path_matches_host(with_duplicates):
    r = np.random.default_rng(4)
    emb = r.normal(0, 2, (300, 12)).astype(np.float32)
    if with_duplicates:
        emb = np.concatenate([emb, emb[:12]])
    n = emb.shape[0]
    A_host = np.zeros((n, n))
    s, d, w = scoring.knn_graph(emb, n_neighbors=15)
    A_host[s, d] = w
    A_dev = np.zeros((n, n))
    s, d, w = scoring.knn_graph(emb, n_neighbors=15, device=_cpu_dev())
    A_dev[s, d] = w
    if with_duplicates:
        # kNN tie order among duplicate twins is arbitrary, and the fuzzy
        # union mixes the (tie-dependent) directed edges — so compare the
        # subgraph not touching duplicated points tightly, plus edge mass
        dup = np.zeros(n, bool)
        dup[:12] = dup[300:] = True
        clean = ~dup[:, None] & ~dup[None, :]
        both = (A_host > 0) & (A_dev > 0) & clean
        np.testing.assert_allclose(A_dev[both], A_host[both],
                                   atol=1e-3, rtol=1e-3)
        assert abs(A_dev.sum() - A_host.sum()) / A_host.sum() < 0.02
    else:
        np.testing.assert_allclose(A_dev, A_host, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_exact_knn_fuzz_vs_sklearn():
    """Randomized shapes/scales/duplicates vs sklearn: neighbor SETS equal
    wherever the true distance gap at the k-boundary is resolvable in f32,
    distances accurate, duplicates exactly zero."""
    for seed in range(6):
        r = np.random.default_rng(100 + seed)
        n = int(r.integers(20, 400))
        d = int(r.integers(2, 60))
        k = int(r.integers(2, min(n, 24)))
        block = int(r.choice([8, 32, 128, 2048]))
        scale = float(r.choice([1.0, 50.0]))
        emb = (r.normal(0, 1, (n, d)) * scale).astype(np.float32)
        n_dup = int(r.integers(0, 5))
        if n_dup:
            emb = np.concatenate([emb, emb[:n_dup]])
            n += n_dup
            k = min(k, n)
        dist, idx = exact_knn(emb, k, device=_cpu_dev(), block=block)
        sdx, six = _sk(emb, min(k + 1, n))
        sd, si = sdx[:, :k], six[:, :k]
        cfg = (seed, n, d, k, block, scale, n_dup)
        assert idx[:, 0].tolist() == list(range(n)), cfg
        np.testing.assert_allclose(dist, sd, atol=1e-3 * scale, rtol=1e-3,
                                   err_msg=str(cfg))
        # set equality on rows where the k-th-included vs first-excluded
        # gap is clearly resolvable in f32
        gap_ok = (sdx[:, k] - sdx[:, k - 1]) > 1e-3 * scale \
            if k < n else np.ones(n, bool)
        got = np.sort(idx, axis=1)[gap_ok]
        want = np.sort(si, axis=1)[gap_ok]
        assert (got == want).all(), cfg
        # duplicate twins at bitwise zero
        for i in range(n_dup):
            twin = n - n_dup + i
            row = dist[i][idx[i] == twin]
            if row.size:
                assert row[0] == 0.0, cfg


def test_exact_knn_far_from_origin_cluster():
    """Selection ranking must survive embeddings far from the origin: the
    raw |x|²+|y|²−2xy expansion's cancellation noise grows with ‖x‖² (here
    ~‖x‖²·2⁻²⁴ ≈ 3 in squared-distance units — above the true neighbour
    gaps: measured, uncentered selection returns the wrong neighbour SET on
    237/241 resolvable rows of this exact data), so selection must run on
    mean-centered coordinates, where the same data is easy.  The refinement
    pass cannot recover a neighbour selection never picked."""
    r = np.random.default_rng(11)
    n, d, k = 256, 48, 15
    center = np.full(d, 1000.0)  # ‖x‖² ≈ 4.8e7 per point
    emb = (center + r.normal(0, 1.0, (n, d))).astype(np.float32)
    dist, idx = exact_knn(emb, k, device=_cpu_dev(), block=64)
    sdx, six = _sk(emb, k + 1)
    sd, si = sdx[:, :k], six[:, :k]
    assert idx[:, 0].tolist() == list(range(n))
    np.testing.assert_allclose(dist, sd, atol=2e-3, rtol=1e-3)
    gap_ok = (sdx[:, k] - sdx[:, k - 1]) > 2e-3
    got = np.sort(idx, axis=1)[gap_ok]
    want = np.sort(si, axis=1)[gap_ok]
    assert gap_ok.sum() > n // 2  # the gaps ARE resolvable after centering
    assert (got == want).all()


def test_optimizer_scoring_device_policy():
    """CPU model device keeps the host (float64-exact) kNN path."""
    import pandas as pd

    from alpine_tpu import ComponentOptimizer
    from alpine_tpu.utils.adata import AnnData

    r = np.random.default_rng(0)
    X = r.random((40, 12)).astype(np.float32)
    obs = pd.DataFrame({"b": ["x", "y"] * 20}, index=[f"c{i}" for i in range(40)])
    co = ComponentOptimizer(AnnData(X, obs=obs), ["b"], device="cpu")
    assert co._scoring_device() is None
