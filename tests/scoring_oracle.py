"""Independent transcription of the reference's CV-scoring stack, used as a
fidelity oracle (same role tests/oracle.py plays for the MU math and
tests/test_elbow_fidelity.py's transcription plays for kneed).

The reference scores a validation fold with
    sc.pp.neighbors(val_adata, use_rep='ALPINE_embedding')
    sc.tl.leiden(val_adata, flavor="igraph", resolution=1)
    ARI + homogeneity vs each covariate
(`/root/reference/alpine/optimization.py:271-278`).  scanpy, igraph and
leidenalg are not installed in this environment, so this module transcribes
what those calls compute, from the published algorithms:

- `fuzzy_simplicial_set`: scanpy's default neighbors weighting — UMAP's
  smooth-kNN-distance + membership-strength construction (McInnes, Healy &
  Melville 2018; umap.umap_.smooth_knn_dist / compute_membership_strengths,
  with scanpy's defaults n_neighbors=15, metric=euclidean,
  local_connectivity=1.0, set_op_mix_ratio=1.0).  Written as the per-point
  loop the published algorithm specifies, including the SMOOTH_K_TOLERANCE
  early break and MIN_K_DIST_SCALE sigma floors.
- `community_leiden`: igraph's Leiden (Traag, Waltman & van Eck 2019) with
  objective_function="modularity" — queue-based fast local move, randomized
  well-connected refinement with merge probability ∝ exp(gain / beta)
  (igraph beta default 0.01), aggregation seeded from the unrefined
  partition; scanpy's flavor="igraph" default n_iterations=2.
- `reference_fold_score`: the ARI + homogeneity sum over covariates with NA
  rows masked, exactly the reference's loop.

This transcription is deliberately INDEPENDENT of
alpine_tpu/optimize/scoring.py and alpine_tpu/native/leiden.cpp (different
structure: per-point loops vs vectorized bandwidth search; randomized
proportional refinement vs deterministic best-gain refinement) so that
tests/test_scoring_fidelity.py comparing the two stacks is a real check,
not a tautology.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics.cluster import adjusted_rand_score, homogeneity_score
from sklearn.neighbors import NearestNeighbors

SMOOTH_K_TOLERANCE = 1e-5
MIN_K_DIST_SCALE = 1e-3


# ---------------------------------------------------------------------------
# sc.pp.neighbors: UMAP fuzzy simplicial set (connectivities)
# ---------------------------------------------------------------------------

def _smooth_knn_dist(distances: np.ndarray, k: float, n_iter: int = 64,
                     local_connectivity: float = 1.0, bandwidth: float = 1.0):
    """umap.umap_.smooth_knn_dist transcription.  `distances` is (n, k_nn)
    sorted ascending WITH the self distance (0) in column 0."""
    target = np.log2(k) * bandwidth
    n = distances.shape[0]
    rho = np.zeros(n)
    result = np.zeros(n)
    mean_distances = np.mean(distances)

    for i in range(n):
        lo, hi, mid = 0.0, np.inf, 1.0
        ith_distances = distances[i]
        non_zero_dists = ith_distances[ith_distances > 0.0]
        if non_zero_dists.shape[0] >= local_connectivity:
            index = int(np.floor(local_connectivity))
            interpolation = local_connectivity - index
            if index > 0:
                rho[i] = non_zero_dists[index - 1]
                if interpolation > SMOOTH_K_TOLERANCE:
                    rho[i] += interpolation * (
                        non_zero_dists[index] - non_zero_dists[index - 1])
            else:
                rho[i] = interpolation * non_zero_dists[0]
        elif non_zero_dists.shape[0] > 0:
            rho[i] = np.max(non_zero_dists)

        for _ in range(n_iter):
            psum = 0.0
            for j in range(1, distances.shape[1]):
                d = distances[i, j] - rho[i]
                psum += np.exp(-(d / mid)) if d > 0 else 1.0
            if np.fabs(psum - target) < SMOOTH_K_TOLERANCE:
                break
            if psum > target:
                hi = mid
                mid = (lo + hi) / 2.0
            else:
                lo = mid
                mid = mid * 2 if hi == np.inf else (lo + hi) / 2.0
        result[i] = mid

        if rho[i] > 0.0:
            mean_ith = np.mean(ith_distances)
            if result[i] < MIN_K_DIST_SCALE * mean_ith:
                result[i] = MIN_K_DIST_SCALE * mean_ith
        else:
            if result[i] < MIN_K_DIST_SCALE * mean_distances:
                result[i] = MIN_K_DIST_SCALE * mean_distances
    return result, rho


def fuzzy_simplicial_set(emb: np.ndarray, n_neighbors: int = 15,
                         set_op_mix_ratio: float = 1.0) -> np.ndarray:
    """Dense symmetric connectivities matrix, scanpy-default construction:
    exact euclidean kNN (self included, as scanpy counts it), smooth-kNN
    bandwidths, membership strengths, fuzzy set union."""
    n = emb.shape[0]
    k = min(n_neighbors, n)
    nn = NearestNeighbors(n_neighbors=k).fit(emb)
    knn_dists, knn_indices = nn.kneighbors(emb)

    sigmas, rhos = _smooth_knn_dist(knn_dists.astype(np.float64), float(k))

    # compute_membership_strengths
    A = np.zeros((n, n))
    for i in range(n):
        for j in range(k):
            t = knn_indices[i, j]
            if t == i:
                continue
            d = knn_dists[i, j] - rhos[i]
            val = 1.0 if (d <= 0 or sigmas[i] == 0.0) else np.exp(-d / sigmas[i])
            A[i, t] = val

    T = A.T
    P = A * T
    return set_op_mix_ratio * (A + T - P) + (1.0 - set_op_mix_ratio) * P


# ---------------------------------------------------------------------------
# sc.tl.leiden(flavor="igraph"): igraph community_leiden, modularity objective
# ---------------------------------------------------------------------------

class _G:
    """Weighted undirected graph as adjacency lists (self-loops separate)."""

    def __init__(self, n, adj, self_w, total_w2):
        self.n = n
        self.adj = adj          # adj[v] = list[(u, w)]
        self.self_w = self_w    # self-loop weight per node
        self.strength = np.array(
            [sum(w for _, w in adj[v]) + 2.0 * self_w[v] for v in range(n)])
        self.total_w2 = total_w2


def _graph_from_dense(W: np.ndarray) -> _G:
    n = W.shape[0]
    adj = [[] for _ in range(n)]
    self_w = np.zeros(n)
    for i in range(n):
        self_w[i] = W[i, i]
        for j in range(i + 1, n):
            if W[i, j] != 0.0:
                w = float(W[i, j])
                adj[i].append((j, w))
                adj[j].append((i, w))
    total_w2 = float(sum(sum(w for _, w in adj[v]) for v in range(n))
                     + 2.0 * self_w.sum())
    return _G(n, adj, self_w, total_w2)


def _move_nodes_fast(g: _G, comm: np.ndarray, K: np.ndarray,
                     rng: np.random.Generator, gamma: float) -> bool:
    """Traag et al. Alg. 3: queue-based local move, best-gain target."""
    from collections import deque

    order = rng.permutation(g.n)
    q = deque(order.tolist())
    in_q = np.ones(g.n, dtype=bool)
    inv2m = 1.0 / g.total_w2
    moved_any = False
    while q:
        v = q.popleft()
        in_q[v] = False
        c_old = comm[v]
        kv = g.strength[v]
        k_to = {c_old: 0.0}
        for u, w in g.adj[v]:
            k_to[comm[u]] = k_to.get(comm[u], 0.0) + w
        base = k_to[c_old] - gamma * kv * (K[c_old] - kv) * inv2m
        best_c, best_gain = c_old, 0.0
        for c, kc in k_to.items():
            if c == c_old:
                continue
            gain = (kc - gamma * kv * K[c] * inv2m) - base
            if gain > best_gain + 1e-12:
                best_gain, best_c = gain, c
        if best_c != c_old:
            K[c_old] -= kv
            K[best_c] += kv
            comm[v] = best_c
            moved_any = True
            for u, _ in g.adj[v]:
                if comm[u] != best_c and not in_q[u]:
                    in_q[u] = True
                    q.append(u)
    return moved_any


def _refine(g: _G, comm: np.ndarray, K: np.ndarray,
            rng: np.random.Generator, gamma: float, beta: float) -> np.ndarray:
    """Traag et al. Alg. 4 (MergeNodesSubset over each community): singleton
    start; well-connected singletons merge into a well-connected refined
    community chosen with probability ∝ exp(gain / beta) among non-negative
    gains (igraph's randomized refinement)."""
    inv2m = 1.0 / g.total_w2
    r = np.arange(g.n)
    rK = g.strength.copy()
    r_size = np.ones(g.n, dtype=np.int64)

    k_in_P = np.zeros(g.n)
    for v in range(g.n):
        k_in_P[v] = sum(w for u, w in g.adj[v] if comm[u] == comm[v])
    r_ext = k_in_P.copy()  # refined community -> rest of its P-community

    for v in rng.permutation(g.n):
        if r_size[r[v]] != 1:
            continue
        kv = g.strength[v]
        Pc = comm[v]
        if k_in_P[v] < gamma * kv * (K[Pc] - kv) * inv2m:
            continue
        k_to = {}
        for u, w in g.adj[v]:
            if comm[u] != Pc:
                continue
            k_to[r[u]] = k_to.get(r[u], 0.0) + w
        cands, gains = [], []
        for rc, kc in k_to.items():
            if rc == r[v]:
                continue
            if r_ext[rc] < gamma * rK[rc] * (K[Pc] - rK[rc]) * inv2m:
                continue
            gain = kc - gamma * kv * rK[rc] * inv2m
            if gain >= 0.0:
                cands.append(rc)
                gains.append(gain)
        if not cands:
            continue
        logits = np.asarray(gains) / beta
        p = np.exp(logits - logits.max())
        rc_new = cands[int(rng.choice(len(cands), p=p / p.sum()))]
        rK[r[v]] -= kv
        r_size[r[v]] -= 1
        rK[rc_new] += kv
        r_size[rc_new] += 1
        r_ext[rc_new] += k_in_P[v] - 2.0 * k_to[rc_new]
        r[v] = rc_new
    return r


def _aggregate(g: _G, refined: np.ndarray, comm: np.ndarray):
    uniq, node_of = np.unique(refined, return_inverse=True)
    n_new = len(uniq)
    agg_comm = np.zeros(n_new, dtype=np.int64)
    agg_comm[node_of] = comm
    self_w = np.zeros(n_new)
    acc = {}
    for v in range(g.n):
        a = node_of[v]
        self_w[a] += g.self_w[v]
        for u, w in g.adj[v]:
            b = node_of[u]
            if a == b:
                self_w[a] += 0.5 * w
            elif a < b:
                acc[(a, b)] = acc.get((a, b), 0.0) + w
    adj = [[] for _ in range(n_new)]
    for (a, b), w in acc.items():
        adj[a].append((b, w))
        adj[b].append((a, w))
    ag = _G(n_new, adj, self_w, g.total_w2)
    return ag, node_of, agg_comm


def community_leiden(W: np.ndarray, resolution: float = 1.0,
                     n_iterations: int = 2, beta: float = 0.01,
                     seed: int = 0) -> np.ndarray:
    """igraph community_leiden transcription on a dense symmetric weighted
    adjacency (modularity objective with resolution).  Returns labels."""
    rng = np.random.default_rng(seed)
    g0 = _graph_from_dense(np.asarray(W, dtype=np.float64))
    if g0.total_w2 <= 0:
        return np.arange(g0.n)
    labels = np.arange(g0.n)  # partition of the ORIGINAL nodes

    for _ in range(max(n_iterations, 1)):
        g = g0
        node_map = np.arange(g0.n)
        _, comm = np.unique(labels, return_inverse=True)
        comm = comm.astype(np.int64)
        while True:
            K = np.zeros(g.n)
            np.add.at(K, comm, g.strength)
            _move_nodes_fast(g, comm, K, rng, resolution)
            n_comm = len(np.unique(comm))
            if n_comm == g.n:
                break
            K = np.zeros(g.n)
            np.add.at(K, comm, g.strength)
            refined = _refine(g, comm, K, rng, resolution, beta)
            ag, node_of, agg_comm = _aggregate(g, refined, comm)
            if ag.n == g.n:
                break
            node_map = node_of[node_map]
            _, comm = np.unique(agg_comm, return_inverse=True)
            comm = comm.astype(np.int64)
            g = ag
        labels = comm[node_map]
        _, labels = np.unique(labels, return_inverse=True)
    return labels


# ---------------------------------------------------------------------------
# The reference's fold score
# ---------------------------------------------------------------------------

def reference_cluster(emb: np.ndarray, n_neighbors: int = 15,
                      resolution: float = 1.0, seed: int = 0) -> np.ndarray:
    """sc.pp.neighbors(use_rep=...) + sc.tl.leiden(flavor='igraph') on an
    embedding, per the transcriptions above."""
    W = fuzzy_simplicial_set(emb, n_neighbors=n_neighbors)
    return community_leiden(W, resolution=resolution, seed=seed)


def reference_fold_score(emb: np.ndarray, covariates: dict, seed: int = 0) -> float:
    """optimization.py:271-278: cluster the embedding, sum ARI + homogeneity
    per covariate (NA masked), average over covariates."""
    import pandas as pd

    clusters = reference_cluster(emb, seed=seed)
    total = 0.0
    for values in covariates.values():
        s = pd.Series(values)
        mask = ~s.isna().to_numpy()
        lab = s[mask].astype(str).to_numpy()
        cl = clusters[mask].astype(str)
        total += adjusted_rand_score(lab, cl) + homogeneity_score(lab, cl)
    return total / max(len(covariates), 1)
