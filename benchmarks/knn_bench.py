"""On-chip timing for the CV-scoring exact kNN (ops/knn.py).

The reference scores every CV fold by building a 15-NN graph of the
validation embedding (`/root/reference/alpine/optimization.py:271`,
`sc.pp.neighbors`).  PARITY.md records the host exact search at the
atlas-scale fold shape (100k cells x 100 components, sklearn brute,
multithreaded) at **103.3 s on this machine**; this artifact records the
device number the optimizer actually gets on an accelerator, so the
"minutes -> seconds" claim is a measured row rather than a paragraph.

Prints one JSON line:
  {"metric": "knn_seconds_100k_cells_100dim_k15", "value": ..., ...}

Usage:  python benchmarks/knn_bench.py  [n_cells  [n_dims  [k]]]
Env:    ALPINE_KNN_REPEATS (default 3)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from alpine_tpu.ops.knn import exact_knn  # noqa: E402

HOST_BASELINE_S = 103.3  # PARITY.md: sklearn brute, 100k x 100, this machine


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    repeats = int(os.environ.get("ALPINE_KNN_REPEATS", "3"))

    import jax

    device = jax.devices()[0]
    r = np.random.default_rng(0)
    # NMF-embedding-shaped input: all-nonnegative, off-origin (the regime
    # the centered-selection design exists for)
    emb = r.gamma(2.0, 1.0, (n, d)).astype(np.float32)

    # warm compile (exact_knn syncs by fetching to host — axon-safe)
    exact_knn(emb, k=k, device=device)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        dist, idx = exact_knn(emb, k=k, device=device)
        times.append(time.perf_counter() - t0)
    best, med = min(times), sorted(times)[len(times) // 2]

    # self is pinned first with distance exactly 0
    assert (idx[:, 0] == np.arange(n)).all() and (dist[:, 0] == 0.0).all()

    gmacs = n * n * d / 1e9  # blocked distance expansion, the dominant term
    out = {
        "metric": f"knn_seconds_{n//1000}k_cells_{d}dim_k{k}",
        "value": round(best, 3),
        "unit": "seconds",
        "median": round(med, 3),
        "repeats": repeats,
        "gmacs": round(gmacs, 1),
        "effective_tmacs_per_s": round(gmacs / 1e3 / best, 3),
    }
    if (n, d, k) == (100_000, 100, 15):
        out["host_sklearn_baseline_s"] = HOST_BASELINE_S
        out["speedup_vs_host"] = round(HOST_BASELINE_S / best, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
