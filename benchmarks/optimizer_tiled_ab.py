"""Timed A/B: a minibatch ComponentOptimizer sweep with
sampling_method='random' vs 'tiled' (round-3 verdict item 3's 'done'
criterion — the config-4-style sweep with batch_size, timed).

The reference pattern passes batch_size straight into every CV fit
(/root/reference/alpine/optimization.py:262-265); per-cell random draws
then put every trial fit on the random-gather engine.  The tiled sampler
moves the same epoch structure at tile granularity.  Cells are sized so
the minibatch path is real (batch < every training fold).

Prints one JSON line:
  {"metric": "optimizer_minibatch_ab", "random_seconds": ...,
   "tiled_seconds": ..., "speedup": ..., "scores": {...}}

Usage:  python benchmarks/optimizer_tiled_ab.py  [n_cells  [max_evals]]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_configs import pbmc_like  # noqa: E402 (same synthetic data recipe)

from alpine_tpu import ComponentOptimizer  # noqa: E402


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    max_evals = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    adata, keys = pbmc_like(n_cells=n_cells, n_genes=800, n_cov=2)

    out = {"metric": "optimizer_minibatch_ab",
           "shape": {"cells": n_cells, "genes": 800, "batch_size": 2048,
                     "max_evals": max_evals, "n_splits": 3, "max_iter": 60},
           "scores": {}}
    for method in ("random", "tiled"):
        co = ComponentOptimizer(adata, keys, max_iter=60, random_state=0,
                                batch_size=2048, sampling_method=method)
        t0 = time.perf_counter()
        co.search_hyperparams(
            n_total_components_range=(50, 100), lam_range=(1.0, 1e4),
            n_splits=3, max_evals=max_evals,
        )
        out[f"{method}_seconds"] = round(time.perf_counter() - t0, 3)
        hist = co.get_train_history()
        out["scores"][method] = [round(float(s), 5)
                                 for s in hist["score"].values]
    out["speedup"] = round(out["random_seconds"] / out["tiled_seconds"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
