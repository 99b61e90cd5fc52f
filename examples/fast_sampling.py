"""TPU-native sampling modes: weighted_fast and tiled.

The reference's two stochastic samplers are expensive on accelerators
for the same reason — random per-cell gathers:

* ``sampling_method="weighted"`` (balanced with-replacement draws,
  reference sampling.py:18-33) re-gathers an epoch-sized random multiset
  of X columns every iteration;
* minibatch ``sampling_method="random"`` gathers every batch.

alpine_tpu keeps both reference-semantic modes AND adds a TPU-native
variant of each (same statistics, different draw stream — see
docs/migration.md):

* ``"weighted_fast"`` — the balanced epoch as a multinomial COUNT
  vector: count-scaled full-batch contractions on the ungathered X,
  running inside the fused kernel.  ~13x the gathered throughput at
  100k cells (781 vs 58 it/s on a v5e), and TOPOLOGY-INVARIANT: meshes
  and multi-process fits replicate the exact global draw from the shared
  seed (zero communication), so the trajectory is the same everywhere
  (see examples/multiprocess_dcn.py).
* ``"tiled"`` — minibatch epochs permute 128-cell tiles instead of
  single cells, so gathers stream.  ~5-6x the per-cell minibatch rate;
  also accepted by ComponentOptimizer for minibatch sweeps (~2.6x).

Run: python examples/fast_sampling.py
"""

# allow running from a source checkout without installation
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import numpy as np
import pandas as pd

from alpine_tpu import ALPINE, AnnData

rng = np.random.default_rng(0)
n_cells, n_genes = 3000, 400

# raw counts with an imbalanced covariate (weighted sampling's use case:
# 10% of cells in one batch)
k = 8
rate = rng.gamma(2.0, 1.0, (n_genes, k)) @ rng.gamma(2.0, 0.2, (k, n_cells))
X = rng.poisson(rate).clip(0, 127).astype(np.float32).T
batch = np.where(rng.random(n_cells) < 0.1, "rare_batch", "main_batch")
adata = AnnData(X, obs=pd.DataFrame({"batch": batch},
                                    index=[f"c{i}" for i in range(n_cells)]))

for method in ("weighted", "weighted_fast"):
    model = ALPINE(n_components=12, n_covariate_components=[3], lam=[1e2],
                   random_state=0)
    t0 = time.perf_counter()
    model.fit(adata, ["batch"], max_iter=30, sampling_method=method)
    dt = time.perf_counter() - t0
    L = model.loss_history["total loss"]
    print(f"{method:>14}: {dt:5.1f} s   loss {L.iloc[0]:.4g} -> {L.iloc[-1]:.4g}")

# tiled minibatch: same epoch structure as "random", tile-granular gathers
for method, kwargs in (("random", {}), ("tiled", {})):
    model = ALPINE(n_components=12, n_covariate_components=[3], lam=[1e2],
                   random_state=0)
    t0 = time.perf_counter()
    model.fit(adata, ["batch"], max_iter=20, batch_size=512,
              sampling_method=method, **kwargs)
    dt = time.perf_counter() - t0
    L = model.loss_history["total loss"]
    print(f"minibatch {method:>7}: {dt:5.1f} s   loss {L.iloc[0]:.4g} -> "
          f"{L.iloc[-1]:.4g}")

print("(timings here include compilation; the speedups show at scale — "
      "see BENCH_CONFIGS_r4.json for the 100k-cell measurements)")
