"""TPE hyperparameter search with cross-validated covariate-leakage scoring.

Run: python examples/hyperparameter_search.py
"""

# allow running from a source checkout without installation
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import pandas as pd

from alpine_tpu import AnnData, ComponentOptimizer

rng = np.random.default_rng(0)
n_cells, n_genes = 1200, 500
X = (rng.gamma(2.0, 1.0, (n_genes, 8)) @ rng.gamma(2.0, 1.0, (8, n_cells))
     + rng.random((n_genes, n_cells))).astype(np.float32).T
obs = pd.DataFrame(
    {"batch": np.array([f"b{v}" for v in rng.integers(0, 2, n_cells)], dtype=object)},
    index=[f"c{i}" for i in range(n_cells)],
)
adata = AnnData(X, obs=obs)

co = ComponentOptimizer(adata, ["batch"], max_iter=60, random_state=0)
best = co.search_hyperparams(
    n_total_components_range=(20, 60),
    lam_range=(1.0, 1e4),
    n_splits=3,
    max_evals=10,       # raise for a real search
)
print("best:", best)
print(co.get_train_history().head())

co.save_trials("/tmp/alpine_trials.pkl")  # resume later via trials_filename=
model = co.fit_the_best_param()
print("refit loss:", model.loss_history["total loss"].iloc[-1])
