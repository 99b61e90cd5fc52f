"""Quickstart: semi-supervised factorization of a synthetic dataset.

Mirrors the reference README workflow (fit -> embeddings -> gene scores ->
batch-corrected expression) end to end.  Run: python examples/quickstart.py
"""

# allow running from a source checkout without installation
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import pandas as pd

from alpine_tpu import ALPINE, AnnData

rng = np.random.default_rng(0)
n_cells, n_genes = 3000, 1000

# synthetic counts with latent structure + two covariates
W = rng.gamma(2.0, 1.0, (n_genes, 10))
H = rng.gamma(2.0, 1.0, (10, n_cells))
X = (W @ H + rng.random((n_genes, n_cells))).astype(np.float32).T
obs = pd.DataFrame(
    {
        "batch": np.array([f"b{v}" for v in rng.integers(0, 2, n_cells)], dtype=object),
        "disease": np.array([f"d{v}" for v in rng.integers(0, 3, n_cells)], dtype=object),
    },
    index=[f"cell{i}" for i in range(n_cells)],
)
obs.loc[obs.index[:300], "disease"] = None  # 10% unlabeled -> semi-supervised
adata = AnnData(X, obs=obs)

model = ALPINE(
    n_components=30,
    n_covariate_components=[3, 4],
    lam=[1e3, 1e3],
    random_state=42,
)
model.fit(adata, ["batch", "disease"], verbose=True)  # max_iter auto (elbow)
print("chosen max_iter:", model.max_iter)
print(model.loss_history.tail(3))

model.transform(adata)
print("embedding:", adata.obsm["ALPINE_embedding"].shape)

scores = model.get_covariate_gene_scores()
print("top disease genes:\n", scores["disease"].iloc[:, 0].nlargest(5))

model.get_normalized_expression(adata, library_size=1e4)
print("corrected expression:", adata.layers["normalized_expression"].shape)

model.save("/tmp/alpine_quickstart_model")
reloaded = ALPINE.load("/tmp/alpine_quickstart_model")
print("reloaded model max_iter:", reloaded.max_iter)
