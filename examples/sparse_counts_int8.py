"""Raw-count workflow: sparse CSR input + exact int8 X storage.

Real single-cell AnnData objects usually hold sparse raw counts.  This
build accepts them directly (the reference requires `.toarray()` first) and
can store X on-device as int8 — EXACT for counts <= 127, at half of
bfloat16's HBM/transfer traffic (kernels dequantize tiles in VMEM).

Run: python examples/sparse_counts_int8.py
"""

# allow running from a source checkout without installation
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import pandas as pd
from scipy import sparse

from alpine_tpu import ALPINE, AnnData

rng = np.random.default_rng(0)
n_cells, n_genes = 3000, 1000

# sparse Poisson counts with latent structure (typical 10x-style sparsity)
W = rng.gamma(2.0, 1.0, (n_genes, 10))
H = rng.gamma(2.0, 0.08, (10, n_cells))
X = rng.poisson(W @ H).clip(0, 127).astype(np.float32).T  # cells x genes
X_sparse = sparse.csr_matrix(X)
print(f"X: {X_sparse.shape}, density {X_sparse.nnz / X.size:.1%}")

obs = pd.DataFrame(
    {"batch": np.array([f"b{v}" for v in rng.integers(0, 2, n_cells)], dtype=object)},
    index=[f"cell{i}" for i in range(n_cells)],
)
adata = AnnData(X_sparse, obs=obs)  # no .toarray() needed

model = ALPINE(
    n_components=20,
    n_covariate_components=[3],
    lam=[1e3],
    random_state=42,
    data_dtype="int8",  # exact for counts <= 127; use "int16" up to 32767
)
model.fit(adata, ["batch"], max_iter=100)
print(model.loss_history.tail(3))

model.transform(adata)
print("embedding:", adata.obsm["ALPINE_embedding"].shape)

# transform also accepts data the int dtype can't represent (e.g. library-
# normalized queries) — it falls back to compute-width float storage
query = AnnData(X[:50] / X[:50].sum(axis=1, keepdims=True) * 1e4,
                obs=obs.iloc[:50])
model.transform(query)
print("normalized-query embedding:", query.obsm["ALPINE_embedding"].shape)
