"""Atlas-scale fits over a TPU slice: shard the cell axis across a mesh.

On a v5e-8 this runs one fit across all 8 chips; it can also be exercised
with 8 virtual CPU devices:
  ALPINE_EXAMPLE_CPU=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/atlas_sharded.py
"""

# allow running from a source checkout without installation
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import os

import jax

# Platform must be chosen BEFORE any call that initializes backends
# (jax.devices()/default_backend() lock it in).  Set ALPINE_EXAMPLE_CPU=1
# together with XLA_FLAGS=--xla_force_host_platform_device_count=8 to run
# the virtual multi-device version on CPU.
if os.environ.get("ALPINE_EXAMPLE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

from alpine_tpu import ALPINE, AnnData
from alpine_tpu.parallel.mesh import make_cell_mesh, make_gene_cell_mesh

rng = np.random.default_rng(0)
n_cells, n_genes = 20_000, 500
X = rng.random((n_cells, n_genes), dtype=np.float32)
obs = pd.DataFrame(
    {"batch": np.array([f"b{v}" for v in rng.integers(0, 4, n_cells)], dtype=object)},
    index=[f"c{i}" for i in range(n_cells)],
)
adata = AnnData(X, obs=obs)

mesh = make_cell_mesh()  # all local devices, cells sharded; W/B replicated
print("mesh:", mesh)
model = ALPINE(n_components=20, n_covariate_components=[4], lam=[1e3],
               device=mesh, random_state=0)
model.fit(adata, ["batch"], max_iter=50)
print("final loss:", model.loss_history["total loss"].iloc[-1])

# 2-D variant for very wide gene panels: W sharded over genes as well
if len(jax.devices()) >= 4:
    mesh2 = make_gene_cell_mesh(2, len(jax.devices()) // 2)
    model2 = ALPINE(n_components=20, n_covariate_components=[4], lam=[1e3],
                    device=mesh2, random_state=0)
    model2.fit(adata, ["batch"], max_iter=20)
    print("2-D mesh loss:", model2.loss_history["total loss"].iloc[-1])
