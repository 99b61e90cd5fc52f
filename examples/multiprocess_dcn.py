"""Multi-process (DCN) fit: every process passes only its own cell shard.

On a real TPU pod slice, each host runs the same program:

    from alpine_tpu.parallel import distributed as dist
    dist.initialize()                       # autodetected on TPU pods
    mesh = dist.global_cell_mesh()
    model = ALPINE(..., device=mesh)
    model.fit(adata_local, ["batch"])       # adata_local = this host's cells

This example demonstrates the identical code path without a pod: run it
once and it launches TWO worker processes on localhost (CPU backend, gloo
cross-process collectives, 2 virtual devices each) that fit one global
model over a 4-device mesh.  Each worker builds only its own half of the
cells; W/Bs/loss_history come back identical on both, and each worker's
adata holds its own cells' embeddings.

Run: python examples/multiprocess_dcn.py
"""

# allow running from a source checkout without installation
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = os.environ.get("ALPINE_MP_WORKER")

if WORKER is None:
    # ----- parent: launch the two workers ---------------------------------
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "ALPINE_MP_WORKER": str(pid),
                 "ALPINE_MP_PORT": str(port)},
            cwd=REPO,
        )
        for pid in range(2)
    ]
    rc = [p.wait() for p in procs]
    sys.exit(max(rc))

# ----- worker: one process of the distributed fit -------------------------
pid = int(WORKER)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from alpine_tpu.parallel import distributed as dist  # noqa: E402

dist.initialize(coordinator_address=f"localhost:{os.environ['ALPINE_MP_PORT']}",
                num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from alpine_tpu import ALPINE, AnnData  # noqa: E402

# each process builds ONLY its own cells (in real use: read your shard of
# the atlas from disk/object store — e.g. one .h5ad chunk per host)
n_global, n_local, g = 2000, 1000, 300
rng = np.random.default_rng(0)
lo = pid * n_local
counts = rng.poisson(
    rng.gamma(2.0, 1.0, (g, 6)) @ rng.gamma(2.0, 1.0, (6, n_global))
).clip(0, 127).astype(np.float32).T[lo:lo + n_local]
obs = pd.DataFrame(
    {"batch": np.array([f"b{b}" for b in rng.integers(0, 2, n_global)],
                       dtype=object)[lo:lo + n_local]},
    index=[f"cell{i}" for i in range(lo, lo + n_local)],
)
adata_local = AnnData(counts, obs=obs)

model = ALPINE(n_components=12, n_covariate_components=[3], lam=[1e2],
               device=dist.global_cell_mesh(), random_state=0)
model.fit(adata_local, ["batch"], max_iter=30)

final = float(model.loss_history["total loss"].iloc[-1])
emb = adata_local.obsm["ALPINE_embedding"]
print(f"[process {pid}] data_dtype_={model.data_dtype_} "
      f"final loss {final:.6g} local embedding {emb.shape}", flush=True)
if dist.is_coordinator():
    print("[process 0] loss_history is replicated — any process can save "
          "the model; embeddings live with each process's cells.",
          flush=True)
