"""Multi-process (DCN) fit: every process reads only its own cell shard.

On a real TPU pod slice, each host runs the same program:

    from alpine_tpu.parallel import distributed as dist
    from alpine_tpu.io.h5ad import h5ad_dims, read_h5ad
    dist.initialize()                       # autodetected on TPU pods
    lo, hi = dist.process_cell_range(h5ad_dims("atlas.h5ad")[0])
    adata_local = read_h5ad("atlas.h5ad", obs_range=(lo, hi))
    model = ALPINE(..., device=dist.global_cell_mesh())
    model.fit(adata_local, ["batch"])       # adata_local = this host's cells

No host ever materializes the full matrix: `read_h5ad(obs_range=...)`
reads just that row range from disk (dense hyperslab / CSR indptr slice /
streamed CSC blocks), and shard sizes may differ by a cell — the fit pads
every chunk to a common width internally (exactly neutral zero columns).

This example demonstrates the identical code path without a pod: run it
once and it launches TWO worker processes on localhost (CPU backend, gloo
cross-process collectives, 2 virtual devices each) that fit one global
model over a 4-device mesh from an .h5ad file with an ODD cell count
(1999 -> 1000/999 shards).  W/Bs/loss_history come back identical on both
workers, and each worker's adata holds its own cells' embeddings.

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
    # ----- parent: write the shared .h5ad, launch the two workers ---------
    import tempfile

    import numpy as np
    import pandas as pd

    from alpine_tpu import AnnData
    from alpine_tpu.io.h5ad import write_h5ad

    n_global, g = 1999, 300  # odd on purpose: shards come out 1000/999
    rng = np.random.default_rng(0)
    counts = rng.poisson(
        rng.gamma(2.0, 1.0, (g, 6)) @ rng.gamma(2.0, 1.0, (6, n_global))
    ).clip(0, 127).astype(np.float32).T
    obs = pd.DataFrame(
        {"batch": [f"b{b}" for b in rng.integers(0, 2, n_global)]},
        index=[f"cell{i}" for i in range(n_global)],
    )
    atlas = tempfile.NamedTemporaryFile(suffix=".h5ad", delete=False).name
    write_h5ad(AnnData(counts, obs=obs), atlas)

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "ALPINE_MP_WORKER": str(pid),
                 "ALPINE_MP_PORT": str(port), "ALPINE_MP_H5AD": atlas},
            cwd=REPO,
        )
        for pid in range(2)
    ]
    rc = [p.wait() for p in procs]
    os.unlink(atlas)
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

from alpine_tpu import ALPINE  # noqa: E402
from alpine_tpu.io.h5ad import h5ad_dims, read_h5ad  # noqa: E402

# each process reads ONLY its own cells from the shared file — the
# out-of-core ingestion recipe (no host builds the full matrix)
atlas = os.environ["ALPINE_MP_H5AD"]
n_obs, _ = h5ad_dims(atlas)
lo, hi = dist.process_cell_range(n_obs)
adata_local = read_h5ad(atlas, obs_range=(lo, hi))

model = ALPINE(n_components=12, n_covariate_components=[3], lam=[1e2],
               device=dist.global_cell_mesh(), random_state=0)
model.fit(adata_local, ["batch"], max_iter=30)

final = float(model.loss_history["total loss"].iloc[-1])
emb = adata_local.obsm["ALPINE_embedding"]
print(f"[process {pid}] cells [{lo}, {hi}) of {n_obs} "
      f"data_dtype_={model.data_dtype_} "
      f"final loss {final:.6g} local embedding {emb.shape}", flush=True)

# balanced sampling scales out too (round 5): weighted_fast replicates the
# exact global balanced draw from the shared seed on every device and
# keeps only local cells' counts — zero per-iteration communication, and
# the trajectory matches the single-process weighted_fast fit
wf = ALPINE(n_components=12, n_covariate_components=[3], lam=[1e2],
            device=dist.global_cell_mesh(), random_state=0)
wf.fit(adata_local, ["batch"], max_iter=15,
       sampling_method="weighted_fast")
print(f"[process {pid}] weighted_fast (balanced, multi-process) final "
      f"loss {float(wf.loss_history['total loss'].iloc[-1]):.6g}",
      flush=True)
if dist.is_coordinator():
    print("[process 0] loss_history is replicated — any process can save "
          "the model; embeddings live with each process's cells.",
          flush=True)
