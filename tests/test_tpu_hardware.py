"""Opt-in tests that exercise the COMPILED Pallas kernels on real TPU
hardware (the rest of the suite pins a CPU backend; kernels there run in
interpret mode).  Enable with ALPINE_RUN_TPU_TESTS=1.

Runs in a subprocess because the in-process backend is already pinned to
CPU by conftest."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ALPINE_RUN_TPU_TESTS"),
    reason="set ALPINE_RUN_TPU_TESTS=1 to run compiled-kernel tests on TPU",
)

_SCRIPT = r"""
import json
import numpy as np, jax, jax.numpy as jnp
from alpine_tpu.ops import mu

if jax.default_backend() != "tpu":
    print(json.dumps({"skip": "no tpu backend"}))
    raise SystemExit(0)

BLOCKS=(3,4,6); N_LABELS=(2,3); G, N = 64, 3000
r = np.random.default_rng(0)
X = jnp.asarray(r.random((G, N), dtype=np.float32))
Ys = tuple(jnp.asarray((r.random((nl, N))<0.5).astype(np.float32)) for nl in N_LABELS)
key = jax.random.PRNGKey(0)
hyper = (jnp.asarray([2.0, 1.0], jnp.float32), jnp.float32(0.2),
         jnp.float32(0.3), jnp.float32(0.4), jnp.float32(1e-6))

out = {}
for backend in ("xla", "pallas"):
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                      loss_kl=True, max_iter=10, backend=backend)
    W0, H0, Bs0 = mu.init_matrices(cfg, G, key, 1e-6)
    _, _, _, L = mu.fit_scan(cfg, W0, H0, Bs0, X, Ys, hyper, key, None)
    out[backend] = np.asarray(jax.device_get(L))[:, 0].tolist()

rel = max(abs(a-b)/abs(b) for a, b in zip(out["pallas"], out["xla"]))
print(json.dumps({"max_rel": rel}))
"""

_INT8_SCRIPT = r"""
import json
import numpy as np, jax, jax.numpy as jnp
from alpine_tpu.ops import mu

if jax.default_backend() != "tpu":
    print(json.dumps({"skip": "no tpu backend"}))
    raise SystemExit(0)

BLOCKS=(3,4,6); N_LABELS=(2,3); G, N = 64, 3000
r = np.random.default_rng(0)
Xc = r.poisson(2.0, (G, N)).clip(0, 127)
Ys = tuple(jnp.asarray((r.random((nl, N))<0.5).astype(np.float32)) for nl in N_LABELS)
key = jax.random.PRNGKey(0)
hyper = (jnp.asarray([2.0, 1.0], jnp.float32), jnp.float32(0.2),
         jnp.float32(0.3), jnp.float32(0.4), jnp.float32(1e-6))

out = {}
for x_dtype, np_dt in (("int8", np.int8), ("float32", np.float32)):
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                      loss_kl=True, max_iter=10, x_dtype=x_dtype,
                      backend="pallas")
    W0, H0, Bs0 = mu.init_matrices(cfg, G, key, 1e-6)
    _, _, _, L = mu.fit_scan(cfg, W0, H0, Bs0, jnp.asarray(Xc.astype(np_dt)),
                             Ys, hyper, key, None)
    out[x_dtype] = np.asarray(jax.device_get(L))[:, 0].tolist()

rel = max(abs(a-b)/abs(b) for a, b in zip(out["int8"], out["float32"]))
print(json.dumps({"max_rel": rel}))
"""


def _run_on_tpu(script):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=1200,
                         cwd=os.path.dirname(os.path.dirname(__file__)),
                         env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    payload = json.loads(res.stdout.strip().splitlines()[-1])
    if "skip" in payload:
        pytest.skip(payload["skip"])
    return payload


def test_compiled_pallas_matches_xla_on_tpu():
    # with matmul precision threaded into the kernels the compiled path
    # tracks XLA-HIGHEST at f32 rounding (measured 5e-7 over 10 iters);
    # the old 5e-3 tolerance was masking un-flagged bf16-pass dots
    payload = _run_on_tpu(_SCRIPT)
    assert payload["max_rel"] < 1e-5, payload


_COUNTS_SCRIPT = r"""
import json
import numpy as np, jax, jax.numpy as jnp
from alpine_tpu.ops import mu
from alpine_tpu.utils import sampling as smp

if jax.default_backend() != "tpu":
    print(json.dumps({"skip": "no tpu backend"}))
    raise SystemExit(0)

BLOCKS=(3,4,6); N_LABELS=(2,3); G, N = 64, 2944  # +pad -> 3072
r = np.random.default_rng(0)
X = r.random((G, N)).astype(np.float32)
Ys = []
for nl in N_LABELS:
    y = np.zeros((nl, N), np.float32)
    y[r.integers(0, nl, N), np.arange(N)] = 1.0
    Ys.append(y)
ids = smp.joint_label_ids(Ys)
order, start, sizes = smp.balanced_group_tables(ids)
X = X[:, order]; Ys = [y[:, order] for y in Ys]
pad = 3072 - N
Xp = jnp.asarray(np.pad(X, ((0,0),(0,pad))))
Ysp = tuple(jnp.asarray(np.pad(y, ((0,0),(0,pad)))) for y in Ys)
tables = (jnp.asarray(start), jnp.asarray(sizes))
key = jax.random.PRNGKey(0)
hyper = (jnp.asarray([2.0, 1.0], jnp.float32), jnp.float32(0.2),
         jnp.float32(0.3), jnp.float32(0.4), jnp.float32(1e-6))

out = {}
for backend in ("xla", "pallas"):
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                      loss_kl=True, weighted=True, weighted_counts=True,
                      max_iter=10, backend=backend)
    W0, H0, Bs0 = mu.init_matrices(cfg, G, key, 1e-6)
    H0 = jnp.pad(H0, ((0,0),(0,pad)))
    _, _, _, L = mu.fit_scan(cfg, W0, H0, Bs0, Xp, Ysp, hyper, key, tables)
    out[backend] = np.asarray(jax.device_get(L))[:, 0].tolist()

rel = max(abs(a-b)/abs(b) for a, b in zip(out["pallas"], out["xla"]))
print(json.dumps({"max_rel": rel}))
"""


def test_compiled_counts_pallas_matches_xla_on_tpu():
    """weighted_fast's counts-mode fused kernel (in-kernel count-scaled
    stats + masked H update) vs the XLA counts path, same grouped draws,
    compiled on the real chip."""
    payload = _run_on_tpu(_COUNTS_SCRIPT)
    assert payload["max_rel"] < 1e-5, payload


def test_compiled_pallas_int8_matches_float32_on_tpu():
    """Integer X storage dequantized in VMEM: counts <= 127 are exact in the
    int8->bf16 path, so the trajectory tracks float32 at bf16 tolerance."""
    payload = _run_on_tpu(_INT8_SCRIPT)
    assert payload["max_rel"] < 5e-3, payload


_BIGK_SCRIPT = r"""
import json
import numpy as np, jax, jax.numpy as jnp
from alpine_tpu.ops import mu

if jax.default_backend() != "tpu":
    print(json.dumps({"skip": "no tpu backend"}))
    raise SystemExit(0)

# component counts past the 128-lane MXU tile (reference supports hundreds)
r = np.random.default_rng(0)
g, n = 512, 4096
blocks, n_labels = (30, 50, 120), (4, 7)
X = jnp.asarray(r.random((g, n), dtype=np.float32))
Ys = []
for nl in n_labels:
    y = np.zeros((nl, n), np.float32)
    y[r.integers(0, nl, n), np.arange(n)] = 1.0
    Ys.append(jnp.asarray(y))
Ys = tuple(Ys)
hyper = (jnp.asarray([1.0, 1.0], jnp.float32), jnp.float32(0.1),
         jnp.float32(0.1), jnp.float32(0.2), jnp.float32(1e-6))
key = jax.random.PRNGKey(0)

out = {}
for backend in ("pallas", "xla"):
    cfg = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=n,
                      loss_kl=True, max_iter=6, backend=backend)
    W0, H0, Bs0 = mu.init_matrices(cfg, g, key, 1e-6)
    _, _, _, L = mu.fit_scan(cfg, W0, H0, Bs0, X, Ys, hyper, key, None)
    out[backend] = np.asarray(jax.device_get(L))[:, 0].tolist()

rel = max(abs(a-b)/abs(b) for a, b in zip(out["pallas"], out["xla"]))
print(json.dumps({"max_rel": rel}))
"""


def test_compiled_pallas_large_k_on_tpu():
    """K=200 (> the 128-lane MXU tile) through the compiled fused kernel."""
    payload = _run_on_tpu(_BIGK_SCRIPT)
    assert payload["max_rel"] < 5e-3, payload


_WHOLE_TRANSCRIPTOME_SCRIPT = r"""
import json
import numpy as np, jax, jax.numpy as jnp
from alpine_tpu.ops import mu
from alpine_tpu.ops import pallas_kernels as pk

if jax.default_backend() != "tpu":
    print(json.dumps({"skip": "no tpu backend"}))
    raise SystemExit(0)

# whole-transcriptome gene count at K past the MXU tile: the round-2 gate
# rejected f32 here (X tile budget) and under-budgeted W/XHt for bf16
# (Mosaic failure past the gate); the round-3 working-set gate must accept
# BOTH and the compiled kernel must track XLA.
r = np.random.default_rng(0)
g, n = 20_000, 2048
blocks, n_labels = (30, 50, 120), (4, 7)
Xf = r.random((g, n), dtype=np.float32)
Ys = []
for nl in n_labels:
    y = np.zeros((nl, n), np.float32)
    y[r.integers(0, nl, n), np.arange(n)] = 1.0
    Ys.append(jnp.asarray(y))
Ys = tuple(Ys)
hyper = (jnp.asarray([1.0, 1.0], jnp.float32), jnp.float32(0.0),
         jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e-6))
key = jax.random.PRNGKey(0)

res = {}
for x_dtype in ("float32", "bfloat16"):
    itemsize = mu.x_storage_itemsize(x_dtype)
    assert pk.h_update_supported(g, itemsize, sum(blocks), n_labels), x_dtype
    X = jnp.asarray(Xf).astype(mu.x_storage_dtype(x_dtype))
    out = {}
    for backend in ("pallas", "xla"):
        cfg = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=n,
                          loss_kl=True, max_iter=4, x_dtype=x_dtype,
                          backend=backend)
        W0, H0, Bs0 = mu.init_matrices(cfg, g, key, 1e-6)
        _, _, _, L = mu.fit_scan(cfg, W0, H0, Bs0, X, Ys, hyper, key, None)
        out[backend] = np.asarray(jax.device_get(L))[:, 0].tolist()
    res[x_dtype] = max(abs(a-b)/abs(b)
                       for a, b in zip(out["pallas"], out["xla"]))
print(json.dumps({"max_rel": res}))
"""


def test_compiled_pallas_whole_transcriptome_on_tpu():
    """g=20,000 x K=200: the full-working-set gate keeps the fused kernel
    for f32 AND bf16 storage, and the compiled Mosaic kernel (tile stepped
    down to fit VMEM) tracks the XLA path (round-2 verdict item 3)."""
    payload = _run_on_tpu(_WHOLE_TRANSCRIPTOME_SCRIPT)
    assert payload["max_rel"]["float32"] < 1e-5, payload
    assert payload["max_rel"]["bfloat16"] < 5e-3, payload


_KNN_SCRIPT = r"""
import json, time
import numpy as np, jax

if jax.default_backend() != "tpu":
    print(json.dumps({"skip": "no tpu backend"}))
    raise SystemExit(0)

from sklearn.neighbors import NearestNeighbors
from alpine_tpu.ops.knn import exact_knn

r = np.random.default_rng(0)
emb = r.normal(0, 1, (8192, 48)).astype(np.float32)
dev = jax.devices()[0]
t0 = time.perf_counter()
dist, idx = exact_knn(emb, 16, device=dev)      # includes compile
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
dist, idx = exact_knn(emb, 16, device=dev)
t_warm = time.perf_counter() - t0
sd, si = NearestNeighbors(n_neighbors=16).fit(emb).kneighbors(emb)
gaps = np.diff(sd, axis=1) > 1e-4
stable = np.concatenate([gaps, np.ones((len(emb), 1), bool)], axis=1)
stable &= np.concatenate([np.ones((len(emb), 1), bool), gaps], axis=1)
print(json.dumps({
    "max_abs_dist_err": float(np.abs(dist - sd).max()),
    "idx_mismatch_stable": int((idx != si)[stable].sum()),
    "t_warm_s": t_warm, "t_first_s": t_first,
}))
"""


def test_device_knn_matches_sklearn_on_tpu():
    """The blockwise MXU kNN (optimizer fold scoring at atlas scale) is
    exact vs sklearn on the chip, modulo distance ties."""
    payload = _run_on_tpu(_KNN_SCRIPT)
    assert payload["max_abs_dist_err"] < 1e-2, payload
    assert payload["idx_mismatch_stable"] == 0, payload
