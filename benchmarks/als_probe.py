"""Probe: where does ALS int8 mode sit relative to its X-pass floor, and
would Pallas in-VMEM dequantization of the X-sided dots buy anything?

ALS mode (reference main.py:523-588) is semantically bound to
n_blocks + 1 = 4 passes over X per iteration (see mu.als_batch_update).
The joint path's fused kernel dequantizes int8 X IN VMEM; the ALS path is
XLA, where the s8->bf16 convert feeding each dot is at the compiler's
mercy.  This probe times, at the bench shape (2k genes x 100k cells,
blocks (5,5,30), int8 X):

  A. the full ALS iteration scan (the ALPINE_BENCH_ALS=1 measurement)
  B. a scan of ONLY the 4 X-sided dots (XLA, storage-dtype X argument,
     per-dot astype like mu._dot_x) — isolates the X-pass cost
  C. the same 4 dots with X stored bfloat16 — isolates the dequant penalty
     from the pass structure
  D. the same 4 sequential passes as Pallas kernels with in-VMEM dequant
     (the joint kernel's _load_x pattern) — what a fused-ALS path could
     achieve on the X side

Each variant carries a data dependency between iterations (and, in D,
between passes) so nothing hoists or fuses away.  Prints one JSON line
per variant.

Usage: python benchmarks/als_probe.py  [iters]  [variants e.g. ABD]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from alpine_tpu.ops import mu  # noqa: E402
from alpine_tpu.ops import pallas_kernels as pk  # noqa: E402

G, N = 2000, 100_000
BLOCKS = (5, 5, 30)
N_LABELS = (2, 3)
K = sum(BLOCKS)
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def timed(fn, args, label, extra=None):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])  # sync (axon-safe)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    row = {"variant": label, "iters_per_sec": round(ITERS / best, 1),
           "ms_per_iter": round(best / ITERS * 1e3, 4)}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    return ITERS / best


def make_data(n, dtype):
    r = np.random.default_rng(0)
    X = r.poisson(2.0, (G, n)).clip(0, 127).astype(dtype)
    H = r.uniform(0.01, 1.0, (K, n)).astype(np.float32)
    W = r.uniform(0.01, 1.0, (G, K)).astype(np.float32)
    return X, H, W


def variant_a_full_als():
    cfg = mu.MUConfig(blocks=BLOCKS, n_labels=N_LABELS, n_cells=N,
                      loss_kl=True, use_als=True, max_iter=ITERS,
                      x_dtype="int8")
    X, H, W = make_data(N, np.int8)
    r = np.random.default_rng(1)
    Ys = tuple(r.integers(0, 2, (nl, N)).astype(np.int8) for nl in N_LABELS)
    Bs0 = tuple(r.uniform(0.01, 1, (nl, k)).astype(np.float32)
                for nl, k in zip(N_LABELS, BLOCKS))
    hyper = (jnp.array([1.0, 1.0], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e-10))
    key = jax.random.PRNGKey(0)
    weights = jnp.zeros((N,), jnp.float32)
    fn = functools.partial(mu.fit_scan, cfg)
    args = (jnp.asarray(W), jnp.asarray(H), tuple(map(jnp.asarray, Bs0)),
            jnp.asarray(X), tuple(map(jnp.asarray, Ys)), hyper, key, weights)
    return timed(fn, args, "A_full_als_int8")


def _xla_dots(X, H, W, cdt):
    """One ALS iteration's X-sided dots: XHt_start (1 pass, transposed
    orientation like the joint kernel) + 3 block WtXi (1 pass each),
    mimicking mu._x_ht / mu._dot_x dtype handling."""
    Xc = X.astype(cdt) if X.dtype != cdt else X
    XHt = lax.dot_general(H.astype(cdt), Xc, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # (K, g)
    outs = [XHt]
    o = 0
    for k in BLOCKS:
        Wi = lax.slice_in_dim(W, o, o + k, axis=1)
        # sequential dependency like real ALS (Wi depends on prior pass)
        Wi = Wi + 1e-20 * outs[-1].sum()
        outs.append(lax.dot_general(
            Wi.astype(cdt), Xc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))  # (k, n)
        o += k
    return outs


def variant_bc_xla(storage):
    n_pad = -(-N // 3072) * 3072  # match variant D's padded width
    X, H, W = make_data(n_pad, np.int8)
    if storage == "bfloat16":
        X = X.astype(jnp.bfloat16)
    cdt = jnp.dtype(mu.x_compute_dtype(storage))

    @jax.jit
    def run(H, W, X):
        def body(c, _):
            H, W = c
            outs = _xla_dots(X, H, W, cdt)
            Wn = W * 0.999 + 1e-12 * sum(o.sum() for o in outs[1:])
            Hn = H * 0.999 + 1e-12 * outs[0].sum()
            return (Hn, Wn), None

        (H, W), _ = lax.scan(body, (H, W), None, length=ITERS)
        return H, W

    return timed(run, (jnp.asarray(H), jnp.asarray(W), jnp.asarray(X)),
                 f"BC_xla_4dots_{storage}")


def _pallas_dots(tile_n, n):
    """The probe's two Pallas kernels with in-VMEM dequant: HXt accumulates
    H @ Xt over cell tiles -> (K, g); WtX emits (K, tile) blocks."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # the int8 X tile carries an in-VMEM bf16 dequant copy; raise the
    # per-call scoped limit like the production kernels (default 16MB
    # would reject the double-buffered tile pair)
    ws = tile_n * G * (2 * 1 + 2) + (2 * K * G + 2 * K * tile_n) * 4
    params = pltpu.CompilerParams(vmem_limit_bytes=pk._vmem_limit_for(ws))

    grid = (n // tile_n,)
    full = lambda i: (0, 0)
    by_cells = lambda i: (0, i)

    def hxt_kernel(X_ref, H_ref, out_ref):
        xt, xdt = pk._load_x(X_ref)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += lax.dot_general(
            H_ref[:].astype(xdt), xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def wtx_kernel(X_ref, W_ref, out_ref):
        xt, xdt = pk._load_x(X_ref)
        out_ref[:] = lax.dot_general(
            W_ref[:].astype(xdt), xt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    hxt = pl.pallas_call(
        hxt_kernel, grid=grid,
        in_specs=[pl.BlockSpec((G, tile_n), by_cells),
                  pl.BlockSpec((K, tile_n), by_cells)],
        out_specs=pl.BlockSpec((K, G), full),
        out_shape=jax.ShapeDtypeStruct((K, G), jnp.float32),
        compiler_params=params,
    )
    wtx = pl.pallas_call(
        wtx_kernel, grid=grid,
        in_specs=[pl.BlockSpec((G, tile_n), by_cells),
                  pl.BlockSpec((G, K), full)],
        out_specs=pl.BlockSpec((K, tile_n), by_cells),
        out_shape=jax.ShapeDtypeStruct((K, n), jnp.float32),
        compiler_params=params,
    )
    return hxt, wtx


def variant_d_pallas():
    tile_n = pk._choose_tile_n(G, N, 1, K, cast_itemsize=2)
    n_pad = -(-N // tile_n) * tile_n
    X, H, W = make_data(n_pad, np.int8)
    hxt, wtx = _pallas_dots(tile_n, n_pad)

    @jax.jit
    def run(H, W, X):
        def body(c, _):
            H, W = c
            XHt = hxt(X, H)                          # pass 1
            w1 = wtx(X, W + 1e-20 * XHt.sum())       # pass 2
            w2 = wtx(X, W + 1e-20 * w1.sum())        # pass 3 (sequential)
            w3 = wtx(X, W + 1e-20 * w2.sum())        # pass 4
            Wn = W * 0.999 + 1e-12 * (w1.sum() + w2.sum() + w3.sum())
            Hn = H * 0.999 + 1e-12 * XHt.sum()
            return (Hn, Wn), None

        (H, W), _ = lax.scan(body, (H, W), None, length=ITERS)
        return H, W

    return timed(run, (jnp.asarray(H), jnp.asarray(W), jnp.asarray(X)),
                 "D_pallas_4pass_int8",
                 {"tile_n": tile_n,
                  "note": "each WtX pass computes the FULL (K, n) product "
                          "(real ALS needs only one k_i-row block per "
                          "pass, but tiny-sublane outputs are a Mosaic "
                          "hazard — bandwidth per pass is identical)"})


if __name__ == "__main__":
    which = sys.argv[2] if len(sys.argv) > 2 else "ABCD"
    if "A" in which:
        variant_a_full_als()
    if "B" in which:
        variant_bc_xla("int8")
    if "C" in which:
        variant_bc_xla("bfloat16")
    if "D" in which:
        variant_d_pallas()
