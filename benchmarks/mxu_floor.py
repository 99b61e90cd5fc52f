"""XLA dot-loop reference + K-padding evidence for the int8 joint mode
(round-2 verdict item 4: "settle the int8 MXU floor with arithmetic or
beat it" — the arithmetic half lives in benchmarks/roofline.py:mxu_model).

Why int8 joint mode sits at ~50% of its HBM-bandwidth floor: once X is
1 byte/element, the iteration's MXU time stops hiding under the DMA.  The
dominant term is X@Hnᵀ — output (genes × K), whose K=40 column dimension
pads to the MXU's 128 lanes, wasting ~2/3 of the issued MAC slots
(roofline.py quantifies: that one dot is ~0.26 ms of the measured
~0.56 ms iteration).  Cutting the padding would require quantizing W/H to
int8 as well (s8×s8→s32 passes), which would change the update numerics —
off the table: integer X storage is sold as EXACT (the repo invariant
gates update math at rtol 1e-11 against the float64 oracle).  There is no
lane-packing trick either: the two X dots contract over DIFFERENT axes
(genes vs cells), so their operands cannot be concatenated into one wider
MXU pass.

What this benchmark MEASURES (two facts the model rests on):

1. `xla_dot_loop_iters_per_sec`: a dependency-chained XLA loop of exactly
   the per-iteration matmul work (same dtypes/precisions as the kernel).
   XLA streams X from HBM at the COMPUTE width for each of the two X dots
   (2 passes × bf16), so this is what the same math costs WITHOUT the
   fused kernel's single-storage-width-read design — the measured fused
   kernel runs ~2.5x faster than this, which bounds how much of the gap
   to the pure-bandwidth floor is 'implementation' vs 'physics'.
2. K=40 vs K=128 at identical data THROUGH THIS LOOP: nearly flat,
   because the loop is DMA-bound (2 bf16 X passes) so the K-growth hides.
   On the FUSED kernel itself the growth is visible but sublinear —
   measured (bench.py ALPINE_BENCH_BLOCKS=20,20,81) K=121 costs ~1.56x
   K=40 for 3x the components: XHt's lane-padded term is K-invariant up
   to 128, while WtX's sublane padding (40 -> 128 rows) and the f32 K^2
   terms grow — exactly what roofline.py's r8/r128 model predicts.

Usage:
    python benchmarks/mxu_floor.py            # measures on the default chip
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # repo-root bench.py: shares the shape configuration


def measure_dot_floor(K: int, iters: int = 200) -> float:
    """Seconds per iteration for the per-iteration MXU work at component
    count K, with the X operand stored at the bench dtype's COMPUTE width
    (bf16 for int8 storage — what the kernel's in-VMEM dequant feeds the
    MXU)."""
    import jax
    import jax.numpy as jnp

    from alpine_tpu.ops import mu

    g, n = bench.N_GENES, bench.N_CELLS
    n = -(-n // 128) * 128
    storage = mu.x_storage_dtype(bench.resolved_dtype())
    xdt = mu.x_compute_dtype(storage)
    r = np.random.default_rng(0)
    X = jnp.asarray(r.random((g, n), dtype=np.float32)).astype(xdt)
    W0 = jnp.asarray(r.random((g, K), dtype=np.float32))
    H0 = jnp.asarray(r.random((K, n), dtype=np.float32))

    prec = None if xdt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    # X is passed as an ARGUMENT, never closed over: a closure constant of
    # this size gets baked into the remote-compile payload (CLAUDE.md:
    # "HTTP 413" / hang through the axon tunnel)
    def one(X, W, H):
        WtX = jax.lax.dot_general(
            W.astype(xdt), X, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        WtW = jnp.dot(W.T, W, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
        den = jnp.dot(WtW, H, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
        Hn = H * (WtX / jnp.maximum(den, 1e-6))
        # transposed orientation, matching the round-3 kernel (K on the
        # sublane axis instead of 128 padded output lanes)
        HXt = jax.lax.dot_general(
            Hn.astype(xdt), X, (((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        HHt = jax.lax.dot_general(
            Hn, Hn, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        # chain the carry through both accumulators so no dot is dead code
        Wn = W * (HXt.T / jnp.maximum(jnp.dot(W, HHt), 1e-6))
        return Wn, Hn

    @jax.jit
    def loop(X, W, H):
        def body(c, _):
            return one(X, *c), None

        (W, H), _ = jax.lax.scan(body, (W, H), None, length=iters)
        return W, H

    np.asarray(jax.device_get(loop(X, W0, H0)[0]))  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(loop(X, W0, H0)[0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def main():
    K = sum(bench.BLOCKS)
    args = sys.argv[1:]
    measured_ips = float(args[0]) if args else None

    sec_k = measure_dot_floor(K)
    sec_128 = measure_dot_floor(128)
    out = {
        "metric": "mxu_floor_evidence",
        "x_dtype": bench.resolved_dtype(),
        "shape": {"genes": bench.N_GENES, "cells": bench.N_CELLS, "K": K},
        "xla_dot_loop_iters_per_sec_K%d" % K: round(1.0 / sec_k, 1),
        "xla_dot_loop_iters_per_sec_K128": round(1.0 / sec_128, 1),
        "lane_padding_flatness_K%d_vs_K128" % K: round(sec_128 / sec_k, 3),
    }
    if measured_ips is not None:
        out["fused_kernel_iters_per_sec"] = measured_ips
        out["fused_vs_xla_dot_loop"] = round(measured_ips * sec_k, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
