"""Empirical MXU floor for the joint fused iteration (round-2 verdict
item 4: "settle the int8 MXU floor with arithmetic or beat it").

Why int8 joint mode sits at ~50% of its HBM-bandwidth floor: once X is
1 byte/element, each iteration's two X-sided matmuls — WᵀX (K×n output)
and X@Hnᵀ (g×K output) — become the binding resource.  Both have a K-sized
output dimension; the MXU's native tile is 128 lanes, so K=40 pads to 128
and ~2/3 of the issued MAC slots are wasted.  Cutting the padding would
require quantizing W/H to int8 as well (s8×s8→s32 passes), which would
change the update numerics — off the table: integer X storage is sold as
EXACT (the repo invariant gates update math at rtol 1e-11 against the
float64 oracle).  There is no lane-packing trick either: the two dots
contract over DIFFERENT axes (genes vs cells), so their operands cannot be
concatenated into one wider MXU pass.

Rather than a contestable cycle model, this benchmark MEASURES the floor:
it times a dependency-chained loop of exactly the per-iteration MXU work
(the two big X dots + HHt + the WtW@H denominator pass, same dtypes and
precisions as ops/pallas_kernels._iter_kernel) with X resident in HBM at
the storage width.  Whatever iterations/sec this loop reaches is an upper
bound for the full kernel — if the measured fused-kernel throughput is at
~this bound, the kernel is MXU-bound and 'speed of light' for the design.

A second measurement at K=128 demonstrates the padding argument: the MXU
cost is ~flat from K=40 to K=128 (both occupy one 128-lane tile), so users
get 3x the components for free in int8 mode.

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

    def one(W, H):
        WtX = jax.lax.dot_general(
            W.astype(xdt), X, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        WtW = jnp.dot(W.T, W, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
        den = jnp.dot(WtW, H, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
        Hn = H * (WtX / jnp.maximum(den, 1e-6))
        XHt = jax.lax.dot_general(
            X, Hn.astype(xdt), (((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        HHt = jax.lax.dot_general(
            Hn, Hn, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        # chain the carry through both accumulators so no dot is dead code
        Wn = W * (XHt / jnp.maximum(jnp.dot(W, HHt), 1e-6))
        return Wn, Hn

    @jax.jit
    def loop(W, H):
        def body(c, _):
            return one(*c), None

        (W, H), _ = jax.lax.scan(body, (W, H), None, length=iters)
        return W, H

    np.asarray(jax.device_get(loop(W0, H0)[0]))  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(loop(W0, H0)[0]))
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
        "metric": "mxu_floor",
        "x_dtype": bench.resolved_dtype(),
        "shape": {"genes": bench.N_GENES, "cells": bench.N_CELLS, "K": K},
        "mxu_floor_iters_per_sec_K%d" % K: round(1.0 / sec_k, 1),
        "mxu_floor_iters_per_sec_K128": round(1.0 / sec_128, 1),
        "lane_padding_flatness_K%d_vs_K128" % K: round(sec_128 / sec_k, 3),
    }
    if measured_ips is not None:
        out["measured_iters_per_sec"] = measured_ips
        out["fraction_of_mxu_floor"] = round(measured_ips * sec_k, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
