"""Achievable-envelope probes for the fused MU kernel (round-3 verdict
item 6: promote the probe results from a JSON note into a script the
driver can re-run).

The round-3 claim "the int8 kernel is near its achievable envelope" rests
on three measurements; this script reproduces each and prints one JSON
line:

1. s8_dot — whether a dot can consume int8 x bf16 operands directly, and
   whether doing so is any FASTER than the explicit dequantize-then-dot
   the fused kernel performs.  Measured on v5e: supported at the XLA
   level but the same speed (~0.9 ms per (48,100k)x(100k,2000) dot either
   way — the MXU consumes bf16, so the widening happens regardless), so
   the in-VMEM dequant copy that roofline.py charges to the int8 floor
   costs nothing avoidable.
2. streaming_GBps — a pure-streaming Pallas kernel (HBM->VMEM DMA + one
   per-element VPU widen-and-reduce) over the bench-shaped X.  float32
   measures the DMA ceiling for this access pattern (~950 GB/s); int8
   is VPU-cast-bound (~250 GB/s = ~250 Gelem/s — the same per-element
   conversion rate roofline.py's dequant term models), which is exactly
   why narrow storage trades HBM bytes for VPU work.
3. tile_ab — end-to-end bench throughput at X tile budgets 6/12/24 MB
   (fresh process per size: ALPINE_TPU_X_TILE_MB is read at import).
   The shipped default (6 MB) should be fastest or within noise of it.

Measurement discipline: every probe runs its op REPS times inside ONE
jitted lax.scan and fetches a scalar — per-dispatch latency through the
axon tunnel is ~25 ms and the host fetch path runs at ~20 MB/s, so
single-dispatch timings measure the tunnel, not the chip (this is also
why bench.py times whole scans).

Usage:  python benchmarks/envelope_probe.py            # default accelerator
        ALPINE_PROBE_SKIP_AB=1 ...                     # skip the slow A/B
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # repo-root bench.py: shares the shape configuration

REPS = 32


def _time_fetch(fn, *args, repeats=3):
    np.asarray(fn(*args))  # compile + warm (fetch syncs through axon)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def probe_s8_dot():
    """Direct int8 x bf16 dot: supported?  faster than dequant-then-dot?"""
    import jax
    import jax.numpy as jnp
    from jax import lax

    g, n, K = bench.N_GENES, bench.N_CELLS, 48
    r = np.random.default_rng(0)
    Xs = jnp.asarray(r.integers(0, 100, (g, n)).astype(np.int8))
    Hb = jnp.asarray(r.random((K, n)).astype(np.float32)).astype(jnp.bfloat16)

    def mk(cast):
        @jax.jit
        def many(H, X):
            def body(acc, i):
                Xop = X.astype(jnp.bfloat16) if cast else X
                # scale H by i so no two iterations CSE into one dot
                out = lax.dot_general(H * (1 + 1e-9 * i), Xop,
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                return acc + out[0, 0], None
            acc, _ = lax.scan(body, jnp.float32(0),
                              jnp.arange(REPS, dtype=jnp.float32))
            return acc
        return many

    res = {}
    try:
        res["direct_ms"] = round(_time_fetch(mk(False), Hb, Xs) / REPS * 1e3, 3)
        res["supported"] = True
    except Exception as e:  # noqa: BLE001 — record whatever the stack raises
        res["supported"] = False
        res["error_type"] = type(e).__name__
        res["error_head"] = str(e).splitlines()[0][:160]
    res["dequant_then_dot_ms"] = round(
        _time_fetch(mk(True), Hb, Xs) / REPS * 1e3, 3)
    return res


def probe_streaming(x_dtype_name: str):
    """Pure-streaming Pallas kernel over the bench-shaped X: per-tile DMA
    plus one per-element VPU widen-and-reduce into a revisited (8, 128)
    accumulator block — no MXU work."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from alpine_tpu.ops import mu

    g, n = bench.N_GENES, bench.N_CELLS
    storage = np.dtype(mu.x_storage_dtype(x_dtype_name))
    tile = max(128, (6 * 1024 * 1024 // (g * storage.itemsize)) // 128 * 128)
    n_pad = -(-n // tile) * tile
    X = np.random.default_rng(0).integers(0, 100, (g, n_pad)).astype(storage)

    def kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        # reads (and widens) EVERY element; output is a natural-width
        # (8, 128) VMEM block (tiny/SMEM outputs stall the pipeline —
        # see ops/pallas_kernels.py pitfalls)
        s = jnp.sum(x_ref[...].astype(jnp.float32), axis=0, keepdims=True)
        o_ref[...] += jnp.broadcast_to(s[:, :128], (8, 128))

    stream = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[pl.BlockSpec((g, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    @jax.jit
    def many(X):
        def body(acc, i):
            return acc + stream(X)[0, 0] * (1.0 + 1e-9 * i), None
        acc, _ = lax.scan(body, jnp.float32(0),
                          jnp.arange(REPS, dtype=jnp.float32))
        return acc

    sec = _time_fetch(many, jnp.asarray(X)) / REPS
    return round(g * n_pad * storage.itemsize / sec / 1e9, 1)


def probe_tile_ab():
    """End-to-end bench throughput vs the X tile budget (fresh process per
    size — the knob is read at import)."""
    out = {}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for mb in (6, 12, 24):
        env = dict(os.environ, ALPINE_TPU_X_TILE_MB=str(mb),
                   ALPINE_BENCH_REPEATS="3", ALPINE_BENCH_CHILD="1",
                   ALPINE_BENCH_SKIP_BASELINE_REFRESH="1")
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(repo, "bench.py")],
                env=env, capture_output=True, text=True, timeout=900)
            rows = [l for l in r.stdout.splitlines()
                    if l.startswith('{"metric"')]
            out[f"{mb}MB"] = (json.loads(rows[-1])["value"] if rows
                              else None)
        except subprocess.TimeoutExpired:
            # a slow tunnel init must cost one A/B point, not the probe
            out[f"{mb}MB"] = None
    return out


def main():
    res = {
        "metric": "envelope_probe",
        "shape": {"genes": bench.N_GENES, "cells": bench.N_CELLS},
        "s8_dot": probe_s8_dot(),
        "streaming_GBps": {
            "int8": probe_streaming("int8"),
            "float32": probe_streaming("float32"),
        },
    }
    if not os.environ.get("ALPINE_PROBE_SKIP_AB"):
        res["tile_ab_iters_per_sec"] = probe_tile_ab()
    res["note"] = (
        "claim chain: (a) a direct s8 dot is no faster than dequant-then-"
        "dot (the MXU consumes bf16 either way) -> the in-VMEM dequant in "
        "roofline.py's int8 floor is unavoidable; (b) f32 streaming is "
        "the DMA ceiling and int8 streaming the VPU widen rate that "
        "floor's dequant term models; (c) the shipped 6 MB X tile is "
        "at/near the end-to-end optimum"
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
