"""weighted_fast sampling-cost A/B (round-4 verdict weak #1 / next #2).

weighted_fast's fused kernel runs at ~0.49 ms/iter at the bench shape, but
the mode measured 750 it/s (1.33 ms/iter) in round 4 — bound by the
per-iteration SAMPLING: the balanced epoch draw (2×n uniforms + small
table gathers, ~0.53 ms) and the n-increment scatter-add count (~0.64 ms).
Both are far off the chip's element rates, i.e. serialization-bound inside
the scan, not throughput-bound.

This probe A/Bs the round-5 fix — precompute ALL iterations' counts in ONE
batched scatter before the scan (`mu.grouped_balanced_counts_batched`,
identical draw streams, gated by `mu._counts_prescan_ok`) — against the
per-iteration sampler, and also times the two pieces separately:

  per_iter_sampler_ms   one grouped_balanced_counts per scan step
  prescan_total_ms      the one-shot (T, n) batched draw+count
  prescan_row_read_ms   dynamic-slicing one count row per scan step
                        (what the fit pays per iteration after prescan)

Scan-amortized timing, one scalar fetched (CLAUDE.md micro-timing rule).
Prints one JSON line; recorded in BENCH_CONFIGS_r{N}.json.  The end-to-end
effect shows in bench.py's ALPINE_BENCH_SAMPLING=weighted_fast row
(ALPINE_TPU_COUNTS_PRESCAN=0 reproduces the round-4 behavior).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # repo-root: shares the shape configuration


def _timed(fn, *args, repeats=3):
    np.asarray(fn(*args))  # compile + warm (device_get syncs through axon)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from alpine_tpu.ops import mu
    from alpine_tpu.utils import sampling as smp

    n = bench.N_CELLS
    T = 100  # scan steps per timed call
    r = np.random.default_rng(0)
    # the bench's joint-label structure: 2x3 covariate levels -> 6 groups
    ids = np.sort(r.integers(0, 6, n))
    _, start, sizes = smp.balanced_group_tables(ids)
    tables = (jnp.asarray(start), jnp.asarray(sizes))
    n_pad = -(-n // 512) * 512
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, T)

    @jax.jit
    def per_iter_sampler(keys):
        def body(acc, k):
            c = mu.grouped_balanced_counts(k, n, tables, n_pad)
            return acc + c[0] + c[-1], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return acc

    @jax.jit
    def prescan(keys):
        C = mu.grouped_balanced_counts_batched(keys, n, tables, n_pad)
        return C[0, 0] + C[-1, -1] + C.sum()

    @jax.jit
    def prescan_then_read(keys):
        C = mu.grouped_balanced_counts_batched(keys, n, tables, n_pad)

        def body(acc, it):
            c = C[it]
            return acc + c[0] + c[-1], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(T))
        return acc

    # draws alone (no counting scatter): isolates the scatter's share
    @jax.jit
    def draws_only(keys):
        def body(acc, k):
            cell = mu._grouped_draw_cells(k, n, tables, n_pad)
            return acc + cell[0] + cell[-1], None
        acc, _ = jax.lax.scan(body, jnp.int32(0), keys)
        return acc

    t_iter = _timed(per_iter_sampler, keys)
    t_pre = _timed(prescan, keys)
    t_pre_read = _timed(prescan_then_read, keys)
    t_draws = _timed(draws_only, keys)

    out = {
        "metric": "weighted_sampling_probe",
        "shape": {"cells": n, "groups": int(len(sizes)), "scan_steps": T},
        "per_iter_sampler_ms": round(t_iter / T * 1e3, 4),
        "per_iter_draws_only_ms": round(t_draws / T * 1e3, 4),
        "per_iter_scatter_share_ms": round((t_iter - t_draws) / T * 1e3, 4),
        "prescan_total_ms": round(t_pre * 1e3, 3),
        "prescan_amortized_per_iter_ms": round(t_pre / T * 1e3, 4),
        "prescan_plus_row_reads_per_iter_ms": round(t_pre_read / T * 1e3, 4),
        "speedup_per_iter": round(t_iter / (t_pre_read / T) / T, 2)
        if t_pre_read else None,
        "note": ("prescan = mu.grouped_balanced_counts_batched (one "
                 "batched scatter for all T epochs, identical draw rows); "
                 "the fit uses it when (max_iter+1)*n_padded*4B <= "
                 f"{mu._COUNTS_PRESCAN_MB} MB (ALPINE_TPU_COUNTS_PRESCAN "
                 "forces on/off).  End-to-end effect: bench.py "
                 "ALPINE_BENCH_SAMPLING=weighted_fast with/without "
                 "ALPINE_TPU_COUNTS_PRESCAN=0."),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
