"""weighted_fast sampling-cost A/B (round-4 verdict weak #1 / next #2).

weighted_fast's fused kernel runs at ~0.49 ms/iter at the bench shape, but
the mode measured 750 it/s (1.33 ms/iter) in round 4 — bound by the
per-iteration SAMPLING: the balanced epoch draw (2×n uniforms + small
table gathers, ~0.53 ms) and the n-increment scatter-add count (~0.64 ms).
Both are far off the chip's element rates, i.e. serialization-bound inside
the scan, not throughput-bound.

This probe A/Bs every counting formulation attacked in rounds 4-5 against
the per-iteration sampler:

  per_iter_sampler_ms     one grouped_balanced_counts per scan step
                          (draws + scatter; the production path)
  per_iter_draws_only_ms  the draws alone — isolates the scatter share
  prescan_*               ALL T epochs in one batched 2-D scatter
                          (mu.grouped_balanced_counts_batched, identical
                          rows) + the per-step row read the fit would pay
  flat1d_batched_ms       the same batched count as one flattened 1-D
                          scatter (rules out the 2-D formulation)
  sort_count_ms           per-iteration sort + searchsorted counting
  binomial_100k_ms        price of 100k jax.random.binomial draws (floor
                          for any binomial-tree multinomial construction)

Round-5 verdict on a v5e: per-iteration 0.93 ms (0.26 draws + 0.67
scatter) BEATS everything — batched scatters run at ~half the
small-scatter element rate (1.36 ms/iter either formulation), sorting is
12x off, and one binomial costs ~100x one uniform, pricing out the tree.
The per-iteration scatter-add at ~150 Melem/s is the fastest counting
regime the chip offers; weighted_fast's sampling bound is real.  The
prescan path is therefore OFF by default (ALPINE_TPU_COUNTS_PRESCAN=1
re-enables it for A/Bs on other hardware).

Scan-amortized timing, one scalar fetched (CLAUDE.md micro-timing rule).
Prints one JSON line; recorded in BENCH_CONFIGS_r{N}.json.
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

    T = len(keys)

    @jax.jit
    def flat1d_batched(keys):
        cell = jax.vmap(
            lambda k: mu._grouped_draw_cells(k, n, tables, n_pad))(keys)
        idx = (jnp.arange(T)[:, None] * (n_pad + 1) + cell).ravel()
        out = jnp.zeros((T * (n_pad + 1),), jnp.float32).at[idx].add(
            1.0, mode="drop")
        return out[0] + out[-1] + out.sum()

    @jax.jit
    def sort_count(keys):
        def body(acc, k):
            cell = mu._grouped_draw_cells(k, n, tables, n_pad)
            s = jnp.sort(cell)
            edges = jnp.searchsorted(s, jnp.arange(n_pad + 1))
            c = (edges[1:] - edges[:-1]).astype(jnp.float32)
            return acc + c[0] + c[-1], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return acc

    def binomial_price():
        try:
            @jax.jit
            def binom(k):
                return jax.random.binomial(
                    k, jnp.full((n,), 10.0), jnp.full((n,), 0.5)).sum()
            return _timed(binom, keys[0])
        except Exception:
            return None

    t_iter = _timed(per_iter_sampler, keys)
    t_pre = _timed(prescan, keys)
    t_pre_read = _timed(prescan_then_read, keys)
    t_draws = _timed(draws_only, keys)
    t_flat = _timed(flat1d_batched, keys)
    t_sort = _timed(sort_count, keys)
    t_binom = binomial_price()

    out = {
        "metric": "weighted_sampling_probe",
        "shape": {"cells": n, "groups": int(len(sizes)), "scan_steps": T},
        "per_iter_sampler_ms": round(t_iter / T * 1e3, 4),
        "per_iter_draws_only_ms": round(t_draws / T * 1e3, 4),
        "per_iter_scatter_share_ms": round((t_iter - t_draws) / T * 1e3, 4),
        "prescan_total_ms": round(t_pre * 1e3, 3),
        "prescan_amortized_per_iter_ms": round(t_pre / T * 1e3, 4),
        "prescan_plus_row_reads_per_iter_ms": round(t_pre_read / T * 1e3, 4),
        "prescan_speedup_vs_per_iter": round(t_iter / t_pre_read, 2),
        "flat1d_batched_per_iter_ms": round(t_flat / T * 1e3, 4),
        "sort_count_per_iter_ms": round(t_sort / T * 1e3, 4),
        "binomial_100k_ms": (None if t_binom is None
                             else round(t_binom * 1e3, 3)),
        "note": ("all batched/sorted/binomial variants measured SLOWER "
                 "than the per-iteration draws+scatter (see module "
                 "docstring); the prescan path is kept behind "
                 "ALPINE_TPU_COUNTS_PRESCAN=1 for A/Bs on other hardware. "
                 "End-to-end: bench.py ALPINE_BENCH_SAMPLING=weighted_fast"
                 " with/without the flag."),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
