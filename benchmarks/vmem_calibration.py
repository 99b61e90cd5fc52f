"""Calibrate the fused-kernel VMEM working-set model against REAL Mosaic
stack allocations (round-4 advisor finding 2: the counts-mode surcharge in
`pallas_kernels.working_set_bytes` was modeled, not calibrated — the two
pre-existing anchors predate counts mode).

Method: for each anchor shape, monkeypatch the per-call scoped-vmem limit
to half the modeled working set and compile the kernel; Mosaic's
compile-time OOM reports the ACTUAL stack allocation ("Scoped allocation
with size X and limit Y exceeded...").  The model is valid iff
actual <= model for every anchor (the gate then adds _WS_MARGIN headroom
on top of the model, so a conservative model can never admit a shape that
fails inside Mosaic).

Anchors (plus the two historical non-counts ones recorded in the
working_set_bytes docstring):
  counts-int8   g=2000,  K=40,  labels (2,3) — the bench/production
                weighted_fast shape at its chosen counts tile
  counts-f32    g=20000, K=200, labels (2,3) — the documented worst f32
                shape that must keep the kernel (CLAUDE.md invariant)

Prints one JSON line; recorded in BENCH_CONFIGS_r{N}.json.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(g, K, blocks, labels, itemsize, counts_mode=True):
    import jax.numpy as jnp

    from alpine_tpu.ops import pallas_kernels as pk

    cast = 2 if itemsize == 1 else (4 if itemsize == 2 else 0)
    tile = pk._choose_tile_n(g, 128 * 1024, itemsize, K, labels,
                             cast_itemsize=cast, counts_mode=counts_mode)
    if tile is None:
        return {"tile": None, "note": "shape not gated in"}
    ws = pk.working_set_bytes(g, K, tile, itemsize, labels,
                              cast_itemsize=cast, counts_mode=counts_mode)
    n = tile * 2
    r = np.random.default_rng(0)
    sdt = np.int8 if itemsize == 1 else (np.int16 if itemsize == 2
                                         else np.float32)
    X = jnp.asarray(r.integers(0, 100, (g, n)).astype(sdt))
    W = jnp.asarray(r.random((g, K), dtype=np.float32) + 0.1)
    H = jnp.asarray(r.random((K, n), dtype=np.float32) + 0.1)
    Ys = tuple(jnp.asarray((r.random((nl, n)) < 0.5).astype(sdt))
               for nl in labels)
    ks = blocks[:-1]
    Bs = tuple(jnp.asarray(r.random((nl, k), dtype=np.float32) + 0.1)
               for nl, k in zip(labels, ks))
    lam = jnp.asarray([1.0] * len(labels), jnp.float32)
    eps = jnp.float32(1e-6)
    counts = (jnp.asarray(r.integers(0, 3, (2, n)).astype(np.float32))
              if counts_mode else None)

    orig = pk._vmem_limit_for
    pk._vmem_limit_for = lambda b: max(ws // 2, 1 << 20)
    actual = None
    try:
        out = pk.fused_iteration(X, W, H, W.T @ W, Ys, Bs, lam, eps, counts,
                                 blocks=blocks, loss_kl=True)
        np.asarray(out[0])
        note = "compiled under half-model limit (actual < model/2)"
        actual = ws // 2  # upper bound only
    except Exception as e:
        m = re.search(r"Scoped allocation with size ([\d.]+)([MK])", str(e))
        if m:
            scale = 1e6 if m.group(2) == "M" else 1e3
            actual = float(m.group(1)) * scale
            note = "from Mosaic compile-time OOM report"
        else:
            note = "unparsed failure: " + str(e)[-200:]
    finally:
        pk._vmem_limit_for = orig
    return {
        "tile": tile,
        "model_MB": round(ws / 1e6, 2),
        "actual_MB": None if actual is None else round(actual / 1e6, 2),
        "model_covers_actual": (None if actual is None
                                else bool(ws >= actual)),
        "note": note,
    }


def main():
    rows = {
        "counts_int8_g2000_K40": measure(2000, 40, (5, 5, 30), (2, 3), 1),
        "counts_f32_g20000_K200": measure(20000, 200, (60, 60, 80), (2, 3),
                                          4),
    }
    ok = all(r.get("model_covers_actual") is not False for r in rows.values())
    print(json.dumps({
        "metric": "vmem_calibration",
        "margin": 1.15,
        "anchors": rows,
        "historical_non_counts_anchors_MB": {
            "f32_g20k_K200": {"actual": 69.19, "model": "~67 (see "
                              "working_set_bytes docstring)"},
            "int8_tile12544": {"actual": 127.35, "model": "~119"},
        },
        "model_valid": ok,
        "note": ("actual stack sizes parsed from Mosaic's compile-time OOM "
                 "under a half-model scoped-vmem limit; the gate admits a "
                 "shape only when model*1.15 fits, so model >= actual "
                 "guarantees no model-reachable shape fails inside Mosaic "
                 "(the repo invariant)"),
    }))


if __name__ == "__main__":
    main()
