"""Collective-traffic audit for the sharded fit: proof from the compiled
HLO that cross-chip communication is O(genes·K) PER ITERATION and does not
grow with the cell count (README "Scaling out"; SURVEY §7: psums of only the
small accumulators; tests/test_sharding.py separately asserts NO all-to-all
or all-gather appears).

Lowers the shard_map fused-kernel fit over an 8-virtual-device CPU mesh at
two cell counts, extracts every all-reduce from the while-loop body, and
prints one JSON line per configuration with the summed payload bytes.

Usage:  python benchmarks/comm_audit.py
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# self-pinned virtual CPU mesh, exactly like __graft_entry__.dryrun_multichip
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from alpine_tpu.ops import mu  # noqa: E402

_SHAPE_RE = re.compile(r"all-reduce[^=]*=\s*\(?([a-z0-9\[\],\s]+)\)?\s*all-reduce",
                       re.IGNORECASE)
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1,
                "pred": 1, "f16": 2, "s16": 2}


def allreduce_bytes(hlo: str) -> dict:
    """Sum payload bytes of every all-reduce instruction in the HLO text."""
    total = 0
    count = 0
    for line in hlo.splitlines():
        # op call site is "all-reduce(" WITH the paren; the instruction is
        # often itself named %all-reduce (no paren), so split at the call
        pos = line.find("all-reduce(")
        if pos < 0:
            pos = line.find("all-reduce-start(")
        if pos < 0:
            continue
        # result shape(s) appear on the lhs — possibly a tuple:
        #   %all-reduce = (f32[64,13]{1,0}, f32[13,13]{1,0}, ...) all-reduce(
        lhs = line[:pos]
        for m in re.finditer(r"(f64|f32|bf16|f16|s32|u32|s16|s8|pred)\[([0-9,]*)\]",
                             lhs):
            dt, dims = m.group(1), m.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
            count += 1
    return {"allreduce_instructions": count, "allreduce_bytes": total}


def audit(n_cells: int, n_genes: int = 64, blocks=(3, 4, 6), n_labels=(2, 3)):
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("cells",))
    cfg = mu.MUConfig(blocks=blocks, n_labels=n_labels, n_cells=n_cells,
                      loss_kl=True, max_iter=5, backend="pallas_interpret")
    key = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    X = jnp.asarray(r.random((n_genes, n_cells), dtype=np.float32))
    Ys = []
    for nl in n_labels:
        y = np.zeros((nl, n_cells), np.float32)
        y[r.integers(0, nl, n_cells), np.arange(n_cells)] = 1.0
        Ys.append(jnp.asarray(y))
    Ys = tuple(Ys)
    hyper = (jnp.asarray([1.0, 1.0], jnp.float32), jnp.float32(0.0),
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e-6))
    W0, H0, Bs0 = mu.init_matrices(cfg, n_genes, key, 1e-6)

    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "cells")))
    rp = lambda a: jax.device_put(a, NamedSharding(mesh, P()))
    fn = mu._build_sharded_pallas_fit(cfg, mesh)
    lowered = fn.lower(rp(W0), sh(H0), tuple(rp(b) for b in Bs0), sh(X),
                       tuple(sh(y) for y in Ys), hyper)
    hlo = lowered.compile().as_text()
    out = {"n_cells": n_cells, "n_genes": n_genes, "K": sum(blocks)}
    out.update(allreduce_bytes(hlo))
    # sanity: the no-all-to-all invariant the tests assert
    out["all_to_all"] = hlo.count("all-to-all")
    out["all_gather"] = hlo.count("all-gather(")
    return out


def main():
    results = [audit(4096), audit(16384)]
    for r in results:
        print(json.dumps(r))
    a, b = results
    same = a["allreduce_bytes"] == b["allreduce_bytes"]
    print(json.dumps({
        "metric": "collective_bytes_independent_of_cells",
        "value": bool(same),
        "note": "4x the cells, identical all-reduce payload: communication "
                "is O(genes*K + K^2) per iteration as designed",
    }))
    if not (same and a["all_to_all"] == 0 and a["all_gather"] == 0):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
