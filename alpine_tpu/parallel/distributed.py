"""Multi-process (DCN) bootstrap and host-side collectives.

The reference is strictly single-process (`/root/reference/alpine/main.py:70`
— one torch device; no torch.distributed anywhere).  SURVEY §2 equivalents
(c) / §5 promise DCN-level scale-out for atlas configs; this module is the
bootstrap half of it:

- `initialize()` wraps `jax.distributed.initialize` with the environment
  plumbing a CPU-backed test/dev run needs (gloo cross-process collectives
  must be configured BEFORE the backend exists).  On TPU pods the standard
  zero-argument call autodetects everything from the TPU metadata; on CPU
  or explicit setups pass coordinator/num_processes/process_id.
- `Placement` (parallel/mesh.py) then detects a multi-process mesh and
  ingests PER-PROCESS host shards via `jax.make_array_from_process_local_data`
  — no process ever builds the full X host-side (round-2 verdict item 2).
- small host-side helpers (`process_allgather_rows`, `assert_same_across_
  processes`) used by the model layer to validate that per-process inputs
  are mutually consistent before an expensive fit.

Worked recipe (each process runs the same program):

    from alpine_tpu.parallel import distributed as dist
    dist.initialize()                       # TPU pod: autodetected
    mesh = dist.global_cell_mesh()          # 1-D mesh over ALL chips
    model = ALPINE(..., device=mesh)
    model.fit(adata_local, ...)             # adata_local = THIS process's
                                            # equal-size cell shard
    # each process's adata_local.obsm now holds its own cells' embeddings

Tested end-to-end by tests/test_multiprocess.py: two real OS processes on
localhost (CPU backend, gloo), per-process shard ingestion, sharded fit,
and loss-trajectory agreement with the single-process fit.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
    cpu_collectives: str = "gloo",
) -> None:
    """Join (or start) the distributed runtime.  Call BEFORE any other jax
    use in the process — the CPU collectives implementation and the device
    topology are fixed at backend creation.

    On a TPU pod slice the zero-argument form autodetects the coordinator
    and process ids from the TPU metadata.  For CPU runs (tests, dev) pass
    all three explicitly; `cpu_collectives` selects the cross-process CPU
    collective transport (gloo is compiled into stock jaxlib)."""
    import jax

    if cpu_collectives:
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        except Exception:  # config knob absent on very old jax — TPU-only
            pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_coordinator() -> bool:
    """True on process 0 (use to gate one-copy side effects: trial pickles,
    checkpoint writes, log lines)."""
    return process_index() == 0


def global_cell_mesh():
    """1-D cell-axis mesh over ALL devices of ALL processes (the standard
    multi-process fit topology).  Device order is jax.devices() — processes
    own contiguous runs of it, which Placement's shard ingestion relies on."""
    import jax

    from alpine_tpu.parallel.mesh import CELL_AXIS
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (CELL_AXIS,))


def process_cell_range(n_cells: int, n_processes: Optional[int] = None,
                       process_index_: Optional[int] = None) -> tuple:
    """This process's contiguous cell (obs-row) range ``(lo, hi)`` of a
    globally ``n_cells``-cell dataset, split near-equally across processes
    (the first ``n_cells % n_processes`` processes take one extra cell).

    The ingestion partner of ``io.h5ad.read_h5ad(path, obs_range=...)``:

        n_obs, _ = h5ad_dims(path)
        lo, hi = dist.process_cell_range(n_obs)
        adata_local = read_h5ad(path, obs_range=(lo, hi))
        model.fit(adata_local, ...)

    Shards may differ by one cell; the fit pads every shard to a common
    aligned width internally (zero columns are exactly neutral), so no
    cells need to be dropped to satisfy an equal-shard contract.

    NOTE: the range is keyed by the process's position along the mesh's
    cell axis (`Placement.process_chunk_index`), which for
    `global_cell_mesh` equals the jax process index."""
    if not isinstance(n_cells, (int, np.integer)) or n_cells <= 0:
        raise ValueError("n_cells must be a positive integer")
    n_cells = int(n_cells)
    p = process_count() if n_processes is None else int(n_processes)
    i = process_index() if process_index_ is None else int(process_index_)
    if not 0 <= i < p:
        raise ValueError(f"process index {i} out of range for {p} processes")
    if n_cells < p:
        raise ValueError(
            f"cannot split {n_cells} cells across {p} processes "
            "(every process needs at least one cell)"
        )
    base, rem = divmod(n_cells, p)
    lo = i * base + min(i, rem)
    hi = lo + base + (1 if i < rem else 0)
    return lo, hi


def process_allgather_rows(local_row: np.ndarray) -> np.ndarray:
    """All-gather a small 1-D host array across processes; returns
    (n_processes, len) with row p from process p.  Host-side utility for
    pre-fit consistency checks (label sets, shard sizes) — NOT for bulk
    data."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(local_row), tiled=False)
    )


def chunk_cell_sizes(placement, n_local: int) -> np.ndarray:
    """Allgather every process's local cell count, returned ORDERED BY
    POSITION ALONG THE MESH CELL AXIS (chunk index), not by process index.
    Multi-process fits use this to support near-equal shards: the sum is
    the global cell count, prefix sums are the per-chunk H0 column
    offsets, and the max fixes the common padded shard width."""
    # gather BEFORE validating: a process raising unilaterally here would
    # leave its peers blocked in this very collective (the repo-wide
    # collective-failure discipline — every rank must see the bad size and
    # raise together).  That includes process_chunk_index itself (it
    # raises on non-contiguous/zero device ownership) — ship a -1
    # sentinel through the gather instead of raising before it.
    try:
        chunk = int(placement.process_chunk_index)
        chunk_err = ""
    except ValueError as exc:
        chunk, chunk_err = -1, str(exc)
    pairs = process_allgather_rows(np.asarray(
        [chunk, int(n_local), process_index()], np.int64,
    ))
    if (pairs[:, 0] < 0).any():
        bad = pairs[pairs[:, 0] < 0, 2].tolist()
        raise ValueError(
            f"process(es) {bad} could not place their devices on the mesh "
            "cell axis"
            + (f": {chunk_err}" if chunk_err else
               " (see the failing process's log for the placement error).")
        )
    if (pairs[:, 1] <= 0).any():
        raise ValueError(
            "every process of a multi-process fit must hold at least one "
            f"cell (per-process (chunk, cells) pairs: {pairs.tolist()})"
        )
    chunks = pairs[:, 0]
    if sorted(chunks.tolist()) != list(range(placement.n_processes)):
        raise ValueError(
            "multi-process mesh chunk indices are not a permutation of "
            f"0..{placement.n_processes - 1} (got {chunks.tolist()}); every "
            "process must own one contiguous run of the mesh cell axis "
            "(use distributed.global_cell_mesh)."
        )
    if (pairs[:, 0] != pairs[:, 2]).any():
        # legal (a custom mesh may order chunks differently), but the
        # documented ingestion recipe keys file row ranges by PROCESS
        # index (process_cell_range) while chunk positions decide the
        # global cell order — mispaired shards still fit, but the
        # trajectory/H0 layout no longer matches the single-process fit
        # of the same file
        import warnings

        warnings.warn(
            "multi-process mesh chunk order differs from process order "
            f"((chunk, process) pairs: {pairs[:, [0, 2]].tolist()}); if "
            "per-process shards were ingested with process_cell_range "
            "(keyed by process index), pass its process_index_ argument "
            "as Placement.process_chunk_index so file rows land at their "
            "chunk positions.",
            stacklevel=2,
        )
    sizes = np.zeros(placement.n_processes, dtype=np.int64)
    sizes[chunks] = pairs[:, 1]
    return sizes


def allgather_group_layout(placement, local_codes: np.ndarray):
    """Agree on the GLOBAL joint-label group layout for multi-process
    weighted_fast without exchanging cells: every process contributes its
    local (code, count) pairs (canonical mixed-radix codes from
    utils.sampling.joint_label_codes) and receives

        g_codes (J,) int64  — the globally present group codes, sorted
                              (= the single-process group order), and
        m_gp (n_chunks, J) int64 — per-CHUNK group counts, ordered by
                              position along the mesh cell axis.

    From these each process derives, locally: global group sizes
    (m_gp.sum(0)), its own within-group offsets (prefix sums over earlier
    chunks), and the H0 column of each of its cells in the notional
    global group-sorted order — everything the replicated exact sampler
    (ops.mu.grouped_balanced_counts window form) needs.

    Codes/counts travel as float64 (exact below 2^53; joint_label_codes
    guards the code range, and cell counts are far below).  Collective:
    every process must call this with its own shard's codes."""
    uniq, counts = np.unique(np.asarray(local_codes, np.int64),
                             return_counts=True)
    j_max = int(process_allgather_rows(
        np.asarray([len(uniq)], np.int64)).max())
    row = np.full(1 + 2 * j_max, -1.0, np.float64)
    row[0] = float(placement.process_chunk_index)
    row[1:1 + len(uniq)] = uniq
    row[1 + j_max:1 + j_max + len(counts)] = counts
    rows = process_allgather_rows(row)
    codes_all = rows[:, 1:1 + j_max]
    g_codes = np.unique(codes_all[codes_all >= 0].astype(np.int64))
    m_gp = np.zeros((placement.n_processes, len(g_codes)), np.int64)
    for r in rows:
        chunk = int(r[0])
        codes = r[1:1 + j_max]
        cnts = r[1 + j_max:1 + 2 * j_max]
        mask = codes >= 0
        m_gp[chunk, np.searchsorted(g_codes, codes[mask].astype(np.int64))] \
            = cnts[mask].astype(np.int64)
    return g_codes, m_gp


def assert_same_across_processes(values, what: str) -> None:
    """Raise if a small per-process host value differs between processes —
    catching inconsistent preprocessing BEFORE an expensive fit instead of
    as a shape error (or silent corruption) inside it."""
    import jax

    if jax.process_count() == 1:
        return
    arr = np.asarray(values, dtype=np.float64).reshape(-1)
    rows = process_allgather_rows(arr)
    # exact comparison: every caller passes exact integers (shapes, label
    # hashes) — a tolerance would let distinct 48-bit hashes pass as equal
    if not all(np.array_equal(rows[p], rows[0], equal_nan=True)
               for p in range(rows.shape[0])):
        raise ValueError(
            f"{what} differs across processes: {rows.tolist()} — every "
            "process must run identical preprocessing on consistent inputs."
        )
