"""Device / mesh resolution and cell-axis sharding.

The reference's only device concept is a torch device string
("cpu"/"cuda"/"mps", `/root/reference/alpine/main.py:70`).  The TPU-native
equivalent is a `jax.sharding.Mesh`: the long axis of this model class is the
**cell axis** (up to atlas scale), so we shard X (genes, cells@cells),
H (K, cells@cells) and each Y (labels, cells@cells) over a 1-D mesh while W
and the Bs stay replicated.  Under jit/GSPMD every MU update then needs only
psums of (genes×K) / (K×K) partial products, which XLA inserts automatically
and routes over ICI.

`resolve_device` accepts:
- None / "auto"  -> default JAX device
- "cpu" / "tpu" / "gpu"      -> first device of that backend
- "cuda" / "mps" -> alias for the default accelerator (reference API compat)
- a `jax.Device` -> itself
- a 1-D `jax.sharding.Mesh` -> cell-axis sharding over its single axis
- a 2-D `jax.sharding.Mesh` with axes ("genes", "cells") -> additionally
  shard the gene axis: X (genes@genes, cells@cells), W (genes@genes, K),
  H/Y cell-sharded, B replicated — the tensor-parallel analog for this
  model class (useful when genes x K no longer fits replicated, e.g.
  whole-transcriptome atlases)
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DeviceLike = Union[None, str, jax.Device, Mesh]

CELL_AXIS = "cells"
GENE_AXIS = "genes"


def make_cell_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the cell axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CELL_AXIS,))


def make_gene_cell_mesh(n_genes_axis: int, n_cells_axis: int, devices=None) -> Mesh:
    """2-D (genes x cells) mesh for joint model/data sharding."""
    if devices is None:
        devices = jax.devices()
    need = n_genes_axis * n_cells_axis
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_genes_axis, n_cells_axis)
    return Mesh(grid, (GENE_AXIS, CELL_AXIS))


def resolve_device(device: DeviceLike):
    """Map the user-facing `device` argument to a jax.Device or Mesh."""
    if device is None or (isinstance(device, str) and device in ("auto", "cuda", "mps")):
        return jax.devices()[0]
    if isinstance(device, Mesh):
        if len(device.axis_names) == 1:
            return device
        if len(device.axis_names) == 2 and tuple(device.axis_names) == (
            GENE_AXIS, CELL_AXIS,
        ):
            return device
        raise ValueError(
            "ALPINE expects a 1-D mesh (cell-axis sharding) or a 2-D mesh "
            f"with axes ('genes', 'cells'); got axes {device.axis_names}"
        )
    if isinstance(device, str):
        try:
            return jax.devices(device)[0]
        except RuntimeError as e:
            raise ValueError(f"No JAX backend for device string {device!r}: {e}") from e
    if isinstance(device, jax.Device):
        return device
    raise TypeError(f"device must be a string, jax.Device or Mesh, got {type(device)}")


def describe_device(dev):
    """Picklable descriptor for a resolved device/mesh (jax.Device and Mesh
    objects cannot be pickled; whole-estimator pickling is the reference's
    documented persistence workflow)."""
    if isinstance(dev, Mesh):
        return ("__mesh__", tuple(dev.axis_names), tuple(dev.devices.shape),
                dev.devices.flat[0].platform)
    if isinstance(dev, jax.Device):
        return ("__device__", dev.platform)
    return dev


def restore_device(desc):
    """Inverse of describe_device, best-effort in the loading process (a
    mesh rebuilds from local devices of the same platform and shape; falls
    back to the default device WITH a warning when unavailable)."""
    if not (isinstance(desc, tuple) and desc
            and desc[0] in ("__mesh__", "__device__")):
        return desc
    try:
        if desc[0] == "__device__":
            return jax.devices(desc[1])[0]
        _, axes, shape, platform = desc
        need = int(np.prod(shape))
        grid = np.asarray(jax.devices(platform)[:need]).reshape(shape)
        return Mesh(grid, axes)
    except (RuntimeError, ValueError) as e:
        import warnings

        warnings.warn(
            f"Could not restore pickled device {desc!r} in this process "
            f"({e}); falling back to the default device — subsequent fits "
            "run unsharded."
        )
        return jax.devices()[0]


class Placement:
    """Knows where fit-time arrays live: single device or cell-sharded mesh.

    On a MULTI-PROCESS mesh (devices spanning several jax processes — a
    TPU pod slice over DCN, or the multi-process CPU test topology) the
    host arrays handed to `put_x_matrix`/`put_cells_matrix`/
    `put_cells_vector` are PER-PROCESS cell shards (equal width across
    processes), assembled into one global array via
    `jax.make_array_from_process_local_data` — no process ever holds the
    full X host-side.  Replicated puts receive the full (small) array on
    every process.  Processes must own contiguous runs of the mesh's cell
    axis (true for `distributed.global_cell_mesh`)."""

    def __init__(self, target):
        self.target = target
        self.mesh = target if isinstance(target, Mesh) else None

    @property
    def is_sharded(self) -> bool:
        return self.mesh is not None

    def _sharding(self, spec: P):
        return NamedSharding(self.mesh, spec)

    @property
    def _two_d(self) -> bool:
        return self.mesh is not None and len(self.mesh.axis_names) == 2

    @property
    def is_multiprocess(self) -> bool:
        """True when the mesh spans devices of more than one process."""
        if self.mesh is None:
            return False
        procs = {d.process_index for d in self.mesh.devices.flat}
        return len(procs) > 1

    @property
    def local_cell_shards(self) -> int:
        """THIS process's device count along the cell axis."""
        if self.mesh is None:
            return 1
        if not self.is_multiprocess:
            return self.cell_shards
        import jax

        pid = jax.process_index()
        n = sum(1 for d in self.mesh.devices.flat if d.process_index == pid)
        if n == 0:
            # fail HERE with the real reason, not as a downstream
            # ZeroDivisionError in the padding arithmetic
            raise ValueError(
                "this process owns no devices of the mesh — every process "
                "of a multi-process fit must contribute devices (use "
                "distributed.global_cell_mesh)"
            )
        return n

    @property
    def n_processes(self) -> int:
        if self.mesh is None:
            return 1
        return len({d.process_index for d in self.mesh.devices.flat})

    @property
    def process_chunk_index(self) -> int:
        """Rank of THIS process's contiguous device run along the mesh's
        cell axis (0-based) — i.e. which equal cell chunk this process
        owns.  Raises if the process's devices are not contiguous in mesh
        order (then per-process chunks would not map to column ranges)."""
        if not self.is_multiprocess:
            return 0
        import jax

        flat = list(self.mesh.devices.flat)
        pid = jax.process_index()
        idxs = [i for i, d in enumerate(flat) if d.process_index == pid]
        if not idxs:
            raise ValueError("this process owns no devices of the mesh")
        if idxs != list(range(idxs[0], idxs[0] + len(idxs))):
            raise ValueError(
                "multi-process meshes must give each process a contiguous "
                "run of the cell axis (use distributed.global_cell_mesh)"
            )
        # rank = position of this run's first device among every process's
        # first device (NOT idxs[0] // len(idxs), which assumes equal
        # per-process device counts — unequal ownership would collide
        # chunk indices and mask the real error downstream)
        firsts = {}
        for i, d in enumerate(flat):
            firsts.setdefault(d.process_index, i)
        return sorted(firsts.values()).index(idxs[0])

    def _from_local(self, arr, spec: P, cell_dim: Optional[int]):
        """Assemble a global array from this process's local shard.
        `cell_dim` is the axis the cell sharding lives on (None for fully
        replicated inputs, which every process passes whole)."""
        import jax

        if self._two_d:
            raise NotImplementedError(
                "multi-process fits support 1-D (cell-axis) meshes only"
            )
        sharding = self._sharding(spec)
        shape = list(arr.shape)
        if cell_dim is not None:
            ratio, rem = divmod(self.cell_shards, self.local_cell_shards)
            if rem:
                raise ValueError(
                    "every process must own the same number of mesh devices"
                )
            shape[cell_dim] = arr.shape[cell_dim] * ratio
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(arr), tuple(shape)
        )

    @property
    def cell_shards(self) -> int:
        """Device count along the cell axis (1 when unsharded)."""
        if self.mesh is None:
            return 1
        return int(self.mesh.shape[self.mesh.axis_names[-1]])

    def check_gene_axis(self, n_genes: int) -> None:
        """2-D meshes shard the gene axis, which must divide evenly (gene
        rows are not zero-pad-neutral without zeroed W rows); fail with a
        clear message instead of a device_put ValueError."""
        if self._two_d:
            gs = int(self.mesh.shape[GENE_AXIS])
            if n_genes % gs:
                raise ValueError(
                    f"n_genes={n_genes} is not divisible by the mesh's "
                    f"'{GENE_AXIS}' axis ({gs} devices); choose a gene-axis "
                    "size that divides the gene count."
                )

    def put_cells_matrix(self, arr):
        """(rows, cells) arrays: H, Y — shard the cell axis only.  On a
        multi-process mesh `arr` is this process's cell chunk."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        cell_ax = self.mesh.axis_names[-1]
        if self.is_multiprocess:
            return self._from_local(arr, P(None, cell_ax), cell_dim=1)
        return jax.device_put(arr, self._sharding(P(None, cell_ax)))

    def put_x_matrix(self, arr):
        """X (genes, cells): cell-sharded; on a 2-D mesh also gene-sharded."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        if self._two_d:
            if self.is_multiprocess:
                raise NotImplementedError(
                    "multi-process fits support 1-D (cell-axis) meshes only"
                )
            return jax.device_put(arr, self._sharding(P(GENE_AXIS, CELL_AXIS)))
        return self.put_cells_matrix(arr)

    def put_w_matrix(self, arr):
        """W (genes, K): replicated on 1-D meshes; gene-sharded on 2-D."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        if self._two_d:
            return jax.device_put(arr, self._sharding(P(GENE_AXIS, None)))
        return self.put_replicated(arr)

    def put_cells_vector(self, arr):
        """(cells,) vectors (e.g. sampling weights) — shard the cell axis."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        if self.is_multiprocess:
            return self._from_local(arr, P(self.mesh.axis_names[-1]),
                                    cell_dim=0)
        return jax.device_put(arr, self._sharding(P(self.mesh.axis_names[-1])))

    def put_shard_rows(self, arr):
        """(n_shards, ...) per-device rows sharded on dim 0 — row d lands
        on cell-axis device d (inside shard_map each device sees its own
        (1, ...) block).  Multi-process: `arr` is THIS process's
        local-device rows.  Used for the weighted_fast window tables."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        spec = P(self.mesh.axis_names[-1], *([None] * (arr.ndim - 1)))
        if self.is_multiprocess:
            return self._from_local(arr, spec, cell_dim=0)
        return jax.device_put(arr, self._sharding(spec))

    def put_replicated(self, arr):
        """Bs, scalars — replicated (every process passes the full array)."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        if self.is_multiprocess:
            return self._from_local(arr, P(), cell_dim=None)
        return jax.device_put(arr, self._sharding(P()))

    def local_cells_columns(self, H) -> np.ndarray:
        """Host copy of THIS process's cell columns of a cell-sharded
        (rows, cells) device array, in mesh order.  Single-process: the
        whole array."""
        if not self.is_multiprocess:
            return np.asarray(jax.device_get(H))
        n_cols = H.shape[1]
        shards = sorted(
            ((s.index[1].start or 0,
              n_cols if s.index[1].stop is None else s.index[1].stop,
              s.data) for s in H.addressable_shards),
            key=lambda t: t[0],
        )
        # the shards must partition (a piece of) the cell axis: a replicated
        # or resharded output would repeat columns here and silently hand
        # every process the global array's first n_local columns downstream
        prev_stop = 0
        for start, stop, _ in shards:
            if start < prev_stop:
                raise ValueError(
                    "local_cells_columns: addressable shards overlap on the "
                    "cell axis (the array is replicated or was resharded); "
                    "expected a cell-sharded fit output."
                )
            prev_stop = stop
        # overlap alone cannot catch a replicated array when this process
        # holds ONE addressable shard (it spans all columns without
        # overlapping anything) — the local width must be exactly this
        # process's share of the cell axis
        total = sum(stop - start for start, stop, _ in shards)
        if total * self.cell_shards != n_cols * self.local_cell_shards:
            raise ValueError(
                "local_cells_columns: this process's shards span "
                f"{total}/{n_cols} columns, expected "
                f"{self.local_cell_shards}/{self.cell_shards} of the cell "
                "axis (the array is replicated or was resharded); expected "
                "a cell-sharded fit output."
            )
        return np.concatenate([np.asarray(d) for _, _, d in shards], axis=1)
