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
    """Knows where fit-time arrays live: single device or cell-sharded mesh."""

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
        """(rows, cells) arrays: H, Y — shard the cell axis only."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        cell_ax = self.mesh.axis_names[-1]
        return jax.device_put(arr, self._sharding(P(None, cell_ax)))

    def put_x_matrix(self, arr):
        """X (genes, cells): cell-sharded; on a 2-D mesh also gene-sharded."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        if self._two_d:
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
        return jax.device_put(arr, self._sharding(P(self.mesh.axis_names[-1])))

    def put_replicated(self, arr):
        """Bs, scalars — replicated."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        return jax.device_put(arr, self._sharding(P()))
