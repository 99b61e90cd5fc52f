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
- a `jax.sharding.Mesh` (1-D) -> sharded execution over its single axis
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DeviceLike = Union[None, str, jax.Device, Mesh]

CELL_AXIS = "cells"


def make_cell_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the cell axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CELL_AXIS,))


def resolve_device(device: DeviceLike):
    """Map the user-facing `device` argument to a jax.Device or Mesh."""
    if device is None or (isinstance(device, str) and device in ("auto", "cuda", "mps")):
        return jax.devices()[0]
    if isinstance(device, Mesh):
        if len(device.axis_names) != 1:
            raise ValueError(
                "ALPINE expects a 1-D mesh (cell-axis sharding); got axes "
                f"{device.axis_names}"
            )
        return device
    if isinstance(device, str):
        try:
            return jax.devices(device)[0]
        except RuntimeError as e:
            raise ValueError(f"No JAX backend for device string {device!r}: {e}") from e
    if isinstance(device, jax.Device):
        return device
    raise TypeError(f"device must be a string, jax.Device or Mesh, got {type(device)}")


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

    def put_cells_matrix(self, arr):
        """(rows, cells) arrays: X, H, Y — shard the cell axis."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        axis = self.mesh.axis_names[0]
        return jax.device_put(arr, self._sharding(P(None, axis)))

    def put_replicated(self, arr):
        """W, Bs, scalars — replicated."""
        if self.mesh is None:
            return jax.device_put(arr, self.target)
        return jax.device_put(arr, self._sharding(P()))
