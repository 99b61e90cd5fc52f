"""alpine_tpu — a TPU-native reimplementation of the ALPINE semi-supervised NMF
framework (reference: ylaboratory/ALPINE) built on JAX / XLA / Pallas / pjit.

Public API mirrors the reference package `alpine` (``alpine/__init__.py:1-3``):

    from alpine_tpu import ALPINE, ComponentOptimizer

Design notes
------------
The reference runs PyTorch multiplicative updates one Python op at a time on a
single CUDA/MPS device.  Here the whole training loop is a single
``jax.lax.scan`` over jit-compiled multiplicative-update steps, the per-iteration
loss is computed with a trace identity that never materializes the
(genes x cells) reconstruction, and cell-axis sharding over a
``jax.sharding.Mesh`` scales fits across a TPU slice with XLA-inserted
collectives.  See ``alpine_tpu/ops/mu.py`` for the numerical core.
"""

from typing import TYPE_CHECKING

__all__ = ["ALPINE", "ComponentOptimizer", "AlpineMatrices", "AnnData",
           "suggest_data_dtype"]
__version__ = "0.1.0"

if TYPE_CHECKING:  # pragma: no cover
    from alpine_tpu.models.alpine import ALPINE
    from alpine_tpu.models.state import AlpineMatrices
    from alpine_tpu.optimize.optimizer import ComponentOptimizer
    from alpine_tpu.utils.adata import AnnData

_LAZY = {
    "ALPINE": ("alpine_tpu.models.alpine", "ALPINE"),
    "AlpineMatrices": ("alpine_tpu.models.state", "AlpineMatrices"),
    "ComponentOptimizer": ("alpine_tpu.optimize.optimizer", "ComponentOptimizer"),
    "AnnData": ("alpine_tpu.utils.adata", "AnnData"),
    "suggest_data_dtype": ("alpine_tpu.utils.adata", "suggest_data_dtype"),
}


def __getattr__(name: str):
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'alpine_tpu' has no attribute {name!r}") from None
    import importlib

    value = getattr(importlib.import_module(module_name), attr)
    globals()[name] = value
    return value
