"""Trained-state containers.

`AlpineMatrices` mirrors the reference dataclass of the same name
(`/root/reference/alpine/main.py:28-43`): it bundles the data matrix X, the
one-hot label matrices Ys, and the factor lists Ws/Hs/Bs, with a
``to_numpy()`` that detaches everything to float32 ndarrays.

Internally the TPU fit path stores W and H *concatenated* across blocks
(see ``alpine_tpu/ops/mu.py`` module docstring); ``split_blocks`` /
``concat_blocks`` convert between the concatenated device layout and the
reference's per-block list layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Union

import numpy as np

Float32Array = np.ndarray


def split_w(W, blocks: Sequence[int]) -> List:
    """(genes, K_total) -> per-block [(genes, k_i)]."""
    out, o = [], 0
    for k in blocks:
        out.append(W[:, o:o + k])
        o += k
    return out


def split_h(H, blocks: Sequence[int]) -> List:
    """(K_total, cells) -> per-block [(k_i, cells)]."""
    out, o = [], 0
    for k in blocks:
        out.append(H[o:o + k])
        o += k
    return out


def concat_w(Ws: Sequence) -> np.ndarray:
    return np.concatenate([np.asarray(w) for w in Ws], axis=1)


def concat_h(Hs: Sequence) -> np.ndarray:
    return np.concatenate([np.asarray(h) for h in Hs], axis=0)


@dataclass
class AlpineMatrices:
    X: np.ndarray
    Ys: List[np.ndarray]
    Ws: List[np.ndarray]
    Hs: List[np.ndarray]
    Bs: List[np.ndarray]

    def to_numpy(self) -> Dict[str, Union[Float32Array, List[Float32Array]]]:
        return {
            "X": np.asarray(self.X, dtype=np.float32),
            "Ys": [np.asarray(y, dtype=np.float32) for y in self.Ys],
            "Ws": [np.asarray(w, dtype=np.float32) for w in self.Ws],
            "Hs": [np.asarray(h, dtype=np.float32) for h in self.Hs],
            "Bs": [np.asarray(b, dtype=np.float32) for b in self.Bs],
        }
