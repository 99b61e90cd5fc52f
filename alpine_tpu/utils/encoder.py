"""Covariate one-hot encoding with NaN -> all-zero rows.

Behavioral contract mirrors the reference ``FeatureEncoders``
(``/root/reference/alpine/utils/encoder.py:11-60``): one sklearn
``OneHotEncoder(sparse_output=False, handle_unknown="ignore")`` per covariate
key, fit on the non-NA rows only; NA rows encode to all-zero rows.  The
all-zero rows are how partially-labeled (semi-supervised) data enters the
model: a zero column of Y contributes nothing to the KL/Frobenius prediction
terms, so those cells are only constrained by reconstruction.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
from sklearn.preprocessing import OneHotEncoder

Float32Array = np.ndarray


class FeatureEncoders:
    def __init__(self, covariate_keys: List[str]):
        self.covariate_keys: List[str] = covariate_keys
        self.encoders: Dict[str, OneHotEncoder] = {}
        self.encoded_labels: Dict[str, List[str]] = {}

    def _encode_column(self, df: pd.DataFrame, key: str, fit: bool) -> Float32Array:
        col = df[[key]]
        na_mask = col[key].isna().to_numpy()
        non_na = col[~na_mask]
        if fit:
            enc = OneHotEncoder(sparse_output=False, handle_unknown="ignore")
            encoded = enc.fit_transform(non_na).astype(np.float32)
            self.encoders[key] = enc
            self.encoded_labels[key] = enc.get_feature_names_out().tolist()
        else:
            enc = self.encoders[key]
            encoded = enc.transform(non_na).astype(np.float32)
        out = np.zeros((len(col), encoded.shape[1]), dtype=np.float32)
        out[~na_mask, :] = encoded
        return out

    def fit_transform(self, df: pd.DataFrame) -> List[Float32Array]:
        if not isinstance(df, pd.DataFrame):
            raise TypeError("adata.obs must be a pandas DataFrame.")
        return [self._encode_column(df, key, fit=True) for key in self.covariate_keys]

    def transform(self, df: pd.DataFrame) -> List[Float32Array]:
        if not isinstance(df, pd.DataFrame):
            raise TypeError("adata.obs must be a pandas DataFrame.")
        return [
            self._encode_column(df, key, fit=False)
            for key in self.covariate_keys
            if key in self.encoders
        ]
