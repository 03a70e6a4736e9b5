"""StandardScaler-equivalent feature normalization.

sklearn.preprocessing.StandardScaler semantics (population std, ddof=0;
zero-variance columns left unscaled via std->1).  The reference fits/persists
one via joblib in the easy tier (reference scripts/06:291-294) and re-fits
fresh ones before clustering (07:67-68, 13:194, 16:176-178); here the
statistics are a tiny serializable dataclass and transform is a fused device
op.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _transform_jit(x, mean, scale):
    # one program instead of eager sub+div (each eager op is a separate
    # device dispatch — ~0.5-1 s under tunnel congestion)
    return (x - mean) / scale


@dataclass
class StandardScaler:
    mean_: Optional[np.ndarray] = None
    scale_: Optional[np.ndarray] = None

    def fit(self, x) -> "StandardScaler":
        x = np.asarray(x, dtype=np.float64)
        self.mean_ = x.mean(axis=0)
        std = x.std(axis=0)               # ddof=0, sklearn default
        std[std == 0.0] = 1.0             # sklearn _handle_zeros_in_scale
        self.scale_ = std
        return self

    def transform(self, x):
        if self.mean_ is None:
            raise RuntimeError("scaler not fitted")
        return _transform_jit(
            jnp.asarray(x, dtype=jnp.float32),
            np.asarray(self.mean_, dtype=np.float32),
            np.asarray(self.scale_, dtype=np.float32))

    def fit_transform(self, x):
        return self.fit(x).transform(x)

    def save(self, path: Path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path, mean=self.mean_, scale=self.scale_)
        return path

    @classmethod
    def load(cls, path: Path) -> "StandardScaler":
        d = np.load(path)
        return cls(mean_=d["mean"], scale_=d["scale"])


def standardize(x) -> jnp.ndarray:
    """One-shot fit_transform returning a device array."""
    return StandardScaler().fit_transform(x)
