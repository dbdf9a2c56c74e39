"""Dense global prediction maps from a location encoder.

Counterpart of `csp/main/grid_predictor.py` (`GridPredictor`): build a
(H, W) lon/lat grid over the earth (lon left->right -180..180, lat
top->bottom 90..-90), run the encoder + class head over it in jitted batches,
and return per-class probability maps, optionally masked to land.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class GridPredictor:
    def __init__(self, shape=(1002, 2004), mask: Optional[np.ndarray] = None):
        """shape: (H, W) grid resolution (reference default 1002 x 2004);
        mask: optional (H, W) {0,1} land mask applied to outputs."""
        self.shape = shape
        self.mask = mask
        h, w = shape
        lon = np.linspace(-1, 1, w) * 180.0
        lat = np.linspace(1, -1, h) * 90.0
        grid = np.stack(np.meshgrid(lon, lat, indexing="xy"), axis=-1)  # [H, W, 2]
        self.coords = grid.reshape(-1, 2).astype(np.float32)

    def dense_prediction(self, apply_fn: Callable, params,
                         class_of_interest: Optional[int] = None,
                         batch_size: int = 16384) -> np.ndarray:
        """apply_fn(params, coords[B,2]) -> [B, K] class probabilities (or
        [B] when class_of_interest is baked in).  Returns [H, W] for one
        class or [H, W, K]."""
        jitted = jax.jit(apply_fn)
        n = self.coords.shape[0]
        outs = []
        for s in range(0, n, batch_size):
            chunk = self.coords[s:s + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            o = np.asarray(jitted(params, jnp.asarray(chunk)))
            outs.append(o[: batch_size - pad] if pad else o)
        pred = np.concatenate(outs, 0)
        if class_of_interest is not None and pred.ndim == 2:
            pred = pred[:, class_of_interest]
        shape = self.shape if pred.ndim == 1 else (*self.shape, pred.shape[1])
        pred = pred.reshape(shape)
        if self.mask is not None:
            pred = pred * (self.mask if pred.ndim == 2 else self.mask[..., None])
        return pred
