"""Temporal smoothness losses over the frame dimension.

Reference: `SmoothLoss` (`/root/reference/model/utils/smooth_loss.py:5-69`).
Functional: `smooth_loss(x, smooth_type, loss_type, frame_dim=1)` where x is
(B, F, ...).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _reduce(diff, loss_type):
    if loss_type in ("l2", "mse"):
        return jnp.mean(diff * diff)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(diff))
    raise NotImplementedError(loss_type)


def smooth_loss(x, smooth_type: str = "dislocation", loss_type: str = "l2",
                frame_dim: int = 1):
    if smooth_type is None:
        return 0.0
    x = jnp.moveaxis(x, frame_dim, 0)
    F = x.shape[0]
    if smooth_type == "mid_frame":
        target = x[(F - 1) // 2][None]
        return _reduce(x - target, loss_type)
    if smooth_type == "dislocation":
        return _reduce(x[:-1] - x[1:], loss_type)
    if smooth_type == "avg":
        return _reduce(x - x.mean(0, keepdims=True), loss_type)
    if smooth_type == "median":
        med = lax.stop_gradient(jnp.median(x, axis=0, keepdims=True))
        return _reduce(x - med, loss_type)
    raise NotImplementedError(smooth_type)
