"""Loss registry and range metrics.

Reference: ``nof/criteria/loss.py`` (NOFLoss family + ``nof_loss`` registry)
and ``nof/criteria/metrics.py`` (``abs_error`` / ``acc_thres``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _apply_mask(pred, target, valid_mask):
    if valid_mask is None:
        return pred, target, None
    m = valid_mask.astype(pred.dtype)
    return pred, target, m


def mse_loss(pred, target, valid_mask=None):
    d = (pred - target) ** 2
    if valid_mask is None:
        return jnp.mean(d)
    m = valid_mask.astype(d.dtype)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)


def l1_loss(pred, target, valid_mask=None):
    d = jnp.abs(pred - target)
    if valid_mask is None:
        return jnp.mean(d)
    m = valid_mask.astype(d.dtype)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)


def smooth_l1_loss(pred, target, valid_mask=None):
    """torch.nn.SmoothL1Loss(beta=1, reduction='mean') semantics."""
    d = jnp.abs(pred - target)
    e = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    if valid_mask is None:
        return jnp.mean(e)
    m = valid_mask.astype(e.dtype)
    return jnp.sum(e * m) / jnp.maximum(jnp.sum(m), 1.0)


# registry mirroring nof/criteria/__init__.py
nof_loss = {
    "mse": mse_loss,
    "l1": l1_loss,
    "smoothl1": smooth_l1_loss,
}


def abs_error(pred, gt, valid_mask=None):
    d = jnp.abs(pred - gt)
    if valid_mask is None:
        return jnp.mean(d)
    m = valid_mask.astype(d.dtype)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)


def acc_thres(pred, gt, valid_mask=None, threshold: float = 0.2):
    """Percentage of rays with |error| < threshold (metrics.py:14-22)."""
    d = jnp.abs(pred - gt)
    if valid_mask is None:
        return jnp.mean((d < threshold).astype(jnp.float32)) * 100.0
    m = valid_mask.astype(jnp.float32)
    hits = ((d < threshold).astype(jnp.float32) * m).sum()
    return hits / jnp.maximum(m.sum(), 1.0) * 100.0
