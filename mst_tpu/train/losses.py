"""Losses. The reference trains goal+traj heatmaps with
nn.BCEWithLogitsLoss() * loss_scale (models/trainer.py:206,
utils/train_epoch.py:94-109, loss_scale=1000 in every shipped config)."""

import jax.numpy as jnp


def bce_with_logits(logits, targets, mask=None):
    """Mean binary cross-entropy with logits (torch-equivalent numerics).

    Uses the stable max(x,0) - x*z + log1p(exp(-|x|)) form that
    BCEWithLogitsLoss uses. `mask` (broadcastable to the batch axis) lets
    padded trajectories in fixed-shape TPU batches contribute zero, with the
    mean taken over valid elements only (the reference has no padding).
    """
    x, z = logits, targets
    per_elem = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if mask is None:
        return per_elem.mean()
    m = mask.reshape(mask.shape + (1,) * (per_elem.ndim - mask.ndim))
    total = jnp.sum(per_elem * m)
    count = jnp.sum(m) * (per_elem.size / max(mask.size, 1))
    return total / jnp.maximum(count, 1.0)
