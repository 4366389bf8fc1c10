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


def softargmax2d_nhwc(logits_nhwc, eps: float = 1e-6):
    """Soft-argmax directly on channels-last maps: (B, H, W, C) -> (B, C, 2).

    Skips the (B, C, H, W) transpose the rows-based kernels need — at eval
    the (K*B, H, W, pred) logits are ~0.7 GB/chunk, and the transpose alone
    costs more than the reduction (measured on v5e). XLA fuses exp with the
    three reductions into one HBM pass over the conv output's native layout.
    """
    x = jnp.asarray(logits_nhwc)
    B, H, W, C = x.shape
    x = x.astype(jnp.float32)
    m = x.max(axis=(1, 2))  # (B, C)
    e = jnp.exp(x - m[:, None, None, :])
    s = e.sum(axis=(1, 2))
    ex = jnp.einsum("bhwc,w->bc", e, jnp.arange(W, dtype=jnp.float32))
    ey = jnp.einsum("bhwc,h->bc", e, jnp.arange(H, dtype=jnp.float32))
    inv = 1.0 / (s + eps)
    return jnp.stack([ex * inv, ey * inv], -1)


def softargmax2d_packed(packed_nhwc, n_channels: int, eps: float = 1e-6,
                        channel=None):
    """Soft-argmax on a space-to-depth PACKED map, no unpacking.

    Input (B, H/2, W/2, 4C) with channel (si*2 + sj)*C + c
    (ops.packed.space_to_depth layout); returns (B, C, 2) coordinates on
    the FULL-resolution grid (x = 2*j + sj, y = 2*i + si). Lets the eval
    decode keep its finest level packed end-to-end: the (K*B, H, W, pred)
    volume is never materialized (VERDICT round-1 item; ~0.7 GB/chunk at
    SDD scale, and the depth_to_space + transpose cost ~45% of the whole
    decode program on v5e).

    channel selects ONE logical channel (returns (B, 1, 2)): the slice
    happens inside the reduction instead of the caller stacking 4 strided
    sub-position slices into a new array (the stack alone cost ~1 ms/step
    in the train-metrics path, xprof r3).
    """
    xq = jnp.asarray(packed_nhwc)
    B, Hp, Wp, C4 = xq.shape
    C = n_channels
    assert C4 == 4 * C, (C4, C)
    x = xq.reshape(B, Hp, Wp, 4, C)
    if channel is not None:
        x = x[..., channel:channel + 1]
        C = 1
    x = x.astype(jnp.float32)
    m = x.max(axis=(1, 2, 3))  # (B, C)
    e = jnp.exp(x - m[:, None, None, None, :])
    s4 = e.sum(axis=(1, 2))  # (B, 4, C) per-subposition mass
    jw = jnp.arange(Wp, dtype=jnp.float32)
    ih = jnp.arange(Hp, dtype=jnp.float32)
    ex4 = jnp.einsum("bhwkc,w->bkc", e, jw)
    ey4 = jnp.einsum("bhwkc,h->bkc", e, ih)
    sj = jnp.array([0.0, 1.0, 0.0, 1.0])
    si = jnp.array([0.0, 0.0, 1.0, 1.0])
    S = s4.sum(1)
    X = (2.0 * ex4 + sj[None, :, None] * s4).sum(1)
    Y = (2.0 * ey4 + si[None, :, None] * s4).sum(1)
    inv = 1.0 / (S + eps)
    return jnp.stack([X * inv, Y * inv], -1)


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
