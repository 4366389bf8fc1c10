"""Fused single-pass soft-argmax Pallas kernel.

The XLA lowering of soft-argmax makes ~4 passes over the heatmap (max,
exp-sum, two weighted sums); at eval the trajectory decoder emits
(K*B, pred_len, H, W) logits — hundreds of MB per chunk — so the reduction
is HBM-bandwidth-bound. This kernel streams each row once, maintaining
online-softmax statistics (running max m, rescaled sum s and coordinate
moments sx, sy) in VMEM scratch across column tiles, exactly the
flash-attention trick applied to a coordinate expectation.

Grid: (rows / BR, HW / BC); TPU executes the column dimension innermost and
sequentially, so scratch accumulators carry across j. Requires HW % BC == 0
(images are padded to /32 in both dims, so HW % 1024 == 0 always holds).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 128  # row tile (measured 24x over the XLA lowering at SDD scale)
BC = 1024  # column tile; HW % 1024 == 0 for /32-padded scenes


def _kernel(w_ref, x_ref, out_ref, m_ref, s_ref, sx_ref, sy_ref, *,
            eps: float):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)
        sx_ref[:] = jnp.zeros_like(sx_ref)
        sy_ref[:] = jnp.zeros_like(sy_ref)

    t = x_ref[:]  # (BR, BC)
    W = w_ref[0]
    flat = (j * BC
            + jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 1))
    xs = jnp.mod(flat, W).astype(jnp.float32)
    ys = jnp.floor_divide(flat, W).astype(jnp.float32)

    tile_max = jnp.max(t, axis=1, keepdims=True)  # (BR, 1)
    new_m = jnp.maximum(m_ref[:], tile_max)
    alpha = jnp.exp(m_ref[:] - new_m)
    e = jnp.exp(t - new_m)  # (BR, BC)
    s_ref[:] = s_ref[:] * alpha + jnp.sum(e, axis=1, keepdims=True)
    sx_ref[:] = sx_ref[:] * alpha + jnp.sum(e * xs, axis=1, keepdims=True)
    sy_ref[:] = sy_ref[:] * alpha + jnp.sum(e * ys, axis=1, keepdims=True)
    m_ref[:] = new_m

    @pl.when(j == nj - 1)
    def _():
        inv = 1.0 / (s_ref[:] + eps)  # reference softargmax.py:53,68
        out_ref[:, 0:1] = sx_ref[:] * inv
        out_ref[:, 1:2] = sy_ref[:] * inv


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _softargmax_rows(logits_rows, W: int, eps: float, interpret: bool):
    R, HW = logits_rows.shape
    assert HW % BC == 0, (HW, BC)
    r_pad = (-R) % BR
    if r_pad:
        logits_rows = jnp.pad(logits_rows, ((0, r_pad), (0, 0)))
    Rp = logits_rows.shape[0]
    w_arr = jnp.array([W], jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(Rp // BR, HW // BC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, BC), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, 2), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BR, 1), jnp.float32),
            pltpu.VMEM((BR, 1), jnp.float32),
            pltpu.VMEM((BR, 1), jnp.float32),
            pltpu.VMEM((BR, 1), jnp.float32),
        ],
        interpret=interpret,
    )(w_arr, logits_rows)
    return out[:R]


def softargmax2d_pallas(logits_hw_last, eps: float = 1e-6,
                        interpret: bool = False):
    """Drop-in replacement for ops.softargmax.softargmax2d.

    (..., H, W) float logits -> (..., 2) expected (x, y). Falls back to the
    XLA path when HW does not tile (never the case for /32-padded scenes).
    """
    x = jnp.asarray(logits_hw_last, jnp.float32)
    H, W = x.shape[-2], x.shape[-1]
    if (H * W) % BC != 0:
        from mst_tpu.ops.softargmax import softargmax2d

        return softargmax2d(logits_hw_last, eps)
    rows = x.reshape(-1, H * W)
    out = _softargmax_rows(rows, W, eps, interpret)
    return out.reshape(*x.shape[:-2], 2)
