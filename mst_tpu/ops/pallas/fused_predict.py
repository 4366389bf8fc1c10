"""Fused packed-predictor + soft-argmax Pallas kernel (producer-owning).

The eval decode's last two ops are a 1x1 packed predictor conv
(128 -> 4*pred channels) and the packed soft-argmax reduction
(ops/softargmax.py:softargmax2d_packed). Run separately, the predictor
writes a (K*B, H/2, W/2, 4*pred) logits volume to HBM (~0.65 GB/chunk at
SDD scale in bf16) that the reduction immediately re-reads; a Pallas
EPILOGUE kernel consuming that volume was measured slower in round 2 —
the tpu_custom_call operand layout constraint forced a relayout copy of
the conv output (ROADMAP perf notes #5). This kernel instead OWNS the
producer: it streams the pre-predictor activations (the b1 conv output,
whose 128-channel layout matches the default tiling), computes the
predictor matmul ON the MXU tile-by-tile in VMEM, and maintains
per-subposition online-softmax statistics — the logits volume never
exists in HBM.

Math matches softargmax2d_packed exactly: packed channel (si*2+sj)*P + p
contributes mass at full-resolution coordinates (2j + sj, 2i + si); the
four sub-position statistics are kept separate during the stream and
max-unified once at the end.

Grid: (rows, Hp/BH); the row-tile dimension is innermost and sequential
on TPU, so the VMEM scratch accumulators carry across h.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 8  # packed rows per tile; Hp = H/2 with H % 32 == 0 -> Hp % 16 == 0


def unify_packed_stats(m, s, sx, sy, n_pred, eps):
    """Merge the four packed sub-position online-softmax statistics.

    m/s/sx/sy: (1, 4*n_pred) f32 running max / mass / x-moment / y-moment
    per packed channel k*n_pred + p, k = si*2 + sj (the softargmax2d_packed
    channel layout). Returns (X, Y) full-resolution expected coordinates,
    each (n_pred,). Pure jnp — traceable inside a Pallas kernel body;
    shared by this kernel and the probe kernels (benchmarks/
    pallas_chain_probe.py) so the statistics math exists exactly once.
    """
    P = n_pred
    mk = [m[0, k * P:(k + 1) * P] for k in range(4)]
    M = jnp.maximum(jnp.maximum(mk[0], mk[1]),
                    jnp.maximum(mk[2], mk[3]))
    S = jnp.zeros((P,), jnp.float32)
    X = jnp.zeros((P,), jnp.float32)
    Y = jnp.zeros((P,), jnp.float32)
    sj = (0.0, 1.0, 0.0, 1.0)
    si = (0.0, 0.0, 1.0, 1.0)
    for k in range(4):
        scale = jnp.exp(mk[k] - M)
        sk = s[0, k * P:(k + 1) * P] * scale
        S = S + sk
        X = X + 2.0 * sx[0, k * P:(k + 1) * P] * scale + sj[k] * sk
        Y = Y + 2.0 * sy[0, k * P:(k + 1) * P] * scale + si[k] * sk
    inv = 1.0 / (S + eps)
    return X * inv, Y * inv


def _kernel(x_ref, w_ref, b_ref, out_ref, m_ref, s_ref, sx_ref, sy_ref, *,
            n_channels: int, eps: float):
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    P = n_channels
    N4 = 4 * P

    @pl.when(h == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)
        sx_ref[:] = jnp.zeros_like(sx_ref)
        sy_ref[:] = jnp.zeros_like(sy_ref)

    xt = x_ref[0]  # (BH, Wp, Cp)
    bh, wp, cp = xt.shape
    x2 = xt.reshape(bh * wp, cp)
    # the producer: predictor matmul on the MXU, accumulated in f32
    logits = jnp.dot(x2, w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[0]

    flat = jax.lax.broadcasted_iota(jnp.int32, (bh * wp, N4), 0)
    jc = jnp.mod(flat, wp).astype(jnp.float32)         # packed col j
    ic = (h * bh + jnp.floor_divide(flat, wp)).astype(
        jnp.float32)                                    # packed row i

    tile_max = jnp.max(logits, axis=0, keepdims=True)  # (1, N4)
    new_m = jnp.maximum(m_ref[:], tile_max)
    alpha = jnp.exp(m_ref[:] - new_m)
    e = jnp.exp(logits - new_m)                        # (bh*wp, N4)
    s_ref[:] = s_ref[:] * alpha + jnp.sum(e, axis=0, keepdims=True)
    sx_ref[:] = sx_ref[:] * alpha + jnp.sum(e * jc, axis=0, keepdims=True)
    sy_ref[:] = sy_ref[:] * alpha + jnp.sum(e * ic, axis=0, keepdims=True)
    m_ref[:] = new_m

    @pl.when(h == nh - 1)
    def _():
        X, Y = unify_packed_stats(m_ref[:], s_ref[:], sx_ref[:], sy_ref[:],
                                  P, eps)
        out_ref[0, 0, :] = X
        out_ref[0, 1, :] = Y


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _fused_rows(x, w, b, n_channels: int, eps: float, interpret: bool):
    R, Hp, Wp, Cp = x.shape
    N4 = 4 * n_channels
    assert w.shape == (Cp, N4), (w.shape, Cp, N4)
    assert Hp % BH == 0, (Hp, BH)
    out = pl.pallas_call(
        functools.partial(_kernel, n_channels=n_channels, eps=eps),
        grid=(R, Hp // BH),
        in_specs=[
            pl.BlockSpec((1, BH, Wp, Cp), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, n_channels), lambda i, h: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 2, n_channels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, N4), jnp.float32),
            pltpu.VMEM((1, N4), jnp.float32),
            pltpu.VMEM((1, N4), jnp.float32),
            pltpu.VMEM((1, N4), jnp.float32),
        ],
        interpret=interpret,
    )(x, w, jnp.asarray(b, jnp.float32).reshape(1, N4))
    # (R, 2, P) -> (R, P, 2)
    return jnp.moveaxis(out, 1, -1)


def fused_predictor_softargmax(x, pred_w, pred_b, n_channels: int,
                               eps: float = 1e-6, interpret: bool = False):
    """Pre-predictor packed activations -> (R, n_channels, 2) coords.

    x: (R, Hp, Wp, Cp) packed final decoder features (b1 output);
    pred_w: (1, 1, Cp, 4*n_channels) or (Cp, 4*n_channels) packed
    predictor kernel (ops/packed.py:pack_conv1x1_kernel); pred_b:
    (4*n_channels,) packed bias or None. Equals
    softargmax2d_packed(packed_conv(x, pred_w, pred_b), n_channels) to fp
    tolerance without materializing the logits volume. Off-TPU backends
    run the kernel in interpret mode (CI).
    """
    if jax.default_backend() != "tpu":
        interpret = True
    w = jnp.asarray(pred_w)
    if w.ndim == 4:
        w = w.reshape(w.shape[2], w.shape[3])
    if pred_b is None:
        pred_b = jnp.zeros((w.shape[1],), jnp.float32)
    x = jnp.asarray(x)
    return _fused_rows(x, w.astype(x.dtype), pred_b, int(n_channels),
                       float(eps), interpret)
