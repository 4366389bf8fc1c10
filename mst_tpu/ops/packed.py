"""Space-to-depth channel packing for small-channel convolutions.

Y-Net's convs have 32-64 channels; on the 128x128 MXU the output-channel
dimension then uses <=50% (often 25%) of the lanes. Packing 2x2 spatial
blocks into channels (x' [i,j,(si,sj,c)] = x[2i+si, 2j+sj, c]) turns a
stride-1 SAME 3x3 conv (C -> Co) at (H, W) into an EXACTLY equivalent 3x3
conv (4C -> 4Co) at (H/2, W/2): for every output sub-position di and kernel
tap u, the source row 2i+di+u lands in packed row i + floor((di+u)/2),
sub-row (di+u) mod 2 — still a 3-tap neighborhood. The packed kernel is
sparse (per (di,u) only one si is live) but the dense MXU multiplies the
zeros anyway, trading ~2.25x FLOPs for ~4x lane utilization on C_out<=32
convs.

The packed bilinear x2 upsample (align_corners=False) is likewise a fixed
3x3 conv from the half-res grid straight into packed space: output sub-pixel
si samples source position i + si/2 - 1/4, i.e. a {0.25, 0.75} two-tap
blend, with edge replication at borders (torch clamps source indices).

All transforms are bit-exact up to fp reassociation; tests compare against
the unpacked ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index (si*2 + sj)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, W/2, si, sj, C)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x):
    """Inverse of space_to_depth."""
    B, Hp, Wp, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, Hp, Wp, 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, Hp, si, Wp, sj, C)
    return x.reshape(B, Hp * 2, Wp * 2, C)


@functools.lru_cache()
def _tap_selector():
    """Constant T[pu, si, di, u] = 1 iff source tap u = 2*pu + si - di."""
    T = np.zeros((3, 2, 2, 3), np.float32)
    for pu in (-1, 0, 1):
        for si in (0, 1):
            for di in (0, 1):
                u = 2 * pu + si - di
                if -1 <= u <= 1:
                    T[pu + 1, si, di, u + 1] = 1.0
    return T


def pack_conv3x3_kernel(k):
    """(3, 3, C, Co) SAME stride-1 kernel -> (3, 3, 4C, 4Co) packed kernel.

    K'[pu+1, pv+1, (si,sj,c), (di,dj,co)] = K[u+1, v+1, c, co]
    with u = 2*pu + si - di (zero when u is outside [-1, 1]).
    jit-traceable: built as an einsum against constant tap selectors.
    """
    C, Co = k.shape[2], k.shape[3]
    T = _tap_selector()
    kp = jnp.einsum("Psdu,Qtev,uvcg->PQstcdeg", T, T, jnp.asarray(k))
    return kp.reshape(3, 3, 4 * C, 4 * Co)


def pack_conv1x1_kernel(k):
    """(1, 1, C, Co) -> (1, 1, 4C, 4Co) block-diagonal packed kernel."""
    C, Co = k.shape[2], k.shape[3]
    eye = jnp.eye(4, dtype=jnp.asarray(k).dtype)
    kp = jnp.einsum("se,cg->sceg", eye, jnp.asarray(k)[0, 0])
    return kp.reshape(1, 1, 4 * C, 4 * Co)


def pack_bias(b):
    """(Co,) -> (4Co,)."""
    return jnp.tile(jnp.asarray(b), 4)


def packed_upsample_kernel(C, dtype=np.float32):
    """Fixed (3, 3, C, 4C) kernel: half-res input -> PACKED bilinear-x2.

    Output sub-pixel si of up(x) at packed row i samples x at i + si/2 - 1/4:
    si=0 blends x[i-1] (0.25) and x[i] (0.75); si=1 blends x[i] (0.75) and
    x[i+1] (0.25). Apply on an edge-replicated input (VALID after
    jnp.pad(..., mode='edge')) to match torch's index clamping at borders.
    """
    w = {0: {-1: 0.25, 0: 0.75}, 1: {0: 0.75, 1: 0.25}}
    kp = np.zeros((3, 3, C, 4 * C), dtype)
    for si in (0, 1):
        for sj in (0, 1):
            for u, wy in w[si].items():
                for v, wx in w[sj].items():
                    cout = (si * 2 + sj) * C
                    kp[u + 1, v + 1, :, cout:cout + C] += (
                        wy * wx * np.eye(C, dtype=dtype))
    return kp


_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def packed_upsample_2x(x, kernel):
    """(B, Hp, Wp, C) half-res -> (B, Hp, Wp, 4C) packed bilinear x2.

    Equals space_to_depth(upsample_bilinear_2x(x)).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # kernel builders work in f32 (tap-selector einsums); cast to the
    # activation dtype so bf16 compute is not silently promoted back
    return jax.lax.conv_general_dilated(
        xp, jnp.asarray(kernel, x.dtype), (1, 1), "VALID",
        dimension_numbers=_DIMNUMS)


def packed_conv(x, kernel, bias=None):
    """SAME conv in packed space."""
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, x.dtype), (1, 1), "SAME",
        dimension_numbers=_DIMNUMS)
    if bias is not None:
        y = y + jnp.asarray(bias, y.dtype)
    return y
