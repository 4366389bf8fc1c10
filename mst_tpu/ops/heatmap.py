"""On-device heatmap rasterization.

The reference builds one giant (4200*resize)^2 template on the host
(reference: utils/image_utils.py:7-37) and, for EVERY trajectory point of
EVERY mini-batch, moves coordinates device->host, slices H x W windows out of
the template in a Python list comprehension, stacks them and ships them back
(reference: utils/image_utils.py:40-63, utils/train_epoch.py:63-78,
utils/evaluate.py:112-114,250-253). That is a per-step host<->device sync and
an O(N*H*W) gather.

On TPU we instead evaluate the template analytically at each output pixel:

- The Gaussian ground-truth template is `gkern(kernlen, nsig)` normalized by
  its own sum and windowed to `kernlen` (reference: image_utils.py:7-27 with
  normalize=False at models/trainer.py:210-211). It is separable:
  ``G[i, j] = gy[i] * gx[j]`` with 1-D windowed Gaussians, so rasterization is
  an outer product of two thin (N, H) and (N, W) tensors — pure VPU work that
  XLA fuses straight into the consumer (the encoder's input concat). No
  template in memory, no host round-trip, no gather.

- The distance-transform input template is ``|p - center| / max * 2``
  (reference: image_utils.py:30-37); its max over a size-S template is
  ``hypot(S//2, S//2)`` in closed form, so the rasterized value is
  ``2 * hypot(i - y, j - x) / (sqrt(2) * (S // 2))``.

Both match the reference template values bit-for-bit up to fp summation order
(the Gaussian normalizer is the only summed quantity and is separable too).
Coordinates are rounded half-to-even exactly like np.round in `get_patch`.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_template_normalizer(kernlen: int = 31, nsig: float = 4.0) -> float:
    """Sum of the un-normalized gkern grid, computed separably.

    gkern (reference: utils/image_utils.py:7-12) evaluates
    exp(-0.5 * (xx^2 + yy^2) / nsig^2) on an odd/even integer-spaced grid
    ax = linspace(-(k-1)/2, (k-1)/2, k); the normalizer is its total sum,
    which factorizes into (sum_d exp(-0.5 d^2 / nsig^2))^2.
    """
    ax = np.linspace(-(kernlen - 1) / 2.0, (kernlen - 1) / 2.0, kernlen)
    one_d = np.exp(-0.5 * np.square(ax) / (nsig**2))
    return float(one_d.sum() ** 2)


def dist_template_scale(template_size: int) -> float:
    """max value of create_dist_mat(size) before normalization.

    The max of ||idx - center|| over a size-S grid with center S//2 is at the
    (0, 0) corner: hypot(S//2, S//2) (reference: utils/image_utils.py:30-37).
    """
    m = template_size // 2
    return math.hypot(m, m)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def rasterize_gaussian(points, H: int, W: int, kernlen: int = 31, nsig: float = 4.0):
    """Rasterize Gaussian heatmaps at integer-rounded points.

    Args:
      points: (..., 2) float array of (x, y) pixel coordinates.
      H, W: output map size.
      kernlen: window size of the Gaussian kernel (values outside are 0).
      nsig: Gaussian sigma.

    Returns:
      (..., H, W) float32 maps, equal to the reference's
      get_patch(gt_template, ...) output (trainer.py:210-211 template with
      normalize=False).
    """
    pts = jnp.asarray(points, jnp.float32)
    batch_shape = pts.shape[:-1]
    pts = pts.reshape(-1, 2)
    # np.round half-to-even, like get_patch (image_utils.py:52-53)
    x = jnp.round(pts[:, 0])
    y = jnp.round(pts[:, 1])

    half = (kernlen - 1) // 2  # kernlen is odd in all shipped configs
    inv_two_sig2 = 0.5 / (nsig**2)
    norm = gaussian_template_normalizer(kernlen, nsig)

    rows = jnp.arange(H, dtype=jnp.float32)[None, :]  # (1, H)
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]  # (1, W)
    dy = rows - y[:, None]  # (N, H)
    dx = cols - x[:, None]  # (N, W)

    gy = jnp.exp(-inv_two_sig2 * dy * dy) * (jnp.abs(dy) <= half)
    gx = jnp.exp(-inv_two_sig2 * dx * dx) * (jnp.abs(dx) <= half)
    out = (gy[:, :, None] * gx[:, None, :]) / norm  # (N, H, W)
    return out.reshape(*batch_shape, H, W)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def rasterize_dist(points, H: int, W: int, template_size: int):
    """Rasterize normalized distance-transform maps at rounded points.

    Matches get_patch(create_dist_mat(template_size), ...) (reference:
    utils/image_utils.py:30-37,40-63; template size = int(4200 * resize),
    models/trainer.py:61).

    Returns (..., H, W) float32 maps.
    """
    pts = jnp.asarray(points, jnp.float32)
    batch_shape = pts.shape[:-1]
    pts = pts.reshape(-1, 2)
    x = jnp.round(pts[:, 0])
    y = jnp.round(pts[:, 1])

    scale = 2.0 / dist_template_scale(template_size)

    rows = jnp.arange(H, dtype=jnp.float32)[None, :]
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]
    dy = rows - y[:, None]  # (N, H)
    dx = cols - x[:, None]  # (N, W)
    d2 = dy[:, :, None] ** 2 + dx[:, None, :] ** 2  # (N, H, W)
    out = jnp.sqrt(d2) * scale
    return out.reshape(*batch_shape, H, W)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def rasterize_gaussian_nhwc(points, H: int, W: int, kernlen: int = 31,
                            nsig: float = 4.0):
    """Channels-last Gaussian rasterizer: (B, T, 2) -> (B, H, W, T).

    Emits the NHWC layout directly by ordering the separable outer product
    as einsum('bth,btw->bhwt') — no materialized (B,T,H,W)->(B,H,W,T)
    transpose (which at SDD scale is a ~0.5 GB HBM round-trip per step).
    """
    pts = jnp.asarray(points, jnp.float32)
    x = jnp.round(pts[..., 0])  # (B, T)
    y = jnp.round(pts[..., 1])
    half = (kernlen - 1) // 2
    inv_two_sig2 = 0.5 / (nsig**2)
    norm = gaussian_template_normalizer(kernlen, nsig)
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)
    dy = rows[None, None, :] - y[..., None]  # (B, T, H)
    dx = cols[None, None, :] - x[..., None]  # (B, T, W)
    gy = jnp.exp(-inv_two_sig2 * dy * dy) * (jnp.abs(dy) <= half)
    gx = jnp.exp(-inv_two_sig2 * dx * dx) * (jnp.abs(dx) <= half)
    return jnp.einsum("bth,btw->bhwt", gy, gx) / norm


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def rasterize_dist_nhwc(points, H: int, W: int, template_size: int):
    """Channels-last distance rasterizer: (B, T, 2) -> (B, H, W, T)."""
    pts = jnp.asarray(points, jnp.float32)
    x = jnp.round(pts[..., 0])
    y = jnp.round(pts[..., 1])
    scale = 2.0 / dist_template_scale(template_size)
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)
    dy2 = (rows[None, None, :] - y[..., None]) ** 2  # (B, T, H)
    dx2 = (cols[None, None, :] - x[..., None]) ** 2  # (B, T, W)
    # broadcast straight into NHWC: only the small (B,T,H)/(B,T,W) factors
    # are transposed, never the (B,H,W,T) volume
    d2 = (jnp.swapaxes(dy2, 1, 2)[:, :, None, :]
          + jnp.swapaxes(dx2, 1, 2)[:, None, :, :])  # (B, H, W, T)
    return jnp.sqrt(d2) * scale


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def rasterize_dist_packed(points, H: int, W: int, template_size: int):
    """Distance rasterizer emitting the space-to-depth PACKED layout.

    (B, T, 2) -> (B, H/2, W/2, 4T) with channel (si*2 + sj)*T + t, equal to
    ops.packed.space_to_depth(rasterize_dist_nhwc(...)). The eval decode's
    finest level runs packed end-to-end, so rasterizing straight into the
    packed layout removes the full-resolution (K*B, H, W, T) C-minor tensor
    and its space_to_depth copy from the program entirely.
    """
    pts = jnp.asarray(points, jnp.float32)
    x = jnp.round(pts[..., 0])  # (B, T)
    y = jnp.round(pts[..., 1])
    scale = 2.0 / dist_template_scale(template_size)
    Hp, Wp = H // 2, W // 2
    rows = jnp.arange(H, dtype=jnp.float32).reshape(Hp, 2)  # [ih, si]
    cols = jnp.arange(W, dtype=jnp.float32).reshape(Wp, 2)  # [jw, sj]
    dy2 = (rows[None, :, :, None] - y[:, None, None, :]) ** 2  # (B,Hp,2,T)
    dx2 = (cols[None, :, :, None] - x[:, None, None, :]) ** 2  # (B,Wp,2,T)
    d2 = (dy2[:, :, None, :, None, :]
          + dx2[:, None, :, None, :, :])  # (B, Hp, Wp, si, sj, T)
    B, T = x.shape
    return (jnp.sqrt(d2) * scale).reshape(B, Hp, Wp, 4 * T)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def rasterize_gaussian_packed(points, H: int, W: int, kernlen: int = 31,
                              nsig: float = 4.0):
    """Gaussian rasterizer emitting the space-to-depth PACKED layout.

    (B, T, 2) -> (B, H/2, W/2, 4T), equal to
    ops.packed.space_to_depth(rasterize_gaussian_nhwc(...)). Lets the train
    step compute the BCE loss against the packed prediction directly (the
    masked mean is layout-invariant), never materializing full-res maps.
    """
    pts = jnp.asarray(points, jnp.float32)
    x = jnp.round(pts[..., 0])  # (B, T)
    y = jnp.round(pts[..., 1])
    half = (kernlen - 1) // 2
    inv_two_sig2 = 0.5 / (nsig**2)
    norm = gaussian_template_normalizer(kernlen, nsig)
    Hp, Wp = H // 2, W // 2
    rows = jnp.arange(H, dtype=jnp.float32).reshape(Hp, 2)  # [ih, si]
    cols = jnp.arange(W, dtype=jnp.float32).reshape(Wp, 2)  # [jw, sj]
    dy = rows[None, :, :, None] - y[:, None, None, :]  # (B, Hp, 2, T)
    dx = cols[None, :, :, None] - x[:, None, None, :]  # (B, Wp, 2, T)
    gy = jnp.exp(-inv_two_sig2 * dy * dy) * (jnp.abs(dy) <= half)
    gx = jnp.exp(-inv_two_sig2 * dx * dx) * (jnp.abs(dx) <= half)
    g = (gy[:, :, None, :, None, :]
         * gx[:, None, :, None, :, :]) / norm  # (B, Hp, Wp, si, sj, T)
    B, T = x.shape
    return g.reshape(B, Hp, Wp, 4 * T)


def pyramid_from_packed(packed, n_levels: int):
    """Waypoint pyramid whose FINEST entry is the packed map itself.

    avg-pool-2x2 of the full-res map == the mean over the 4 packed
    sub-channels, so level 1 is a cheap channel reduction and deeper levels
    pool from it; the full-res map never exists. Returns
    [packed (B,H/2,W/2,4T), (B,H/2,W/2,T), (B,H/4,W/4,T), ...] with
    n_levels entries, matching avg_pool_pyramid's contents from level 1 on.
    """
    from mst_tpu.ops.pooling import avg_pool_2x2

    B, Hp, Wp, C4 = packed.shape
    T = C4 // 4
    lvl1 = packed.reshape(B, Hp, Wp, 4, T).mean(axis=3)
    pyr = [packed, lvl1]
    x = lvl1
    for _ in range(n_levels - 2):
        x = avg_pool_2x2(x)
        pyr.append(x)
    return pyr


def trajectory_heatmaps(traj, H: int, W: int, template_size: int):
    """Observed-trajectory input heatmaps: (B, T, 2) -> (B, H, W, T) NHWC."""
    return rasterize_dist_nhwc(traj, H, W, template_size)


def gt_heatmaps(traj, H: int, W: int, kernlen: int = 31, nsig: float = 4.0):
    """Ground-truth future Gaussian heatmaps: (B, T, 2) -> (B, H, W, T)."""
    return rasterize_gaussian_nhwc(traj, H, W, kernlen, nsig)
