"""Pooling / resizing primitives (NHWC), matching the reference torch ops.

- max_pool_2x2: nn.MaxPool2d(2, 2) between encoder stages (ynet.py:202,214).
- avg_pool_pyramid: the AvgPool2d(2**i) waypoint-map pyramid fed to the
  trajectory decoder (utils/train_epoch.py:97-100, utils/evaluate.py:255-257)
  as one reduce_window chain (each level pools the previous by 2x2, which is
  exact because maps are padded to a multiple of 2**n_levels).
- upsample_bilinear_2x: F.interpolate(scale_factor=2, mode='bilinear',
  align_corners=False) in the decoder (ynet.py:463); jax.image.resize's
  half-pixel convention is the align_corners=False convention.
"""

import jax
import jax.numpy as jnp


def max_pool_2x2(x):
    """(..., H, W, C) -> (..., H//2, W//2, C) max pool, stride 2, no pad."""
    ndim = x.ndim
    window = (1,) * (ndim - 3) + (2, 2, 1)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, window, "VALID")


def avg_pool_2x2(x):
    """(..., H, W, C) -> (..., H//2, W//2, C) average pool."""
    ndim = x.ndim
    window = (1,) * (ndim - 3) + (2, 2, 1)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window, window, "VALID")
    return summed * 0.25


def avg_pool_pyramid(x, n_levels: int):
    """Return [x, avg2(x), avg4(x), ...] with n_levels entries.

    Level i equals AvgPool2d(kernel_size=2**i, stride=2**i)(x) exactly when
    H and W are divisible by 2**(n_levels-1) (guaranteed by the /32 image
    padding, reference: utils/image_utils.py:95-107).
    """
    out = [x]
    for _ in range(n_levels - 1):
        x = avg_pool_2x2(x)
        out.append(x)
    return out


def upsample_bilinear_2x(x):
    """(..., H, W, C) -> (..., 2H, 2W, C) bilinear, half-pixel centers."""
    shape = x.shape[:-3] + (x.shape[-3] * 2, x.shape[-2] * 2, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")
