"""Probability-map sampling, TPU-native.

Equivalent of the reference `sampling` (utils/image_utils.py:110-135):
flatten (B, T, H, W) probability maps to rows, optionally zero out entries
below rel_threshold * row-max, then draw `num_samples` multinomial samples per
row and unravel indices to (x, y).

On TPU we sample in log-space:
- with replacement  -> jax.random.categorical (Gumbel argmax),
- without replacement -> Gumbel top-k, which realizes the exact
  Plackett-Luce / sequential-multinomial-without-replacement distribution.
Both are single fused device programs; the reference's torch.multinomial has
no JAX bit-equal counterpart so parity is statistical (the shipped eval
protocol already averages n_round stochastic rounds, models/trainer.py:334).
"""

import jax
import jax.numpy as jnp


def sample_heatmap(key, prob_map, num_samples: int, rel_threshold=None,
                   replacement: bool = False):
    """Sample coordinates from (possibly unnormalized) probability maps.

    Args:
      key: PRNG key.
      prob_map: (..., H, W) nonnegative maps (e.g. sigmoid outputs).
      num_samples: samples per map.
      rel_threshold: if set, entries < rel_threshold * max(map) are excluded
        (reference: image_utils.py:114-119).
      replacement: sample with replacement (TTST uses True, goal sampling
        uses the torch.multinomial default False).

    Returns:
      (..., num_samples, 2) float32 (x, y) coordinates.
    """
    p = jnp.asarray(prob_map)
    H, W = p.shape[-2], p.shape[-1]
    batch_shape = p.shape[:-2]
    flat = p.reshape(-1, H * W)

    logp = jnp.log(jnp.maximum(flat, 1e-38))
    if rel_threshold is not None:
        thresh = flat.max(axis=1, keepdims=True) * rel_threshold
        logp = jnp.where(flat < thresh, -jnp.inf, logp)

    if replacement:
        idx = jax.random.categorical(
            key, logp[:, None, :], axis=-1,
            shape=(flat.shape[0], num_samples))
    else:
        # Gumbel top-k == multinomial without replacement.
        g = jax.random.gumbel(key, logp.shape, dtype=logp.dtype)
        _, idx = jax.lax.top_k(logp + g, num_samples)

    xs = (idx % W).astype(jnp.float32)
    ys = jnp.floor_divide(idx, W).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)
    return coords.reshape(*batch_shape, num_samples, 2)
