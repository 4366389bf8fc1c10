"""Batched k-means for TTST goal clustering.

The reference clusters 10,000 sampled goals per pedestrian with a Python
per-person loop around a torch k-means (utils/evaluate.py:147-155,
utils/kmeans.py:22-108; tol semantics: stop when the summed center shift
squared < tol, with empty clusters re-seeded from a random point).

Here the whole batch is one jitted program: vmap over persons, a
lax.while_loop over iterations, and the assignment/update steps as matmuls
(one-hot^T @ X) that ride the MXU.
"""

import functools

import jax
import jax.numpy as jnp


def _kmeans_single(key, X, num_clusters: int, tol: float, iter_limit: int,
                   init_centers=None):
    """K-means over X (N, D) -> (assignments (N,), centers (k, D))."""
    N = X.shape[0]
    init_key, loop_key = jax.random.split(key)
    if init_centers is None:
        # initialize: sample k distinct points (kmeans.py:9-19)
        idx = jax.random.choice(init_key, N, shape=(num_clusters,),
                                replace=False)
        centers0 = X[idx]
    else:
        # resume semantics (kmeans.py:62-68): snap each given center to the
        # closest data point before iterating
        d2 = jnp.sum((X[:, None, :] - init_centers[None, :, :]) ** 2, axis=-1)
        centers0 = X[jnp.argmin(d2, axis=0)]

    def assign(centers):
        # (N, k) squared euclidean distances (kmeans.py:146-159)
        d2 = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        return jnp.argmin(d2, axis=1)

    def body(carry):
        centers, _, it, key = carry
        choice = assign(centers)
        onehot = jax.nn.one_hot(choice, num_clusters, dtype=X.dtype)  # (N, k)
        counts = onehot.sum(axis=0)  # (k,)
        sums = onehot.T @ X  # (k, D) — MXU
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters: re-seed from a random data point (kmeans.py:82-84)
        key, sub = jax.random.split(key)
        rand_pts = X[jax.random.randint(sub, (num_clusters,), 0, N)]
        new_centers = jnp.where((counts > 0)[:, None], means, rand_pts)
        shift = jnp.sum(jnp.sqrt(jnp.sum((new_centers - centers) ** 2, axis=1)))
        return new_centers, shift, it + 1, key

    def cond(carry):
        _, shift, it, _ = carry
        return (shift**2 >= tol) & (it < iter_limit)

    init = (centers0, jnp.asarray(jnp.inf, X.dtype), jnp.asarray(0), loop_key)
    centers, _, _, _ = jax.lax.while_loop(cond, body, init)
    return assign(centers), centers


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def batched_kmeans(key, X, num_clusters: int, tol: float = 1e-3,
                   iter_limit: int = 1000, init_centers=None):
    """Cluster a batch of point sets.

    Args:
      key: PRNG key.
      X: (B, N, D) point sets (TTST: B persons x 10000 goal samples x 2).
      num_clusters: k (TTST: n_goal - 1, evaluate.py:141).
      tol / iter_limit: stopping rule matching the reference call
        (evaluate.py:153-154: tol=0.001, iter_limit=1000; the while_loop
        exits at tol, so the limit is a safety net, not a cost).
      init_centers: optional (B, k, D) initial centers; when given, each is
        snapped to its nearest data point first (reference kmeans.py:62-68
        "resuming" path). Used by parity tests for deterministic runs.

    Returns:
      assignments (B, N) int32, centers (B, k, D) float.
    """
    keys = jax.random.split(key, X.shape[0])
    if init_centers is None:
        return jax.vmap(
            lambda k, x: _kmeans_single(k, x, num_clusters, tol, iter_limit)
        )(keys, X)
    return jax.vmap(
        lambda k, x, c: _kmeans_single(k, x, num_clusters, tol, iter_limit, c)
    )(keys, X, init_centers)
