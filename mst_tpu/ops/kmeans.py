"""Batched k-means for TTST goal clustering.

The reference clusters 10,000 sampled goals per pedestrian with a Python
per-person loop around a torch k-means (utils/evaluate.py:147-155,
utils/kmeans.py:22-108; tol semantics: stop when the summed center shift
squared < tol, with empty clusters re-seeded from a random point).

Here the whole batch is one jitted program: vmap over persons, a
lax.while_loop over iterations, and the assignment/update steps as matmuls
(one-hot^T @ X) that ride the MXU. Both distance metrics of the reference
(kmeans.py:146-180: euclidean, cosine) are supported, plus the
centers-only inference entry kmeans_predict (kmeans.py:111-143).
"""

import functools

import jax
import jax.numpy as jnp


def pairwise_sq_dist(a, b):
    """(N, D) x (K, D) -> (N, K) squared euclidean distances
    (reference kmeans.py:146-159 pairwise_distance)."""
    return jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)


def pairwise_cosine(a, b):
    """(N, D) x (K, D) -> (N, K) cosine distances 1 - cos_sim
    (reference kmeans.py:162-180 pairwise_cosine; no eps guard there
    either — zero vectors produce nan exactly like the torch version)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return 1.0 - jnp.sum(a[:, None, :] * b[None, :, :], axis=-1)


_DISTANCES = {"euclidean": pairwise_sq_dist, "cosine": pairwise_cosine}


def _kmeans_single(key, X, num_clusters: int, tol: float, iter_limit: int,
                   init_centers=None, distance: str = "euclidean"):
    """K-means over X (N, D) -> (assignments (N,), centers (k, D))."""
    N = X.shape[0]
    pdist = _DISTANCES[distance]
    init_key, loop_key = jax.random.split(key)
    if init_centers is None:
        # initialize: sample k distinct points (kmeans.py:9-19)
        idx = jax.random.choice(init_key, N, shape=(num_clusters,),
                                replace=False)
        centers0 = X[idx]
    else:
        # resume semantics (kmeans.py:62-68): snap each given center to the
        # closest data point (under the chosen metric) before iterating
        d = pdist(X, init_centers)
        centers0 = X[jnp.argmin(d, axis=0)]

    def assign(centers):
        return jnp.argmin(pdist(X, centers), axis=1)

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


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 6))
def batched_kmeans(key, X, num_clusters: int, tol: float = 1e-3,
                   iter_limit: int = 1000, init_centers=None,
                   distance: str = "euclidean"):
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
      distance: 'euclidean' (TTST) or 'cosine' (reference kmeans.py:146-180).

    Returns:
      assignments (B, N) int32, centers (B, k, D) float.
    """
    keys = jax.random.split(key, X.shape[0])
    if init_centers is None:
        return jax.vmap(
            lambda k, x: _kmeans_single(k, x, num_clusters, tol, iter_limit,
                                        distance=distance)
        )(keys, X)
    return jax.vmap(
        lambda k, x, c: _kmeans_single(k, x, num_clusters, tol, iter_limit,
                                       c, distance=distance)
    )(keys, X, init_centers)


@functools.partial(jax.jit, static_argnums=(2,))
def kmeans_predict(X, cluster_centers, distance: str = "euclidean"):
    """Assign points to existing cluster centers (reference
    kmeans.py:111-143 kmeans_predict).

    Args:
      X: (N, D) points or (B, N, D) batched point sets.
      cluster_centers: (k, D) or (B, k, D) to match X.
      distance: 'euclidean' or 'cosine'.

    Returns:
      cluster ids, (N,) or (B, N) int32.
    """
    pdist = _DISTANCES[distance]
    if X.ndim == 2:
        return jnp.argmin(pdist(X, cluster_centers), axis=1)
    return jax.vmap(lambda x, c: jnp.argmin(pdist(x, c), axis=1))(
        X, cluster_centers)
