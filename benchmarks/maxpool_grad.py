"""Measure max-pool backward variants at the train step's encoder shapes.

The round-3 train xprof attributed ~1.5 ms of the 26 ms bf16 LoRA step to
maxpool-backward select fusions (XLA lowers reduce_window-max's VJP to
select-and-scatter, a notoriously slow op on TPU). Candidate replacement:
an equality-mask custom VJP —

    y  = maxpool2x2(x)
    dx = broadcast(g) * (x == broadcast(y)) [/ tie_count]

which is pure elementwise VPU work. CAVEAT, why this is measure-first and
NOT shipped by default: tie handling differs. select_and_scatter routes
the gradient to ONE max position per window; the equality mask hits ALL
tied positions (tie_count normalization preserves the sum but still
differs from torch's first-tie-takes-all). Post-ReLU feature maps tie at
exact 0.0 constantly, so this is a real numeric deviation — it would
break the reference e2e Adam-parity tests if it became the default.

Run on TPU:  python benchmarks/maxpool_grad.py
Prints fwd+bwd wall per variant at each encoder stage shape and the
projected step-level saving.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.ops.pooling import max_pool_2x2

# bf16 LoRA train-step encoder stage shapes (SDD scale, B=8; stages 0-1
# run packed at half res / 4x channels, so their pools are the packed
# channel-group max — the unpacked deep stages are the select-scatter
# ones)
SHAPES = [
    (8, 176, 240, 128),  # packed stage-0/1 equivalent volume
    (8, 88, 120, 64),
    (8, 44, 60, 64),
    (8, 22, 30, 64),
]


@jax.custom_vjp
def max_pool_2x2_eqmask(x):
    return max_pool_2x2(x)


def _fwd(x):
    y = max_pool_2x2(x)
    return y, (x, y)


def _up2(y):
    B, H, W, C = y.shape
    return jnp.broadcast_to(y[:, :, None, :, None, :],
                            (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)


def _bwd(res, g):
    x, y = res
    mask = (x == _up2(y)).astype(g.dtype)
    # normalize ties so the gradient SUM per window matches (torch routes
    # everything to the first tie; both conserve the total)
    counts = jax.lax.reduce_window(mask, 0.0, jax.lax.add, (1, 2, 2, 1),
                                   (1, 2, 2, 1), "VALID")
    dx = mask * _up2(g / jnp.maximum(counts, 1.0))
    return (dx,)


max_pool_2x2_eqmask.defvjp(_fwd, _bwd)


def timeit(fn, x, n=50):
    g = jax.jit(jax.grad(lambda x: fn(x).sum()))
    g(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    total_sas, total_eq = 0.0, 0.0
    for shape in SHAPES:
        x = jnp.asarray(
            np.maximum(np.random.default_rng(0).normal(size=shape), 0.0),
            jnp.bfloat16)  # post-ReLU-like (many exact-0 ties)
        t_sas = timeit(max_pool_2x2, x)
        t_eq = timeit(max_pool_2x2_eqmask, x)
        total_sas += t_sas
        total_eq += t_eq
        print(f"{str(shape):24s} select-scatter {1e3 * t_sas:7.3f} ms   "
              f"eq-mask {1e3 * t_eq:7.3f} ms   ({t_sas / t_eq:4.2f}x)")
    print(f"sum: select-scatter {1e3 * total_sas:.3f} ms, eq-mask "
          f"{1e3 * total_eq:.3f} ms -> saves "
          f"{1e3 * (total_sas - total_eq):.3f} ms of fwd+bwd pool time")
    # numeric check: same forward; backward sums agree per window
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 4)),
                    jnp.float32)
    np.testing.assert_allclose(max_pool_2x2(x), max_pool_2x2_eqmask(x))
    g1 = jax.grad(lambda x: (max_pool_2x2(x) ** 2).sum())(x)
    g2 = jax.grad(lambda x: (max_pool_2x2_eqmask(x) ** 2).sum())(x)
    s1 = jax.lax.reduce_window(g1, 0.0, jax.lax.add, (1, 2, 2, 1),
                               (1, 2, 2, 1), "VALID")
    s2 = jax.lax.reduce_window(g2, 0.0, jax.lax.add, (1, 2, 2, 1),
                               (1, 2, 2, 1), "VALID")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    print("numeric: forward identical; per-window gradient sums match")


if __name__ == "__main__":
    main()
