"""Step-level A/B of the maxpool backward: select-and-scatter vs eq-mask.

benchmarks/maxpool_grad.py's shape-level microbenchmark is ambiguous on
the tunneled runtime (identical-input repeats get deduped/memoized, and
isolated pools fuse differently than in-step), so this measures the REAL
object: the full bf16 LoRA train step with the encoder's max pools backed
by (a) jnp reduce_window max (XLA lowers the VJP to select-and-scatter)
vs (b) the equality-mask custom VJP from benchmarks/maxpool_grad.py.

The eq-mask variant is measure-only (ties route gradient to ALL max
positions instead of one — a numeric deviation from the reference, see
maxpool_grad.py's caveat); it is patched in via ynet's module global and
never shipped.

Run on the TPU:  python benchmarks/maxpool_step_ab.py [--iters 30]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mst_tpu import config as config_lib
from mst_tpu.models import ynet as ynet_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib

from maxpool_grad import max_pool_2x2_eqmask

B, H, W = 8, 352, 480
OBS, PRED = 8, 12


def build_step():
    params_dict = config_lib.get_params(
        config_filename="sdd_shortterm_train.yaml",
        overrides=dict(train_net="mosa_2",
                       position=["0", "1", "2", "3", "4"],
                       segmentation_model_fp=None, batch_size=B))
    mcfg = config_lib.ynet_config(params_dict)
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=OBS, pred_len=PRED, waypoints=(11,), template_size=1050,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.0, n_goal=20, n_traj=1,
        compute_dtype=jnp.bfloat16, eval_k_chunk=0)
    optimizer = optax.adam(5e-4)
    mask = freeze_lib.trainable_mask(params, "mosa_2",
                                     ["0", "1", "2", "3", "4"])
    trainable, frozen = freeze_lib.split_params(params, mask)
    step = steps_lib.make_train_step(mcfg, scfg, optimizer)
    return step, trainable, frozen, state, optimizer.init(trainable)


def batches(n, seed=0):
    rng = np.random.default_rng(seed)
    sem = jnp.asarray(rng.normal(size=(1, H, W, 6)), jnp.float32)
    out = []
    for _ in range(n):
        out.append({
            "traj": jnp.asarray(
                rng.uniform(80, 280, size=(B, OBS + PRED, 2)), jnp.float32),
            "mask": jnp.ones((B,), jnp.float32),
            "scene_idx": jnp.zeros((B,), jnp.int32),
            "semantic": sem,
        })
    return out


def measure(label, iters):
    step, trainable, frozen, state, opt_state = build_step()
    bs = batches(8)
    for b in bs:  # warm-up covers every input buffer
        trainable, state, opt_state, m = step(trainable, frozen, state,
                                              opt_state, b)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        trainable, state, opt_state, m = step(trainable, frozen, state,
                                              opt_state, bs[i % len(bs)])
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {1e3 * dt:.2f} ms/step ({B / dt:.1f} traj/s)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    t_sas = measure("select-scatter (shipped)", args.iters)
    orig = ynet_lib.max_pool_2x2
    try:
        ynet_lib.max_pool_2x2 = max_pool_2x2_eqmask
        t_eq = measure("eq-mask custom VJP     ", args.iters)
    finally:
        ynet_lib.max_pool_2x2 = orig
    print(f"eq-mask vs select-scatter: {t_sas / t_eq:.3f}x "
          f"({1e3 * (t_sas - t_eq):+.2f} ms/step)")


if __name__ == "__main__":
    main()
