"""Measure the fused multi-epoch trainer and the vectorized grid runner.

Compares, at the reference's few-shot SDD scale (LoRA rank 2, 3 batches of
8 trajectories, per-epoch validation on one scene):

  loop   — Experiment.train's epoch loop (per-step dispatch, per-epoch
           host syncs): what `python train.py` does
  fused  — --fused: chunks of epochs as ONE program (train/fused.py)
  grid-N — N (seed, lr) runs vmapped into one program (mst_tpu.grid's
           executor, driven directly)

Prints wall-clock per run and per epoch, steady-state (post-compile).
Run on the TPU:  python benchmarks/fused_finetune.py [--epochs 60]
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
from mst_tpu.train import fused as fused_lib
from mst_tpu.train import steps as steps_lib

B, H, W = 8, 352, 480
N_TRAIN_BATCHES = 3   # n_train_batch=3 x batch_size=8 (tune_mosa budgets)
N_VAL_BATCHES = 4
OBS, PRED = 8, 12


def build(seed=0):
    params_dict = config_lib.get_params(
        config_filename="sdd_shortterm_train.yaml",
        overrides=dict(train_net="mosa_2",
                       position=["0", "1", "2", "3", "4"],
                       segmentation_model_fp=None, batch_size=B))
    mcfg = config_lib.ynet_config(params_dict)
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(seed), mcfg)
    scfg_t = steps_lib.StepConfig(
        obs_len=OBS, pred_len=PRED, waypoints=(11,), template_size=1050,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.0, n_goal=20, n_traj=1,
        compute_dtype=jnp.bfloat16, eval_k_chunk=0)
    scfg_v = scfg_t
    mask = freeze_lib.trainable_mask(params, "mosa_2",
                                     ["0", "1", "2", "3", "4"])
    trainable, frozen = freeze_lib.split_params(params, mask)
    return mcfg, scfg_t, scfg_v, trainable, frozen, state


def fake_pack(n_batches, seed=0):
    rng = np.random.default_rng(seed)
    scenes = rng.normal(size=(1, H, W, 6)).astype(np.float32)
    per_batch = {
        "traj": rng.uniform(80, 280, size=(n_batches, B, OBS + PRED, 2)
                            ).astype(np.float32),
        "mask": np.ones((n_batches, B), np.float32),
        "scene_idx": np.zeros((n_batches, B), np.int32),
    }
    return per_batch, scenes


def time_fused(epochs, chunk, runner, args_builder, label):
    # warm up EVERY chunk length the loop will use (a non-dividing final
    # chunk is a different program; compiling it inside the timed region
    # would corrupt the measurement)
    for c in {min(chunk, epochs), epochs % chunk or chunk}:
        out = runner(*args_builder(0, c))
        jax.block_until_ready(jax.tree.leaves(out[1])[0])
    t0 = time.perf_counter()
    e = 0
    while e < epochs:
        c = min(chunk, epochs - e)
        out = runner(*args_builder(e, c))
        e += c
    jax.block_until_ready(jax.tree.leaves(out[1])[0])
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s for {epochs} epochs "
          f"({1e3 * dt / epochs:.1f} ms/epoch)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--grid", type=int, default=4)
    args = ap.parse_args()
    mcfg, scfg_t, scfg_v, trainable, frozen, state = build()
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(trainable)
    train_data = jax.tree.map(jnp.asarray, fake_pack(N_TRAIN_BATCHES))
    val_data = jax.tree.map(jnp.asarray, fake_pack(N_VAL_BATCHES, seed=1))
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    # ---- loop: jitted step + per-epoch eval, host-driven
    train_step = steps_lib.make_train_step(mcfg, scfg_t, optimizer)
    eval_step = steps_lib.make_eval_step(mcfg, scfg_v)
    tb = [jax.tree.map(lambda a, i=i: a[i], train_data[0])
          for i in range(N_TRAIN_BATCHES)]
    for b in tb:
        b["semantic"] = train_data[1]
    vb = [jax.tree.map(lambda a, i=i: a[i], val_data[0])
          for i in range(N_VAL_BATCHES)]
    for b in vb:
        b["semantic"] = val_data[1]

    def loop_epochs(n, trainable, state, opt_state):
        for e in range(n):
            ms = []
            for b in tb:
                trainable, state, opt_state, m = train_step(
                    trainable, frozen, state, opt_state, b)
                ms.append(m)
            jax.device_get(ms)
            ekey = jax.random.fold_in(key, e)
            sums = []
            for i, b in enumerate(vb):
                out = eval_step(
                    freeze_lib.merge_params(trainable, frozen), state, b,
                    jax.random.fold_in(ekey, i))
                sums.append((out["ade_sum"], out["fde_sum"], out["n"]))
            jax.device_get(sums)
        return trainable

    jax.block_until_ready(loop_epochs(1, trainable, state, opt_state))
    t0 = time.perf_counter()
    jax.block_until_ready(
        loop_epochs(args.epochs, trainable, state, opt_state))
    dt_loop = time.perf_counter() - t0
    print(f"loop: {dt_loop:.2f}s for {args.epochs} epochs "
          f"({1e3 * dt_loop / args.epochs:.1f} ms/epoch)")

    # ---- fused
    runner = fused_lib.make_fused_epochs(
        mcfg, scfg_t, scfg_v, optimizer, key, train_data, val_data)
    chunk = fused_lib.chunk_size(30)

    def fused_args(e, c):
        perms = np.stack([rng.permutation(N_TRAIN_BATCHES)
                          for _ in range(c)]).astype(np.int32)
        return (trainable, frozen, state, opt_state, jnp.asarray(perms),
                jnp.arange(e, e + c, dtype=jnp.int32))

    dt_fused = time_fused(args.epochs, chunk, runner, fused_args, "fused")

    # ---- grid: R runs vmapped (per-run lr), amortized epochs
    R = args.grid
    run = fused_lib.make_epoch_runner(mcfg, scfg_t, scfg_v,
                                      lambda lr: optax.adam(lr))
    vrun = jax.jit(jax.vmap(run, in_axes=(0, None, 0, 0, 0, None, 0, 0,
                                          0, 0)))
    stk = lambda t: jax.tree.map(
        lambda x: jnp.stack([x] * R), t)
    g_trainable, g_state, g_opt = stk(trainable), stk(state), stk(opt_state)
    g_train, g_val = stk(train_data), stk(val_data)
    g_keys = jnp.stack([jax.random.PRNGKey(i) for i in range(R)])
    g_lrs = jnp.asarray(np.geomspace(3e-4, 3e-3, R), jnp.float32)

    def grid_args(e, c):
        perms = np.stack([[rng.permutation(N_TRAIN_BATCHES)
                           for _ in range(c)] for _ in range(R)]
                         ).astype(np.int32)
        return (g_trainable, frozen, g_state, g_opt, jnp.asarray(perms),
                jnp.arange(e, e + c, dtype=jnp.int32), g_keys, g_lrs,
                g_train, g_val)

    dt_grid = time_fused(args.epochs, chunk, vrun, grid_args,
                         f"grid-{R} (total)")
    print(f"grid-{R}: {1e3 * dt_grid / (args.epochs * R):.1f} ms/epoch/run "
          f"-> {dt_loop * R / dt_grid:.2f}x the looped-process sweep")
    print(f"fused vs loop: {dt_loop / dt_fused:.2f}x")


if __name__ == "__main__":
    main()
