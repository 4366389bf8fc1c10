"""Per-piece timing of the eval/train hot path on the real TPU.

Times each sub-program of the flagship SDD-scale eval (rasterize, pyramid,
decode convs, softargmax) and the LoRA train step (fwd, bwd) separately so
optimization effort goes where the time is. Not part of bench.py — a
developer tool.

Usage: python benchmarks/profile_decode.py [bf16]
"""

import os
import sys
import time

import numpy as np

# repo root on path (PYTHONPATH=. breaks the axon jax-plugin discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mst_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mst_tpu import config as config_lib
from mst_tpu.models import ynet as ynet_lib
from mst_tpu.ops.heatmap import (pyramid_from_packed, rasterize_dist_nhwc,
                                 rasterize_dist_packed)
from mst_tpu.ops.softargmax import softargmax2d_packed
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib

B, H, W = 8, 352, 480
OBS_LEN, PRED_LEN = 8, 12
N_GOAL = 20
WAYPOINTS = (11,)


def timeit(name, fn, *args, n=20):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    print(f"device={jax.devices()[0]}, compute dtype={dtype.__name__}")
    params_dict = config_lib.get_params(
        config_filename="sdd_shortterm_train.yaml",
        overrides=dict(train_net="mosa_2",
                       position=["0", "1", "2", "3", "4"],
                       segmentation_model_fp=None, batch_size=B))
    mcfg = config_lib.ynet_config(params_dict)
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=OBS_LEN, pred_len=PRED_LEN, waypoints=WAYPOINTS,
        template_size=int(4200 * 0.25), kernlen=31, nsig=4.0,
        loss_scale=1000.0, resize_factor=0.25, temperature=1.0,
        n_goal=N_GOAL, n_traj=1, compute_dtype=dtype, eval_k_chunk=0)

    rng = np.random.default_rng(0)
    semantic = jnp.asarray(rng.normal(size=(1, H, W, 6)).astype(np.float32))
    trajs = jnp.asarray(
        rng.uniform(60, 280, size=(B, OBS_LEN + PRED_LEN, 2)).astype(
            np.float32))
    batch = {"semantic": semantic, "traj": trajs,
             "mask": jnp.ones(B, np.float32)}
    key = jax.random.PRNGKey(0)

    eval_step = steps_lib.make_eval_step(mcfg, scfg)
    feats, wps = eval_step.forward(params, state, batch, key)
    jax.block_until_ready(wps)
    hom = jnp.eye(3, dtype=jnp.float32)

    t_fwd = timeit("eval.forward (enc+goal dec+sample)",
                   eval_step.forward, params, state, batch, key)
    t_dec = timeit("eval.decode_and_score (K=20)", eval_step.decode_and_score,
                   params, feats, wps, batch["traj"], batch["mask"], hom)
    total = t_fwd + t_dec
    print(f"{'eval total':38s} {total * 1e3:9.3f} ms "
          f"-> {B / total:7.1f} traj/s")

    # --- decode_and_score broken into pieces
    KB = N_GOAL * B
    flat = wps.reshape(KB, len(WAYPOINTS), 2)

    @jax.jit
    def rast(flat):
        wpq = rasterize_dist_packed(flat, H, W, scfg.template_size)
        return pyramid_from_packed(wpq.astype(dtype), len(feats))

    pyr = rast(flat)
    decode = ynet_lib.make_shared_pred_traj(
        params if dtype == jnp.float32 else steps_lib._cast_floats(
            params, dtype),
        feats, len(WAYPOINTS), packed_finest=True, features0_packed=True,
        return_packed=True, wp_finest_packed=True)

    @jax.jit
    def dec_only(pyr):
        return decode(pyr)

    pred = dec_only(pyr)

    @jax.jit
    def sam_only(pred):
        return softargmax2d_packed(pred.astype(jnp.float32), PRED_LEN)

    timeit("  rasterize packed + pyramid", rast, flat)
    timeit("  decode convs (packed, K*B=160)", dec_only, pyr)
    timeit("  softargmax packed", sam_only, pred)

    # --- train step + fwd/bwd split
    mask = freeze_lib.trainable_mask(params, "mosa_2",
                                     ["0", "1", "2", "3", "4"])
    trainable, frozen = freeze_lib.split_params(params, mask)
    import optax
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(trainable)
    train_step = steps_lib.make_train_step(mcfg, scfg, optimizer)
    t_train = timeit("train step (LoRA ft)", train_step, trainable, frozen,
                     state, opt_state, batch)
    print(f"{'train':38s} -> {B / t_train:7.1f} traj/s")


if __name__ == "__main__":
    main()
