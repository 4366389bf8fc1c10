"""Capture an XLA op-level profile of the eval decode / train step on TPU.

Writes a trace with jax.profiler and converts it to hlo_stats via the
tensorboard-plugin-profile converter, printing the top ops by self time.

Usage: python benchmarks/xprof_decode.py [bf16] [train]
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mst_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mst_tpu import config as config_lib
from mst_tpu.models import ynet as ynet_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib

B, H, W = 8, 352, 480
OBS_LEN, PRED_LEN = 8, 12
N_GOAL = 20
WAYPOINTS = (11,)


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    do_train = "train" in sys.argv
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

    logdir = f"/tmp/xprof_{'train' if do_train else 'eval'}_{dtype.__name__}"
    if do_train:
        mask = freeze_lib.trainable_mask(params, "mosa_2",
                                         ["0", "1", "2", "3", "4"])
        trainable, frozen = freeze_lib.split_params(params, mask)
        import optax
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(trainable)
        step = steps_lib.make_train_step(mcfg, scfg, optimizer)
        trainable, st, opt_state, m = step(trainable, frozen, state,
                                           opt_state, batch)
        jax.block_until_ready(m["loss"])
        with jax.profiler.trace(logdir):
            for _ in range(5):
                trainable, st, opt_state, m = step(trainable, frozen, st,
                                                   opt_state, batch)
            jax.block_until_ready(m["loss"])
    else:
        eval_step = steps_lib.make_eval_step(mcfg, scfg)
        feats, wps = eval_step.forward(params, state, batch, key)
        hom = jnp.eye(3, dtype=jnp.float32)
        out = eval_step.decode_and_score(params, feats, wps, batch["traj"],
                                         batch["mask"], hom)
        jax.block_until_ready(out["ade"])
        with jax.profiler.trace(logdir):
            for _ in range(5):
                out = eval_step.decode_and_score(
                    params, feats, wps, batch["traj"], batch["mask"], hom)
            jax.block_until_ready(out["ade"])

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane:", xplanes)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats", {})
    outfile = f"{logdir}/hlo_stats.json"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(outfile, mode) as f:
        f.write(data)
    print("wrote", outfile)


if __name__ == "__main__":
    main()
