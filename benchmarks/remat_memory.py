"""Measure --remat's HBM/time tradeoff on the train step.

jax.checkpoint around the encoder and the goal/traj decoders
(steps.make_train_step, scfg.remat) recomputes their internal conv
activations in the backward instead of holding them across the step.
This prints XLA's compiled memory analysis (temp allocation = activation
workspace) and the measured step rate, with and without remat, at the
bench scale and at a 2x-spatial "big scene" scale.

Usage: python benchmarks/remat_memory.py [n_iter]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(scale, remat, compute_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, ".")
    import bench

    from mst_tpu import config as config_lib
    from mst_tpu.models import ynet as ynet_lib
    from mst_tpu.train import freeze as freeze_lib
    from mst_tpu.train import steps as steps_lib

    sc = dict(bench.SCENARIOS["sdd"])
    if scale == "big":
        sc["H"], sc["W"] = 2 * sc["H"], 2 * sc["W"]  # resize 0.5-equivalent
    params_dict = config_lib.get_params(
        config_filename=sc["config"],
        overrides=dict(train_net="mosa_2",
                       position=["0", "1", "2", "3", "4"],
                       segmentation_model_fp=None, batch_size=sc["B"]))
    mcfg = config_lib.ynet_config(params_dict)
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=sc["obs_len"], pred_len=sc["pred_len"],
        waypoints=sc["waypoints"],
        template_size=int(4200 * sc["resize"]), kernlen=31, nsig=4.0,
        loss_scale=1000.0, resize_factor=sc["resize"],
        temperature=sc["temperature"], n_goal=bench.N_GOAL, n_traj=1,
        compute_dtype=(jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16")
                       else jnp.float32),
        eval_k_chunk=0, remat=remat)

    semantic, trajs = bench._inputs(sc=sc)
    batch = jax.tree.map(jnp.asarray,
                         {"semantic": semantic, "traj": trajs,
                          "mask": np.ones(sc["B"], np.float32)})
    mask = freeze_lib.trainable_mask(params, "mosa_2",
                                     ["0", "1", "2", "3", "4"])
    trainable, frozen = freeze_lib.split_params(params, mask)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(trainable)
    step = steps_lib.make_train_step(mcfg, scfg, optimizer)
    return step, (trainable, frozen, state, opt_state, batch), sc


def measure(scale, remat, n_iter):
    import jax

    from mst_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    step, args, sc = build(scale, remat)
    lowered = jax.jit(step.__wrapped__).lower(*args)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    temp_mb = getattr(mem, "temp_size_in_bytes", 0) / 2**20 if mem else None

    out = step(*args)
    jax.block_until_ready(out[3]["loss"])
    trainable, frozen, state, opt_state, batch = args
    t0 = time.perf_counter()
    for _ in range(n_iter):
        trainable, state, opt_state, metrics = step(
            trainable, frozen, state, opt_state, batch)
    jax.block_until_ready(metrics["loss"])
    tps = sc["B"] * n_iter / (time.perf_counter() - t0)
    return {"scale": scale, "remat": remat,
            "temp_mb": round(temp_mb, 1) if temp_mb is not None else None,
            "traj_per_sec": round(tps, 2)}


def main(n_iter=20):
    rows = []
    for scale in ("sdd", "big"):
        for remat in (False, True):
            r = measure(scale, remat, n_iter)
            print(f"[remat] {r}", file=sys.stderr, flush=True)
            rows.append(r)
    print(json.dumps({"metric": "remat_memory", "rows": rows}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
