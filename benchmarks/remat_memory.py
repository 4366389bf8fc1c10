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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(scale, remat, compute_dtype="bfloat16"):
    import optax

    import bench

    from mst_tpu.train import freeze as freeze_lib
    from mst_tpu.train import steps as steps_lib

    mcfg, params, state, scfg, batch, sc = bench.build_scenario(
        "sdd", compute_dtype,
        hw_scale=2 if scale == "big" else 1,  # big = resize 0.5-equivalent
        remat=remat)
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
    temp = getattr(mem, "temp_size_in_bytes", None) if mem else None
    temp_mb = temp / 2**20 if temp is not None else None

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
