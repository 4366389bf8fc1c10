"""Measure cross-scene bucketed batching vs per-scene batching.

The pretrain path trains over many scenes (30+ in pretrain.sh); per-scene
batching (the reference's DataLoader(batch_size=1) heritage) pads every
scene's last chunk, so with S scenes of n trajectories each the epoch runs
S*ceil(n/B) steps instead of ceil(S*n/B). This bench times one epoch of
train steps over synthetic scenes both ways on the available accelerator
and reports steps, padding waste, and trajectories/sec.

Usage: python benchmarks/bucketed_batching.py [n_scenes] [n_traj] [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from mst_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mst_tpu import config as config_lib
from mst_tpu.data import scenes as scenes_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.models import ynet as ynet_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib

H_RAW, W_RAW = 1408, 1920  # SDD scale at resize 0.25 -> 352x480
OBS_LEN, PRED_LEN = 8, 12


def main():
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_traj = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    df, _ = make_synthetic_dataset(seed=0, n_scenes=n_scenes, n_traj=n_traj,
                                   total_len=OBS_LEN + PRED_LEN,
                                   img_hw=(H_RAW, W_RAW))
    rng = np.random.default_rng(0)
    # preprocessed-scale semantic maps (6 classes), one per scene
    images = {s: rng.normal(size=(352, 480, 6)).astype(np.float32)
              for s in df.sceneId.unique()}

    params_dict = config_lib.get_params(
        config_filename="sdd_shortterm_train.yaml",
        overrides=dict(train_net="mosa_2",
                       position=["0", "1", "2", "3", "4"],
                       segmentation_model_fp=None, batch_size=B))
    mcfg = config_lib.ynet_config(params_dict)
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=OBS_LEN, pred_len=PRED_LEN, waypoints=(11,),
        template_size=1050, kernlen=31, nsig=4.0, loss_scale=1000.0,
        resize_factor=0.25, temperature=1.0, n_goal=20, n_traj=1,
        compute_dtype=jnp.bfloat16)
    mask = freeze_lib.trainable_mask(params, "mosa_2",
                                     ["0", "1", "2", "3", "4"])
    trainable, frozen = freeze_lib.split_params(params, mask)
    optimizer = optax.adam(1e-3)
    step = steps_lib.make_train_step(mcfg, scfg, optimizer)

    total = df.metaId.nunique()
    for mode in ("per_scene", "bucketed"):
        if mode == "per_scene":
            batches = scenes_lib.make_scene_batches(
                df, images, OBS_LEN + PRED_LEN, B, 0.25)
            dbs = [{"semantic": jnp.asarray(b.image[None]),
                    "traj": jnp.asarray(b.trajectories),
                    "mask": jnp.asarray(b.mask)} for b in batches]
        else:
            batches = scenes_lib.make_bucketed_batches(
                df, images, OBS_LEN + PRED_LEN, B, 0.25)
            dbs = [{"semantic": jnp.asarray(b.images),
                    "traj": jnp.asarray(b.trajectories),
                    "mask": jnp.asarray(b.mask),
                    "scene_idx": jnp.asarray(b.scene_idx)} for b in batches]
        waste = sum(float((1 - b.mask).sum()) for b in batches)
        # warmup/compile
        tr, st, opt_state = trainable, state, optimizer.init(trainable)
        tr, st, opt_state, m = step(tr, frozen, st, opt_state, dbs[0])
        jax.block_until_ready(m["loss"])
        best = np.inf
        for _ in range(3):
            tr, st2, opt_state2 = trainable, state, optimizer.init(trainable)
            t0 = time.perf_counter()
            for db in dbs:
                tr, st2, opt_state2, m = step(tr, frozen, st2, opt_state2,
                                              db)
            jax.block_until_ready(m["loss"])
            best = min(best, time.perf_counter() - t0)
        print(f"{mode:>10}: {len(dbs):3d} steps/epoch, padding rows "
              f"{int(waste):3d} ({100 * waste / (len(dbs) * B):.0f}%), "
              f"{total / best:7.1f} traj/s ({best * 1e3:.0f} ms/epoch)")


if __name__ == "__main__":
    main()
