"""ETH/UCY world-coordinate metric path."""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.models import ynet as ynet_lib
from mst_tpu.train import steps as steps_lib


def _setup(rng, world):
    B, H, W = 2, 64, 64
    mcfg = ynet_lib.YNetConfig(
        obs_len=4, pred_len=8, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(7,),
        train_net="train", network="original")
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=4, pred_len=8, waypoints=(7,), template_size=256,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.5,
        temperature=1.0, n_goal=3, n_traj=1, world_coords=world)
    batch = {
        "semantic": jnp.asarray(
            rng.normal(size=(1, H, W, 3)).astype(np.float32)),
        "traj": jnp.asarray(
            rng.uniform(10, 50, size=(B, 12, 2)).astype(np.float32)),
        "mask": jnp.ones(B),
    }
    return mcfg, params, state, scfg, batch


def test_identity_homography_rescales(rng):
    """With H = I, world metrics equal pixel metrics WITHOUT the extra
    /resize (coords are already divided by resize before the homography)."""
    mcfg, params, state, scfg, batch = _setup(rng, world=True)
    batch["homography"] = jnp.eye(3, dtype=jnp.float32)
    out_w = steps_lib.make_eval_step(mcfg, scfg)(
        params, state, batch, jax.random.PRNGKey(1))

    scfg_px = scfg._replace(world_coords=False)
    out_px = steps_lib.make_eval_step(mcfg, scfg_px)(
        params, state, dict(batch), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out_w["ade"]),
                               np.asarray(out_px["ade"]), rtol=1e-4)


def test_scaling_homography(rng):
    """A pure-scale homography scales the metric linearly."""
    mcfg, params, state, scfg, batch = _setup(rng, world=True)
    batch["homography"] = jnp.eye(3, dtype=jnp.float32)
    out1 = steps_lib.make_eval_step(mcfg, scfg)(
        params, state, batch, jax.random.PRNGKey(1))
    batch2 = dict(batch)
    batch2["homography"] = jnp.diag(jnp.asarray([0.05, 0.05, 1.0]))
    out2 = steps_lib.make_eval_step(mcfg, scfg)(
        params, state, batch2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out2["ade"]),
                               np.asarray(out1["ade"]) * 0.05, rtol=1e-3)
