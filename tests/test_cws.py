"""CWS (Conditional Waypoint Sampling) parity tests.

The oriented-Gaussian prior is checked against a torch oracle implementing
the reference's torch_multivariate_gaussian_heatmap (evaluate.py:9-34);
the full CWS path is smoke-checked through the eval step on a 2-waypoint
(long-term) config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


def torch_multivariate_gaussian_heatmap(coordinates, H, W, dist,
                                        sigma_factor, ratio, rot=False):
    """Torch oracle of reference evaluate.py:9-34."""
    ax = torch.linspace(0, H, H) - coordinates[1]
    ay = torch.linspace(0, W, W) - coordinates[0]
    xx, yy = torch.meshgrid([ax, ay], indexing="ij")
    meshgrid = torch.stack([yy, xx], dim=-1)
    radians = torch.atan2(dist[0], dist[1])
    c, s = torch.cos(radians), torch.sin(radians)
    R = torch.Tensor([[c, s], [-s, c]])
    if rot:
        R = torch.matmul(torch.Tensor([[0, -1], [1, 0]]), R)
    dist_norm = dist.square().sum(-1).sqrt() + 5
    conv = torch.Tensor([[dist_norm / sigma_factor / ratio, 0],
                         [0, dist_norm / sigma_factor]])
    conv = torch.square(conv)
    T = torch.matmul(R, conv)
    T = torch.matmul(T, R.T)
    kernel = (torch.matmul(meshgrid, torch.inverse(T)) * meshgrid).sum(-1)
    kernel = torch.exp(-0.5 * kernel)
    return kernel / kernel.sum()


@pytest.mark.parametrize("rot", [False, True])
def test_cws_prior_matches_torch_oracle(rot, rng):
    from mst_tpu.train.steps import cws_gaussian_prior

    H, W = 40, 56
    for _ in range(3):
        mean = rng.uniform(5, 35, size=2).astype(np.float32)
        dist = rng.uniform(-30, 30, size=2).astype(np.float32)
        sf = float(rng.uniform(3, 7))
        want = torch_multivariate_gaussian_heatmap(
            torch.tensor(mean), H, W, torch.tensor(dist), sf, 2.0, rot)
        got = cws_gaussian_prior(
            jnp.asarray(mean)[None, None], jnp.asarray(dist)[None, None],
            jnp.asarray([[sf]]), 2.0, rot, H, W)[0, 0]
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-3, atol=1e-6)


def test_cws_eval_step_runs(rng):
    """Full eval with use_CWS on a 2-waypoint long-term-style config."""
    from mst_tpu import config as config_lib
    from mst_tpu.models import ynet as ynet_lib
    from mst_tpu.train import steps as steps_lib

    B, H, W = 2, 64, 64
    mcfg = ynet_lib.YNetConfig(
        obs_len=4, pred_len=8, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(3, 7),
        train_net="train", network="original")
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=4, pred_len=8, waypoints=(3, 7), template_size=256,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.8, n_goal=3, n_traj=2, use_cws=True,
        cws_params=dict(sigma_factor=6, ratio=2, rot=True))
    batch = {
        "semantic": jnp.asarray(
            rng.normal(size=(1, H, W, 3)).astype(np.float32)),
        "traj": jnp.asarray(
            rng.uniform(10, 50, size=(B, 12, 2)).astype(np.float32)),
        "mask": jnp.ones(B),
    }
    eval_step = steps_lib.make_eval_step(mcfg, scfg)
    out = eval_step(params, state, batch, jax.random.PRNGKey(1))
    assert out["ade"].shape == (B,)
    assert np.isfinite(np.asarray(out["ade"])).all()
    assert np.isfinite(np.asarray(out["fde"])).all()


def test_plain_multiwaypoint_eval_runs(rng):
    """2 waypoints without CWS: independent waypoint sampling + goal concat
    (reference evaluate.py:229-234)."""
    from mst_tpu.models import ynet as ynet_lib
    from mst_tpu.train import steps as steps_lib

    B, H, W = 2, 64, 64
    mcfg = ynet_lib.YNetConfig(
        obs_len=4, pred_len=8, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(3, 7),
        train_net="train", network="original")
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=4, pred_len=8, waypoints=(3, 7), template_size=256,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.8, n_goal=3, n_traj=2)
    batch = {
        "semantic": jnp.asarray(
            rng.normal(size=(1, H, W, 3)).astype(np.float32)),
        "traj": jnp.asarray(
            rng.uniform(10, 50, size=(B, 12, 2)).astype(np.float32)),
        "mask": jnp.ones(B),
    }
    eval_step = steps_lib.make_eval_step(mcfg, scfg)
    out = eval_step(params, state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["ade"])).all()


def test_ttst_eval_runs(rng):
    """TTST path: 10k samples -> batched k-means clustering."""
    from mst_tpu.models import ynet as ynet_lib
    from mst_tpu.train import steps as steps_lib

    B, H, W = 2, 64, 64
    mcfg = ynet_lib.YNetConfig(
        obs_len=4, pred_len=8, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(7,),
        train_net="train", network="original")
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=4, pred_len=8, waypoints=(7,), template_size=256,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.0, n_goal=4, n_traj=1, use_ttst=True,
        rel_threshold=0.01)
    batch = {
        "semantic": jnp.asarray(
            rng.normal(size=(1, H, W, 3)).astype(np.float32)),
        "traj": jnp.asarray(
            rng.uniform(10, 50, size=(B, 12, 2)).astype(np.float32)),
        "mask": jnp.ones(B),
    }
    eval_step = steps_lib.make_eval_step(mcfg, scfg)
    out = eval_step(params, state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["ade"])).all()
