"""Numerical parity of the JAX YNet against a torch mirror.

Builds a minimal torch implementation of the plain Y-Net (mirroring the
reference architecture: models/ynet.py:170-215,398-471), copies the JAX
pytree weights into it, and checks the forward maps agree. This validates
conv padding, maxpool, bilinear-x2 (align_corners=False), concat ordering and
BCE loss numerics without needing released checkpoints.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mst_tpu.models import ynet as jynet
from mst_tpu.models.layers import hwio_to_torch_conv
from mst_tpu.ops.pooling import avg_pool_pyramid

CFG = jynet.YNetConfig(
    obs_len=4, pred_len=6, n_semantic_classes=3,
    encoder_channels=(8, 8, 16, 16, 16), decoder_channels=(16, 16, 16, 8, 8),
    waypoints=(5,), train_net="train", network="original")


class TorchEncoder(nn.Module):
    def __init__(self, in_ch, chans):
        super().__init__()
        self.stages = nn.ModuleList()
        self.stages.append(nn.Sequential(
            nn.Conv2d(in_ch, chans[0], 3, padding=1), nn.ReLU()))
        for i in range(len(chans) - 1):
            self.stages.append(nn.Sequential(
                nn.MaxPool2d(2, 2),
                nn.Conv2d(chans[i], chans[i + 1], 3, padding=1), nn.ReLU(),
                nn.Conv2d(chans[i + 1], chans[i + 1], 3, padding=1),
                nn.ReLU()))
        self.stages.append(nn.Sequential(nn.MaxPool2d(2, 2)))

    def forward(self, x):
        feats = []
        for stage in self.stages:
            x = stage(x)
            feats.append(x)
        return feats


class TorchDecoder(nn.Module):
    def __init__(self, enc_chans, dec_chans, out_len, traj=False):
        super().__init__()
        if traj:
            enc_chans = [c + traj for c in enc_chans]
        enc_chans = enc_chans[::-1]
        center = enc_chans[0]
        self.center = nn.Sequential(
            nn.Conv2d(center, center * 2, 3, padding=1), nn.ReLU(),
            nn.Conv2d(center * 2, center * 2, 3, padding=1), nn.ReLU())
        up_in = [center * 2] + list(dec_chans[:-1])
        up_out = [c // 2 for c in up_in]
        self.upsample_conv = nn.ModuleList(
            [nn.Conv2d(i, o, 3, padding=1) for i, o in zip(up_in, up_out)])
        blk_in = [e + u for e, u in zip(enc_chans, up_out)]
        self.decoder = nn.ModuleList([
            nn.Sequential(nn.Conv2d(i, o, 3, padding=1), nn.ReLU(),
                          nn.Conv2d(o, o, 3, padding=1), nn.ReLU())
            for i, o in zip(blk_in, dec_chans)])
        self.predictor = nn.Conv2d(dec_chans[-1], out_len, 1)

    def forward(self, features):
        features = features[::-1]
        x = self.center(features[0])
        for f, d, up in zip(features[1:], self.decoder, self.upsample_conv):
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
            x = up(x)
            x = torch.cat([x, f], dim=1)
            x = d(x)
        return self.predictor(x)


def _copy_conv(tconv, jparams):
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(hwio_to_torch_conv(jparams["weight"])))
        if "bias" in jparams:
            tconv.bias.copy_(torch.tensor(np.asarray(jparams["bias"])))


def _load_torch_from_pytree(params, tenc, tgoal, ttraj):
    stages = params["encoder"]["stages"]
    _copy_conv(tenc.stages[0][0], stages["0"]["conv0"])
    for i in range(1, 5):
        _copy_conv(tenc.stages[i][1], stages[str(i)]["conv0"])
        _copy_conv(tenc.stages[i][3], stages[str(i)]["conv1"])
    for tdec, name in ((tgoal, "goal_decoder"), (ttraj, "traj_decoder")):
        d = params[name]
        _copy_conv(tdec.center[0], d["center"]["0"])
        _copy_conv(tdec.center[2], d["center"]["1"])
        for i in range(5):
            _copy_conv(tdec.upsample_conv[i], d["upsample"][str(i)])
            _copy_conv(tdec.decoder[i][0], d["blocks"][str(i)]["0"])
            _copy_conv(tdec.decoder[i][2], d["blocks"][str(i)]["1"])
        _copy_conv(tdec.predictor, d["predictor"])


@pytest.fixture(scope="module")
def models():
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), CFG)
    tenc = TorchEncoder(CFG.feature_channels, list(CFG.encoder_channels))
    tgoal = TorchDecoder(list(CFG.encoder_channels),
                         list(CFG.decoder_channels), CFG.pred_len)
    ttraj = TorchDecoder(list(CFG.encoder_channels),
                         list(CFG.decoder_channels), CFG.pred_len,
                         traj=CFG.n_waypoints)
    _load_torch_from_pytree(params, tenc, tgoal, ttraj)
    tenc.eval(), tgoal.eval(), ttraj.eval()
    return params, state, tenc, tgoal, ttraj


def test_full_forward_parity(models, rng):
    params, state, tenc, tgoal, ttraj = models
    B, H, W = 2, 64, 96
    scene = rng.normal(size=(B, H, W, CFG.n_semantic_classes)).astype(
        np.float32)
    motion = rng.normal(size=(B, H, W, CFG.obs_len)).astype(np.float32)

    feats, _ = jynet.pred_features(params, state, CFG,
                                   jnp.asarray(scene), jnp.asarray(motion))
    goal_map = jynet.pred_goal(params, feats)

    xt = torch.tensor(np.concatenate([scene, motion], axis=-1)
                      ).permute(0, 3, 1, 2)
    with torch.no_grad():
        tfeats = tenc(xt)
        tgoal_map = tgoal(tfeats)

    for jf, tf in zip(feats, tfeats):
        np.testing.assert_allclose(
            np.asarray(jf), tf.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(goal_map), tgoal_map.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=2e-4)

    # trajectory decoder with a waypoint channel at each scale
    wp = rng.uniform(size=(B, H, W, CFG.n_waypoints)).astype(np.float32)
    wp_pyr = avg_pool_pyramid(jnp.asarray(wp), n_levels=len(feats))
    traj_in = [jnp.concatenate([f, w], axis=-1)
               for f, w in zip(feats, wp_pyr)]
    traj_map = jynet.pred_traj(params, traj_in)

    wpt = torch.tensor(wp).permute(0, 3, 1, 2)
    wp_pyr_t = [wpt] + [nn.AvgPool2d(2**i, 2**i)(wpt)
                        for i in range(1, len(tfeats))]
    traj_in_t = [torch.cat([f, w], dim=1) for f, w in zip(tfeats, wp_pyr_t)]
    with torch.no_grad():
        ttraj_map = ttraj(traj_in_t)
    np.testing.assert_allclose(
        np.asarray(traj_map), ttraj_map.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=2e-4)


def test_bce_with_logits_parity(rng):
    from mst_tpu.train.losses import bce_with_logits

    logits = rng.normal(size=(2, 16, 16, 6)).astype(np.float32) * 3
    targets = rng.uniform(size=(2, 16, 16, 6)).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    expected = float(nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.tensor(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
