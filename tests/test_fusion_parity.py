"""Y-Net-Mod fusion encoder parity vs a torch mirror + converter check."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mst_tpu.models import ynet as jynet
from mst_tpu.models.convert import convert_torch_ynet
from mst_tpu.train.checkpoints import overlay_checkpoint

CFG = jynet.YNetConfig(
    obs_len=4, pred_len=6, n_semantic_classes=3,
    encoder_channels=(8, 8, 16, 16, 16), decoder_channels=(16, 16, 16, 8, 8),
    waypoints=(5,), train_net="train", network="fusion", n_fusion=2)


class TorchFusionEncoder(nn.Module):
    """Mirror of the reference YNetEncoderFusion (ynet.py:286-395)."""

    def __init__(self, scene_ch, motion_ch, channels, n_fusion):
        super().__init__()
        n_sep = len(channels) - n_fusion - 1
        self.scene_stages = nn.ModuleList([nn.Sequential(
            nn.Conv2d(scene_ch, channels[0] // 2, 3, padding=1), nn.ReLU())])
        self.motion_stages = nn.ModuleList([nn.Sequential(
            nn.Conv2d(motion_ch, channels[0] // 2, 3, padding=1),
            nn.ReLU())])
        for i in range(n_sep):
            for stages in (self.scene_stages, self.motion_stages):
                stages.append(nn.Sequential(
                    nn.MaxPool2d(2, 2),
                    nn.Conv2d(channels[i] // 2, channels[i + 1] // 2, 3,
                              padding=1), nn.ReLU(),
                    nn.Conv2d(channels[i + 1] // 2, channels[i + 1] // 2, 3,
                              padding=1), nn.ReLU()))
        self.fusion_stages = nn.ModuleList()
        for i in range(n_sep, len(channels) - 1):
            self.fusion_stages.append(nn.Sequential(
                nn.MaxPool2d(2, 2),
                nn.Conv2d(channels[i], channels[i + 1], 3, padding=1),
                nn.ReLU(),
                nn.Conv2d(channels[i + 1], channels[i + 1], 3, padding=1),
                nn.ReLU()))
        self.fusion_stages.append(nn.Sequential(nn.MaxPool2d(2, 2)))

    def forward(self, scene_map, motion_map):
        scene_feats, motion_feats = [], []
        x = scene_map
        for s in self.scene_stages:
            x = s(x)
            scene_feats.append(x)
        x = motion_map
        for s in self.motion_stages:
            x = s(x)
            motion_feats.append(x)
        feats = [torch.cat([a, b], dim=1)
                 for a, b in zip(scene_feats, motion_feats)]
        x = feats[-1]
        for s in self.fusion_stages:
            x = s(x)
            feats.append(x)
        return feats


class TorchContainer(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TorchFusionEncoder(
            CFG.n_semantic_classes, CFG.obs_len, list(CFG.encoder_channels),
            CFG.n_fusion)


def test_fusion_encoder_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchContainer().eval()
    flat, _ = convert_torch_ynet(
        {k: v.detach() for k, v in tmodel.state_dict().items()})
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), CFG)
    # converter only has encoder weights here; decoders keep their init
    params = overlay_checkpoint(params, flat)

    B, H, W = 2, 32, 64
    scene = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    motion = rng.normal(size=(B, H, W, CFG.obs_len)).astype(np.float32)
    feats, _ = jynet.pred_features(params, state, CFG, jnp.asarray(scene),
                                   jnp.asarray(motion))
    with torch.no_grad():
        tfeats = tmodel.encoder(torch.tensor(scene).permute(0, 3, 1, 2),
                                torch.tensor(motion).permute(0, 3, 1, 2))
    assert len(feats) == len(tfeats) == len(CFG.encoder_channels) + 1
    for i, (jf, tf) in enumerate(zip(feats, tfeats)):
        np.testing.assert_allclose(
            np.asarray(jf), tf.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"feature {i}")
