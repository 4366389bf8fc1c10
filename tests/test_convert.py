"""Checkpoint-conversion parity: reference-named torch state dicts ->
mst_tpu pytrees -> identical forward outputs."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mst_tpu.models import unet as junet
from mst_tpu.models import ynet as jynet
from mst_tpu.models.convert import (
    convert_torch_segmentation,
    convert_torch_ynet,
)
from mst_tpu.train.checkpoints import overlay_checkpoint, unflatten_dict
from tests.test_torch_parity import TorchDecoder, TorchEncoder


class TorchYNetContainer(nn.Module):
    """Wrapper producing reference-style state-dict names
    (encoder.stages..., goal_decoder.center..., ynet.py structure)."""

    def __init__(self, cfg):
        super().__init__()
        self.encoder = TorchEncoder(cfg.feature_channels,
                                    list(cfg.encoder_channels))
        self.goal_decoder = TorchDecoder(list(cfg.encoder_channels),
                                         list(cfg.decoder_channels),
                                         cfg.pred_len)
        self.traj_decoder = TorchDecoder(list(cfg.encoder_channels),
                                         list(cfg.decoder_channels),
                                         cfg.pred_len, traj=cfg.n_waypoints)


CFG = jynet.YNetConfig(
    obs_len=3, pred_len=4, n_semantic_classes=3,
    encoder_channels=(8, 8, 16, 16, 16), decoder_channels=(16, 16, 16, 8, 8),
    waypoints=(2,), train_net="train", network="original")


def test_ynet_state_dict_conversion(rng):
    torch.manual_seed(0)
    tmodel = TorchYNetContainer(CFG).eval()
    flat, state = convert_torch_ynet(
        {k: v.detach() for k, v in tmodel.state_dict().items()})

    params, jstate = jynet.init_ynet(jax.random.PRNGKey(0), CFG)
    params = overlay_checkpoint(params, flat, strict=True)

    B, H, W = 2, 32, 64
    scene = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    motion = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    feats, _ = jynet.pred_features(params, jstate, CFG, jnp.asarray(scene),
                                   jnp.asarray(motion))
    goal = jynet.pred_goal(params, feats)
    with torch.no_grad():
        tfeats = tmodel.encoder(
            torch.tensor(np.concatenate([scene, motion], -1)
                         ).permute(0, 3, 1, 2))
        tgoal = tmodel.goal_decoder(tfeats)
    np.testing.assert_allclose(np.asarray(goal),
                               tgoal.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# segmentation backbone: torch mirror of smp Unet(resnet) on a tiny variant
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(y + idt)


class TorchResNetEncoder(nn.Module):
    def __init__(self, layers=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for li, (w, n) in enumerate(zip((64, 128, 256, 512), layers),
                                    start=1):
            blocks = []
            for b in range(n):
                stride = 2 if (li > 1 and b == 0) else 1
                blocks.append(Bottleneck(cin, w, stride))
                cin = w * 4
            setattr(self, f"layer{li}", nn.Sequential(*blocks))

    def forward(self, x):
        feats = [x]
        y = F.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = self.maxpool(y)
        for li in range(1, 5):
            y = getattr(self, f"layer{li}")(y)
            feats.append(y)
        return feats


class TorchDecoderBlock(nn.Module):
    def __init__(self, cin, cskip, cout):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(cin + cskip, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU())
        self.conv2 = nn.Sequential(
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, x, skip):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class TorchUnet(nn.Module):
    def __init__(self, layers=(1, 1, 1, 1),
                 decoder_channels=(256, 128, 64, 32, 16), classes=6):
        super().__init__()
        self.encoder = TorchResNetEncoder(layers)
        enc = [3, 64, 256, 512, 1024, 2048][::-1]
        in_ch = [enc[0]] + list(decoder_channels[:-1])
        skip_ch = enc[1:][:len(decoder_channels) - 1] + [0]
        blocks = [TorchDecoderBlock(ci, cs, co)
                  for ci, cs, co in zip(in_ch, skip_ch, decoder_channels)]
        self.decoder = nn.Module()
        self.decoder.blocks = nn.ModuleList(blocks)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(decoder_channels[-1], classes, 3, padding=1))

    def forward(self, x):
        feats = self.encoder(x)[::-1]
        y = feats[0]
        skips = feats[1:]
        for i, blk in enumerate(self.decoder.blocks):
            skip = skips[i] if i < len(skips) - 1 else None
            y = blk(y, skip)
        return self.segmentation_head(y)


def test_segmentation_conversion(rng):
    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    tmodel = TorchUnet(layers).eval()
    # randomize BN running stats so eval-mode normalization is exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)
    flat = convert_torch_segmentation(
        {k: v.detach() for k, v in tmodel.state_dict().items()},
        activation="none")
    params = unflatten_dict(flat)

    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = junet.unet_apply(params, jnp.asarray(x), layers=layers)
    with torch.no_grad():
        want = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)


def test_segmentation_softmax_activation(rng):
    layers = (1, 1, 1, 1)
    tmodel = TorchUnet(layers).eval()
    flat = convert_torch_segmentation(
        {k: v.detach() for k, v in tmodel.state_dict().items()},
        activation="softmax")
    params = unflatten_dict(flat)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    out = np.asarray(junet.unet_apply(params, jnp.asarray(x), layers=layers))
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)


def test_lora_delta_conversion():
    """loralib-style delta dict (lora_A/lora_B only) overlays correctly and
    reproduces torch's merged-weight formula."""
    cfg = jynet.YNetConfig(
        obs_len=3, pred_len=4, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(2,),
        train_net="mosa_2", position=("0",), network="original")
    params, _ = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    rank, k, cin, cout = 2, 3, cfg.feature_channels, 8
    rng = np.random.default_rng(3)
    lora_A = rng.normal(size=(rank * k, cin * k)).astype(np.float32)
    lora_B = rng.normal(size=(cout * k, rank * k)).astype(np.float32)
    delta = {"encoder/stages/0/conv0/lora_A": lora_A,
             "encoder/stages/0/conv0/lora_B": lora_B}
    params = overlay_checkpoint(params, delta)

    from mst_tpu.models.layers import lora_merged_weight
    merged = lora_merged_weight(params["encoder"]["stages"]["0"]["conv0"],
                                rank)
    want = (torch.tensor(lora_B) @ torch.tensor(lora_A)).view(
        cout, cin, k, k).numpy() / rank
    base = np.asarray(params["encoder"]["stages"]["0"]["conv0"]["weight"])
    np.testing.assert_allclose(
        np.asarray(merged) - base,
        np.transpose(want, (2, 3, 1, 0)), rtol=1e-5, atol=1e-6)
