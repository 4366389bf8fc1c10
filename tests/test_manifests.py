"""Released-artifact manifests pinned against the real reference source.

mst_tpu/models/manifests.py vendors the key/shape contracts of the
reference's released checkpoints (smp 0.1.0 Unet(resnet101), loralib
0.1.1 convs, every YNet family). These tests pin the vendored YNet
manifest generator key-for-key/shape-for-shape against the ACTUAL
reference YNet class (so manifest drift fails loudly), pin the smp
manifest against the torch smp-0.1.0 mirror at full resnet101 depth,
and exercise the strict conversion mode's accept/reject behavior.
"""

import numpy as np
import pytest
import torch

from mst_tpu.models import manifests
from mst_tpu.models.convert import convert_torch_segmentation
from tests.reference_loader import load_reference
from tests.test_convert import TorchUnet

ref = load_reference()

OBS, PRED, NWP = 8, 12, 1


def _real_state_shapes(train_net, network, position, n_fusion,
                       obs_len=OBS, pred_len=PRED, n_waypoints=NWP):
    orig_get_conv2d = ref.ynet.get_conv2d
    if "semantic" in train_net:
        # latent reference bug shim (see test_reference_parity.py)
        ref.ynet.get_conv2d = lambda train_net, l, position, **kw: \
            orig_get_conv2d(train_net, l, position or [], **kw)
    try:
        tmodel = ref.ynet.YNet(
            obs_len=obs_len, pred_len=pred_len, segmentation_model_fp=None,
            n_semantic_classes=manifests.N_SEMANTIC_CLASSES,
            encoder_channels=list(manifests.ENCODER_CHANNELS),
            decoder_channels=list(manifests.DECODER_CHANNELS),
            n_waypoints=n_waypoints, train_net=train_net,
            position=list(position), network=network, n_fusion=n_fusion)
    finally:
        ref.ynet.get_conv2d = orig_get_conv2d
    return {k: tuple(v.shape) for k, v in tmodel.state_dict().items()
            if not k.startswith("semantic_segmentation")}


@pytest.mark.parametrize("train_net,position",
                         manifests.VARIANTS_ORIGINAL)
def test_ynet_manifest_matches_reference_original(train_net, position):
    want = _real_state_shapes(train_net, "original", position, None)
    got = manifests.ynet_manifest(OBS, PRED, NWP, train_net=train_net,
                                  position=position, network="original")
    assert got == want, (sorted(set(got) ^ set(want))[:8])


@pytest.mark.parametrize("train_net,position", manifests.VARIANTS_FUSION)
def test_ynet_manifest_matches_reference_fusion(train_net, position):
    want = _real_state_shapes(train_net, "fusion", position, 2)
    got = manifests.ynet_manifest(OBS, PRED, NWP, train_net=train_net,
                                  position=position, network="fusion",
                                  n_fusion=2)
    assert got == want, (sorted(set(got) ^ set(want))[:8])


def test_ynet_manifest_matches_reference_longterm_embed():
    """Long-term horizon (obs 5 / pred 30, 2 waypoints) + the embed
    network's extra scene/motion embedding convs."""
    want = _real_state_shapes("train", "embed", (), None, obs_len=5,
                              pred_len=30, n_waypoints=2)
    got = manifests.ynet_manifest(5, 30, 2, train_net="train",
                                  network="embed")
    assert got == want


def test_smp_manifest_matches_torch_mirror_resnet101():
    """The vendored smp 0.1.0 manifest == the torch mirror's state dict
    at full resnet101 depth (3,4,23,3)."""
    tmodel = TorchUnet(layers=manifests.RESNET101_LAYERS)
    want = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    got = manifests.smp_unet_resnet101_manifest()
    assert got == want, (sorted(set(got) ^ set(want))[:8])


def test_check_all_manifest_coverage():
    """Every family x variant converts with exact two-way coverage of
    the init trees (the --check-manifest CLI gate)."""
    assert manifests.check_all(verbose=False) == []


def test_strict_segmentation_conversion_accepts_and_rejects():
    manifest = manifests.smp_unet_resnet101_manifest()
    sd = manifests._zeros_state_dict(manifest)
    # classifier-head keys a non-smp export might carry are skipped
    sd["encoder.fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["encoder.fc.bias"] = np.zeros((1000,), np.float32)
    params = convert_torch_segmentation(sd, strict=True)
    assert "encoder/fc/weight" not in params

    # a missing leaf (truncated download, wrong architecture) fails loudly
    bad = dict(sd)
    bad.pop("decoder.blocks.3.conv2.0.weight")
    with pytest.raises(ValueError, match="manifest"):
        convert_torch_segmentation(bad, strict=True)

    # a wrong-shape leaf (e.g. resnet50 checkpoint) fails loudly
    bad = dict(sd)
    bad["encoder.layer3.0.conv1.weight"] = np.zeros((256, 128, 1, 1),
                                                    np.float32)
    with pytest.raises(ValueError, match="shape"):
        convert_torch_segmentation(bad, strict=True)


def test_strict_segmentation_on_real_mirror_weights():
    """The torch mirror's real (randomly initialized) state dict passes
    the strict converter — the exact call path a released .pth takes."""
    torch.manual_seed(0)
    tmodel = TorchUnet(layers=(1, 1, 1, 1))
    # depth-(1,1,1,1) is not the released architecture: strict must say no
    with pytest.raises(ValueError, match="manifest"):
        convert_torch_segmentation(
            {k: v.detach() for k, v in tmodel.state_dict().items()},
            strict=True)
