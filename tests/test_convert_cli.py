"""CLI rehearsal of the released-bundle conversion path.

The real segmentation artifact is a pickled FULL smp module — the
reference loads it with ``torch.load(segmentation_model_fp)``
(reference models/ynet.py:495-507) — and the real Y-Net artifacts are
``torch.save``d state dicts plus adapter-only delta dicts (reference
models/trainer.py:594-604). These tests run ``python -m
mst_tpu.models.convert`` as a SUBPROCESS on fixtures pickled exactly
like those artifacts, so the CLI's full-module branch
(``torch.load(...).state_dict()``), the strict smp-manifest gate, the
npz write, and the separated base->delta restore all execute together
— the dress rehearsal for the day the real bundle is available.
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mst_tpu.models import unet as junet
from mst_tpu.models import ynet as jynet
from mst_tpu.train.checkpoints import load_separated, unflatten_dict
from tests.test_convert import CFG, TorchUnet, TorchYNetContainer

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run_convert(args, cwd):
    env = os.environ.copy()
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "mst_tpu.models.convert", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600)


@pytest.mark.slow
def test_segmentation_pickled_full_module_cli(tmp_path, rng):
    """A pickled FULL Unet module at real resnet101 scale goes through the
    CLI's torch.load -> .state_dict() branch AND the strict smp 0.1.0
    manifest gate, and the converted tree forward-matches the torch
    module."""
    torch.manual_seed(0)
    layers = (3, 4, 23, 3)  # resnet101 — the released artifact's scale
    tmodel = TorchUnet(layers=layers, classes=6).eval()
    with torch.no_grad():  # exercised eval-mode BN normalization
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)
    src = tmp_path / "sdd_segmentation.pth"
    torch.save(tmodel, src)  # FULL pickled module, like the real bundle

    dst = tmp_path / "sdd_segmentation.npz"
    res = _run_convert(["segmentation", str(src), str(dst),
                        "--activation", "none"], tmp_path)
    assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
    assert "converted" in res.stdout

    params = unflatten_dict(dict(np.load(dst)))
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = junet.unet_apply(params, jnp.asarray(x), layers=layers)
    with torch.no_grad():
        want = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_segmentation_cli_strict_gate_rejects_wrong_shapes(tmp_path):
    """The strict manifest gate is live in the CLI path: an artifact with
    non-resnet101 shapes is refused with a readable diff, not silently
    converted."""
    tiny = TorchUnet(layers=(1, 1, 1, 1), classes=6).eval()
    src = tmp_path / "bad_segmentation.pth"
    torch.save(tiny, src)
    res = _run_convert(["segmentation", str(src),
                        str(tmp_path / "bad.npz")], tmp_path)
    assert res.returncode != 0
    assert "does not match the smp 0.1.0" in (res.stdout + res.stderr)
    # and --no-strict is the documented escape hatch for variants
    res = _run_convert(["segmentation", str(src),
                        str(tmp_path / "bad.npz"), "--no-strict"], tmp_path)
    assert res.returncode == 0, res.stderr


def test_ynet_base_plus_delta_cli(tmp_path, rng):
    """A full Y-Net state-dict .pt plus a loralib adapter-only delta .pt
    (the reference's separated-checkpoint pair) convert through the
    `ynet` subcommand, restore via the base->delta overlay, and the
    runtime LoRA path matches torch's merged-weight forward."""
    torch.manual_seed(1)
    tmodel = TorchYNetContainer(CFG).eval()
    base_pt = tmp_path / "Seed_1__base__train__original.pt"
    torch.save({k: v.detach() for k, v in tmodel.state_dict().items()},
               base_pt)

    # loralib delta: only lora_A/lora_B of the stem conv (reference names)
    cfg = jynet.YNetConfig(
        obs_len=CFG.obs_len, pred_len=CFG.pred_len,
        n_semantic_classes=CFG.n_semantic_classes,
        encoder_channels=CFG.encoder_channels,
        decoder_channels=CFG.decoder_channels, waypoints=CFG.waypoints,
        train_net="mosa_2", position=("0",), network="original")
    rank, k, cin = 2, 3, cfg.feature_channels
    cout = cfg.encoder_channels[0]
    g = np.random.default_rng(7)
    lora_A = torch.tensor(
        g.normal(size=(rank * k, cin * k)).astype(np.float32))
    lora_B = torch.tensor(
        g.normal(size=(cout * k, rank * k)).astype(np.float32))
    delta_pt = tmp_path / "Seed_1__delta__mosa_2__Pos_0.pt"
    torch.save({"encoder.stages.0.0.lora_A": lora_A,
                "encoder.stages.0.0.lora_B": lora_B}, delta_pt)

    for src in (base_pt, delta_pt):
        res = _run_convert(
            ["ynet", str(src), str(src.with_suffix(".npz"))], tmp_path)
        assert res.returncode == 0, res.stderr
    delta_keys = list(np.load(delta_pt.with_suffix(".npz")).keys())
    assert delta_keys == ["encoder/stages/0/conv0/lora_A",
                          "encoder/stages/0/conv0/lora_B"]

    params, jstate = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    params = load_separated(params, str(base_pt.with_suffix(".npz")),
                            str(delta_pt.with_suffix(".npz")))

    B, H, W = 2, 32, 64
    scene = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    motion = rng.normal(size=(B, H, W, CFG.obs_len)).astype(np.float32)
    feats, _ = jynet.pred_features(params, jstate, cfg, jnp.asarray(scene),
                                   jnp.asarray(motion))
    got = jynet.pred_goal(params, feats)

    # torch oracle: loralib's merged weight W + (B@A).view(...)/r on the
    # stem conv, then the plain reference forward
    with torch.no_grad():
        tmodel.encoder.stages[0][0].weight += (
            (lora_B @ lora_A).view(cout, cin, k, k) / rank)
        tfeats = tmodel.encoder(
            torch.tensor(np.concatenate([scene, motion], -1)
                         ).permute(0, 3, 1, 2))
        want = tmodel.goal_decoder(tfeats)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)
