"""Serving/export path: steps.make_predict_step + mst_tpu.serve artifacts.

The reference has no deployment surface (its eval needs ground truth,
utils/evaluate.py:37-315); these tests pin that our exported StableHLO
artifacts (jax.export) reproduce the in-process eval pipeline exactly.
"""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest

from mst_tpu import config as config_lib
from mst_tpu import serve
from mst_tpu.train import steps as steps_lib
from mst_tpu.train.trainer import Experiment

OBS_LEN = 4
PRED_LEN = 8
H, W = 64, 96
B = 4


def make_params(tmp_path, **over):
    params = config_lib.get_params(overrides=dict(
        obs_len=OBS_LEN, pred_len=PRED_LEN, waypoints=[PRED_LEN - 1],
        n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=5, n_traj=1, batch_size=B, dataset_name="sdd",
        ckpt_path=str(tmp_path), train_net="train", network="original",
        seed=1, segmentation_model_fp=None,
    ))
    params.update(over)
    return params


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    params = make_params(tmp)
    return Experiment(params)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    semantic = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    observed = rng.uniform(10, 50, size=(B, OBS_LEN, 2)).astype(np.float32)
    return semantic, observed


def test_predict_step_matches_eval_decode(model):
    """predict == forward+decode of the eval step on a gt-padded batch."""
    scfg = model._step_config()
    predict = steps_lib.make_predict_step(model.mcfg, scfg)
    es = steps_lib.make_eval_step(model.mcfg, scfg)
    semantic, observed = _inputs()
    key = jax.random.PRNGKey(3)

    out = predict(model.model_params, model.model_state, semantic,
                  observed, key)
    K = int(model.params["n_goal"]) * int(model.params["n_traj"])
    assert out["trajectories"].shape == (K, B, PRED_LEN, 2)
    assert out["waypoints"].shape == (K, B, 1, 2)
    assert np.isfinite(np.asarray(out["trajectories"])).all()

    # oracle: run the eval two-program path by hand on the padded batch
    traj = np.concatenate(
        [observed, np.zeros((B, PRED_LEN, 2), np.float32)], axis=1)
    feats, wps = es.forward(model.model_params, model.model_state,
                            {"semantic": semantic, "traj": traj}, key)
    trajs = es.decode_trajs(model.model_params, feats, wps)
    rf = float(model.params["resize_factor"])
    np.testing.assert_allclose(np.asarray(out["trajectories"]),
                               np.asarray(trajs) / rf, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["waypoints"]),
                               np.asarray(wps) / rf, rtol=1e-6, atol=1e-6)


def test_export_roundtrip(model, tmp_path):
    """Exported artifacts reproduce the in-process predict bit-for-bit."""
    manifest = serve.export_model(model, tmp_path / "m", H, W, B,
                                  platforms=("cpu",))
    assert manifest["semantic_shape"] == [1, H, W, 3]
    # all artifact files exist and are non-trivial
    for f in manifest["files"].values():
        assert (tmp_path / "m" / f).stat().st_size > 0
    assert (tmp_path / "m" / "manifest.json").exists()

    loaded = serve.load_model(tmp_path / "m")
    semantic, observed = _inputs(7)
    key = jax.random.PRNGKey(11)
    got = loaded.predict(semantic, observed, key=key)

    scfg = model._step_config()
    predict = steps_lib.make_predict_step(model.mcfg, scfg)
    want = predict(model.model_params, model.model_state, semantic,
                   observed, key)
    np.testing.assert_allclose(got["trajectories"],
                               np.asarray(want["trajectories"]),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(got["waypoints"],
                               np.asarray(want["waypoints"]),
                               rtol=1e-6, atol=1e-6)


def test_export_rejects_unpadded_shape(model, tmp_path):
    with pytest.raises(ValueError, match="multiples"):
        serve.export_model(model, tmp_path / "bad", 60, 96, B,
                           platforms=("cpu",))


def test_export_multiplatform_lowering(model, tmp_path):
    """cpu+tpu multi-platform export lowers without TPU hardware attached
    (platform-parameterized StableHLO) and still runs on cpu."""
    serve.export_model(model, tmp_path / "mp", H, W, B,
                       platforms=("cpu", "tpu"))
    loaded = serve.load_model(tmp_path / "mp")
    assert loaded.manifest["platforms"] == ["cpu", "tpu"]
    semantic, observed = _inputs(1)
    out = loaded.predict(semantic, observed, seed=5)
    assert np.isfinite(out["trajectories"]).all()


def test_serve_cli(model, tmp_path):
    """export + check subcommands end-to-end through the CLI."""
    import yaml

    ckpt = tmp_path / "ckpt.npz"
    model.save_params(str(ckpt))
    cfg = dict(make_params(tmp_path))
    cfg_path = tmp_path / "serve_cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: v for k, v in cfg.items()
                        if not callable(v)}, f)
    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    out_dir = tmp_path / "cli_model"
    r = subprocess.run(
        [sys.executable, "-m", "mst_tpu.serve", "export",
         "--config_filename", str(cfg_path),
         "--pretrained_ckpt", str(ckpt),
         "--out_dir", str(out_dir),
         "--height", str(H), "--width", str(W),
         "--batch_size", str(B), "--platforms", "cpu"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "exported to" in r.stdout

    r = subprocess.run(
        [sys.executable, "-m", "mst_tpu.serve", "check",
         "--model_dir", str(out_dir), "--bench", "3"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "predict ok" in r.stdout
    assert '"serving_latency_ms"' in r.stdout
    with open(out_dir / "manifest.json") as f:
        m = json.load(f)
    assert m["format"] == "mst_tpu.serve/1"


def test_loader_is_standalone(model, tmp_path):
    """LoadedModel's claim: jax + numpy only, no mst_tpu model/train code.

    A subprocess installs an import hook that forbids every mst_tpu
    subpackage except mst_tpu.serve itself, then loads + predicts."""
    import os

    serve.export_model(model, tmp_path / "m", H, W, B, platforms=("cpu",))
    semantic, observed = _inputs(3)
    np.save(tmp_path / "semantic.npy", semantic)
    np.save(tmp_path / "observed.npy", observed)
    prog = """
import sys
FORBIDDEN = ("mst_tpu.train", "mst_tpu.models", "mst_tpu.ops",
             "mst_tpu.data", "mst_tpu.config", "mst_tpu.evaluator",
             "mst_tpu.parallel", "mst_tpu.utils")

class Guard:
    def find_spec(self, name, path=None, target=None):
        if name.startswith(FORBIDDEN):
            raise ImportError(f"forbidden in a standalone deployment: {name}")
        return None

sys.meta_path.insert(0, Guard())
import numpy as np
from mst_tpu.serve import load_model
model = load_model(sys.argv[1])
out = model.predict(np.load(sys.argv[2]), np.load(sys.argv[3]), seed=0)
print("shapes", out["trajectories"].shape, out["waypoints"].shape)
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", prog, str(tmp_path / "m"),
         str(tmp_path / "semantic.npy"), str(tmp_path / "observed.npy")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "shapes" in r.stdout


def test_multi_style_serving(tmp_path):
    """One exported program serves many motion styles: LoRA deltas overlay
    the base params (reference delta ckpts, trainer.py:599-604); untouched
    subtrees are shared by reference."""
    params = make_params(tmp_path, train_net="mosa_2",
                         position=["0", "1", "2", "3", "4"])
    base = Experiment(params)
    serve.export_model(base, tmp_path / "m", H, W, B, platforms=("cpu",))

    # a "tuned" style: perturbed LoRA factors, saved as a delta-only npz
    tuned = Experiment(make_params(tmp_path, train_net="mosa_2",
                                   position=["0", "1", "2", "3", "4"],
                                   seed=7))
    tuned.model_params = jax.tree.map(lambda x: x, base.model_params)
    mask = tuned._trainable_mask()
    tuned.model_params = jax.tree.map(
        lambda x, m: x + 0.05 if m else x, tuned.model_params, mask)
    delta_path = tmp_path / "style_biker.npz"
    tuned.save_params(str(delta_path))
    import numpy as _np
    delta_keys = _np.load(delta_path)
    assert all("lora" in k for k in delta_keys.files)

    loaded = serve.load_model(tmp_path / "m")
    loaded.add_style("biker", delta_path)
    assert loaded.styles == ["biker"]

    semantic, observed = _inputs(5)
    key = jax.random.PRNGKey(3)
    out_base = loaded.predict(semantic, observed, key=key)
    out_style = loaded.predict(semantic, observed, key=key, style="biker")
    # the style changes the function...
    assert not np.allclose(out_base["trajectories"],
                           out_style["trajectories"])
    # ...and matches the in-process predict with the tuned params
    scfg = tuned._step_config()
    predict = steps_lib.make_predict_step(tuned.mcfg, scfg)
    want = predict(tuned.model_params, tuned.model_state, semantic,
                   observed, key)
    np.testing.assert_allclose(out_style["trajectories"],
                               np.asarray(want["trajectories"]),
                               rtol=1e-6, atol=1e-5)

    # frozen subtrees are SHARED by reference, only delta paths copied
    style_params = loaded._styles["biker"]
    assert style_params["encoder"] is not loaded.params["encoder"]
    flat_base = {k: v for k, v in _np.load(
        tmp_path / "m" / "params.npz").items()}
    n_shared = 0
    def walk(a, b):
        nonlocal n_shared
        for k in a:
            if isinstance(a[k], dict):
                walk(a[k], b[k])
            elif a[k] is b[k]:
                n_shared += 1
    walk(loaded.params, style_params)
    assert n_shared == len(flat_base) - len(delta_keys.files)

    # strict overlay: unknown keys and shape mismatches are rejected
    with pytest.raises(KeyError):
        serve._overlay(loaded.params, {"nope/missing": np.zeros(3)})
