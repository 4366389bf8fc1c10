"""Fused multi-epoch training (--fused, train/fused.py) == the epoch loop.

The fused path runs whole chunks of the fine-tune loop (train steps +
validation) as ONE compiled program; these tests pin that its batch order,
validation keys, metrics, smooth-val/early-stop selection and checkpoints
are the loop path's to fp-reassociation tolerance, on one device and under
a mesh, and that ineligible runs fall back to the loop.
"""

import numpy as np
import pytest

import jax

from mst_tpu import config as config_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.train import fused as fused_lib
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12
OBS_LEN = 4


def make_params(tmp_path, **over):
    params = config_lib.get_params(overrides=dict(
        obs_len=OBS_LEN, pred_len=TOTAL_LEN - OBS_LEN, waypoints=[7],
        n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=5, n_traj=1, batch_size=4, lr=3e-4, n_epoch=4,
        dataset_name="sdd", ckpt_path=str(tmp_path), train_net="train",
        network="original", n_round=1, seed=1, shuffle=False,
        save_every_n=100, segmentation_model_fp=None,
    ))
    params.update(over)
    return params


@pytest.fixture(scope="module")
def dataset():
    df, images = make_synthetic_dataset(
        seed=0, n_scenes=2, n_traj=8, total_len=TOTAL_LEN,
        img_hw=(96, 128))
    ids = df.metaId.unique()
    n = len(ids)
    df_train = df[df.metaId.isin(ids[:n - 6])]
    df_val = df[df.metaId.isin(ids[n - 6:n - 3])]
    return df_train, df_val, images


def _run(tmp_path, dataset, tag, **over):
    df_train, df_val, images = dataset
    exp = Experiment(make_params(tmp_path, **over), images=images)
    va, vf = exp.train(df_train, df_val, None, None, tag)
    return (np.asarray(va), np.asarray(vf),
            jax.device_get(exp.model_params))


def _assert_run_matches(a, b, tol=5e-4):
    va_a, vf_a, p_a = a
    va_b, vf_b, p_b = b
    assert len(va_a) == len(va_b)  # same epochs ran (same early stop)
    np.testing.assert_allclose(va_a, va_b, rtol=tol, atol=tol)
    np.testing.assert_allclose(vf_a, vf_b, rtol=tol, atol=tol)
    for la, lb in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=tol, atol=tol)


def test_chunk_size():
    assert fused_lib.chunk_size(10) == 10
    assert fused_lib.chunk_size(100) == 25  # divisor of 100 under the cap
    assert fused_lib.chunk_size(37) == 1   # prime above the cap
    assert fused_lib.chunk_size(32) == 32
    assert fused_lib.chunk_size(0) == 1


def test_fused_matches_loop(tmp_path, dataset):
    loop = _run(tmp_path / "loop", dataset, "loop")
    fused = _run(tmp_path / "fused", dataset, "fused", fused=True)
    _assert_run_matches(loop, fused)


def test_fused_smooth_val_early_stop_parity(tmp_path, dataset):
    """smooth-val window selection + fine-tune early stop decide the same
    epochs in both paths (the fused path rolls back to the stop epoch)."""
    over = dict(fine_tune=True, smooth_val=True, window_size=3,
                n_early_stop=1, n_epoch=8, save_every_n=2, lr=1e-3)
    loop = _run(tmp_path / "loop", dataset, "es_loop", **over)
    fused = _run(tmp_path / "fused", dataset, "es_fused", fused=True,
                 **over)
    _assert_run_matches(loop, fused)
    # both wrote the same periodic train-state checkpoints (chunk size
    # divides save_every_n, so saves land on chunk boundaries)
    assert (tmp_path / "fused" / "es_fused__train_state.npz").exists()


def test_fused_under_mesh_matches_single_device(tmp_path, dataset):
    from mst_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    df_train, df_val, images = dataset
    single = _run(tmp_path / "single", dataset, "mesh_single", fused=True)
    exp = Experiment(make_params(tmp_path / "mesh", fused=True),
                     mesh=mesh_lib.make_mesh((4,)), images=images)
    va, vf = exp.train(df_train, df_val, None, None, "mesh_fused")
    _assert_run_matches(
        single, (np.asarray(va), np.asarray(vf),
                 jax.device_get(exp.model_params)))


def test_fused_falls_back_when_ineligible(tmp_path, capsys):
    """Scenes in different (H, W) shape buckets cannot stack into one
    program; --fused must fall back to the loop, not fail."""
    # (96,128) and (256,320) land in different /32-padded shape buckets at
    # resize 0.25 — (32,32) vs (64,96) — so the batches cannot stack
    df_a, images_a = make_synthetic_dataset(
        seed=0, n_scenes=1, n_traj=6, total_len=TOTAL_LEN,
        img_hw=(96, 128))
    df_b, images_b = make_synthetic_dataset(
        seed=1, n_scenes=1, n_traj=6, total_len=TOTAL_LEN,
        img_hw=(256, 320))
    df_b = df_b.copy()
    df_b["sceneId"] = df_b["sceneId"] + "_b"
    df_b["metaId"] = df_b["metaId"] + df_a["metaId"].max() + 1
    images = dict(images_a)
    images.update({k + "_b": v for k, v in images_b.items()})
    import pandas as pd

    df = pd.concat([df_a, df_b], ignore_index=True)
    ids = df.metaId.unique()
    df_train = df[df.metaId.isin(ids[:-4])]
    df_val = df[df.metaId.isin(ids[-4:])]

    exp = Experiment(make_params(tmp_path, fused=True, n_epoch=1),
                     images=images)
    va, _ = exp.train(df_train, df_val, None, None, "fallback")
    assert "--fused unavailable" in capsys.readouterr().out
    assert len(va) == 1 and np.isfinite(va).all()


def test_fused_resume_matches_uninterrupted(tmp_path, dataset):
    """Kill-and-resume in fused mode reproduces the uninterrupted fused
    run (the rng.shuffle fast-forward and chunk restart line up)."""
    df_train, df_val, images = dataset
    over = dict(fused=True, save_every_n=2, n_epoch=4)

    full = _run(tmp_path / "full", dataset, "resume_test", **over)

    part_params = make_params(tmp_path / "part", **dict(over, n_epoch=2))
    exp = Experiment(part_params, images=images)
    exp.train(df_train, df_val, None, None, "resume_test")
    resumed_params = make_params(tmp_path / "part",
                                 **dict(over, resume=True))
    exp2 = Experiment(resumed_params, images=images)
    va, vf = exp2.train(df_train, df_val, None, None, "resume_test")
    _assert_run_matches(
        full, (np.asarray(va), np.asarray(vf),
               jax.device_get(exp2.model_params)))
