"""Mixed-precision (--compute_dtype bfloat16) correctness.

bf16 runs the conv path at the TPU MXU's 2x rate; master weights, loss, BCE
and softargmax stay f32 (train/steps.py). These tests pin the numerics: the
bf16 programs must track the f32 programs to a documented tolerance, and the
compute really has to happen in bf16 (not silently promoted back).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mst_tpu import config as config_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.train import steps as steps_lib
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12
OBS_LEN = 4


def make_params(tmp_path, **over):
    params = config_lib.get_params(overrides=dict(
        obs_len=OBS_LEN, pred_len=TOTAL_LEN - OBS_LEN, waypoints=[7],
        n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=5, n_traj=1, batch_size=4, lr=3e-4, n_epoch=1,
        dataset_name="sdd", ckpt_path=str(tmp_path), train_net="train",
        network="original", n_round=1, seed=1, shuffle=False,
        save_every_n=100, segmentation_model_fp=None,
    ))
    params.update(over)
    return params


@pytest.fixture(scope="module")
def dataset():
    df, images = make_synthetic_dataset(
        seed=0, n_scenes=2, n_traj=8, total_len=TOTAL_LEN, img_hw=(240, 320))
    ids = df.metaId.unique()
    return df[df.metaId.isin(ids[:10])], df[df.metaId.isin(ids[10:])], images


def test_compute_params_casts_floats_only():
    params = {"conv": {"weight": jnp.ones((3, 3, 4, 8), jnp.float32),
                       "steps": jnp.asarray(3, jnp.int32)}}
    scfg_bf16 = steps_lib.StepConfig(
        obs_len=4, pred_len=8, waypoints=(7,), template_size=100, kernlen=31,
        nsig=4.0, loss_scale=1000.0, resize_factor=0.25, temperature=1.0,
        n_goal=5, n_traj=1, compute_dtype=jnp.bfloat16)
    cast = steps_lib._compute_params(params, scfg_bf16)
    assert cast["conv"]["weight"].dtype == jnp.bfloat16
    assert cast["conv"]["steps"].dtype == jnp.int32
    # f32 is the identity (no tree copy)
    scfg_f32 = scfg_bf16._replace(compute_dtype=jnp.float32)
    assert steps_lib._compute_params(params, scfg_f32) is params


@pytest.mark.parametrize("mode", ["eval", "train"])
def test_bf16_matches_f32(tmp_path, dataset, mode):
    """bf16 eval ADE/FDE and train loss track the f32 run.

    Tolerance: bf16 has ~3 decimal digits; after f32 loss/softargmax the
    end metrics land within ~2% on this synthetic scene.
    """
    df_train, df_test, images = dataset
    results = {}
    for dtype in ("float32", "bfloat16"):
        params = make_params(tmp_path, compute_dtype=dtype)
        exp = Experiment(params, images=images)
        if mode == "eval":
            ade, fde, _, _ = exp.test(df_test, None)
            results[dtype] = (ade, fde)
        else:
            val_ade, val_fde = exp.train(df_train, df_test, None, None,
                                         f"bf16_{dtype}")
            results[dtype] = (val_ade[-1], val_fde[-1])
    f32, bf16 = results["float32"], results["bfloat16"]
    assert np.isfinite(bf16).all()
    np.testing.assert_allclose(bf16, f32, rtol=0.02)


def test_bf16_features_really_bf16(tmp_path, dataset):
    """The encoder output of the eval forward must be bf16 — a silent
    promotion back to f32 would forfeit the MXU rate win."""
    _, df_test, images = dataset
    params = make_params(tmp_path, compute_dtype="bfloat16")
    exp = Experiment(params, images=images)
    batches = exp.prepare_data(df_test, None, "val")
    batch = batches[0]
    semantic = exp._semantic_for(batch, {})
    db = exp._device_batch(batch, semantic)
    scfg = exp._step_config()
    assert scfg.compute_dtype == jnp.bfloat16

    mparams = steps_lib._compute_params(exp.model_params, scfg)
    sem, obs, _ = steps_lib._prepare_inputs(
        exp.mcfg, scfg, mparams, db["semantic"], db["traj"], train=False)
    assert sem.dtype == jnp.bfloat16 and obs.dtype == jnp.bfloat16
    from mst_tpu.models import ynet as ynet_lib
    feats, _ = ynet_lib.pred_features(mparams, exp.model_state, exp.mcfg,
                                      sem, obs, train=False)
    assert all(f.dtype == jnp.bfloat16 for f in feats), \
        [f.dtype for f in feats]
