"""Cross-scene shape-bucketed batching (data/scenes.py:BucketedBatch).

The reference's DataLoader(batch_size=1) pins every batch to one scene
(utils/dataloader.py:8-50, models/trainer.py:574-576); the TPU-native
bucketed path fills B across scenes sharing a padded (H, W). These tests
pin (a) the batch structure, (b) exact loss/gradient parity with the
per-scene path at identical parameters, and (c) the trainer integration
behind --cross_scene_batching.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mst_tpu import config as config_lib
from mst_tpu.data import scenes as scenes_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.models import ynet as ynet_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12
OBS_LEN = 4


@pytest.fixture(scope="module")
def world():
    df, images = make_synthetic_dataset(
        seed=5, n_scenes=3, n_traj=5, total_len=TOTAL_LEN,
        img_hw=(96, 128))
    return df, {k: np.asarray(v) for k, v in images.items()}


class TestBatchStructure:
    def test_fills_batches_across_scenes(self, world):
        df, images = world
        # 3 scenes x 5 trajs, B=4: per-scene batching pads 3 batches of 5->8
        # (ceil(5/4)*3 = 6 batches); bucketed: ceil(15/4) = 4 batches
        per_scene = scenes_lib.make_scene_batches(
            df, images, TOTAL_LEN, 4, 0.25)
        bucketed = scenes_lib.make_bucketed_batches(
            df, images, TOTAL_LEN, 4, 0.25)
        assert len(per_scene) == 6
        assert len(bucketed) == 4
        # only the final batch may carry padding
        assert all(b.mask.all() for b in bucketed[:-1])
        assert sum(b.mask.sum() for b in bucketed) == 15

    def test_rows_match_their_scene(self, world):
        df, images = world
        meta_to_scene = dict(df.groupby("metaId").sceneId.first())
        for b in scenes_lib.make_bucketed_batches(
                df, images, TOTAL_LEN, 4, 0.25, shuffle=True,
                rng=np.random.default_rng(0)):
            for row in range(len(b.mask)):
                if not b.mask[row]:
                    continue
                assert b.scene_ids[b.scene_idx[row]] == \
                    meta_to_scene[b.meta_ids[row]]
                np.testing.assert_array_equal(
                    b.images[b.scene_idx[row]],
                    images[b.scene_ids[b.scene_idx[row]]])

    def test_shape_buckets_never_mix(self, world):
        df, images = world
        images = dict(images)
        # give one scene a different padded shape
        images["synth_2"] = np.zeros((128, 160, 3), np.float32)
        for b in scenes_lib.make_bucketed_batches(
                df, images, TOTAL_LEN, 4, 0.25):
            shapes = {images[s].shape for s in b.scene_ids}
            assert len(shapes) == 1

    def test_max_scenes_per_batch(self, world):
        df, images = world
        batches = scenes_lib.make_bucketed_batches(
            df, images, TOTAL_LEN, 4, 0.25, max_scenes_per_batch=2)
        assert all(len(b.scene_ids) <= 2 for b in batches)
        assert sum(b.mask.sum() for b in batches) == 15


def _setup_step(world):
    df, images = world
    params_dict = config_lib.get_params(overrides=dict(
        obs_len=OBS_LEN, pred_len=TOTAL_LEN - OBS_LEN, waypoints=[7],
        n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=4, n_traj=1, train_net="train", position=[],
        segmentation_model_fp=None))
    mcfg = config_lib.ynet_config(params_dict)
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=OBS_LEN, pred_len=TOTAL_LEN - OBS_LEN, waypoints=(7,),
        template_size=128, kernlen=31, nsig=4.0, loss_scale=1000.0,
        resize_factor=0.25, temperature=1.0, n_goal=4, n_traj=1)
    mask = freeze_lib.trainable_mask(params, "train", [])
    trainable, frozen = freeze_lib.split_params(params, mask)
    return mcfg, scfg, trainable, frozen, state


def test_loss_and_grad_parity_with_per_scene(world):
    """A bucketed batch of 2+2 rows from two scenes produces exactly the
    mean of the two per-scene losses and gradients at identical params
    (sgd(1.0): update == -grad, so parameter deltas compare grads)."""
    df, images = world
    mcfg, scfg, trainable, frozen, state = _setup_step(world)
    sgd = optax.sgd(1.0)
    step = steps_lib.make_train_step(mcfg, scfg, sgd)
    opt_state = sgd.init(trainable)

    sids = ["synth_0", "synth_1"]
    per = scenes_lib.split_trajectories_by_scene(df, TOTAL_LEN)
    rows = {s: per[s][0][:2] * 0.25 for s in sids}

    losses, deltas = [], []
    for s in sids:
        batch = {"semantic": jnp.asarray(images[s][None]),
                 "traj": jnp.asarray(rows[s]),
                 "mask": jnp.ones(2, np.float32)}
        new_t, _, _, metrics = step(trainable, frozen, state, opt_state,
                                    batch)
        losses.append(float(metrics["loss"]))
        deltas.append(jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                                   trainable, new_t))

    bucketed = {
        "semantic": jnp.asarray(np.stack([images[s] for s in sids])),
        "traj": jnp.asarray(np.concatenate([rows[s] for s in sids])),
        "mask": jnp.ones(4, np.float32),
        "scene_idx": jnp.asarray([0, 0, 1, 1], jnp.int32),
    }
    new_t, _, _, metrics = step(trainable, frozen, state, opt_state,
                                bucketed)
    np.testing.assert_allclose(float(metrics["loss"]),
                               np.mean(losses), rtol=2e-5)
    delta_b = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                           trainable, new_t)
    mean_delta = jax.tree.map(lambda a, b: (a + b) / 2, *deltas)
    flat_b = jax.tree.leaves(delta_b)
    flat_m = jax.tree.leaves(mean_delta)
    for g_b, g_m in zip(flat_b, flat_m):
        np.testing.assert_allclose(g_b, g_m, rtol=1e-4, atol=1e-7)


def test_trainer_cross_scene_batching_end_to_end(tmp_path, world):
    df, images = world
    ids = df.metaId.unique()
    df_train = df[df.metaId.isin(ids[:-4])]
    df_val = df[df.metaId.isin(ids[-4:])]
    params = config_lib.get_params(overrides=dict(
        obs_len=OBS_LEN, pred_len=TOTAL_LEN - OBS_LEN, waypoints=[7],
        n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=4, n_traj=1, batch_size=4, lr=3e-4, n_epoch=1,
        dataset_name="sdd", ckpt_path=str(tmp_path), train_net="train",
        network="original", n_round=1, seed=1, save_every_n=100,
        segmentation_model_fp=None, cross_scene_batching=True,
        max_scenes_per_batch=4))
    exp = Experiment(params, images=images)
    batches = exp.prepare_data(df_train, None, "train",
                               rng=np.random.default_rng(0))
    assert any(len(set(b.scene_idx[b.mask.astype(bool)])) > 1
               for b in batches), "no batch actually crossed scenes"
    val_ade, val_fde = exp.train(df_train, df_val, None, None, "bucketed")
    assert all(np.isfinite(val_ade)) and all(np.isfinite(val_fde))


def _eval_params(tmp_path, images_unused, **over):
    p = config_lib.get_params(overrides=dict(
        obs_len=OBS_LEN, pred_len=TOTAL_LEN - OBS_LEN, waypoints=[7],
        n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=4, n_traj=1, batch_size=4, lr=3e-4, n_epoch=1,
        dataset_name="sdd", ckpt_path=str(tmp_path), train_net="train",
        network="original", n_round=1, seed=1, save_every_n=100,
        segmentation_model_fp=None))
    p.update(over)
    return p


class TestBucketedEval:
    """--cross_scene_batching now applies to Experiment.test too
    (VERDICT r3 next-item 6): many-small-scene datasets (inD) stop paying
    for per-scene padding at eval time."""

    def test_eval_metric_parity_deterministic(self, tmp_path, world):
        """With a near-zero temperature the goal/waypoint sampling
        collapses to the argmax cell, so per-scene and bucketed eval
        must produce IDENTICAL metrics — same rows, same per-metaId
        ADE/FDE, only the batch partition differs."""
        df, images = world
        results = {}
        for cross in (False, True):
            params = _eval_params(tmp_path, images, temperature=1e-5,
                                  cross_scene_batching=cross,
                                  max_scenes_per_batch=4)
            exp = Experiment(params, images=images)
            ade, fde, dfs, _ = exp.test(df, None)
            per_id = dfs[0].sort_values("metaId").reset_index(drop=True)
            results[cross] = (ade, fde, per_id)
        ade_ps, fde_ps, df_ps = results[False]
        ade_b, fde_b, df_b = results[True]
        assert ade_b == pytest.approx(ade_ps, rel=1e-5)
        assert fde_b == pytest.approx(fde_ps, rel=1e-5)
        # identical coverage and per-row scene attribution
        assert list(df_b.metaId) == list(df_ps.metaId)
        assert list(df_b.sceneId) == list(df_ps.sceneId)
        np.testing.assert_allclose(df_b.ade.to_numpy(),
                                   df_ps.ade.to_numpy(), rtol=1e-5)
        np.testing.assert_allclose(df_b.fde.to_numpy(),
                                   df_ps.fde.to_numpy(), rtol=1e-5)

    def test_eval_statistical_parity_stochastic(self, tmp_path, world):
        """At temperature 1 the RNG streams differ (different batch
        partitions fold different indices), so parity is statistical
        over rounds per the BASELINE.md protocol."""
        df, images = world
        means = {}
        for cross in (False, True):
            params = _eval_params(tmp_path, images, n_round=6,
                                  cross_scene_batching=cross,
                                  max_scenes_per_batch=4,
                                  seed=3)
            exp = Experiment(params, images=images)
            ade, fde, _, _ = exp.test(df, None)
            means[cross] = (ade, np.std(exp.eval_ADE))
        (ade_ps, sd), (ade_b, _) = means[False], means[True]
        assert abs(ade_b - ade_ps) < max(0.10 * ade_ps, 3.0 * sd, 0.5), \
            means

    def test_eval_batch_count_drops(self, tmp_path, world):
        """The actual throughput lever: fewer eval step invocations."""
        df, images = world
        params = _eval_params(tmp_path, images, cross_scene_batching=True,
                              max_scenes_per_batch=4)
        exp = Experiment(params, images=images)
        bucketed = exp.prepare_data(df, None, "test")
        exp_ps = Experiment(
            _eval_params(tmp_path, images, cross_scene_batching=False),
            images=images)
        per_scene = exp_ps.prepare_data(df, None, "test")
        assert len(bucketed) < len(per_scene)
        # eval bucketing is deterministic: same df -> same batches
        again = exp.prepare_data(df, None, "test")
        for a, b in zip(bucketed, again):
            np.testing.assert_array_equal(a.trajectories, b.trajectories)
            assert a.scene_ids == b.scene_ids

    def test_forward_test_probe_unaffected(self, tmp_path, world):
        """forward_test is a single-scene SceneBatch consumer; the
        bucketed-eval flag must not change its data path (it reads
        batch.image as (H, W, C) and asserts one scene_id)."""
        df, images = world
        scene = df.sceneId.unique()[0]
        df_one = df[df.sceneId == scene]
        params = _eval_params(tmp_path, images, cross_scene_batching=True,
                              max_scenes_per_batch=4)
        exp = Experiment(params, images=images)
        goal_loss, traj_loss, _ = exp.forward_test(df_one, None)
        assert np.isfinite(float(goal_loss))
        assert np.isfinite(float(traj_loss))

    def test_eth_eval_never_buckets(self, tmp_path, world):
        df, images = world
        params = _eval_params(tmp_path, images, cross_scene_batching=True,
                              dataset_name="eth")
        exp = Experiment(params, images=images)
        # eth scenes load via the seg-mask path; just check the gate
        # without touching images: prepare_data on sdd-named scenes but
        # dataset_name=eth must fall back to per-scene batches
        batches = exp.prepare_data(df, None, "test")
        assert all(not hasattr(b, "scene_ids") for b in batches)
