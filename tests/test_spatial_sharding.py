"""Spatial partitioning: ('data', 'space') mesh shards the scene maps' H.

This is the conv model's form of model parallelism (no attention/sequence
axis exists, SURVEY §2.3): XLA GSPMD inserts conv halo exchanges
(collective-permutes) and reduction all-reduces automatically, splitting
one scene's activation footprint over the 'space' axis — the enabler for
scenes too large for one chip's HBM (e.g. resize 1.0 SDD, ~4200^2 maps).
The reference has no counterpart (single GPU, models/trainer.py:54-58).
"""

import jax
import numpy as np
import optax
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from mst_tpu import config as config_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.parallel import mesh as mesh_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12


def _params(tmp_path, **over):
    p = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0, n_goal=4,
        n_traj=1, batch_size=8, lr=1e-3, n_epoch=1, dataset_name="sdd",
        ckpt_path=str(tmp_path), train_net="train", network="original",
        n_round=1, seed=1, segmentation_model_fp=None))
    p.update(over)
    return p


def test_mesh_from_shape_spatial_axes():
    mesh = mesh_lib.mesh_from_shape([2, 4], ["data", "space"])
    assert mesh.axis_names == ("data", "space")
    assert mesh.shape["space"] == 4
    # batch shards over 'data' only
    assert mesh_lib.batch_axes(mesh) == ("data",)
    assert mesh_lib.batch_shard_count(mesh) == 2
    # default axis names still give the hybrid (replica, data) mesh
    hy = mesh_lib.mesh_from_shape([2, 4])
    assert hy.axis_names == ("replica", "data")
    with pytest.raises(ValueError, match="mesh_axes"):
        mesh_lib.mesh_from_shape([2, 4], ["data"])
    with pytest.raises(ValueError, match="unsupported"):
        mesh_lib.mesh_from_shape([2, 4], ["space", "data"])


def test_shard_batch_splits_scene_maps_over_space():
    mesh = mesh_lib.make_spatial_mesh(2, 4)
    batch = {
        "semantic": np.zeros((1, 32, 48, 3), np.float32),
        "traj": np.zeros((8, TOTAL_LEN, 2), np.float32),
        "mask": np.ones(8, np.float32),
        "homography": np.eye(3, dtype=np.float32),
    }
    db = mesh_lib.shard_batch(mesh, batch)
    assert db["semantic"].sharding.spec == P(None, "space")
    # each device holds H/4 of the scene map
    shard_shapes = {s.data.shape for s in db["semantic"].addressable_shards}
    assert shard_shapes == {(1, 8, 48, 3)}
    assert db["traj"].sharding.spec == P(("data",))
    assert db["homography"].sharding.spec == P()


def _run_eval(tmp_path, mesh, n_traj=16):
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=n_traj,
                                        total_len=TOTAL_LEN)
    params = _params(tmp_path, batch_size=n_traj)
    exp = Experiment(params, mesh=mesh, images=images)
    batches = exp.prepare_data(df, None, "test")
    eval_step = steps_lib.make_eval_step(exp.mcfg, exp._step_config())
    return exp._evaluate(batches, eval_step, jax.random.PRNGKey(0))


def test_spatial_eval_matches_single(tmp_path):
    """The spatially-sharded eval computes the single-device numbers."""
    ade_s, fde_s, df_s, _ = _run_eval(tmp_path / "s", None)
    mesh = mesh_lib.make_spatial_mesh(2, 4)
    ade_m, fde_m, df_m, _ = _run_eval(tmp_path / "m", mesh)
    np.testing.assert_allclose(ade_m, ade_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(fde_m, fde_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(df_m["ade"].values, df_s["ade"].values,
                               rtol=1e-4, atol=1e-4)


def test_spatial_train_step_matches_single(tmp_path):
    """Two spatially-sharded train steps == two single-device steps."""
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=8,
                                        total_len=TOTAL_LEN)
    params = _params(tmp_path)
    mesh = mesh_lib.make_spatial_mesh(2, 4)

    results = {}
    for name, m in [("single", None), ("mesh", mesh)]:
        exp = Experiment(params, mesh=m, images=images)
        batches = exp.prepare_data(df, None, "val")
        batch = batches[0]
        semantic = exp._semantic_for(batch, {})
        db = exp._device_batch(batch, semantic)
        mask = exp._trainable_mask()
        trainable, frozen = freeze_lib.split_params(exp.model_params, mask)
        if m is not None:
            trainable = mesh_lib.replicate_tree(m, trainable)
            frozen = mesh_lib.replicate_tree(m, frozen)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(trainable)
        step = steps_lib.make_train_step(exp.mcfg, exp._step_config(),
                                         optimizer)
        for _ in range(2):
            trainable, state, opt_state, metrics = step(
                trainable, frozen, exp.model_state, opt_state, db)
        results[name] = (jax.tree.map(np.asarray, trainable),
                         float(metrics["loss"]))

    # unlike pure data parallelism (which preserves each example's pixel
    # reduction order), spatial partitioning splits the H*W loss/grad
    # reductions across devices — summation ORDER changes, so gradients
    # agree only to fp tolerance. Where the true grad is ~0 that noise
    # flips its SIGN, and Adam's m/sqrt(v) normalization turns a sign flip
    # into a full +-lr step (observed: 0.3% of one kernel's elements at
    # up to 2.5e-3 = 2.5*lr after 2 steps). The step-2 loss matching at
    # rtol 1e-4 pins functional equivalence of the step-1 params; the
    # param check bounds the drift at the Adam step scale (3*lr).
    np.testing.assert_allclose(results["single"][1], results["mesh"][1],
                               rtol=1e-4)
    lr = 1e-3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3,
                                                atol=3 * lr),
        results["single"][0], results["mesh"][0])


def test_spatial_sharding_actually_partitions():
    """The compiled program exchanges halos (collective-permute) instead of
    all-gathering the scene maps — i.e. H really is partitioned."""
    import jax.numpy as jnp

    mesh = mesh_lib.make_spatial_mesh(2, 4)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 48, 8)).astype(np.float32)
    k = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1

    def net(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y).sum()

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    ks = jax.device_put(k, mesh_lib.replicated(mesh))
    f = jax.jit(net)
    txt = f.lower(xs, ks).compile().as_text()
    assert "collective-permute" in txt, "expected conv halo exchange"


def test_spatial_hostdata_matches_shard_batch():
    """shard_batch_global places scene maps with the same spatial sharding
    as shard_batch (the two paths can never diverge)."""
    from mst_tpu.parallel import hostdata

    mesh = mesh_lib.make_spatial_mesh(2, 4)
    batch = {
        "semantic": np.arange(1 * 32 * 48 * 3, dtype=np.float32).reshape(
            1, 32, 48, 3),
        "traj": np.arange(8 * TOTAL_LEN * 2, dtype=np.float32).reshape(
            8, TOTAL_LEN, 2),
        "mask": np.ones(8, np.float32),
    }
    a = mesh_lib.shard_batch(mesh, batch)
    b = hostdata.shard_batch_global(mesh, hostdata.take_local(batch))
    for k in batch:
        assert a[k].sharding == b[k].sharding, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_shard_batch_rejects_nondividing_height():
    mesh = mesh_lib.make_spatial_mesh(2, 4)
    batch = {
        "semantic": np.zeros((1, 30, 48, 3), np.float32),  # 30 % 4 != 0
        "traj": np.zeros((8, TOTAL_LEN, 2), np.float32),
        "mask": np.ones(8, np.float32),
    }
    with pytest.raises(ValueError, match="space"):
        mesh_lib.shard_batch(mesh, batch)


def test_spatial_experiment_train_e2e(tmp_path):
    """A full Experiment.train epoch + test() on a ('data','space') mesh
    runs end-to-end (trainer batch rounding, shard_batch placement,
    validation eval) and produces finite reference-protocol metrics."""
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=12,
                                        total_len=TOTAL_LEN)
    ids = df.metaId.unique()
    df_train = df[df.metaId.isin(ids[:8])]
    df_val = df[df.metaId.isin(ids[8:10])]
    df_test = df[df.metaId.isin(ids[10:])]
    params = _params(tmp_path, n_epoch=1, batch_size=4)
    mesh = mesh_lib.make_spatial_mesh(2, 4)
    exp = Experiment(params, mesh=mesh, images=images)
    val_ade, val_fde = exp.train(df_train, df_val, None, None,
                                 "spatial_e2e")
    assert np.isfinite(val_ade) and np.isfinite(val_fde)
    ade, fde, list_metrics, _ = exp.test(df_test, None)
    assert np.isfinite(ade) and np.isfinite(fde)
    # one per-metaId metrics DataFrame per round (n_round=1)
    assert len(list_metrics) == 1
    assert len(list_metrics[0]) == df_test.metaId.nunique()


def test_spatial_bucketed_train_step_runs(tmp_path):
    """Cross-scene bucketed batches work under a spatial mesh: the
    (S, H, W, C) semantic stack shards H over 'space', scene_idx shards
    with the rows, and the loss matches the single-device step."""
    df, images = make_synthetic_dataset(seed=2, n_scenes=2, n_traj=4,
                                        total_len=TOTAL_LEN)
    params = _params(tmp_path, cross_scene_batching=True,
                     max_scenes_per_batch=2)

    losses = {}
    for name, m in [("single", None),
                    ("spatial", mesh_lib.make_spatial_mesh(2, 4))]:
        exp = Experiment(params, mesh=m, images=images)
        batches = exp.prepare_data(df, None, "train",
                                   rng=np.random.default_rng(0))
        batch = batches[0]
        semantic = exp._semantic_for(batch, {})
        db = exp._device_batch(batch, semantic)
        if m is not None:
            assert db["semantic"].sharding.spec == P(None, "space")
        mask = exp._trainable_mask()
        trainable, frozen = freeze_lib.split_params(exp.model_params, mask)
        if m is not None:
            trainable = mesh_lib.replicate_tree(m, trainable)
            frozen = mesh_lib.replicate_tree(m, frozen)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(trainable)
        step = steps_lib.make_train_step(exp.mcfg, exp._step_config(),
                                         optimizer)
        _, _, _, metrics = step(trainable, frozen, exp.model_state,
                                opt_state, db)
        losses[name] = float(metrics["loss"])

    np.testing.assert_allclose(losses["single"], losses["spatial"],
                               rtol=1e-4)
