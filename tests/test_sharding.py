"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import optax
import pytest

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


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_train_step_matches_single(tmp_path):
    """The sharded train step computes the same update as single-device."""
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=8,
                                        total_len=TOTAL_LEN)
    params = _params(tmp_path)
    mesh = mesh_lib.make_mesh((8,))

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

    np.testing.assert_allclose(results["single"][1], results["mesh"][1],
                               rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        results["single"][0], results["mesh"][0])


def test_data_parallel_eval(tmp_path):
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=16,
                                        total_len=TOTAL_LEN)
    params = _params(tmp_path, batch_size=16)
    mesh = mesh_lib.make_mesh((8,))
    exp = Experiment(params, mesh=mesh, images=images)
    batches = exp.prepare_data(df, None, "test")
    eval_step = steps_lib.make_eval_step(exp.mcfg, exp._step_config())
    ade, fde, df_out, _ = exp._evaluate(batches, eval_step,
                                        jax.random.PRNGKey(0))
    assert np.isfinite(ade) and np.isfinite(fde)
    assert df_out.metaId.nunique() == 16


def test_batch_padding_to_mesh_multiple():
    batch = {"traj": np.zeros((5, 12, 2), np.float32),
             "mask": np.ones(5, np.float32),
             "meta_ids": np.arange(5)}
    out = mesh_lib.pad_batch_to_multiple(batch, 8)
    assert out["traj"].shape[0] == 8
    assert out["mask"].sum() == 5


# ---------------------------------------------------------------------------
# multi-host input pipeline (parallel/hostdata.py), CPU-simulated
# ---------------------------------------------------------------------------

def test_local_slice_partitions_cover_batch():
    from mst_tpu.parallel import hostdata

    n, pc = 32, 4
    slices = [hostdata.local_slice(n, pi, pc) for pi in range(pc)]
    assert slices[0] == (0, 8) and slices[-1] == (24, 32)
    covered = sorted(i for lo, hi in slices for i in range(lo, hi))
    assert covered == list(range(n))


def test_take_local_keeps_scene_arrays_whole():
    from mst_tpu.parallel import hostdata

    batch = {"traj": np.arange(16 * 4).reshape(16, 2, 2).astype(np.float32),
             "mask": np.ones(16, np.float32),
             "semantic": np.ones((1, 8, 8, 3), np.float32)}
    local = hostdata.take_local(batch, process_index=1, process_count=4)
    assert local["traj"].shape[0] == 4
    np.testing.assert_array_equal(local["traj"], batch["traj"][4:8])
    assert local["semantic"].shape == batch["semantic"].shape


def test_shard_batch_global_matches_shard_batch():
    """Single-process: make_array_from_process_local_data assembly equals
    the plain device_put path bit-for-bit, with the same shardings."""
    from mst_tpu.parallel import hostdata

    mesh = mesh_lib.make_mesh((8,))
    rng = np.random.default_rng(0)
    batch = {"traj": rng.normal(size=(16, TOTAL_LEN, 2)).astype(np.float32),
             "mask": np.ones(16, np.float32),
             "semantic": rng.normal(size=(1, 32, 32, 3)).astype(np.float32)}
    local = hostdata.take_local(batch)  # process_count=1 -> identity
    got = hostdata.shard_batch_global(mesh, local)
    want = mesh_lib.shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]))
        assert got[k].sharding == want[k].sharding, k


def test_prefetch_to_device_order_and_lookahead():
    from mst_tpu.parallel import hostdata

    calls = []

    def put(x):
        calls.append(x)
        return x * 10

    out = []
    lookahead = []
    for y in hostdata.prefetch_to_device(list(range(6)), put, depth=2):
        out.append(y)
        lookahead.append(len(calls))
    assert out == [0, 10, 20, 30, 40, 50]
    # when batch i is yielded, batch i+1's transfer is already enqueued
    assert lookahead[0] >= 3 and lookahead[2] >= 5


def test_sharded_training_with_prefetch_runs(tmp_path):
    """End-to-end Experiment.train on the 8-device mesh goes through the
    prefetching loop and stays finite."""
    df, images = make_synthetic_dataset(seed=0, n_scenes=2, n_traj=8,
                                        total_len=TOTAL_LEN)
    ids = df.metaId.unique()
    mesh = mesh_lib.make_mesh((8,))
    exp = Experiment(_params(tmp_path), images=images, mesh=mesh)
    val_ade, val_fde = exp.train(df[df.metaId.isin(ids[:12])],
                                 df[df.metaId.isin(ids[12:])],
                                 None, None, "prefetch_e2e")
    assert np.isfinite(val_ade).all() and np.isfinite(val_fde).all()


def test_shard_batch_global_pins_global_shape():
    from mst_tpu.parallel import hostdata

    mesh = mesh_lib.make_mesh((8,))
    batch = {"traj": np.zeros((16, TOTAL_LEN, 2), np.float32),
             "mask": np.ones(16, np.float32)}
    out = hostdata.shard_batch_global(mesh, batch, global_batch_size=16)
    assert out["traj"].shape == (16, TOTAL_LEN, 2)
    # a mismatched local row count fails upfront with a clear message
    import pytest as _pytest
    with _pytest.raises(ValueError, match="local rows"):
        hostdata.shard_batch_global(mesh, batch, global_batch_size=32)


def test_pad_batch_pads_every_nonscene_key():
    batch = {"traj": np.zeros((5, 12, 2), np.float32),
             "mask": np.ones(5, np.float32),
             "meta_ids": np.arange(5),
             "extra_per_traj": np.ones((5, 3), np.float32),
             "semantic": np.ones((1, 8, 8, 3), np.float32)}
    out = mesh_lib.pad_batch_to_multiple(batch, 8)
    assert out["extra_per_traj"].shape[0] == 8
    assert out["semantic"].shape[0] == 1  # scene-level keys untouched


def test_data_parallel_bucketed_train_step_matches_single(tmp_path):
    """Cross-scene bucketed batches shard like per-scene ones: the
    (S, H, W, C) semantic stack replicates, scene_idx shards with the
    rows, and the sharded update matches single-device bitwise-close."""
    df, images = make_synthetic_dataset(seed=2, n_scenes=2, n_traj=4,
                                        total_len=TOTAL_LEN)
    params = _params(tmp_path, cross_scene_batching=True,
                     max_scenes_per_batch=2)
    mesh = mesh_lib.make_mesh((8,))

    results = {}
    for name, m in [("single", None), ("mesh", mesh)]:
        exp = Experiment(params, mesh=m, images=images)
        batches = exp.prepare_data(df, None, "train",
                                   rng=np.random.default_rng(0))
        batch = batches[0]
        assert len(set(batch.scene_idx[batch.mask.astype(bool)])) > 1
        semantic = exp._semantic_for(batch, {})
        db = exp._device_batch(batch, semantic)
        if m is not None:
            assert "scene_idx" in db
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
        results[name] = (jax.device_get(trainable),
                         float(metrics["loss"]))

    # f32 reduction order differs across shard layouts (the gathered
    # semantic changes the fusion structure); bound it tightly but not
    # bitwise
    np.testing.assert_allclose(results["single"][1], results["mesh"][1],
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(results["single"][0]),
                    jax.tree.leaves(results["mesh"][0])):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)
