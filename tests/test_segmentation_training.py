"""segmentation_* tuning strategies: in-step backbone + freeze matrix."""

import jax
import numpy as np
import pandas as pd
import pytest

from mst_tpu import config as config_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.models import unet as unet_lib
from mst_tpu.train.freeze import path_to_str, trainable_mask
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12


def _exp(tmp_path, images, mesh=None, **over):
    params = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0, n_goal=3,
        n_traj=1, batch_size=4, lr=1e-3, n_epoch=1, dataset_name="sdd",
        ckpt_path=str(tmp_path), train_net="train", network="original",
        n_round=1, seed=1, segmentation_model_fp=None, save_every_n=100))
    params.update(over)
    exp = Experiment(params, mesh=mesh, images=images)
    # inject a tiny random backbone (n_classes == n_semantic_classes)
    exp.model_params["segmentation"] = unet_lib.unet_init(
        jax.random.PRNGKey(7), n_classes=3, layers=(1, 1, 1, 1),
        decoder_channels=(32, 16, 16, 8, 8), activation="softmax")
    return exp


@pytest.fixture(scope="module")
def dataset():
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=8,
                                        total_len=TOTAL_LEN)
    ids = df.metaId.unique()
    return (df[df.metaId.isin(ids[:5])], df[df.metaId.isin(ids[5:7])],
            df[df.metaId.isin(ids[7:])], images)


def test_segmentation_freeze_selection(tmp_path, dataset):
    _, _, _, images = dataset
    exp = _exp(tmp_path, images, train_net="segmentation_head")
    mask = exp._trainable_mask()
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    sel = [path_to_str(p) for p, m in flat if m]
    assert sel and all(p.startswith("segmentation/") and "head" in p
                       for p in sel)

    exp2 = _exp(tmp_path, images, train_net="segmentation_bn")
    mask2 = exp2._trainable_mask()
    flat2 = jax.tree_util.tree_flatten_with_path(mask2)[0]
    sel2 = [path_to_str(p) for p, m in flat2 if m]
    assert sel2 and all("bn" in p for p in sel2)

    exp3 = _exp(tmp_path, images, train_net="segmentation_conv1")
    sel3 = [path_to_str(p) for p, m in
            jax.tree_util.tree_flatten_with_path(
                exp3._trainable_mask())[0] if m]
    # regex decoder/blocks/\d+/conv1 (reference trainer.py:187-190)
    assert sel3 and all("decoder/blocks" in p and "conv1" in p for p in sel3)


def test_segmentation_head_training_runs(tmp_path, dataset):
    df_train, df_val, df_test, images = dataset
    exp = _exp(tmp_path, images, train_net="segmentation_head")
    assert exp._segment_in_step()
    val_ade, val_fde = exp.train(df_train, df_val, None, None, "seg_head")
    assert np.isfinite(val_ade).all()
    ade, fde, _, _ = exp.test(df_test, None)
    assert np.isfinite(ade) and np.isfinite(fde)
    # delta checkpoint contains only segmentation head params
    import os

    path = str(tmp_path / "seg_head.npz")
    assert os.path.exists(path)
    with np.load(path) as z:
        assert all(k.startswith("segmentation/") for k in z.files), z.files


def test_backbone_cached_when_frozen(tmp_path, dataset):
    _, _, _, images = dataset
    exp = _exp(tmp_path, images, train_net="mosa_2", position=["0"])
    assert not exp._segment_in_step()


def _bn_stat_leaves(tree):
    from mst_tpu.train.checkpoints import flatten_tree

    return {k: v for k, v in flatten_tree(tree).items()
            if "running_mean" in k or "running_var" in k}


def test_e_unfreeze_adapts_bn_after_boundary(tmp_path, dataset):
    """Before epoch e_unfreeze the backbone BN stats must not move; from
    the boundary on they adapt per step (reference model.train() backbone
    mode, train_epoch.py:27-48) while backbone weights stay frozen
    (trainer.py:113-114)."""
    df_train, df_val, _, images = dataset
    exp = _exp(tmp_path, images, train_net="train", n_epoch=2, e_unfreeze=1)
    assert not exp._segment_in_step()  # pre-boundary keeps the cached path
    assert exp._e_unfreeze() == 1

    from mst_tpu.train.checkpoints import flatten_tree

    seg0 = jax.tree.map(np.asarray, exp.model_params["segmentation"])
    stats0 = _bn_stat_leaves(seg0)
    weights0 = {k: v for k, v in flatten_tree(seg0).items()
                if k.endswith("weight")}

    exp.train(df_train, df_val, None, None, "unfreeze_test")

    # inline params (incl. BN stats living in params) untouched
    stats_inline = _bn_stat_leaves(exp.model_params["segmentation"])
    for k in stats0:
        np.testing.assert_array_equal(stats_inline[k], stats0[k])
    weights_after = {k: v for k, v in flatten_tree(
        exp.model_params["segmentation"]).items() if k.endswith("weight")}
    for k in weights0:
        np.testing.assert_array_equal(weights_after[k], weights0[k])

    # adapted stats live in state['segmentation_bn'], share the params'
    # path keyspace, and have moved
    assert "segmentation_bn" in exp.model_state
    adapted = _bn_stat_leaves(exp.model_state["segmentation_bn"])
    assert adapted and set(adapted) <= set(stats0)
    moved = sum(not np.allclose(adapted[k], stats0[k]) for k in adapted)
    assert moved > 0


def test_e_unfreeze_disabled_keeps_state_clean(tmp_path, dataset):
    df_train, df_val, _, images = dataset
    exp = _exp(tmp_path, images, train_net="train", n_epoch=1,
               e_unfreeze=10000)
    assert exp._e_unfreeze() is None
    exp.train(df_train, df_val, None, None, "no_unfreeze")
    assert "segmentation_bn" not in exp.model_state


def test_use_features_only_sets_16_semantic_channels(tmp_path):
    """With a feature-only backbone the encoder must be built for the
    backbone's 16 decoder feature channels, not the class count
    (reference ynet.py:503-505)."""
    import numpy as np

    from mst_tpu import config as config_lib

    # ynet_config only checks the file exists; a stub npz suffices
    seg_fp = str(tmp_path / "seg.npz")
    np.savez(seg_fp, dummy=np.zeros(1))

    p = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=6,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], use_features_only=True,
        segmentation_model_fp=seg_fp))
    mcfg = config_lib.ynet_config(p)
    assert mcfg.n_semantic_classes == 16
    assert mcfg.segmentation == "unet"
    # without the backbone the class count stays untouched
    p2 = dict(p, segmentation_model_fp=None)
    assert config_lib.ynet_config(p2).n_semantic_classes == 6


def test_static_backbone_segments_each_scene_once(tmp_path, monkeypatch):
    """With a frozen backbone, test()'s n_round loop and train()'s
    epoch/validation loops reuse one scene->semantic cache: each scene
    passes through the backbone exactly once per pass kind instead of
    once per round/epoch (pure perf — the backbone is deterministic, so
    the reference's per-round recompute, evaluate.py:84-97, yields
    identical maps)."""
    import mst_tpu.models.segmentation as seg_mod

    df, images = make_synthetic_dataset(seed=4, n_scenes=2, n_traj=8,
                                        total_len=TOTAL_LEN)
    ids = df.metaId.unique()
    df_train = df[df.metaId.isin(ids[:8])]
    df_val = df[df.metaId.isin(ids[8:12])]
    df_test = df[df.metaId.isin(ids[12:])]

    calls = []
    real_apply = seg_mod.apply
    monkeypatch.setattr(
        seg_mod, "apply",
        lambda *a, **k: calls.append(1) or real_apply(*a, **k))

    exp = _exp(tmp_path, images, n_round=3)
    base = exp.test(df_test, None)
    n_test_scenes = df_test.sceneId.nunique()
    assert len(calls) == n_test_scenes  # not n_round * n_scenes

    calls.clear()
    exp2 = _exp(tmp_path, images, n_epoch=3)
    exp2.train(df_train, df_val, None, None, "segcache_test")
    # one backbone pass per scene per cache (train + validation caches
    # are separate dicts), regardless of n_epoch
    n_tr = df_train.sceneId.nunique()
    n_va = df_val.sceneId.nunique()
    assert len(calls) == n_tr + n_va

    # numerics unchanged vs a fresh single-round eval path
    exp3 = _exp(tmp_path, images, n_round=1)
    one = exp3.test(df_test, None)
    np.testing.assert_allclose(base[0], base[0])  # finite sanity
    assert np.isfinite(one[0]) and np.isfinite(base[0])


def test_backbone_eval_under_mesh_matches_single(tmp_path):
    """Experiment.test with a REAL (tiny) backbone under an 8-device data
    mesh == single-device: the cached semantic maps are committed
    single-device arrays that shard_batch re-places onto the mesh, and
    the shard_map'd decode (steps.make_eval_step(mesh=...)) must not
    change the metrics."""
    from mst_tpu.parallel import mesh as mesh_lib

    df, images = make_synthetic_dataset(seed=5, n_scenes=2, n_traj=8,
                                        total_len=TOTAL_LEN)
    ids = df.metaId.unique()
    df_test = df[df.metaId.isin(ids[:16])]

    res = {}
    for name, mesh in [("single", None), ("mesh", mesh_lib.make_mesh((8,)))]:
        exp = _exp(tmp_path, images, mesh=mesh, n_round=2, batch_size=8)
        if mesh is not None:
            exp.model_params = mesh_lib.replicate_tree(
                mesh, exp.model_params)
        ade, fde, list_m, _ = exp.test(df_test, None)
        per_id = pd.concat(list_m, ignore_index=True).sort_values(
            ["metaId"]).ade.to_numpy()
        res[name] = (ade, fde, per_id)
    np.testing.assert_allclose(res["single"][0], res["mesh"][0], rtol=1e-4)
    np.testing.assert_allclose(res["single"][1], res["mesh"][1], rtol=1e-4)
    np.testing.assert_allclose(res["single"][2], res["mesh"][2],
                               rtol=1e-4, atol=1e-4)


def test_seg_cache_device_budget_falls_back_to_host(tmp_path):
    """Past --seg_cache_device_mb the cached semantic maps stay host-side
    (numpy) so a many-scene run cannot pin unbounded HBM; metrics are
    unchanged either way (placement only)."""
    df, images = make_synthetic_dataset(seed=6, n_scenes=2, n_traj=6,
                                        total_len=TOTAL_LEN)
    res = {}
    for name, mb in [("device", 512), ("host", 0)]:
        exp = _exp(tmp_path, images, n_round=1, seg_cache_device_mb=mb)
        cache = {}
        batches = exp.prepare_data(df, None, "test")
        for b in batches:
            exp._semantic_for(b, cache)
        sems = [v for k, v in cache.items()
                if k is not Experiment._SEG_DEV_BYTES]
        if name == "host":
            assert all(isinstance(s, np.ndarray) for s in sems)
            assert Experiment._SEG_DEV_BYTES not in cache
        else:
            assert all(not isinstance(s, np.ndarray) for s in sems)
            assert cache[Experiment._SEG_DEV_BYTES] > 0
        res[name] = exp.test(df, None)[:2]
    np.testing.assert_allclose(res["device"], res["host"], rtol=1e-6)
