"""Structural + invariant tests for all YNet variants and the freeze matrix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.models import ynet as jynet
from mst_tpu.train.freeze import (
    count_trainable,
    merge_params,
    split_params,
    trainable_mask,
)

BASE = dict(obs_len=4, pred_len=6, n_semantic_classes=3,
            encoder_channels=(8, 8, 16, 16, 16),
            decoder_channels=(16, 16, 16, 8, 8), waypoints=(2, 5))
H, W = 64, 64


def _forward_goal(cfg, params, state, scene, motion, train=False):
    feats, new_state = jynet.pred_features(params, state, cfg, scene, motion,
                                           train=train)
    return jynet.pred_goal(params, feats), feats, new_state


def _rand_inputs(rng, cfg):
    scene = jnp.asarray(
        rng.normal(size=(2, H, W, cfg.n_semantic_classes)).astype(np.float32))
    motion = jnp.asarray(
        rng.normal(size=(2, H, W, cfg.obs_len)).astype(np.float32))
    return scene, motion


VARIANTS = [
    dict(train_net="train", network="original"),
    dict(train_net="mosa_2", network="original", position=("0", "1", "2")),
    dict(train_net="serial", network="original", position=("1", "3")),
    dict(train_net="parallel_3x3", network="original", position=("0", "2")),
    dict(train_net="parallelLayer_3x3", network="original",
         position=("1", "2")),
    dict(train_net="serialLayer", network="original", position=("0",)),
    dict(train_net="semantic_3x3", network="original"),
    dict(train_net="train", network="embed"),
    dict(train_net="train", network="fusion", n_fusion=2),
    dict(train_net="mosa_1", network="fusion", n_fusion=2,
         position=("scene", "motion")),
    dict(train_net="scene_motion_fusion", network="fusion", n_fusion=3),
]


@pytest.mark.parametrize("variant", VARIANTS,
                         ids=[f"{v['train_net']}-{v['network']}"
                              for v in VARIANTS])
def test_forward_shapes(variant, rng):
    cfg = jynet.YNetConfig(**BASE, **variant)
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    scene, motion = _rand_inputs(rng, cfg)
    if cfg.network == "embed":
        scene = jynet.scene_embedding(params, cfg, scene)
        motion = jynet.motion_embedding(params, cfg, motion)
    goal_map, feats, _ = _forward_goal(cfg, params, state, scene, motion)
    assert goal_map.shape == (2, H, W, cfg.pred_len)
    assert len(feats) == len(cfg.encoder_channels) + 1
    for i, f in enumerate(feats[1:], 1):
        assert f.shape[1] == H // 2**i and f.shape[2] == W // 2**i
    assert np.isfinite(np.asarray(goal_map)).all()


@pytest.mark.parametrize("variant", [v for v in VARIANTS
                                     if v["train_net"] != "train"],
                         ids=[f"{v['train_net']}-{v['network']}"
                              for v in VARIANTS if v["train_net"] != "train"])
def test_zero_init_equivalence(variant, rng):
    """Adapters/LoRA are zero-initialized: at init the adapted model computes
    the same function as the plain one (the reference's --init_check,
    train.py:47-59; zero inits at ynet.py:45-51,109-115,518-519 and loralib
    lora_B=0)."""
    key = jax.random.PRNGKey(0)
    cfg_a = jynet.YNetConfig(**BASE, **variant)
    base_variant = dict(variant, train_net="train", position=())
    cfg_b = jynet.YNetConfig(**BASE, **base_variant)

    params_a, state_a = jynet.init_ynet(key, cfg_a)
    params_b, state_b = jynet.init_ynet(key, cfg_b)

    scene, motion = _rand_inputs(rng, cfg_a)
    ga, _, _ = _forward_goal(cfg_a, params_a, state_a, scene, motion)
    gb, _, _ = _forward_goal(cfg_b, params_b, state_b, scene, motion)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant,expect_substr", [
    (dict(train_net="mosa_2", network="original", position=("0", "1")),
     "lora"),
    (dict(train_net="serial", network="original", position=("1",)),
     "serial"),
    (dict(train_net="parallel_3x3", network="original", position=("0",)),
     "parallel"),
    (dict(train_net="parallelLayer_1x1_3x3", network="original",
          position=("2",)), "parallel"),
    (dict(train_net="semantic_3x3", network="original"), "semantic_adapter"),
])
def test_freeze_selects_only_adapters(variant, expect_substr):
    cfg = jynet.YNetConfig(**BASE, **variant)
    params, _ = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg.train_net, cfg.position, cfg.network)
    from mst_tpu.train.freeze import path_to_str
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable_paths = [path_to_str(p) for p, m in flat if m]
    assert trainable_paths, "no trainable params selected"
    assert all(expect_substr in p for p in trainable_paths), trainable_paths
    n = count_trainable(mask, params)
    total = jynet.count_params(params)
    assert 0 < n < total * 0.2, (n, total)


def test_freeze_bias_modes():
    cfg = jynet.YNetConfig(**BASE, train_net="train", network="original")
    params, _ = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    for tn, prefix in [("biasEncoder", "encoder/"),
                       ("biasGoal", "goal_decoder/"),
                       ("biasTraj", "traj_decoder/")]:
        mask = trainable_mask(params, tn)
        from mst_tpu.train.freeze import path_to_str
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        sel = [path_to_str(p) for p, m in flat if m]
        assert sel and all(p.startswith(prefix) and p.endswith("/bias")
                           for p in sel)


def test_freeze_fusion_branches():
    cfg = jynet.YNetConfig(**BASE, train_net="motion", network="fusion",
                           n_fusion=2)
    params, _ = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    from mst_tpu.train.freeze import path_to_str
    for tn, branches in [("scene", ["scene_stages"]),
                         ("motion", ["motion_stages"]),
                         ("scene_fusion", ["scene_stages", "fusion_stages"])]:
        mask = trainable_mask(params, tn, network="fusion")
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        sel = [path_to_str(p) for p, m in flat if m]
        assert sel
        assert all(any(b in p for b in branches) for p in sel)


def test_split_merge_roundtrip():
    cfg = jynet.YNetConfig(**BASE, train_net="mosa_2", network="original",
                           position=("0", "1"))
    params, _ = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg.train_net, cfg.position)
    trainable, frozen = split_params(params, mask)
    merged = merge_params(trainable, frozen)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, merged)
    n_train = len([x for x in jax.tree_util.tree_leaves(trainable)])
    assert n_train == sum(jax.tree_util.tree_leaves(mask))


def test_lora_changes_function_after_update():
    """Perturbing lora_B changes the output (overlay actually wired in)."""
    cfg = jynet.YNetConfig(**BASE, train_net="mosa_2", network="original",
                           position=("0",))
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    scene, motion = _rand_inputs(rng, cfg)
    g0, _, _ = _forward_goal(cfg, params, state, scene, motion)
    lora_b = params["encoder"]["stages"]["0"]["conv0"]["lora_B"]
    params["encoder"]["stages"]["0"]["conv0"]["lora_B"] = (
        lora_b + 0.1)
    g1, _, _ = _forward_goal(cfg, params, state, scene, motion)
    assert np.abs(np.asarray(g1) - np.asarray(g0)).max() > 1e-4
