"""Negative-space assertions on the compiled sharded programs (VERDICT r4
next-step #6).

The positive tests (test_sharding / test_hybrid_mesh) prove the sharded
steps compute the right numbers; these prove the compiled HLO moves only
the bytes the design intends:

- the data-parallel train step communicates ONLY via the gradient/metric
  all-reduces (no parameter all-gather, no activation all-to-all; the sole
  collective-permutes are the scene-level pad-transpose artifacts on
  (1, h, w, c) tensors),
- the mesh-aware eval decode (steps.make_eval_step(mesh=...)) is purely
  row-local compute + the three metric psums — before round 5, GSPMD
  partitioned the (K, B) reshape by all-gathering the per-row feature
  pyramids across the mesh (21 activation all-gathers measured on the
  8-device program),
- the eval forward's only all-gather feeds top_k (the SPMD partitioner
  gathers rows for the per-row top-k; bounded at B x H*W floats),
- a shape-diverse dataset compiles exactly one program per (image shape,
  batch size) bucket — no recompilation storm (data/scenes.py:96-101).
"""

import collections
import re

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp
import optax

from mst_tpu import config as config_lib
from mst_tpu.data import synthetic as synth_lib
from mst_tpu.models import ynet as ynet_lib
from mst_tpu.parallel import mesh as mesh_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12
_COLL_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter)\b")


def _collectives(hlo_text):
    return collections.Counter(_COLL_RE.findall(hlo_text))


def _coll_lines(hlo_text, op):
    return [ln.strip() for ln in hlo_text.splitlines()
            if f" {op}(" in ln]


@pytest.fixture(scope="module")
def setup():
    params_dict = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=4, n_traj=1, train_net="mosa_2",
        position=["0", "1", "2", "3", "4"], segmentation_model_fp=None))
    mcfg = config_lib.ynet_config(params_dict)
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=4, pred_len=8, waypoints=(7,), template_size=128,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.0, n_goal=4, n_traj=1)
    rng = np.random.default_rng(0)
    batch = {
        "semantic": rng.normal(size=(1, 64, 96, 3)).astype(np.float32),
        "traj": rng.uniform(10, 50, size=(8, TOTAL_LEN, 2)).astype(
            np.float32),
        "mask": np.ones(8, np.float32)}
    return mcfg, scfg, params, state, batch


@pytest.mark.parametrize("mesh_kind", ["1d", "hybrid"])
def test_train_step_grad_allreduce_only(setup, mesh_kind):
    """The DP train program's ONLY data movement is all-reduce (grads +
    metrics) plus scene-level pad-transpose permutes: any all-gather
    would mean a parameter or activation got unsharded."""
    mcfg, scfg, params, state, batch = setup
    mesh = (mesh_lib.make_mesh((8,)) if mesh_kind == "1d"
            else mesh_lib.make_hybrid_mesh(2, 4))
    mask = freeze_lib.trainable_mask(params, "mosa_2",
                                     ["0", "1", "2", "3", "4"])
    trainable, frozen = freeze_lib.split_params(params, mask)
    trainable = mesh_lib.replicate_tree(mesh, trainable)
    frozen = mesh_lib.replicate_tree(mesh, frozen)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(trainable)
    step = steps_lib.make_train_step(mcfg, scfg, optimizer)
    db = mesh_lib.shard_batch(mesh, batch)
    txt = step.lower(trainable, frozen, state, opt_state,
                     db).compile().as_text()
    ops = _collectives(txt)
    assert ops["all-reduce"] >= 1, ops  # the gradient reduction exists
    assert ops["all-gather"] == 0, _coll_lines(txt, "all-gather")[:3]
    assert ops["all-to-all"] == 0, ops
    # collective-permutes may only touch scene-level (leading dim 1)
    # tensors — the pad-gradient boundary shuffle of the replicated
    # semantic pyramid, never per-row activations
    for line in _coll_lines(txt, "collective-permute"):
        m = re.search(r"= \w+\[(\d+)[,\]]", line)
        assert m and m.group(1) == "1", line


def test_mesh_eval_decode_is_local_plus_psum(setup):
    """steps.make_eval_step(mesh=...) decodes each row on the device that
    holds it: the decode program contains NO gather/permute of any kind,
    only the metric-sum all-reduces (psum)."""
    mcfg, scfg, params, state, batch = setup
    mesh = mesh_lib.make_mesh((8,))
    params_r = mesh_lib.replicate_tree(mesh, params)
    db = mesh_lib.shard_batch(mesh, batch)
    es = steps_lib.make_eval_step(mcfg, scfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    feats, wps = es.forward(params_r, state, db, key)
    hom = jnp.eye(3, dtype=jnp.float32)
    txt = es.decode_and_score.lower(
        params_r, feats, wps, db["traj"], db["mask"],
        hom).compile().as_text()
    ops = _collectives(txt)
    assert ops["all-reduce"] >= 1, ops  # the three metric psums
    for bad in ("all-gather", "all-to-all", "collective-permute",
                "reduce-scatter"):
        assert ops[bad] == 0, (bad, _coll_lines(txt, bad)[:3])


def test_mesh_eval_forward_gathers_only_topk(setup):
    """The eval forward's only all-gather is the per-row top-k's batch
    gather (bounded at B x H*W floats); params and features never
    gather."""
    mcfg, scfg, params, state, batch = setup
    mesh = mesh_lib.make_mesh((8,))
    params_r = mesh_lib.replicate_tree(mesh, params)
    db = mesh_lib.shard_batch(mesh, batch)
    es = steps_lib.make_eval_step(mcfg, scfg, mesh=mesh)
    txt = es.forward.lower(params_r, state, db,
                           jax.random.PRNGKey(0)).compile().as_text()
    for line in _coll_lines(txt, "all-gather"):
        assert "top_k" in line, line
    assert _collectives(txt)["all-to-all"] == 0


def test_mesh_eval_matches_unmeshed(setup):
    """The shard_map'd decode is the same math: ade/fde and the psum'd
    sums match the single-device program."""
    mcfg, scfg, params, state, batch = setup
    key = jax.random.PRNGKey(0)
    es0 = steps_lib.make_eval_step(mcfg, scfg)
    out0 = es0(params, state, jax.tree.map(jnp.asarray, batch), key)
    for mesh in (mesh_lib.make_mesh((8,)),
                 mesh_lib.make_hybrid_mesh(2, 4)):
        es = steps_lib.make_eval_step(mcfg, scfg, mesh=mesh)
        out = es(mesh_lib.replicate_tree(mesh, params), state,
                 mesh_lib.shard_batch(mesh, batch), key)
        np.testing.assert_allclose(np.asarray(out["ade"]),
                                   np.asarray(out0["ade"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(out["ade_sum"]),
                                   float(out0["ade_sum"]), rtol=1e-5)
        np.testing.assert_allclose(float(out["n"]), float(out0["n"]))


def test_spatial_mesh_falls_back_to_gspmd(setup):
    """A ('data', 'space') mesh must NOT take the shard_map decode (the
    features' H axis is sharded there); the step still builds and runs."""
    mcfg, scfg, params, state, batch = setup
    mesh = mesh_lib.make_spatial_mesh(2, 4)
    es = steps_lib.make_eval_step(mcfg, scfg, mesh=mesh)
    db = mesh_lib.shard_batch(mesh, batch)
    out = es(mesh_lib.replicate_tree(mesh, params), state, db,
             jax.random.PRNGKey(0))
    assert np.isfinite(float(out["ade_sum"]))


def _two_shape_dataset():
    """Synthetic df + images with TWO distinct raw image shapes."""
    rng = np.random.default_rng(0)
    dfs, images = [], {}
    for i, hw in enumerate([(192, 256), (256, 320)]):
        scene = f"shape{i}"
        d = synth_lib.make_synthetic_scene_df(
            rng, scene_id=scene, n_traj=8, total_len=TOTAL_LEN,
            img_hw=hw)
        d["metaId"] = d["metaId"] + 100 * i
        dfs.append(d)
        images[scene] = rng.uniform(0, 1, size=(*hw, 3)).astype(
            np.float32)
    return pd.concat(dfs, ignore_index=True), images


def test_one_program_per_shape_bucket(tmp_path):
    """Shape-diverse data compiles exactly one forward + one decode per
    (image shape, batch) bucket, and a second pass re-traces nothing —
    the guard against a recompilation storm (data/scenes.py:96-101)."""
    df, images = _two_shape_dataset()
    params = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0, n_goal=4,
        n_traj=1, batch_size=8, dataset_name="sdd", train_net="train",
        network="original", n_round=1, seed=1, ckpt_path=str(tmp_path),
        segmentation_model_fp=None))
    exp = Experiment(params, images=images)
    batches = exp.prepare_data(df, None, "test")
    shapes = {b.shape_key for b in batches}
    assert len(shapes) == 2, shapes  # the dataset really is 2-bucket
    step = steps_lib.make_eval_step(exp.mcfg, exp._step_config())
    ade, fde, _, _ = exp._evaluate(batches, step, jax.random.PRNGKey(0))
    assert np.isfinite(ade) and np.isfinite(fde)
    assert step.forward._cache_size() == 2
    assert step.decode_and_score._cache_size() == 2
    # second pass: dispatch-only, zero new traces
    exp._evaluate(batches, step, jax.random.PRNGKey(1))
    assert step.forward._cache_size() == 2
    assert step.decode_and_score._cache_size() == 2
