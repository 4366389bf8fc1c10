"""ETH/UCY end-to-end: seg-mask scenes + homographies through
Experiment.train/test.

Exercises the full eth data path the reference carries
(utils/image_utils.py:138-162, utils/evaluate.py:104-107,271-277) in one
flow: oracle.png grayscale-mask loading and one-hot (seg_mask branch),
<scene>_H.txt homography discovery + caching (incl. the eth/hotel x/y
swap and underscore scene names like uni_examples), the validation scene
budget (break once batch_size * n_scenes > 30), and world-coordinate
minADE/minFDE metrics.
"""

import os

import cv2
import numpy as np
import pytest

from mst_tpu import config as config_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12
OBS_LEN = 4
SCENES = ["eth", "students003", "uni_examples"]


@pytest.fixture(scope="module")
def eth_world(tmp_path_factory):
    """On-disk eth-format world: mask images + homographies + df."""
    root = tmp_path_factory.mktemp("eth_world")
    rng = np.random.default_rng(3)

    df, _ = make_synthetic_dataset(
        seed=3, n_scenes=len(SCENES), n_traj=8, total_len=TOTAL_LEN,
        img_hw=(128, 160))
    scene_map = {f"synth_{i}": s for i, s in enumerate(SCENES)}
    df["sceneId"] = df["sceneId"].map(scene_map)

    image_path = root / "images"
    for scene in SCENES:
        d = image_path / scene
        d.mkdir(parents=True)
        # grayscale class-id mask, values in {0,1,2} (oracle.png layout;
        # loaded with cv2.imread(p, 0) and one-hot per class)
        mask = rng.integers(0, 3, size=(128, 160)).astype(np.uint8)
        cv2.imwrite(str(d / "oracle.png"), mask)

    homo_dir = root / "data" / "eth_ucy"
    homo_dir.mkdir(parents=True)
    for scene, scale in zip(SCENES, (0.05, 0.02, 0.04)):
        H = np.diag([scale, scale, 1.0]).astype(np.float64)
        np.savetxt(homo_dir / f"{scene}_H.txt", H)

    return root, str(image_path), df


def make_params(root, tmp_path, **over):
    params = config_lib.get_params(overrides=dict(
        obs_len=OBS_LEN, pred_len=TOTAL_LEN - OBS_LEN, waypoints=[7],
        n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.5, temperature=1.0,
        n_goal=4, n_traj=1, batch_size=4, lr=3e-4, n_epoch=1,
        dataset_name="eth", data_dir=str(root / "data"),
        ckpt_path=str(tmp_path), train_net="train", network="original",
        n_round=1, seed=1, shuffle=False, save_every_n=100,
        segmentation_model_fp=None,
        # world-meter metrics are opt-in (--eth_world_coords); the default
        # is the pixel-space parity path (docs/parity.md) — these tests
        # exercise the world-coordinate branch explicitly
        eth_world_coords=True,
    ))
    params.update(over)
    return params


def _split(df):
    ids = df.metaId.unique()
    return (df[df.metaId.isin(ids[:-8])], df[df.metaId.isin(ids[-8:-4])],
            df[df.metaId.isin(ids[-4:])])


def test_eth_train_and_test_end_to_end(tmp_path, eth_world):
    root, image_path, df = eth_world
    df_train, df_val, df_test = _split(df)
    params = make_params(root, tmp_path)
    exp = Experiment(params)

    val_ade, val_fde = exp.train(df_train, df_val, image_path, image_path,
                                 "eth_e2e")
    assert all(np.isfinite(val_ade)) and all(np.isfinite(val_fde))

    ade, fde, dfs, _ = exp.test(df_test, image_path)
    assert np.isfinite(ade) and np.isfinite(fde)
    # world coords: at ~0.05 px->m scale, errors are a few meters, never
    # hundreds of px (i.e. the homography really was applied)
    assert 0 < ade < 50 and 0 < fde < 50
    assert dfs[0].metaId.nunique() == df_test.metaId.nunique()
    # the eth scene's homography cache carries the x/y swap permutation
    H = exp._homography_for("eth")
    assert H[0, 0] == 0 and H[0, 1] == pytest.approx(0.05)
    # underscore scene names resolve their own file (uni_examples_H.txt)
    H2 = exp._homography_for("uni_examples")
    assert H2[0, 0] == pytest.approx(0.04)
    # augmentation suffixes strip down to the same file
    np.testing.assert_array_equal(
        exp._homography_for("uni_examples_rot90"), H2)


def test_eth_fused_matches_loop(tmp_path, eth_world):
    """--fused stacks per-batch homographies; world-coord validation in
    the scanned program must match the loop path."""
    import jax

    root, image_path, df = eth_world
    df_train, df_val, df_test = _split(df)
    outs = []
    for tag, fused in (("loop", False), ("fused", True)):
        params = make_params(root, tmp_path / tag, fused=fused, n_epoch=2)
        exp = Experiment(params)
        va, vf = exp.train(df_train, df_val, image_path, image_path,
                           f"eth_{tag}")
        outs.append((np.asarray(va), np.asarray(vf),
                     jax.device_get(exp.model_params)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=5e-4,
                               atol=5e-4)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=5e-4,
                               atol=5e-4)
    for a, b in zip(jax.tree.leaves(outs[0][2]),
                    jax.tree.leaves(outs[1][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_eth_metrics_scale_with_homography(tmp_path, eth_world):
    """Doubling the world scale doubles the reported metrics — the eval
    really measures in homography-transformed world coordinates
    (reference image_utils.py:138-162)."""
    root, image_path, df = eth_world
    scene_df = df[df.sceneId == "students003"]
    df_test = scene_df[scene_df.metaId.isin(scene_df.metaId.unique()[-3:])]

    homo = root / "data" / "eth_ucy" / "students003_H.txt"
    orig = homo.read_text()
    try:
        ades = []
        for scale in (0.02, 0.04):
            np.savetxt(homo, np.diag([scale, scale, 1.0]))
            params = make_params(root, tmp_path, seed=7)
            exp = Experiment(params)
            ade, _, _, _ = exp.test(df_test, image_path)
            ades.append(ade)
        assert ades[1] == pytest.approx(2 * ades[0], rel=1e-3)
    finally:
        homo.write_text(orig)


def test_eth_defaults_to_pixel_space(tmp_path, eth_world):
    """Without --eth_world_coords, eth metrics are PIXEL-space (the
    bit-for-bit reference-parity path): changing the homography scale
    must not change the reported metrics, and the step config carries
    world_coords=False."""
    root, image_path, df = eth_world
    scene_df = df[df.sceneId == "students003"]
    df_test = scene_df[scene_df.metaId.isin(scene_df.metaId.unique()[-3:])]

    homo = root / "data" / "eth_ucy" / "students003_H.txt"
    orig = homo.read_text()
    try:
        ades = []
        for scale in (0.02, 0.04):
            np.savetxt(homo, np.diag([scale, scale, 1.0]))
            params = make_params(root, tmp_path, seed=7)
            params["eth_world_coords"] = False
            exp = Experiment(params)
            assert exp._step_config().world_coords is False
            ade, _, _, _ = exp.test(df_test, image_path)
            ades.append(ade)
        assert ades[0] == pytest.approx(ades[1], rel=1e-6)
        # pixel-space errors on a 128x160 scene are O(10-100) px, not the
        # few world meters the 0.02-scale homography would produce
        assert ades[0] > 1.0
    finally:
        homo.write_text(orig)


def test_eth_validation_scene_budget(tmp_path, eth_world):
    """batch_size=30 -> budget 30//30=1 scene: validation silently drops
    the other scenes (reference evaluate.py:104-107) and training still
    completes."""
    root, image_path, df = eth_world
    df_train, _, _ = _split(df)
    # validate on ALL scenes so the budget has something to cut
    params = make_params(root, tmp_path, batch_size=30, n_epoch=1)
    exp = Experiment(params)
    val_ade, val_fde = exp.train(df_train, df, image_path, image_path,
                                 "eth_budget")
    assert all(np.isfinite(val_ade)) and all(np.isfinite(val_fde))
