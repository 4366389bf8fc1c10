"""Dataset-builder and batching tests (synthetic golden inputs).

The windowing ops are checked against a torch-free reimplementation of the
reference's groupby.apply semantics (utils/data_utils.py) on small synthetic
tables, and the SDD/inD builders against hand-written annotation files.
"""

import os

import numpy as np
import pandas as pd
import pytest

from mst_tpu.data import trajectories as T
from mst_tpu.data import splits as S
from mst_tpu.data.scenes import bucket_by_shape, make_scene_batches
from mst_tpu.data.sdd import load_and_window_sdd, load_raw_sdd
from mst_tpu.data.ind import load_and_window_ind
from mst_tpu.data.images import (
    augment_data,
    pad_images,
    preprocess_scene_images,
    resize_images,
)
from mst_tpu.data.synthetic import make_synthetic_dataset


# ---------------------------------------------------------------------------
# reference-semantics oracles (groupby.apply style, as in the reference)
# ---------------------------------------------------------------------------

def oracle_sliding_window(df, window_size, stride):
    chunks = []
    new_ids = []
    for mid, g in df.groupby("metaId", sort=True):
        n_chunk = (len(g) - window_size) // stride + 1
        for i in range(n_chunk):
            chunk = g.iloc[i * stride:i * stride + window_size]
            chunks.append(chunk)
            new_ids += [f"{mid}_{i}"] * window_size
    out = pd.concat(chunks)
    out["metaId"] = pd.factorize(np.asarray(new_ids))[0]
    return out.reset_index(drop=True)


def _traj_df(rows):
    return pd.DataFrame(rows, columns=["metaId", "frame", "x", "y",
                                       "sceneId", "label"])


class TestWindowing:
    def test_downsample(self):
        df = _traj_df([(0, f, f, f, "s", "Ped") for f in range(10)]
                      + [(1, f, f, f, "s", "Ped") for f in range(7)])
        out = T.downsample(df, step=3)
        assert list(out[out.metaId == 0].frame) == [0, 3, 6, 9]
        assert list(out[out.metaId == 1].frame) == [0, 3, 6]

    def test_filter_short(self):
        df = _traj_df([(0, f, 0, 0, "s", "P") for f in range(5)]
                      + [(1, f, 0, 0, "s", "P") for f in range(3)])
        out = T.filter_short_trajectories(df, threshold=5)
        assert set(out.metaId) == {0}

    def test_split_fragmented(self):
        df = _traj_df([(0, f, 0, 0, "s", "P") for f in [0, 1, 2, 5, 6]]
                      + [(1, f, 0, 0, "s", "P") for f in [0, 1]])
        out = T.split_fragmented(df)
        # track 0 splits at the 2->5 gap
        sizes = out.groupby("metaId").size()
        assert sorted(sizes.tolist()) == [2, 2, 3]
        assert out.metaId.nunique() == 3

    @pytest.mark.parametrize("window,stride", [(4, 4), (4, 2), (5, 3)])
    def test_sliding_window_matches_oracle(self, window, stride, rng):
        rows = []
        for mid, n in [(0, 11), (1, 4), (2, 9)]:
            for f in range(n):
                rows.append((mid, f, rng.uniform(), rng.uniform(), "s", "P"))
        df = _traj_df(rows)
        got = T.sliding_window(df, window, stride)
        want = oracle_sliding_window(df, window, stride)
        assert len(got) == len(want)
        np.testing.assert_array_equal(got.metaId.values, want.metaId.values)
        np.testing.assert_allclose(got.x.values, want.x.values)
        np.testing.assert_array_equal(got.frame.values, want.frame.values)

    def test_varf_vel(self):
        # constant speed 5 px/frame, frame step 2 -> vel 2.5
        rows = [(0, 2 * t, 5.0 * t, 0.0, "s", "P") for t in range(6)]
        stats = T.aggregate_per_varf_value(_traj_df(rows), "avg_vel",
                                           obs_len=None)
        np.testing.assert_allclose(stats.avg_vel[0], 2.5)

    def test_varf_table(self):
        rows = [(0, t, 3.0 * t, 4.0 * t, "sceneA_0", "P") for t in range(6)]
        rows += [(1, t, 1.0 * t, 0.0, "sceneA_0", "B") for t in range(6)]
        table = T.get_varf_table(_traj_df(rows), ["avg_vel"], obs_len=4)
        assert set(table.columns) >= {"metaId", "label", "sceneId", "scene",
                                      "avg_vel"}
        np.testing.assert_allclose(
            table[table.metaId == 0].avg_vel.iloc[0], 5.0)
        np.testing.assert_allclose(
            table[table.metaId == 1].avg_vel.iloc[0], 1.0)


class TestBuilders:
    @pytest.fixture
    def sdd_root(self, tmp_path, rng):
        root = tmp_path / "sdd_raw"
        for scene, video in [("alpha", "video0"), ("alpha", "video1")]:
            d = root / "annotations" / scene / video
            os.makedirs(d)
            rows = ["trackId xmin ymin xmax ymax frame lost occluded "
                    "generated label"]
            for track in range(2):
                for f in range(60):
                    x, y = 10 * track + f, 20 + f
                    lost = 1 if (track == 1 and f % 7 == 0) else 0
                    rows.append(f'{track} {x-2} {y-2} {x+2} {y+2} {f} {lost}'
                                f' 0 0 "Pedestrian"')
            (d / "annotations.txt").write_text("\n".join(rows))
        return str(root)

    def test_load_raw_sdd(self, sdd_root):
        df = load_raw_sdd(sdd_root)
        assert set(df.columns) == {"trackId", "frame", "label", "x", "y",
                                   "sceneId", "metaId"}
        assert set(df.sceneId) == {"alpha_0", "alpha_1"}
        assert df.metaId.nunique() == 4
        assert (df.label == "Pedestrian").all()
        # bbox center
        row = df.iloc[0]
        assert row.x == pytest.approx(row.x)

    def test_sdd_window_pipeline(self, sdd_root):
        df = load_and_window_sdd(sdd_root, step=2, window_size=10, stride=10)
        sizes = df.groupby("metaId").size().unique()
        assert list(sizes) == [10]
        # every window has continuous downsampled frames
        for _, g in df.groupby("metaId"):
            steps = np.unique(np.diff(g.frame.to_numpy()))
            assert len(steps) == 1

    @pytest.fixture
    def ind_root(self, tmp_path):
        root = tmp_path / "ind"
        os.makedirs(root)
        for rec in ["00", "07"]:
            rows = []
            for track in range(2):
                for f in range(80):
                    rows.append(dict(
                        recordingId=int(rec), trackId=track, frame=f,
                        trackLifetime=f, xCenter=10.0 + f, yCenter=-(5 + f),
                        heading=0, width=1, length=1, xVelocity=0,
                        yVelocity=0, xAcceleration=0, yAcceleration=0,
                        lonVelocity=0, latVelocity=0, lonAcceleration=0,
                        latAcceleration=0))
            pd.DataFrame(rows).to_csv(root / f"{rec}_tracks.csv", index=False)
            pd.DataFrame([
                dict(trackId=0, **{"class": "pedestrian"}),
                dict(trackId=1, **{"class": "car"}),
            ]).to_csv(root / f"{rec}_tracksMeta.csv", index=False)
        return str(root)

    def test_ind_pipeline(self, ind_root):
        df = load_and_window_ind(step=4, window_size=10, stride=10,
                                 scenes=(1, 2), path=ind_root,
                                 recordings=["00", "07"])
        assert set(df.sceneId) == {"scene1", "scene2"}
        assert set(df.label) == {"pedestrian", "car"}
        # y flipped positive, meters->px conversion applied per scene
        assert (df.y > 0).all()
        s1 = df[df.sceneId == "scene1"].iloc[0]
        s2 = df[df.sceneId == "scene2"].iloc[0]
        assert s1.x == pytest.approx((10.0 + s1.frame) / (0.0127 * 12))
        assert s2.x == pytest.approx((10.0 + s2.frame) / (0.00814 * 12))


class TestSplits:
    def _df(self, n_meta=20, length=4):
        rows = []
        for m in range(n_meta):
            for f in range(length):
                rows.append(dict(metaId=m, frame=f, x=1.0 * f, y=0.0,
                                 sceneId="s", label="P"))
        return pd.DataFrame(rows)

    def test_ratio_split(self):
        df = self._df(20)
        tr, va, te = S.dataset_split_by_ratio(df, val_split=0.1,
                                              test_split=5)
        assert tr.metaId.nunique() == 13
        assert va.metaId.nunique() == 2
        assert te.metaId.nunique() == 5
        assert not set(tr.metaId) & set(te.metaId)

    def test_share_val_test(self):
        df = self._df(20)
        tr, va, te = S.dataset_split_by_ratio(
            df, val_split=2, test_split=6, share_val_test=True)
        assert te.metaId.nunique() == 6
        assert set(va.metaId) <= set(te.metaId)
        assert tr.metaId.nunique() == 14

    def test_limit_samples(self):
        df = self._df(20)
        out = S.limit_samples(df, num=2, batch_size=5, random_ids=False)
        assert out.metaId.nunique() == 10


class TestBatching:
    def test_fixed_shape_batches(self):
        df, images = make_synthetic_dataset(seed=0, n_scenes=2, n_traj=5,
                                            total_len=12)
        imgs = preprocess_scene_images(images, 0.25, 32)
        batches = make_scene_batches(df, imgs, total_len=12, batch_size=4,
                                     resize_factor=0.25)
        assert len(batches) == 4  # 2 scenes x ceil(5/4)
        for b in batches:
            assert b.trajectories.shape == (4, 12, 2)
            assert b.image.shape[0] % 32 == 0 and b.image.shape[1] % 32 == 0
        masks = sorted(b.mask.sum() for b in batches)
        assert masks == [1, 1, 4, 4]
        buckets = bucket_by_shape(batches)
        assert len(buckets) == 1  # same image size -> one compiled program

    def test_augmentation_geometry(self, rng):
        df, images = make_synthetic_dataset(seed=1, n_scenes=1, n_traj=3,
                                            total_len=12)
        raw = {k: (v * 255).astype(np.uint8) for k, v in images.items()}
        df_aug, img_aug = augment_data(df.copy(), dict(raw))
        assert df_aug.sceneId.nunique() == 8  # 4 rotations x 2 (flip)
        assert len(img_aug) == 8
        # rot90 must keep points in-bounds of the rotated image
        for scene in df_aug.sceneId.unique():
            H, W = img_aug[scene].shape[:2]
            g = df_aug[df_aug.sceneId == scene]
            assert (g.x >= -1).all() and (g.x <= W + 1).all()
            assert (g.y >= -1).all() and (g.y <= H + 1).all()
        # metaIds must not collide across pseudo-scenes
        per_scene = df_aug.groupby("sceneId").metaId.unique()
        all_ids = np.concatenate(per_scene.values)
        assert len(all_ids) == len(np.unique(all_ids))

    def test_image_resize_pad(self):
        imgs = {"a": np.zeros((100, 130, 3), np.uint8)}
        imgs = resize_images(imgs, 0.25)
        # cv2 rounds the scaled size half-to-even: 130*0.25 = 32.5 -> 32
        assert imgs["a"].shape[:2] == (25, 32)
        imgs = pad_images(imgs, 32)
        assert imgs["a"].shape[:2] == (32, 32)
