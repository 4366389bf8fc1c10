"""Host-side data pipeline benchmark at pretrain scale.

The reference hides its preprocessing cost inside Python (SURVEY §7 hard
part 6); at TPU step rates the host path is the next wall. This measures
the three host stages on a synthetic pretrain-scale workload (N scenes at
SDD raw resolution, 4x augmentation) and A/Bs the shipped augment_data
against the reference-shaped variant (per-scene pd.concat on a growing
frame + k-times ROTATE_90 loops, reference data_utils.py:176-233) to
quantify the restructure.

Run on a QUIET machine (1-CPU VMs under concurrent load produce garbage):
    python benchmarks/host_pipeline.py [--n_scenes 12]
"""

import argparse
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from mst_tpu.data import images as images_lib  # noqa: E402
from mst_tpu.data import scenes as scenes_lib  # noqa: E402


def make_workload(n_scenes, n_traj=40, total_len=20, hw=(1424, 1920)):
    rng = np.random.default_rng(0)
    raw = {f"s{i}_0": (rng.random((*hw, 3)) * 255).astype(np.uint8)
           for i in range(n_scenes)}
    rows, mid = [], 0
    for s in raw:
        for _ in range(n_traj):
            for t in range(total_len):
                rows.append((mid, t, rng.uniform(0, hw[1]),
                             rng.uniform(0, hw[0]), s, "Pedestrian"))
            mid += 1
    df = pd.DataFrame(
        rows, columns=["metaId", "frame", "x", "y", "sceneId", "label"])
    return df, raw


def _rot_ref(df, image, k):
    """Reference rot(): df coordinate math + k repeated 90-degree rotates
    (data_utils.py:115-144)."""
    import cv2

    xy = df.copy()
    y0, x0 = image.shape[:2]
    xy["x"] = xy["x"] - x0 / 2
    xy["y"] = xy["y"] - y0 / 2
    c, s = np.cos(-k * np.pi / 2), np.sin(-k * np.pi / 2)
    R = np.array([[c, s], [-s, c]])
    xy[["x", "y"]] = xy[["x", "y"]].to_numpy() @ R
    for _ in range(k):
        image = cv2.rotate(image, cv2.ROTATE_90_COUNTERCLOCKWISE)
    y0, x0 = image.shape[:2]
    xy["x"] = xy["x"] + x0 / 2
    xy["y"] = xy["y"] + y0 / 2
    return xy, image


def augment_reference_shaped(data, images):
    """The reference's augment loop shape (data_utils.py:176-233): concat
    onto the growing frame per scene, k repeated 90-degree rotates."""
    k2rot = {1: "_rot90", 2: "_rot180", 3: "_rot270"}
    data_orig = data.copy()
    for k in (1, 2, 3):
        meta_max = data["metaId"].max()
        for scene in data_orig.sceneId.unique():
            df_rot, im = _rot_ref(
                data_orig[data_orig.sceneId == scene], images[scene], k)
            new_scene = scene + k2rot[k]
            images[new_scene] = im
            df_rot["sceneId"] = new_scene
            df_rot["metaId"] = df_rot["metaId"] + meta_max + 1
            data = pd.concat([data, df_rot], axis=0)
    meta_max = data["metaId"].max()
    for scene in list(data.sceneId.unique()):
        df_flip, im_flip = images_lib.fliplr_df_image(
            data[data.sceneId == scene], images[scene])
        df_flip["sceneId"] = df_flip["sceneId"] + "_fliplr"
        df_flip["metaId"] = df_flip["metaId"] + meta_max + 1
        data = pd.concat([data, df_flip], axis=0)
        images[scene + "_fliplr"] = im_flip
    return data, images


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_scenes", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    df, raw = make_workload(args.n_scenes)
    print(f"workload: {args.n_scenes} scenes @1424x1920, "
          f"{df.metaId.nunique()} trajectories")

    def timed(name, fn, n=args.repeats):
        best = min(timeit(fn) for _ in range(n))
        print(f"{name:32s} {best:7.2f}s")
        return best

    def timeit(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    t_ref = timed("augment (reference-shaped)", lambda: (
        augment_reference_shaped(df, {k: v.copy() for k, v in raw.items()})))
    t_new = timed("augment (shipped)", lambda: (
        images_lib.augment_data(df, {k: v.copy() for k, v in raw.items()})))
    print(f"augment speedup: {t_ref / t_new:.2f}x")

    df_aug, raw_aug = images_lib.augment_data(
        df, {k: v.copy() for k, v in raw.items()})
    timed("preprocess (resize/pad/norm)", lambda: (
        images_lib.preprocess_scene_images(raw_aug, 0.25, 32, False, 6)))
    imgs = images_lib.preprocess_scene_images(raw_aug, 0.25, 32, False, 6)
    timed("batch build", lambda: scenes_lib.make_scene_batches(
        df_aug, imgs, 20, 8, 0.25, shuffle=True,
        rng=np.random.default_rng(1)))

    # parity: shipped == reference-shaped, row order and ids included
    a, ia = images_lib.augment_data(
        df, {k: v.copy() for k, v in raw.items()})
    b, ib = augment_reference_shaped(
        df, {k: v.copy() for k, v in raw.items()})
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert set(ia) == set(ib)
    for k in ia:
        np.testing.assert_array_equal(ia[k], ib[k])
    print("parity: shipped augment == reference-shaped (rows, ids, images)")


if __name__ == "__main__":
    main()
