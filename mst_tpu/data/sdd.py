"""SDD (Stanford Drone Dataset) offline builder.

Behavior-matched to reference utils/sdd_dataset.py: parse per-scene
annotations.txt, take bbox centers, drop lost samples, assign global
metaIds, then split fragments -> downsample -> filter short -> sliding
window, and finally write style-bucket pickles (per agent type or per
variation-factor range). CLI: python -m mst_tpu.data.sdd ...
"""

import argparse
import os

import pandas as pd

from mst_tpu.data.trajectories import (
    compute_distance_with_neighbors,
    create_dataset_by_agent_type,
    create_dataset_given_range,
    downsample,
    filter_short_trajectories,
    get_varf_table,
    sliding_window,
    split_fragmented,
)

SDD_COLS = ["trackId", "xmin", "ymin", "xmax", "ymax", "frame", "lost",
            "occluded", "generated", "label"]


def load_raw_sdd(path):
    """annotations/<scene>/<videoN>/annotations.txt -> trajectory df
    (reference sdd_dataset.py:11-41)."""
    data_path = os.path.join(path, "annotations")
    frames = []
    for scene_main in sorted(os.listdir(data_path)):
        scene_main_path = os.path.join(data_path, scene_main)
        for scene_sub in sorted(os.listdir(scene_main_path)):
            annot = os.path.join(scene_main_path, scene_sub,
                                 "annotations.txt")
            df = pd.read_csv(annot, header=0, names=SDD_COLS, delimiter=" ")
            df["x"] = (df["xmax"] + df["xmin"]) / 2
            df["y"] = (df["ymax"] + df["ymin"]) / 2
            df = df[df["lost"] == 0]
            df = df.drop(columns=["xmin", "xmax", "ymin", "ymax",
                                  "occluded", "generated", "lost"])
            df["sceneId"] = f"{scene_main}_{scene_sub.split('video')[1]}"
            frames.append(df)
    data = pd.concat(frames, ignore_index=True)
    key = data["sceneId"] + "_" + data["trackId"].astype(str).str.zfill(4)
    data["metaId"] = pd.factorize(key)[0]
    return data


def load_and_window_sdd(path, step, window_size, stride):
    """reference sdd_dataset.py:44-50.

    The split/downsample/filter/window chain runs through the fused native
    kernel when available (mst_tpu.native, single pass over ~10M rows;
    parity with the pandas pipeline pinned by tests/test_native.py) and
    falls back to the pandas stages otherwise."""
    from mst_tpu import native

    df = load_raw_sdd(path)
    fast = native.load_and_window_native(df, step, window_size, stride,
                                         split_fragments=True)
    if fast is not None:
        return fast
    df = split_fragmented(df)
    df = downsample(df, step=step)
    df = filter_short_trajectories(df, threshold=window_size)
    df = sliding_window(df, window_size=window_size, stride=stride)
    return df


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--additional_data_dir", default="data/sdd/raw")
    parser.add_argument("--raw_data_dir", default="data/sdd/raw")
    parser.add_argument("--raw_data_filename", default="data_8_12_2_5fps.pkl")
    parser.add_argument("--filter_data_dir",
                        default="data/sdd/filter/shortterm")
    parser.add_argument("--reload", action="store_true")
    parser.add_argument("--statistic_only", action="store_true")
    parser.add_argument("--same_group_size", action="store_true",
                        help="scene-balanced subsample every style "
                             "bucket to the smallest bucket's size "
                             "(reduce_group_size)")
    parser.add_argument("--step", default=12, type=int)
    parser.add_argument("--window_size", default=20, type=int)
    parser.add_argument("--stride", default=20, type=int)
    parser.add_argument("--obs_len", default=8, type=int)
    parser.add_argument("--varf", default=None, nargs="+")
    parser.add_argument("--varf_ranges", default=[(0.5, 3.5), (4, 8)])
    parser.add_argument("--labels", default=["Pedestrian", "Biker"],
                        nargs="+")
    parser.add_argument("--selected_scenes", default=None, nargs="+")
    args = parser.parse_args()
    args.labels.sort()

    if not args.reload:
        df = load_and_window_sdd(args.raw_data_dir, args.step,
                                 args.window_size, args.stride)
        if args.varf is not None and any(
                "dist" in f or "den" in f for f in args.varf):
            out = df.groupby("sceneId", group_keys=True).apply(
                compute_distance_with_neighbors)
            for scene in out.index.get_level_values("sceneId").unique():
                df.loc[out[scene].index, "dist"] = out[scene].values
        df.to_pickle(os.path.join(args.raw_data_dir, args.raw_data_filename))
        varf_table = get_varf_table(df, ["avg_vel", "max_acc"], args.obs_len)
        varf_table.to_pickle(os.path.join(
            args.additional_data_dir,
            args.raw_data_filename.replace("data", "varf")))
    else:
        df = pd.read_pickle(
            os.path.join(args.raw_data_dir, args.raw_data_filename))

    if args.varf is not None:
        if args.varf == ["agent_type"]:
            out_dir = os.path.join(args.filter_data_dir, args.varf[0])
            create_dataset_by_agent_type(
                df, args.labels, out_dir, args.statistic_only,
                selected_scenes=args.selected_scenes,
                same_group_size=args.same_group_size)
        else:
            out_dir = os.path.join(args.filter_data_dir,
                                   "__".join(args.varf),
                                   "_".join(args.labels))
            create_dataset_given_range(
                df, args.varf, args.varf_ranges, args.labels, out_dir,
                obs_len=args.obs_len, statistic_only=args.statistic_only,
                same_group_size=args.same_group_size)


if __name__ == "__main__":
    main()
