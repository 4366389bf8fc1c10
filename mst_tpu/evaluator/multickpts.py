"""Multi-checkpoint comparator (reference evaluator/evaluate_multickpts.py).

Evaluate N checkpoints on the same focus subset, merge per-metaId ADE/FDE
into a comparison csv, optionally plot predictions.
CLI: python -m mst_tpu.evaluator.multickpts ...
"""

import pathlib

import numpy as np
import pandas as pd

from mst_tpu import config as config_lib
from mst_tpu.data.splits import prepare_dataset
from mst_tpu.train.trainer import Experiment
from mst_tpu.utils.seeding import set_random_seeds


def get_meta_ids_focus(df=None, given_meta_ids=None, given_csv=None,
                       random_n=None):
    """reference utils/data_utils.py:914-942."""
    if given_meta_ids is not None:
        return ([given_meta_ids] if isinstance(given_meta_ids, int)
                else list(given_meta_ids))
    if given_csv and given_csv.get("path"):
        col1, col2, op = given_csv["name"].split("__")
        result = pd.read_csv(given_csv["path"])
        diff = result[col1].values - result[col2].values
        if op == "abs_diff":
            diff = np.abs(diff)
        elif op != "diff":
            raise ValueError(f"Invalid op={op}")
        result["diff"] = diff
        return result.sort_values("diff", ascending=False).head(
            given_csv["n_limited"]).metaId.values
    if random_n is not None:
        ids = df.metaId.unique()
        np.random.shuffle(ids)
        return ids[:random_n]
    return df.metaId.unique()


def restore(params, is_separated, base_ckpt, separated_ckpt=None):
    """Alias of trainer.restore_model (reference utils/util.py:138-147)."""
    from mst_tpu.train.trainer import restore_model

    return restore_model(params, is_separated, base_ckpt, separated_ckpt)


def compare_checkpoints(params, df_test, image_path, ckpts, ckpts_name,
                        is_file_separated, n_round, seed=1, out_dir=None,
                        images=None):
    """Evaluate each checkpoint; return the merged per-metaId csv frame."""
    df_result = None
    trajs_by_ckpt = {}
    batches = None
    for i, (ckpt, name) in enumerate(zip(ckpts, ckpts_name)):
        print(f"====== Testing for {name} ======")
        p = dict(params, n_round=n_round, seed=seed)
        model = restore(p, is_file_separated[i],
                        ckpt if not is_file_separated[i] else ckpts[0],
                        None if not is_file_separated[i] else ckpt)
        if images is not None:
            model._images_override = images
        set_random_seeds(seed)
        if batches is None:
            # the host image prep + batch build depends only on the data
            # params (shared by every checkpoint), so the first model's
            # prepared batches serve all of them
            batches = model.prepare_data(df_test, image_path, "test")
        _, _, list_metrics, list_trajs = model.test(
            df_test, image_path, return_preds=True, batches=batches)
        merged = list_metrics[0].copy()
        for r in range(1, n_round):
            merged[["ade", "fde"]] += list_metrics[r][["ade", "fde"]]
        merged[["ade", "fde"]] /= n_round
        merged = merged.rename(
            {"ade": f"ade_{name}", "fde": f"fde_{name}"}, axis=1)
        df_result = merged if df_result is None else df_result.merge(
            merged, on=["metaId", "sceneId"])
        trajs_by_ckpt[name] = list_trajs
    if out_dir:
        pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
        csv_name = f"{'_'.join(ckpts_name)}__N" \
                   f"{df_test.metaId.nunique()}_R{n_round}"
        out = f"{out_dir}/{csv_name}.csv"
        df_result.to_csv(out, index=False)
        print(f"Saved {out}")
    return df_result, trajs_by_ckpt


def plot_prediction_overlays(df_result, trajs_by_ckpt, raw_images, params,
                             out_dir="figures/prediction"):
    """Per-scene observed/groundtruth/per-checkpoint prediction overlays on
    the RAW scene image (reference evaluate_multickpts.py:79-86 ->
    plot_prediction); trajectories are already in raw pixels."""
    from mst_tpu.evaluator.visualization import plot_obs_pred_trajs

    per_ckpt = {}
    meta_ids = None
    gt = None
    for name, list_trajs in trajs_by_ckpt.items():
        t = list_trajs[0]  # round 0
        per_ckpt[name] = np.concatenate(t["prediction"])
        if meta_ids is None:
            meta_ids = np.concatenate(t["metaId"])
            gt = np.concatenate(t["groundtruth"])
    scene_of = dict(zip(df_result.metaId, df_result.sceneId))
    for scene in sorted({scene_of[m] for m in meta_ids if m in scene_of}):
        sel = np.array([scene_of.get(m) == scene for m in meta_ids])
        dict_trajs = {"gt": gt[sel]}
        dict_trajs.update({n: p[sel] for n, p in per_ckpt.items()})
        plot_obs_pred_trajs(raw_images[scene], dict_trajs, out_dir=out_dir,
                            name=f"{scene}__predictions",
                            obs_len=int(params["obs_len"]))


def main():
    parser = config_lib.get_parser(False)
    parser.add_argument("--given_meta_ids", default=None, type=int,
                        nargs="+")
    parser.add_argument("--result_path", default=None, type=str)
    parser.add_argument("--result_name", default=None, type=str)
    parser.add_argument("--result_limited", default=None, type=int)
    parser.add_argument("--random_n", default=None, type=int)
    parser.add_argument("--viz", action="store_true")
    args = parser.parse_args()

    set_random_seeds(args.seed)
    params = config_lib.get_params(args)
    image_path, data_path = config_lib.get_image_and_data_path(params)
    _, _, df_test = prepare_dataset(
        data_path, args.load_data, args.batch_size, None, None,
        args.val_files, args.val_split, args.test_splits, args.shuffle,
        args.share_val_test, "eval")
    focus = get_meta_ids_focus(
        df_test,
        given_csv={"path": args.result_path, "name": args.result_name,
                   "n_limited": args.result_limited},
        given_meta_ids=args.given_meta_ids, random_n=args.random_n)
    df_test = df_test[df_test.metaId.isin(focus)]

    ckpts, ckpts_name, is_sep = config_lib.get_ckpts_and_names(
        args.ckpts, args.ckpts_name, args.pretrained_ckpt, args.tuned_ckpts)
    folder = f"{args.seed}__{'_'.join(args.dataset_path.split('/'))}"
    # load + decode the scene images ONCE; compare_checkpoints passes them
    # to every Experiment via the images override instead of re-reading and
    # re-preprocessing them per checkpoint
    from mst_tpu.data import images as images_lib
    from mst_tpu.train.trainer import _IMAGE_FILES

    dataset_name = params["dataset_name"].lower()
    raw_images = images_lib.load_images(
        df_test.sceneId.unique(), image_path,
        _IMAGE_FILES.get(dataset_name, "reference.jpg"),
        params.get("use_raw_data", False), dataset_name == "eth")
    df_result, trajs_by_ckpt = compare_checkpoints(
        params, df_test, image_path, ckpts, ckpts_name, is_sep,
        args.n_round, args.seed, out_dir=f"csv/comparison/{folder}",
        images=raw_images)
    if args.viz:
        plot_prediction_overlays(df_result, trajs_by_ckpt, raw_images,
                                 params, out_dir=f"figures/prediction/"
                                                 f"{folder}")


if __name__ == "__main__":
    main()
