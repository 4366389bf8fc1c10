"""Config / params system.

Same contract as the reference (utils/util.py:34-59 + utils/parser.py): a
YAML file merged with CLI args into one flat params dict, CLI wins. The key
vocabulary is preserved so the reference's scripts, log-scrape tooling and
experiment-name parsing keep working; a typed accessor (`ynet_config`) lifts
the flat dict into the model dataclass.
"""

import argparse
import os
import pathlib

import numpy as np
import yaml

from mst_tpu.models.ynet import YNetConfig

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


# ---------------------------------------------------------------------------
# arg parser — same 4 groups / flags as reference utils/parser.py:6-80
# ---------------------------------------------------------------------------

def get_parser(is_train: bool) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    # data args (parser.py:6-21)
    parser.add_argument("--dataset_path", default=None, type=str)
    parser.add_argument("--ckpt_path", default="ckpts")
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--load_data", default="sequential",
                        choices=["sequential", "predefined"])
    parser.add_argument("--show_details", action="store_true")
    parser.add_argument("--val_split", default=0.1, type=float)
    parser.add_argument("--test_splits", default=None, type=int, nargs="+")
    parser.add_argument("--val_files", default=None, type=str, nargs="+")
    parser.add_argument("--share_val_test", action="store_true")
    # model args (parser.py:24-41)
    parser.add_argument("--ckpts", default=None, type=str, nargs="+")
    parser.add_argument("--ckpts_name", default=None, type=str, nargs="+")
    parser.add_argument("--pretrained_ckpt", default=None, type=str)
    parser.add_argument("--tuned_ckpt", default=None, type=str)
    parser.add_argument("--tuned_ckpts", default=None, type=str, nargs="+")
    parser.add_argument("--network",
                        choices=["original", "embed", "fusion"],
                        default="original")
    parser.add_argument("--n_fusion", default=None, type=int)
    parser.add_argument("--swap_semantic", action="store_true")
    parser.add_argument("--position", default=[], type=str, nargs="+")
    parser.add_argument("--ynet_bias", action="store_true")
    parser.add_argument("--train_net", default="train", type=str)
    # general args (parser.py:44-50)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--n_round", default=1, type=int)
    parser.add_argument("--config_filename", default=None, type=str)
    # TPU-specific additions
    parser.add_argument("--mesh_shape", default=None, type=int, nargs="+",
                        help="device mesh shape: one value for a 1D 'data' mesh (--mesh_shape 8), two for a hybrid multi-slice (replica, data) mesh over DCN x ICI (--mesh_shape 2 4)")
    parser.add_argument("--mesh_axes", default=None, type=str, nargs="+",
                        help="mesh axis names for --mesh_shape; 'data space' spatially partitions the scene maps' H dimension over the second axis (conv halo exchanges via GSPMD) for scenes too large for one chip's HBM, e.g. --mesh_shape 2 4 --mesh_axes data space")
    parser.add_argument("--compute_dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--metrics_jsonl", default=None, type=str,
                        help="write structured per-epoch train/val metrics"
                             " as JSON lines to this path (alongside the"
                             " reference-compatible stdout)")
    parser.add_argument("--cross_scene_batching", action="store_true",
                        help="fill train AND test batches across scenes"
                             " sharing a padded image shape (TPU-native;"
                             " the reference's batch_size=1 scene loader"
                             " pads every scene's last chunk — on datasets"
                             " with many small scenes, e.g. inD, most of"
                             " the batch is padding)")
    parser.add_argument("--max_scenes_per_batch", default=8, type=int)
    parser.add_argument("--eth_world_coords", action="store_true",
                        help="ETH/UCY only: report ADE/FDE in consistent"
                             " world meters (homography applied to both"
                             " prediction and ground truth). Default is"
                             " PIXEL space — the bit-for-bit parity path"
                             " vs the reference's evaluate.py (see"
                             " docs/parity.md, ETH deviation note)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize the train forward (jax.checkpoint): recompute encoder/decoder activations in the backward instead of holding them in HBM — for big-scene/big-batch training, pairs with --mesh_axes data space")
    parser.add_argument("--seg_cache_device_mb", default=512, type=int,
                        help="per-cache ceiling (MB) on device-resident cached semantic maps; scenes past it stay host-side and re-upload per batch (0 = always host)")
    if is_train:
        # train args (parser.py:53-69)
        parser.add_argument("--fine_tune", action="store_true")
        parser.add_argument("--resume", action="store_true",
                            help="resume from <ckpt_path>/<experiment>"
                                 "__train_state.npz (optimizer state, epoch,"
                                 " val history, best-ckpt tracking)")
        parser.add_argument("--n_epoch", default=100, type=int)
        parser.add_argument("--n_early_stop", default=300, type=int)
        parser.add_argument("--n_train_batch", default=None, type=float)
        parser.add_argument("--lr", default=0.0001, type=float)
        parser.add_argument("--steps", default=[], type=int, nargs="+")
        parser.add_argument("--lr_decay_ratio", default=0.1, type=float)
        parser.add_argument("--init_check", action="store_true")
        parser.add_argument("--window_size", default=9, type=int)
        parser.add_argument("--smooth_val", action="store_true")
        parser.add_argument("--train_files", default=None, type=str,
                            nargs="+")
        parser.add_argument("--fused", action="store_true",
                            help="fuse whole chunks of the epoch loop into"
                                 " ONE compiled program (lax.scan over"
                                 " epochs: train steps + validation on"
                                 " device, one host sync per chunk) —"
                                 " removes the few-shot fine-tune's"
                                 " per-step dispatch and per-epoch host"
                                 " round trips; falls back to the loop"
                                 " when ineligible (multiple scene shape"
                                 " buckets, in-step segmentation,"
                                 " multi-host)")
    return parser


# ---------------------------------------------------------------------------
# params dict (reference utils/util.py:34-59)
# ---------------------------------------------------------------------------

_DEFAULTS = dict(
    save_every_n=10, use_raw_data=False, fine_tune=False, augment=False,
    ynet_bias=False, use_CWS=False, use_TTST=False, rel_threshold=0.002,
    CWS_params=None, n_early_stop=300, steps=[], lr_decay_ratio=0.1,
    network="original", swap_semantic=False, window_size=9, smooth_val=False,
    e_unfreeze=10000, n_round=1, position=[], train_net="train",
    n_fusion=None, use_features_only=False, compute_dtype="float32",
    mesh_shape=None, mesh_axes=None, remat=False, eth_world_coords=False,
    segmentation_model_fp=None, eval_k_chunk=0,
    cross_scene_batching=False, max_scenes_per_batch=8, fused=False,
    metrics_jsonl=None,
)


def get_params(args=None, config_filename=None, overrides=None) -> dict:
    """Merge YAML config + CLI/overrides into one flat params dict."""
    params = dict(_DEFAULTS)
    fname = config_filename or (args.config_filename if args else None)
    if fname:
        # resolve like the reference: a path that exists (absolute or
        # CWD-relative, incl. a local config/ dir) wins; otherwise fall
        # back to the packaged reference configs
        if os.path.exists(fname):
            path = fname
        elif os.path.exists(os.path.join("config", fname)):
            path = os.path.join("config", fname)
        else:
            path = os.path.join(CONFIG_DIR, fname)
        with open(path) as f:
            params.update(yaml.safe_load(f))

    # pick the segmentation weight file per dataset (util.py:39-49)
    dataset_name = str(params.get("dataset_name", "")).lower()
    if params.get("data_dir") and dataset_name:
        if "sdd" in dataset_name:
            seg = "sdd_segmentation.npz"
        elif "ind" in dataset_name:
            seg = "inD_segmentation.npz"
        else:
            seg = None
        if seg:
            params["segmentation_model_fp"] = os.path.join(
                params["data_dir"], params["dataset_name"], seg)

    if args is not None:
        d = vars(args)
        ntb = d.get("n_train_batch")
        if ntb is not None and int(ntb) == ntb:
            d["n_train_batch"] = int(ntb)  # util.py:52-56
        params.update(d)
    if overrides:
        params.update(overrides)
    if params.get("network") == "fusion":
        assert params.get("n_fusion") is not None
    return params


def ynet_config(params: dict) -> YNetConfig:
    """Lift the flat params dict into the model config."""
    seg_fp = params.get("segmentation_model_fp")
    has_backbone = bool(seg_fp and os.path.exists(seg_fp))
    n_sem = params["n_semantic_classes"]
    if params.get("use_features_only", False) and has_backbone:
        # the feature-only backbone emits its decoder feature map (16 ch)
        # instead of class probabilities (reference ynet.py:503-505)
        n_sem = 16
    return YNetConfig(
        obs_len=params["obs_len"],
        pred_len=params["pred_len"],
        n_semantic_classes=n_sem,
        encoder_channels=tuple(params["encoder_channels"]),
        decoder_channels=tuple(params["decoder_channels"]),
        waypoints=tuple(params["waypoints"]),
        train_net=params.get("train_net", "train"),
        position=tuple(params.get("position", ()) or ()),
        network=params.get("network") or "original",
        n_fusion=params.get("n_fusion"),
        use_features_only=params.get("use_features_only", False),
        segmentation=("unet" if has_backbone else None),
    )


def get_image_and_data_path(params):
    """reference utils/util.py:62-75."""
    dataset_name = params["dataset_name"].lower()
    if "sdd" in dataset_name:
        image_path = os.path.join(params["data_dir"], params["dataset_name"],
                                  "raw", "annotations")
    elif "ind" in dataset_name:
        image_path = os.path.join(params["data_dir"], params["dataset_name"],
                                  "images")
    else:
        raise ValueError(f"Invalid {dataset_name}")
    assert os.path.isdir(image_path), f"image dir error: {image_path}"
    data_path = os.path.join(params["data_dir"], params["dataset_name"],
                             params["dataset_path"])
    assert os.path.isdir(data_path), f"data dir error: {data_path}"
    return image_path, data_path


# ---------------------------------------------------------------------------
# experiment naming + ckpt-name codec (reference utils/util.py:7-31,78-135)
# Kept byte-compatible: the log-scrape/analysis tooling parses these strings.
# ---------------------------------------------------------------------------

def get_experiment_name(args, n_data) -> str:
    experiment = f"Seed_{args.seed}"
    if args.load_data == "sequential":
        files = "_".join(f.replace(".pkl", "") for f in args.train_files)
        experiment += f"__{args.dataset_path.replace('/', '_')}_{files}"
    else:
        experiment += f"__{args.dataset_path.replace('/', '_')}"
    experiment += f"__{args.train_net}"
    if args.position:
        experiment += f'__Pos_{"_".join(map(str, args.position))}'
    if args.n_train_batch is not None:
        experiment += f"__TrN_{n_data}"
        experiment += f'__lr_{np.format_float_positional(args.lr, trim="-")}'
        if args.smooth_val:
            experiment += "__smooth"
        if args.n_early_stop < args.n_epoch:
            experiment += f"__early_{args.n_early_stop}"
        if args.augment:
            experiment += "__AUG"
        if args.ynet_bias:
            experiment += "__bias"
    if args.network in ("original", "embed"):
        experiment += f"__{args.network}"
    else:
        experiment += f"__fusion_{args.n_fusion}"
    return experiment


def get_position(ckpt_path, return_list=True):
    """reference utils/util.py:78-90."""
    if ckpt_path is None or "Pos" not in ckpt_path:
        return None
    pos = ckpt_path.split("Pos_")[-1].split("__")[0]
    return pos.split("_") if return_list else pos


def get_ckpt_name(ckpt_path):
    """reference utils/util.py:93-103."""
    ckpt_path = ckpt_path.split("/")[-1]
    train_net = ckpt_path.split("__")[2]
    n_train = int(ckpt_path.split("TrN_")[-1].split("_")[0])
    if "Pos" in ckpt_path:
        position = get_position(ckpt_path, return_list=False)
        return f"{train_net}[{position}]({n_train})"
    return f"{train_net}({n_train})"


def update_params_from_ckpt(ckpt_path, params):
    """reference utils/util.py:106-122 (+ sidecar JSON if available)."""
    import json

    meta_path = str(ckpt_path) + ".json"
    updated = dict(params)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            updated.update(json.load(f))
        return updated
    name = ckpt_path.split("/")[-1]
    updated["train_net"] = name.split("__")[2].split(".")[0]
    if params.get("pretrained_ckpt"):
        base_arch = params["pretrained_ckpt"].split("_")[-1].split(".")[0]
        if base_arch == "embed":
            updated["network"] = "embed"
    if "Pos" in name:
        updated["position"] = get_position(name)
    return updated


def get_ckpts_and_names(ckpts, ckpts_name, pretrained_ckpt, tuned_ckpts):
    """reference utils/util.py:125-135."""
    if ckpts is not None:
        return ckpts, ckpts_name, [False] * len(ckpts)
    if pretrained_ckpt is not None:
        tuned = [c for c in (tuned_ckpts or []) if c]
        names = ["OODG"] + [get_ckpt_name(c) for c in tuned]
        return [pretrained_ckpt] + tuned, names, [False] + [True] * len(tuned)
    raise ValueError("No checkpoint provided")


def ensure_dir(path):
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    return path
