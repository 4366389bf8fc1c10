"""Torch -> JAX checkpoint conversion (offline tool).

Converts the reference's released torch checkpoints into this framework's
flat-npz pytrees:

- Y-Net checkpoints (full `*_weights.pt` state dicts and adapter-only delta
  dicts, reference trainer.py:594-604) via `convert_torch_ynet`;
- the segmentation backbone: the reference ships a *pickled module*
  (torch.load, ynet.py:495-502) — extract its .state_dict() with
  segmentation_models_pytorch installed, then feed it here
  (`convert_torch_segmentation`).

Conv weights move OIHW -> HWIO; loralib lora_A/lora_B factors are kept
as-is (mst_tpu.models.layers evaluates the same (B @ A).view(...) / r
merged-weight formula); BatchNorm running stats land in the model *state*
pytree for adapters and inside the frozen backbone params for segmentation.

CLI:
  python -m mst_tpu.models.convert ynet in.pt out.npz [--position 0 1 ...]
  python -m mst_tpu.models.convert segmentation in_state_dict.pt out.npz
  python -m mst_tpu.models.convert --check-manifest   # coverage dry run
"""

import argparse
import re

import numpy as np


def _hwio(w):
    w = np.asarray(w)
    return np.transpose(w, (2, 3, 1, 0)) if w.ndim == 4 else w


def _map_decoder_key(rest):
    """'center.0.weight' etc -> our decoder path, or None."""
    m = re.match(r"center\.(\d+)\.(\w+)$", rest)
    if m:
        idx = {0: "0", 2: "1"}[int(m.group(1))]
        return f"center/{idx}/{m.group(2)}"
    m = re.match(r"upsample_conv\.(\d+)\.(\w+)$", rest)
    if m:
        return f"upsample/{m.group(1)}/{m.group(2)}"
    m = re.match(r"decoder\.(\d+)\.(\d+)\.(\w+)$", rest)
    if m:
        idx = {0: "0", 2: "1"}[int(m.group(2))]
        return f"blocks/{m.group(1)}/{idx}/{m.group(3)}"
    m = re.match(r"predictor\.(\w+)$", rest)
    if m:
        return f"predictor/{m.group(1)}"
    return None


def _map_stage_conv(group: str, stage: str, j: int) -> str:
    """torch Sequential index -> conv slot.

    Stage 0 of `stages`/`scene_stages`/`motion_stages` is the stem
    [conv, relu] (ynet.py:192-197,306-319); every other stage — including
    ALL fusion_stages — is [pool, conv, relu, conv, relu]."""
    if stage == "0" and group != "fusion_stages":
        return "conv0"
    return {1: "conv0", 3: "conv1"}[j]


_BN_STATE_KEYS = ("running_mean", "running_var", "num_batches_tracked")


def convert_torch_ynet(state_dict, position=()):
    """torch YNet state dict -> (flat params dict, flat state dict)."""
    params, state = {}, {}
    position = [str(p) for p in position]

    def put(path, key, val):
        leaf = "num_batches" if key == "num_batches_tracked" else key
        target = state if key in _BN_STATE_KEYS else params
        target[f"{path}/{leaf}"] = (
            _hwio(val) if leaf == "weight" and np.asarray(val).ndim == 4
            else np.asarray(val))

    for name, val in state_dict.items():
        # copy: torch .numpy()/np.asarray share the parameter storage, and
        # a converted tree must not silently track later in-place optimizer
        # updates of the source model
        val = np.array(getattr(val, "numpy", lambda: val)()
                       if hasattr(val, "numpy") else val, copy=True)
        if name.startswith("semantic_segmentation"):
            continue  # convert separately (convert_torch_segmentation)

        # ---- encoders (plain + fusion branches)
        m = re.match(
            r"encoder\.(stages|scene_stages|motion_stages|fusion_stages)"
            r"\.(\d+)\.(\d+)\.(.+)$", name)
        if m:
            group, stage, j, rest = m.groups()
            conv = _map_stage_conv(group, stage, int(j))
            base = f"encoder/{group}/{stage}/{conv}"
            # in-layer adapters: rest like 'serial_layer.0.weight' (BN),
            # 'serial_layer.1.weight' (conv), 'parallel_layer.k.weight'
            am = re.match(r"serial_layer\.(\d+)\.(\w+)$", rest)
            if am:
                sub = {0: "bn", 1: "conv"}[int(am.group(1))]
                put(f"{base}/serial_layer/{sub}", am.group(2), val)
                continue
            am = re.match(r"parallel_layer\.(\d+)\.(\w+)$", rest)
            if am:
                put(f"{base}/parallel_layer/{am.group(1)}", am.group(2), val)
                continue
            am = re.match(r"parallel_layer\.(\w+)$", rest)
            if am:
                put(f"{base}/parallel_layer/0", am.group(1), val)
                continue
            put(base, rest, val)  # weight / bias / lora_A / lora_B
            continue

        # ---- block adapters (YNetEncoderB, indexed by order -> position)
        m = re.match(r"encoder\.adapters\.(\d+)\.(.+)$", name)
        if m:
            j, rest = m.groups()
            pos = position[int(j)] if int(j) < len(position) else j
            base = f"encoder/adapters/{pos}"
            am = re.match(r"serial_layer\.(\d+)\.(\w+)$", rest)
            if am:
                sub = {0: "bn", 1: "conv"}[int(am.group(1))]
                put(f"{base}/serial_layer/{sub}", am.group(2), val)
                continue
            am = re.match(r"parallel_layer\.(\d+)\.(\w+)$", rest)
            if am:
                put(f"{base}/parallel_layer/{am.group(1)}", am.group(2), val)
                continue
            am = re.match(r"parallel_layer\.(\w+)$", rest)
            if am:
                put(f"{base}/parallel_layer/0", am.group(1), val)
                continue
            continue

        # ---- decoders
        m = re.match(r"(goal_decoder|traj_decoder)\.(.+)$", name)
        if m:
            mapped = _map_decoder_key(m.group(2))
            if mapped:
                params[f"{m.group(1)}/{mapped}"] = _hwio(val)
            continue

        # ---- semantic adapter + embeddings
        m = re.match(r"semantic_adapter\.(\w+)$", name)
        if m:
            params[f"semantic_adapter/{m.group(1)}"] = _hwio(val)
            continue
        m = re.match(r"(scene|motion)_embedding\.conv\.(\d+)\.(\w+)$", name)
        if m:
            idx = {0: "0", 2: "1", 4: "2"}[int(m.group(2))]
            params[f"{m.group(1)}_embedding/{idx}/{m.group(3)}"] = _hwio(val)
            continue
    return params, state


def convert_torch_segmentation(state_dict, activation="softmax",
                               strict=False):
    """smp Unet('resnet101') state dict -> flat params dict (BN running
    stats included inline: the backbone runs frozen in eval mode).

    strict=True validates the result against the vendored smp 0.1.0
    manifest-derived target tree (mst_tpu.models.manifests): every
    expected leaf must be produced with the right shape and no unknown
    keys may remain — the dry run a real released .pth must survive.
    """
    params = {}
    skipped = []
    for name, val in state_dict.items():
        val = np.array(getattr(val, "numpy", lambda: val)()
                       if hasattr(val, "numpy") else val, copy=True)
        name = re.sub(r"^(semantic_segmentation|model)\.", "", name)
        if name.endswith("num_batches_tracked"):
            continue
        if re.match(r"^encoder\.(fc|avgpool)\.", name):
            # torchvision ResNet classifier head — deleted by smp's
            # ResNetEncoder but tolerated here in case a variant kept it
            skipped.append(name)
            continue
        path = name.replace(".", "/")
        if val.ndim == 4:
            val = _hwio(val)
        params[path] = val
    params["_meta/activation"] = np.array(
        1 if activation == "softmax" else 0)
    if strict:
        from mst_tpu.models.manifests import (_diff,
                                              smp_unet_resnet101_manifest)
        head_bias = params.get("segmentation_head/0/bias")
        # head missing (truncated/encoder-only dict): validate against
        # the released 6-class manifest so _diff reports it readably
        n_classes = head_bias.shape[0] if head_bias is not None else 6
        want = {}
        for k, s in smp_unet_resnet101_manifest(classes=n_classes).items():
            if k.endswith("num_batches_tracked"):
                continue
            s = (s[2], s[3], s[1], s[0]) if len(s) == 4 else s  # OIHW->HWIO
            want[k.replace(".", "/")] = s
        want["_meta/activation"] = ()
        got = {k: tuple(np.shape(v)) for k, v in params.items()}
        errors = _diff("segmentation", got, want)
        if skipped:
            print(f"[convert] skipped classifier-head keys: {skipped}")
        if errors:
            raise ValueError(
                "segmentation checkpoint does not match the smp 0.1.0 "
                "Unet(resnet101) manifest:\n  " + "\n  ".join(errors))
    return params


def main():
    import sys

    if "--check-manifest" in sys.argv:
        # dry-run coverage report: every released-artifact key manifest
        # (smp 0.1.0 Unet(resnet101), loralib 0.1.1 convs, all five
        # experiment families x adaptation variants) converted and
        # validated leaf-for-leaf against the init trees
        from mst_tpu.models.manifests import check_all

        errors = check_all(verbose=True)
        if errors:
            print(f"\n{len(errors)} coverage error(s):")
            for e in errors:
                print(" -", e)
            raise SystemExit(1)
        print("\nall manifests fully covered")
        return

    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("kind", choices=["ynet", "segmentation"])
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--position", nargs="+", default=[])
    parser.add_argument("--activation", default="softmax")
    parser.add_argument("--no-strict", action="store_true",
                        help="segmentation only: skip manifest validation")
    args = parser.parse_args()

    # weights_only=False: the released segmentation artifact is a pickled
    # FULL smp module (reference ynet.py:495-502), which torch >= 2.6
    # refuses under the weights_only=True default. This is an offline CLI
    # run by the user on artifacts they chose to download — same trust
    # model as the reference's own torch.load.
    try:
        sd = torch.load(args.src, map_location="cpu", weights_only=False)
    except TypeError:  # torch < 1.13 has no weights_only kwarg
        sd = torch.load(args.src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # normalize so the BN-state sidecar never collides with the params
    # archive (np.savez appends .npz itself for extension-less paths)
    dst = args.dst if args.dst.endswith(".npz") else args.dst + ".npz"
    if args.kind == "ynet":
        params, state = convert_torch_ynet(sd, args.position)
        np.savez(dst, **params)
        if state:
            np.savez(dst[:-len(".npz")] + "_state.npz", **state)
    else:
        params = convert_torch_segmentation(sd, args.activation,
                                            strict=not args.no_strict)
        np.savez(dst, **params)
    print(f"converted {len(sd)} torch tensors -> {dst}")


if __name__ == "__main__":
    main()
