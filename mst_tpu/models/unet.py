"""U-Net segmentation backbone with a ResNet101 encoder (NHWC, functional).

Architecture-compatible with the reference's pickled
segmentation_models_pytorch Unet('resnet101') module (reference
models/ynet.py:495-507) so released weights convert 1:1
(mst_tpu.models.convert.convert_torch_segmentation): torchvision-style
bottleneck ResNet101 encoder, smp UnetDecoder (nearest-2x upsample, skip
concat, two Conv-BN-ReLU per block, decoder channels 256/128/64/32/16) and a
3x3 segmentation head.

The backbone runs frozen during Y-Net training (reference trainer.py:113-114)
— BN uses running statistics. Parameter paths mirror the torch names
('encoder/layer1/0/conv1/weight', 'decoder/blocks/0/conv1/...') so the
'segmentation_{head,bias,bn,<layer>}' freeze strategies
(trainer.py:182-190) match with the same regexes.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

RESNET101_LAYERS = (3, 4, 23, 3)
DECODER_CHANNELS = (256, 128, 64, 32, 16)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv(params, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, params["weight"], (stride, stride), padding,
        dimension_numbers=_DIMNUMS)
    if "bias" in params:
        y = y + params["bias"]
    return y


def _bn(params, x, eps=1e-5):
    inv = jax.lax.rsqrt(params["running_var"] + eps)
    return ((x - params["running_mean"]) * inv * params["weight"]
            + params["bias"])


def _get_path(tree, path):
    """Navigate a nested dict by '/'-joined path; None when absent."""
    node = tree
    for part in path.split("/"):
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


def _make_bn(bn_state, train, eps=1e-5, momentum=0.1):
    """BN evaluator with optional external running stats and train mode.

    Returns (bn_fn, updates): bn_fn(path, params, x) normalizes x; stats are
    read from bn_state[path] when present (adapted stats after e_unfreeze),
    else from the inline params. In train mode (the reference's model.train()
    past e_unfreeze, train_epoch.py:27-48) batch statistics normalize and
    torch-style running-stat updates (momentum 0.1, unbiased var) land in
    `updates` keyed by path.
    """
    updates = {}

    def bn(path, params, x):
        src = _get_path(bn_state, path) if bn_state else None
        stats = src if src is not None else params
        if not train:
            inv = jax.lax.rsqrt(stats["running_var"] + eps)
            return ((x - stats["running_mean"]) * inv * params["weight"]
                    + params["bias"])
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean) * inv * params["weight"] + params["bias"]
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        updates[path] = {
            "running_mean": ((1 - momentum) * stats["running_mean"]
                             + momentum * mean),
            "running_var": ((1 - momentum) * stats["running_var"]
                            + momentum * unbiased),
        }
        return y

    return bn, updates


def _conv_init(key, cin, cout, k, bias=False):
    fan_in = cin * k * k
    bound = math.sqrt(2.0 / fan_in)  # kaiming normal-ish scale
    p = {"weight": jax.random.normal(key, (k, k, cin, cout)) * bound}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def _bn_init(ch):
    return {"weight": jnp.ones((ch,)), "bias": jnp.zeros((ch,)),
            "running_mean": jnp.zeros((ch,)), "running_var": jnp.ones((ch,))}


def _maxpool_3x3_s2(x):
    # torch MaxPool2d(3, stride=2, padding=1)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _upsample_nearest_2x(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


# ---------------------------------------------------------------------------
# ResNet bottleneck encoder
# ---------------------------------------------------------------------------

def _bottleneck_init(key, cin, width, cout, stride):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(ks[0], cin, width, 1),
        "bn1": _bn_init(width),
        "conv2": _conv_init(ks[1], width, width, 3),
        "bn2": _bn_init(width),
        "conv3": _conv_init(ks[2], width, cout, 1),
        "bn3": _bn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {"0": _conv_init(ks[3], cin, cout, 1),
                           "1": _bn_init(cout)}
    return p


def _bottleneck_apply(p, x, stride, bn=None, path=""):
    if bn is None:
        bn = lambda _, params, v: _bn(params, v)  # noqa: E731
    identity = x
    y = jax.nn.relu(bn(f"{path}/bn1", p["bn1"], _conv(p["conv1"], x)))
    y = jax.nn.relu(bn(f"{path}/bn2", p["bn2"],
                       _conv(p["conv2"], y, stride=stride)))
    y = bn(f"{path}/bn3", p["bn3"], _conv(p["conv3"], y))
    if "downsample" in p:
        identity = bn(f"{path}/downsample/1", p["downsample"]["1"],
                      _conv(p["downsample"]["0"], x, stride=stride))
    return jax.nn.relu(y + identity)


def _resnet_encoder_init(key, layers=RESNET101_LAYERS):
    params = {
        "conv1": _conv_init(jax.random.fold_in(key, 0), 3, 64, 7),
        "bn1": _bn_init(64),
    }
    cin = 64
    widths = (64, 128, 256, 512)
    for li, (w, n) in enumerate(zip(widths, layers), start=1):
        cout = w * 4
        blocks = {}
        for b in range(n):
            stride = 2 if (li > 1 and b == 0) else 1
            blocks[str(b)] = _bottleneck_init(
                jax.random.fold_in(key, 100 * li + b), cin, w, cout, stride)
            cin = cout
        params[f"layer{li}"] = blocks
    return params


def _resnet_encoder_apply(params, x, layers=None, bn=None):
    """Returns smp-style feature list: [x, stem, layer1..layer4]. The
    per-stage block counts are inferred from the params when not given."""
    if layers is None:
        layers = tuple(len(params[f"layer{li}"]) for li in range(1, 5))
    if bn is None:
        bn = lambda _, p, v: _bn(p, v)  # noqa: E731
    feats = [x]
    # stem: 7x7/2 conv, bn, relu
    y = jax.lax.conv_general_dilated(
        x, params["conv1"]["weight"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=_DIMNUMS)
    y = jax.nn.relu(bn("encoder/bn1", params["bn1"], y))
    feats.append(y)
    y = _maxpool_3x3_s2(y)
    for li, n in enumerate(layers, start=1):
        blocks = params[f"layer{li}"]
        for b in range(n):
            stride = 2 if (li > 1 and b == 0) else 1
            y = _bottleneck_apply(blocks[str(b)], y, stride, bn,
                                  f"encoder/layer{li}/{b}")
        feats.append(y)
    return feats


# ---------------------------------------------------------------------------
# smp UnetDecoder
# ---------------------------------------------------------------------------

def _decoder_block_init(key, cin, cskip, cout):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": {"0": _conv_init(k1, cin + cskip, cout, 3),
                  "1": _bn_init(cout)},
        "conv2": {"0": _conv_init(k2, cout, cout, 3), "1": _bn_init(cout)},
    }


def _decoder_block_apply(p, x, skip, bn=None, path=""):
    if bn is None:
        bn = lambda _, params, v: _bn(params, v)  # noqa: E731
    x = _upsample_nearest_2x(x)
    if skip is not None:
        x = jnp.concatenate([x, skip], axis=-1)
    x = jax.nn.relu(bn(f"{path}/conv1/1", p["conv1"]["1"],
                       _conv(p["conv1"]["0"], x)))
    x = jax.nn.relu(bn(f"{path}/conv2/1", p["conv2"]["1"],
                       _conv(p["conv2"]["0"], x)))
    return x


def _unet_decoder_init(key, encoder_channels, decoder_channels):
    enc = list(encoder_channels)[::-1]  # [2048, 1024, 512, 256, 64, 3]
    head = enc[0]
    skips = enc[1:]
    in_ch = [head] + list(decoder_channels[:-1])
    skip_ch = skips[:len(decoder_channels) - 1] + [0]
    blocks = {}
    for i, (ci, cs, co) in enumerate(zip(in_ch, skip_ch, decoder_channels)):
        blocks[str(i)] = _decoder_block_init(
            jax.random.fold_in(key, i), ci, cs, co)
    return {"blocks": blocks}


def _unet_decoder_apply(params, feats, decoder_channels=None, bn=None):
    n_blocks = (len(params["blocks"]) if decoder_channels is None
                else len(decoder_channels))
    feats = feats[::-1]
    x = feats[0]
    skips = feats[1:]
    for i in range(n_blocks):
        skip = skips[i] if i < len(skips) - 1 else None
        x = _decoder_block_apply(params["blocks"][str(i)], x, skip, bn,
                                 f"decoder/blocks/{i}")
    return x


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

ENCODER_CHANNELS = (3, 64, 256, 512, 1024, 2048)


def unet_init(key, n_classes=6, layers=RESNET101_LAYERS,
              decoder_channels=DECODER_CHANNELS, activation="softmax"):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": _resnet_encoder_init(k1, layers),
        "decoder": _unet_decoder_init(k2, ENCODER_CHANNELS,
                                      decoder_channels),
        "segmentation_head": {
            "0": _conv_init(k3, decoder_channels[-1], n_classes, 3,
                            bias=True)},
        "_meta": {"activation": np.array(
            1 if activation == "softmax" else 0)},
    }


def unet_apply(params, image, use_features_only=False, layers=None,
               decoder_channels=None, bn_state=None, train=False):
    """(B, H, W, 3) -> (B, H, W, n_classes) class map (or (.., 16) features
    when use_features_only — reference ynet.py:503-505 replaces the head with
    Identity). Depth is inferred from params unless given.

    bn_state: optional nested {path: {running_mean, running_var}} overriding
    the inline BN stats (the adapted stats once e_unfreeze passes).
    train=True runs BN on batch statistics and returns (out, bn_updates)
    — the reference's model.train() backbone mode (train_epoch.py:27-48);
    its params never receive gradients (trainer.py:113-114), only the BN
    buffers adapt."""
    bn, updates = _make_bn(bn_state, train)
    feats = _resnet_encoder_apply(params["encoder"], image, layers, bn)
    x = _unet_decoder_apply(params["decoder"], feats, decoder_channels, bn)
    if use_features_only:
        out = x
    else:
        x = _conv(params["segmentation_head"]["0"], x)
        act = params.get("_meta", {}).get("activation")
        if act is not None:
            # `act` may be traced (it rides in the params pytree); branch on
            # device so the head activation stays checkpoint-defined.
            x = jax.lax.cond(jnp.asarray(act) == 1,
                             lambda v: jax.nn.softmax(v, axis=-1),
                             lambda v: v, x)
        out = x
    if train:
        from mst_tpu.train.checkpoints import unflatten_dict

        nested = unflatten_dict({f"{k}/{leaf}": v
                                 for k, d in updates.items()
                                 for leaf, v in d.items()})
        return out, nested
    return out


def extract_bn_stats(params):
    """Nested {path: {running_mean, running_var}} of every BN in the
    backbone params — the seed for the e_unfreeze adapted-stats state."""
    out = {}

    def visit(node, path):
        if isinstance(node, dict):
            if "running_mean" in node and "running_var" in node:
                out[path] = {"running_mean": np.asarray(node["running_mean"]),
                             "running_var": np.asarray(node["running_var"])}
                return
            for k, v in node.items():
                visit(v, f"{path}/{k}" if path else k)

    visit(params, "")
    from mst_tpu.train.checkpoints import unflatten_dict

    return unflatten_dict({f"{k}/{leaf}": v for k, d in out.items()
                           for leaf, v in d.items()})
