"""Y-Net / Y-Net-Mod in functional JAX (NHWC pytrees).

Architecture parity with the reference models/ynet.py:
- YNetEncoder / YNetEncoderL / YNetEncoderB (ynet.py:170-283),
- YNetEncoderFusion — the modular Y-Net-Mod encoder with separate
  scene/motion branches and late fusion (ynet.py:286-395),
- YNetDecoder x2 (goal + waypoint-conditioned trajectory, ynet.py:398-471),
- MoSA/LoRA convs (get_conv2d dispatch, ynet.py:134-151),
- serial/parallel adapter blocks and in-layer adapters (ynet.py:15-131),
- semantic adapter + scene/motion embeddings (ynet.py:154-167,513-519).

Re-designed, not ported: parameters are explicit pytrees (adaptation = pytree
partitioning + LoRA overlays rather than nn.Module mutation), the module is a
set of pure functions compiled under jit, and layout is NHWC for the TPU MXU.
"""

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mst_tpu.models import layers
from mst_tpu.ops.pooling import max_pool_2x2, upsample_bilinear_2x


# ---------------------------------------------------------------------------
# configuration
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class YNetConfig:
    obs_len: int
    pred_len: int
    n_semantic_classes: int = 6
    encoder_channels: Sequence[int] = (32, 32, 64, 64, 64)
    decoder_channels: Sequence[int] = (64, 64, 64, 32, 32)
    waypoints: Sequence[int] = (11,)
    train_net: str = "train"
    position: Sequence[str] = ()
    network: str = "original"  # original | embed | fusion
    n_fusion: Optional[int] = None
    use_features_only: bool = False
    segmentation: Optional[str] = None  # None -> identity backbone

    def __post_init__(self):
        object.__setattr__(self, "encoder_channels",
                           tuple(self.encoder_channels))
        object.__setattr__(self, "decoder_channels",
                           tuple(self.decoder_channels))
        object.__setattr__(self, "waypoints", tuple(self.waypoints))
        object.__setattr__(self, "position",
                           tuple(str(p) for p in self.position))
        if self.network == "fusion":
            assert self.n_fusion is not None, "fusion network needs n_fusion"
            assert not any(c % 2 for c in self.encoder_channels), \
                f"Odd value in channels={self.encoder_channels}"
            assert self.n_fusion <= len(self.encoder_channels) - 1

    @property
    def n_waypoints(self):
        return len(self.waypoints)

    @property
    def feature_channels(self):
        return self.n_semantic_classes + self.obs_len

    @property
    def lora_rank(self):
        """rank parsed from 'mosa_<r>' (reference: ynet.py:186-189)."""
        if "mosa" not in self.train_net:
            return None
        parts = self.train_net.split("_")
        return int(parts[1]) if len(parts) > 1 else 1

    def conv_kind(self, level) -> str:
        """Which conv get_conv2d would build at encoder level `level`.

        reference: models/ynet.py:134-151.
        """
        l = str(level)
        if "mosa" in self.train_net and l in self.position:
            return "lora"
        if "Layer" in self.train_net and l in self.position:
            return "adapter_layer"
        return "plain"

    def adapter_sizes(self):
        """kernel sizes parsed from the train_net suffix (ynet.py:21-38)."""
        sizes = self.train_net.split("_")[1:]
        if "serial" in self.train_net:
            return []
        if not sizes:
            return [1]
        return [int(s.split("x")[0]) for s in sizes]


# ---------------------------------------------------------------------------
# adapter blocks / layers (reference ynet.py:15-131)
# ---------------------------------------------------------------------------

def _adapter_init(key, cfg: YNetConfig, in_ch, out_ch=None, stride=1):
    """Zero-initialized adapter params (+ BN state for serial adapters)."""
    out_ch = out_ch or in_ch
    if "serial" in cfg.train_net:
        bn_p, bn_s = layers.batchnorm_init(in_ch)
        conv = layers.conv2d_init(key, in_ch, in_ch, 1, bias=False,
                                  zero_init=True)
        return {"serial_layer": {"bn": bn_p, "conv": conv}}, \
               {"serial_layer": {"bn": bn_s}}
    elif "parallel" in cfg.train_net:
        ks = cfg.adapter_sizes()
        convs = {
            str(i): layers.conv2d_init(jax.random.fold_in(key, i), in_ch,
                                       out_ch, k, bias=False, zero_init=True)
            for i, k in enumerate(ks)
        }
        return {"parallel_layer": convs}, {}
    raise ValueError(f"Invalid adapter={cfg.train_net}")


def _adapter_block_apply(params, state, cfg: YNetConfig, x, train):
    """AdapterBlock.forward (ynet.py:54-67). Returns (y, new_state)."""
    if "parallel" in cfg.train_net:
        y = 0.0
        for i in sorted(params["parallel_layer"], key=int):
            y = y + layers.conv2d_apply(params["parallel_layer"][i], x)
        return y, state
    # serial: BN + 1x1 conv, residual
    bn_out, bn_state = layers.batchnorm_apply(
        params["serial_layer"]["bn"], state["serial_layer"]["bn"], x, train)
    y = layers.conv2d_apply(params["serial_layer"]["conv"], bn_out)
    new_state = {"serial_layer": {"bn": bn_state}}
    return y + x, new_state


def _conv_unit_init(key, cfg: YNetConfig, level, in_ch, out_ch, kernel_size=3):
    """One encoder conv: plain / LoRA / in-layer-adapter (get_conv2d)."""
    kind = cfg.conv_kind(level)
    if kind == "lora":
        return layers.lora_conv2d_init(key, in_ch, out_ch, kernel_size,
                                       cfg.lora_rank), {}
    params = layers.conv2d_init(key, in_ch, out_ch, kernel_size)
    if kind == "adapter_layer":
        akey = jax.random.fold_in(key, 101)
        if "serial" in cfg.train_net:
            bn_p, bn_s = layers.batchnorm_init(out_ch)
            conv = layers.conv2d_init(akey, out_ch, out_ch, 1, bias=False,
                                      zero_init=True)
            params["serial_layer"] = {"bn": bn_p, "conv": conv}
            return params, {"serial_layer": {"bn": bn_s}}
        ks = cfg.adapter_sizes()
        params["parallel_layer"] = {
            str(i): layers.conv2d_init(jax.random.fold_in(akey, i), in_ch,
                                       out_ch, k, bias=False, zero_init=True)
            for i, k in enumerate(ks)
        }
    return params, {}


def _conv_unit_apply(params, state, cfg: YNetConfig, level, x, train):
    """Forward of one encoder conv unit. Returns (y, new_state)."""
    kind = cfg.conv_kind(level)
    if kind == "lora":
        # merged-weight form everywhere: the separable delta (no full
        # weight-grad conv; layers.lora_separable_kernels) measured SLOWER
        # on v5e in every placement (291 -> 266/273/283 traj/s with it in
        # packed stages / stage-0 only / unpacked stages) — the thin
        # full-res factor convs cost more than the dense weight-grad convs
        # they remove. Kept available + parity-tested for future hardware.
        return layers.lora_conv2d_apply(params, x, cfg.lora_rank), state
    out = layers.conv2d_apply({k: params[k] for k in ("weight", "bias")
                               if k in params}, x)
    if kind == "adapter_layer":
        if "serial" in cfg.train_net:
            bn_out, bn_state = layers.batchnorm_apply(
                params["serial_layer"]["bn"], state["serial_layer"]["bn"],
                out, train)
            y = layers.conv2d_apply(params["serial_layer"]["conv"], bn_out)
            return y + out, {"serial_layer": {"bn": bn_state}}
        y = 0.0
        for i in sorted(params["parallel_layer"], key=int):
            y = y + layers.conv2d_apply(params["parallel_layer"][i], x)
        return y + out, state
    return out, state


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def _encoder_init(key, cfg: YNetConfig):
    """Plain/L/B encoder params (YNetEncoder, ynet.py:170-215)."""
    chans = cfg.encoder_channels
    stages, state = {}, {}
    k0 = jax.random.fold_in(key, 0)
    p, s = _conv_unit_init(k0, cfg, 0, cfg.feature_channels, chans[0])
    stages["0"] = {"conv0": p}
    if s:
        state.setdefault("stages", {})["0"] = {"conv0": s}
    for i in range(len(chans) - 1):
        ki = jax.random.fold_in(key, i + 1)
        p0, s0 = _conv_unit_init(jax.random.fold_in(ki, 0), cfg, i + 1,
                                 chans[i], chans[i + 1])
        p1, s1 = _conv_unit_init(jax.random.fold_in(ki, 1), cfg, i + 1,
                                 chans[i + 1], chans[i + 1])
        stages[str(i + 1)] = {"conv0": p0, "conv1": p1}
        st = {}
        if s0:
            st["conv0"] = s0
        if s1:
            st["conv1"] = s1
        if st:
            state.setdefault("stages", {})[str(i + 1)] = st

    params = {"stages": stages}

    # block adapters (YNetEncoderB, ynet.py:237-256)
    is_block_adapter = (("serial" in cfg.train_net or
                         "parallel" in cfg.train_net)
                        and "Layer" not in cfg.train_net)
    if is_block_adapter and cfg.position:
        positions = [int(p) for p in cfg.position]
        par_in = [cfg.feature_channels] + list(chans[:-1])
        adapters, ad_state = {}, {}
        for j, i in enumerate(positions):
            akey = jax.random.fold_in(key, 1000 + i)
            if "serial" in cfg.train_net:
                p, s = _adapter_init(akey, cfg, chans[i])
            else:
                p, s = _adapter_init(akey, cfg, par_in[i], chans[i])
            adapters[str(i)] = p
            if s:
                ad_state[str(i)] = s
        params["adapters"] = adapters
        if ad_state:
            state["adapters"] = ad_state
    return params, state


def _stage_apply(params, state, cfg, level, x, train, first_stage):
    """Apply one encoder stage (maxpool + convs + relu)."""
    new_state = dict(state) if state else {}
    if not first_stage:
        x = max_pool_2x2(x)
    y, s0 = _conv_unit_apply(params["conv0"],
                             state.get("conv0", {}) if state else {},
                             cfg, level, x, train)
    y = jax.nn.relu(y)
    if s0:
        new_state["conv0"] = s0
    if "conv1" in params:
        y, s1 = _conv_unit_apply(params["conv1"],
                                 state.get("conv1", {}) if state else {},
                                 cfg, level, y, train)
        y = jax.nn.relu(y)
        if s1:
            new_state["conv1"] = s1
    return y, new_state


def can_pack_stage0(cfg: YNetConfig) -> bool:
    """Stage 0 can run space-to-depth packed when its conv is plain or LoRA
    (merged weight) and no block adapter sits at position 0."""
    if cfg.network == "fusion":
        return False
    if cfg.conv_kind(0) == "adapter_layer":
        return False
    is_block_adapter = (("serial" in cfg.train_net
                         or "parallel" in cfg.train_net)
                        and "Layer" not in cfg.train_net)
    if is_block_adapter and "0" in cfg.position:
        return False
    return True


def can_pack_stage1(cfg: YNetConfig) -> bool:
    """Stage 1 can run space-to-depth packed under the same conditions as
    stage 0 (plain or LoRA-merged convs, no block adapter at position 1);
    requires packed_stage0 (its pooled half-res output is the input)."""
    if not can_pack_stage0(cfg):
        return False
    if len(cfg.encoder_channels) < 2:
        return False
    if cfg.conv_kind(1) == "adapter_layer":
        return False
    is_block_adapter = (("serial" in cfg.train_net
                         or "parallel" in cfg.train_net)
                        and "Layer" not in cfg.train_net)
    if is_block_adapter and "1" in cfg.position:
        return False
    return True


def _merged_conv_weight(cfg, conv_params, level):
    if cfg.conv_kind(level) == "lora":
        return layers.lora_merged_weight(conv_params, cfg.lora_rank)
    return conv_params["weight"]


def _packed_conv_unit(xq, conv_params, cfg, level, separable=False):
    """One encoder conv unit in packed space (plain or LoRA).

    separable=True runs the LoRA delta as two thin packed convs (no full
    weight-grad conv in the backward, layers.lora_separable_kernels) —
    measured SLOWER than merged on v5e (see _conv_unit_apply note), kept
    for future hardware. Default: merged weight, one conv.
    """
    from mst_tpu.ops import packed as packed_lib

    bias = (packed_lib.pack_bias(conv_params["bias"])
            if "bias" in conv_params else None)
    if cfg.conv_kind(level) == "lora" and separable:
        y = packed_lib.packed_conv(
            xq, packed_lib.pack_conv3x3_kernel(conv_params["weight"]), bias)
        KA, KB = layers.lora_separable_kernels(conv_params)
        u = packed_lib.packed_conv(xq, packed_lib.pack_conv3x3_kernel(KA))
        d = packed_lib.packed_conv(u, packed_lib.pack_conv1x1_kernel(KB))
        return y + d * (1.0 / cfg.lora_rank)
    w = _merged_conv_weight(cfg, conv_params, level)
    return packed_lib.packed_conv(
        xq, packed_lib.pack_conv3x3_kernel(w), bias)


def _encoder_apply(params, state, cfg: YNetConfig, x, train,
                   packed_stage0=False, packed_stage1=False):
    """Forward the plain/L/B encoder; returns (features list, new_state).

    Feature list has len(channels)+1 entries: 5 stage outputs plus a final
    max-pooled map (reference: ynet.py:213-215,229-234).

    packed_stage0 runs the full-resolution stem conv space-to-depth packed
    (requires can_pack_stage0(cfg)); features[0] is then the PACKED
    (B, H/2, W/2, 4C) map — consumers must accept it (the packed decoders
    do) — and the stage-1 maxpool becomes a packed channel-group max,
    exactly equal to MaxPool2d(2, 2).
    """
    n_stage = len(cfg.encoder_channels)
    features = []
    if packed_stage0:
        from mst_tpu.ops import packed as packed_lib

        assert can_pack_stage0(cfg), cfg.train_net
        conv0 = params["stages"]["0"]["conv0"]
        xq = packed_lib.space_to_depth(x)
        yq = _packed_conv_unit(xq, conv0, cfg, 0, separable=False)
        yq = jax.nn.relu(yq)
        features.append(yq)  # PACKED features[0]
        C0 = cfg.encoder_channels[0]
        B_, Hp, Wp, _ = yq.shape
        # MaxPool2d(2,2) == max over the 4 packed sub-position groups
        x = yq.reshape(B_, Hp, Wp, 4, C0).max(axis=3)
        start_stage = 1
        if packed_stage1:
            # stage 1 space-to-depth packed one level down: its 32-channel
            # half-res convs waste 3/4 of the MXU lanes (r3 train xprof);
            # packed they contract K=4C. features[1] comes out PACKED
            # (B, H/4, W/4, 4C1) — consumers must accept it (the packed
            # decoders do) — and the stage-2 maxpool is the channel-group
            # max again.
            assert can_pack_stage1(cfg), cfg.train_net
            s1 = params["stages"]["1"]
            x1q = packed_lib.space_to_depth(x)
            y = jax.nn.relu(_packed_conv_unit(x1q, s1["conv0"], cfg, 1,
                                              separable=False))
            y = jax.nn.relu(_packed_conv_unit(y, s1["conv1"], cfg, 1,
                                              separable=False))
            features.append(y)  # PACKED features[1]
            C1 = cfg.encoder_channels[1]
            Bq, Hq, Wq, _ = y.shape
            x = y.reshape(Bq, Hq, Wq, 4, C1).max(axis=3)
            start_stage = 2
    else:
        start_stage = 0
    stage_state = dict(state.get("stages", {}))
    adapters = params.get("adapters", {})
    adapter_state = dict(state.get("adapters", {}))
    is_serial_block = ("serial" in cfg.train_net
                       and "Layer" not in cfg.train_net and adapters)
    is_parallel_block = ("parallel" in cfg.train_net
                         and "Layer" not in cfg.train_net and adapters)

    for i in range(start_stage, n_stage):
        sp = params["stages"][str(i)]
        ss = state.get("stages", {}).get(str(i), {})
        # when stage 0/1 ran packed, x is already pooled for the next stage
        already_pooled = (packed_stage0 and i == 1) or \
            (packed_stage1 and i == 2)
        first = (i == 0) or already_pooled
        if is_parallel_block and str(i) in adapters:
            # parallel block adapter sees the stage input (post-pool for
            # stages >= 1, reference ynet.py:267-279)
            branch_in = x if first else max_pool_2x2(x)
            y, ns = _stage_apply(sp, ss, cfg, i, x, train, first_stage=first)
            ad, ads = _adapter_block_apply(adapters[str(i)],
                                           adapter_state.get(str(i), {}),
                                           cfg, branch_in, train)
            y = y + ad
            if ads:
                adapter_state[str(i)] = ads
        else:
            y, ns = _stage_apply(sp, ss, cfg, i, x, train, first_stage=first)
            if is_serial_block and str(i) in adapters:
                y, ads = _adapter_block_apply(adapters[str(i)],
                                              adapter_state.get(str(i), {}),
                                              cfg, y, train)
                if ads:
                    adapter_state[str(i)] = ads
        if ns:
            stage_state[str(i)] = ns
        features.append(y)
        x = y

    features.append(max_pool_2x2(x))

    new_state = {}
    if stage_state:
        new_state["stages"] = stage_state
    if adapter_state:
        new_state["adapters"] = adapter_state
    return features, new_state


# --- fusion encoder (Y-Net-Mod, ynet.py:286-395) ---------------------------

def _fusion_branch_init(key, cfg, branch, in_ch, chans, n_sep):
    """scene/motion branch: first conv stage + n_sep pooled stages.

    Conv kind is keyed on the branch name (the reference passes
    l='scene'|'motion'|'fusion' to get_conv2d, ynet.py:306-363), so
    serialLayer adapters in a selected branch carry BN state — returned
    alongside params like the plain encoder."""
    stages, state = {}, {}
    p, s = _conv_unit_init(jax.random.fold_in(key, 0), cfg,
                           branch, in_ch, chans[0] // 2)
    stages["0"] = {"conv0": p}
    if s:
        state["0"] = {"conv0": s}
    for i in range(n_sep):
        ki = jax.random.fold_in(key, i + 1)
        p0, s0 = _conv_unit_init(jax.random.fold_in(ki, 0), cfg, branch,
                                 chans[i] // 2, chans[i + 1] // 2)
        p1, s1 = _conv_unit_init(jax.random.fold_in(ki, 1), cfg, branch,
                                 chans[i + 1] // 2, chans[i + 1] // 2)
        stages[str(i + 1)] = {"conv0": p0, "conv1": p1}
        st = {}
        if s0:
            st["conv0"] = s0
        if s1:
            st["conv1"] = s1
        if st:
            state[str(i + 1)] = st
    return stages, state


def _fusion_encoder_init(key, cfg: YNetConfig):
    chans = cfg.encoder_channels
    n_sep = len(chans) - cfg.n_fusion - 1
    state = {}
    scene, scene_st = _fusion_branch_init(
        jax.random.fold_in(key, 1), cfg, "scene",
        cfg.n_semantic_classes, chans, n_sep)
    motion, motion_st = _fusion_branch_init(
        jax.random.fold_in(key, 2), cfg, "motion", cfg.obs_len, chans, n_sep)
    fusion, fusion_st = {}, {}
    for j, i in enumerate(range(n_sep, len(chans) - 1)):
        ki = jax.random.fold_in(jax.random.fold_in(key, 3), j)
        p0, s0 = _conv_unit_init(jax.random.fold_in(ki, 0), cfg, "fusion",
                                 chans[i], chans[i + 1])
        p1, s1 = _conv_unit_init(jax.random.fold_in(ki, 1), cfg, "fusion",
                                 chans[i + 1], chans[i + 1])
        fusion[str(j)] = {"conv0": p0, "conv1": p1}
        st = {}
        if s0:
            st["conv0"] = s0
        if s1:
            st["conv1"] = s1
        if st:
            fusion_st[str(j)] = st
    if scene_st:
        state["scene_stages"] = scene_st
    if motion_st:
        state["motion_stages"] = motion_st
    if fusion_st:
        state["fusion_stages"] = fusion_st
    return {"scene_stages": scene, "motion_stages": motion,
            "fusion_stages": fusion}, state


def _fusion_encoder_apply(params, state, cfg: YNetConfig, scene_map,
                          motion_map, train):
    """YNetEncoderFusion.forward (ynet.py:369-395). Returns
    (features, new_state); state is non-empty only for serialLayer
    adapters (BN running stats) in a selected branch."""
    state = state or {}
    new_state = {}

    def run_branch(group, branch, x):
        stages = params[group]
        gstate = state.get(group, {})
        gnew = {}
        outs = []
        for i in range(len(stages)):
            y, s = _stage_apply(stages[str(i)], gstate.get(str(i), {}),
                                cfg, branch, x, train,
                                first_stage=(i == 0 and
                                             group != "fusion_stages"))
            if s:
                gnew[str(i)] = s
            outs.append(y)
            x = y
        if gnew:
            new_state[group] = gnew
        return outs

    scene_feats = run_branch("scene_stages", "scene", scene_map)
    motion_feats = run_branch("motion_stages", "motion", motion_map)
    features = [jnp.concatenate([s, m], axis=-1)
                for s, m in zip(scene_feats, motion_feats)]

    fused = run_branch("fusion_stages", "fusion", features[-1])
    features.extend(fused)
    features.append(max_pool_2x2(fused[-1] if fused else features[-1]))
    return features, new_state


# ---------------------------------------------------------------------------
# decoder (reference ynet.py:398-471)
# ---------------------------------------------------------------------------

def _decoder_init(key, cfg: YNetConfig, traj: int | bool = False):
    enc = list(cfg.encoder_channels)
    if traj:
        enc = [c + int(traj) for c in enc]
    enc = enc[::-1]
    center_ch = enc[0]
    dec = list(cfg.decoder_channels)

    params = {}
    kc = jax.random.fold_in(key, 0)
    params["center"] = {
        "0": layers.conv2d_init(jax.random.fold_in(kc, 0), center_ch,
                                center_ch * 2, 3),
        "1": layers.conv2d_init(jax.random.fold_in(kc, 1), center_ch * 2,
                                center_ch * 2, 3),
    }
    up_in = [center_ch * 2] + dec[:-1]
    up_out = [c // 2 for c in up_in]
    params["upsample"] = {
        str(i): layers.conv2d_init(jax.random.fold_in(key, 100 + i), ci, co, 3)
        for i, (ci, co) in enumerate(zip(up_in, up_out))
    }
    blk_in = [e + u for e, u in zip(enc, up_out)]
    params["blocks"] = {}
    for i, (ci, co) in enumerate(zip(blk_in, dec)):
        kb = jax.random.fold_in(key, 200 + i)
        params["blocks"][str(i)] = {
            "0": layers.conv2d_init(jax.random.fold_in(kb, 0), ci, co, 3),
            "1": layers.conv2d_init(jax.random.fold_in(kb, 1), co, co, 3),
        }
    params["predictor"] = layers.conv2d_init(
        jax.random.fold_in(key, 300), dec[-1], cfg.pred_len, 1)
    return params


def _decoder_apply(params, features, packed_finest: bool = False,
                   features0_packed: bool = False,
                   return_packed: bool = False,
                   features1_packed: bool = False):
    """YNetDecoder.forward (ynet.py:453-471); features NHWC, coarsest last.

    packed_finest runs the finest (full-resolution) level space-to-depth
    packed (mst_tpu.ops.packed): its convs have C_out <= 32 and waste most
    of the MXU's 128 output lanes; the packed program is the exact same
    function (tested), so training gradients are unchanged.
    features0_packed / features1_packed mark features[0] / features[1] as
    already space-to-depth packed (packed_stage0/1 encoder); require
    packed_finest (and, for features[1], the deep packed level).
    """
    assert packed_finest or not (features0_packed or features1_packed)
    feats = features[::-1]
    x = feats[0]
    x = jax.nn.relu(layers.conv2d_apply(params["center"]["0"], x))
    x = jax.nn.relu(layers.conv2d_apply(params["center"]["1"], x))
    n = len(params["blocks"])
    deep_packed = (
        packed_finest and n >= 3
        and params["blocks"][str(n - 2)]["1"]["weight"].shape[-1] <= 32)
    assert deep_packed or not features1_packed, \
        "packed features[1] needs the deep packed decoder level"
    for i in range(n):
        if deep_packed and i == n - 2:
            from mst_tpu.ops import packed as packed_lib

            # second-finest level packed (C_out <= 32); one depth_to_space
            # bridges into the packed finest level below
            up_p = params["upsample"][str(i)]
            b0 = params["blocks"][str(i)]["0"]
            b1 = params["blocks"][str(i)]["1"]
            cin = up_p["weight"].shape[2]
            lo = up_p["weight"].shape[3]
            xq = packed_lib.packed_upsample_2x(
                x, jnp.asarray(packed_lib.packed_upsample_kernel(cin)))
            xq = packed_lib.packed_conv(
                xq, packed_lib.pack_conv3x3_kernel(up_p["weight"]),
                packed_lib.pack_bias(up_p["bias"]) if "bias" in up_p
                else None)
            fq = (feats[i + 1] if features1_packed
                  else packed_lib.space_to_depth(feats[i + 1]))
            # ONE concat conv instead of conv(xq)+conv(fq): the per-packed-
            # kernel concat along axis 2 matches concat([xq, fq]) channel
            # order exactly, and the doubled contraction depth keeps the
            # MXU pipeline full (split halves ran at ~87 vs ~190 TF/s in
            # the r3 train xprof)
            b0_cat = jnp.concatenate(
                [packed_lib.pack_conv3x3_kernel(b0["weight"][:, :, :lo, :]),
                 packed_lib.pack_conv3x3_kernel(b0["weight"][:, :, lo:, :])],
                axis=2)
            yq = packed_lib.packed_conv(
                jnp.concatenate([xq, fq], axis=-1), b0_cat,
                packed_lib.pack_bias(b0["bias"]) if "bias" in b0 else None)
            yq = jax.nn.relu(yq)
            yq = packed_lib.packed_conv(
                yq, packed_lib.pack_conv3x3_kernel(b1["weight"]),
                packed_lib.pack_bias(b1["bias"]) if "bias" in b1 else None)
            yq = jax.nn.relu(yq)
            x = packed_lib.depth_to_space(yq)
            continue
        if packed_finest and i == n - 1:
            from mst_tpu.ops import packed as packed_lib

            up_p = params["upsample"][str(i)]
            b0 = params["blocks"][str(i)]["0"]
            b1 = params["blocks"][str(i)]["1"]
            pred = params["predictor"]
            cin = up_p["weight"].shape[2]
            lo = up_p["weight"].shape[3]
            xq = packed_lib.packed_upsample_2x(
                x, jnp.asarray(packed_lib.packed_upsample_kernel(cin)))
            xq = packed_lib.packed_conv(
                xq, packed_lib.pack_conv3x3_kernel(up_p["weight"]),
                packed_lib.pack_bias(up_p["bias"]) if "bias" in up_p
                else None)
            fq = (feats[i + 1] if features0_packed
                  else packed_lib.space_to_depth(feats[i + 1]))
            # ONE concat conv (see the deep level above for why)
            b0_cat = jnp.concatenate(
                [packed_lib.pack_conv3x3_kernel(b0["weight"][:, :, :lo, :]),
                 packed_lib.pack_conv3x3_kernel(b0["weight"][:, :, lo:, :])],
                axis=2)
            yq = packed_lib.packed_conv(
                jnp.concatenate([xq, fq], axis=-1), b0_cat,
                packed_lib.pack_bias(b0["bias"]) if "bias" in b0 else None)
            yq = jax.nn.relu(yq)
            yq = packed_lib.packed_conv(
                yq, packed_lib.pack_conv3x3_kernel(b1["weight"]),
                packed_lib.pack_bias(b1["bias"]) if "bias" in b1 else None)
            yq = jax.nn.relu(yq)
            yq = packed_lib.packed_conv(
                yq, packed_lib.pack_conv1x1_kernel(pred["weight"]),
                packed_lib.pack_bias(pred["bias"]) if "bias" in pred
                else None)
            if return_packed:
                return yq
            return packed_lib.depth_to_space(yq)
        x = upsample_bilinear_2x(x)
        x = layers.conv2d_apply(params["upsample"][str(i)], x)
        x = jnp.concatenate([x, feats[i + 1]], axis=-1)
        blk = params["blocks"][str(i)]
        x = jax.nn.relu(layers.conv2d_apply(blk["0"], x))
        x = jax.nn.relu(layers.conv2d_apply(blk["1"], x))
    return layers.conv2d_apply(params["predictor"], x)


# ---------------------------------------------------------------------------
# embeddings + semantic adapter
# ---------------------------------------------------------------------------

def _embedding_init(key, ch):
    """3x (conv3x3 + ReLU), constant channels (ynet.py:154-167)."""
    return {str(i): layers.conv2d_init(jax.random.fold_in(key, i), ch, ch, 3)
            for i in range(3)}


def _embedding_apply(params, x):
    for i in range(3):
        x = jax.nn.relu(layers.conv2d_apply(params[str(i)], x))
    return x


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_ynet(key, cfg: YNetConfig):
    """Initialize YNet parameters + mutable state. Returns (params, state)."""
    params, state = {}, {}
    if cfg.network == "fusion":
        params["encoder"], enc_state = _fusion_encoder_init(
            jax.random.fold_in(key, 1), cfg)
    else:
        params["encoder"], enc_state = _encoder_init(
            jax.random.fold_in(key, 1), cfg)
    if enc_state:
        state["encoder"] = enc_state

    params["goal_decoder"] = _decoder_init(jax.random.fold_in(key, 2), cfg)
    params["traj_decoder"] = _decoder_init(jax.random.fold_in(key, 3), cfg,
                                           traj=cfg.n_waypoints)

    if "semantic" in cfg.train_net:
        k = int(cfg.train_net.split("_")[-1].split("x")[0])
        params["semantic_adapter"] = layers.conv2d_init(
            jax.random.fold_in(key, 4), cfg.n_semantic_classes,
            cfg.n_semantic_classes, k, bias=True, zero_init=True)

    if cfg.network == "embed":
        params["scene_embedding"] = _embedding_init(
            jax.random.fold_in(key, 5), cfg.n_semantic_classes)
        params["motion_embedding"] = _embedding_init(
            jax.random.fold_in(key, 6), cfg.obs_len)

    return params, state


def adapt_semantic(params, cfg: YNetConfig, semantic_img):
    """Residual semantic adapter (ynet.py:554-559)."""
    if "semantic_adapter" not in params:
        return semantic_img
    return layers.conv2d_apply(params["semantic_adapter"],
                               semantic_img) + semantic_img


def scene_embedding(params, cfg, x):
    return _embedding_apply(params["scene_embedding"], x) \
        if "scene_embedding" in params else x


def motion_embedding(params, cfg, x):
    return _embedding_apply(params["motion_embedding"], x) \
        if "motion_embedding" in params else x


def pred_features(params, state, cfg: YNetConfig, scene_map, motion_map,
                  train=False, packed_stage0=False, packed_stage1=False):
    """Encoder forward. scene_map (B,H,W,Cs), motion_map (B,H,W,obs_len).

    Returns (features list, new_state). reference: ynet.py:570-575.
    With packed_stage0/1, features[0]/features[1] are the space-to-depth
    packed stage outputs (see _encoder_apply).
    """
    enc_state = state.get("encoder", {})
    if cfg.network == "fusion":
        feats, new_enc = _fusion_encoder_apply(
            params["encoder"], enc_state, cfg, scene_map, motion_map, train)
    else:
        x = jnp.concatenate([scene_map, motion_map], axis=-1)
        feats, new_enc = _encoder_apply(params["encoder"], enc_state, cfg, x,
                                        train, packed_stage0=packed_stage0,
                                        packed_stage1=packed_stage1)
    new_state = dict(state)
    if new_enc:
        new_state["encoder"] = new_enc
    return feats, new_state


def pred_goal(params, features, packed_finest=False,
              features0_packed=False, return_packed=False,
              features1_packed=False):
    """(B,H,W,pred_len) goal/waypoint heatmap logits (or the packed
    (B,H/2,W/2,4*pred_len) layout with return_packed)."""
    return _decoder_apply(params["goal_decoder"], features, packed_finest,
                          features0_packed, return_packed,
                          features1_packed=features1_packed)


def pred_traj(params, features_with_waypoints, packed_finest=False):
    """(B,H,W,pred_len) trajectory heatmap logits."""
    return _decoder_apply(params["traj_decoder"], features_with_waypoints,
                          packed_finest)


def make_shared_pred_traj(params, features, n_wp: int,
                          packed_finest: bool = False,
                          features0_packed: bool = False,
                          return_packed: bool = False,
                          wp_finest_packed: bool = False,
                          features1_packed: bool = False,
                          return_prepredictor: bool = False):
    """K-sample trajectory decoding with hoisted encoder contributions.

    The eval loop decodes K goal samples against the SAME encoder features
    (reference evaluate.py:248-266 recomputes the full decoder per sample).
    Convolution is linear over input channels, so every first conv that sees
    concat([decoder_path, encoder_feature, waypoint_map]) splits into
    conv(decoder_path) + conv(encoder_feature) + conv(waypoint_map); the
    encoder term is K-invariant and computed ONCE per batch here. This avoids
    broadcasting (B -> K*B) feature maps through HBM and removes the
    K-redundant encoder-channel FLOPs. Numerics identical to pred_traj up to
    fp summation order.

    Args:
      params: full model params; features: list of (B, h, w, c) maps.
      n_wp: waypoint channels appended at each level.

    Returns:
      decode(wp_pyramid) where wp_pyramid is a list of (KB, h, w, n_wp)
      maps (finest first, like avg_pool_pyramid output) and KB is a multiple
      of B; returns (KB, H, W, pred_len) logits.
    """
    d = params["traj_decoder"]
    L = len(features)
    feats_rev = features[::-1]
    B = features[0].shape[0]

    def conv_slice(conv_params, x, lo, hi, bias=False):
        w = conv_params["weight"][:, :, lo:hi, :]
        p = {"weight": w}
        if bias and "bias" in conv_params:
            p["bias"] = conv_params["bias"]
        return layers.conv2d_apply(p, x)

    assert packed_finest or not (features0_packed or features1_packed)
    assert packed_finest or not return_prepredictor
    enc_ch = [f.shape[-1] for f in feats_rev]  # coarsest-first channels
    if features0_packed:
        enc_ch[-1] //= 4  # features[0] carries 4C packed channels
    if features1_packed:
        enc_ch[-2] //= 4  # features[1] too (packed_stage1 encoder)

    # center block first conv input = concat(f_coarsest, wp_coarsest)
    center_enc = conv_slice(d["center"]["0"], feats_rev[0], 0, enc_ch[0])
    # block i first conv input = concat(up_out, f_i+1, wp_i+1)
    up_out = [d["upsample"][str(i)]["weight"].shape[-1] for i in range(L - 1)]
    block_enc = []
    for i in range(L - 1):
        lo = up_out[i]
        hi = lo + enc_ch[i + 1]
        if (features0_packed and i == L - 2) or \
                (features1_packed and i == L - 3):
            block_enc.append(None)  # computed packed below
            continue
        block_enc.append(conv_slice(d["blocks"][str(i)]["0"],
                                    feats_rev[i + 1], lo, hi))

    if packed_finest:
        # space-to-depth fast path for the finest (full-resolution) level:
        # its convs have C_out <= 32, wasting >= 75% of the 128-lane MXU;
        # packing 2x2 blocks into channels makes them dense at exactly the
        # same math (mst_tpu.ops.packed). Kernels are packed once per trace.
        from mst_tpu.ops import packed as packed_lib

        i_last = L - 2
        # second-finest level: also C_out <= 32 on SDD/inD shapes -> pack it
        # too (runs at quarter res with 4x channels; one depth_to_space
        # bridges into the finest packed level)
        i3 = L - 3
        deep_packed = (
            L >= 4
            and d["blocks"][str(i3)]["1"]["weight"].shape[-1] <= 32)
        up_p = d["upsample"][str(i_last)]
        b0_p = d["blocks"][str(i_last)]["0"]
        b1_p = d["blocks"][str(i_last)]["1"]
        cin_last = up_p["weight"].shape[2]
        lo_l = up_out[i_last]
        hi_l = lo_l + enc_ch[i_last + 1]
        pk = {
            "up_fixed": jnp.asarray(
                packed_lib.packed_upsample_kernel(cin_last)),
            "up_w": packed_lib.pack_conv3x3_kernel(up_p["weight"]),
            "up_b": (packed_lib.pack_bias(up_p["bias"])
                     if "bias" in up_p else None),
            "b0_up": packed_lib.pack_conv3x3_kernel(
                b0_p["weight"][:, :, :lo_l, :]),
            "b0_wp": packed_lib.pack_conv3x3_kernel(
                b0_p["weight"][:, :, hi_l:hi_l + n_wp, :]),
            "b0_b": (packed_lib.pack_bias(b0_p["bias"])
                     if "bias" in b0_p else None),
            "b1_w": packed_lib.pack_conv3x3_kernel(b1_p["weight"]),
            "b1_b": (packed_lib.pack_bias(b1_p["bias"])
                     if "bias" in b1_p else None),
            "pred_w": packed_lib.pack_conv1x1_kernel(
                d["predictor"]["weight"]),
            "pred_b": (packed_lib.pack_bias(d["predictor"]["bias"])
                       if "bias" in d["predictor"] else None),
        }
        if features0_packed:
            # enc contribution computed directly in packed space
            pk["enc"] = packed_lib.packed_conv(
                feats_rev[i_last + 1],
                packed_lib.pack_conv3x3_kernel(
                    b0_p["weight"][:, :, lo_l:hi_l, :]))
        else:
            pk["enc"] = packed_lib.space_to_depth(block_enc[i_last])
        # KB == B (train) fused path: no K axis to hoist over, so ONE
        # concat conv over [up, enc_feature, wp] beats the 3-way split
        # (deeper contraction keeps the MXU full; r3 train xprof)
        pk["enc_q"] = (feats_rev[i_last + 1] if features0_packed
                       else packed_lib.space_to_depth(feats_rev[i_last + 1]))
        pk["b0_cat"] = jnp.concatenate(
            [pk["b0_up"],
             packed_lib.pack_conv3x3_kernel(
                 b0_p["weight"][:, :, lo_l:hi_l, :]),
             pk["b0_wp"]], axis=2)

        if deep_packed:
            up3 = d["upsample"][str(i3)]
            b03 = d["blocks"][str(i3)]["0"]
            b13 = d["blocks"][str(i3)]["1"]
            cin3 = up3["weight"].shape[2]
            lo3 = up_out[i3]
            hi3 = lo3 + enc_ch[i3 + 1]
            pk3 = {
                "up_fixed": jnp.asarray(
                    packed_lib.packed_upsample_kernel(cin3)),
                "up_w": packed_lib.pack_conv3x3_kernel(up3["weight"]),
                "up_b": (packed_lib.pack_bias(up3["bias"])
                         if "bias" in up3 else None),
                "b0_up": packed_lib.pack_conv3x3_kernel(
                    b03["weight"][:, :, :lo3, :]),
                "b0_wp": packed_lib.pack_conv3x3_kernel(
                    b03["weight"][:, :, hi3:hi3 + n_wp, :]),
                "b0_b": (packed_lib.pack_bias(b03["bias"])
                         if "bias" in b03 else None),
                "b1_w": packed_lib.pack_conv3x3_kernel(b13["weight"]),
                "b1_b": (packed_lib.pack_bias(b13["bias"])
                         if "bias" in b13 else None),
            }
            if features1_packed:
                # features[1] arrives packed (packed_stage1 encoder)
                pk3["enc_q"] = feats_rev[i3 + 1]
                pk3["enc"] = packed_lib.packed_conv(
                    pk3["enc_q"],
                    packed_lib.pack_conv3x3_kernel(
                        b03["weight"][:, :, lo3:hi3, :]))
            else:
                # K-invariant enc contribution, repacked once per batch
                pk3["enc"] = packed_lib.space_to_depth(block_enc[i3])
                # KB == B fused-concat variant (see pk["b0_cat"])
                pk3["enc_q"] = packed_lib.space_to_depth(feats_rev[i3 + 1])
            pk3["b0_cat"] = jnp.concatenate(
                [pk3["b0_up"],
                 packed_lib.pack_conv3x3_kernel(
                     b03["weight"][:, :, lo3:hi3, :]),
                 pk3["b0_wp"]], axis=2)

    def tile(x, KB):
        reps = KB // B
        return jnp.broadcast_to(x[None], (reps,) + x.shape).reshape(
            (KB,) + x.shape[1:])

    def decode(wp_pyramid):
        KB = wp_pyramid[0].shape[0]
        wp_rev = wp_pyramid[::-1]
        # center
        c0 = d["center"]["0"]
        x = (tile(center_enc, KB)
             + conv_slice(c0, wp_rev[0], enc_ch[0], enc_ch[0] + n_wp))
        if "bias" in c0:
            x = x + c0["bias"]
        x = jax.nn.relu(x)
        x = jax.nn.relu(layers.conv2d_apply(d["center"]["1"], x))
        for i in range(L - 1):
            if packed_finest and deep_packed and i == L - 3:
                from mst_tpu.ops import packed as packed_lib

                # second-finest level in packed space: x is at quarter the
                # finest resolution; packed space of the half-res grid IS
                # this resolution
                xq3 = packed_lib.packed_upsample_2x(x, pk3["up_fixed"])
                xq3 = packed_lib.packed_conv(xq3, pk3["up_w"], pk3["up_b"])
                wpq3 = packed_lib.space_to_depth(wp_rev[i + 1])
                if KB == B:
                    # train: no K axis — one fused concat conv
                    yq3 = packed_lib.packed_conv(
                        jnp.concatenate([xq3, pk3["enc_q"], wpq3], -1),
                        pk3["b0_cat"], pk3["b0_b"])
                else:
                    yq3 = (packed_lib.packed_conv(xq3, pk3["b0_up"])
                           + tile(pk3["enc"], KB)
                           + packed_lib.packed_conv(wpq3, pk3["b0_wp"]))
                    if pk3["b0_b"] is not None:
                        yq3 = yq3 + pk3["b0_b"]
                yq3 = jax.nn.relu(yq3)
                yq3 = packed_lib.packed_conv(yq3, pk3["b1_w"], pk3["b1_b"])
                yq3 = jax.nn.relu(yq3)
                # bridge into the finest packed level (which upsamples from
                # the real half-res grid)
                x = packed_lib.depth_to_space(yq3)
                continue
            if packed_finest and i == L - 2:
                from mst_tpu.ops import packed as packed_lib

                # x is at half the finest resolution — packed space IS this
                # resolution, so the whole finest level runs here
                xq = packed_lib.packed_upsample_2x(x, pk["up_fixed"])
                xq = packed_lib.packed_conv(xq, pk["up_w"], pk["up_b"])
                # wp_finest_packed: the pyramid's finest entry arrives
                # already in packed layout (ops.heatmap.rasterize_dist_packed
                # + pyramid_from_packed) — no full-res map exists
                wpq = (wp_rev[i + 1] if wp_finest_packed
                       else packed_lib.space_to_depth(wp_rev[i + 1]))
                if KB == B:
                    # train: no K axis — one fused concat conv
                    yq = packed_lib.packed_conv(
                        jnp.concatenate([xq, pk["enc_q"], wpq], -1),
                        pk["b0_cat"], pk["b0_b"])
                else:
                    yq = (packed_lib.packed_conv(xq, pk["b0_up"])
                          + tile(pk["enc"], KB)
                          + packed_lib.packed_conv(wpq, pk["b0_wp"]))
                    if pk["b0_b"] is not None:
                        yq = yq + pk["b0_b"]
                yq = jax.nn.relu(yq)
                yq = packed_lib.packed_conv(yq, pk["b1_w"], pk["b1_b"])
                yq = jax.nn.relu(yq)
                if return_prepredictor:
                    # producer-owning fused kernel path: the caller runs
                    # the predictor matmul + softargmax in one Pallas
                    # kernel (ops/pallas/fused_predict.py) — the packed
                    # logits volume never reaches HBM
                    return yq, pk["pred_w"], pk["pred_b"]
                yq = packed_lib.packed_conv(yq, pk["pred_w"], pk["pred_b"])
                if return_packed:
                    # caller consumes the packed layout directly (e.g.
                    # ops.softargmax.softargmax2d_packed) — the full-res
                    # volume is never materialized
                    return yq
                return packed_lib.depth_to_space(yq)
            x = upsample_bilinear_2x(x)
            x = layers.conv2d_apply(d["upsample"][str(i)], x)
            b0 = d["blocks"][str(i)]["0"]
            lo = up_out[i]
            hi = lo + enc_ch[i + 1]
            y = (conv_slice(b0, x, 0, lo)
                 + tile(block_enc[i], KB)
                 + conv_slice(b0, wp_rev[i + 1], hi, hi + n_wp))
            if "bias" in b0:
                y = y + b0["bias"]
            x = jax.nn.relu(y)
            x = jax.nn.relu(layers.conv2d_apply(d["blocks"][str(i)]["1"], x))
        return layers.conv2d_apply(d["predictor"], x)

    return decode


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
