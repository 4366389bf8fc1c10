"""Jitted train / eval steps.

The reference's hot loops (utils/train_epoch.py:44-126 and
utils/evaluate.py:109-291) interleave Python, host-side template slicing and
per-sample decoder loops. Here each is ONE compiled XLA program per scene
shape bucket:

- heatmap construction is fused on-device rasterization (mst_tpu.ops.heatmap),
- the multi-goal eval folds the K-sample axis into the batch (chunked with
  lax.map to bound decoder activation memory) instead of a Python loop,
- gradients flow only through the trainable partition of the parameter
  pytree; under a Mesh, XLA inserts the data-axis all-reduce.

Functions are built per static config by `make_train_step` / `make_eval_step`
and cached by (image shape, batch size) bucket through jax.jit.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mst_tpu.models import ynet as ynet_lib
from mst_tpu.ops.heatmap import (pyramid_from_packed, rasterize_dist_nhwc,
                                 rasterize_dist_packed,
                                 rasterize_gaussian_nhwc,
                                 rasterize_gaussian_packed)
from mst_tpu.ops.kmeans import batched_kmeans
from mst_tpu.ops.pooling import avg_pool_pyramid
from mst_tpu.ops.sampling import sample_heatmap
from mst_tpu.ops.softargmax import (softargmax2d_auto, softargmax2d_nhwc,
                                    softargmax2d_packed,
                                    softargmax_on_prob_map)
from mst_tpu.train.freeze import merge_params
from mst_tpu.train.losses import bce_with_logits


class CWSParams(NamedTuple):
    """CWS prior settings (config key CWS_params; reference
    evaluate.py:177-181). A NamedTuple rather than the raw config dict so
    StepConfig stays hashable — cached_eval_step keys its memo on scfg, and
    a dict here would silently disable memoization for every config that
    carries CWS_params (all inD yamls do, even with use_CWS off)."""
    sigma_factor: float
    ratio: float
    rot: bool


class StepConfig(NamedTuple):
    """Static hyper-parameters shared by train/eval steps (from the flat
    params dict; reference: config/*.yaml + models/trainer.py:80-87)."""
    obs_len: int
    pred_len: int
    waypoints: tuple
    template_size: int  # int(4200 * resize_factor), trainer.py:61
    kernlen: int
    nsig: float
    loss_scale: float
    resize_factor: float
    temperature: float
    n_goal: int
    n_traj: int
    use_ttst: bool = False
    rel_threshold: float = 0.01
    use_cws: bool = False
    cws_params: Any = None
    eval_k_chunk: int = 0  # 0 -> all K at once
    swap_semantic: bool = False
    compute_dtype: Any = jnp.float32
    segment_in_step: bool = False  # run the segmentation backbone inside the
    # step (needed when tuning 'segmentation_*' params or past e_unfreeze;
    # otherwise the backbone output is cached per scene, the reference's
    # train_epoch.py:34-38 trick)
    segment_train_mode: bool = False  # e_unfreeze passed: backbone BN runs
    # on batch statistics and its running stats adapt, carried in
    # state['segmentation_bn'] (reference model.train(),
    # train_epoch.py:27-48; params stay frozen per trainer.py:113-114)
    use_features_only: bool = False
    world_coords: bool = False  # ETH/UCY: homography px->world before
    # metrics (reference evaluate.py:271-274, image_utils.py:138-162);
    # batch carries a per-scene 'homography' (3,3) with the eth/hotel
    # x/y swap pre-folded in
    packed_decode: bool = True  # space-to-depth the finest decoder level in
    # the K-sample eval decode (ops/packed.py): ~27% faster on v5e, same
    # math to fp tolerance
    fused_predict: bool = False  # producer-owning Pallas kernel for the
    # eval decode tail: predictor matmul + packed softargmax in one kernel
    # (ops/pallas/fused_predict.py) — the packed logits volume never
    # reaches HBM. MEASURED AND REJECTED on v5e (round 4): 71.7 vs 88.2
    # traj/s end-to-end. The kernel itself streams at ~full HBM rate
    # (~1.9 ms net standalone), but the tpu_custom_call operand boundary
    # forces XLA to materialize the 1.73 GB b1 activation (~16 ms — the
    # same cost as one elementwise pass over it) that the XLA reduction
    # fusions read in the conv's native tiled layout for free. Kept as an
    # option + numeric tests; see ROADMAP round-4 perf notes.
    remat: bool = False  # rematerialize the train forward (jax.checkpoint
    # around the encoder and the goal/traj decoders): the backward pass
    # recomputes their internal conv activations instead of holding all of
    # them in HBM across the step — trades ~1/3 more conv FLOPs for a
    # large activation-memory cut, the standard lever for big-scene /
    # big-batch training (pairs with the ('data','space') spatial mesh)


def _cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree (mixed-precision compute copy;
    master weights stay f32 in the optimizer)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) \
                and x.dtype != dtype:
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def _compute_params(params, scfg):
    """Params in compute dtype (bf16 on TPU doubles the MXU rate; casts are
    fused into the convs by XLA). f32 is the identity."""
    if scfg.compute_dtype == jnp.float32:
        return params
    return _cast_floats(params, scfg.compute_dtype)


def _prepare_inputs(mcfg, scfg, params, semantic, traj, train, rng=None,
                    seg_bn_state=None, scene_idx=None):
    """semantic (B or 1, H, W, C) + traj (B, T, 2) -> model inputs (plus a
    dict of backbone BN-stat updates, non-empty only in segment_train_mode).

    scene_idx (B,) int32 marks a cross-scene bucketed batch: semantic is a
    (S, H, W, C) stack of distinct scene maps and each row gathers its map
    AFTER segmentation/adaptation ran once per distinct scene
    (data/scenes.py:make_bucketed_batches).

    When scfg.segment_in_step, `semantic` is the raw preprocessed image and
    the backbone runs here (differentiably, for segmentation_* strategies;
    with batch-stats BN past e_unfreeze). `params` must already be in
    compute dtype; outputs are compute dtype (JAX promotion would silently
    upcast bf16 x f32 -> f32, so inputs are cast explicitly before touching
    any weights).
    """
    B = traj.shape[0]
    H, W = semantic.shape[-3], semantic.shape[-2]
    semantic = semantic.astype(scfg.compute_dtype)
    seg_updates = {}
    if scfg.segment_in_step and "segmentation" in params:
        from mst_tpu.models import segmentation as seg_lib

        if scfg.segment_train_mode and train:
            semantic, seg_updates = seg_lib.apply(
                params["segmentation"], semantic, scfg.use_features_only,
                bn_state=seg_bn_state, train=True)
        else:
            semantic = seg_lib.apply(params["segmentation"], semantic,
                                     scfg.use_features_only,
                                     bn_state=seg_bn_state)
    semantic = ynet_lib.adapt_semantic(params, mcfg, semantic)
    if scfg.swap_semantic:
        from mst_tpu.data.images import swap_pavement_terrain
        semantic = swap_pavement_terrain(semantic)
    if scene_idx is not None:
        # per-row gather from the distinct-scene stack (XLA lowers this to
        # one dynamic-gather; the segmentation/adapters above ran on S
        # maps, not B)
        semantic = semantic[scene_idx]
    elif semantic.shape[0] != B:
        semantic = jnp.broadcast_to(semantic,
                                    (B,) + semantic.shape[1:])
    obs = traj[:, :scfg.obs_len]
    observed_map = rasterize_dist_nhwc(
        obs, H, W, scfg.template_size).astype(
            scfg.compute_dtype)  # (B,H,W,obs)
    if mcfg.network == "embed":
        semantic = ynet_lib.scene_embedding(params, mcfg, semantic)
        observed_map = ynet_lib.motion_embedding(params, mcfg, observed_map)
    return semantic, observed_map, seg_updates


def make_train_step(mcfg: ynet_lib.YNetConfig, scfg: StepConfig, optimizer,
                    jit: bool = True):
    """Build the jitted train step.

    Step signature:
      (trainable, frozen, state, opt_state, batch) ->
      (trainable, state, opt_state, metrics)
    batch: dict(semantic (1,H,W,C) preprocessed/segmented scene,
                traj (B,total_len,2), mask (B,)).

    Equivalent work to utils/train_epoch.py:44-126 but fused on device.

    jit=False returns the untraced body — the fused multi-epoch trainer
    (train/fused.py) scans it on device inside ONE program.
    """
    waypoints = jnp.asarray(scfg.waypoints)
    pack0 = bool(scfg.packed_decode) and ynet_lib.can_pack_stage0(mcfg)
    # stage 1 packs too when eligible (its 32ch half-res convs waste 3/4 of
    # the MXU lanes; r3 train xprof) — train-only, the eval program keeps
    # its measured-optimal shape. Packed features[1] is consumed by the
    # decoders' DEEP packed level, so that level must exist (<=32 channels
    # at the second-finest decoder block).
    pack1 = (bool(scfg.packed_decode) and ynet_lib.can_pack_stage1(mcfg)
             and len(mcfg.decoder_channels) >= 3
             and mcfg.decoder_channels[-2] <= 32)
    # encoder emits one feature per stage + the final pool
    L_FEATS = len(mcfg.encoder_channels) + 1

    def loss_fn(trainable, frozen, state, batch):
        params = _compute_params(merge_params(trainable, frozen), scfg)
        traj = batch["traj"]
        mask = batch["mask"]
        H, W = batch["semantic"].shape[-3], batch["semantic"].shape[-2]

        semantic, observed_map, seg_updates = _prepare_inputs(
            mcfg, scfg, params, batch["semantic"], traj, train=True,
            seg_bn_state=state.get("segmentation_bn")
            if isinstance(state, dict) else None,
            scene_idx=batch.get("scene_idx"))

        gt_future = traj[:, scfg.obs_len:]
        gt_waypoints = gt_future[:, waypoints]
        packed = bool(scfg.packed_decode)
        if packed:
            # finest level fully packed: gt maps are rasterized straight
            # into the packed layout and BCE runs on it — the masked mean
            # is layout-invariant, so the loss is the same function while
            # no full-resolution (B, H, W, pred) tensor ever exists
            gt_future_map = rasterize_gaussian_packed(
                gt_future, H, W, scfg.kernlen, scfg.nsig)
            wp_finest = rasterize_dist_packed(gt_waypoints, H, W,
                                              scfg.template_size)
            wp_pyramid = pyramid_from_packed(
                wp_finest.astype(scfg.compute_dtype), L_FEATS)
        else:
            gt_future_map = rasterize_gaussian_nhwc(
                gt_future, H, W, scfg.kernlen, scfg.nsig)  # (B,H,W,pred)
            gt_waypoint_map = rasterize_dist_nhwc(gt_waypoints, H, W,
                                                  scfg.template_size)
            wp_pyramid = avg_pool_pyramid(
                gt_waypoint_map.astype(scfg.compute_dtype), L_FEATS)

        def _encode(params, state, semantic, observed_map):
            return ynet_lib.pred_features(
                params, state, mcfg, semantic, observed_map, train=True,
                packed_stage0=pack0, packed_stage1=pack1)

        def _decode_maps(params, features, wp_pyramid):
            pg = ynet_lib.pred_goal(
                params, features, scfg.packed_decode, pack0,
                return_packed=packed, features1_packed=pack1)
            # trajectory decode in the split (shared) form — identical
            # function to conv-over-concat (tested), and it accepts packed
            # features[0]
            decode = ynet_lib.make_shared_pred_traj(
                params, features, len(scfg.waypoints),
                packed_finest=scfg.packed_decode, features0_packed=pack0,
                return_packed=packed, wp_finest_packed=packed,
                features1_packed=pack1)
            return pg, decode(wp_pyramid)

        if scfg.remat:
            # backward recomputes the encoder/decoder internals; only the
            # stage boundaries (features, the two logit maps) stay resident
            _encode = jax.checkpoint(_encode)
            _decode_maps = jax.checkpoint(_decode_maps)

        features, new_state = _encode(params, state, semantic, observed_map)
        if seg_updates:
            new_state = {**(new_state or {}),
                         "segmentation_bn": seg_updates}
        # logits back to f32: BCE stays full precision (the metric
        # softargmax reads the compute-dtype map instead — half the bytes,
        # and exp/sums run in f32 inside softargmax2d_packed anyway)
        pred_goal_map_c, pred_traj_map_c = _decode_maps(
            params, features, wp_pyramid)
        pred_goal_map = pred_goal_map_c.astype(jnp.float32)
        goal_loss = bce_with_logits(pred_goal_map, gt_future_map,
                                    mask) * scfg.loss_scale
        pred_traj_map = pred_traj_map_c.astype(jnp.float32)
        traj_loss = bce_with_logits(pred_traj_map, gt_future_map,
                                    mask) * scfg.loss_scale
        loss = goal_loss + traj_loss

        # top-1 softargmax train metrics (train_epoch.py:117-126); fed the
        # compute-dtype maps (metrics don't need f32 logits reads) and the
        # goal point slices its one channel inside the reduction
        if packed:
            pred_traj_pts = softargmax2d_packed(pred_traj_map_c,
                                                scfg.pred_len)
            pred_goal_pts = softargmax2d_packed(
                pred_goal_map_c, scfg.pred_len, channel=scfg.pred_len - 1)
        else:
            pred_traj_pts = softargmax2d_nhwc(pred_traj_map)
            pred_goal_pts = softargmax2d_nhwc(pred_goal_map[..., -1:])
        ade = jnp.sqrt((((gt_future - pred_traj_pts) / scfg.resize_factor)
                        ** 2).sum(-1)).mean(-1)
        fde = jnp.sqrt((((gt_future[:, -1:] - pred_goal_pts[:, -1:])
                         / scfg.resize_factor) ** 2).sum(-1)).mean(-1)
        metrics = {
            "loss": loss,
            "goal_loss": goal_loss,
            "traj_loss": traj_loss,
            "ade_sum": jnp.sum(ade * mask),
            "fde_sum": jnp.sum(fde * mask),
            "n": jnp.sum(mask),
        }
        return loss, (new_state, metrics)

    def train_step(trainable, frozen, state, opt_state, batch):
        grads, (new_state, metrics) = jax.grad(
            loss_fn, has_aux=True)(trainable, frozen, state, batch)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_state, opt_state, metrics

    return jax.jit(train_step) if jit else train_step


# ---------------------------------------------------------------------------
# evaluation (reference utils/evaluate.py:37-315)
# ---------------------------------------------------------------------------

def _ttst_goals(key, mcfg, params, pred_waypoint_map, pred_wp_sigmoid, scfg):
    """Test-Time Sampling Trick (evaluate.py:134-161): 10k threshold samples
    -> per-person k-means to (n_goal - 1) clusters, prepend the softargmax
    point. Batched: the per-person loop becomes vmap inside batched_kmeans."""
    k1, k2 = jax.random.split(key)
    goal_samples = sample_heatmap(
        k1, jnp.moveaxis(pred_wp_sigmoid[..., -1:], -1, 1), 10000,
        rel_threshold=scfg.rel_threshold, replacement=True)  # (B,1,10000,2)
    goal_samples = goal_samples[:, 0]  # (B, 10000, 2)
    _, centers = batched_kmeans(k2, goal_samples, scfg.n_goal - 1,
                                tol=1e-3)  # (B, K-1, 2); tol/iter_limit
    # default to the reference call's 0.001/1000 (evaluate.py:153-154)
    sam = softargmax2d_auto(jnp.moveaxis(pred_waypoint_map[..., -1:], -1, 1))
    goals = jnp.concatenate([sam[:, None, 0:1, :],
                             centers[:, :, None, :]], axis=1)  # (B,K,1,2)
    return jnp.swapaxes(goals, 0, 1)  # (K, B, 1, 2)


def make_eval_step(mcfg: ynet_lib.YNetConfig, scfg: StepConfig,
                   collect_samples: bool = False, jit: bool = True,
                   mesh=None):
    """Build the multi-goal eval step.

    Signature: (params, state, batch, key) -> metrics dict with per-trajectory
    minADE/minFDE (B,) and predictions. Compiled as TWO device programs
    orchestrated from the host — (1) forward+sampling, (2) one K-chunk of
    waypoint-conditioned trajectory decodes against the shared encoder
    features — because one monolithic program at SDD scale takes ~5 min of
    XLA compile while the split compiles in well under a minute and runs at
    the same steady-state rate. min-over-K metrics are O(K*B*T) and computed
    on host.

    collect_samples additionally returns the goal map, its tempered sigmoid
    and the per-K waypoint samples (reference evaluate.py:75-80,240-245 —
    the return_samples visualization payload), NHWC instead of NCHW.

    jit=False leaves every sub-program untraced (a pure composition) so the
    fused multi-epoch trainer (train/fused.py) can scan the whole
    validation pass inside its one compiled program.

    mesh: a non-spatial jax.sharding.Mesh makes the decode+score program
    shard_map'd over the batch axes — every row's K decodes stay on the
    device that holds the row (the decode has no cross-row math), only the
    three metric sums psum. Without this, GSPMD partitions the (K, B)
    reshape by ALL-GATHERING the per-row feature pyramids across the mesh
    (measured: 21 activation all-gathers in the 8-device decode program)
    — pure wasted ICI bandwidth. forward's outputs are pinned to the
    shard_map layout so features stream straight in without resharding.
    """
    waypoints = jnp.asarray(scfg.waypoints)
    n_wp = len(scfg.waypoints)
    pack0 = bool(scfg.packed_decode) and ynet_lib.can_pack_stage0(mcfg)
    maybe_jit = jax.jit if jit else (lambda f: f)
    shard_decode = (mesh is not None and jit
                    and "space" not in mesh.axis_names)

    def forward(params, state, batch, key):
        params = _compute_params(params, scfg)
        traj = batch["traj"]
        H, W = batch["semantic"].shape[-3], batch["semantic"].shape[-2]
        semantic, observed_map, _ = _prepare_inputs(
            mcfg, scfg, params, batch["semantic"], traj, train=False,
            seg_bn_state=state.get("segmentation_bn")
            if isinstance(state, dict) else None,
            scene_idx=batch.get("scene_idx"))
        features, _ = ynet_lib.pred_features(
            params, state, mcfg, semantic, observed_map, train=False,
            packed_stage0=pack0)
        # goal logits in f32: sampling/sigmoid/TTST/CWS stay full precision
        pred_goal_map = ynet_lib.pred_goal(
            params, features, scfg.packed_decode,
            pack0).astype(jnp.float32)  # (B,H,W,pred)
        pred_waypoint_map = pred_goal_map[..., waypoints]  # (B,H,W,n_wp)
        pred_wp_sigmoid = jax.nn.sigmoid(pred_waypoint_map / scfg.temperature)

        kg, kw = jax.random.split(key)
        # ---- goal sampling (evaluate.py:134-167)
        if scfg.use_ttst:
            goal_samples = _ttst_goals(kg, mcfg, params, pred_waypoint_map,
                                       pred_wp_sigmoid, scfg)  # (K_e,B,1,2)
        else:
            gs = sample_heatmap(
                kg, jnp.moveaxis(pred_wp_sigmoid[..., -1:], -1, 1),
                scfg.n_goal)  # (B,1,n_goal,2)
            goal_samples = jnp.transpose(gs, (2, 0, 1, 3))  # (n_goal,B,1,2)

        # ---- waypoint sampling (evaluate.py:172-238)
        if scfg.use_cws and n_wp > 1:
            waypoint_samples = _cws(kw, goal_samples, traj, pred_wp_sigmoid,
                                    scfg, H, W)
        elif n_wp > 1:
            ws = sample_heatmap(
                kw, jnp.moveaxis(pred_wp_sigmoid[..., :-1], -1, 1),
                scfg.n_goal * scfg.n_traj)  # (B,n_wp-1,K,2)
            ws = jnp.transpose(ws, (2, 0, 1, 3))  # (K,B,n_wp-1,2)
            goal_rep = jnp.tile(goal_samples, (scfg.n_traj, 1, 1, 1))
            waypoint_samples = jnp.concatenate([ws, goal_rep], axis=2)
        else:
            waypoint_samples = goal_samples  # (K,B,1,2)
        if collect_samples:
            return features, waypoint_samples, pred_goal_map
        return features, waypoint_samples

    if shard_decode:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        bx = tuple(mesh.axis_names)  # batch shards over every axis here
        row_sh = NamedSharding(mesh, P(bx))        # (B, ...) per-row
        kb_sh = NamedSharding(mesh, P(None, bx))   # (K, B, ...)
        # prefix pytrees: features list -> row_sh each
        fwd_out = ((row_sh, kb_sh, row_sh) if collect_samples
                   else (row_sh, kb_sh))
        forward = jax.jit(forward, out_shardings=fwd_out)
    else:
        forward = maybe_jit(forward)

    @maybe_jit
    def _decode_all(params, features, waypoint_samples):
        """All K decodes (lax.map over chunks, body compiled once) ->
        (Ktot, B, pred_len, 2) model-space trajectories. Encoder
        contributions to the trajectory decoder are hoisted out of the K
        loop (ynet.make_shared_pred_traj): conv linearity makes them
        K-invariant. Shared by the eval metrics path and the serving
        predict/export path (mst_tpu.serve)."""
        if pack0:  # features[0] is space-to-depth packed (half-res, 4C)
            H, W = features[1].shape[-3] * 2, features[1].shape[-2] * 2
        else:
            H, W = features[0].shape[-3], features[0].shape[-2]
        params = _compute_params(params, scfg)
        if scfg.fused_predict and not scfg.packed_decode:
            raise ValueError(
                "fused_predict requires packed_decode=True: the Pallas "
                "kernel consumes the packed finest-level activations "
                "(ops/pallas/fused_predict.py)")
        fused_pred = bool(scfg.fused_predict)
        decode = ynet_lib.make_shared_pred_traj(
            params, features, n_wp, packed_finest=scfg.packed_decode,
            features0_packed=pack0, return_packed=scfg.packed_decode,
            wp_finest_packed=scfg.packed_decode,
            return_prepredictor=fused_pred)

        def decode_chunk(waypoint_chunk):
            """(Kc, B, n_wp, 2) -> (Kc, B, pred_len, 2)."""
            Kc, B = waypoint_chunk.shape[0], waypoint_chunk.shape[1]
            flat = waypoint_chunk.reshape(Kc * B, n_wp, 2)
            if scfg.packed_decode:
                # rasterize straight into the packed layout; the full-res
                # (Kc*B, H, W, n_wp) waypoint map never exists
                wpq = rasterize_dist_packed(flat, H, W, scfg.template_size)
                pyr = pyramid_from_packed(wpq.astype(scfg.compute_dtype),
                                          len(features))
            else:
                wmap = rasterize_dist_nhwc(flat, H, W, scfg.template_size)
                pyr = avg_pool_pyramid(wmap.astype(scfg.compute_dtype),
                                       len(features))
            pred_map = decode(pyr)
            # softargmax in f32, channels-last, transpose-free; the packed
            # path never materializes the (Kc*B, H, W, pred) volume
            # (~0.7 GB/chunk at SDD scale; DTS+transpose measured at ~45%
            # of this program's time on v5e). NOTE: a single-pass Pallas
            # kernel was tried and measured SLOWER end-to-end — the custom
            # call's operand layout constraint forces a relayout copy of
            # the 0.65 GB predictor output that XLA's reduction fusions
            # read in the conv's native tiled layout (ROADMAP perf notes).
            if fused_pred:
                # decode returned (pre-predictor activations, packed
                # predictor weight/bias): one Pallas kernel computes the
                # predictor matmul + softargmax without HBM logits
                from mst_tpu.ops.pallas.fused_predict import (
                    fused_predictor_softargmax)

                yq, pred_w, pred_b = pred_map
                pts = fused_predictor_softargmax(yq, pred_w, pred_b,
                                                 scfg.pred_len)
            elif scfg.packed_decode:
                pts = softargmax2d_packed(pred_map, scfg.pred_len)
            else:
                pts = softargmax2d_nhwc(pred_map)
            return pts.reshape(Kc, B, scfg.pred_len, 2)

        Ktot, B = waypoint_samples.shape[0], waypoint_samples.shape[1]
        kc = scfg.eval_k_chunk or Ktot
        if Ktot % kc != 0:
            raise ValueError(
                f"eval_k_chunk={kc} must divide K={Ktot} "
                f"(n_goal*n_traj); pick a divisor or 0 for all-at-once")
        if kc == Ktot:
            return decode_chunk(waypoint_samples)
        chunks = waypoint_samples.reshape(Ktot // kc, kc, B, n_wp, 2)
        return jax.lax.map(
            decode_chunk, chunks).reshape(Ktot, B, scfg.pred_len, 2)

    def _score_body(params, features, waypoint_samples, traj, mask,
                    batch_hom, psum_axes=None):
        """K decodes (_decode_all) + the min-over-K metrics
        (evaluate.py:248-291). psum_axes: under shard_map the three
        scalar sums reduce over the mesh's batch axes."""
        trajs_samples = _decode_all(params, features, waypoint_samples)

        gt_future = traj[:, scfg.obs_len:]
        if scfg.world_coords:
            # ETH/UCY: convert everything to world coordinates via the
            # scene homography before computing metrics (reference
            # evaluate.py:271-274; the reference additionally re-divides
            # converted coords by resize_factor — a bit-rotted quirk we do
            # not reproduce).
            # the eth/hotel x/y swap (image_utils.py:151-153) is folded
            # into the homography host-side (H @ P_swap), so one matrix
            # covers all scenes
            hm = batch_hom
            def to_world(pts):
                p = pts / scfg.resize_factor
                ones = jnp.ones(p.shape[:-1] + (1,), p.dtype)
                h = jnp.concatenate([p, ones], axis=-1)
                w = jnp.einsum("ij,...j->...i", hm, h)
                return w[..., :2] / w[..., 2:]
            gt_w = to_world(gt_future)
            trajs_w = to_world(trajs_samples)
            goals_w = to_world(waypoint_samples[:, :, -1:])
            ade_k = jnp.sqrt(((gt_w[None] - trajs_w) ** 2).sum(-1)).mean(-1)
            fde_k = jnp.sqrt(((gt_w[None, :, -1:] - goals_w)
                              ** 2).sum(-1))[:, :, 0]
        else:
            ade_k = jnp.sqrt((((gt_future[None] - trajs_samples)
                               / scfg.resize_factor) ** 2).sum(-1)).mean(-1)
            fde_k = jnp.sqrt((((gt_future[None, :, -1:]
                                - waypoint_samples[:, :, -1:])
                               / scfg.resize_factor) ** 2).sum(-1))[:, :, 0]
        ade = ade_k.min(axis=0)
        fde = fde_k.min(axis=0)
        best_idx = ade_k.argmin(axis=0)
        best_traj = jnp.take_along_axis(
            trajs_samples, best_idx[None, :, None, None], axis=0)[0]
        ade_sum = jnp.sum(ade * mask)
        fde_sum = jnp.sum(fde * mask)
        n = jnp.sum(mask)
        if psum_axes is not None:
            ade_sum = jax.lax.psum(ade_sum, psum_axes)
            fde_sum = jax.lax.psum(fde_sum, psum_axes)
            n = jax.lax.psum(n, psum_axes)
        return {
            "ade": ade, "fde": fde, "mask": mask,
            "ade_sum": ade_sum, "fde_sum": fde_sum, "n": n,
            "best_traj": best_traj / scfg.resize_factor,
        }

    if shard_decode:
        try:
            from jax import shard_map
        except ImportError:  # jax < 0.6
            from jax.experimental.shard_map import shard_map

        bspec, kbspec, rspec = P(bx), P(None, bx), P()
        decode_and_score = jax.jit(shard_map(
            lambda p, f, w, t, m, h: _score_body(p, f, w, t, m, h,
                                                 psum_axes=bx),
            mesh=mesh,
            in_specs=(rspec, bspec, kbspec, bspec, bspec, rspec),
            out_specs={"ade": bspec, "fde": bspec, "mask": bspec,
                       "ade_sum": rspec, "fde_sum": rspec, "n": rspec,
                       "best_traj": bspec}))
    else:
        decode_and_score = maybe_jit(_score_body)

    def eval_step(params, state, batch, key):
        fwd_out = forward(params, state, batch, key)
        features, waypoint_samples = fwd_out[0], fwd_out[1]
        hom = batch.get("homography")
        if hom is None:
            hom = jnp.eye(3, dtype=jnp.float32)
        out = decode_and_score(params, features, waypoint_samples,
                               batch["traj"], batch["mask"], hom)
        if collect_samples:
            goal_map = fwd_out[2]
            out = dict(out)
            out["goal_map"] = goal_map  # (B, H, W, pred) logits, NHWC
            out["goal_sigmoid_map"] = jax.nn.sigmoid(
                goal_map / scfg.temperature)
            # (K, B, n_wp, 2) -> (B, n_wp, K, 2), evaluate.py:243-245
            out["waypoint_samples"] = jnp.transpose(waypoint_samples,
                                                    (1, 2, 0, 3))
        return out

    # the two compiled sub-programs, exposed for FLOP accounting (bench.py
    # lowers them through XLA cost analysis); decode_trajs is the
    # metrics-free K-decode used by the serving/export path (mst_tpu.serve)
    eval_step.forward = forward
    eval_step.decode_and_score = decode_and_score
    eval_step.decode_trajs = _decode_all
    return eval_step


_EVAL_STEP_MEMO = {}


def cached_eval_step(mcfg: ynet_lib.YNetConfig, scfg: StepConfig,
                     collect_samples: bool = False, mesh=None):
    """Memoized make_eval_step (jit=True only).

    The analysis tools call Experiment.test many times with only the model
    params swapped — the importance sweeps re-evaluate once per ablated
    parameter group (evaluator/importance.py) and the multi-checkpoint
    comparator once per checkpoint (evaluator/multickpts.py). A fresh
    make_eval_step closure per call would defeat jax's in-memory executable
    cache (it is keyed on the callable's identity) and re-trace + re-lower
    the two eval programs every time; returning the SAME jitted callable
    for identical (mcfg, scfg, collect_samples) makes every call after the
    first dispatch-only. Params/state/batch are arguments, so swapping
    checkpoints or LoRA overlays never stales the cache.
    """
    key = (mcfg, scfg, bool(collect_samples), mesh)
    try:
        step = _EVAL_STEP_MEMO.get(key)
    except TypeError:  # unhashable field (e.g. list waypoints): no memo
        return make_eval_step(mcfg, scfg, collect_samples, mesh=mesh)
    if step is None:
        step = make_eval_step(mcfg, scfg, collect_samples, mesh=mesh)
        _EVAL_STEP_MEMO[key] = step
    return step


def make_predict_step(mcfg: ynet_lib.YNetConfig, scfg: StepConfig):
    """Serving-path predict: no ground truth, returns ALL K sampled
    trajectories in raw-image pixels.

    The reference has no deployment story beyond its eval CLI (test.py /
    utils/evaluate.py computes metrics against ground truth inline); this
    is the same forward+sampling+decode pipeline with the metrics tail
    removed, packaged for export (mst_tpu.serve serializes the two
    sub-programs as portable StableHLO artifacts via jax.export).

    Signature: (params, state, semantic, observed, key) -> dict with
      trajectories (K, B, pred_len, 2)  raw px (K = n_goal * n_traj)
      waypoints    (K, B, n_wp, 2)      raw px

    `observed` is (B, obs_len, 2) in model-space (resized) pixels, i.e.
    raw detections * resize_factor — same convention as the train/eval
    batches. `semantic` is the per-scene semantic map (1 or B, H, W, C),
    or the raw preprocessed image when scfg.segment_in_step.

    The two sub-programs (forward+sampling, K-chunked decode) are exposed
    as predict.forward / predict.decode_trajs for separate export: the
    split compiles ~5x faster than one monolithic program at SDD scale
    (see make_eval_step) — worth keeping at deployment startup too.
    """
    es = make_eval_step(mcfg, scfg)

    @jax.jit
    def forward(params, state, semantic, observed, key):
        B = observed.shape[0]
        # the eval programs slice obs_len internally and only read the
        # future rows in the metrics tail (absent here): zero-pad to
        # total_len rather than forking _prepare_inputs
        traj = jnp.concatenate(
            [observed, jnp.zeros((B, scfg.pred_len, 2), observed.dtype)],
            axis=1)
        return es.forward(params, state,
                          {"semantic": semantic, "traj": traj}, key)

    @jax.jit
    def predict(params, state, semantic, observed, key):
        features, waypoint_samples = forward(params, state, semantic,
                                             observed, key)
        trajs = es.decode_trajs(params, features, waypoint_samples)
        return {"trajectories": trajs / scfg.resize_factor,
                "waypoints": waypoint_samples / scfg.resize_factor}

    predict.forward = forward
    predict.decode_trajs = es.decode_trajs
    return predict


def cws_gaussian_prior(mean, dist, sigma_factor, ratio, rot, H, W):
    """Oriented multivariate Gaussian prior, batched over leading dims.

    Mirrors torch_multivariate_gaussian_heatmap (reference evaluate.py:9-34):
    axes are linspace(0, H, H) == arange * H/(H-1); covariance
    T = R diag((|d|+5)/sf/ratio, (|d|+5)/sf)^2 R^T with R the heading
    rotation (optionally pre-rotated 90 deg). mean/dist (..., 2),
    sigma_factor (...,); returns (..., H, W) maps normalized to sum 1.
    """
    ys = jnp.arange(H, dtype=jnp.float32) * (H / (H - 1))
    xs = jnp.arange(W, dtype=jnp.float32) * (W / (W - 1))
    ax = ys - mean[..., 1][..., None]  # (..., H)
    ay = xs - mean[..., 0][..., None]  # (..., W)
    radians = jnp.arctan2(dist[..., 0], dist[..., 1])
    cr, sr = jnp.cos(radians), jnp.sin(radians)
    R = jnp.stack([jnp.stack([cr, sr], -1),
                   jnp.stack([-sr, cr], -1)], -2)  # (..., 2, 2)
    if rot:
        rot90 = jnp.array([[0.0, -1.0], [1.0, 0.0]])
        R = jnp.einsum("ij,...jl->...il", rot90, R)
    dist_norm = jnp.sqrt((dist**2).sum(-1)) + 5.0
    d1 = (dist_norm / sigma_factor / ratio) ** 2
    d2 = (dist_norm / sigma_factor) ** 2
    conv = jnp.zeros(R.shape).at[..., 0, 0].set(d1).at[..., 1, 1].set(d2)
    T = jnp.einsum("...ij,...jl,...ml->...im", R, conv, R)
    Tinv = jnp.linalg.inv(T)
    gx = ay[..., None, :]  # (..., 1, W) — x offsets
    gy = ax[..., :, None]  # (..., H, 1) — y offsets
    q = (Tinv[..., 0, 0][..., None, None] * gx * gx
         + (Tinv[..., 0, 1] + Tinv[..., 1, 0])[..., None, None] * gx * gy
         + Tinv[..., 1, 1][..., None, None] * gy * gy)
    kern = jnp.exp(-0.5 * q)
    return kern / kern.sum(axis=(-2, -1), keepdims=True)


def _cws(key, goal_samples, traj, pred_wp_sigmoid, scfg: StepConfig, H, W):
    """Conditional Waypoint Sampling (evaluate.py:172-226), vectorized.

    goal_samples (K_e, B, 1, 2); returns (K_e*n_traj, B, n_wp, 2).
    The reference loops over K goals and per-person Gaussians; here the
    oriented multivariate Gaussian prior is evaluated batched over (K, B).
    """
    n_wp = len(scfg.waypoints)
    cws = scfg.cws_params
    if not isinstance(cws, CWSParams):  # raw config dict
        cws = CWSParams(**cws)
    sigma_factor = float(cws.sigma_factor)
    ratio = float(cws.ratio)
    rot = bool(cws.rot)

    goal_rep = jnp.tile(goal_samples, (scfg.n_traj, 1, 1, 1))  # (K,B,1,2)
    K, B = goal_rep.shape[0], goal_rep.shape[1]
    last_observed = traj[:, scfg.obs_len - 1]  # (B,2)
    goals = goal_rep[:, :, 0]  # (K,B,2)

    wp_list = [goals[:, :, None]]  # goal first; built back-to-front
    samples = goals
    keys = jax.random.split(key, max(n_wp - 1, 1))
    traj_idx = (jnp.arange(K) // scfg.n_goal).astype(jnp.float32)  # (K,)
    for j, wnum in enumerate(reversed(range(n_wp - 1))):
        distance = last_observed[None] - samples  # (K,B,2)
        length_ratio = 1.0 / (wnum + 2)
        gauss_mean = samples + distance * length_ratio
        sf = sigma_factor - traj_idx[:, None]  # (K,B) per-goal sigma
        prior = cws_gaussian_prior(gauss_mean, distance,
                                   jnp.broadcast_to(sf, gauss_mean.shape[:2]),
                                   ratio, rot, H, W)
        wmap = pred_wp_sigmoid[..., wnum][None] * prior  # (K,B,H,W)
        wmap = wmap / wmap.sum(axis=(-2, -1), keepdims=True)
        # first-goal group: softargmax; others: threshold sample
        sam_pts = softargmax_on_prob_map(wmap)  # (K,B,2)
        sampled = sample_heatmap(keys[j], wmap, 1, rel_threshold=0.05,
                                 replacement=False)[:, :, 0]  # (K,B,2)
        first = (jnp.arange(K) // scfg.n_goal == 0)[:, None, None]
        samples = jnp.where(first, sam_pts, sampled)
        wp_list.append(samples[:, :, None])
    wp = jnp.concatenate(wp_list[::-1], axis=2)  # (K,B,n_wp,2)
    return wp
