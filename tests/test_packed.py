"""Space-to-depth packed convolution equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.ops import packed as P
from mst_tpu.ops.pooling import upsample_bilinear_2x


def _conv(x, k, bias=None):
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias
    return y


def test_space_depth_roundtrip(rng):
    x = rng.normal(size=(2, 16, 24, 5)).astype(np.float32)
    xp = P.space_to_depth(jnp.asarray(x))
    assert xp.shape == (2, 8, 12, 20)
    back = P.depth_to_space(xp)
    np.testing.assert_array_equal(np.asarray(back), x)
    # channel layout: (si, sj, c)
    np.testing.assert_array_equal(np.asarray(xp)[0, 0, 0, :5], x[0, 0, 0])
    np.testing.assert_array_equal(np.asarray(xp)[0, 0, 0, 5:10], x[0, 0, 1])
    np.testing.assert_array_equal(np.asarray(xp)[0, 0, 0, 10:15], x[0, 1, 0])


def test_packed_conv3x3_equivalence(rng):
    x = rng.normal(size=(2, 16, 24, 6)).astype(np.float32)
    k = rng.normal(size=(3, 3, 6, 7)).astype(np.float32)
    b = rng.normal(size=7).astype(np.float32)
    want = P.space_to_depth(_conv(x, k, b))
    got = P.packed_conv(P.space_to_depth(jnp.asarray(x)),
                        jnp.asarray(P.pack_conv3x3_kernel(k)),
                        jnp.asarray(P.pack_bias(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv1x1_equivalence(rng):
    x = rng.normal(size=(1, 8, 8, 5)).astype(np.float32)
    k = rng.normal(size=(1, 1, 5, 3)).astype(np.float32)
    want = P.space_to_depth(_conv(x, k))
    got = P.packed_conv(P.space_to_depth(jnp.asarray(x)),
                        jnp.asarray(P.pack_conv1x1_kernel(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_upsample_equivalence(rng):
    x = rng.normal(size=(2, 8, 12, 6)).astype(np.float32)
    want = P.space_to_depth(upsample_bilinear_2x(jnp.asarray(x)))
    kern = P.packed_upsample_kernel(6)
    got = P.packed_upsample_2x(jnp.asarray(x), kern)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_packed_decoder_level_equivalence(rng):
    """Full finest-decoder-level pipeline packed vs unpacked:
    up(x) -> conv -> concat(enc, wp) -> conv -> relu -> conv -> relu ->
    1x1 predictor."""
    B, Hp, Wp = 2, 8, 12
    H, W = Hp * 2, Wp * 2
    x = rng.normal(size=(B, Hp, Wp, 16)).astype(np.float32)  # coarse path
    enc = rng.normal(size=(B, H, W, 8)).astype(np.float32)
    wp = rng.uniform(size=(B, H, W, 1)).astype(np.float32)
    k_up = rng.normal(size=(3, 3, 16, 8)).astype(np.float32) * 0.2
    b_up = rng.normal(size=8).astype(np.float32)
    k1 = rng.normal(size=(3, 3, 17, 8)).astype(np.float32) * 0.2
    b1 = rng.normal(size=8).astype(np.float32)
    k2 = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.2
    b2 = rng.normal(size=8).astype(np.float32)
    kp = rng.normal(size=(1, 1, 8, 4)).astype(np.float32)
    bp = rng.normal(size=4).astype(np.float32)

    # unpacked reference
    y = _conv(upsample_bilinear_2x(jnp.asarray(x)), k_up, b_up)
    y = jnp.concatenate([y, jnp.asarray(enc), jnp.asarray(wp)], axis=-1)
    y = jax.nn.relu(_conv(y, k1, b1))
    y = jax.nn.relu(_conv(y, k2, b2))
    want = _conv(y, kp, bp)

    # packed
    up_kern = P.packed_upsample_kernel(16)
    yq = P.packed_conv(P.packed_upsample_2x(jnp.asarray(x), up_kern),
                       jnp.asarray(P.pack_conv3x3_kernel(k_up)),
                       jnp.asarray(P.pack_bias(b_up)))
    # concat in packed space must interleave per sub-position:
    # packed channel layout is (si,sj,[channels]) so concat of packed
    # tensors concatenates per-(si,sj) groups
    def packed_concat(tensors, chans):
        parts = []
        for s in range(4):
            for t, c in zip(tensors, chans):
                parts.append(t[..., s * c:(s + 1) * c])
        return jnp.concatenate(parts, axis=-1)

    encq = P.space_to_depth(jnp.asarray(enc))
    wpq = P.space_to_depth(jnp.asarray(wp))
    yq = packed_concat([yq, encq, wpq], [8, 8, 1])
    yq = jax.nn.relu(P.packed_conv(yq, jnp.asarray(P.pack_conv3x3_kernel(k1)),
                                   jnp.asarray(P.pack_bias(b1))))
    yq = jax.nn.relu(P.packed_conv(yq, jnp.asarray(P.pack_conv3x3_kernel(k2)),
                                   jnp.asarray(P.pack_bias(b2))))
    yq = P.packed_conv(yq, jnp.asarray(P.pack_conv1x1_kernel(kp)),
                       jnp.asarray(P.pack_bias(bp)))
    got = P.depth_to_space(yq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_packed_shared_decoder_equivalence(rng):
    """make_shared_pred_traj(packed_finest=True) == unpacked decode."""
    import jax

    from mst_tpu.models import ynet as jynet
    from mst_tpu.ops.pooling import avg_pool_pyramid

    cfg = jynet.YNetConfig(
        obs_len=4, pred_len=6, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(2, 5),
        train_net="train", network="original")
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    B, K, H, W = 2, 3, 32, 64
    scene = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    motion = jnp.asarray(
        rng.normal(size=(B, H, W, cfg.obs_len)).astype(np.float32))
    feats, _ = jynet.pred_features(params, state, cfg, scene, motion)
    wp = jnp.asarray(
        rng.uniform(size=(K * B, H, W, cfg.n_waypoints)).astype(np.float32))
    pyr = avg_pool_pyramid(wp, len(feats))
    want = jynet.make_shared_pred_traj(params, feats, cfg.n_waypoints)(pyr)
    got = jynet.make_shared_pred_traj(params, feats, cfg.n_waypoints,
                                      packed_finest=True)(pyr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_packed_train_decoder_and_grads(rng):
    """Packed training decoders compute the same loss AND gradients."""
    import jax
    import optax

    from mst_tpu.models import ynet as jynet
    from mst_tpu.train import freeze as freeze_lib
    from mst_tpu.train import steps as steps_lib

    cfg = jynet.YNetConfig(
        obs_len=4, pred_len=6, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(2, 5),
        train_net="mosa_2", position=("0", "1"), network="original")
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    B, H, W = 2, 32, 64
    batch = {
        "semantic": jnp.asarray(
            rng.normal(size=(1, H, W, 3)).astype(np.float32)),
        "traj": jnp.asarray(
            rng.uniform(5, 25, size=(B, 10, 2)).astype(np.float32)),
        "mask": jnp.ones(B),
    }
    mask = freeze_lib.trainable_mask(params, cfg.train_net, cfg.position)
    trainable, frozen = freeze_lib.split_params(params, mask)
    optimizer = optax.adam(1e-3)

    outs = {}
    for packed in (False, True):
        scfg = steps_lib.StepConfig(
            obs_len=4, pred_len=6, waypoints=(2, 5), template_size=256,
            kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
            temperature=1.0, n_goal=2, n_traj=1, packed_decode=packed)
        step = steps_lib.make_train_step(cfg, scfg, optimizer)
        tr, st, opt, metrics = step(trainable, frozen, state,
                                    optimizer.init(trainable), batch)
        outs[packed] = (jax.tree.map(
            lambda x: None if x is None else np.asarray(x), tr,
            is_leaf=lambda x: x is None), float(metrics["loss"]))

    np.testing.assert_allclose(outs[False][1], outs[True][1], rtol=1e-5)

    def assert_close(a, b):
        if a is None and b is None:
            return
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    jax.tree.map(assert_close, outs[False][0], outs[True][0],
                 is_leaf=lambda x: x is None)


def test_packed_stage0_encoder_equivalence(rng):
    """packed_stage0 encoder: features[0] (unpacked view) and all deeper
    features equal the standard encoder."""
    import jax

    from mst_tpu.models import ynet as jynet

    for train_net, position in [("train", ()), ("mosa_2", ("0", "1"))]:
        cfg = jynet.YNetConfig(
            obs_len=4, pred_len=6, n_semantic_classes=3,
            encoder_channels=(8, 8, 16, 16, 16),
            decoder_channels=(16, 16, 16, 8, 8), waypoints=(5,),
            train_net=train_net, position=position, network="original")
        assert jynet.can_pack_stage0(cfg)
        params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
        B, H, W = 2, 32, 64
        scene = jnp.asarray(
            rng.normal(size=(B, H, W, 3)).astype(np.float32))
        motion = jnp.asarray(
            rng.normal(size=(B, H, W, cfg.obs_len)).astype(np.float32))
        want, _ = jynet.pred_features(params, state, cfg, scene, motion)
        got, _ = jynet.pred_features(params, state, cfg, scene, motion,
                                     packed_stage0=True)
        np.testing.assert_allclose(
            np.asarray(P.depth_to_space(got[0])), np.asarray(want[0]),
            rtol=1e-5, atol=1e-5)
        for a, b in zip(got[1:], want[1:]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_cannot_pack_stage0_variants():
    from mst_tpu.models import ynet as jynet

    base = dict(obs_len=4, pred_len=6, n_semantic_classes=4,
                encoder_channels=(8, 8, 16, 16, 16),
                decoder_channels=(16, 16, 16, 8, 8), waypoints=(5,))
    assert not jynet.can_pack_stage0(jynet.YNetConfig(
        **base, train_net="train", network="fusion", n_fusion=2))
    assert not jynet.can_pack_stage0(jynet.YNetConfig(
        **base, train_net="serial", position=("0",), network="original"))
    assert not jynet.can_pack_stage0(jynet.YNetConfig(
        **base, train_net="parallelLayer_3x3", position=("0",),
        network="original"))
    assert jynet.can_pack_stage0(jynet.YNetConfig(
        **base, train_net="serial", position=("1",), network="original"))


def test_packed_eval_forward_equivalence(rng):
    """Full eval forward maps equal with packed pipeline on vs off."""
    import jax

    from mst_tpu.models import ynet as jynet
    from mst_tpu.train import steps as steps_lib

    cfg = jynet.YNetConfig(
        obs_len=4, pred_len=6, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(5,),
        train_net="train", network="original")
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    B, H, W = 2, 32, 64
    batch = {
        "semantic": jnp.asarray(
            rng.normal(size=(1, H, W, 3)).astype(np.float32)),
        "traj": jnp.asarray(
            rng.uniform(5, 25, size=(B, 10, 2)).astype(np.float32)),
        "mask": jnp.ones(B),
    }
    outs = {}
    for packed in (False, True):
        scfg = steps_lib.StepConfig(
            obs_len=4, pred_len=6, waypoints=(5,), template_size=256,
            kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
            temperature=1.0, n_goal=3, n_traj=1, packed_decode=packed)
        out = steps_lib.make_eval_step(cfg, scfg)(
            params, state, batch, jax.random.PRNGKey(7))
        outs[packed] = np.asarray(out["ade"])
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-3)


def test_softargmax_nhwc_and_packed_match_rows(rng):
    """Transpose-free NHWC and packed softargmax == the rows-based
    softargmax2d, on peaked maps (the operating regime: trained logits)."""
    import jax.numpy as jnp

    from mst_tpu.ops.packed import space_to_depth
    from mst_tpu.ops.softargmax import (softargmax2d, softargmax2d_nhwc,
                                        softargmax2d_packed)

    B, H, W, C = 3, 32, 48, 4
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # sharpen: put a clear peak per (b, c)
    for b in range(B):
        for c in range(C):
            logits[b, rng.integers(0, H), rng.integers(0, W), c] += 12.0

    want = np.asarray(softargmax2d(
        jnp.moveaxis(jnp.asarray(logits), -1, 1)))
    got_nhwc = np.asarray(softargmax2d_nhwc(jnp.asarray(logits)))
    np.testing.assert_allclose(got_nhwc, want, rtol=1e-4, atol=1e-3)

    packed = space_to_depth(jnp.asarray(logits))
    got_packed = np.asarray(softargmax2d_packed(packed, C))
    np.testing.assert_allclose(got_packed, want, rtol=1e-4, atol=1e-3)


def test_shared_decoder_return_packed_equals_unpacked(rng):
    """decode(return_packed=True) is exactly space_to_depth of the
    unpacked decode output."""
    import jax
    import jax.numpy as jnp

    from mst_tpu.models import ynet as jynet
    from mst_tpu.ops.packed import space_to_depth
    from mst_tpu.ops.pooling import avg_pool_pyramid

    cfg = jynet.YNetConfig(
        obs_len=3, pred_len=4, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(2,),
        train_net="train", network="original")
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    B, H, W = 2, 32, 64
    scene = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    motion = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    feats, _ = jynet.pred_features(params, state, cfg, scene, motion)
    wp = jnp.asarray(rng.uniform(size=(2 * B, H, W, 1)).astype(np.float32))
    pyr = avg_pool_pyramid(wp, len(feats))

    d_unpacked = jynet.make_shared_pred_traj(params, feats, 1,
                                             packed_finest=True)
    d_packed = jynet.make_shared_pred_traj(params, feats, 1,
                                           packed_finest=True,
                                           return_packed=True)
    want = space_to_depth(d_unpacked(pyr))
    got = d_packed(pyr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_rasterize_dist_packed_matches_unpacked(rng):
    from mst_tpu.ops.heatmap import (pyramid_from_packed,
                                     rasterize_dist_nhwc,
                                     rasterize_dist_packed)
    from mst_tpu.ops.pooling import avg_pool_pyramid

    B, T, H, W = 5, 3, 64, 96
    pts = rng.uniform(5, 60, size=(B, T, 2)).astype(np.float32)
    full = rasterize_dist_nhwc(jnp.asarray(pts), H, W, 200)
    packed = rasterize_dist_packed(jnp.asarray(pts), H, W, 200)
    np.testing.assert_allclose(np.asarray(packed),
                               np.asarray(P.space_to_depth(full)),
                               rtol=1e-6, atol=1e-6)

    pyr_ref = avg_pool_pyramid(full, 5)
    pyr_got = pyramid_from_packed(packed, 5)
    assert len(pyr_got) == 5
    for a, b in zip(pyr_got[1:], pyr_ref[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_loss_packed_equals_unpacked(rng):
    """The fully-packed train step (packed gt rasterizers + packed BCE +
    packed softargmax metrics) computes the same loss and metrics as the
    unpacked one — BCE's masked mean is layout-invariant."""
    import optax

    from mst_tpu.models import ynet as jynet
    from mst_tpu.train import freeze as freeze_lib
    from mst_tpu.train import steps as steps_lib

    cfg = jynet.YNetConfig(
        obs_len=4, pred_len=6, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(5,),
        train_net="train", network="original")
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    mask = freeze_lib.trainable_mask(params, "train", ())
    trainable, frozen = freeze_lib.split_params(params, mask)
    opt = optax.adam(1e-3)
    opt_state = opt.init(trainable)

    B, H, W = 4, 64, 96
    batch = {
        "semantic": jnp.asarray(
            np.random.default_rng(0).normal(size=(1, H, W, 3))
            .astype(np.float32)),
        "traj": jnp.asarray(np.random.default_rng(1).uniform(
            10, 50, size=(B, 10, 2)).astype(np.float32)),
        "mask": jnp.ones(B, jnp.float32),
    }

    def scfg(packed):
        return steps_lib.StepConfig(
            obs_len=4, pred_len=6, waypoints=(5,), template_size=200,
            kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
            temperature=1.0, n_goal=3, n_traj=1, packed_decode=packed)

    outs = {}
    for packed in (False, True):
        step = steps_lib.make_train_step(cfg, scfg(packed), opt)
        _, _, _, metrics = step(trainable, frozen, state, opt_state, batch)
        outs[packed] = jax.tree.map(np.asarray, metrics)
    for k in outs[False]:
        np.testing.assert_allclose(outs[True][k], outs[False][k],
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_packed_stage1_encoder_equivalence(rng):
    """packed_stage1 encoder: features[1] (unpacked view) and all deeper
    features equal the standard encoder; features[0] stays the packed
    stage-0 output."""
    import jax

    from mst_tpu.models import ynet as jynet

    for train_net, position in [("train", ()),
                                ("mosa_2", ("0", "1", "2"))]:
        cfg = jynet.YNetConfig(
            obs_len=4, pred_len=6, n_semantic_classes=3,
            encoder_channels=(8, 8, 16, 16, 16),
            decoder_channels=(16, 16, 16, 8, 8), waypoints=(5,),
            train_net=train_net, position=position, network="original")
        assert jynet.can_pack_stage1(cfg)
        params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
        B, H, W = 2, 32, 64
        scene = jnp.asarray(
            rng.normal(size=(B, H, W, 3)).astype(np.float32))
        motion = jnp.asarray(
            rng.normal(size=(B, H, W, cfg.obs_len)).astype(np.float32))
        want, _ = jynet.pred_features(params, state, cfg, scene, motion)
        got, _ = jynet.pred_features(params, state, cfg, scene, motion,
                                     packed_stage0=True,
                                     packed_stage1=True)
        np.testing.assert_allclose(
            np.asarray(P.depth_to_space(got[0])), np.asarray(want[0]),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(P.depth_to_space(got[1])), np.asarray(want[1]),
            rtol=1e-4, atol=1e-5)
        for a, b in zip(got[2:], want[2:]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_cannot_pack_stage1_variants():
    from mst_tpu.models import ynet as jynet

    base = dict(obs_len=4, pred_len=6, n_semantic_classes=4,
                encoder_channels=(8, 8, 16, 16, 16),
                decoder_channels=(16, 16, 16, 8, 8), waypoints=(5,))
    # block adapter at position 1 blocks stage 1 (but not stage 0)
    cfg = jynet.YNetConfig(**base, train_net="serial", position=("1",),
                           network="original")
    assert jynet.can_pack_stage0(cfg) and not jynet.can_pack_stage1(cfg)
    # per-layer adapters block both
    assert not jynet.can_pack_stage1(jynet.YNetConfig(
        **base, train_net="parallelLayer_3x3", position=("1",),
        network="original"))
    # position-2 block adapter is fine for stages 0 and 1
    assert jynet.can_pack_stage1(jynet.YNetConfig(
        **base, train_net="serial", position=("2",), network="original"))


def test_train_step_packed_stage1_goal_metric_channel(rng):
    """softargmax2d_packed(channel=...) == stacking the 4 sub-position
    slices of that channel (the old train-metric construction)."""
    from mst_tpu.ops.softargmax import softargmax2d_packed

    B, Hp, Wp, C = 3, 16, 24, 6
    xq = rng.normal(size=(B, Hp, Wp, 4 * C)).astype(np.float32)
    for b in range(B):
        xq[b, rng.integers(Hp), rng.integers(Wp),
           rng.integers(4) * C + C - 1] = 9.0
    xq = jnp.asarray(xq)
    want = softargmax2d_packed(
        jnp.stack([xq[..., k * C + C - 1] for k in range(4)], -1), 1)
    got = softargmax2d_packed(xq, C, channel=C - 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_lora_separable_equals_merged(rng):
    """The separable LoRA delta (1xk conv then kx1 conv) == the merged
    loralib weight, unpacked and packed, values and A/B gradients."""
    import jax

    from mst_tpu.models import layers

    k, cin, cout, rank = 3, 5, 7, 2
    params = layers.lora_conv2d_init(jax.random.PRNGKey(0), cin, cout, k,
                                     rank)
    # non-zero B so the delta path actually contributes
    params["lora_B"] = jnp.asarray(
        rng.normal(size=params["lora_B"].shape).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 12, 16, cin)).astype(np.float32))

    want = layers.lora_conv2d_apply(params, x, rank)
    got = layers.lora_conv2d_apply(params, x, rank, separable=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    # gradients wrt the factors agree between the two forms
    def loss(form):
        def f(ab):
            p = dict(params, lora_A=ab["A"], lora_B=ab["B"])
            return jnp.sum(layers.lora_conv2d_apply(
                p, x, rank, separable=form) ** 2)
        return jax.grad(f)({"A": params["lora_A"], "B": params["lora_B"]})

    g_m, g_s = loss(False), loss(True)
    np.testing.assert_allclose(np.asarray(g_s["A"]), np.asarray(g_m["A"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_s["B"]), np.asarray(g_m["B"]),
                               rtol=1e-3, atol=1e-4)

    # packed conv-unit (train form) == unpacked merged
    from mst_tpu.models import ynet as jynet

    cfg = jynet.YNetConfig(
        obs_len=4, pred_len=6, n_semantic_classes=cin - 4,
        encoder_channels=(cout, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(5,),
        train_net="mosa_2", position=("0",), network="original")
    xq = P.space_to_depth(x)
    yq = jynet._packed_conv_unit(xq, params, cfg, 0, separable=True)
    np.testing.assert_allclose(
        np.asarray(P.depth_to_space(yq)),
        np.asarray(want) + (np.asarray(params["bias"]) if "bias" in params
                            else 0) * 0,
        rtol=1e-4, atol=1e-5)
