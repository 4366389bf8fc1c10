"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.ops.softargmax import softargmax2d


def test_pallas_softargmax_matches_xla(rng):
    from mst_tpu.ops.pallas.softargmax import softargmax2d_pallas

    logits = rng.normal(size=(3, 4, 32, 32)).astype(np.float32) * 4
    want = np.asarray(softargmax2d(jnp.asarray(logits)))
    got = np.asarray(softargmax2d_pallas(jnp.asarray(logits),
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_softargmax_row_padding(rng):
    from mst_tpu.ops.pallas.softargmax import softargmax2d_pallas

    # rows (N*C = 5) not a multiple of the 8-row tile
    logits = rng.normal(size=(5, 32, 32)).astype(np.float32) * 3
    want = np.asarray(softargmax2d(jnp.asarray(logits)))
    got = np.asarray(softargmax2d_pallas(jnp.asarray(logits),
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_softargmax_peaked(rng):
    from mst_tpu.ops.pallas.softargmax import softargmax2d_pallas

    logits = np.full((1, 1, 32, 64), -30.0, np.float32)
    logits[0, 0, 17, 42] = 30.0
    got = np.asarray(softargmax2d_pallas(jnp.asarray(logits),
                                         interpret=True))
    np.testing.assert_allclose(got[0, 0], [42.0, 17.0], atol=1e-2)


def test_fused_predictor_softargmax_matches_packed(rng):
    """Producer-owning fused kernel (ops/pallas/fused_predict.py) ==
    packed predictor conv + softargmax2d_packed, f32 exact-ish."""
    from mst_tpu.ops import packed as packed_lib
    from mst_tpu.ops.pallas.fused_predict import fused_predictor_softargmax
    from mst_tpu.ops.softargmax import softargmax2d_packed

    R, Hp, Wp, C, P = 5, 16, 24, 32, 12
    x = rng.normal(size=(R, Hp, Wp, 4 * C)).astype(np.float32) * 2
    k = rng.normal(size=(1, 1, C, P)).astype(np.float32) * 0.3
    b = rng.normal(size=(P,)).astype(np.float32)
    wq = packed_lib.pack_conv1x1_kernel(k)
    bq = packed_lib.pack_bias(b)
    want = np.asarray(softargmax2d_packed(
        packed_lib.packed_conv(jnp.asarray(x), wq, bq), P))
    got = np.asarray(fused_predictor_softargmax(x, wq, bq, P,
                                                interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_predictor_softargmax_no_bias_and_peaked(rng):
    from mst_tpu.ops import packed as packed_lib
    from mst_tpu.ops.pallas.fused_predict import fused_predictor_softargmax

    R, Hp, Wp, C, P = 2, 8, 16, 8, 3
    # a map that is -30 everywhere except one full-res cell per channel:
    # craft x so the predictor (identity-ish on the first P channels)
    # produces a peak at a known packed position
    x = np.full((R, Hp, Wp, 4 * C), 0.0, np.float32)
    k = np.zeros((1, 1, C, P), np.float32)
    for p in range(P):
        k[0, 0, p, p] = 1.0
    wq = packed_lib.pack_conv1x1_kernel(jnp.asarray(k))
    # peak for channel p at packed (i=3, j=5), subposition (si=1, sj=0)
    ksub = 1 * 2 + 0
    for p in range(P):
        x[:, 3, 5, ksub * C + p] = 60.0
    got = np.asarray(fused_predictor_softargmax(x, wq, None, P,
                                                interpret=True))
    # full-res coords: x = 2*5 + 0 = 10, y = 2*3 + 1 = 7
    np.testing.assert_allclose(got[..., 0], 10.0, atol=0.05)
    np.testing.assert_allclose(got[..., 1], 7.0, atol=0.05)


def test_eval_step_fused_predict_matches(rng):
    """The full eval step with fused_predict=True equals the packed XLA
    path (same key) to coordinate tolerance."""
    import jax

    from mst_tpu import config as config_lib
    from mst_tpu.models import ynet as ynet_lib
    from mst_tpu.train import steps as steps_lib

    mcfg = ynet_lib.YNetConfig(
        obs_len=4, pred_len=8, n_semantic_classes=3,
        encoder_channels=(8, 8, 16, 16, 16),
        decoder_channels=(16, 16, 16, 8, 8), waypoints=(7,))
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=4, pred_len=8, waypoints=(7,), template_size=300,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.0, n_goal=3, n_traj=1)
    batch = {
        "semantic": rng.normal(size=(1, 64, 96, 3)).astype(np.float32),
        "traj": rng.uniform(10, 50, size=(4, 12, 2)).astype(np.float32),
        "mask": np.ones(4, np.float32),
    }
    key = jax.random.PRNGKey(3)
    out0 = steps_lib.make_eval_step(mcfg, scfg)(params, state, batch, key)
    out1 = steps_lib.make_eval_step(
        mcfg, scfg._replace(fused_predict=True))(params, state, batch, key)
    np.testing.assert_allclose(np.asarray(out1["ade"]),
                               np.asarray(out0["ade"]), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out1["fde"]),
                               np.asarray(out0["fde"]), rtol=1e-4,
                               atol=1e-3)
    # fused_predict without packed_decode would silently measure the
    # plain XLA path; it must error instead
    with pytest.raises(ValueError, match="fused_predict requires"):
        steps_lib.make_eval_step(
            mcfg, scfg._replace(fused_predict=True, packed_decode=False)
        )(params, state, batch, key)
