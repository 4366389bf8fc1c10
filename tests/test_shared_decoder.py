"""make_shared_pred_traj must equal the naive per-sample decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.models import ynet as jynet
from mst_tpu.ops.pooling import avg_pool_pyramid

CFG = jynet.YNetConfig(
    obs_len=4, pred_len=6, n_semantic_classes=3,
    encoder_channels=(8, 8, 16, 16, 16), decoder_channels=(16, 16, 16, 8, 8),
    waypoints=(2, 5), train_net="train", network="original")


def test_shared_decoder_matches_naive(rng):
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), CFG)
    B, K, H, W = 2, 3, 32, 64
    scene = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    motion = jnp.asarray(
        rng.normal(size=(B, H, W, CFG.obs_len)).astype(np.float32))
    feats, _ = jynet.pred_features(params, state, CFG, scene, motion)

    n_wp = CFG.n_waypoints
    wp = jnp.asarray(
        rng.uniform(size=(K * B, H, W, n_wp)).astype(np.float32))
    pyr = avg_pool_pyramid(wp, len(feats))

    # naive: broadcast features to K*B and concat (the reference layout)
    naive_in = []
    for f, w in zip(feats, pyr):
        fb = jnp.broadcast_to(f[None], (K,) + f.shape).reshape(
            (K * B,) + f.shape[1:])
        naive_in.append(jnp.concatenate([fb, w], axis=-1))
    naive = jynet.pred_traj(params, naive_in)

    decode = jynet.make_shared_pred_traj(params, feats, n_wp)
    shared = decode(pyr)

    np.testing.assert_allclose(np.asarray(shared), np.asarray(naive),
                               rtol=1e-4, atol=1e-4)
