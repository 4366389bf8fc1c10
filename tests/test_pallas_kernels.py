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
