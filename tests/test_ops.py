"""Unit tests: device ops vs the reference's template/slice oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.ops import (
    avg_pool_pyramid,
    batched_kmeans,
    max_pool_2x2,
    rasterize_dist,
    rasterize_gaussian,
    sample_heatmap,
    softargmax2d,
    softargmax_on_prob_map,
    upsample_bilinear_2x,
)
from tests.reference_oracles import (
    dist_mat_template,
    gaussian_heatmap_template,
    get_patch,
    softargmax2d_oracle,
)

H, W = 96, 128
TEMPLATE = 256  # small template size for oracle tractability


def _random_points(rng, n, margin=20):
    xs = rng.uniform(margin, W - margin, size=n)
    ys = rng.uniform(margin, H - margin, size=n)
    return np.stack([xs, ys], axis=-1).astype(np.float32)


class TestRasterizers:
    def test_gaussian_matches_template_slice(self, rng):
        pts = _random_points(rng, 16)
        template = gaussian_heatmap_template(TEMPLATE, kernlen=31, nsig=4,
                                             normalize=False)
        expected = get_patch(template, pts, H, W)
        got = np.asarray(rasterize_gaussian(pts, H, W, kernlen=31, nsig=4.0))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-8)

    def test_dist_matches_template_slice(self, rng):
        pts = _random_points(rng, 16)
        template = dist_mat_template(TEMPLATE, normalize=True)
        expected = get_patch(template, pts, H, W)
        got = np.asarray(rasterize_dist(pts, H, W, template_size=TEMPLATE))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_batch_shape(self, rng):
        pts = _random_points(rng, 12).reshape(3, 4, 2)
        out = rasterize_gaussian(pts, H, W)
        assert out.shape == (3, 4, H, W)

    def test_nhwc_variants_match(self, rng):
        from mst_tpu.ops.heatmap import (
            rasterize_dist_nhwc,
            rasterize_gaussian_nhwc,
        )

        pts = _random_points(rng, 12).reshape(3, 4, 2)
        g = np.asarray(rasterize_gaussian(pts, H, W))
        g_nhwc = np.asarray(rasterize_gaussian_nhwc(pts, H, W))
        np.testing.assert_allclose(g_nhwc, np.moveaxis(g, 1, -1),
                                   rtol=1e-6, atol=1e-9)
        d = np.asarray(rasterize_dist(pts, H, W, TEMPLATE))
        d_nhwc = np.asarray(rasterize_dist_nhwc(pts, H, W, TEMPLATE))
        np.testing.assert_allclose(d_nhwc, np.moveaxis(d, 1, -1),
                                   rtol=1e-6, atol=1e-6)

    def test_gaussian_rounding_half_even(self):
        # np.round(0.5) == 0, np.round(1.5) == 2 — get_patch parity
        pts = np.array([[10.5, 11.5], [9.5, 12.5]], np.float32)
        template = gaussian_heatmap_template(TEMPLATE, normalize=False)
        expected = get_patch(template, pts, H, W)
        got = np.asarray(rasterize_gaussian(pts, H, W))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-9)


class TestSoftargmax:
    def test_matches_reference(self, rng):
        logits = rng.normal(size=(2, 5, 31, 47)).astype(np.float32) * 3
        expected = softargmax2d_oracle(logits)
        got = np.asarray(softargmax2d(jnp.asarray(logits)))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)

    def test_peaked_map_recovers_argmax(self):
        logits = np.full((1, 1, 20, 30), -50.0, np.float32)
        logits[0, 0, 7, 13] = 50.0
        got = np.asarray(softargmax2d(jnp.asarray(logits)))
        np.testing.assert_allclose(got[0, 0], [13.0, 7.0], atol=1e-3)

    def test_on_prob_map(self):
        p = np.zeros((1, 1, 10, 12), np.float32)
        p[0, 0, 3, 4] = 0.75
        p[0, 0, 5, 8] = 0.25
        got = np.asarray(softargmax_on_prob_map(jnp.asarray(p)))
        np.testing.assert_allclose(got[0, 0], [0.75 * 4 + 0.25 * 8,
                                               0.75 * 3 + 0.25 * 5], atol=1e-5)


class TestSampling:
    def test_shapes_and_range(self):
        key = jax.random.PRNGKey(0)
        p = jnp.ones((2, 3, 16, 24))
        coords = sample_heatmap(key, p, num_samples=20)
        assert coords.shape == (2, 3, 20, 2)
        c = np.asarray(coords)
        assert (c[..., 0] >= 0).all() and (c[..., 0] < 24).all()
        assert (c[..., 1] >= 0).all() and (c[..., 1] < 16).all()

    def test_without_replacement_distinct(self):
        key = jax.random.PRNGKey(1)
        p = jnp.ones((1, 1, 8, 8))
        coords = np.asarray(sample_heatmap(key, p, num_samples=30))[0, 0]
        flat = coords[:, 1] * 8 + coords[:, 0]
        assert len(np.unique(flat)) == 30

    def test_concentrates_on_peak(self):
        key = jax.random.PRNGKey(2)
        p = np.full((1, 1, 16, 16), 1e-6, np.float32)
        p[0, 0, 5, 9] = 1.0
        coords = np.asarray(sample_heatmap(
            key, jnp.asarray(p), num_samples=100, replacement=True))[0, 0]
        frac = np.mean((coords[:, 0] == 9) & (coords[:, 1] == 5))
        assert frac > 0.95

    def test_bucketed_search_matches_searchsorted_exactly(self):
        """The two-level replacement-sampling search must return the EXACT
        searchsorted(side='right') indices — including ties landing on
        flat zero-weight cdf runs — at sizes below, at, and above the
        bucket width (ops/sampling.py:_bucketed_right_search)."""
        from mst_tpu.ops.sampling import (_SEARCH_BUCKET,
                                          _bucketed_right_search)

        rng = np.random.default_rng(0)
        for N in (37, _SEARCH_BUCKET, _SEARCH_BUCKET + 1, 7000):
            w = rng.random((3, N)).astype(np.float32)
            w[w < 0.6] = 0.0  # flat runs in the cdf
            cdf = np.cumsum(w, axis=1)
            u = rng.random((3, 500)).astype(np.float32) * cdf[:, -1:]
            u[:, :20] = cdf[:, N // 3:N // 3 + 20]  # exact-tie probes
            want = np.stack([np.searchsorted(c, q, side="right")
                             for c, q in zip(cdf, u)])
            got = np.asarray(_bucketed_right_search(
                jnp.asarray(cdf), jnp.asarray(u)))
            np.testing.assert_array_equal(
                np.minimum(got, N - 1), np.minimum(want, N - 1),
                err_msg=f"N={N}")

    def test_replacement_matches_multinomial_frequencies(self):
        """The inverse-CDF replacement sampler draws from the exact
        multinomial the probabilities define: empirical cell frequencies
        over many draws match p within 3-sigma binomial bounds."""
        key = jax.random.PRNGKey(11)
        rng = np.random.default_rng(4)
        p = rng.uniform(0.0, 1.0, size=(1, 1, 8, 8)).astype(np.float32)
        p[0, 0, 3, 3] = 0.0  # a zero-weight cell must never be drawn
        n = 200_000
        coords = np.asarray(sample_heatmap(
            key, jnp.asarray(p), num_samples=n, replacement=True))[0, 0]
        idx = coords[:, 1].astype(int) * 8 + coords[:, 0].astype(int)
        counts = np.bincount(idx, minlength=64).astype(np.float64)
        probs = (p.reshape(-1) / p.sum()).astype(np.float64)
        assert counts[3 * 8 + 3] == 0
        sigma = np.sqrt(n * probs * (1 - probs))
        np.testing.assert_array_less(
            np.abs(counts - n * probs), 4.0 * sigma + 1e-9)

    def test_rel_threshold_excludes_tail(self):
        key = jax.random.PRNGKey(3)
        p = np.full((1, 1, 16, 16), 1e-3, np.float32)
        p[0, 0, 5, 9] = 1.0
        p[0, 0, 2, 2] = 0.5
        coords = np.asarray(sample_heatmap(
            key, jnp.asarray(p), num_samples=200, rel_threshold=0.01,
            replacement=True))[0, 0]
        cells = set(map(tuple, coords.astype(int)))
        assert cells <= {(9, 5), (2, 2)}


class TestPooling:
    def test_max_pool(self, rng):
        x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
        got = np.asarray(max_pool_2x2(jnp.asarray(x)))
        expected = x.reshape(2, 4, 2, 5, 2, 3).max(axis=(2, 4))
        np.testing.assert_allclose(got, expected)

    def test_avg_pyramid_matches_torch(self, rng):
        import torch

        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        levels = avg_pool_pyramid(jnp.asarray(x), n_levels=4)
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        for i, lev in enumerate(levels):
            if i == 0:
                expected = x
            else:
                pooled = torch.nn.AvgPool2d(2**i, 2**i)(xt)
                expected = pooled.permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(np.asarray(lev), expected,
                                       rtol=1e-5, atol=1e-6)

    def test_bilinear_2x_matches_torch(self, rng):
        import torch

        x = rng.normal(size=(2, 7, 9, 4)).astype(np.float32)
        got = np.asarray(upsample_bilinear_2x(jnp.asarray(x)))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        expected = torch.nn.functional.interpolate(
            xt, scale_factor=2, mode="bilinear", align_corners=False)
        expected = expected.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestKMeans:
    def test_recovers_well_separated_clusters(self, rng):
        centers_true = np.array([[0.0, 0.0], [50.0, 0.0], [0.0, 50.0]])
        pts = np.concatenate([
            rng.normal(size=(100, 2)) * 0.5 + c for c in centers_true
        ]).astype(np.float32)
        X = jnp.asarray(pts)[None].repeat(2, axis=0)
        # plain random init (reference kmeans.py:9-19) admits local optima;
        # require recovery for at least one of a few seeds.
        best = np.inf
        for seed in range(5):
            _, centers = batched_kmeans(
                jax.random.PRNGKey(seed), X, num_clusters=3)
            c = np.asarray(centers)[0]
            err = max(np.min(np.linalg.norm(c - t, axis=1))
                      for t in centers_true)
            best = min(best, err)
            if best < 0.5:
                break
        assert best < 0.5, f"cluster recovery error {best}"

    def test_batched_independent(self, rng):
        X = rng.normal(size=(4, 200, 2)).astype(np.float32) * 10
        assign, centers = batched_kmeans(
            jax.random.PRNGKey(1), jnp.asarray(X), num_clusters=5)
        assert assign.shape == (4, 200)
        assert centers.shape == (4, 5, 2)
        assert np.isfinite(np.asarray(centers)).all()


class TestSamplingDistribution:
    def test_without_replacement_matches_plackett_luce(self):
        """Gumbel top-k draws follow the target distribution: marginal
        inclusion frequencies track probabilities (chi-square-style bound).
        This is the statistical-parity instrument for torch.multinomial
        (docs/parity.md)."""
        key = jax.random.PRNGKey(0)
        probs = np.array([0.4, 0.3, 0.2, 0.06, 0.03, 0.01] + [0.0] * 10,
                         np.float32).reshape(1, 1, 4, 4)
        n_rep, k = 3000, 2
        keys = jax.random.split(key, n_rep)
        draw = jax.jit(jax.vmap(
            lambda kk: sample_heatmap(kk, jnp.asarray(probs), k)))
        coords = np.asarray(draw(keys)).reshape(n_rep, k, 2)
        flat = (coords[..., 1] * 4 + coords[..., 0]).astype(int)
        counts = np.bincount(flat.reshape(-1), minlength=16)
        # exact top-2 inclusion probabilities under Plackett-Luce
        p = probs.reshape(-1)
        incl = np.zeros(16)
        for i in range(16):
            if p[i] == 0:
                continue
            incl[i] = p[i] + sum(
                p[j] * p[i] / (1 - p[j]) for j in range(16)
                if j != i and p[j] > 0)
        freq = counts / n_rep
        np.testing.assert_allclose(freq[:6], incl[:6], atol=0.04)
        assert counts[6:].sum() == 0  # zero-probability cells never drawn
