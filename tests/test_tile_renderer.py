"""Production tile renderer (ops/tile_blend.py + ops/rasterize.py) vs the
naive oracle (ops/reference.py), forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from gaussian_splatting_with_eye_tracking_tpu.ops import reference as ref
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from tests.helpers import make_camera, make_random_gaussians

BG = jnp.array([0.15, 0.25, 0.35])


def naive_full(means, scales, quats, op, sh, cam, tile=32):
    prep = preprocess(means, scales, quats, op, sh, 0, cam, tile=tile)
    return ref.render_naive(
        prep, cam.width, cam.height, BG, tile=tile, pixel_chunk=512,
        exact_stop=False,
    )


class TestTileRendererParity:
    @pytest.mark.parametrize("seed,n", [(0, 200), (1, 500)])
    def test_forward_matches_oracle(self, seed, n):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(n, seed=seed)
        want = naive_full(means, scales, quats, op, sh, cam)
        got = rast.rasterize(
            means, scales, quats, op, sh, cam, BG, sh_degree=0,
            max_instances=1 << 13, max_per_tile=n,
        )
        assert not bool(got.overflow)
        np.testing.assert_allclose(got.color, want.color, atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(got.final_t, want.final_t, atol=2e-5)

    def test_forward_nonsquare_image(self):
        cam = make_camera(96, 48)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=2)
        want = naive_full(means, scales, quats, op, sh, cam)
        got = rast.rasterize(
            means, scales, quats, op, sh, cam, BG, sh_degree=0,
            max_instances=1 << 13, max_per_tile=512,
        )
        np.testing.assert_allclose(got.color, want.color, atol=2e-5, rtol=1e-4)

    def test_image_not_multiple_of_tile(self):
        cam = make_camera(50, 34)
        means, scales, quats, op, sh = make_random_gaussians(150, seed=3)
        want = naive_full(means, scales, quats, op, sh, cam)
        got = rast.rasterize(
            means, scales, quats, op, sh, cam, BG, sh_degree=0,
            max_instances=1 << 12, max_per_tile=256,
        )
        assert got.color.shape == (3, 34, 50)
        np.testing.assert_allclose(got.color, want.color, atol=2e-5, rtol=1e-4)

    def test_gradients_match_oracle(self):
        cam = make_camera(32, 32)
        means, scales, quats, op, sh = make_random_gaussians(80, seed=4)
        target = jnp.zeros((3, 32, 32))

        def loss_tile(means, scales, quats, op, sh):
            out = rast.rasterize(
                means, scales, quats, op, sh, cam, BG, sh_degree=0,
                max_instances=1 << 11, max_per_tile=128,
            )
            return jnp.mean((out.color - target) ** 2)

        def loss_naive(means, scales, quats, op, sh):
            out = naive_full(means, scales, quats, op, sh, cam)
            return jnp.mean((out.color - target) ** 2)

        g_tile = jax.grad(loss_tile, argnums=(0, 1, 2, 3, 4))(means, scales, quats, op, sh)
        g_naive = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(means, scales, quats, op, sh)
        for gt, gn, name in zip(g_tile, g_naive, ["means", "scales", "quats", "op", "sh"]):
            np.testing.assert_allclose(
                gt, gn, atol=5e-5, rtol=5e-3, err_msg=f"grad mismatch: {name}"
            )

    def test_means2d_offset_gradient(self):
        """dL/dmeans2d harvesting (replaces the reference screenspace_points
        retain_grad trick, gaussian_renderer/__init__.py:26-30)."""
        cam = make_camera(32, 32)
        means, scales, quats, op, sh = make_random_gaussians(60, seed=5)
        offset = jnp.zeros((60, 2))

        def loss(off):
            out = rast.rasterize(
                means, scales, quats, op, sh, cam, BG, sh_degree=0,
                max_instances=1 << 11, max_per_tile=128, means2d_offset=off,
            )
            return jnp.mean(out.color**2)

        g = jax.grad(loss)(offset)
        assert np.isfinite(np.asarray(g)).all()
        vis = np.asarray(
            rast.rasterize(
                means, scales, quats, op, sh, cam, BG, sh_degree=0,
                max_instances=1 << 11, max_per_tile=128,
            ).radii
        ) > 0
        # some visible gaussian has nonzero screen grad; culled ones have none
        assert np.abs(np.asarray(g)[vis]).sum() > 0
        assert np.abs(np.asarray(g)[~vis]).sum() == 0

    def test_active_mask_kills_points(self):
        cam = make_camera(32, 32)
        means, scales, quats, op, sh = make_random_gaussians(50, seed=6)
        mask = jnp.zeros(50, bool).at[:25].set(True)
        full = rast.rasterize(
            means, scales, quats, op, sh, cam, BG, sh_degree=0,
            max_instances=1 << 11, max_per_tile=64, active_mask=mask,
        )
        half = rast.rasterize(
            means[:25], scales[:25], quats[:25], op[:25], sh[:25], cam, BG,
            sh_degree=0, max_instances=1 << 11, max_per_tile=64,
        )
        np.testing.assert_allclose(full.color, half.color, atol=1e-6)
        assert (np.asarray(full.radii[25:]) == 0).all()

    def test_truncation_on_small_caps(self):
        """Overflow flag raises when max_instances too small; render still
        finishes with finite output (graceful degradation, not UB)."""
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(400, seed=7)
        out = rast.rasterize(
            means, scales, quats, op, sh, cam, BG, sh_degree=0,
            max_instances=64, max_per_tile=16,
        )
        assert bool(out.overflow)
        assert np.isfinite(np.asarray(out.color)).all()

    def test_sh_degree3_view_dependence(self):
        cam = make_camera(48, 48)
        means, scales, quats, op, sh = make_random_gaussians(100, seed=8, sh_degree=3)
        want = preprocess(means, scales, quats, op, sh, 3, cam)
        got = rast.rasterize(
            means, scales, quats, op, sh, cam, BG, sh_degree=3,
            max_instances=1 << 12, max_per_tile=256,
        )
        oracle = ref.render_naive(want, 48, 48, BG, pixel_chunk=512, exact_stop=False)
        np.testing.assert_allclose(got.color, oracle.color, atol=2e-5, rtol=1e-4)


class TestNContrib:
    def test_n_contrib_matches_naive_count(self):
        """Per-pixel blended-contribution count (the reference's
        ImageState.n_contrib) against a brute-force recount from the same
        instance list."""
        from gaussian_splatting_with_eye_tracking_tpu.ops import (
            binning as binning_ops, tile_blend)

        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=3)
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        gx, gy = 2, 2
        b = binning_ops.bin_gaussians(prep, gx, gy, max_instances=1 << 12)
        color, final_t, nc = tile_blend.render_tiles_jnp(
            prep.means2d, prep.conics, prep.rgb, prep.opacities,
            b.gauss_id, b.offsets, gx, gy, 32, BG, max_per_tile=512,
            return_n_contrib=True)
        nc = np.asarray(nc)
        assert nc.shape == (64, 64)
        # recount at a few pixels with a scalar loop
        off = np.asarray(b.offsets)
        gid = np.asarray(b.gauss_id)
        xy = np.asarray(prep.means2d); con = np.asarray(prep.conics)
        opn = np.asarray(prep.opacities)
        rng = np.random.default_rng(0)
        for _ in range(12):
            x, y = int(rng.integers(0, 64)), int(rng.integers(0, 64))
            t = (y // 32) * gx + (x // 32)
            T = 1.0
            cnt = 0
            for k in range(off[t], off[t + 1]):
                g = gid[k]
                dx, dy = xy[g, 0] - x, xy[g, 1] - y
                p_ = -0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy) \
                    - con[g, 1] * dx * dy
                if p_ > 0:
                    continue
                a = min(0.99, opn[g] * np.exp(p_))
                if a < 1.0 / 255.0:
                    continue
                if T >= 1e-4:
                    cnt += 1
                T *= 1.0 - a
            assert nc[y, x] == cnt, (x, y, nc[y, x], cnt)
