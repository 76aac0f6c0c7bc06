"""Pallas tile kernels (interpret mode on CPU) vs the jnp tile renderer and
the naive oracle: forward parity, gradient parity, early-exit behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend, tile_blend
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from tests.helpers import make_camera, make_random_gaussians

BG = jnp.array([0.15, 0.25, 0.35])


def setup_scene(n=300, seed=0, w=64, h=64):
    cam = make_camera(w, h)
    means, scales, quats, op, sh = make_random_gaussians(n, seed=seed)
    prep = preprocess(means, scales, quats, op, sh, 0, cam)
    gx, gy = -(-w // 32), -(-h // 32)
    b = binning_ops.bin_gaussians(prep, gx, gy, max_instances=1 << 13)
    return cam, prep, b, gx, gy


class TestGradRegionLayout:
    def test_grad_region_offsets(self):
        offsets = jnp.array([0, 5, 5, 133, 140], jnp.int32)
        chunk = 64
        gaoff = np.asarray(pallas_blend.grad_region_offsets(offsets, chunk))
        # tile 0: [0,5) -> 1 chunk; tile 1 empty; tile 2: superset [0,133)
        # -> 3 chunks; tile 3: superset [128,140) -> 1 chunk
        np.testing.assert_array_equal(gaoff, [0, 64, 64, 256, 320])
        assert (gaoff % chunk == 0).all()

class TestHierarchicalScan:
    """The chunk=256 hardware path runs the MXU scans in 128-wide blocks
    with a running carry (_prefix_scan/_suffix_scan); check both against
    plain cumsums and the end-to-end kernels across the 128 boundary."""

    def test_scan_helpers_match_cumsum(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 256), jnp.float32)
        m = pallas_blend._prefix_excl_matrix(128)
        s, tot = pallas_blend._prefix_scan(x, m, 128)
        want = jnp.cumsum(x, axis=1) - x
        np.testing.assert_allclose(np.asarray(s), np.asarray(want), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(tot[:, 0]), np.asarray(jnp.sum(x, axis=1)), atol=2e-4)
        ms = pallas_blend._suffix_excl_matrix(128)
        s2, tot2 = pallas_blend._suffix_scan(x, ms, 128)
        want2 = (jnp.cumsum(x[:, ::-1], axis=1) - x[:, ::-1])[:, ::-1]
        np.testing.assert_allclose(np.asarray(s2), np.asarray(want2), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(tot2[:, 0]), np.asarray(jnp.sum(x, axis=1)), atol=2e-4)

    def test_fwd_grad_parity_chunk256(self):
        cam, prep, b, gx, gy = setup_scene(n=900)
        args = (prep.means2d, prep.conics, prep.rgb, prep.opacities)
        want_c, _ = tile_blend.render_tiles_jnp(
            *args, b.gauss_id, b.offsets, gx, gy, 32, BG, max_per_tile=2048
        )
        got_c, _ = pallas_blend.render_tiles_pallas_list(
            *args, b, gx, gy, 32, BG, chunk=256, interpret=True
        )
        np.testing.assert_allclose(got_c, want_c, atol=3e-4, rtol=1e-3)

        def loss_p(xy):
            c, _ = pallas_blend.render_tiles_pallas_list(
                xy, *args[1:], b, gx, gy, 32, BG, chunk=256, interpret=True)
            return jnp.mean(c ** 2)

        def loss_j(xy):
            c, _ = tile_blend.render_tiles_jnp(
                xy, *args[1:], b.gauss_id, b.offsets, gx, gy, 32, BG,
                max_per_tile=2048)
            return jnp.mean(c ** 2)

        gp = jax.grad(loss_p)(prep.means2d)
        gj = jax.grad(loss_j)(prep.means2d)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gj), atol=2e-3, rtol=5e-3)


def fake_binning(gid, offsets, n_gauss):
    """Binning tuple for hand-built single-instance-per-gaussian lists
    (each gaussian appears exactly once, already in pre-sort order)."""
    k = gid.shape[0]
    count = jnp.zeros(n_gauss, jnp.int32).at[gid].add(1)
    start = jnp.cumsum(count) - count
    return binning_ops.Binning(
        gauss_id=gid, tile_id=jnp.zeros(k, jnp.int32), offsets=offsets,
        num_instances=offsets[-1], num_enumerated=offsets[-1],
        overflow=jnp.array(False),
        gauss_start=start, gauss_count=count,
    )


class TestPallasForward:
    def test_matches_jnp_tiles(self):
        cam, prep, b, gx, gy = setup_scene()
        args = (prep.means2d, prep.conics, prep.rgb, prep.opacities)
        want_c, want_t = tile_blend.render_tiles_jnp(
            *args, b.gauss_id, b.offsets, gx, gy, 32, BG, max_per_tile=512
        )
        got_c, got_t = pallas_blend.render_tiles_pallas_list(
            *args, b, gx, gy, 32, BG, chunk=128, interpret=True
        )
        np.testing.assert_allclose(got_c, want_c, atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(got_t, want_t, atol=3e-4)

    def test_multiple_chunks_per_tile(self):
        """Instance count forces several chunks; parity must hold across
        chunk boundaries (carry logic) and across the unaligned superset
        reads (offsets not chunk multiples)."""
        cam, prep, b, gx, gy = setup_scene(n=500, seed=1)
        args = (prep.means2d, prep.conics, prep.rgb, prep.opacities)
        want_c, _ = tile_blend.render_tiles_jnp(
            *args, b.gauss_id, b.offsets, gx, gy, 32, BG, max_per_tile=512
        )
        got_c, _ = pallas_blend.render_tiles_pallas_list(
            *args, b, gx, gy, 32, BG, chunk=32, interpret=True
        )
        np.testing.assert_allclose(got_c, want_c, atol=3e-4, rtol=1e-3)

    def test_early_exit_saturated_tile(self):
        """Opaque wall of gaussians: kernel must early-exit chunks but still
        match the relaxed-semantics jnp path within the 1e-4 bound."""
        n = 600
        rng = np.random.default_rng(2)
        xy = jnp.asarray(
            np.stack([rng.uniform(0, 32, n), rng.uniform(0, 32, n)], -1).astype(np.float32)
        )
        conic = jnp.tile(jnp.array([[0.01, 0.0, 0.01]]), (n, 1))
        rgb = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
        op = jnp.full((n,), 0.95)
        gid = jnp.arange(n, dtype=jnp.int32)
        offsets = jnp.array([0, n], jnp.int32)
        fb = fake_binning(gid, offsets, n)
        got_c, got_t = pallas_blend.render_tiles_pallas_list(
            xy, conic, rgb, op, fb, 1, 1, 32, BG, chunk=64, interpret=True
        )
        want_c, want_t = tile_blend.render_tiles_jnp(
            xy, conic, rgb, op, gid, offsets, 1, 1, 32, BG, max_per_tile=n
        )
        assert float(got_t.max()) < 1e-3
        np.testing.assert_allclose(got_c, want_c, atol=5e-4, rtol=1e-2)

    def test_early_exit_grads_zero_for_skipped(self):
        """Gradients of instances in early-exited chunks must be exactly
        zero (their grad-region chunks are never written)."""
        n = 600
        rng = np.random.default_rng(7)
        xy = jnp.asarray(
            np.stack([rng.uniform(8, 24, n), rng.uniform(8, 24, n)], -1).astype(np.float32)
        )
        # near-flat gaussians covering the whole tile at alpha ~ 0.99:
        # every pixel saturates within the first chunk
        conic = jnp.tile(jnp.array([[1e-4, 0.0, 1e-4]]), (n, 1))
        rgb = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
        op = jnp.full((n,), 0.9)  # alpha 0.9 < clamp; T < 1e-4 after 4
        gid = jnp.arange(n, dtype=jnp.int32)
        offsets = jnp.array([0, n], jnp.int32)
        fb = fake_binning(gid, offsets, n)

        def loss(rgb):
            c, t = pallas_blend.render_tiles_pallas_list(
                xy, conic, rgb, op, fb, 1, 1, 32, BG, chunk=64, interpret=True
            )
            return jnp.sum(c)

        g = np.asarray(jax.grad(loss)(rgb))
        assert np.isfinite(g).all()
        # the far tail (beyond saturation) gets exactly zero gradient
        assert (g[-64:] == 0).all()
        assert (g[:64] != 0).any()


class TestPallasGradients:
    def test_grad_parity_with_jnp(self):
        cam, prep, b, gx, gy = setup_scene(n=150, seed=3, w=64, h=32)
        inputs = (prep.means2d, prep.conics, prep.rgb, prep.opacities)

        def loss_pallas(xy, conic, rgb, op):
            c, t = pallas_blend.render_tiles_pallas_list(
                xy, conic, rgb, op, b, gx, gy, 32, BG,
                chunk=64, interpret=True,
            )
            return jnp.sum(c**2) + jnp.sum(t * 0.3)

        def loss_jnp(xy, conic, rgb, op):
            c, t = tile_blend.render_tiles_jnp(
                xy, conic, rgb, op, b.gauss_id, b.offsets, gx, gy, 32, BG,
                max_per_tile=256,
            )
            return jnp.sum(c**2) + jnp.sum(t * 0.3)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*inputs)
        gj = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(*inputs)
        for p_, j_, name in zip(gp, gj, ["xy", "conic", "rgb", "op"]):
            np.testing.assert_allclose(
                np.asarray(p_), np.asarray(j_), atol=2e-3, rtol=5e-3,
                err_msg=f"pallas grad mismatch: {name}",
            )

    def test_bg_gradient_flows(self):
        cam, prep, b, gx, gy = setup_scene(n=100, seed=4, w=32, h=32)

        def loss(bg):
            c, _ = pallas_blend.render_tiles_pallas_list(
                prep.means2d, prep.conics, prep.rgb, prep.opacities,
                b, gx, gy, 32, bg, chunk=64, interpret=True,
            )
            return jnp.sum(c)

        g = jax.grad(loss)(BG)
        assert np.isfinite(np.asarray(g)).all() and float(g.min()) > 0


class TestCapacityOverflow:
    def test_grad_parity_under_instance_overflow(self):
        """max_instances below the true duplicate count: both impls truncate
        the same sorted instance list, gradients must still agree and the
        dropped tail must not corrupt the segment reduction boundaries."""
        cam, prep, b_full, gx, gy = setup_scene(n=400, seed=8)
        total = int(b_full.num_instances)
        cap = (total // 2 // 64) * 64 + 32  # non-chunk-multiple, forces pad
        b = binning_ops.bin_gaussians(prep, gx, gy, max_instances=cap)
        assert bool(b.overflow)
        inputs = (prep.means2d, prep.conics, prep.rgb, prep.opacities)

        def loss_pallas(xy, conic, rgb, op):
            c, t = pallas_blend.render_tiles_pallas_list(
                xy, conic, rgb, op, b, gx, gy, 32, BG, chunk=64, interpret=True
            )
            return jnp.sum(c**2)

        def loss_jnp(xy, conic, rgb, op):
            c, t = tile_blend.render_tiles_jnp(
                xy, conic, rgb, op, b.gauss_id, b.offsets, gx, gy, 32, BG,
                max_per_tile=512,
            )
            return jnp.sum(c**2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*inputs)
        gj = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(*inputs)
        for p_, j_, name in zip(gp, gj, ["xy", "conic", "rgb", "op"]):
            np.testing.assert_allclose(
                np.asarray(p_), np.asarray(j_), atol=2e-3, rtol=5e-3,
                err_msg=f"overflow grad mismatch: {name}",
            )


class TestRasterizePallasPath:
    def test_end_to_end_matches_jnp_impl(self):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(250, seed=5)
        kw = dict(sh_degree=0, max_instances=1 << 12, max_per_tile=512)
        want = rast.rasterize(means, scales, quats, op, sh, cam, BG, impl="jnp", **kw)
        got = rast.rasterize(means, scales, quats, op, sh, cam, BG, impl="pallas", **kw)
        np.testing.assert_allclose(got.color, want.color, atol=3e-4, rtol=1e-3)

    def test_end_to_end_grads(self):
        cam = make_camera(32, 32)
        means, scales, quats, op, sh = make_random_gaussians(80, seed=6)
        kw = dict(sh_degree=0, max_instances=1 << 11, max_per_tile=128)

        def loss(impl, *args):
            out = rast.rasterize(*args, cam, BG, impl=impl, **kw)
            return jnp.mean(out.color**2)

        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, op, sh
        )
        gj = jax.grad(lambda *a: loss("jnp", *a), argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, op, sh
        )
        for p_, j_, name in zip(gp, gj, ["means", "scales", "quats", "op", "sh"]):
            np.testing.assert_allclose(
                np.asarray(p_), np.asarray(j_), atol=1e-4, rtol=5e-3,
                err_msg=f"e2e pallas grad mismatch: {name}",
            )


class TestFusedInstanceBuilder:
    def test_matches_bin_gaussians(self):
        """build_sorted_instances (compaction sort + expand + payload sort)
        must reproduce bin_gaussians' sorted instance list exactly, and its
        feature payload rows must equal the explicit gather."""
        cam, prep, b, gx, gy = setup_scene(n=700, seed=11)
        si = binning_ops.build_sorted_instances(
            prep.means2d, prep.conics, prep.rgb, prep.opacities,
            prep.tiles_touched, prep.rect_min, prep.rect_max, prep.cull_thr,
            prep.depths, gx, gy, max_instances=1 << 13, tile_px=32,
            interpret=True,
        )
        f = si.binning
        np.testing.assert_array_equal(np.asarray(f.offsets), np.asarray(b.offsets))
        np.testing.assert_array_equal(
            np.asarray(f.tile_id), np.asarray(b.tile_id))
        n_live = int(b.offsets[-1])
        np.testing.assert_array_equal(
            np.asarray(f.gauss_id[:n_live]), np.asarray(b.gauss_id[:n_live]))
        np.testing.assert_array_equal(
            np.asarray(f.gauss_start), np.asarray(b.gauss_start))
        np.testing.assert_array_equal(
            np.asarray(f.gauss_count), np.asarray(b.gauss_count))
        assert int(f.num_instances) == int(b.num_instances)
        assert int(f.num_enumerated) == int(b.num_enumerated)
        # feature payload rows == explicit gather (bit-exact)
        want = pallas_blend._sorted_features(
            prep.means2d, prep.conics, prep.rgb, prep.opacities,
            b.gauss_id, 128,
        )
        got = pallas_blend._feat_soa_from_rows(si.feat_rows, 128)
        np.testing.assert_array_equal(
            np.asarray(got[:10, :n_live]), np.asarray(want[:10, :n_live]))

    def test_truncation_max_live(self):
        cam, prep, b_full, gx, gy = setup_scene(n=700, seed=12)
        cap = int(b_full.num_instances) // 2
        b = binning_ops.bin_gaussians(
            prep, gx, gy, max_instances=1 << 13, max_live=cap)
        si = binning_ops.build_sorted_instances(
            prep.means2d, prep.conics, prep.rgb, prep.opacities,
            prep.tiles_touched, prep.rect_min, prep.rect_max, prep.cull_thr,
            prep.depths, gx, gy, max_instances=1 << 13, tile_px=32,
            max_live=cap, interpret=True,
        )
        assert bool(si.binning.overflow)
        np.testing.assert_array_equal(
            np.asarray(si.binning.offsets), np.asarray(b.offsets))
        np.testing.assert_array_equal(
            np.asarray(si.binning.tile_id), np.asarray(b.tile_id))


class TestAlphaPrecisionModes:
    """TUNE['alpha'] bf16 modes (pivoted-Cholesky -(u^2+v^2)/2 with the
    wide chain in bf16): deliberately LOSSY — the bf16 product/square
    roundings leave ~1.5% relative error in q, i.e. |power|*1.5% absolute,
    measured ~33 dB vs the f32 render. That rules them out for training
    (default stays 'f32'; the strict 1e-3 cross-impl parity tests pin it)
    but comfortably beats the foveated path's 18 dB decimation floor, so
    the intended consumer is peripheral-tile AMR rendering. These tests
    gate the measured quality so a regression can't silently worsen it."""

    @pytest.mark.parametrize("mode", ["bf16", "bf16x"])
    def test_render_psnr_vs_f32(self, mode):
        cam = make_camera(128, 128)
        means, scales, quats, op, sh = make_random_gaussians(1200, seed=13)
        kw = dict(sh_degree=2, max_instances=1 << 14, max_per_tile=1024)

        def render():
            jax.clear_caches()  # TUNE is read at trace time
            out = rast.rasterize(
                means, scales, quats, op, sh, cam, BG, impl="pallas", **kw)
            return np.asarray(out.color)

        old = pallas_blend.TUNE["alpha"]
        try:
            pallas_blend.TUNE["alpha"] = "f32"
            exact = render()
            pallas_blend.TUNE["alpha"] = mode
            lossy = render()
        finally:
            pallas_blend.TUNE["alpha"] = old
            jax.clear_caches()
        mse = float(np.mean((exact - lossy) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 30.0, f"{mode}: PSNR vs f32 = {psnr:.1f} dB"

    def test_grads_directionally_match(self):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=14)
        kw = dict(sh_degree=0, max_instances=1 << 13, max_per_tile=512)
        gt = jax.random.uniform(jax.random.PRNGKey(3), (3, 64, 64))

        def grads():
            jax.clear_caches()

            def loss(m, s, o):
                out = rast.rasterize(m, s, quats, o, sh, cam, BG,
                                     impl="pallas", **kw)
                return jnp.mean(jnp.abs(out.color - gt))
            return jax.grad(loss, argnums=(0, 1, 2))(means, scales, op)

        old = pallas_blend.TUNE["alpha"]
        try:
            pallas_blend.TUNE["alpha"] = "f32"
            g_exact = [np.asarray(g) for g in grads()]
            pallas_blend.TUNE["alpha"] = "bf16"
            g_lossy = [np.asarray(g) for g in grads()]
        finally:
            pallas_blend.TUNE["alpha"] = old
            jax.clear_caches()
        for a, b, name in zip(g_lossy, g_exact, ("means", "scales", "op")):
            # cosine similarity per tensor: sanity only — training keeps
            # 'f32' (measured ~0.976 on means; too rotated to train with,
            # fine for the fwd-only foveated consumer)
            cos = float((a * b).sum() /
                        (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
            assert cos > 0.95, f"{name}: grad cosine {cos:.5f}"
