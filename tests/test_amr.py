"""AMR foveated rendering: level assignment distribution, round pixel
patterns, fovea-step protocol, interpolation, gaze override."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.ops import amr
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from tests.helpers import make_camera, make_random_gaussians

BG = jnp.array([0.1, 0.2, 0.3])


def scene(n=400, seed=0, w=128, h=96):
    cam = make_camera(w, h)
    means, scales, quats, op, sh = make_random_gaussians(n, seed=seed)
    return cam, (means, scales, quats, op, sh)


class TestLevels:
    def test_percentile_distribution(self):
        counts = jnp.asarray(np.random.default_rng(0).integers(0, 1000, 400))
        lv = np.asarray(amr.assign_levels(counts))
        frac = [(lv == k).mean() for k in (1, 2, 3, 4)]
        # 25 / 25 / 40 / 10 percent split (amr/rasterizer_impl.cu:609)
        assert frac[0] == pytest.approx(0.25, abs=0.05)
        assert frac[1] == pytest.approx(0.25, abs=0.05)
        assert frac[2] == pytest.approx(0.40, abs=0.05)
        assert frac[3] == pytest.approx(0.10, abs=0.05)

    def test_gaze_override(self):
        levels = jnp.full((4 * 4,), 2, jnp.int32)
        out = amr.gaze_levels(
            levels, 4, 4, 32, jnp.array([64.0, 64.0]),
            jnp.array([30.0, 50.0, 60.0]),
        )
        out = np.asarray(out).reshape(4, 4)
        assert out[2, 2] == 4  # near gaze: boosted to full
        assert out[0, 0] == 1  # far corner: capped to coarsest


class TestFoveatedRender:
    def test_all_level4_matches_full_render(self):
        """If every tile renders at level 4, AMR output == standard render."""
        cam, params = scene()
        full = rast.rasterize(*params, cam, BG, sh_degree=0,
                              max_instances=1 << 13, max_per_tile=512).color
        state = amr.fovea_step0(*params, 0, cam, max_instances=1 << 13)
        state = state._replace(tile_levels=jnp.full_like(state.tile_levels, 4))
        gx, gy = -(-cam.width // 32), -(-cam.height // 32)
        for rnd in range(1, 5):
            state = amr.fovea_step_render(state, rnd, gx, gy, 32,
                                          impl="jnp", max_per_tile=512)
        color = state.color + state.final_t[None] * BG[:, None, None]
        color = color[:, :cam.height, :cam.width]
        np.testing.assert_allclose(np.asarray(color), np.asarray(full),
                                   atol=3e-5, rtol=1e-3)

    def test_level1_pixels_computed_are_exact(self):
        """Level-1 tiles: the round-1 subgrid pixels equal the full render."""
        cam, params = scene(seed=1)
        full = rast.rasterize(*params, cam, BG, sh_degree=0,
                              max_instances=1 << 13, max_per_tile=512).color
        color, state = amr.render_amr(*params, 0, cam, BG,
                                      max_instances=1 << 13, max_per_tile=512)
        lv = np.asarray(state.tile_levels)
        gx = -(-cam.width // 32)
        colf = np.asarray(full)
        cola = np.asarray(color)
        for t in np.nonzero(lv == 1)[0][:5]:
            ty, tx = divmod(int(t), gx)
            sub_a = cola[:, ty * 32:(ty + 1) * 32:2, tx * 32:(tx + 1) * 32:2]
            sub_f = colf[:, ty * 32:(ty + 1) * 32:2, tx * 32:(tx + 1) * 32:2]
            if sub_a.size:
                np.testing.assert_allclose(sub_a, sub_f, atol=3e-5, rtol=1e-3)

    def test_interpolation_fills_all_pixels(self):
        cam, params = scene(seed=2)
        color, state = amr.render_amr(*params, 0, cam, BG,
                                      max_instances=1 << 13, max_per_tile=512)
        assert np.isfinite(np.asarray(color)).all()
        # interpolated image should still be close-ish to the full render
        full = rast.rasterize(*params, cam, BG, sh_degree=0,
                              max_instances=1 << 13, max_per_tile=512).color
        err = float(jnp.mean(jnp.abs(color - full)))
        assert err < 0.1  # nearest-pixel fill: small mean error

    def test_interpolation_copy_semantics(self):
        """In a level-1 tile, all four pixels of each 2x2 cell equal the
        (0,0) pixel after interpolation (amr/forward.cu:617-646)."""
        cam, params = scene(seed=3)
        color, state = amr.render_amr(*params, 0, cam, BG,
                                      max_instances=1 << 13, max_per_tile=512)
        lv = np.asarray(state.tile_levels)
        gx = -(-cam.width // 32)
        c = np.asarray(color)
        done = 0
        for t in np.nonzero(lv == 1)[0]:
            ty, tx = divmod(int(t), gx)
            if (ty + 1) * 32 > cam.height or (tx + 1) * 32 > cam.width:
                continue
            block = c[:, ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32]
            np.testing.assert_allclose(block[:, 1::2, 0::2], block[:, 0::2, 0::2], atol=1e-6)
            np.testing.assert_allclose(block[:, 0::2, 1::2], block[:, 0::2, 0::2], atol=1e-6)
            np.testing.assert_allclose(block[:, 1::2, 1::2], block[:, 0::2, 0::2], atol=1e-6)
            done += 1
        assert done > 0

    def test_gaze_driven_render(self):
        cam, params = scene(seed=4)
        gaze = jnp.array([20.0, 20.0])
        radii = jnp.array([24.0, 48.0, 80.0])
        color, state = amr.render_amr(
            *params, 0, cam, BG, max_instances=1 << 13, max_per_tile=512,
            gaze_xy=gaze, gaze_radii=radii,
        )
        lv = np.asarray(state.tile_levels).reshape(-1, -(-cam.width // 32))
        assert lv[0, 0] == 4  # tile containing gaze is full-res
        assert lv[-1, -1] == 1  # far corner is coarsest
        assert np.isfinite(np.asarray(color)).all()

    def test_levels_last_tracking(self):
        cam, params = scene(seed=5)
        state = amr.fovea_step0(*params, 0, cam, max_instances=1 << 13)
        gx, gy = -(-cam.width // 32), -(-cam.height // 32)
        state = amr.fovea_step_render(state, 1, gx, gy, 32, impl="jnp", max_per_tile=512)
        assert (np.asarray(state.tile_levels_last) == 1).all()
        state = amr.fovea_step_render(state, 2, gx, gy, 32, impl="jnp", max_per_tile=512)
        lv = np.asarray(state.tile_levels)
        last = np.asarray(state.tile_levels_last)
        np.testing.assert_array_equal(last, np.where(lv >= 2, 2, 1))


class TestPallasRound:
    def test_round_kernel_matches_jnp(self):
        from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
        from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend, tile_blend
        from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess

        cam, (means, scales, quats, op, sh) = scene(seed=6, w=64, h=64)
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        gx = gy = 2
        b = binning_ops.bin_gaussians(prep, gx, gy, 1 << 12)
        for rnd, (ox, oy) in amr.ROUND_OFFSET.items():
            want_c, want_t = tile_blend.render_tiles_jnp(
                prep.means2d, prep.conics, prep.rgb, prep.opacities,
                b.gauss_id, b.offsets, gx, gy, 32, jnp.zeros(3),
                max_per_tile=512, stride=2, offx=ox, offy=oy,
            )
            feat_soa = pallas_blend._sorted_features(
                prep.means2d, prep.conics, prep.rgb, prep.opacities,
                b.gauss_id, 64,
            )
            tiles = pallas_blend.blend_round_pallas(
                feat_soa, b.offsets, gx, gy, 32,
                stride=2, offx=ox, offy=oy, chunk=64, interpret=True,
            )
            pw = 16
            got_c = tiles[:, :, 0:3].reshape(gy, gx, pw, pw, 3)
            got_c = jnp.transpose(got_c, (4, 0, 2, 1, 3)).reshape(3, gy * pw, gx * pw)
            np.testing.assert_allclose(
                np.asarray(got_c), np.asarray(want_c), atol=3e-4, rtol=1e-3,
                err_msg=f"round {rnd}",
            )

    def test_fused_matches_stepwise_protocol(self):
        """render_amr_fused must be output-identical to the 5-step protocol
        (same step0 state, same levels): one fused stream per tile instead
        of one stream per (tile, round)."""
        cam, params = scene(n=500, seed=7, w=128, h=96)
        want, st_w = amr.render_amr(*params, 0, cam, BG, impl="pallas",
                                    interpret=True, interpolate_image=True)
        got, st_g = amr.render_amr_fused(*params, 0, cam, BG,
                                         interpret=True,
                                         interpolate_image=True)
        assert np.array_equal(np.asarray(st_w.tile_levels),
                              np.asarray(st_g.tile_levels))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_fused_gaze_matches_stepwise(self):
        cam, params = scene(n=400, seed=8, w=128, h=96)
        gaze = jnp.array([30.0, 40.0])
        radii = jnp.array([20.0, 40.0, 70.0])
        want, _ = amr.render_amr(*params, 0, cam, BG, impl="pallas",
                                 interpret=True, gaze_xy=gaze,
                                 gaze_radii=radii)
        got, _ = amr.render_amr_fused(*params, 0, cam, BG, interpret=True,
                                      gaze_xy=gaze, gaze_radii=radii)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


class TestDecimation:
    """Instance-stream decimation for coarse foveated tiles
    (pallas_blend._blend_stream_loop ``step``): exact for single-chunk
    tiles (rep = 1 tail weighting), statistically faithful elsewhere."""

    def test_single_chunk_tiles_are_exact(self):
        """Tiles with <= 128 instances keep ALL instances under any step
        (the tail-rep logic weights the only chunk by 1): decimated output
        must be bit-comparable to undecimated."""
        cam, g = scene(n=120, seed=3)
        out0, _ = amr.render_amr_fused(*g, 0, cam, BG)
        out4, _ = amr.render_amr_fused(*g, 0, cam, BG,
                                       decimation=(4, 2, 1, 1))
        np.testing.assert_allclose(
            np.asarray(out4), np.asarray(out0), atol=1e-6)

    def test_decimated_approximates_dense(self):
        """Dense scene (multi-chunk tiles): level-1/2 decimation with
        aggregate-opacity compensation must stay visually close to the
        undecimated foveated render (periphery-quality knob, not an exact
        transform)."""
        cam, g = scene(n=3000, seed=4, w=128, h=96)
        # force everything peripheral: gaze far outside the image
        gaze = jnp.array([1e6, 1e6])
        radii = jnp.array([10.0, 20.0, 30.0])
        out0, st0 = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii)
        out4, st4 = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii,
            decimation=(4, 2, 1, 1))
        assert int(np.asarray(st4.tile_levels).max()) == 1  # all peripheral
        a, b = np.asarray(out0), np.asarray(out4)
        mse = float(((a - b) ** 2).mean())
        psnr = -10 * np.log10(max(mse, 1e-12))
        # ~20 dB on this adversarial scene (i.i.d. random colors have no
        # spatial coherence for the kept instances to represent); real
        # trained scenes fare far better, and these tiles are displayed at
        # 1/4 resolution anyway. Guard against regressions to garbage.
        assert psnr > 18.0, psnr

    def test_step1_decimation_is_identity(self):
        cam, g = scene(n=800, seed=5)
        out0, _ = amr.render_amr_fused(*g, 0, cam, BG)
        out1, _ = amr.render_amr_fused(*g, 0, cam, BG,
                                       decimation=(1, 1, 1, 1))
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


class TestBinningTimeDecimation:
    """predecimate: the binning-time gaze decimation path (instances
    dropped BEFORE the megasort, kernel compensates scale-only)."""

    def test_identity_when_all_fovea(self):
        """Gaze covering the whole image -> every tile level 4, level-4
        step 1 -> nothing dropped; predecimate must be bit-equal to the
        plain gaze render (levels are all 4 either way)."""
        cam, g = scene(n=500, seed=7)
        gaze = jnp.array([64.0, 48.0])
        radii = jnp.array([1e4, 2e4, 3e4])
        out0, st0 = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii)
        outp, stp = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii,
            decimation=(4, 2, 1, 1), predecimate=True)
        assert int(np.asarray(st0.tile_levels).min()) == 4
        assert int(np.asarray(stp.tile_levels).min()) == 4
        np.testing.assert_array_equal(np.asarray(outp), np.asarray(out0))

    def test_peripheral_shrinks_instances_and_approximates(self):
        """Gaze far outside -> all tiles level 1 (step 4): the instance
        list must shrink ~4x AND the render must stay close to the
        undecimated foveated render (same lvl-1 resolution both sides)."""
        cam, g = scene(n=3000, seed=4, w=128, h=96)
        gaze = jnp.array([1e6, 1e6])
        radii = jnp.array([10.0, 20.0, 30.0])
        out0, st0 = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii)
        outp, stp = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii,
            decimation=(4, 2, 1, 1), predecimate=True)
        n0 = int(np.asarray(st0.num_instances))
        np_ = int(np.asarray(stp.num_instances))
        assert np_ < 0.45 * n0, (np_, n0)  # ~1/4 kept (stratum noise ok)
        a, b = np.asarray(out0), np.asarray(outp)
        mse = float(((a - b) ** 2).mean())
        psnr = -10 * np.log10(max(mse, 1e-12))
        # same regime as test_decimated_approximates_dense: adversarial
        # i.i.d. scene; binning-time stratified drop must not be WORSE
        # than the in-kernel chunk-stride decimation's floor
        assert psnr > 17.0, psnr

    def test_matches_kernel_decimation_quality(self):
        """Stratified binning-time drop vs in-kernel chunk-stride drop:
        both approximate the same undecimated render; neither should be
        dramatically worse (they model the same survival process)."""
        cam, g = scene(n=3000, seed=9, w=128, h=96)
        gaze = jnp.array([1e6, 1e6])
        radii = jnp.array([10.0, 20.0, 30.0])
        out0, _ = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii)
        outk, _ = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii,
            decimation=(4, 2, 1, 1))
        outp, _ = amr.render_amr_fused(
            *g, 0, cam, BG, gaze_xy=gaze, gaze_radii=radii,
            decimation=(4, 2, 1, 1), predecimate=True)
        def psnr(x):
            mse = float(((np.asarray(out0) - np.asarray(x)) ** 2).mean())
            return -10 * np.log10(max(mse, 1e-12))
        pk, pp = psnr(outk), psnr(outp)
        assert pp > pk - 3.0, (pp, pk)
