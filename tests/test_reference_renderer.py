"""Tests for the naive oracle renderer (ops/reference.py) and tile binning
(ops/binning.py): analytic single-gaussian cases, compositing identities,
binning consistency, and finite-difference gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import reference as ref
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import (
    Preprocessed,
    preprocess,
)
from tests.helpers import make_camera, make_random_gaussians


def manual_prep(xy, conic, rgb, op, depths, width, height, tile=32):
    """Build a Preprocessed directly from screen-space quantities, with
    full-image rects (no rect culling)."""
    xy = jnp.asarray(xy, jnp.float32)
    n = xy.shape[0]
    gx, gy = -(-width // tile), -(-height // tile)
    return Preprocessed(
        means2d=jnp.asarray(xy, jnp.float32),
        depths=jnp.asarray(depths, jnp.float32),
        conics=jnp.asarray(conic, jnp.float32),
        rgb=jnp.asarray(rgb, jnp.float32),
        opacities=jnp.asarray(op, jnp.float32),
        radii=jnp.full((n,), max(width, height), jnp.int32),
        tiles_touched=jnp.full((n,), gx * gy, jnp.int32),
        rect_min=jnp.zeros((n, 2), jnp.int32),
        rect_max=jnp.tile(jnp.array([[gx, gy]], jnp.int32), (n, 1)),
    )


class TestNaiveAnalytic:
    def test_empty_scene_is_background(self):
        prep = manual_prep(
            np.zeros((1, 2)), np.ones((1, 3)), np.ones((1, 3)), np.zeros(1), np.ones(1),
            width=16, height=16,
        )
        bg = jnp.array([0.1, 0.2, 0.3])
        out = ref.render_naive(prep, 16, 16, bg, pixel_chunk=64)
        np.testing.assert_allclose(
            out.color, np.broadcast_to(np.array([0.1, 0.2, 0.3])[:, None, None], (3, 16, 16)),
            atol=1e-6,
        )
        np.testing.assert_allclose(out.final_t, 1.0)

    def test_single_gaussian_center_value(self):
        """alpha at the gaussian center pixel = opacity (power=0)."""
        w = h = 16
        op = 0.7
        prep = manual_prep(
            [[7.0, 7.0]], [[0.5, 0.0, 0.5]], [[1.0, 0.0, 0.0]], [op], [1.0], w, h
        )
        out = ref.render_naive(prep, w, h, jnp.zeros(3), pixel_chunk=64)
        assert float(out.color[0, 7, 7]) == pytest.approx(op, abs=1e-6)
        assert float(out.final_t[7, 7]) == pytest.approx(1 - op, abs=1e-6)
        # falloff: pixel at distance d has alpha = op*exp(-0.5*conic*d^2)
        d2 = 4.0  # pixel (7+2, 7)
        expect = op * np.exp(-0.5 * 0.5 * d2)
        assert float(out.color[0, 7, 9]) == pytest.approx(expect, abs=1e-6)

    def test_front_to_back_ordering(self):
        """Nearer gaussian composites first regardless of array order."""
        w = h = 8
        args = dict(
            xy=[[3.0, 3.0], [3.0, 3.0]],
            conic=[[10.0, 0, 10.0], [10.0, 0, 10.0]],
            rgb=[[1.0, 0, 0], [0, 1.0, 0]],
            op=[0.8, 0.8],
        )
        out1 = ref.render_naive(
            manual_prep(depths=[1.0, 2.0], width=w, height=h, **args), w, h,
            jnp.zeros(3), pixel_chunk=64,
        )
        out2 = ref.render_naive(
            manual_prep(depths=[2.0, 1.0], width=w, height=h, **args), w, h,
            jnp.zeros(3), pixel_chunk=64,
        )
        # red in front in out1: center = 0.8 red + 0.2*0.8 green
        assert float(out1.color[0, 3, 3]) == pytest.approx(0.8, abs=1e-6)
        assert float(out1.color[1, 3, 3]) == pytest.approx(0.16, abs=1e-6)
        # swapped depths swap the roles
        assert float(out2.color[1, 3, 3]) == pytest.approx(0.8, abs=1e-6)
        assert float(out2.color[0, 3, 3]) == pytest.approx(0.16, abs=1e-6)

    def test_alpha_clamp_at_099(self):
        prep = manual_prep(
            [[3.0, 3.0]], [[0.5, 0, 0.5]], [[1.0, 1, 1]], [5.0], [1.0], 8, 8
        )
        out = ref.render_naive(prep, 8, 8, jnp.zeros(3), pixel_chunk=64)
        assert float(out.color[0, 3, 3]) == pytest.approx(0.99, abs=1e-6)

    def test_small_alpha_skipped(self):
        prep = manual_prep(
            [[3.0, 3.0]], [[0.5, 0, 0.5]], [[1.0, 1, 1]], [1e-3], [1.0], 8, 8
        )
        out = ref.render_naive(prep, 8, 8, jnp.zeros(3), pixel_chunk=64)
        np.testing.assert_allclose(out.color, 0.0, atol=1e-8)
        np.testing.assert_allclose(out.final_t, 1.0)

    def test_early_stop_semantics(self):
        """Stack many opaque gaussians: T crosses 1e-4 and later ones are
        dropped, including the stopping one (forward.cu:345-351)."""
        n = 20
        prep = manual_prep(
            np.tile([[3.0, 3.0]], (n, 1)),
            np.tile([[0.5, 0, 0.5]], (n, 1)),
            np.tile([[1.0, 0, 0]], (n, 1)),
            np.full(n, 0.9),
            np.arange(n, dtype=np.float32),
            8, 8,
        )
        out = ref.render_naive(prep, 8, 8, jnp.zeros(3), pixel_chunk=64)
        # T after k gaussians = 0.1^k ; crosses 1e-4 at k=4
        assert int(out.n_contrib[3, 3]) == 4
        assert float(out.final_t[3, 3]) == pytest.approx(1e-4, rel=1e-4)
        relaxed = ref.render_naive(
            prep, 8, 8, jnp.zeros(3), pixel_chunk=64, exact_stop=False
        )
        assert abs(float(relaxed.color[0, 3, 3]) - float(out.color[0, 3, 3])) < 2e-4

    def test_rect_culling(self):
        """A gaussian whose rect excludes a tile contributes nothing there."""
        w = h = 64
        tile = 32
        prep = manual_prep(
            [[16.0, 16.0]], [[0.001, 0, 0.001]], [[1.0, 1, 1]], [0.9], [1.0], w, h, tile
        )
        prep = prep._replace(rect_max=jnp.array([[1, 1]], jnp.int32))  # only tile (0,0)
        out = ref.render_naive(prep, w, h, jnp.zeros(3), tile=tile, pixel_chunk=256)
        assert float(out.color[0, 16, 16]) > 0.5
        np.testing.assert_allclose(out.color[:, :, 32:], 0.0, atol=1e-7)
        np.testing.assert_allclose(out.color[:, 32:, :], 0.0, atol=1e-7)


def torch_naive_render(xy, conic, rgb, op, depths, width, height, bg):
    """Independent torch implementation of the same compositing semantics
    (front-to-back, alpha cutoffs, exact early stop) — the gradient oracle.
    Written from the splatting equations, not from either codebase."""
    import torch

    order = torch.argsort(depths, stable=True)
    xy, conic, rgb, op = xy[order], conic[order], rgb[order], op[order]
    ys, xs = torch.meshgrid(
        torch.arange(height, dtype=torch.float32),
        torch.arange(width, dtype=torch.float32),
        indexing="ij",
    )
    px = xs.reshape(-1, 1)
    py = ys.reshape(-1, 1)
    dx = xy[None, :, 0] - px
    dy = xy[None, :, 1] - py
    power = (
        -0.5 * (conic[None, :, 0] * dx**2 + conic[None, :, 2] * dy**2)
        - conic[None, :, 1] * dx * dy
    )
    alpha = torch.clamp(op[None, :] * torch.exp(torch.clamp(power, max=0.0)), max=0.99)
    eligible = (power <= 0) & (alpha >= 1.0 / 255.0)
    a = torch.where(eligible, alpha, torch.zeros(()))
    om = 1.0 - a
    t_before = torch.cat(
        [torch.ones_like(a[:, :1]), torch.cumprod(om, dim=1)[:, :-1]], dim=1
    )
    stop = eligible & (t_before * (1 - alpha) < 1e-4)
    done_before = torch.cat(
        [torch.zeros_like(stop[:, :1]), torch.cummax(stop.int(), dim=1)[0][:, :-1] > 0],
        dim=1,
    )
    applied = eligible & ~stop & ~done_before
    w = torch.where(applied, a * t_before, torch.zeros(()))
    color = w @ rgb
    final_t = torch.prod(torch.where(applied, om, torch.ones(())), dim=1)
    color = color + final_t[:, None] * bg[None, :]
    return color.T.reshape(3, height, width)


class TestNaiveGradients:
    def test_gradients_vs_torch_oracle(self):
        import torch

        rng = np.random.default_rng(7)
        xy_n = rng.uniform(3, 12, (6, 2)).astype(np.float32)
        conic_n = np.tile([[0.3, 0.05, 0.4]], (6, 1)).astype(np.float32)
        rgb_n = rng.uniform(0.1, 0.9, (6, 3)).astype(np.float32)
        op_n = rng.uniform(0.4, 0.95, 6).astype(np.float32)
        depths_n = np.arange(6, dtype=np.float32)
        bg_n = np.array([0.2, 0.2, 0.2], np.float32)

        def jloss(xy, conic, rgb, op):
            prep = manual_prep(xy, conic, rgb, op, depths_n, 16, 16)
            out = ref.render_naive(prep, 16, 16, jnp.asarray(bg_n), pixel_chunk=64)
            return jnp.sum(out.color**2)

        jg = jax.grad(jloss, argnums=(0, 1, 2, 3))(
            jnp.asarray(xy_n), jnp.asarray(conic_n), jnp.asarray(rgb_n), jnp.asarray(op_n)
        )

        txy = torch.tensor(xy_n, requires_grad=True)
        tconic = torch.tensor(conic_n, requires_grad=True)
        trgb = torch.tensor(rgb_n, requires_grad=True)
        top = torch.tensor(op_n, requires_grad=True)
        color = torch_naive_render(
            txy, tconic, trgb, top, torch.tensor(depths_n), 16, 16, torch.tensor(bg_n)
        )
        (color**2).sum().backward()

        for got, want, name in [
            (jg[0], txy.grad, "xy"),
            (jg[1], tconic.grad, "conic"),
            (jg[2], trgb.grad, "rgb"),
            (jg[3], top.grad, "op"),
        ]:
            np.testing.assert_allclose(
                np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch vs torch oracle: {name}",
            )

        # forward parity too
        prep = manual_prep(xy_n, conic_n, rgb_n, op_n, depths_n, 16, 16)
        jout = ref.render_naive(prep, 16, 16, jnp.asarray(bg_n), pixel_chunk=64)
        np.testing.assert_allclose(
            np.asarray(jout.color), color.detach().numpy(), rtol=1e-5, atol=1e-6
        )


class TestEndToEndPreprocess:
    def test_random_scene_renders(self):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(200, seed=0)
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        assert int(jnp.sum(prep.radii > 0)) > 100
        out = ref.render_naive(prep, 64, 64, jnp.zeros(3), pixel_chunk=512)
        c = np.asarray(out.color)
        assert np.isfinite(c).all() and c.max() > 0.05
        assert float(out.final_t.min()) >= 0.0

    def test_grad_through_full_pipeline(self):
        cam = make_camera(32, 32)
        means, scales, quats, op, sh = make_random_gaussians(50, seed=1)

        def loss(means, scales, quats, op, sh):
            prep = preprocess(means, scales, quats, op, sh, 0, cam)
            out = ref.render_naive(prep, 32, 32, jnp.zeros(3), pixel_chunk=256)
            return jnp.mean(out.color**2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(means, scales, quats, op, sh)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(grads[0]).sum()) > 0


class TestBinning:
    def test_counts_match_rects(self):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=2)
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        b = binning_ops.bin_gaussians(prep, 2, 2, max_instances=4096)
        assert not bool(b.overflow)
        # Oracle for the ellipse cull. Safety (the critical property): every
        # (gaussian, tile) pair with at least one pixel passing the blend's
        # alpha >= 1/255 gate MUST be kept. Tightness: the kept set is no
        # larger than the old circumscribed-circle test's.
        rmin = np.asarray(prep.rect_min)
        rmax = np.asarray(prep.rect_max)
        xy = np.asarray(prep.means2d)
        con = np.asarray(prep.conics)
        opac = np.asarray(prep.opacities)
        kept = {
            (int(g), int(t))
            for g, t in zip(
                np.asarray(b.gauss_id)[: int(b.num_instances)],
                np.asarray(b.tile_id)[: int(b.num_instances)],
            )
        }
        per_gauss = [0] * xy.shape[0]
        circle_count = 0
        px = np.arange(32.0)
        for i in range(xy.shape[0]):
            ca, cb, cc = con[i]
            lam_max = 0.5 * (ca + cc) + np.hypot(0.5 * (ca - cc), cb)
            # old circle radius bound (through the conic eigenvalues of the
            # INVERSE covariance the bound is 2*ln/lambda_min(conic);
            # conservative recomputation just for the tightness assert)
            for ty in range(rmin[i, 1], rmax[i, 1]):
                for tx in range(rmin[i, 0], rmax[i, 0]):
                    dx = tx * 32.0 + px - xy[i, 0]
                    dy = ty * 32.0 + px - xy[i, 1]
                    q = (
                        0.5 * (ca * dx[None, :] ** 2 + cc * dy[:, None] ** 2)
                        + cb * dx[None, :] * dy[:, None]
                    )
                    alpha = opac[i] * np.exp(-q)
                    contributes = bool(((alpha >= 1.0 / 255.0) & (q >= 0)).any())
                    if contributes:
                        assert (i, ty * 2 + tx) in kept, (
                            f"cull dropped a contributing pair {(i, tx, ty)}"
                        )
                    per_gauss[i] += (i, ty * 2 + tx) in kept
                    circle_count += 1
        # tightness: never bins more than the full rect
        assert int(b.num_instances) <= circle_count
        assert int(b.num_instances) <= int(jnp.sum(prep.tiles_touched))
        np.testing.assert_array_equal(np.asarray(b.gauss_count), per_gauss)
        np.testing.assert_array_equal(
            np.asarray(b.gauss_start), np.cumsum([0] + per_gauss[:-1])
        )
        # offsets are monotone CSR covering exactly num_instances
        off = np.asarray(b.offsets)
        assert (np.diff(off) >= 0).all()
        assert off[0] == 0 and off[-1] == int(b.num_instances)

    def test_instances_sorted_by_tile_then_depth(self):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=3)
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        b = binning_ops.bin_gaussians(prep, 2, 2, max_instances=4096)
        k = int(b.num_instances)
        tiles = np.asarray(b.tile_id[:k])
        depths = np.asarray(prep.depths)[np.asarray(b.gauss_id[:k])]
        assert (np.diff(tiles) >= 0).all()
        for t in range(4):
            d = depths[tiles == t]
            assert (np.diff(d) >= 0).all()

    def test_each_instance_tile_in_rect(self):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=4)
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        b = binning_ops.bin_gaussians(prep, 2, 2, max_instances=4096)
        k = int(b.num_instances)
        g = np.asarray(b.gauss_id[:k])
        t = np.asarray(b.tile_id[:k])
        tx, ty = t % 2, t // 2
        rmin = np.asarray(prep.rect_min)[g]
        rmax = np.asarray(prep.rect_max)[g]
        assert (tx >= rmin[:, 0]).all() and (tx < rmax[:, 0]).all()
        assert (ty >= rmin[:, 1]).all() and (ty < rmax[:, 1]).all()
        # every (gaussian, tile-in-rect) pair appears exactly once
        got = set(zip(g.tolist(), t.tolist()))
        assert len(got) == k

    def test_max_live_truncation(self):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=6)
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        full = binning_ops.bin_gaussians(prep, 2, 2, max_instances=4096)
        n_live = int(full.num_instances)
        # a live capacity above the live count is output-identical on the
        # truncated prefix
        tight = binning_ops.bin_gaussians(
            prep, 2, 2, max_instances=4096, max_live=n_live + 8
        )
        assert not bool(tight.overflow)
        assert int(tight.num_instances) == n_live
        np.testing.assert_array_equal(
            np.asarray(full.gauss_id[:n_live]), np.asarray(tight.gauss_id[:n_live])
        )
        np.testing.assert_array_equal(
            np.asarray(full.offsets), np.asarray(tight.offsets)
        )
        # a live capacity below the live count must raise the overflow flag
        over = binning_ops.bin_gaussians(
            prep, 2, 2, max_instances=4096, max_live=n_live - 1
        )
        assert bool(over.overflow)

    def test_overflow_flag(self):
        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=5)
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        b = binning_ops.bin_gaussians(prep, 2, 2, max_instances=8)
        assert bool(b.overflow)


class TestMarkVisible:
    def test_matches_view_depth(self):
        from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast

        cam = make_camera(64, 64, cam_z=-5.0)
        # points straddling the near plane: view depth = world z + 5
        means = jnp.asarray(
            np.array(
                [[0, 0, -4.9], [0, 0, -4.81], [0, 0, -4.79], [0, 0, 0.0],
                 [3, -2, 10.0], [0, 0, -6.0]],
                np.float32,
            )
        )
        vis = np.asarray(rast.mark_visible(means, cam.viewmatrix))
        # in_frustum (auxiliary.h:154): visible iff view z > 0.2
        expected = np.array([False, False, True, True, True, False])
        np.testing.assert_array_equal(vis, expected)

    def test_consistent_with_preprocess_cull(self):
        from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast

        cam = make_camera(64, 64)
        means, scales, quats, op, sh = make_random_gaussians(300, seed=5)
        vis = np.asarray(rast.mark_visible(means, cam.viewmatrix))
        prep = preprocess(means, scales, quats, op, sh, 0, cam)
        # anything preprocess kept must be mark_visible (the converse can
        # fail: preprocess additionally culls off-screen / zero-area)
        assert np.all(vis[np.asarray(prep.radii) > 0])
