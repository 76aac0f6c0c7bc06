"""Unit tests for the math layer (transforms, SH, SSIM) against independent
oracles (numpy closed forms; torch-computed SSIM formula)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.ops import sh as sh_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import ssim as ssim_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import transforms as tf


class TestTransforms:
    def test_fov_focal_roundtrip(self):
        fov = math.radians(70.0)
        assert tf.focal2fov(tf.fov2focal(fov, 640), 640) == pytest.approx(fov)

    def test_quat_to_rotmat_orthonormal(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        R = tf.quat_to_rotmat(q)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_identity_quat(self):
        R = tf.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_build_cov3d_isotropic(self):
        # Unit quaternion + scale s => Sigma = s^2 I
        cov = tf.build_cov3d(jnp.full((1, 3), 0.5), jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(cov[0], [0.25, 0, 0, 0.25, 0, 0.25], atol=1e-6)

    def test_build_cov3d_matches_RSSR(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(8, 4)).astype(np.float32)
        s = np.exp(rng.normal(size=(8, 3))).astype(np.float32) * 0.3
        cov6 = tf.build_cov3d(jnp.asarray(s), jnp.asarray(q))
        M = tf.cov3d_to_matrix(cov6)
        Rm = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
        for i in range(8):
            L = Rm[i] @ np.diag(s[i])
            np.testing.assert_allclose(M[i], L @ L.T, atol=1e-5)

    def test_world_to_view_roundtrip(self):
        rng = np.random.default_rng(2)
        # random rotation via QR
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        t = rng.normal(size=3)
        V = tf.world_to_view(Q, t)  # R stored camera-to-world style (transposed in)
        # A world point maps through V then back through inv(V)
        p = rng.normal(size=3)
        ph = np.append(p, 1.0)
        back = np.linalg.inv(V) @ (V @ ph)
        np.testing.assert_allclose(back[:3], p, atol=1e-5)

    def test_projection_matrix_maps_znear_zfar(self):
        znear, zfar = 0.01, 100.0
        P = tf.projection_matrix(znear, zfar, math.radians(60), math.radians(60))
        # center ray at znear -> ndc z=0 ; at zfar -> ndc z=1 (after /w)
        for z, expect in [(znear, 0.0), (zfar, 1.0)]:
            clip = P @ np.array([0, 0, z, 1.0])
            assert clip[3] == pytest.approx(z, rel=1e-5)
            assert clip[2] / clip[3] == pytest.approx(expect, abs=1e-5)

    def test_ewa_project_isotropic_center(self):
        """An isotropic gaussian on the optical axis projects to cov2d =
        (s*f/z)^2 I + 0.3 I (forward.cu:74-113)."""
        s, z, f = 0.1, 5.0, 300.0
        cov3d = tf.build_cov3d(jnp.full((1, 3), s), jnp.array([[1.0, 0, 0, 0]]))
        view = jnp.asarray(np.eye(4, dtype=np.float32))
        cov2d = tf.ewa_project(
            jnp.array([[0.0, 0.0, z]]), cov3d, view, f, f, 0.5, 0.5
        )
        expect = (s * f / z) ** 2
        np.testing.assert_allclose(cov2d[0], [expect + 0.3, 0.0, expect + 0.3], rtol=1e-4)


class TestSH:
    def test_degree0(self):
        sh = jnp.zeros((4, 3, 1)).at[:, :, 0].set(1.0)
        rgb, clamped = sh_ops.sh_to_rgb(0, sh, jnp.zeros((4, 3)), jnp.array([0.0, 0, -1]))
        np.testing.assert_allclose(rgb, sh_ops.C0 * 1.0 + 0.5, atol=1e-6)
        assert not bool(clamped.any())

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(
            sh_ops.sh_dc_to_rgb(sh_ops.rgb_to_sh_dc(rgb)), rgb, atol=1e-6
        )

    def test_clamp_mask(self):
        sh = jnp.zeros((1, 3, 1)).at[0, 0, 0].set(-10.0)
        rgb, clamped = sh_ops.sh_to_rgb(0, sh, jnp.zeros((1, 3)), jnp.array([0.0, 0, -1]))
        assert rgb[0, 0] == 0.0 and bool(clamped[0, 0])

    @pytest.mark.parametrize("degree", [1, 2, 3, 4])
    def test_sh_orthogonality_integral(self, degree):
        """Monte-Carlo: E_dir[Y_i * Y_j] ~ delta_ij / (4pi) for real SH."""
        rng = np.random.default_rng(3)
        dirs = rng.normal(size=(200_000, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        k = (degree + 1) ** 2
        # evaluate each basis function by one-hot SH coefficients
        vals = []
        for i in range(k):
            sh = np.zeros((1, 1, k), np.float32)
            sh[0, 0, i] = 1.0
            v = sh_ops.eval_sh(degree, jnp.asarray(sh), jnp.asarray(dirs.astype(np.float32)))
            vals.append(np.asarray(v))
        V = np.stack([v.squeeze() for v in vals], axis=-1)  # (S, k)
        G = V.T @ V / len(dirs)
        np.testing.assert_allclose(G, np.eye(k) / (4 * np.pi), atol=6e-3)


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 32, 32)).astype(np.float32))
        assert float(ssim_ops.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_against_torch_formula(self):
        """Independent torch implementation of the published SSIM
        (Wang et al. 2004; reference utils/loss_utils.py:23-63)."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(4)
        a = rng.uniform(size=(3, 40, 40)).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)

        win, sigma = 11, 1.5
        xs = torch.arange(win, dtype=torch.float64)
        g = torch.exp(-((xs - win // 2) ** 2) / (2 * sigma**2))
        g = (g / g.sum()).float()
        kernel = (g[:, None] @ g[None, :]).expand(3, 1, win, win)

        ta, tb = torch.from_numpy(a)[None], torch.from_numpy(b)[None]

        def blur(x):
            return F.conv2d(x, kernel, padding=win // 2, groups=3)

        mu1, mu2 = blur(ta), blur(tb)
        s1 = blur(ta * ta) - mu1**2
        s2 = blur(tb * tb) - mu2**2
        s12 = blur(ta * tb) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        want = (
            ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
        ).mean().item()

        got = float(ssim_ops.ssim(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(want, abs=1e-4)

    def test_loss_decreases_with_similarity(self):
        rng = np.random.default_rng(5)
        gt = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
        noisy = jnp.clip(gt + 0.3 * jnp.asarray(rng.normal(size=(3, 32, 32)).astype(np.float32)), 0, 1)
        l_noisy = float(ssim_ops.dssim_l1_loss(noisy, gt))
        l_close = float(ssim_ops.dssim_l1_loss(gt, gt))
        assert l_close < 1e-5 < l_noisy

    def test_ssim_differentiable(self):
        rng = np.random.default_rng(6)
        gt = jnp.asarray(rng.uniform(size=(3, 16, 16)).astype(np.float32))
        x = jnp.full((3, 16, 16), 0.5)
        g = jax.grad(lambda im: ssim_ops.dssim_l1_loss(im, gt))(x)
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


class TestKNN:
    def test_native_matches_bruteforce(self):
        from gaussian_splatting_with_eye_tracking_tpu import native

        rng = np.random.default_rng(10)
        pts = rng.normal(size=(800, 3)).astype(np.float32)
        out = native.mean_sq_dist_3nn_native(pts)
        if out is None:
            pytest.skip("native knn unavailable (no g++)")
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        want = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-7)

    def test_dispatch_consistency(self):
        from gaussian_splatting_with_eye_tracking_tpu.ops import knn as knn_ops

        rng = np.random.default_rng(11)
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        a = knn_ops.mean_sq_dist_3nn(pts)
        b = np.asarray(knn_ops.mean_sq_dist_3nn_jax(jnp.asarray(pts), block=128))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class TestPreprocessCustomVJP:
    """The hand-derived preprocess VJP (ops/projection.py, mirror of
    reference backward.cu:144-396) must match XLA autodiff of the same
    forward to float32 accuracy — including clamp/cull gating edge cases."""

    def _setup(self, n=400, seed=0, sh_degree=3, extreme=False):
        from tests.helpers import make_camera, make_random_gaussians

        means, scales, quats, op, sh = make_random_gaussians(
            n, seed=seed, sh_degree=sh_degree)
        if extreme:
            rng = np.random.default_rng(seed + 1)
            # push some points behind the camera / off-frustum / degenerate
            means = means.at[:n // 8, 2].set(-6.0)  # behind near plane
            means = means.at[n // 8:n // 4, 0].add(40.0)  # FOV clamp region
            scales = scales.at[n // 4:n // 3].set(5e-7)  # degenerate det
            op = op.at[n // 3:n // 2].set(0.002)  # ln_op = 0 extents
        cam = make_camera(96, 80)
        return means, scales, quats, op, sh, cam, sh_degree

    @pytest.mark.parametrize("sh_degree", [0, 1, 2, 3])
    @pytest.mark.parametrize("extreme", [False, True])
    def test_grads_match_autodiff(self, sh_degree, extreme):
        from gaussian_splatting_with_eye_tracking_tpu.ops import projection

        means, scales, quats, op, sh, cam, deg = self._setup(
            sh_degree=sh_degree, extreme=extreme)
        mask = jnp.arange(means.shape[0]) < means.shape[0] - 7  # some padded

        rng = np.random.default_rng(42)

        def cots(prep):
            # random cotangents on every float output the pipeline uses
            return (
                jnp.asarray(rng.standard_normal(prep.means2d.shape), jnp.float32),
                jnp.asarray(rng.standard_normal(prep.depths.shape), jnp.float32),
                jnp.asarray(rng.standard_normal(prep.conics.shape), jnp.float32),
                jnp.asarray(rng.standard_normal(prep.rgb.shape), jnp.float32),
                jnp.asarray(rng.standard_normal(prep.opacities.shape), jnp.float32),
            )

        def make_loss(fn):
            def loss(m, s, q, o, shc, ct):
                prep = fn(m, s, q, o, shc, deg, cam, active_mask=mask)
                cm2, cd, cc, crgb, cop = ct
                return (jnp.vdot(prep.means2d, cm2) + jnp.vdot(prep.depths, cd)
                        + jnp.vdot(prep.conics, cc) + jnp.vdot(prep.rgb, crgb)
                        + jnp.vdot(prep.opacities, cop))
            return loss

        prep0 = projection._preprocess_autodiff(
            means, scales, quats, op, sh, deg, cam, active_mask=mask)
        ct = cots(prep0)

        g_hand = jax.grad(make_loss(projection.preprocess),
                          argnums=(0, 1, 2, 3, 4))(means, scales, quats, op, sh, ct)
        g_auto = jax.grad(make_loss(projection._preprocess_autodiff),
                          argnums=(0, 1, 2, 3, 4))(means, scales, quats, op, sh, ct)
        names = ("means3d", "scales", "quats", "opacities", "sh")
        for a, b, name in zip(g_hand, g_auto, names):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all(), name
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(
                a, b, atol=2e-5 * scale, rtol=1e-4,
                err_msg=f"{name} (sh_degree={sh_degree}, extreme={extreme})")

    def test_forward_identical(self):
        from gaussian_splatting_with_eye_tracking_tpu.ops import projection

        means, scales, quats, op, sh, cam, deg = self._setup()
        a = projection.preprocess(means, scales, quats, op, sh, deg, cam)
        b = projection._preprocess_autodiff(
            means, scales, quats, op, sh, deg, cam)
        for fa, fb, name in zip(a, b, a._fields):
            fa, fb = np.asarray(fa), np.asarray(fb)
            if fa.dtype.kind == "i":
                # int outputs (radii/tiles/rects) may flip only where a
                # ceil/clip sits exactly on a float boundary; the wrapper
                # casts tan_fov to f32 (vs python-float weak type)
                np.testing.assert_array_equal(fa, fb, err_msg=name)
            else:
                np.testing.assert_allclose(fa, fb, rtol=2e-6, atol=2e-6,
                                           err_msg=name)
