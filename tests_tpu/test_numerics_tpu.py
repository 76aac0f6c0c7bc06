"""On-TPU numerics regression tests for the r4 training collapse
(VERDICT r4 weak #1/#6, next-round #1/#5).

The r4 failure mode: ops/ssim.py ran its variance convolutions at default
(bf16 MXU) precision; the blur(x^2) - mu^2 cancellation pushed the SSIM
denominator through zero on iteration 3177's frame, loss = -inf, one Adam
step NaN'd every row, and the remaining 26.8k iterations trained a corpse.
`judge_repro/chkpnt3176.ckpt` is the exact pre-collapse state; these tests
pin it as a fixture and assert the whole window is now healthy at REAL
hardware precision (tests/ force the CPU backend and cannot see this bug).

Reference anchors: utils/loss_utils.py:23-63 (f32 SSIM that never needed
any of this), train.py:88-120 (loss + density control window).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gaussian_splatting_with_eye_tracking_tpu import renderer, train_lib
from gaussian_splatting_with_eye_tracking_tpu.config import (
    ModelConfig,
    OptimizationConfig,
)
from gaussian_splatting_with_eye_tracking_tpu.models import checkpoint as ckpt
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.ops import ssim as ssim_ops
from tests.helpers import make_camera, make_random_gaussians

CKPT = os.path.join(REPO, "judge_repro", "chkpnt3176.ckpt")
SCENE_CANDIDATES = [
    os.path.join(REPO, "logs", "train_r05", "scene"),
    os.path.join(REPO, "logs", "train_r04", "scene"),
]


@pytest.fixture(scope="module")
def collapse_fixture():
    """(state@3176, iteration-3177 camera, Scene) — the exact r4 collapse
    step. The scene is the deterministic synth dataset (seed 3); regenerate
    it if no committed run has left one on disk."""
    scene_root = next((p for p in SCENE_CANDIDATES if os.path.isdir(p)), None)
    if scene_root is None:
        scene_root = os.path.join(REPO, "logs", "numerics_fixture", "scene")
        if not os.path.isdir(scene_root):
            from train_regression_r04 import synthesize_dataset

            synthesize_dataset(scene_root)
    from gaussian_splatting_with_eye_tracking_tpu.scene import Scene

    cfg = ModelConfig(source_path=scene_root,
                      model_path="/tmp/numerics_fixture_model", eval=True)
    scene = Scene(cfg, OptimizationConfig(), seed=0)
    cams = scene.get_train_cameras()
    # replay the deterministic camera order to iteration 3177
    rng = np.random.default_rng(0)
    stack = []
    for _ in range(1, 3178):
        if not stack:
            stack = list(rng.permutation(len(cams)))
        idx = stack.pop()
    state, it = ckpt.load_checkpoint(CKPT)
    assert it == 3176
    return state, cams[idx], scene


def _impl():
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


class TestSSIMPrecision:
    def test_ssim_map_bounded_on_collapse_frame(self, collapse_fixture):
        """|SSIM| <= 1 by construction; at default MXU precision the r4 map
        hit -1007.8 and +/-inf on exactly this (render, gt) pair."""
        state, cam, scene = collapse_fixture
        out = renderer.render(
            cam.params(), state, jnp.zeros(3),
            max_sh_degree=scene.max_sh_degree, impl=_impl(),
            max_instances=1 << 19, max_live=1 << 19)
        m = np.asarray(ssim_ops.ssim_map(
            jnp.clip(out.color, 0.0, 1.0)[None], cam.gt()[None]))
        assert np.isfinite(m).all()
        assert np.abs(m).max() <= 1.0 + 1e-3, np.abs(m).max()

    def test_ssim_matches_highest_precision(self, collapse_fixture):
        state, cam, scene = collapse_fixture
        out = renderer.render(
            cam.params(), state, jnp.zeros(3),
            max_sh_degree=scene.max_sh_degree, impl=_impl(),
            max_instances=1 << 19, max_live=1 << 19)
        img = jnp.clip(out.color, 0.0, 1.0)
        v = float(ssim_ops.ssim(img, cam.gt()))
        with jax.default_matmul_precision("highest"):
            v_ref = float(ssim_ops.ssim(img, cam.gt()))
        assert abs(v - v_ref) < 1e-3, (v, v_ref)

    def test_ssim_dark_flat_frames(self):
        """Dark/flat regions are where the variance cancellation dies:
        tiny sigma, denominator ~ C2 = 9e-4."""
        key = jax.random.PRNGKey(0)
        img = 0.02 + 1e-3 * jax.random.uniform(key, (1, 3, 256, 256))
        gt = jnp.zeros((1, 3, 256, 256)) + 0.019
        m = np.asarray(ssim_ops.ssim_map(img, gt))
        assert np.isfinite(m).all()
        assert np.abs(m).max() <= 1.0 + 1e-3, np.abs(m).max()


class TestCollapseStep:
    def test_step_3177_is_healthy(self, collapse_fixture):
        """The exact r4 killer step: finite loss, finite params after the
        Adam update, instances alive."""
        state, cam, scene = collapse_fixture
        step = train_lib.make_train_step(
            scene.tx, OptimizationConfig(), max_sh_degree=scene.max_sh_degree,
            width=cam.width, height=cam.height, impl=_impl(),
            max_instances=1 << 19, max_live=1 << 19)
        new_state, aux = step(state, *train_lib.camera_arrays(cam.params()),
                              cam.gt(), jnp.zeros(3), True)
        assert np.isfinite(float(aux.loss)), float(aux.loss)
        assert int(aux.num_instances) > 0
        for f in new_state.params._fields:
            a = np.asarray(getattr(new_state.params, f))
            assert np.isfinite(a[np.asarray(new_state.active)]).all(), f

    def test_mini_schedule_across_reset_and_prune(self, collapse_fixture):
        """Drive the pallas path through the full r4 collapse window shape:
        opacity reset -> recovery steps -> screen-size prune -> more steps.
        Every loss must stay finite and the model must stay alive."""
        state, cam, scene = collapse_fixture
        opt = OptimizationConfig()
        cams = scene.get_train_cameras()
        step = train_lib.make_train_step(
            scene.tx, opt, max_sh_degree=scene.max_sh_degree,
            width=cam.width, height=cam.height, impl=_impl(),
            max_instances=1 << 19, max_live=1 << 19)
        bg = jnp.zeros(3)
        key = jax.random.PRNGKey(7)

        state = gm.reset_opacity(state)
        losses = []
        for i in range(30):
            c = cams[i % len(cams)]
            state, aux = step(state, *train_lib.camera_arrays(c.params()),
                              c.gt(), bg, True)
            losses.append(float(aux.loss))
            if i == 14:  # screen-size prune mid-window (reference max 20px)
                key, sub = jax.random.split(key)
                state, _ = train_lib.densify_step(
                    state, sub, opt, scene.cameras_extent, 20.0)
        assert np.isfinite(losses).all(), losses
        assert int(gm.num_active(state)) > 0
        for f in state.params._fields:
            a = np.asarray(getattr(state.params, f))
            assert np.isfinite(a[np.asarray(state.active)]).all(), f


@pytest.mark.tpu_only
class TestGradParityHardware:
    """pallas-vs-jnp gradient parity at the r4 collapse distributions:
    post-reset opacity (0.01) and near-degenerate scales (5e-7), evaluated
    on the REAL chip (VERDICT r4 next-round #5)."""

    @pytest.mark.parametrize("opacity,scale", [
        (0.01, None),        # post-reset opacity, normal scales
        (0.5, 5e-7),         # near-degenerate scales
        (0.01, 5e-7),        # both at once
    ])
    def test_parity(self, opacity, scale):
        from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast

        means, scales, quats, op, sh = make_random_gaussians(
            512, seed=11, sh_degree=1)
        op = jnp.full_like(op, opacity)
        if scale is not None:
            scales = jnp.full_like(scales, scale)
        cam = make_camera(128, 128)
        bg = jnp.zeros(3)
        gt = jax.random.uniform(jax.random.PRNGKey(3), (3, 128, 128))

        def loss(impl, m, s, o):
            out = rast.rasterize(m, s, quats, o, sh, cam, bg, sh_degree=1,
                                 impl=impl, max_instances=1 << 16,
                                 max_live=1 << 16)
            return jnp.mean(jnp.abs(out.color - gt))

        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(
            means, scales, op)
        gj = jax.grad(lambda *a: loss("jnp", *a), argnums=(0, 1, 2))(
            means, scales, op)
        # The pallas kernel carries positions/conics as split-bf16 limbs, so
        # elementwise parity degrades where per-pixel terms cancel (measured
        # relL2 up to 7% on dL/dmeans at opacity 0.01, cos >= 0.997). The r4
        # failure class this guards against is inf/NaN/sign corruption —
        # assert direction + magnitude, not ULPs.
        for a, b, name in zip(gp, gj, ("means", "scales", "opacity")):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            assert np.isfinite(a).all(), name
            nb = np.linalg.norm(b) + 1e-30
            rel_l2 = np.linalg.norm(a - b) / nb
            cos = float(a @ b) / (np.linalg.norm(a) * nb + 1e-30)
            assert rel_l2 < 0.15, (name, rel_l2)
            assert cos > 0.99, (name, cos)


@pytest.mark.tpu_only
class TestSegsumKernelHardware:
    """ops/segsum.py range-test MXU segment sums vs a float64 oracle, on
    the real chip (the interpret path is a shortcut; only hardware runs
    the kernel)."""

    @pytest.mark.parametrize("s,n,seed", [
        (1 << 14, 300, 0),
        (200_000, 5_000, 1),
        (1 << 14, 1, 2),       # one giant segment spanning many chunks
    ])
    def test_matches_oracle(self, s, n, seed):
        from gaussian_splatting_with_eye_tracking_tpu.ops import segsum

        rng = np.random.default_rng(seed)
        table = jnp.asarray(rng.standard_normal((16, s)), jnp.float32)
        cuts = np.sort(rng.integers(0, s + 1, n - 1)) if n > 1 else np.array([], np.int64)
        bounds = jnp.asarray(np.concatenate([[0], cuts, [s]]), jnp.int32)
        out = np.asarray(segsum.segment_sum_bounds(table, bounds))
        t64 = np.asarray(table, np.float64)
        csum = np.concatenate([np.zeros((16, 1)), np.cumsum(t64, axis=1)], axis=1)
        bb = np.asarray(bounds)
        want = csum[:, bb[1:]] - csum[:, bb[:-1]]
        scale = np.abs(t64).sum(axis=1, keepdims=True) + 1e-12
        np.testing.assert_allclose(out, want, atol=1e-5 * scale.max(), rtol=1e-5)

    def test_grad_reduce_parity_between_modes(self):
        """Full rasterize grads with TUNE['segreduce'] = cumsum vs segsum
        must agree to f32 summation accuracy."""
        from gaussian_splatting_with_eye_tracking_tpu.ops import (
            pallas_blend, rasterize as rast)

        means, scales, quats, op, sh = make_random_gaussians(
            1500, seed=9, sh_degree=1)
        cam = make_camera(128, 128)
        bg = jnp.zeros(3)
        gt = jax.random.uniform(jax.random.PRNGKey(5), (3, 128, 128))

        def grads():
            jax.clear_caches()  # TUNE is read at trace time

            def loss(m, s, o):
                out = rast.rasterize(m, s, quats, o, sh, cam, bg, sh_degree=1,
                                     impl="pallas", max_instances=1 << 16,
                                     max_live=1 << 16)
                return jnp.mean(jnp.abs(out.color - gt))
            return jax.grad(loss, argnums=(0, 1, 2))(means, scales, op)

        old = pallas_blend.TUNE["segreduce"]
        try:
            pallas_blend.TUNE["segreduce"] = "cumsum"
            g_c = [np.asarray(g) for g in grads()]
            pallas_blend.TUNE["segreduce"] = "segsum"
            g_s = [np.asarray(g) for g in grads()]
        finally:
            pallas_blend.TUNE["segreduce"] = old
        for a, b, name in zip(g_s, g_c, ("means", "scales", "op")):
            # atol floor: the two modes sum each segment in different orders
            # (blocked cumsum + boundary difference vs direct range-test
            # window sums), so near-cancelling segments legitimately differ
            # by a few f32 ulps of the SUMMAND magnitude, not of the result
            # (observed: 3.3e-7 abs on ~1e-6 results at max|grad| 1.7e-2).
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, atol=1e-4 * scale, rtol=1e-4,
                                       err_msg=name)
