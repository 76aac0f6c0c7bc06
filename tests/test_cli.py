"""End-to-end CLI pipeline: train -> render -> metrics on a tiny synthetic
COLMAP scene (the reference's full_eval.py protocol at test scale)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_scene_io import make_colmap_scene


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    root = make_colmap_scene(str(tmp_path_factory.mktemp("scene")), n_cams=8, n_pts=200)
    model_path = str(tmp_path_factory.mktemp("model"))
    import train as train_cli

    train_cli.main([
        "-s", root, "-m", model_path, "--iterations", "30",
        "--test_iterations", "20", "--save_iterations", "30",
        "--checkpoint_iterations", "30",
        "--eval", "--disable_viewer", "--quiet",
        "--densify_from_iter", "10", "--densification_interval", "10",
    ])
    return root, model_path


class TestTrainCLI:
    def test_outputs_exist(self, trained_model):
        root, model_path = trained_model
        assert os.path.exists(os.path.join(model_path, "cfg_args"))
        assert os.path.exists(os.path.join(model_path, "cameras.json"))
        assert os.path.exists(
            os.path.join(model_path, "point_cloud", "iteration_30", "point_cloud.ply")
        )
        assert os.path.exists(os.path.join(model_path, "chkpnt30.ckpt"))

    def test_checkpoint_resume(self, trained_model):
        root, model_path = trained_model
        from gaussian_splatting_with_eye_tracking_tpu.models import checkpoint as ckpt

        state, it = ckpt.load_checkpoint(os.path.join(model_path, "chkpnt30.ckpt"))
        assert it == 30
        assert np.isfinite(np.asarray(state.params.xyz)).all()

    def test_checkpoint_orbax_roundtrip(self, trained_model, tmp_path):
        """Orbax dir round-trips the FULL state pytree (params + optax
        opt_state + stats) bit-exactly, including NamedTuple structure."""
        root, model_path = trained_model
        import jax
        from gaussian_splatting_with_eye_tracking_tpu.models import checkpoint as ckpt

        state, it = ckpt.load_checkpoint(os.path.join(model_path, "chkpnt30.ckpt"))
        opath = os.path.join(str(tmp_path), "orbax_ckpt")
        ckpt.save_checkpoint_orbax(opath, state, it)
        state2, it2 = ckpt.load_checkpoint_orbax(opath)
        assert it2 == it
        assert jax.tree.structure(state2) == jax.tree.structure(state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_orbax_async(self, trained_model, tmp_path):
        root, model_path = trained_model
        from gaussian_splatting_with_eye_tracking_tpu.models import checkpoint as ckpt

        state, it = ckpt.load_checkpoint(os.path.join(model_path, "chkpnt30.ckpt"))
        opath = os.path.join(str(tmp_path), "orbax_async")
        ckpt.save_checkpoint_orbax(opath, state, it, async_save=True)
        ckpt.wait_for_async_saves()
        state2, it2 = ckpt.load_checkpoint_orbax(opath)
        assert it2 == it
        np.testing.assert_array_equal(
            np.asarray(state.params.xyz), np.asarray(state2.params.xyz))

    def test_render_cli(self, trained_model):
        root, model_path = trained_model
        import render as render_cli

        render_cli.main(["-m", model_path, "--quiet", "--iteration", "30"])
        renders = os.path.join(model_path, "test", "ours_30", "renders")
        gts = os.path.join(model_path, "test", "ours_30", "gt")
        assert len(os.listdir(renders)) == 1  # 8 cams, every 8th is test
        assert len(os.listdir(gts)) == 1
        from PIL import Image

        im = Image.open(os.path.join(renders, "00000.png"))
        assert im.size == (64, 48)

    def test_metrics_cli(self, trained_model):
        root, model_path = trained_model
        import metrics as metrics_cli

        results = metrics_cli.evaluate([model_path], use_lpips=False)
        r = results[model_path]["ours_30"]
        assert 0 <= r["SSIM"] <= 1
        assert r["PSNR"] > 5
        assert os.path.exists(os.path.join(model_path, "results.json"))
        with open(os.path.join(model_path, "per_view.json")) as f:
            pv = json.load(f)
        assert "00000.png" in pv["ours_30"]["PSNR"]


class TestAdaptiveCapacity:
    def test_overflow_grows_and_redoes(self, tmp_path):
        """Start with a deliberately tiny instance capacity: the first step
        overflows, training must grow the capacity bucket and redo the step
        (no truncated-gradient updates), and finish with finite params."""
        root = make_colmap_scene(str(tmp_path / "scene"), n_cams=4, n_pts=150)
        model_path = str(tmp_path / "model")
        import train as train_cli
        from gaussian_splatting_with_eye_tracking_tpu.config import (
            ModelConfig, OptimizationConfig, PipelineConfig,
        )

        cfg = ModelConfig(source_path=root, model_path=model_path)
        opt = OptimizationConfig(iterations=6, densify_from_iter=100)
        train_cli.training(
            cfg, opt, PipelineConfig(), testing_iterations=[],
            saving_iterations=[6], checkpoint_iterations=[], start_checkpoint=None,
            quiet=True, instance_capacity=64, capacity_bucket=64,
        )
        import numpy as np
        from gaussian_splatting_with_eye_tracking_tpu.models import ply_io

        ply = os.path.join(model_path, "point_cloud", "iteration_6", "point_cloud.ply")
        assert os.path.exists(ply)
        params, _ = ply_io.load_gaussians_ply(ply)
        assert np.isfinite(params.xyz).all()
