"""RITnet DenseNet2D: shape contract, weight import from the reference
checkpoint (when present), torch cross-validation of the forward pass,
preprocessing, gaze extraction."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.models import ritnet

REF_WEIGHTS = "/root/reference/RITnet/best_model.pkl"


class TestForward:
    def test_output_shape(self):
        params = ritnet.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 1, 64, 96))
        out = ritnet.densenet2d_apply(params, x)
        assert out.shape == (1, 4, 64, 96)

    def test_against_torch_reimplementation(self):
        """Cross-check the JAX forward vs an independent torch compose of the
        same operations, using our randomly initialized weights."""
        import torch
        import torch.nn.functional as F

        params = ritnet.init_params(jax.random.PRNGKey(1))
        tp = {k: torch.tensor(np.asarray(v)) for k, v in params.items()}
        x_np = np.random.default_rng(0).normal(size=(1, 1, 32, 32)).astype(np.float32)

        def conv(x, name, pad):
            return F.conv2d(x, tp[f"{name}.weight"], tp[f"{name}.bias"], padding=pad)

        def lrelu(x):
            return F.leaky_relu(x, 0.01)

        def bn(x, name):
            return F.batch_norm(
                x, tp[f"{name}.running_mean"], tp[f"{name}.running_var"],
                tp[f"{name}.weight"], tp[f"{name}.bias"], training=False, eps=1e-5,
            )

        def down(x, name, pool):
            if pool:
                x = F.avg_pool2d(x, 2)
            x1 = lrelu(conv(x, f"{name}.conv1", 1))
            x21 = torch.cat([x, x1], 1)
            x22 = lrelu(conv(conv(x21, f"{name}.conv21", 0), f"{name}.conv22", 1))
            x31 = torch.cat([x21, x22], 1)
            out = lrelu(conv(conv(x31, f"{name}.conv31", 0), f"{name}.conv32", 1))
            return bn(out, f"{name}.bn")

        def up(skip, x, name):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = torch.cat([x, skip], 1)
            x1 = lrelu(conv(conv(x, f"{name}.conv11", 0), f"{name}.conv12", 1))
            x21 = torch.cat([x, x1], 1)
            return lrelu(conv(conv(x21, f"{name}.conv21", 0), f"{name}.conv22", 1))

        tx = torch.tensor(x_np)
        t1 = down(tx, "down_block1", False)
        t2 = down(t1, "down_block2", True)
        t3 = down(t2, "down_block3", True)
        t4 = down(t3, "down_block4", True)
        t5 = down(t4, "down_block5", True)
        t6 = up(t4, t5, "up_block1")
        t7 = up(t3, t6, "up_block2")
        t8 = up(t2, t7, "up_block3")
        t9 = up(t1, t8, "up_block4")
        want = conv(t9, "out_conv1", 0).detach().numpy()

        got = np.asarray(ritnet.densenet2d_apply(params, jnp.asarray(x_np)))
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)


@pytest.mark.skipif(not os.path.exists(REF_WEIGHTS), reason="no reference weights")
class TestPretrainedWeights:
    def test_import_and_segment(self):
        params = ritnet.import_torch_state_dict(REF_WEIGHTS)
        assert "down_block1.conv1.weight" in params
        assert params["out_conv1.weight"].shape[0] == 4
        # run on the reference eye image and compare against its saved label
        from PIL import Image

        eye = np.asarray(Image.open("/root/reference/eye.png").convert("L"))
        # crop/pad to multiple of 16 like the model requires
        h = eye.shape[0] - eye.shape[0] % 16
        w = eye.shape[1] - eye.shape[1] % 16
        eye = eye[:h, :w]
        x = ritnet.preprocess_eye_image(eye)
        logits = ritnet.densenet2d_apply(params, x)
        pred = np.asarray(ritnet.get_predictions(logits))[0]
        assert set(np.unique(pred)) <= {0, 1, 2, 3}
        # a sensible eye segmentation has a nonempty pupil near the center
        assert (pred == 3).sum() > 20
        gaze = ritnet.pupil_centroid(pred)
        assert 0 <= gaze[0] < w and 0 <= gaze[1] < h


class TestVendoredWeights:
    def test_load_pretrained_default(self):
        # the vendored .npz makes the eye-tracking demo self-contained
        assert os.path.exists(ritnet.VENDORED_WEIGHTS)
        params = ritnet.load_pretrained()
        assert "down_block1.conv1.weight" in params
        assert params["out_conv1.weight"].shape[0] == 4

    @pytest.mark.skipif(not os.path.exists(REF_WEIGHTS), reason="no reference weights")
    def test_matches_torch_import(self):
        vend = ritnet.load_pretrained()
        ref = ritnet.import_torch_state_dict(REF_WEIGHTS)
        assert set(vend) == set(ref)
        for k in vend:
            np.testing.assert_array_equal(np.asarray(vend[k]), np.asarray(ref[k]))


class TestPreprocess:
    def test_gamma_and_clahe_shapes(self):
        img = np.random.default_rng(0).integers(0, 255, (64, 80), np.uint8)
        out = ritnet.preprocess_eye_image(img)
        assert out.shape == (1, 1, 64, 80)
        assert float(jnp.abs(out).max()) <= 1.0 + 1e-5

    def test_clahe_improves_contrast(self):
        rng = np.random.default_rng(1)
        img = (rng.normal(128, 5, (64, 64))).clip(0, 255).astype(np.uint8)
        out = ritnet.clahe(img)
        assert out.std() > img.std()

    def test_pupil_centroid_empty(self):
        pred = np.zeros((32, 32), np.int32)
        g = ritnet.pupil_centroid(pred)
        np.testing.assert_allclose(g, [16, 16])
