"""RITnet training losses + a few optimization steps on a toy segmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.models import ritnet, ritnet_train


def toy_batch(seed=0, h=32, w=32):
    rng = np.random.default_rng(seed)
    label = np.zeros((h, w), np.int32)
    label[8:24, 8:24] = 2
    label[12:20, 12:20] = 3
    label[4:8, :] = 1
    img = (label / 3.0 + rng.normal(scale=0.1, size=(h, w))).astype(np.float32)
    wmap = ritnet_train.boundary_weight_map(label)
    dmap = ritnet_train.distance_maps(label)
    return (
        jnp.asarray(img)[None, None],
        jnp.asarray(label)[None],
        jnp.asarray(wmap)[None],
        jnp.asarray(dmap)[None],
    )


class TestLosses:
    def test_perfect_prediction_low_loss(self):
        imgs, labels, wmaps, dmaps = toy_batch()
        logits = jax.nn.one_hot(labels, 4, axis=1) * 50.0
        ce = float(ritnet_train.cross_entropy_weighted(logits, labels, wmaps))
        dice = float(ritnet_train.generalized_dice_loss(logits, labels))
        assert ce < 1e-3 and dice < 1e-3

    def test_wrong_prediction_high_loss(self):
        imgs, labels, wmaps, dmaps = toy_batch()
        wrong = jax.nn.one_hot((labels + 1) % 4, 4, axis=1) * 50.0
        right = jax.nn.one_hot(labels, 4, axis=1) * 50.0
        assert float(ritnet_train.generalized_dice_loss(wrong, labels)) > 0.9
        assert float(
            ritnet_train.cross_entropy_weighted(wrong, labels, wmaps)
        ) > float(ritnet_train.cross_entropy_weighted(right, labels, wmaps))

    def test_surface_loss_penalizes_far_errors(self):
        imgs, labels, wmaps, dmaps = toy_batch()
        right = jax.nn.one_hot(labels, 4, axis=1) * 50.0
        wrong = jax.nn.one_hot((labels + 2) % 4, 4, axis=1) * 50.0
        assert float(ritnet_train.surface_loss(wrong, dmaps)) > float(
            ritnet_train.surface_loss(right, dmaps)
        )

    def test_alpha_schedule(self):
        assert ritnet_train.alpha_schedule(0) == 1.0
        assert ritnet_train.alpha_schedule(125) == 0.0
        assert 0 < ritnet_train.alpha_schedule(60) < 1

    def test_miou(self):
        label = jnp.zeros((8, 8), jnp.int32).at[:4].set(1)
        assert float(ritnet_train.miou(label, label)) == pytest.approx(1.0)
        assert float(ritnet_train.miou(1 - label, label)) < 0.5


class TestTrainLoop:
    def test_loss_decreases(self):
        batch = toy_batch()
        params = ritnet.init_params(jax.random.PRNGKey(0))
        tx, step = ritnet_train.make_train_step(lr=1e-3)
        opt_state = tx.init(params)
        losses = []
        for i in range(12):
            params, opt_state, loss = step(params, opt_state, batch, 1.0)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestDatasetPipeline:
    def test_end_to_end_tiny_dataset(self, tmp_path):
        """Build a 4-image OpenEDS-style dataset, run one CLI epoch."""
        import sys
        from PIL import Image

        rng = np.random.default_rng(0)
        for split in ("train", "validation"):
            (tmp_path / split / "images").mkdir(parents=True)
            (tmp_path / split / "labels").mkdir(parents=True)
            for i in range(4 if split == "train" else 2):
                img = rng.integers(0, 255, (48, 64), np.uint8)
                label = np.zeros((48, 64), np.int64)
                label[10:30, 20:40] = 2
                label[15:25, 25:35] = 3
                Image.fromarray(img).save(tmp_path / split / "images" / f"e{i}.png")
                np.save(tmp_path / split / "labels" / f"e{i}.npy", label)

        sys.path.insert(0, "/root/repo")
        import train_ritnet

        train_ritnet.main([
            "--dataset", str(tmp_path), "--bs", "2", "--epochs", "1",
            "--expname", "testrun",
        ])
        import os
        assert os.path.exists("logs/testrun/best_model.npz")
        params = train_ritnet.load_params_npz("logs/testrun/best_model.npz")
        out = ritnet.densenet2d_apply(params, jnp.zeros((1, 1, 48, 64)))
        assert out.shape == (1, 4, 48, 64)

    def test_augmentations_preserve_shapes(self):
        rng = np.random.default_rng(1)
        from gaussian_splatting_with_eye_tracking_tpu.models import ritnet_data

        img = rng.integers(0, 255, (48, 64), np.uint8)
        label = rng.integers(0, 4, (48, 64)).astype(np.int32)
        for seed in range(10):
            a, b = ritnet_data.augment(img, label, np.random.default_rng(seed))
            assert a.shape == img.shape and b.shape == label.shape
