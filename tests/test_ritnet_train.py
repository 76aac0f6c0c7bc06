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
