"""RITnet training: losses + step + metrics (reference RITnet/train.py:94-167
and RITnet/utils.py:35-111).

Loss = CE(boundary-weighted) + alpha * GeneralizedDice + (1-alpha) * Surface,
with alpha annealed 1 -> 0 over the first 125 epochs
(reference train.py:108-116). Optimizer: Adam 1e-3. Metric: mean IoU.

The distance-map targets for the surface loss and the boundary weight maps
are precomputed on host (scipy), as in the reference dataset pipeline
(RITnet/dataset.py:35-212).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaussian_splatting_with_eye_tracking_tpu.models import ritnet

NUM_CLASSES = ritnet.NUM_CLASSES


def boundary_weight_map(label: np.ndarray, sigma: float = 5.0) -> np.ndarray:
    """Pixels near class boundaries get extra CE weight (reference
    utils.py CrossEntropyLoss2d usage with edge weights)."""
    from scipy import ndimage

    edges = np.zeros_like(label, bool)
    for c in range(NUM_CLASSES):
        m = label == c
        er = ndimage.binary_erosion(m)
        edges |= m & ~er
    dist = ndimage.distance_transform_edt(~edges)
    return (1.0 + 10.0 * np.exp(-(dist**2) / (2 * sigma**2))).astype(np.float32)


def distance_maps(label: np.ndarray) -> np.ndarray:
    """Signed distance map per class for the surface loss (reference
    dataset.py one_hot2dist)."""
    from scipy import ndimage

    out = np.zeros((NUM_CLASSES,) + label.shape, np.float32)
    for c in range(NUM_CLASSES):
        m = label == c
        if m.any():
            pos = ndimage.distance_transform_edt(m)
            neg = ndimage.distance_transform_edt(~m)
            out[c] = neg * (~m) - (pos - 1) * m
    return out


def cross_entropy_weighted(logits, label, weight_map):
    """Boundary-weighted CE (reference utils.py:35-50)."""
    logp = jax.nn.log_softmax(logits, axis=1)  # (N, C, H, W)
    nll = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
    return jnp.mean(nll * weight_map)


def generalized_dice_loss(logits, label):
    """(reference utils.py GeneralizedDiceLoss :53-80): class weights =
    1 / (sum of targets)^2, softmax probabilities."""
    probs = jax.nn.softmax(logits, axis=1)
    onehot = jax.nn.one_hot(label, NUM_CLASSES, axis=1)
    dims = (0, 2, 3)
    w = 1.0 / (jnp.sum(onehot, axis=dims) ** 2 + 1e-10)
    inter = jnp.sum(w * jnp.sum(probs * onehot, axis=dims))
    denom = jnp.sum(w * jnp.sum(probs + onehot, axis=dims))
    return 1.0 - 2.0 * inter / (denom + 1e-10)


def surface_loss(logits, dist_map):
    """(reference utils.py SurfaceLoss :83-95): mean of probs * distance."""
    probs = jax.nn.softmax(logits, axis=1)
    return jnp.mean(probs * dist_map)


def total_loss(logits, label, weight_map, dist_map, alpha):
    ce = cross_entropy_weighted(logits, label, weight_map)
    dice = generalized_dice_loss(logits, label)
    surf = surface_loss(logits, dist_map)
    return ce + alpha * dice + (1.0 - alpha) * surf


def alpha_schedule(epoch: int, period: int = 125) -> float:
    """1 -> 0 linear anneal over `period` epochs (reference train.py:108)."""
    return max(0.0, 1.0 - epoch / period)


def miou(pred, label, num_classes: int = NUM_CLASSES):
    """Mean intersection-over-union (reference utils.py mIoU / train.py eval)."""
    ious = []
    for c in range(num_classes):
        p = pred == c
        t = label == c
        inter = jnp.sum(p & t)
        union = jnp.sum(p | t)
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), jnp.nan))
    return jnp.nanmean(jnp.stack(ious))


def make_train_step(lr: float = 1e-3):
    tx = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, batch, alpha):
        imgs, labels, wmaps, dmaps = batch

        def loss_fn(p):
            logits = ritnet.densenet2d_apply(p, imgs)
            return total_loss(logits, labels, wmaps, dmaps, alpha)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step
