"""Perceptual metrics: LPIPS in pure JAX (reference lpipsPyTorch/).

The reference evaluates LPIPS with torchvision-pretrained backbones
(lpipsPyTorch/modules/networks.py). This implementation reproduces the
LPIPS(VGG16) computation in JAX: ImageNet-normalized inputs, VGG16 features
at relu1_2/2_2/3_3/4_3/5_3, channel-unit-normalization, linear heads,
spatial mean, layer sum.

Pretrained weights cannot be downloaded in this environment (zero egress):
pass ``weights_path`` pointing at either a torch state_dict (.pth with keys
``features.N.weight`` + ``lin.N.model.1.weight``) or an .npz export of the
same. Without weights, ``lpips_available() == False`` and callers (metrics
CLI) skip the metric with a notice — SSIM/PSNR are unaffected.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: torchvision features module indices of each conv,
# with slice points after relu1_2(4), relu2_2(9), relu3_3(16), relu4_3(23), relu5_3(30)
_VGG16_CONVS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_SLICE_AFTER_RELU = {4: 0, 9: 1, 16: 2, 23: 3, 30: 4}
_POOL_BEFORE = {5, 10, 17, 24}
_CHANNELS = [64, 128, 256, 512, 512]

_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)  # lpips 'shift'
_STD = np.array([0.458, 0.448, 0.450], np.float32)  # lpips 'scale'


class LPIPSWeights:
    def __init__(self, convs: List[np.ndarray], conv_biases: List[np.ndarray],
                 lins: List[np.ndarray]):
        self.convs = convs
        self.conv_biases = conv_biases
        self.lins = lins


_CACHED: Dict[str, Optional[LPIPSWeights]] = {}


def load_weights(weights_path: str) -> LPIPSWeights:
    if weights_path.endswith(".npz"):
        z = np.load(weights_path)
        convs = [z[f"conv_{i}_w"] for i in range(13)]
        biases = [z[f"conv_{i}_b"] for i in range(13)]
        lins = [z[f"lin_{i}"] for i in range(5)]
        return LPIPSWeights(convs, biases, lins)
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    convs, biases = [], []
    for idx in _VGG16_CONVS:
        convs.append(sd[f"features.{idx}.weight"].numpy())
        biases.append(sd[f"features.{idx}.bias"].numpy())
    lins = [sd[f"lin.{i}.model.1.weight"].numpy()[0, :, 0, 0] for i in range(5)]
    return LPIPSWeights(convs, biases, lins)


def _get_weights(weights_path: Optional[str]) -> Optional[LPIPSWeights]:
    path = weights_path or os.environ.get("LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    if path not in _CACHED:
        _CACHED[path] = load_weights(path)
    return _CACHED[path]


def lpips_available(weights_path: Optional[str] = None) -> bool:
    return _get_weights(weights_path) is not None


def _vgg_features(x: jnp.ndarray, w: LPIPSWeights) -> List[jnp.ndarray]:
    """x: (N, 3, H, W) normalized. Returns 5 feature maps."""
    feats = []
    conv_i = 0
    h = x
    for idx in range(31):
        if idx in _POOL_BEFORE:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
        if conv_i < 13 and idx == _VGG16_CONVS[conv_i]:
            k = jnp.asarray(w.convs[conv_i])
            b = jnp.asarray(w.conv_biases[conv_i])
            h = jax.lax.conv_general_dilated(
                h, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b[None, :, None, None]
            conv_i += 1
        if idx in (1, 3, 6, 8, 11, 13, 15, 18, 20, 22, 25, 27, 29) or idx in _SLICE_AFTER_RELU:
            h = jax.nn.relu(h) if idx not in _SLICE_AFTER_RELU else h
        if idx in _SLICE_AFTER_RELU:
            h = jax.nn.relu(h)
            feats.append(h)
    return feats


def lpips(x: jnp.ndarray, y: jnp.ndarray, weights_path: Optional[str] = None) -> jnp.ndarray:
    """LPIPS(VGG) distance between (3,H,W) or (N,3,H,W) images in [0,1]."""
    w = _get_weights(weights_path)
    if w is None:
        raise RuntimeError(
            "LPIPS weights unavailable: set LPIPS_WEIGHTS to a VGG16+lin "
            "state_dict (.pth) or .npz export."
        )
    if x.ndim == 3:
        x, y = x[None], y[None]
    mean = jnp.asarray(_MEAN)[None, :, None, None]
    std = jnp.asarray(_STD)[None, :, None, None]

    def norm_input(t):
        return (t * 2.0 - 1.0 - mean) / std

    fx = _vgg_features(norm_input(x), w)
    fy = _vgg_features(norm_input(y), w)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = jnp.asarray(w.lins[i])[None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total
