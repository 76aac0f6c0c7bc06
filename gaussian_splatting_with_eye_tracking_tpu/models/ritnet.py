"""RITnet eye-segmentation network (DenseNet2D) in pure JAX.

Capability parity with the reference's vendored RITnet
(RITnet/densenet.py:17-143): a DenseUNet with 5 down blocks (avg-pool 2x2)
and 4 up blocks (nearest-neighbor x2 upsampling + skip concat), 32 channels,
4 output classes (background / sclera / iris / pupil), LeakyReLU, per-block
BatchNorm on the down path. ~0.25M parameters.

Weights import directly from the reference's shipped torch checkpoint
(``RITnet/best_model.pkl``) via ``import_torch_state_dict`` — inference-mode
BatchNorm folds the running statistics. The preprocessing pipeline
(grayscale, gamma 0.8 LUT, CLAHE 1.5/(8,8), normalize) mirrors
track_render.py:70-84 / RITnet/dataset.py:98-112.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

LEAK = 0.01  # torch LeakyReLU default
CHANNELS = 32
NUM_CLASSES = 4


def _conv(x, w, b, pad):
    """NCHW conv with OIHW weights."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _lrelu(x):
    return jnp.where(x >= 0, x, LEAK * x)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) / 4.0


def _upsample2(x):
    n, c, h, w = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def _bn(x, p, prefix):
    mean = p[f"{prefix}.running_mean"]
    var = p[f"{prefix}.running_var"]
    gamma = p[f"{prefix}.weight"]
    beta = p[f"{prefix}.bias"]
    inv = gamma / jnp.sqrt(var + 1e-5)
    return x * inv[None, :, None, None] + (beta - mean * inv)[None, :, None, None]


def _down_block(x, p, name, pool):
    if pool:
        x = _avg_pool2(x)
    x1 = _lrelu(_conv(x, p[f"{name}.conv1.weight"], p[f"{name}.conv1.bias"], 1))
    x21 = jnp.concatenate([x, x1], axis=1)
    x22 = _lrelu(_conv(
        _conv(x21, p[f"{name}.conv21.weight"], p[f"{name}.conv21.bias"], 0),
        p[f"{name}.conv22.weight"], p[f"{name}.conv22.bias"], 1,
    ))
    x31 = jnp.concatenate([x21, x22], axis=1)
    out = _lrelu(_conv(
        _conv(x31, p[f"{name}.conv31.weight"], p[f"{name}.conv31.bias"], 0),
        p[f"{name}.conv32.weight"], p[f"{name}.conv32.bias"], 1,
    ))
    return _bn(out, p, f"{name}.bn")


def _up_block(skip, x, p, name):
    x = _upsample2(x)
    x = jnp.concatenate([x, skip], axis=1)
    x1 = _lrelu(_conv(
        _conv(x, p[f"{name}.conv11.weight"], p[f"{name}.conv11.bias"], 0),
        p[f"{name}.conv12.weight"], p[f"{name}.conv12.bias"], 1,
    ))
    x21 = jnp.concatenate([x, x1], axis=1)
    return _lrelu(_conv(
        _conv(x21, p[f"{name}.conv21.weight"], p[f"{name}.conv21.bias"], 0),
        p[f"{name}.conv22.weight"], p[f"{name}.conv22.bias"], 1,
    ))


def densenet2d_apply(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass. x: (N, 1, H, W) normalized grayscale; H, W divisible by
    16. Returns (N, 4, H, W) class logits."""
    x1 = _down_block(x, params, "down_block1", pool=False)
    x2 = _down_block(x1, params, "down_block2", pool=True)
    x3 = _down_block(x2, params, "down_block3", pool=True)
    x4 = _down_block(x3, params, "down_block4", pool=True)
    x5 = _down_block(x4, params, "down_block5", pool=True)
    x6 = _up_block(x4, x5, params, "up_block1")
    x7 = _up_block(x3, x6, params, "up_block2")
    x8 = _up_block(x2, x7, params, "up_block3")
    x9 = _up_block(x1, x8, params, "up_block4")
    return _conv(x9, params["out_conv1.weight"], params["out_conv1.bias"], 0)


def get_predictions(logits: jnp.ndarray) -> jnp.ndarray:
    """argmax class map (reference RITnet/utils.py:186-190)."""
    return jnp.argmax(logits, axis=1)


VENDORED_WEIGHTS = __file__.rsplit("/", 1)[0] + "/weights/ritnet_best.npz"


def load_pretrained(path: str | None = None) -> Dict[str, jnp.ndarray]:
    """Load RITnet weights. With no path, loads the vendored conversion of
    the reference's shipped checkpoint (RITnet/best_model.pkl — the reference
    ships weights in-repo, SURVEY.md §2.3) from ``weights/ritnet_best.npz``;
    an explicit ``.pkl`` path falls through to the torch importer."""
    if path is None:
        path = VENDORED_WEIGHTS
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: jnp.asarray(z[k]) for k in z.files}
    return import_torch_state_dict(path)


def import_torch_state_dict(path: str) -> Dict[str, jnp.ndarray]:
    """Load the reference's shipped checkpoint (torch pickle of a
    state_dict) into a plain dict of arrays."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = jnp.asarray(np.asarray(v.detach().cpu().numpy(), np.float32))
    return out


def init_params(key, channel_size: int = CHANNELS, in_channels: int = 1,
                out_channels: int = NUM_CLASSES) -> Dict[str, jnp.ndarray]:
    """Random init matching the reference's scheme (He-normal convs,
    BN gamma=1 beta=0; RITnet/densenet.py:117-129). For training from
    scratch or weightless tests."""
    params: Dict[str, jnp.ndarray] = {}
    c = channel_size

    def conv(key, name, cin, cout, k):
        n = k * k * cout
        w = jax.random.normal(key, (cout, cin, k, k)) * np.sqrt(2.0 / n)
        params[f"{name}.weight"] = w
        params[f"{name}.bias"] = jnp.zeros(cout)

    def bn(name, cout):
        params[f"{name}.running_mean"] = jnp.zeros(cout)
        params[f"{name}.running_var"] = jnp.ones(cout)
        params[f"{name}.weight"] = jnp.ones(cout)
        params[f"{name}.bias"] = jnp.zeros(cout)

    keys = iter(jax.random.split(key, 64))

    def down(name, cin):
        conv(next(keys), f"{name}.conv1", cin, c, 3)
        conv(next(keys), f"{name}.conv21", cin + c, c, 1)
        conv(next(keys), f"{name}.conv22", c, c, 3)
        conv(next(keys), f"{name}.conv31", cin + 2 * c, c, 1)
        conv(next(keys), f"{name}.conv32", c, c, 3)
        bn(f"{name}.bn", c)

    def up(name):
        conv(next(keys), f"{name}.conv11", 2 * c, c, 1)
        conv(next(keys), f"{name}.conv12", c, c, 3)
        conv(next(keys), f"{name}.conv21", 3 * c, c, 1)
        conv(next(keys), f"{name}.conv22", c, c, 3)

    down("down_block1", in_channels)
    for i in range(2, 6):
        down(f"down_block{i}", c)
    for i in range(1, 5):
        up(f"up_block{i}")
    conv(next(keys), "out_conv1", c, out_channels, 1)
    return params


# ---------------------------------------------------------------------------
# Preprocessing (track_render.py:70-84: gamma LUT + CLAHE + normalize)
# ---------------------------------------------------------------------------


def gamma_lut(img_u8: np.ndarray, gamma: float = 0.8) -> np.ndarray:
    table = (255.0 * ((np.arange(256) / 255.0) ** gamma)).astype(np.uint8)
    return table[img_u8]


def clahe(img_u8: np.ndarray, clip_limit: float = 1.5, grid=(8, 8)) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization (the reference uses
    cv2.createCLAHE(1.5, (8,8)); this is a numpy implementation of the same
    algorithm: per-tile clipped histogram equalization with bilinear
    interpolation between tile mappings)."""
    h, w = img_u8.shape
    gy, gx = grid
    th, tw = -(-h // gy), -(-w // gx)
    pad_h, pad_w = th * gy - h, tw * gx - w
    img = np.pad(img_u8, ((0, pad_h), (0, pad_w)), mode="reflect")
    maps = np.zeros((gy, gx, 256), np.float32)
    clip = max(1, int(clip_limit * th * tw / 256.0))
    for i in range(gy):
        for j in range(gx):
            tile_px = img[i * th:(i + 1) * th, j * tw:(j + 1) * tw]
            hist = np.bincount(tile_px.ravel(), minlength=256).astype(np.float64)
            excess = np.maximum(hist - clip, 0).sum()
            hist = np.minimum(hist, clip) + excess / 256.0
            cdf = hist.cumsum()
            cdf = (cdf - cdf.min()) / max(cdf[-1] - cdf.min(), 1e-9) * 255.0
            maps[i, j] = cdf.astype(np.float32)
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]]
    fy = (yy + 0.5) / th - 0.5
    fx = (xx + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, gy - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, gx - 1)
    y1 = np.clip(y0 + 1, 0, gy - 1)
    x1 = np.clip(x0 + 1, 0, gx - 1)
    wy = np.clip(fy - y0, 0, 1)
    wx = np.clip(fx - x0, 0, 1)
    v = img
    out = (
        maps[y0, x0, v] * (1 - wy) * (1 - wx)
        + maps[y1, x0, v] * wy * (1 - wx)
        + maps[y0, x1, v] * (1 - wy) * wx
        + maps[y1, x1, v] * wy * wx
    )
    return out[:h, :w].astype(np.uint8)


def preprocess_eye_image(img_u8_gray: np.ndarray) -> jnp.ndarray:
    """uint8 grayscale (H, W) -> normalized (1, 1, H, W) model input
    (track_render.py:70-84: gamma 0.8 table + CLAHE + mean/std normalize)."""
    x = gamma_lut(img_u8_gray, 0.8)
    x = clahe(x, 1.5, (8, 8))
    x = x.astype(np.float32) / 255.0
    x = (x - 0.5) / 0.5
    return jnp.asarray(x)[None, None, :, :]


def pupil_centroid(pred: np.ndarray) -> np.ndarray:
    """Gaze estimate = pupil-class centroid in image coords — the step the
    reference leaves as TODO (track_render.py:99-106). Returns (x, y)."""
    ys, xs = np.nonzero(pred == 3)
    if len(xs) == 0:
        h, w = pred.shape
        return np.array([w / 2.0, h / 2.0])
    return np.array([xs.mean(), ys.mean()])
