"""Image metrics + IO (reference utils/image_utils.py:17-19)."""

from __future__ import annotations

import numpy as np


def mse_np(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((a - b) ** 2))


def psnr_np(a: np.ndarray, b: np.ndarray) -> float:
    m = mse_np(a, b)
    return float(20.0 * np.log10(1.0 / np.sqrt(max(m, 1e-10))))


def save_image(img_chw: np.ndarray, path: str) -> None:
    """(3, H, W) float [0,1] -> PNG."""
    from PIL import Image

    arr = (np.clip(np.transpose(img_chw, (1, 2, 0)), 0, 1) * 255 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_image_chw(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB")).astype(np.float32) / 255.0
    return np.transpose(arr, (2, 0, 1))
