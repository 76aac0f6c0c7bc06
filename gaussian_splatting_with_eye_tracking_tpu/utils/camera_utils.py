"""Camera list construction + resolution policy + JSON export.

Capability parity with reference utils/camera_utils.py:22-82 (loadCam
resolution policy incl. the >1600px auto-downscale warning, PILtoTorch
analog, camera_to_JSON).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.scene.cameras import Camera
from gaussian_splatting_with_eye_tracking_tpu.scene.dataset_readers import CameraInfo
from gaussian_splatting_with_eye_tracking_tpu.ops.transforms import fov2focal

WARNED = [False]


def load_image(path: str, bg01: Optional[float] = None) -> np.ndarray:
    """Load to (C, H, W) float32 in [0,1]; alpha-composite RGBA over bg01
    (reference readCamerasFromTransforms, scene/dataset_readers.py:199-205)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im).astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    if arr.shape[2] == 4:
        rgb, a = arr[:, :, :3], arr[:, :, 3:4]
        bg = 1.0 if bg01 is None else bg01
        arr = rgb * a + bg * (1 - a)
    return np.transpose(arr[:, :, :3], (2, 0, 1))


def resize_image(img: np.ndarray, size: tuple) -> np.ndarray:
    """(C,H,W) -> bilinear resize to (C, h, w)."""
    from PIL import Image

    w, h = size
    chans = [
        np.asarray(
            Image.fromarray((np.clip(c, 0, 1) * 255).astype(np.uint8)).resize(
                (w, h), Image.BILINEAR
            )
        ).astype(np.float32)
        / 255.0
        for c in img
    ]
    return np.stack(chans, axis=0)


def load_cam(info: CameraInfo, resolution_arg: int, resolution_scale: float = 1.0,
             load_image_data: bool = True) -> Camera:
    """Resolution policy (reference loadCam, utils/camera_utils.py:22-50):
    -1 = auto (downscale so width <= 1600), 1/2/4/8 = divide."""
    img = load_image(info.image_path, info.bg01) if load_image_data else None
    orig_w, orig_h = info.width, info.height
    if resolution_arg in (1, 2, 4, 8):
        scale = resolution_scale * resolution_arg
        target = (round(orig_w / scale), round(orig_h / scale))
    else:
        if orig_w > 1600:
            if not WARNED[0]:
                print(
                    "[ INFO ] Encountered quite large input images (>1.6K "
                    "pixels width), rescaling to 1.6K.\n If this is not "
                    "desired, please explicitly specify '--resolution/-r' as 1"
                )
                WARNED[0] = True
            global_down = orig_w / 1600
        else:
            global_down = 1
        scale = global_down * resolution_scale
        target = (int(orig_w / scale), int(orig_h / scale))
    if img is not None and (img.shape[2], img.shape[1]) != target:
        img = resize_image(img, target)
    return Camera(
        colmap_id=info.uid, R=info.R, T=info.T, fovx=info.fovx, fovy=info.fovy,
        image=img, image_name=info.image_name, uid=info.uid,
        width=target[0], height=target[1],
    )


def camera_list_from_infos(infos: List[CameraInfo], resolution_arg: int,
                           resolution_scale: float = 1.0,
                           load_images: bool = True) -> List[Camera]:
    return [load_cam(i, resolution_arg, resolution_scale, load_images) for i in infos]


def camera_to_json(idx: int, cam) -> dict:
    """(reference camera_to_JSON, utils/camera_utils.py:62-82)"""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = cam.R.transpose()
    Rt[:3, 3] = cam.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    pos = W2C[:3, 3]
    rot = W2C[:3, :3]
    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": fov2focal(cam.fovy, cam.height),
        "fx": fov2focal(cam.fovx, cam.width),
    }
