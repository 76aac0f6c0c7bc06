"""Camera containers (reference scene/cameras.py:17-71).

``Camera`` holds a training view: pose, intrinsics (as fov), the GT image and
optional alpha mask; it exposes the CameraParams consumed by the rasterizer.
``MiniCam`` is the lightweight pose-only camera used by the network GUI.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.ops import transforms as tf
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import CameraParams


@dataclass
class Camera:
    colmap_id: int
    R: np.ndarray  # (3,3) cam-to-world rotation (COLMAP convention transposed)
    T: np.ndarray  # (3,) world-to-cam translation
    fovx: float
    fovy: float
    image: Optional[np.ndarray]  # (3, H, W) float32 in [0,1], may be None
    image_name: str
    uid: int
    width: int = 0
    height: int = 0
    znear: float = 0.01
    zfar: float = 100.0
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0
    gt_alpha_mask: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.image is not None:
            self.height, self.width = self.image.shape[-2:]
            self.image = np.clip(self.image, 0.0, 1.0).astype(np.float32)
            if self.gt_alpha_mask is not None:
                # reference multiplies the gt by the alpha mask (cameras.py:38)
                self.image = self.image * self.gt_alpha_mask
        self.view = tf.world_to_view(self.R, self.T, self.trans, self.scale)
        self.proj = tf.projection_matrix(self.znear, self.zfar, self.fovx, self.fovy)
        self.full_proj = (self.proj @ self.view).astype(np.float32)
        self.camera_center = np.linalg.inv(self.view)[:3, 3].astype(np.float32)

    def params(self, width: Optional[int] = None, height: Optional[int] = None) -> CameraParams:
        return CameraParams(
            viewmatrix=jnp.asarray(self.view),
            projmatrix=jnp.asarray(self.full_proj),
            campos=jnp.asarray(self.camera_center),
            tan_fovx=math.tan(self.fovx * 0.5),
            tan_fovy=math.tan(self.fovy * 0.5),
            width=width or self.width,
            height=height or self.height,
        )

    def gt(self) -> jnp.ndarray:
        return jnp.asarray(self.image)


class MiniCam:
    """Pose-only camera from the GUI viewer (reference scene/cameras.py:59-71)."""

    def __init__(self, width, height, fovy, fovx, znear, zfar, view, full_proj):
        self.width = width
        self.height = height
        self.fovy = fovy
        self.fovx = fovx
        self.znear = znear
        self.zfar = zfar
        self.view = np.asarray(view, np.float32)
        self.full_proj = np.asarray(full_proj, np.float32)
        self.camera_center = np.linalg.inv(self.view)[:3, 3].astype(np.float32)

    def params(self) -> CameraParams:
        return CameraParams(
            viewmatrix=jnp.asarray(self.view),
            projmatrix=jnp.asarray(self.full_proj),
            campos=jnp.asarray(self.camera_center),
            tan_fovx=math.tan(self.fovx * 0.5),
            tan_fovy=math.tan(self.fovy * 0.5),
            width=self.width,
            height=self.height,
        )
