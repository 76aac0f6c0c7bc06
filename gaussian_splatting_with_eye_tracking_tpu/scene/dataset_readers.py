"""Scene loading: COLMAP and Blender/NeRF-synthetic readers.

Capability parity with reference scene/dataset_readers.py:
- readColmapSceneInfo (:132-166): bin/txt fallback, PINHOLE/SIMPLE_PINHOLE
  intrinsics, every-8th test split under eval, points3D -> PLY conversion.
- readNerfSyntheticInfo (:172-249): transforms_train/test.json, alpha
  compositing against white/black bg, 100k random init points when no PLY.
- getNerfppNorm (:45-64): scene normalization = camera-center bounding
  sphere, radius * 1.1.
"""

from __future__ import annotations

import json
import math
import os
from typing import List, NamedTuple, Optional

import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.ops.transforms import focal2fov, fov2focal
from gaussian_splatting_with_eye_tracking_tpu.scene import colmap as cm
from gaussian_splatting_with_eye_tracking_tpu.scene import ply as ply_io


class CameraInfo(NamedTuple):
    uid: int
    R: np.ndarray
    T: np.ndarray
    fovx: float
    fovy: float
    image_path: str
    image_name: str
    width: int
    height: int
    bg01: Optional[float] = None  # blender alpha-composite bg (0 or 1)


class SceneInfo(NamedTuple):
    points: np.ndarray  # (N,3)
    colors: np.ndarray  # (N,3) in [0,1]
    train_cameras: List[CameraInfo]
    test_cameras: List[CameraInfo]
    nerf_norm_radius: float
    nerf_norm_translate: np.ndarray
    ply_path: str


def get_nerfpp_norm(cam_centers: np.ndarray):
    """Bounding sphere of camera centers; radius *= 1.1
    (reference getNerfppNorm, scene/dataset_readers.py:45-64)."""
    center = cam_centers.mean(axis=0, keepdims=True)
    dist = np.linalg.norm(cam_centers - center, axis=-1)
    diagonal = dist.max()
    radius = diagonal * 1.1
    return float(radius), -center[0]


def _camera_center(R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """C = -R_w2c^T t ; here R is stored transposed (cam-to-world)."""
    return (-R @ T.reshape(3, 1)).ravel()


def read_colmap_scene(path: str, images_dir: str = "images", eval_split: bool = False,
                      llffhold: int = 8) -> SceneInfo:
    sparse = os.path.join(path, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, "sparse")
    try:
        cams = cm.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        imgs = cm.read_images_binary(os.path.join(sparse, "images.bin"))
    except FileNotFoundError:
        cams = cm.read_cameras_text(os.path.join(sparse, "cameras.txt"))
        imgs = cm.read_images_text(os.path.join(sparse, "images.txt"))

    cam_infos = []
    for idx, key in enumerate(sorted(imgs.keys())):
        im = imgs[key]
        intr = cams[im.camera_id]
        R = cm.qvec_to_rotmat(im.qvec).T  # stored transposed like the reference
        T = im.tvec.copy()
        if intr.model == "SIMPLE_PINHOLE":
            focal_x = focal_y = intr.params[0]
        elif intr.model == "PINHOLE":
            focal_x, focal_y = intr.params[0], intr.params[1]
        else:
            raise ValueError(
                f"Unsupported COLMAP camera model {intr.model}: undistort with "
                "`convert.py` first (PINHOLE/SIMPLE_PINHOLE only, matching the "
                "reference scene/dataset_readers.py:85-95)."
            )
        fovx = focal2fov(focal_x, intr.width)
        fovy = focal2fov(focal_y, intr.height)
        cam_infos.append(
            CameraInfo(
                uid=idx, R=R, T=T, fovx=fovx, fovy=fovy,
                image_path=os.path.join(path, images_dir, im.name),
                image_name=os.path.splitext(im.name)[0],
                width=intr.width, height=intr.height,
            )
        )
    cam_infos.sort(key=lambda c: c.image_name)

    if eval_split:
        train = [c for i, c in enumerate(cam_infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(cam_infos) if i % llffhold == 0]
    else:
        train, test = cam_infos, []

    centers = np.stack([_camera_center(c.R, c.T) for c in train])
    radius, translate = get_nerfpp_norm(centers)

    ply_path = os.path.join(sparse, "points3D.ply")
    if not os.path.exists(ply_path):
        try:
            xyz, rgb, _ = cm.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
        except FileNotFoundError:
            xyz, rgb, _ = cm.read_points3d_text(os.path.join(sparse, "points3D.txt"))
        ply_io.store_point_cloud(ply_path, xyz, rgb)
    points, colors, _ = ply_io.fetch_point_cloud(ply_path)

    return SceneInfo(
        points=points, colors=colors, train_cameras=train, test_cameras=test,
        nerf_norm_radius=radius, nerf_norm_translate=translate, ply_path=ply_path,
    )


def _read_blender_cameras(path: str, transforms_file: str, white_background: bool):
    with open(os.path.join(path, transforms_file)) as f:
        meta = json.load(f)
    fovx = meta["camera_angle_x"]
    infos = []
    for idx, frame in enumerate(meta["frames"]):
        file_path = frame["file_path"]
        if not os.path.splitext(file_path)[1]:
            file_path += ".png"
        image_path = os.path.join(path, file_path)
        # NeRF 'transform_matrix' is camera-to-world with OpenGL axes;
        # flip y/z to COLMAP-style (reference dataset_readers.py:185-190)
        c2w = np.array(frame["transform_matrix"])
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]
        # image size read lazily by the camera loader; standard 800x800
        from PIL import Image

        with Image.open(image_path) as im:
            width, height = im.size
        fovy = focal2fov(fov2focal(fovx, width), height)
        infos.append(
            CameraInfo(
                uid=idx, R=R, T=T, fovx=fovx, fovy=fovy,
                image_path=image_path,
                image_name=os.path.splitext(os.path.basename(file_path))[0],
                width=width, height=height,
                bg01=1.0 if white_background else 0.0,
            )
        )
    return infos


def read_blender_scene(path: str, white_background: bool = False,
                       eval_split: bool = True) -> SceneInfo:
    train = _read_blender_cameras(path, "transforms_train.json", white_background)
    if eval_split and os.path.exists(os.path.join(path, "transforms_test.json")):
        test = _read_blender_cameras(path, "transforms_test.json", white_background)
    else:
        test = []

    centers = np.stack([_camera_center(c.R, c.T) for c in train])
    radius, translate = get_nerfpp_norm(centers)

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        # 100k random points in [-1.3, 1.3]^3 (reference :229-239)
        n = 100_000
        rng = np.random.default_rng(0)
        xyz = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        rgb = rng.random((n, 3)).astype(np.float32)
        ply_io.store_point_cloud(ply_path, xyz, (rgb * 255).astype(np.uint8))
    points, colors, _ = ply_io.fetch_point_cloud(ply_path)

    return SceneInfo(
        points=points, colors=colors, train_cameras=train, test_cameras=test,
        nerf_norm_radius=radius, nerf_norm_translate=translate, ply_path=ply_path,
    )


def detect_and_read_scene(path: str, images_dir: str = "images",
                          white_background: bool = False,
                          eval_split: bool = False) -> SceneInfo:
    """COLMAP vs Blender autodetect (reference scene/__init__.py:43-49)."""
    if os.path.exists(os.path.join(path, "sparse")):
        return read_colmap_scene(path, images_dir, eval_split)
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        return read_blender_scene(path, white_background, eval_split=True)
    raise ValueError(f"Could not recognize scene type for {path}")
