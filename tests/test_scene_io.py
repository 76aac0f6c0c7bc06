"""Scene IO: PLY round-trips, COLMAP binary round-trips, Scene lifecycle,
gaussian PLY snapshot round-trip, Blender reader."""

import json
import math
import os

import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.config import ModelConfig, OptimizationConfig
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.models import ply_io as model_ply
from gaussian_splatting_with_eye_tracking_tpu.scene import colmap as cm
from gaussian_splatting_with_eye_tracking_tpu.scene import ply as ply_io
from gaussian_splatting_with_eye_tracking_tpu.scene.scene import Scene


def make_colmap_scene(root, n_cams=6, n_pts=500, width=64, height=48, seed=0):
    """Synthetic COLMAP scene: cameras on a ring looking at origin + random
    point cloud + flat-color images."""
    rng = np.random.default_rng(seed)
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    images_dir = os.path.join(root, "images")
    os.makedirs(images_dir, exist_ok=True)

    focal = 60.0
    cams = {
        1: cm.ColmapCamera(1, "PINHOLE", width, height, np.array([focal, focal, width / 2, height / 2]))
    }
    cm.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)

    imgs = {}
    from PIL import Image

    for i in range(n_cams):
        theta = 2 * np.pi * i / n_cams
        # camera at radius 4 looking at origin
        pos = np.array([4 * np.cos(theta), 0.3, 4 * np.sin(theta)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_w2c = np.stack([right, up2, fwd], axis=0)
        t = -R_w2c @ pos
        from scipy.spatial.transform import Rotation

        qx, qy, qz, qw = Rotation.from_matrix(R_w2c).as_quat()
        name = f"img_{i:03d}.png"
        imgs[i + 1] = cm.ColmapImage(i + 1, np.array([qw, qx, qy, qz]), t, 1, name)
        arr = np.full((height, width, 3), [100 + 20 * i, 50, 200 - 20 * i], np.uint8)
        Image.fromarray(arr).save(os.path.join(images_dir, name))
    cm.write_images_binary(os.path.join(sparse, "images.bin"), imgs)

    xyz = rng.normal(scale=0.5, size=(n_pts, 3))
    rgb = rng.integers(0, 255, (n_pts, 3))
    cm.write_points3d_binary(os.path.join(sparse, "points3D.bin"), xyz, rgb)
    return root


class TestPlyRoundtrip:
    def test_point_cloud_roundtrip(self, tmp_path):
        xyz = np.random.default_rng(0).normal(size=(100, 3))
        rgb = np.random.default_rng(1).integers(0, 255, (100, 3))
        p = str(tmp_path / "pc.ply")
        ply_io.store_point_cloud(p, xyz, rgb)
        pts, cols, normals = ply_io.fetch_point_cloud(p)
        np.testing.assert_allclose(pts, xyz, atol=1e-5)
        np.testing.assert_allclose(cols * 255, rgb, atol=0.5)

    def test_gaussian_snapshot_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        state, tx = gm.create_from_points(
            rng.normal(size=(50, 3)).astype(np.float32),
            rng.uniform(size=(50, 3)).astype(np.float32),
            3, OptimizationConfig(), 1.0, capacity=64,
        )
        p = str(tmp_path / "model.ply")
        model_ply.save_gaussians_ply(p, state.params, np.asarray(state.active))
        params, deg = model_ply.load_gaussians_ply(p)
        assert deg == 3
        np.testing.assert_allclose(params.xyz, state.params.xyz[:50], atol=1e-6)
        np.testing.assert_allclose(params.f_rest, state.params.f_rest[:50], atol=1e-6)
        np.testing.assert_allclose(params.opacity, state.params.opacity[:50], atol=1e-6)
        np.testing.assert_allclose(params.rotation, state.params.rotation[:50], atol=1e-6)


class TestColmap:
    def test_binary_roundtrip(self, tmp_path):
        root = make_colmap_scene(str(tmp_path))
        cams = cm.read_cameras_binary(str(tmp_path / "sparse/0/cameras.bin"))
        assert cams[1].model == "PINHOLE" and cams[1].width == 64
        imgs = cm.read_images_binary(str(tmp_path / "sparse/0/images.bin"))
        assert len(imgs) == 6
        assert imgs[1].name == "img_000.png"
        xyz, rgb, err = cm.read_points3d_binary(str(tmp_path / "sparse/0/points3D.bin"))
        assert xyz.shape == (500, 3) and rgb.shape == (500, 3)

    def test_qvec_rotmat_orthogonal(self):
        q = np.array([0.9, 0.1, -0.2, 0.3])
        q /= np.linalg.norm(q)
        R = cm.qvec_to_rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)


class TestScene:
    def test_colmap_scene_lifecycle(self, tmp_path):
        root = make_colmap_scene(str(tmp_path / "scene"))
        model_path = str(tmp_path / "model")
        cfg = ModelConfig(source_path=root, model_path=model_path, resolution=1, eval=True)
        scene = Scene(cfg, OptimizationConfig())
        assert len(scene.get_train_cameras()) == 5  # 6 cams, every 8th test -> 1 test
        assert len(scene.get_test_cameras()) == 1
        assert scene.cameras_extent > 0
        cam = scene.get_train_cameras()[0]
        assert cam.image.shape == (3, 48, 64)
        assert os.path.exists(os.path.join(model_path, "cameras.json"))
        assert os.path.exists(os.path.join(model_path, "input.ply"))
        with open(os.path.join(model_path, "cameras.json")) as f:
            assert len(json.load(f)) == 6

        # save + reload at iteration
        scene.save(7)
        cfg2 = ModelConfig(source_path=root, model_path=model_path, resolution=1)
        scene2 = Scene(cfg2, OptimizationConfig(), load_iteration=-1)
        assert scene2.loaded_iter == 7
        n1 = int(gm.num_active(scene.gaussians))
        n2 = int(gm.num_active(scene2.gaussians))
        assert n1 == n2

    def test_camera_extent_matches_ring(self, tmp_path):
        root = make_colmap_scene(str(tmp_path / "scene2"))
        cfg = ModelConfig(source_path=root, model_path="", resolution=1)
        scene = Scene(cfg, OptimizationConfig(), shuffle=False)
        # ring radius 4 (y jitter 0.3) -> extent = 1.1 * max dist from center
        assert scene.cameras_extent == pytest.approx(4.4, rel=0.05)


class TestBlender:
    def test_blender_reader(self, tmp_path):
        from PIL import Image

        root = tmp_path / "blender"
        root.mkdir()
        frames = []
        for i in range(3):
            c2w = np.eye(4)
            c2w[2, 3] = 3.0 + i
            frames.append({"file_path": f"./r_{i}", "transform_matrix": c2w.tolist()})
            arr = np.zeros((32, 32, 4), np.uint8)
            arr[:, :, 0] = 255
            arr[8:24, 8:24, 3] = 255
            Image.fromarray(arr).save(root / f"r_{i}.png")
        with open(root / "transforms_train.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

        from gaussian_splatting_with_eye_tracking_tpu.scene.dataset_readers import (
            read_blender_scene,
        )

        info = read_blender_scene(str(root), white_background=True)
        assert len(info.train_cameras) == 3
        assert info.points.shape[0] == 100_000
        from gaussian_splatting_with_eye_tracking_tpu.utils.camera_utils import load_cam

        cam = load_cam(info.train_cameras[0], resolution_arg=1)
        # white bg composited where alpha=0
        assert cam.image[1, 0, 0] == pytest.approx(1.0)
        # red square where alpha=1
        assert cam.image[0, 16, 16] == pytest.approx(1.0)
        assert cam.image[1, 16, 16] == pytest.approx(0.0)
