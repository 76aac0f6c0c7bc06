"""Scene: dataset + gaussian model lifecycle (reference scene/__init__.py:21-93).

Loads COLMAP/Blender scenes, writes cameras.json + input.ply to the model
dir, shuffles cameras, computes the cameras_extent normalization, builds
per-resolution camera lists, and initializes or restores the gaussian model.
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import Dict, List, Optional

import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.config import ModelConfig, OptimizationConfig
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.models import ply_io as model_ply
from gaussian_splatting_with_eye_tracking_tpu.scene import dataset_readers as dsr
from gaussian_splatting_with_eye_tracking_tpu.utils import camera_utils as cu


def search_for_max_iteration(folder: str) -> int:
    """(reference utils/system_utils.py:26-28)"""
    saved = [int(f.split("_")[-1]) for f in os.listdir(folder)]
    return max(saved)


class Scene:
    def __init__(
        self,
        cfg: ModelConfig,
        opt: Optional[OptimizationConfig] = None,
        load_iteration: Optional[int] = None,
        shuffle: bool = True,
        resolution_scales: List[float] = [1.0],
        load_images: bool = True,
        seed: int = 0,
    ):
        self.model_path = cfg.model_path
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = search_for_max_iteration(
                    os.path.join(self.model_path, "point_cloud")
                )
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        info = dsr.detect_and_read_scene(
            cfg.source_path, cfg.images, cfg.white_background, cfg.eval
        )
        self.info = info

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            shutil.copyfile(info.ply_path, os.path.join(self.model_path, "input.ply"))
            cam_json = [
                cu.camera_to_json(i, c)
                for i, c in enumerate(info.train_cameras + info.test_cameras)
            ]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        self.train_cameras: Dict[float, list] = {}
        self.test_cameras: Dict[float, list] = {}
        train_infos = list(info.train_cameras)
        test_infos = list(info.test_cameras)
        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(train_infos)
            rng.shuffle(test_infos)
        for scale in resolution_scales:
            self.train_cameras[scale] = cu.camera_list_from_infos(
                train_infos, cfg.resolution, scale, load_images
            )
            self.test_cameras[scale] = cu.camera_list_from_infos(
                test_infos, cfg.resolution, scale, load_images
            )

        self.cameras_extent = info.nerf_norm_radius

        opt = opt or OptimizationConfig()
        if self.loaded_iter:
            params_np, sh_degree = model_ply.load_gaussians_ply(
                os.path.join(
                    self.model_path, "point_cloud",
                    f"iteration_{self.loaded_iter}", "point_cloud.ply",
                )
            )
            self.max_sh_degree = sh_degree
            self.gaussians, self.tx = load_state_from_params(
                params_np, sh_degree, opt, self.cameras_extent, cfg.capacity
            )
        else:
            self.max_sh_degree = cfg.sh_degree
            self.gaussians, self.tx = gm.create_from_points(
                info.points, info.colors, cfg.sh_degree, opt,
                spatial_lr_scale=self.cameras_extent, capacity=cfg.capacity,
            )

    def save(self, iteration: int) -> None:
        out = os.path.join(self.model_path, "point_cloud", f"iteration_{iteration}")
        os.makedirs(out, exist_ok=True)
        model_ply.save_gaussians_ply(
            os.path.join(out, "point_cloud.ply"),
            self.gaussians.params,
            np.asarray(self.gaussians.active),
        )

    def get_train_cameras(self, scale: float = 1.0):
        return self.train_cameras[scale]

    def get_test_cameras(self, scale: float = 1.0):
        return self.test_cameras[scale]


def load_state_from_params(params_np, sh_degree, opt, spatial_lr_scale, capacity=0):
    """Build a padded GaussianModelState from unpadded numpy params
    (PLY restore path, reference load_ply scene/gaussian_model.py:215-256)."""
    import jax.numpy as jnp

    n = params_np.xyz.shape[0]
    cap = capacity or gm.next_pow2(max(n * 2, 1024))
    cap = max(cap, gm.next_pow2(n))

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = gm.GaussianParams(*[pad(np.asarray(getattr(params_np, f)))
                                 for f in gm.GaussianParams._fields])
    tx = gm.make_optimizer(opt, spatial_lr_scale)
    state = gm.GaussianModelState(
        params=params,
        active=jnp.arange(cap) < n,
        max_radii2d=jnp.zeros(cap),
        xyz_grad_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        opt_state=tx.init(params),
        sh_degree=jnp.int32(sh_degree),
    )
    return state, tx
