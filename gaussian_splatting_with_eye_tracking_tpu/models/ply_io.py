"""Gaussian model PLY snapshot format, interoperable with the reference.

Field layout matches reference save_ply/load_ply
(scene/gaussian_model.py:177-256): x,y,z, nx,ny,nz, f_dc_0..2,
f_rest_0..3*(K-1)-1 (channel-major), opacity, scale_0..2, rot_0..3 — raw
(pre-activation) values, so snapshots round-trip bit-for-bit with the
reference implementation.
"""

from __future__ import annotations

import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.models.gaussian_model import GaussianParams
from gaussian_splatting_with_eye_tracking_tpu.scene import ply as ply_io


def save_gaussians_ply(path: str, params: GaussianParams, active: np.ndarray) -> None:
    act = np.asarray(active)
    xyz = np.asarray(params.xyz)[act]
    f_dc = np.asarray(params.f_dc)[act]  # (N, 3, 1)
    f_rest = np.asarray(params.f_rest)[act]  # (N, 3, K-1)
    opacity = np.asarray(params.opacity)[act]  # (N, 1)
    scaling = np.asarray(params.scaling)[act]
    rotation = np.asarray(params.rotation)[act]
    n = xyz.shape[0]

    fields = {}
    for i, k in enumerate("xyz"):
        fields[k] = xyz[:, i].astype(np.float32)
    for k in ("nx", "ny", "nz"):
        fields[k] = np.zeros(n, np.float32)
    f_dc_flat = f_dc.reshape(n, -1)  # (N, 3)
    for i in range(f_dc_flat.shape[1]):
        fields[f"f_dc_{i}"] = f_dc_flat[:, i].astype(np.float32)
    f_rest_flat = f_rest.reshape(n, -1)  # (N, 3*(K-1)) channel-major
    for i in range(f_rest_flat.shape[1]):
        fields[f"f_rest_{i}"] = f_rest_flat[:, i].astype(np.float32)
    fields["opacity"] = opacity[:, 0].astype(np.float32)
    for i in range(3):
        fields[f"scale_{i}"] = scaling[:, i].astype(np.float32)
    for i in range(4):
        fields[f"rot_{i}"] = rotation[:, i].astype(np.float32)
    ply_io.write_ply(path, fields)


def load_gaussians_ply(path: str):
    """Returns numpy GaussianParams-shaped arrays (unpadded) + max_sh_degree."""
    v = ply_io.read_ply(path)
    n = len(v["x"])
    xyz = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], -1).reshape(n, 3, 1)
    n_rest = len([k for k in v if k.startswith("f_rest_")])
    if n_rest:
        rest = np.stack(
            [v[f"f_rest_{i}"] for i in range(n_rest)], -1
        ).reshape(n, 3, n_rest // 3)
    else:
        rest = np.zeros((n, 3, 0), np.float32)
    k_total = 1 + n_rest // 3
    sh_degree = int(round(np.sqrt(k_total))) - 1
    opacity = v["opacity"].reshape(n, 1).astype(np.float32)
    scaling = np.stack([v[f"scale_{i}"] for i in range(3)], -1).astype(np.float32)
    rotation = np.stack([v[f"rot_{i}"] for i in range(4)], -1).astype(np.float32)
    params = GaussianParams(
        xyz=xyz, f_dc=f_dc.astype(np.float32), f_rest=rest.astype(np.float32),
        scaling=scaling, rotation=rotation, opacity=opacity,
    )
    return params, sh_degree
