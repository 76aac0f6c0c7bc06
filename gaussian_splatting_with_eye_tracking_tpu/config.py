"""Configuration dataclasses.

Mirrors the capability surface of the reference config system
(``arguments/__init__.py:47-89`` in the reference: ModelParams,
PipelineParams, OptimizationParams) as plain dataclasses; the CLI layer
reflects the fields into argparse the same way the reference's ``ParamGroup``
does, including the persisted ``cfg_args`` overlay of
``get_combined_args`` (reference ``arguments/__init__.py:91-111``).
"""

from __future__ import annotations

import dataclasses
import os
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ModelConfig:
    """Scene / model loading parameters (reference ModelParams, arguments/__init__.py:47-62)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"  # kept for CLI parity; arrays live wherever JAX puts them
    eval: bool = False

    # TPU-specific extensions
    capacity: int = 0  # 0 = auto (next power-of-two of init points * 8)


@dataclass
class PipelineConfig:
    """Render pipeline toggles (reference PipelineParams, arguments/__init__.py:64-69)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass
class OptimizationConfig:
    """Training hyperparameters (reference OptimizationParams, arguments/__init__.py:71-89)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_delay_steps: int = 0
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002

    # Adam epsilon matches the reference optimizer (scene/gaussian_model.py:167)
    adam_eps: float = 1e-15


@dataclass
class RasterizeConfig:
    """TPU rasterizer configuration (no reference analog; replaces
    cuda_rasterizer/config.h: BLOCK_X/BLOCK_Y=16 vanilla, 32 AMR).

    The TPU build uses 32x32 tiles everywhere: 1024 pixels reshape exactly to
    the (8, 128) VPU register shape, and the AMR reference already uses 32x32
    tiles (amr/config.h:17-24).
    """

    tile: int = 32
    # Static capacity of the (gaussian, tile) duplicate instance list. The
    # CUDA reference sizes this exactly per frame via cub prefix sum
    # (rasterizer_impl.cu:277-281); XLA needs a static bound, so we bucket.
    max_instances: int = 1 << 20
    # Instances processed per VMEM chunk inside the Pallas tile kernel
    # (128 = DMA lane alignment; 256 measured slower, see ops/pallas_blend.py).
    chunk: int = 128
    # Compositing cutoffs (forward.cu:343-351)
    alpha_min: float = 1.0 / 255.0
    alpha_max: float = 0.99
    transmittance_min: float = 1e-4
    # AMR (amr/config.h + rasterizer_impl.cu:609-644)
    amr_levels: int = 4
    amr_percentiles: tuple = (0.25, 0.5, 0.9)


# ---------------------------------------------------------------------------
# CLI reflection, mirroring the reference ParamGroup behavior:
# every dataclass field becomes --<name>; bools become store_true flags.
# ---------------------------------------------------------------------------

_SHORTHANDS = {
    "source_path": "-s",
    "model_path": "-m",
    "images": "-i",
    "resolution": "-r",
    "white_background": "-w",
}


def add_config_args(parser: ArgumentParser, cfg, group_name: str, sentinel: bool = False):
    """Reflect a config dataclass into argparse args (reference arguments/__init__.py:19-38)."""
    group = parser.add_argument_group(group_name)
    for f in dataclasses.fields(type(cfg)):
        default = None if sentinel else getattr(cfg, f.name)
        names = ["--" + f.name]
        if f.name in _SHORTHANDS:
            names.append(_SHORTHANDS[f.name])
        if f.type in ("bool", bool):
            group.add_argument(*names, default=default, action="store_true")
        else:
            ty = type(getattr(cfg, f.name))
            if ty is tuple:
                continue
            group.add_argument(*names, default=default, type=ty)
    return group


def extract_config(args: Namespace, cls):
    """Build a config dataclass from a parsed namespace (reference :40-45)."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if hasattr(args, f.name) and getattr(args, f.name) is not None:
            kwargs[f.name] = getattr(args, f.name)
    cfg = cls(**kwargs)
    if hasattr(cfg, "source_path") and cfg.source_path:
        cfg.source_path = os.path.abspath(cfg.source_path)
    return cfg


def save_cfg_args(model_path: str, model_cfg: ModelConfig) -> None:
    """Persist config like the reference's cfg_args file (train.py:142-143)."""
    os.makedirs(model_path, exist_ok=True)
    ns = Namespace(**dataclasses.asdict(model_cfg))
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(repr(ns))


def get_combined_args(parser: ArgumentParser, argv: Optional[List[str]] = None) -> Namespace:
    """CLI args overlaid on the model dir's persisted cfg_args
    (reference arguments/__init__.py:91-111)."""
    args_cmdline = parser.parse_args(argv)
    merged = {}
    cfgfilepath = os.path.join(getattr(args_cmdline, "model_path", "") or "", "cfg_args")
    if os.path.isfile(cfgfilepath):
        with open(cfgfilepath) as f:
            text = f.read()
        ns = eval(text, {"Namespace": Namespace})  # noqa: S307 - same trust model as reference
        merged.update(vars(ns))
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)
