"""TPU-native differentiable Gaussian splatting with foveated (eye-tracked) rendering.

A brand-new JAX/XLA + Pallas + pjit framework with the capabilities of the
reference `XinShuo-ph/gaussian_splatting_with_eye_tracking` (an Inria-3DGS fork
with an AMR foveated CUDA rasterizer and a RITnet eye-segmentation front-end),
re-designed TPU-first:

- forward splatting (EWA projection, SH color, tile binning, front-to-back
  alpha compositing) as vectorized JAX + a Pallas per-tile kernel,
- analytic backward via ``jax.custom_vjp`` (no atomics: per-tile partials +
  segment reduction),
- densification on fixed-capacity parameter buffers with validity masks,
- AMR foveated rendering as masked multi-round Pallas launches with an
  explicit carry pytree,
- multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` (tiles sharded
  over devices, gradient ``psum`` over ICI).

See SURVEY.md at the repo root for the reference layer map this rebuilds.
"""

__version__ = "0.1.0"

from gaussian_splatting_with_eye_tracking_tpu.config import (  # noqa: F401
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    RasterizeConfig,
)
