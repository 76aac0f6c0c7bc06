#!/usr/bin/env python
"""jax.profiler trace of one full fwd+bwd rasterize step at 1080p; prints the
top ops by self time from the trace (if the tunneled backend supports it)."""
from __future__ import annotations

import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000
cam = make_camera(W, H, cam_z=-5.0)
means, scales, quats, op, sh = make_random_gaussians(
    N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
)
bg = jnp.zeros(3)
kw = dict(sh_degree=3, max_instances=(1 << 20) + (1 << 19), max_per_tile=2048,
          impl="pallas")


def loss(m):
    out = rast.rasterize(means * (1 + m), scales, quats, op, sh, cam, bg, **kw)
    return jnp.mean(out.color ** 2)


g = jax.jit(jax.grad(loss))
x = jnp.zeros(())
r = jax.block_until_ready(g(x))
with jax.profiler.trace("/tmp/jaxtrace"):
    for i in range(3):
        r = g(x + 1e-12 * i)
    jax.block_until_ready(r)

files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # aggregate by name on TPU device tracks
    agg = {}
    for e in events:
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print(f"{dur/1e3/3:10.2f} ms  {name[:110]}")
    break
