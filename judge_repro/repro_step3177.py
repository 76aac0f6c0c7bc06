"""Single-step NaN repro: load chkpnt3176, replay the deterministic camera
order to find iteration 3177's camera, run ONE train step, check for NaN.
Then run the same step with impl='jnp' for cross-attribution."""
import sys, os
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from gaussian_splatting_with_eye_tracking_tpu import train_lib
from gaussian_splatting_with_eye_tracking_tpu.config import (
    ModelConfig, OptimizationConfig)
from gaussian_splatting_with_eye_tracking_tpu.models import checkpoint as ckpt
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.scene import Scene

cfg = ModelConfig(source_path="logs/train_r04/scene", model_path="/tmp/judge_sc",
                  eval=True)
opt = OptimizationConfig()
scene = Scene(cfg, opt, seed=0)
cams = scene.get_train_cameras()
rng = np.random.default_rng(0)
stack = []
for it in range(1, 3178):
    if not stack:
        stack = list(rng.permutation(len(cams)))
    idx = stack.pop()
cam = cams[idx]
print("iter 3177 camera idx:", idx, cam.image_name)

state, _ = ckpt.load_checkpoint("judge_repro/chkpnt3176.ckpt")
bg = jnp.zeros(3)
tx = scene.tx

for impl in (("pallas" if jax.default_backend() == "tpu" else "jnp"), "jnp"):
    step = train_lib.make_train_step(
        tx, opt, max_sh_degree=scene.max_sh_degree,
        width=cam.width, height=cam.height, impl=impl,
        max_instances=1 << 19, max_live=1 << 19)
    new_state, aux = step(state, *train_lib.camera_arrays(cam.params()),
                          cam.gt(), bg, True)
    xyz = np.asarray(new_state.params.xyz)
    g_nan = np.isnan(xyz).sum()
    print(f"impl={impl}: loss={float(aux.loss):.5f} psnr={float(aux.psnr):.2f} "
          f"ninst={int(aux.num_instances)} nan_xyz_elems={g_nan} "
          f"overflow={bool(aux.overflow)}")
    # also check raw gradient via value_and_grad outside the optimizer
    from gaussian_splatting_with_eye_tracking_tpu import renderer
    from gaussian_splatting_with_eye_tracking_tpu.ops.projection import CameraParams
    from gaussian_splatting_with_eye_tracking_tpu.ops import ssim as ssim_ops
    c = cam.params()

    def loss_fn(params):
        s = state._replace(params=params)
        out = renderer.render(
            CameraParams(viewmatrix=c.viewmatrix, projmatrix=c.projmatrix,
                         campos=c.campos, tan_fovx=c.tan_fovx,
                         tan_fovy=c.tan_fovy, width=cam.width, height=cam.height),
            s, bg, max_sh_degree=scene.max_sh_degree, impl=impl,
            max_instances=1 << 19, max_live=1 << 19)
        l1 = jnp.mean(jnp.abs(out.color - cam.gt()))
        sv = ssim_ops.ssim(out.color, cam.gt())
        return (1 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1 - sv)

    g = jax.grad(loss_fn)(state.params)
    for f in g._fields:
        a = np.asarray(getattr(g, f))
        n = np.isnan(a).sum()
        if n:
            rows = np.unique(np.argwhere(np.isnan(a))[:, 0])
            print(f"  grad {f}: {n} NaNs in rows {rows[:10]}")
    if not any(np.isnan(np.asarray(getattr(g, f))).any() for f in g._fields):
        print("  raw grads all finite")
