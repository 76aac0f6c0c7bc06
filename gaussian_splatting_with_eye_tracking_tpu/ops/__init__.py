from gaussian_splatting_with_eye_tracking_tpu.ops import (  # noqa: F401
    transforms,
    sh,
    ssim,
)
