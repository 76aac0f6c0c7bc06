from gaussian_splatting_with_eye_tracking_tpu.models.gaussian_model import (  # noqa: F401
    GaussianModelState,
    GaussianParams,
)
