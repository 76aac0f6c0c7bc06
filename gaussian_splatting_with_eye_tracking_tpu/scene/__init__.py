from gaussian_splatting_with_eye_tracking_tpu.scene.scene import Scene  # noqa: F401
from gaussian_splatting_with_eye_tracking_tpu.scene.cameras import Camera, MiniCam  # noqa: F401
