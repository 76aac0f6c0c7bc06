from gaussian_splatting_with_eye_tracking_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    make_sharded_train_step,
    sharded_render,
)
