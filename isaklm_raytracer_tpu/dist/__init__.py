from isaklm_raytracer_tpu.dist.sharding import (
    make_render_mesh,
    sharded_render_fn,
    sharded_train_step_fn,
    sharded_value_and_grad_fn,
)

__all__ = [
    "make_render_mesh",
    "sharded_render_fn",
    "sharded_train_step_fn",
    "sharded_value_and_grad_fn",
]
