from isaklm_raytracer_tpu.math import color, sampling, transforms

__all__ = ["color", "sampling", "transforms"]
