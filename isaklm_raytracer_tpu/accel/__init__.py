from isaklm_raytracer_tpu.accel.traverse import (
    HitAttributes,
    hit_attributes,
    nearest_hit_brute,
)

__all__ = ["HitAttributes", "hit_attributes", "nearest_hit_brute"]
