from isaklm_raytracer_tpu.kernels.intersect import (
    nearest_hit_cluster,
    nearest_hit_cluster_hbm,
)

__all__ = ["nearest_hit_cluster", "nearest_hit_cluster_hbm"]
