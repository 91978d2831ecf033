from isaklm_raytracer_tpu.kernels.intersect import nearest_hit_cluster

__all__ = ["nearest_hit_cluster"]
