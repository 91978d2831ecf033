from isaklm_raytracer_tpu.accel.traverse import (
    HitAttributes,
    hit_attributes,
    nearest_hit_brute,
)
from isaklm_raytracer_tpu.accel.kdtree import build_kd_tree
from isaklm_raytracer_tpu.accel.wavefront import (
    WavefrontKD,
    build_wavefront_kd,
    nearest_hit_wavefront,
)


def prepare_scene(scene, max_depth: int = 19, leaf_size: int = 7,
                  leaf_width: int = 8):
    """Build the KD tree + batched-traversal layout for a Scene."""
    import numpy as np

    kd = build_kd_tree(np.asarray(scene.vertices), max_depth, leaf_size)
    wkd = build_wavefront_kd(kd, np.asarray(scene.vertices), leaf_width)
    return scene.replace(kd=kd, wkd=wkd)


__all__ = [
    "HitAttributes",
    "WavefrontKD",
    "build_kd_tree",
    "build_wavefront_kd",
    "hit_attributes",
    "nearest_hit_brute",
    "nearest_hit_wavefront",
    "prepare_scene",
]
