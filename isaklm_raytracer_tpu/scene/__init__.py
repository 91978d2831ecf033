from isaklm_raytracer_tpu.scene.types import (
    GBuffer,
    KDTreeArrays,
    MaterialTable,
    Scene,
    TextureAtlas,
    build_scene,
    sample_texture,
)

__all__ = [
    "GBuffer",
    "KDTreeArrays",
    "MaterialTable",
    "Scene",
    "TextureAtlas",
    "build_scene",
    "sample_texture",
]
