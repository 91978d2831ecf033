"""Golden-render case definitions shared by tests/test_golden.py and
scripts/make_goldens.py.

Each case renders a small deterministic image through the FULL pipeline
(scene assembly -> prepare_scene -> progressive render -> resolve_image
tonemap), so a silent estimator / NEE-weight / color-pipeline change cannot
land without an intentional golden regeneration (SURVEY.md section 4;
VERDICT round 3 missing #5). Reference analog: renders/render.png is the
only artifact the CUDA code pins (save_render.cuh:66).
"""

from __future__ import annotations

import numpy as np


def render_case(name: str) -> np.ndarray:
    from isaklm_raytracer_tpu.accel import prepare_scene
    from isaklm_raytracer_tpu.camera import Camera
    from isaklm_raytracer_tpu.config import RenderConfig
    from isaklm_raytracer_tpu.integrator.render import render, resolve_image
    from isaklm_raytracer_tpu.scene import procedural

    if name == "cornell_64":
        config = RenderConfig(
            width=64, height=64, max_bounces=4, ray_chunk=0, min_samples=1
        )
        scene = prepare_scene(procedural.cornell_box(glossy=True))
        camera = Camera.create((0.0, 0.0, -0.9), fov=np.pi / 2)
        spp = 4
    elif name == "demo_textured_64":
        config = RenderConfig(
            width=64, height=64, max_bounces=4, ray_chunk=0, min_samples=1
        )
        scene = prepare_scene(procedural.material_demo_scene(textured=True))
        camera = Camera.create((0.0, 1.2, -1.8), pitch=0.15, fov=np.pi / 2)
        spp = 2
    elif name == "hero_small_32":
        # downscaled hero generator (terrain + sphere field + area light):
        # pins the big-scene asset path -- metallic/transparent materials,
        # emissive scan, cluster renumbering -- at CI scale
        config = RenderConfig(
            width=32, height=32, max_bounces=3, ray_chunk=0, min_samples=1
        )
        scene = prepare_scene(procedural.hero_scene(20_000))
        camera = Camera.create((0.0, 2.0, -6.0), fov=np.pi / 2)
        spp = 2
    else:  # pragma: no cover
        raise KeyError(name)

    gb = render(scene, camera, config, num_samples=spp, seed=11)
    return np.asarray(resolve_image(gb, config))


GOLDENS = ("cornell_64", "demo_textured_64", "hero_small_32")
