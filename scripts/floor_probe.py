"""Adaptive deep-tail floor experiment (VERDICT r4 item 8).

At 1920x1080 the bucket ladder's min_wavefront floor only binds in the
DEEP tail (actives below the floor -- e.g. the last few hundred
stragglers of a 5000-spp adaptive render, which run for thousands of
steps at the floor bucket). Measures the compacted tail step on the
demo scene at 1080p with ~1.5k actives under floors 4096 / 2048 / 1024,
plus the 95%-converged reference point (where the floor cannot bind).

Usage: python scripts/floor_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.device_put(jnp.arange(8.0))
    assert np.asarray(x + 1.0)[3] == 4.0
    print(f"canary ok in {time.perf_counter() - t0:.1f}s", flush=True)

    from isaklm_raytracer_tpu.accel import prepare_scene
    from isaklm_raytracer_tpu.camera import Camera
    from isaklm_raytracer_tpu.config import RenderConfig
    from isaklm_raytracer_tpu.integrator.render import (
        compact_bucket,
        make_compact_step_fn,
    )
    from isaklm_raytracer_tpu.scene import procedural
    from isaklm_raytracer_tpu.scene.types import GBuffer

    config = RenderConfig(width=1920, height=1080, max_bounces=6)
    scene = prepare_scene(procedural.material_demo_scene())
    camera = Camera.create((0.0, 1.2, -1.8), pitch=0.15, fov=3.14159 / 2)
    key = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)

    for n_active_target, floors in ((103_680, (4096,)),
                                    (1_500, (4096, 2048, 1024))):
        conv = rng_np.random(config.num_pixels) >= (
            n_active_target / config.num_pixels
        )
        counts = np.where(conv, config.max_samples, 0).astype(np.int32)
        n_active = int((~conv).sum())
        for floor in floors:
            bucket = compact_bucket(n_active, config.num_pixels, floor)
            gb = GBuffer(
                frame=jnp.zeros((config.num_pixels, 3), jnp.float32),
                sq_luminance=jnp.zeros((config.num_pixels,), jnp.float32),
                count=jnp.asarray(counts),
            )
            cstep = make_compact_step_fn(config, bucket)
            gb = cstep(scene, camera, gb, key)
            jax.block_until_ready(gb)
            times = []
            for i in range(5):
                t0 = time.perf_counter()
                gb = cstep(scene, camera, gb, jax.random.fold_in(key, 300 + i))
                jax.block_until_ready(gb)
                times.append(time.perf_counter() - t0)
            med = sorted(times)[2]
            print(f"actives {n_active:7d} floor {floor:5d} bucket {bucket:7d}: "
                  f"{med * 1e3:7.1f} ms/step "
                  f"({' '.join(f'{t*1e3:6.1f}' for t in times)})", flush=True)


if __name__ == "__main__":
    main()
