"""Hero integrator with 64-cluster DMA blocks (per-ray mode).

The round-5 sweep (scripts/r5_sweep.py) showed branch-64 blocks beating
branch-32 on BOTH raw populations under per_ray=True (bounce 0.64 vs
0.58 M rays/s at packet 128; coherent 1.68 vs 1.55 at 256): halving the
block count halves the needed-union visit count faster than it grows
per-visit cost. This probe times the full hero integrator at
(branch 64, packet 128/256) to pick the production configuration.

Usage: python scripts/b64_probe.py
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
        make_trace_fn,
        render_sample,
    )
    from isaklm_raytracer_tpu.scene import procedural

    os.environ["ISAKLM_BLK_BRANCH"] = "64"
    t0 = time.perf_counter()
    scene = procedural.hero_scene(2_000_000)
    pscene = prepare_scene(scene)
    print(f"prepare_scene(b64): {time.perf_counter() - t0:.1f}s "
          f"(branch {pscene.cbvh.blk_branch})", flush=True)
    assert pscene.cbvh.blk_branch == 64

    config = RenderConfig(width=640, height=360, max_bounces=6)
    camera = Camera.create(
        position=(0.0, 1.2, -1.8), pitch=0.15, fov=3.14159 / 2
    )
    rays_per_sample = config.num_pixels * config.max_bounces * 2
    key = jax.random.PRNGKey(0)

    for pk in ("128", "256"):
        os.environ["ISAKLM_PACKET"] = pk
        trace_fn = make_trace_fn(pscene, config)

        @jax.jit
        def fwd(scene_, k, _t=trace_fn):
            return render_sample(scene_, camera, k, config, trace_fn=_t)

        t0 = time.perf_counter()
        fwd(pscene, key).block_until_ready()
        print(f"integrator[b64 p{pk}] compile: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        fwd(pscene, jax.random.fold_in(key, 999)).block_until_ready()
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            fwd(pscene, jax.random.fold_in(key, 100 + i)).block_until_ready()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"integrator[b64 p{pk}]: {rays_per_sample/med/1e6:6.2f} M "
              f"rays/s fwd ({' '.join(f'{t:5.2f}' for t in times)} s)",
              flush=True)

    # fwd+bwd at b64 p128
    os.environ["ISAKLM_PACKET"] = "128"
    trace_fn = make_trace_fn(pscene, config)

    @jax.jit
    def fwd_bwd(scene_, albedo, k, _t=trace_fn):
        def loss(a):
            s = scene_.replace(materials=scene_.materials.replace(albedo=a))
            return jnp.mean(render_sample(s, camera, k, config, trace_fn=_t))
        return jax.grad(loss)(albedo)

    t0 = time.perf_counter()
    fwd_bwd(pscene, pscene.materials.albedo, key).block_until_ready()
    print(f"fwd+bwd compile: {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        fwd_bwd(pscene, pscene.materials.albedo,
                jax.random.fold_in(key, 200 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[1]
    print(f"integrator[b64 p128] fwd+bwd: {rays_per_sample/med/1e6:6.2f} M "
          f"rays/s ({' '.join(f'{t:5.2f}' for t in times)} s)", flush=True)


if __name__ == "__main__":
    main()
