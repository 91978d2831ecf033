"""Adaptive compaction at the reference's operating point: 1920x1080.

The reference's tail phase (path_tracing.cuh:347-379) has >95% of pixels
converged past MIN_SAMPLES while stragglers keep sampling to 5000 spp; a
converged CUDA thread simply returns, so the tail costs only the
stragglers. This script measures what our compacted-wavefront equivalent
(integrator.render.make_compact_step_fn) costs at that operating point --
per-step wall-clock at several converged fractions, the full uniform step
as the baseline, and the one-off compile cost of each ladder bucket so the
amortization story is explicit (VERDICT round 2, item #9).

Usage: python scripts/adaptive_1080p.py [--steps 4] [--bounces 6]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Runnable as `python scripts/adaptive_1080p.py` from the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from isaklm_raytracer_tpu.accel import prepare_scene
    from isaklm_raytracer_tpu.camera import Camera
    from isaklm_raytracer_tpu.config import RenderConfig
    from isaklm_raytracer_tpu.integrator.render import (
        compact_bucket,
        make_compact_step_fn,
        make_step_fn,
    )
    from isaklm_raytracer_tpu.scene import procedural
    from isaklm_raytracer_tpu.scene.types import GBuffer

    config = RenderConfig(width=1920, height=1080, max_bounces=args.bounces)
    scene = prepare_scene(procedural.material_demo_scene())
    camera = Camera.create(position=(0.0, 1.2, -1.8), pitch=0.15, fov=3.14159 / 2)
    key = jax.random.PRNGKey(0)
    log = lambda *a: print(*a, file=sys.stderr)
    log(f"adaptive_1080p: {config.num_pixels} px, {args.bounces} bounces, "
        f"device={jax.devices()[0].device_kind}")

    def gbuffer_at(frac_converged: float) -> tuple:
        rng = np.random.default_rng(7)
        conv = rng.random(config.num_pixels) < frac_converged
        counts = np.where(conv, config.max_samples, 0).astype(np.int32)
        gb = GBuffer(
            frame=jnp.zeros((config.num_pixels, 3), jnp.float32),
            sq_luminance=jnp.zeros((config.num_pixels,), jnp.float32),
            count=jnp.asarray(counts),
        )
        return gb, int((~conv).sum())

    result = {"metric": "adaptive_1080p", "unit": "ms/step",
              "resolution": "1920x1080", "max_bounces": args.bounces,
              "min_wavefront": config.min_wavefront}

    # Full uniform step (every pixel sampled): the no-adaptive baseline.
    step = make_step_fn(config)
    gb, _ = gbuffer_at(0.0)
    t0 = time.perf_counter()
    gb = step(scene, camera, gb, key, False)
    jax.block_until_ready(gb)
    full_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(args.steps):
        gb = step(scene, camera, gb, jax.random.fold_in(key, i), False)
    jax.block_until_ready(gb)
    full_ms = (time.perf_counter() - t0) / args.steps * 1e3
    result["full_ms"] = round(full_ms, 1)
    result["full_compile_s"] = round(full_compile, 1)
    log(f"full step: {full_ms:.0f} ms (compile {full_compile:.0f}s)")

    for frac in (0.90, 0.95, 0.99):
        gb, n_active = gbuffer_at(frac)
        bucket = compact_bucket(n_active, config.num_pixels, config.min_wavefront)
        cstep = make_compact_step_fn(config, bucket)
        t0 = time.perf_counter()
        gb = cstep(scene, camera, gb, key)
        jax.block_until_ready(gb)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.steps):
            gb = cstep(scene, camera, gb, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(gb)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        pct = int(frac * 100)
        result[f"conv{pct}_ms"] = round(ms, 1)
        result[f"conv{pct}_bucket"] = bucket
        result[f"conv{pct}_speedup"] = round(full_ms / ms, 2)
        result[f"conv{pct}_compile_s"] = round(compile_s, 1)
        ideal = config.num_pixels / max(n_active, 1)
        log(f"{pct}% converged: {ms:.0f} ms, bucket {bucket} "
            f"({full_ms / ms:.1f}x vs full, ideal {ideal:.0f}x; "
            f"ladder compile {compile_s:.0f}s)")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
