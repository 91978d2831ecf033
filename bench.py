#!/usr/bin/env python
"""Benchmark: rays/sec/chip for the wavefront path tracer (BASELINE.md).

Prints ONE JSON line:
  {"metric": "rays/sec/chip (fwd)", "value": N, "unit": "rays/s",
   "vs_baseline": N / BASELINE_RAYS_PER_SEC, ...extras}

Definition: the wavefront integrator executes `max_bounces` bounce steps
per sample, each tracing one extension ray and one NEE shadow ray for every
pixel lane (masked lanes still traverse -- that IS the work the chip does),
so rays = pixels * spp * max_bounces * 2. The reference publishes no
numbers (SURVEY.md section 6); BASELINE_RAYS_PER_SEC pins this repo's
round-1 measurement so vs_baseline tracks self-improvement.

Usage: python bench.py [--preset quick|default|hero] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Round-1 measured reference point (TPU v5e single chip, default preset:
# 512x512 @ 8 bounces, 660-tri scene, Pallas cluster-BVH intersector).
# The reference publishes no throughput numbers (SURVEY.md section 6), so
# vs_baseline tracks self-improvement against this pinned measurement.
BASELINE_RAYS_PER_SEC = 4.19e6


def build_bench(preset: str):
    import numpy as np

    from isaklm_raytracer_tpu.accel import prepare_scene
    from isaklm_raytracer_tpu.camera import Camera
    from isaklm_raytracer_tpu.config import RenderConfig
    from isaklm_raytracer_tpu.scene import procedural

    if preset == "quick":
        config = RenderConfig(width=256, height=256, max_bounces=6)
        scene = procedural.material_demo_scene()
        steps, warmup = 4, 1
    elif preset == "hero":
        # 2M-triangle scene (the reference hero size, README.md:12). The
        # render window is kept at 640x360 so one jitted sample stays well
        # under the tunnel's ~60s single-execution ceiling; rays/s is what
        # the metric tracks and is resolution-independent at this scale.
        config = RenderConfig(width=640, height=360, max_bounces=6)
        scene = procedural.hero_scene(2_000_000)
        steps, warmup = 2, 1
    else:
        config = RenderConfig(width=512, height=512, max_bounces=8)
        scene = procedural.material_demo_scene()
        steps, warmup = 8, 2

    scene = prepare_scene(scene)
    camera = Camera.create(position=(0.0, 1.2, -1.8), pitch=0.15, fov=3.14159 / 2)
    return scene, camera, config, steps, warmup


def verify_kernel(scene, config, num_rays: int, log) -> dict:
    """Compiled-path correctness gate (VERDICT round 2, item #4): the EXACT
    intersector the bench times (Pallas cluster kernel on TPU, compiled --
    not interpret mode) must agree with the brute-force oracle on random
    rays before any timing is recorded. Hard-fails the bench on mismatch,
    so every BENCH_r*.json is also a compiled-correctness artifact.

    Tolerances: hit masks must match exactly; hit distances to 1e-3
    relative (f32 reassociation under Mosaic vs XLA). Hit IDs may differ
    only where two triangles tie in t (coplanar duplicates)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from isaklm_raytracer_tpu.accel.traverse import nearest_hit_brute
    from isaklm_raytracer_tpu.integrator.render import make_trace_fn

    trace = jax.jit(make_trace_fn(scene, config))
    lo = np.asarray(scene.vertices).reshape(-1, 3).min(axis=0)
    hi = np.asarray(scene.vertices).reshape(-1, 3).max(axis=0)
    rng = np.random.default_rng(42)
    o = jnp.asarray(
        (rng.random((num_rays, 3)) * (hi - lo) + lo).astype(np.float32)
    )
    d_raw = rng.standard_normal((num_rays, 3)).astype(np.float32)
    d = jnp.asarray(d_raw / np.linalg.norm(d_raw, axis=1, keepdims=True))

    t_k, i_k, h_k = jax.block_until_ready(trace(o, d))
    t_b, i_b, h_b = jax.block_until_ready(
        jax.jit(nearest_hit_brute)(o, d, scene.vertices)
    )
    h_k, h_b = np.asarray(h_k), np.asarray(h_b)
    t_k, t_b = np.asarray(t_k), np.asarray(t_b)
    hit_mism = int((h_k != h_b).sum())
    both = h_k & h_b  # filter before subtracting: misses carry t=inf
    rel_dt = (
        float((np.abs(t_k[both] - t_b[both]) / np.maximum(t_b[both], 1e-3)).max())
        if both.any()
        else 0.0
    )
    id_mism = int((np.asarray(i_k)[both] != np.asarray(i_b)[both]).sum())
    log(f"kernel check: {num_rays} rays, hit mismatches={hit_mism}, "
        f"max rel dt={rel_dt:.2e}, id mismatches={id_mism} "
        f"(hit rate {h_b.mean():.2f})")
    if hit_mism or rel_dt > 1e-3:
        print(json.dumps({
            "metric": "kernel_check_failed", "value": 0, "unit": "bool",
            "vs_baseline": 0.0, "hit_mismatches": hit_mism,
            "max_rel_dt": rel_dt,
        }))
        raise SystemExit(1)
    return {
        "kernel_check_rays": num_rays,
        "kernel_check_max_rel_dt": round(rel_dt, 8),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="default", choices=["quick", "default", "hero"])
    parser.add_argument("--json-only", action="store_true")
    parser.add_argument("--no-bwd", action="store_true")
    parser.add_argument("--no-check", action="store_true",
                        help="skip the compiled-kernel-vs-oracle gate")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from isaklm_raytracer_tpu.integrator.render import make_trace_fn, render_sample

    scene, camera, config, steps, warmup = build_bench(args.preset)
    device = jax.devices()[0]
    log = (lambda *a: None) if args.json_only else (lambda *a: print(*a, file=sys.stderr))
    log(f"bench: preset={args.preset} device={device.device_kind} "
        f"tris={scene.num_triangles} res={config.width}x{config.height} "
        f"bounces={config.max_bounces}")

    check_fields = {}
    if not args.no_check:
        # fewer check rays at hero scale: brute force is O(rays x tris)
        n_check = 256 if args.preset == "hero" else 2048
        check_fields = verify_kernel(scene, config, n_check, log)

    # The scene is a jit ARGUMENT (not a closure constant): closed-over
    # arrays get baked into the compile payload, which at hero scale
    # (~400MB of geometry + cluster table) overflows the compile service.
    @jax.jit
    def fwd(scene_, key):
        return render_sample(scene_, camera, key, config)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    fwd(scene, key).block_until_ready()
    log(f"fwd compile: {time.perf_counter() - t0:.1f}s")

    for i in range(warmup):
        fwd(scene, jax.random.fold_in(key, i)).block_until_ready()
    t0 = time.perf_counter()
    for i in range(steps):
        fwd(scene, jax.random.fold_in(key, 100 + i)).block_until_ready()
    fwd_time = (time.perf_counter() - t0) / steps

    rays_per_sample = config.num_pixels * config.max_bounces * 2
    fwd_rays = rays_per_sample / fwd_time

    result = {
        "metric": "rays/sec/chip (fwd)",
        "value": round(fwd_rays),
        "unit": "rays/s",
        "vs_baseline": round(fwd_rays / BASELINE_RAYS_PER_SEC, 4),
        "preset": args.preset,
        "triangles": scene.num_triangles,
        "resolution": f"{config.width}x{config.height}",
        "max_bounces": config.max_bounces,
        "fwd_ms_per_sample": round(fwd_time * 1e3, 2),
        **check_fields,
    }

    if args.preset != "hero":
        # Adaptive compute-skipping (path_tracing.cuh:347-379 parity): step
        # wall-clock on a frame whose pixels are 90% converged, vs the full
        # uniform step. The compacted wavefront should approach the 10%-active
        # ideal rather than the round-1 behavior (zeroed but fully computed).
        import numpy as np

        from isaklm_raytracer_tpu.integrator.render import (
            compact_bucket,
            make_compact_step_fn,
        )
        from isaklm_raytracer_tpu.scene.types import GBuffer

        rng_np = np.random.default_rng(0)
        conv = rng_np.random(config.num_pixels) < 0.90
        counts = np.where(conv, config.max_samples, 0).astype(np.int32)
        gb = GBuffer(
            frame=jnp.zeros((config.num_pixels, 3), jnp.float32),
            sq_luminance=jnp.zeros((config.num_pixels,), jnp.float32),
            count=jnp.asarray(counts),
        )
        n_active = int((~conv).sum())
        bucket = compact_bucket(n_active, config.num_pixels, config.min_wavefront)
        cstep = make_compact_step_fn(config, bucket)
        gb = cstep(scene, camera, gb, key)  # compile + warmup (donates gb)
        jax.block_until_ready(gb)
        t0 = time.perf_counter()
        for i in range(steps):
            gb = cstep(scene, camera, gb, jax.random.fold_in(key, 300 + i))
        jax.block_until_ready(gb)
        adaptive_time = (time.perf_counter() - t0) / steps
        result["adaptive_90pct_ms_per_step"] = round(adaptive_time * 1e3, 2)
        result["adaptive_90pct_speedup"] = round(fwd_time / adaptive_time, 2)
        log(f"adaptive 90%-converged: {adaptive_time*1e3:.1f} ms/step "
            f"({fwd_time/adaptive_time:.1f}x vs full, ideal 10x; "
            f"bucket {bucket}/{config.num_pixels})")

    if not args.no_bwd:
        @jax.jit
        def fwd_bwd(scene_, albedo, key):
            def loss(a):
                s = scene_.replace(materials=scene_.materials.replace(albedo=a))
                return jnp.mean(render_sample(s, camera, key, config))
            return jax.grad(loss)(albedo)

        t0 = time.perf_counter()
        fwd_bwd(scene, scene.materials.albedo, key).block_until_ready()
        log(f"fwd+bwd compile: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(max(steps // 2, 1)):
            fwd_bwd(scene, scene.materials.albedo, jax.random.fold_in(key, 200 + i)).block_until_ready()
        bwd_time = (time.perf_counter() - t0) / max(steps // 2, 1)
        result["fwd_bwd_ms_per_sample"] = round(bwd_time * 1e3, 2)
        result["rays_per_sec_fwd_bwd"] = round(rays_per_sample / bwd_time)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
