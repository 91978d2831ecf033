"""Measure the v4 per-ray-early-termination blk kernel vs the global-tmax
v3 kernel (round-5 incoherent-ray path, kernels/intersect.py::_blk_kernel
per_ray=True).

Populations as in scripts/packet_overhead.py (coherent / bounce / miss) on
the 2M-tri hero scene, then the full hero integrator under both modes
(ISAKLM_BLK_PER_RAY). Fresh inputs per timed call (the tunnel dedupes
identical executions); all TPU work in one process (one-client rule).

Usage: python scripts/per_ray_probe.py [--rays 65536] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--tris", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-integrator", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.device_put(jnp.arange(8.0))
    assert np.asarray(x + 1.0)[3] == 4.0
    print(f"canary ok in {time.perf_counter() - t0:.1f}s", flush=True)

    from isaklm_raytracer_tpu.accel.cluster import (
        build_cluster_bvh,
        cluster_order,
    )
    from isaklm_raytracer_tpu.kernels.intersect import nearest_hit_cluster_blk
    from isaklm_raytracer_tpu.scene import procedural

    t0 = time.perf_counter()
    scene = procedural.hero_scene(args.tris)
    verts = np.asarray(scene.vertices)
    verts = verts[cluster_order(verts)]
    cbvh = build_cluster_bvh(verts, blk_branch=32)
    print(f"hero cbvh built in {time.perf_counter() - t0:.1f}s", flush=True)

    lo = verts.reshape(-1, 3).min(axis=0)
    hi = verts.reshape(-1, 3).max(axis=0)
    rng = np.random.default_rng(1)
    n = args.rays

    def normed(a):
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    def make_pop(name):
        if name == "coherent":
            o = np.tile(np.asarray([0.0, 2.0, -6.0], np.float32), (n, 1))
            ang = (rng.random((n, 2)) - 0.5) * 0.8
            d = normed(np.stack(
                [np.sin(ang[:, 0]), np.sin(ang[:, 1]) * 0.3 - 0.2,
                 np.cos(ang[:, 0])], axis=1).astype(np.float32))
        elif name == "bounce":
            pick = rng.integers(0, verts.shape[0], n)
            o = verts[pick, 0] + 1e-3
            d = normed(rng.standard_normal((n, 3)).astype(np.float32))
        else:  # miss
            o = np.tile((hi + (hi - lo)).astype(np.float32), (n, 1))
            d = normed(
                rng.standard_normal((n, 3)).astype(np.float32) * 0.05
                + [0, 1, 0]
            )
        return jnp.asarray(o), jnp.asarray(d)

    # correctness spot check compiled-on-TPU: per_ray vs global-tmax
    o, d = make_pop("bounce")
    t_a, i_a, h_a = jax.block_until_ready(
        nearest_hit_cluster_blk(cbvh, o, d, per_ray=False)
    )
    t_b, i_b, h_b = jax.block_until_ready(
        nearest_hit_cluster_blk(cbvh, o, d, per_ray=True)
    )
    hm = int((np.asarray(h_a) != np.asarray(h_b)).sum())
    im = int((np.asarray(i_a) != np.asarray(i_b))[np.asarray(h_a)].sum())
    print(f"compiled parity: hit mismatches {hm}, id mismatches {im} "
          f"(hit rate {np.asarray(h_a).mean():.2f})", flush=True)
    assert hm == 0 and im == 0

    for pop in ("bounce", "coherent", "miss"):
        inputs = [make_pop(pop) for _ in range(args.reps + 1)]
        for pr in (False, True):
            kern = lambda o, d: nearest_hit_cluster_blk(
                cbvh, o, d, per_ray=pr
            )
            jax.block_until_ready(kern(*inputs[-1]))
            times = []
            for r in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(kern(*inputs[r]))
                times.append(time.perf_counter() - t0)
            *_, st = nearest_hit_cluster_blk(
                cbvh, *inputs[0], per_ray=pr, stats=True
            )
            st = np.asarray(st)
            med = sorted(times)[len(times) // 2]
            print(
                f"{pop:9s} per_ray={int(pr)}: {n / med / 1e6:6.2f} M rays/s "
                f"({' '.join(f'{t*1e3:6.1f}' for t in times)} ms; "
                f"visits/packet mean {st[:, 0].mean():6.1f} "
                f"p95 {np.percentile(st[:, 0], 95):6.0f}; "
                f"clusters/packet {st[:, 1].mean():7.1f})",
                flush=True,
            )

    if args.skip_integrator:
        return

    from isaklm_raytracer_tpu.accel import prepare_scene
    from isaklm_raytracer_tpu.camera import Camera
    from isaklm_raytracer_tpu.config import RenderConfig
    from isaklm_raytracer_tpu.integrator.render import (
        make_trace_fn,
        render_sample,
    )

    config = RenderConfig(width=640, height=360, max_bounces=6)
    t0 = time.perf_counter()
    pscene = prepare_scene(scene)
    print(f"prepare_scene: {time.perf_counter() - t0:.1f}s", flush=True)
    camera = Camera.create(
        position=(0.0, 1.2, -1.8), pitch=0.15, fov=3.14159 / 2
    )
    rays_per_sample = config.num_pixels * config.max_bounces * 2
    key = jax.random.PRNGKey(0)

    for pr in ("0", "1"):
        os.environ["ISAKLM_BLK_PER_RAY"] = pr
        trace_fn = make_trace_fn(pscene, config)

        @jax.jit
        def fwd(scene_, k, _t=trace_fn):
            return render_sample(scene_, camera, k, config, trace_fn=_t)

        t0 = time.perf_counter()
        fwd(pscene, key).block_until_ready()
        print(f"integrator[per_ray={pr}] compile: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        fwd(pscene, jax.random.fold_in(key, 999)).block_until_ready()
        times = []
        for i in range(args.reps + 1):
            t0 = time.perf_counter()
            fwd(pscene, jax.random.fold_in(key, 100 + i)).block_until_ready()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            f"integrator[per_ray={pr}]: {rays_per_sample / med / 1e6:6.2f} "
            f"M rays/s fwd ({' '.join(f'{t:5.2f}' for t in times)} s/sample)",
            flush=True,
        )


if __name__ == "__main__":
    main()
