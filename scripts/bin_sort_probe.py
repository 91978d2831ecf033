"""Measure the round-5 binned incoherent-ray path vs the Morton ordering.

Compares `nearest_hit_cluster_blk(sort_rays="block")` (exact
first-needed-block binning, kernels/intersect.py::first_block_keys)
against the round-4 `sort_rays=True` Morton proxy on the 2M-triangle hero
scene, for the three ray populations of scripts/packet_overhead.py
(coherent beam / deep-bounce / miss), then times the full hero integrator
under both orderings (ISAKLM_BLK_SORT).

Every timed call uses FRESH ray directions / keys (the tunnel dedupes
repeated identical executions, BASELINE.md measurement-validity note).
All TPU work runs in this one process (one-client rule).

Usage: python scripts/bin_sort_probe.py [--rays 65536] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canary(timeout_s=240):
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.device_put(jnp.arange(8.0))
    v = np.asarray(x + 1.0)
    dt = time.perf_counter() - t0
    assert v[3] == 4.0
    print(f"canary ok in {dt:.1f}s (device {jax.devices()[0].device_kind})",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--tris", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-integrator", action="store_true")
    args = ap.parse_args()

    canary()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from isaklm_raytracer_tpu.accel.cluster import (
        build_cluster_bvh,
        cluster_order,
    )
    from isaklm_raytracer_tpu.kernels.intersect import (
        first_block_keys,
        nearest_hit_cluster_blk,
    )
    from isaklm_raytracer_tpu.scene import procedural

    t0 = time.perf_counter()
    scene = procedural.hero_scene(args.tris)
    verts = np.asarray(scene.vertices)
    verts = verts[cluster_order(verts)]
    cbvh = build_cluster_bvh(verts, blk_branch=32)
    print(f"hero cbvh built in {time.perf_counter() - t0:.1f}s "
          f"({cbvh.num_clusters} clusters, "
          f"{cbvh.blk_const.shape[0]} blocks)", flush=True)

    lo = verts.reshape(-1, 3).min(axis=0)
    hi = verts.reshape(-1, 3).max(axis=0)
    rng = np.random.default_rng(1)
    n = args.rays

    def normed(a):
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    def make_pop(name, rep):
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

    modes = {"morton": True, "block": "block"}
    results = {}
    for pop in ("bounce", "coherent", "miss"):
        inputs = [make_pop(pop, r) for r in range(args.reps + 1)]
        for mname, sr in modes.items():
            kern = lambda o, d: nearest_hit_cluster_blk(
                cbvh, o, d, sort_rays=sr
            )
            # warmup/compile on the extra input set
            jax.block_until_ready(kern(*inputs[-1]))
            times = []
            for r in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(kern(*inputs[r]))
                times.append(time.perf_counter() - t0)
            *_, st = nearest_hit_cluster_blk(
                cbvh, *inputs[0], sort_rays=sr, stats=True
            )
            st = np.asarray(st)
            med = sorted(times)[len(times) // 2]
            results[(pop, mname)] = (med, st)
            print(
                f"{pop:9s} {mname:7s}: {n / med / 1e6:6.2f} M rays/s  "
                f"(times {' '.join(f'{t*1e3:6.1f}' for t in times)} ms; "
                f"visits/packet mean {st[:, 0].mean():6.1f} "
                f"p95 {np.percentile(st[:, 0], 95):6.0f}; "
                f"clusters/packet {st[:, 1].mean():7.1f})",
                flush=True,
            )

    # pre-pass + argsort cost in isolation (bounce population)
    o, d = make_pop("bounce", 99)

    @jax.jit
    def keys_and_perm(o, d):
        k = first_block_keys(cbvh, o, d)
        return jnp.argsort(k)

    jax.block_until_ready(keys_and_perm(o, d))
    o2, d2 = make_pop("bounce", 98)
    t0 = time.perf_counter()
    jax.block_until_ready(keys_and_perm(o2, d2))
    print(f"pre-pass (first_block_keys + argsort): "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms for {n} rays",
          flush=True)

    if args.skip_integrator:
        return

    # Full hero integrator under both orderings.
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

    for mname in ("morton", "block"):
        os.environ["ISAKLM_BLK_SORT"] = mname
        trace_fn = make_trace_fn(pscene, config)

        @jax.jit
        def fwd(scene_, k, _t=trace_fn):
            return render_sample(scene_, camera, k, config, trace_fn=_t)

        t0 = time.perf_counter()
        fwd(pscene, key).block_until_ready()
        print(f"integrator[{mname}] compile: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        fwd(pscene, jax.random.fold_in(key, 999)).block_until_ready()
        times = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            fwd(pscene, jax.random.fold_in(key, 100 + i)).block_until_ready()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            f"integrator[{mname}]: {rays_per_sample / med / 1e6:6.2f} M "
            f"rays/s fwd ({' '.join(f'{t:5.2f}' for t in times)} s/sample)",
            flush=True,
        )


if __name__ == "__main__":
    main()
