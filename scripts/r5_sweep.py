"""Round-5 follow-up sweep on the per-ray blk kernel.

With per-ray early termination the kernel is ~compute-bound on cluster
intersects (clusters/packet x ~1.4us of (B,128) FMA matches wall time),
so packet size trades intersect width against needed-union sharing:
each needed cluster costs packet-width rays of vector work, but smaller
packets share fewer visits. Sweep packets x block branch on the bounce +
coherent populations, then time the hero integrator (fwd and fwd+bwd)
at the best setting, and attempt a jax.profiler trace of one hero step.

Fresh inputs per timed call; one process (one-client tunnel rule).

Usage: python scripts/r5_sweep.py
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

    from isaklm_raytracer_tpu.accel.cluster import (
        build_cluster_bvh,
        cluster_order,
    )
    from isaklm_raytracer_tpu.kernels.intersect import nearest_hit_cluster_blk
    from isaklm_raytracer_tpu.scene import procedural

    t0 = time.perf_counter()
    scene = procedural.hero_scene(2_000_000)
    verts = np.asarray(scene.vertices)
    verts = verts[cluster_order(verts)]
    cbvh32 = build_cluster_bvh(verts, blk_branch=32)
    cbvh64 = cbvh32.replace(blk_const=None)
    from isaklm_raytracer_tpu.accel.cluster import _build_blocks_np

    blk64, bbox64 = _build_blocks_np(
        np.asarray(cbvh32.tri_const), np.asarray(cbvh32.clu_bbox), 64
    )
    cbvh64 = cbvh32.replace(
        blk_const=jnp.asarray(blk64), blk_bbox_t=jnp.asarray(bbox64),
        blk_branch=64,
    )
    print(f"builds done in {time.perf_counter() - t0:.1f}s "
          f"(NB32 {cbvh32.blk_const.shape[0]}, NB64 {cbvh64.blk_const.shape[0]})",
          flush=True)

    rng = np.random.default_rng(1)
    n = 65536

    def normed(a):
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    def make_pop(name):
        if name == "coherent":
            o = np.tile(np.asarray([0.0, 2.0, -6.0], np.float32), (n, 1))
            ang = (rng.random((n, 2)) - 0.5) * 0.8
            d = normed(np.stack(
                [np.sin(ang[:, 0]), np.sin(ang[:, 1]) * 0.3 - 0.2,
                 np.cos(ang[:, 0])], axis=1).astype(np.float32))
        else:
            pick = rng.integers(0, verts.shape[0], n)
            o = verts[pick, 0] + 1e-3
            d = normed(rng.standard_normal((n, 3)).astype(np.float32))
        return jnp.asarray(o), jnp.asarray(d)

    reps = 3
    for pop in ("bounce", "coherent"):
        inputs = [make_pop(pop) for _ in range(reps + 1)]
        for tag, cb, packets in (("b32", cbvh32, (128, 256, 512)),
                                 ("b64", cbvh64, (128, 256))):
            for packet in packets:
                kern = lambda o, d: nearest_hit_cluster_blk(
                    cb, o, d, per_ray=True, packet=packet
                )
                try:
                    jax.block_until_ready(kern(*inputs[-1])[0])
                except Exception as e:
                    print(f"{pop} {tag} p{packet}: FAILED {repr(e)[:120]}",
                          flush=True)
                    continue
                times = []
                for r in range(reps):
                    t0 = time.perf_counter()
                    jax.block_until_ready(kern(*inputs[r])[0])
                    times.append(time.perf_counter() - t0)
                *_, st = nearest_hit_cluster_blk(
                    cb, *inputs[0], per_ray=True, packet=packet, stats=True
                )
                st = np.asarray(st)
                med = sorted(times)[len(times) // 2]
                print(f"{pop:8s} {tag} p{packet:3d}: {n/med/1e6:6.2f} M rays/s "
                      f"({' '.join(f'{t*1e3:6.1f}' for t in times)} ms; "
                      f"visits/pkt {st[:, 0].mean():6.1f}; "
                      f"clusters/pkt {st[:, 1].mean():7.1f})", flush=True)

    # hero integrator at default packet vs packet 128 (per_ray on)
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

    best = None
    for pk in ("256", "128"):
        os.environ["ISAKLM_PACKET"] = pk if pk != "256" else "0"
        trace_fn = make_trace_fn(pscene, config)

        @jax.jit
        def fwd(scene_, k, _t=trace_fn):
            return render_sample(scene_, camera, k, config, trace_fn=_t)

        t0 = time.perf_counter()
        fwd(pscene, key).block_until_ready()
        print(f"integrator[p{pk}] compile: {time.perf_counter() - t0:.1f}s",
              flush=True)
        fwd(pscene, jax.random.fold_in(key, 999)).block_until_ready()
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            fwd(pscene, jax.random.fold_in(key, 100 + i)).block_until_ready()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[1]
        print(f"integrator[p{pk}]: {rays_per_sample/med/1e6:6.2f} M rays/s "
              f"fwd ({' '.join(f'{t:5.2f}' for t in times)} s)", flush=True)
        if best is None or med < best[1]:
            best = (pk, med)

    os.environ["ISAKLM_PACKET"] = best[0] if best[0] != "256" else "0"
    print(f"best packet: {best[0]}", flush=True)

    # fwd+bwd at the best setting (VERDICT r4 item 9: >= 1.7 M)
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
    print(f"integrator fwd+bwd: {rays_per_sample/med/1e6:6.2f} M rays/s "
          f"({' '.join(f'{t:5.2f}' for t in times)} s)", flush=True)

    # profiler trace attempt (VERDICT r4 item 7); through the tunnel the
    # device-side timeline may be absent -- record whatever we get.
    try:
        import glob

        with jax.profiler.trace("/tmp/r5trace", create_perfetto_trace=True):
            o, d = make_pop("bounce")
            jax.block_until_ready(
                nearest_hit_cluster_blk(cbvh32, o, d, per_ray=True)
            )
        files = sorted(glob.glob("/tmp/r5trace/**/*", recursive=True))
        print("trace files:", [f for f in files if os.path.isfile(f)][:10],
              flush=True)
    except Exception as e:
        print(f"profiler trace FAILED: {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
