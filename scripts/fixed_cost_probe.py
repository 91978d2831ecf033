"""Decompose the v3 blk kernel's per-packet FIXED cost F (~229 us measured
by scripts/packet_overhead.py on a zero-visit population).

Components timed separately on the hero table:
  1. full call, sort on (baseline)
  2. full call, sort off            -> cost of argsort + gather + scatter
  3. XLA prep only (pad/concat/transpose, no kernel)
  4. null Pallas kernel with the same grid/in_specs/scratch -> Mosaic
     launch + input-copy + scratch overhead per program

Usage: python scripts/fixed_cost_probe.py [--rays 65536]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--tris", type=int, default=2_000_000)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--packet", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from isaklm_raytracer_tpu.accel.cluster import (
        build_cluster_bvh,
        cluster_order,
    )
    from isaklm_raytracer_tpu.kernels import intersect as ki
    from isaklm_raytracer_tpu.scene import procedural

    scene = procedural.hero_scene(args.tris)
    verts = np.asarray(scene.vertices)
    verts = verts[cluster_order(verts)]
    cbvh = build_cluster_bvh(verts, blk_branch=32)
    hi = verts.reshape(-1, 3).max(axis=0)
    lo = verts.reshape(-1, 3).min(axis=0)
    rng = np.random.default_rng(1)
    n = args.rays
    o = jnp.asarray(np.tile((hi + (hi - lo)).astype(np.float32), (n, 1)))
    d_np = rng.standard_normal((n, 3)).astype(np.float32) * 0.05 + [0, 1, 0]
    d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))

    def timeit(label, fn):
        jax.block_until_ready(fn())
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(args.steps):
            jax.block_until_ready(fn())
        dt = (time.perf_counter() - t0) / args.steps
        per_packet = dt / (n // args.packet)
        print(f"{label:28s}: {dt * 1e3:7.2f} ms ({per_packet * 1e6:6.1f} "
              f"us/packet)", flush=True)
        return dt

    timeit("full (sort on)", lambda: ki.nearest_hit_cluster_blk(
        cbvh, o, d, packet=args.packet))
    timeit("full (sort off)", lambda: ki.nearest_hit_cluster_blk(
        cbvh, o, d, packet=args.packet, sort_rays=False))

    prep = jax.jit(functools.partial(
        ki._prep_rays, packet=args.packet, sort_rays=False),
        static_argnames=())

    @jax.jit
    def prep_only(o_, d_):
        rays, rays_t, *_ = ki._prep_rays(o_, d_, None, args.packet,
                                         sort_rays=False)
        return rays, rays_t

    timeit("XLA prep only (no sort)", lambda: prep_only(o, d))

    @jax.jit
    def prep_sorted(o_, d_):
        rays, rays_t, *_ = ki._prep_rays(o_, d_, None, args.packet,
                                         sort_rays=True)
        return rays, rays_t

    timeit("XLA prep only (sorted)", lambda: prep_sorted(o, d))

    # Null kernel: same grid, same in_specs (bbox VMEM + ANY table + rays),
    # same scratch; body touches nothing but the outputs.
    packet = args.packet

    def null_kernel(bbox_ref, tbl_ref, rays_ref, rayt_ref, out_t_ref,
                    out_id_ref, *scratch):
        out_t_ref[:] = jnp.full(out_t_ref.shape, 0.0, jnp.float32)
        out_id_ref[:] = jnp.full(out_id_ref.shape, 0, jnp.int32)

    @jax.jit
    def null_call(o_, d_):
        rays, rays_t, num_packets, num_rays, _ = ki._prep_rays(
            o_, d_, None, packet, sort_rays=False
        )
        branch = cbvh.blk_branch
        return pl.pallas_call(
            null_kernel,
            grid=(num_packets,),
            in_specs=[
                pl.BlockSpec(cbvh.blk_bbox_t.shape, lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                *ki._ray_specs(packet),
            ],
            out_specs=ki._out_specs(packet),
            out_shape=[
                jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.float32),
                jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((packet, 128), jnp.float32),
                pltpu.VMEM((packet, 128), jnp.int32),
                pltpu.VMEM((1, cbvh.blk_bbox_t.shape[1]), jnp.float32),
                pltpu.VMEM((1, 128), jnp.float32),
                pltpu.VMEM((8, branch + 1, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((8,)),
            ],
        )(cbvh.blk_bbox_t, cbvh.blk_const, rays, rays_t)

    timeit("null kernel (same specs)", lambda: null_call(o, d))

    # Null kernel WITHOUT the big scratch ring (isolate scratch cost)
    @jax.jit
    def null_small(o_, d_):
        rays, rays_t, num_packets, num_rays, _ = ki._prep_rays(
            o_, d_, None, packet, sort_rays=False
        )
        return pl.pallas_call(
            lambda bbox_ref, rays_ref, rayt_ref, out_t_ref, out_id_ref: (
                out_t_ref.__setitem__(slice(None),
                                      jnp.zeros(out_t_ref.shape, jnp.float32)),
                out_id_ref.__setitem__(slice(None),
                                       jnp.zeros(out_id_ref.shape, jnp.int32)),
            )[0],
            grid=(num_packets,),
            in_specs=[
                pl.BlockSpec(cbvh.blk_bbox_t.shape, lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
                *ki._ray_specs(packet),
            ],
            out_specs=ki._out_specs(packet),
            out_shape=[
                jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.float32),
                jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.int32),
            ],
        )(cbvh.blk_bbox_t, rays, rays_t)

    timeit("null kernel (no scratch)", lambda: null_small(o, d))


if __name__ == "__main__":
    main()
