"""v3 blocked-kernel sweep: blk_branch x packet on the 2M-tri hero scene.

Times nearest_hit_cluster_blk (header-tile cull + quad-visit DMA ring)
against the round-3 v2 oct kernel on the same coherent camera-like beam,
every config gated by the brute oracle. Picks the production defaults for
accel.prepare_scene / integrator.render.make_trace_fn.

Usage: python scripts/blk_sweep.py [--rays 65536] [--tris 2000000]
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
    ap.add_argument("--check", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--branches", type=int, nargs="*", default=[16, 32, 64])
    ap.add_argument("--packets", type=int, nargs="*", default=[256, 512])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from isaklm_raytracer_tpu.accel.cluster import (
        build_cluster_bvh,
        cluster_order,
        with_blocks,
    )
    from isaklm_raytracer_tpu.accel.traverse import nearest_hit_brute
    from isaklm_raytracer_tpu.kernels.intersect import (
        nearest_hit_cluster_blk,
        nearest_hit_cluster_hbm,
    )
    from isaklm_raytracer_tpu.scene import procedural

    t0 = time.perf_counter()
    scene = procedural.hero_scene(args.tris)
    verts_raw = np.asarray(scene.vertices)
    print(f"scene gen {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    order = cluster_order(verts_raw)
    verts = verts_raw[order]
    cbvh = build_cluster_bvh(verts)
    print(f"order+build {time.perf_counter() - t0:.1f}s "
          f"clusters={cbvh.num_clusters}", flush=True)

    rng = np.random.default_rng(1)
    o = jnp.broadcast_to(jnp.asarray([0.0, 2.0, -6.0], jnp.float32),
                         (args.rays, 3))
    ang = (rng.random((args.rays, 2)) - 0.5) * 0.8
    d_raw = np.stack(
        [np.sin(ang[:, 0]), np.sin(ang[:, 1]) * 0.3 - 0.2, np.cos(ang[:, 0])],
        axis=1,
    ).astype(np.float32)
    d = jnp.asarray(d_raw / np.linalg.norm(d_raw, axis=1, keepdims=True))

    vj = jnp.asarray(verts)
    tb, _ib, hb = jax.block_until_ready(
        jax.jit(nearest_hit_brute)(o[: args.check], d[: args.check], vj)
    )
    tb, hb = np.asarray(tb), np.asarray(hb)

    def gate(t, h, label):
        hk = np.asarray(h[: args.check])
        mism = int((hk != hb).sum())
        both = hk & hb
        tk = np.asarray(t[: args.check])
        rel = (float((np.abs(tk[both] - tb[both])
                      / np.maximum(tb[both], 1e-3)).max())
               if both.any() else 0.0)
        if mism or rel > 1e-3:
            print(f"  {label}: ORACLE MISMATCH (hits {mism}, rel {rel:.2e})")
            raise SystemExit(1)

    def bench(label, kern, stats_kern):
        t, i, h = jax.block_until_ready(kern())
        gate(t, h, label)
        jax.block_until_ready(kern())
        t0 = time.perf_counter()
        for _ in range(args.steps):
            jax.block_until_ready(kern())
        dt = (time.perf_counter() - t0) / args.steps
        *_, st = stats_kern()
        st = np.asarray(st)
        print(f"  {label}: {args.rays / dt / 1e6:5.2f} M rays/s "
              f"({dt * 1e3:6.1f} ms; visits mean {st[:, 0].mean():6.1f} "
              f"p95 {np.percentile(st[:, 0], 95):4.0f}; "
              f"clusters mean {st[:, 1].mean():6.1f})", flush=True)
        return args.rays / dt

    # v2 baseline (oct kernel, branch 8)
    for packet in args.packets:
        bench(
            f"v2 oct8   packet={packet}",
            lambda packet=packet: nearest_hit_cluster_hbm(
                cbvh, o, d, packet=packet
            ),
            lambda packet=packet: nearest_hit_cluster_hbm(
                cbvh, o, d, packet=packet, stats=True
            ),
        )

    from isaklm_raytracer_tpu.accel.cluster import with_mxu_blocks

    best = (0.0, None)
    for branch in args.branches:
        cb = with_blocks(cbvh, branch)
        for packet in args.packets:
            r = bench(
                f"v3 blk{branch:<3d} packet={packet}",
                lambda cb=cb, packet=packet: nearest_hit_cluster_blk(
                    cb, o, d, packet=packet
                ),
                lambda cb=cb, packet=packet: nearest_hit_cluster_blk(
                    cb, o, d, packet=packet, stats=True
                ),
            )
            if r > best[0]:
                best = (r, ("blk", branch, packet))
        if branch > 64:
            continue  # mxu ring would exceed VMEM
        cm = with_mxu_blocks(cbvh, branch)
        for packet in args.packets:
            r = bench(
                f"v4 mxu{branch:<3d} packet={packet}",
                lambda cm=cm, packet=packet: nearest_hit_cluster_blk(
                    cm, o, d, packet=packet, mxu=True
                ),
                lambda cm=cm, packet=packet: nearest_hit_cluster_blk(
                    cm, o, d, packet=packet, mxu=True, stats=True
                ),
            )
            if r > best[0]:
                best = (r, ("mxu", branch, packet))
    print(f"best: {best[0] / 1e6:.2f} M rays/s at {best[1]}")


if __name__ == "__main__":
    main()
