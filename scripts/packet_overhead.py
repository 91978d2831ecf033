"""Decompose the HBM kernels' fixed per-packet cost (BASELINE.md roofline).

--kernel blk (default, the v3 production path) or oct (the v2 kernel).

Three ray populations on the 2M-tri hero scene, all 65,536 rays:
  miss     -- rays outside the scene pointing away: ~0 oct visits, so
              wall-clock ~= packets x F (the fixed dense-cull + prologue
              cost per packet program);
  coherent -- camera-like beam (the bench's primary-ray regime);
  bounce   -- rays originating ON scene surfaces with cosine-ish random
              directions (the deep-bounce regime, between the extremes).
Fits time = packets x (F + visits x v) and prints F, v per packet size.

Usage: python scripts/packet_overhead.py [--rays 65536]
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
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--kernel", default="blk", choices=["blk", "oct"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from isaklm_raytracer_tpu.accel.cluster import build_cluster_bvh, cluster_order
    from isaklm_raytracer_tpu.kernels.intersect import (
        nearest_hit_cluster_blk,
        nearest_hit_cluster_hbm,
    )
    from isaklm_raytracer_tpu.scene import procedural

    scene = procedural.hero_scene(args.tris)
    verts = np.asarray(scene.vertices)
    verts = verts[cluster_order(verts)]
    cbvh = build_cluster_bvh(
        verts, blk_branch=32 if args.kernel == "blk" else None
    )
    kern_fn = (nearest_hit_cluster_blk if args.kernel == "blk"
               else nearest_hit_cluster_hbm)
    lo = verts.reshape(-1, 3).min(axis=0)
    hi = verts.reshape(-1, 3).max(axis=0)
    rng = np.random.default_rng(1)
    n = args.rays

    def normed(a):
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    pops = {}
    # miss: far above the scene, pointing up
    o = np.tile((hi + (hi - lo)).astype(np.float32), (n, 1))
    d = normed(rng.standard_normal((n, 3)).astype(np.float32) * 0.05 + [0, 1, 0])
    pops["miss"] = (o, d)
    # coherent camera beam
    o = np.tile(np.asarray([0.0, 2.0, -6.0], np.float32), (n, 1))
    ang = (rng.random((n, 2)) - 0.5) * 0.8
    d = normed(np.stack([np.sin(ang[:, 0]), np.sin(ang[:, 1]) * 0.3 - 0.2,
                         np.cos(ang[:, 0])], axis=1).astype(np.float32))
    pops["coherent"] = (o, d)
    # bounce: origins at random triangle vertices, random upper directions
    pick = rng.integers(0, verts.shape[0], n)
    o = verts[pick, 0] + 1e-3
    d = normed(rng.standard_normal((n, 3)).astype(np.float32))
    pops["bounce"] = (o, d)

    for packet in (128, 256, 512):
        rows = []
        for name, (o, d) in pops.items():
            o_j, d_j = jnp.asarray(o), jnp.asarray(d)
            kern = lambda: kern_fn(cbvh, o_j, d_j, packet=packet)
            jax.block_until_ready(kern())
            jax.block_until_ready(kern())
            t0 = time.perf_counter()
            for _ in range(args.steps):
                jax.block_until_ready(kern())
            dt = (time.perf_counter() - t0) / args.steps
            *_, st = kern_fn(cbvh, o_j, d_j, packet=packet, stats=True)
            visits = float(np.asarray(st)[:, 0].mean())
            packets = n // packet
            rows.append((name, dt, visits, packets))
            print(f"packet={packet:3d} {name:9s}: {n / dt / 1e6:5.2f} M rays/s "
                  f"({dt * 1e3:6.1f} ms; visits/packet {visits:6.1f})")
        # two-point fit on (miss, bounce): F + v*visits
        (nm, t1, v1, p), (_, t2, v2, _), (_, t3, v3, _) = rows
        v = (t3 / p - t1 / p) / max(v3 - v1, 1e-9)
        F = t1 / p - v * v1
        print(f"packet={packet:3d} fit: F = {F * 1e6:.0f} us/packet, "
              f"v = {v * 1e6:.2f} us/visit "
              f"(coherent pred {((F + v * v2) * p) * 1e3:.1f} ms vs {t2 * 1e3:.1f})")


if __name__ == "__main__":
    main()
