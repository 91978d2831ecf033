"""TPU microbench + correctness probe for the Pallas intersectors.

Usage: python scripts/kernel_perf.py [--tris N] [--rays R] [--hero]
Compares kernel hits vs the brute oracle on a random soup, then times
the raw kernel (no integrator) to isolate intersector throughput.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# Runnable as `python scripts/kernel_perf.py` from the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def soup(num_tris: int, seed: int = 0, spread: float = 6.0):
    rng = np.random.default_rng(seed)
    base = (rng.random((num_tris, 1, 3)) - 0.5) * spread
    verts = base + (rng.random((num_tris, 3, 3)) - 0.5) * 0.25
    return verts.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=100_000)
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--check", type=int, default=512, help="#rays to check vs brute (0=skip)")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--hero", action="store_true", help="use the procedural hero scene instead of a soup")
    ap.add_argument("--coherent", action="store_true", help="camera-like coherent beam instead of random rays")
    ap.add_argument("--packet", type=int, default=256, help="rays per packet")
    args = ap.parse_args()

    from isaklm_raytracer_tpu.accel.cluster import build_cluster_bvh, cluster_order
    from isaklm_raytracer_tpu.accel.traverse import nearest_hit_brute
    from isaklm_raytracer_tpu.kernels.intersect import (
        VMEM_TABLE_LIMIT,
        nearest_hit_cluster,
        nearest_hit_cluster_hbm,
    )

    if args.hero:
        from isaklm_raytracer_tpu.scene import procedural

        scene = procedural.hero_scene(2_000_000)
        verts = np.asarray(scene.vertices)
    else:
        verts = soup(args.tris)
    order = cluster_order(verts)
    verts = verts[order]
    cbvh = build_cluster_bvh(verts)
    print(f"tris={verts.shape[0]} clusters={cbvh.num_clusters} "
          f"octs={cbvh.oct_bbox.shape[0]} table={cbvh.vmem_bytes/1e6:.1f}MB")

    import functools

    base = (nearest_hit_cluster if cbvh.vmem_bytes <= VMEM_TABLE_LIMIT
            else nearest_hit_cluster_hbm)
    kern = functools.partial(base, packet=args.packet)
    print("kernel:", base.__name__, "packet:", args.packet)

    rng = np.random.default_rng(1)
    if args.coherent:
        # camera-like beam: one origin, narrow direction cone
        o = jnp.broadcast_to(
            jnp.asarray([0.0, 2.0, -6.0], jnp.float32), (args.rays, 3)
        )
        ang = (rng.random((args.rays, 2)) - 0.5) * 0.8
        d_raw = np.stack(
            [np.sin(ang[:, 0]), np.sin(ang[:, 1]) * 0.3 - 0.2,
             np.cos(ang[:, 0])], axis=1
        ).astype(np.float32)
    else:
        o = jnp.asarray((rng.random((args.rays, 3)) - 0.5) * 8.0, jnp.float32)
        d_raw = rng.standard_normal((args.rays, 3)).astype(np.float32)
    d = jnp.asarray(d_raw / np.linalg.norm(d_raw, axis=1, keepdims=True))

    t, i, h = jax.block_until_ready(kern(cbvh, o, d))
    print(f"hit rate: {float(h.mean()):.3f}")

    if args.check:
        vj = jnp.asarray(verts)
        tb, ib, hb = nearest_hit_brute(o[: args.check], d[: args.check], vj)
        tk, ik, hk = t[: args.check], i[: args.check], h[: args.check]
        mism_h = int((hk != hb).sum())
        both = np.asarray(hk & hb)
        tdiff = np.abs(np.asarray(tk) - np.asarray(tb))[both]
        mism_i = int((np.asarray(ik)[both] != np.asarray(ib)[both]).sum())
        print(f"vs brute: hit mismatches={mism_h} id mismatches={mism_i} "
              f"max|dt|={tdiff.max() if both.any() else 0:.3e}")

    for _ in range(2):
        jax.block_until_ready(kern(cbvh, o, d))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        jax.block_until_ready(kern(cbvh, o, d))
    dt = (time.perf_counter() - t0) / args.steps
    print(f"raw kernel: {args.rays / dt / 1e6:.2f} M rays/s  ({dt*1e3:.1f} ms for {args.rays} rays)")

    if base is nearest_hit_cluster_hbm:
        # Exact work accounting -> roofline (BASELINE.md): per-packet oct
        # visits (64KB DMA each) and dense cluster intersections (256x128
        # ray-tri tests, ~60 VPU f32 ops each).
        *_, st = nearest_hit_cluster_hbm(cbvh, o, d, stats=True, packet=args.packet)
        st = np.asarray(st)
        visits, clus = st[:, 0], st[:, 1]
        packets = st.shape[0]
        packet_sz = args.rays // packets if packets else 0
        dma_bytes = float(visits.sum()) * (8 * 16 * 128 * 4)
        tri_tests = float(clus.sum()) * packet_sz * 128
        flops = tri_tests * 60.0
        print(
            f"stats: packets={packets} oct visits/packet "
            f"mean={visits.mean():.1f} p95={np.percentile(visits, 95):.0f} "
            f"max={visits.max()}; clusters intersected/packet "
            f"mean={clus.mean():.1f}"
        )
        print(
            f"roofline: DMA {dma_bytes / dt / 1e9:.1f} GB/s "
            f"(v5e peak ~819), ray-tri tests {tri_tests / dt / 1e9:.2f} G/s, "
            f"VPU ~{flops / dt / 1e12:.2f} TFLOP/s f32 (v5e VPU peak ~3.9), "
            f"per-visit wall {dt / max(visits.sum(), 1) * 1e6:.2f} us"
        )


if __name__ == "__main__":
    main()
