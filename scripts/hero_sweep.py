"""Hero-scale intersector sweep: cluster ordering x DMA block x packet.

Times the raw HBM kernel on the 2M-triangle hero scene for
  - triangle ordering: morton (round-2) vs median-split (cluster_order)
  - oct branch (clusters per DMA block): 8 / 16 / 32
  - packet size: 256 / 512
on a coherent camera-like beam, with correctness vs the brute oracle and
per-packet work stats. Picks the config for kernels/intersect.py defaults.

Usage: python scripts/hero_sweep.py [--rays 65536] [--tris 2000000]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from isaklm_raytracer_tpu.accel.cluster import (
        build_cluster_bvh,
        cluster_order,
        morton_order,
        with_oct_branch,
    )
    from isaklm_raytracer_tpu.accel.traverse import nearest_hit_brute
    from isaklm_raytracer_tpu.kernels.intersect import nearest_hit_cluster_hbm
    from isaklm_raytracer_tpu.scene import procedural

    scene = procedural.hero_scene(args.tris)
    verts_raw = np.asarray(scene.vertices)

    rng = np.random.default_rng(1)
    o = jnp.broadcast_to(jnp.asarray([0.0, 2.0, -6.0], jnp.float32), (args.rays, 3))
    ang = (rng.random((args.rays, 2)) - 0.5) * 0.8
    d_raw = np.stack(
        [np.sin(ang[:, 0]), np.sin(ang[:, 1]) * 0.3 - 0.2, np.cos(ang[:, 0])],
        axis=1,
    ).astype(np.float32)
    d = jnp.asarray(d_raw / np.linalg.norm(d_raw, axis=1, keepdims=True))

    for name, order_fn in (("morton", morton_order), ("median", cluster_order)):
        t0 = time.perf_counter()
        order = order_fn(verts_raw)
        t_order = time.perf_counter() - t0
        verts = verts_raw[order]
        t0 = time.perf_counter()
        cbvh8 = build_cluster_bvh(verts)
        t_build = time.perf_counter() - t0
        print(f"[{name}] order {t_order:.1f}s build {t_build:.1f}s "
              f"clusters={cbvh8.num_clusters}")

        # Oracle reference once per ordering (it only depends on verts).
        vj = jnp.asarray(verts)
        tb, _ib, hb = jax.block_until_ready(
            jax.jit(nearest_hit_brute)(o[: args.check], d[: args.check], vj)
        )
        tb, hb = np.asarray(tb), np.asarray(hb)
        for branch in (8, 16, 32):
            cbvh = cbvh8 if branch == 8 else with_oct_branch(cbvh8, branch)
            for packet in (256, 512):
                kern = lambda: nearest_hit_cluster_hbm(
                    cbvh, o, d, packet=packet, oct_branch=branch
                )
                t, i, h = jax.block_until_ready(kern())
                # Gate EVERY candidate config vs the brute oracle (hit mask
                # exact, t to 1e-3 rel like bench.py verify_kernel) -- a
                # fast-but-wrong branch/packet combo must not win the sweep.
                hk = np.asarray(h[: args.check])
                mism = int((hk != hb).sum())
                both = hk & hb
                tk = np.asarray(t[: args.check])
                rel_dt = (
                    float((np.abs(tk[both] - tb[both])
                           / np.maximum(tb[both], 1e-3)).max())
                    if both.any() else 0.0
                )
                if mism or rel_dt > 1e-3:
                    print(f"  branch={branch} packet={packet}: ORACLE MISMATCH "
                          f"(hits {mism}, rel dt {rel_dt:.2e})")
                    raise SystemExit(1)
                for _ in range(1):
                    jax.block_until_ready(kern())
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    jax.block_until_ready(kern())
                dt = (time.perf_counter() - t0) / args.steps
                *_, st = nearest_hit_cluster_hbm(
                    cbvh, o, d, packet=packet, oct_branch=branch, stats=True
                )
                st = np.asarray(st)
                visits = st[:, 0]
                print(
                    f"  branch={branch:2d} packet={packet:3d}: "
                    f"{args.rays / dt / 1e6:5.2f} M rays/s  "
                    f"({dt * 1e3:6.1f} ms; visits/packet mean "
                    f"{visits.mean():6.1f} p95 {np.percentile(visits, 95):4.0f})"
                )


if __name__ == "__main__":
    main()
