"""Small-scene intersector sweep: flat vs queue VMEM kernel crossover.

Times nearest_hit_cluster_flat (unconditional unrolled) against
nearest_hit_cluster (dense cull + extract-min queue) across cluster counts,
on the ray population that matters (camera-ish beam at the default-preset
scale), to pin kernels/intersect.py FLAT_CLUSTER_LIMIT.

Usage: python scripts/small_sweep.py [--rays 262144]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--check", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from isaklm_raytracer_tpu.accel.cluster import (
        build_cluster_bvh,
        cluster_order,
        with_mxu_tiles,
    )
    from isaklm_raytracer_tpu.accel.traverse import nearest_hit_brute
    from isaklm_raytracer_tpu.kernels.intersect import (
        nearest_hit_cluster,
        nearest_hit_cluster_flat,
        nearest_hit_cluster_flat_mxu,
    )

    rng = np.random.default_rng(3)
    o_np = (rng.random((args.rays, 3)) - 0.5).astype(np.float32) * 0.5
    o_np[:, 2] -= 3.0
    d_np = rng.standard_normal((args.rays, 3)).astype(np.float32)
    d_np[:, 2] = np.abs(d_np[:, 2]) + 1.5  # forward beam
    d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))
    o = jnp.asarray(o_np)

    for num_tris in (300, 660, 1200, 2500, 5000, 8000):
        base = (rng.random((num_tris, 1, 3)) - 0.5) * 4.0
        verts = (base + (rng.random((num_tris, 3, 3)) - 0.5) * 0.6).astype(
            np.float32
        )
        verts = verts[cluster_order(verts)]
        cbvh = with_mxu_tiles(build_cluster_bvh(verts))
        real_c = -(-num_tris // 128)
        vj = jnp.asarray(verts)
        tb, _ib, hb = jax.block_until_ready(
            jax.jit(nearest_hit_brute)(o[: args.check], d[: args.check], vj)
        )
        hb = np.asarray(hb)

        row = [f"tris={num_tris:5d} clusters={real_c:2d}"]
        for name, kern in (
            ("flat", nearest_hit_cluster_flat),
            ("flat_mxu", nearest_hit_cluster_flat_mxu),
            ("queue", nearest_hit_cluster),
        ):
            t, i, h = jax.block_until_ready(kern(cbvh, o, d))
            mism = int((np.asarray(h[: args.check]) != hb).sum())
            if mism:
                print(f"  {name} tris={num_tris}: ORACLE MISMATCH {mism}")
                raise SystemExit(1)
            jax.block_until_ready(kern(cbvh, o, d))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                jax.block_until_ready(kern(cbvh, o, d))
            dt = (time.perf_counter() - t0) / args.steps
            row.append(f"{name} {args.rays / dt / 1e6:7.1f} M rays/s")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
