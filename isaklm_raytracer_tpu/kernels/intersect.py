"""Pallas TPU kernels: packet nearest-hit over the cluster BVH.

The hot inner kernel of the framework (the TPU re-architecture of
trace_ray.cuh:244-318). One grid program owns a PACKET of B rays and runs
a DENSE-CULL + PRIORITY-QUEUE traversal:

  1. Dense cull (pure VPU, no loops): slab-test every ray against EVERY
     box in one (B, N) elementwise pass, reduced to a per-box visitation
     key = min over active rays of the box entry distance (+inf = no ray
     pierces it). Replaces a scalar fori over boxes -- the scalar-loop
     overhead, not the FLOPs, dominated the old kernel at hero scale.
  2. Priority-queue loop (`lax.while_loop`): repeatedly extract the
     nearest unvisited box from the key vector and intersect its
     triangles. Because visitation is globally front-to-back, the loop
     EXITS the moment the next box's entry distance exceeds the packet's
     running-worst hit (the exact analog of the reference KD walk's
     early-return, trace_ray.cuh:308-314) -- no ordering heuristics, no
     wasted visits behind the first hit front.

The kernel FAMILY (shared maths, picked by integrator.render
.intersector_name; all oracle-gated in CI and by bench.py):

  - `nearest_hit_cluster_flat` (tiny scenes, <= FLAT_CLUSTER_LIMIT real
    clusters): unconditionally intersects every cluster, fully unrolled --
    no queue machinery at all. Fastest up to at least 63 clusters
    (scripts/small_sweep.py).
  - `nearest_hit_cluster` (VMEM-resident queue): the whole (C, 16, 128)
    constant table lives in VMEM; the queue is over CLUSTERS. Mid scenes
    up to ~100K triangles.
  - `nearest_hit_cluster_blk` (v3/v4, the HERO production path): the
    blocked table stays in HBM; the queue is over DMA BLOCKS of
    `blk_branch` clusters (production: 128, the header-lane maximum --
    every halving of the block count 32 -> 64 -> 128 won under per-ray
    termination), each prefixed by a header tile carrying
    component-major cluster bboxes, so a landed block's clusters are
    culled in ONE dense VPU pass and walked by an extract-min
    mini-queue; `pipeline_depth` blocks retire per outer iteration over
    a 2x-deep DMA ring. In the default per_ray=True mode (v4, round 5)
    the visitation keys are recomputed each iteration against EACH
    RAY'S OWN best hit (per-ray early termination -- the packet analog
    of the reference's independent SIMT walks, trace_ray.cuh:244-318),
    which collapsed deep-bounce visits to the per-ray NEEDED union and
    lifted the hero integrator 1.49 -> 2.49 M rays/s fwd at the final
    b128/p128 config (BASELINE.md round 5). Optional per-ray `t_max`
    search windows (rays column 7) bound NEE shadow walks at the light
    distance. per_ray=False keeps the round-4 global-tmax behavior for
    scenes whose block count overflows the entry-matrix VMEM budget.
  - `nearest_hit_cluster_blk(mxu=True)` / `nearest_hit_cluster_flat_mxu`:
    documented NEGATIVE result -- the six ray/tri dot products as
    per-cluster (2B, 8) @ (8, 128) MXU matmuls measured SLOWER (too-small
    matmuls + 2x DMA volume).
  - `nearest_hit_cluster_hbm` (v2): the 8-cluster-oct pair-visit
    predecessor of blk, kept as the no-extra-table fallback.

Design rules that make this fast on the VPU:
  - NO per-ray gathers or scatters anywhere: triangle constants stream in
    as (1, 128) rows broadcast over ray sublanes, ray components as (B, 1)
    columns broadcast over triangle lanes;
  - NO per-visit cross-lane reductions beyond the queue's extract-min (a
    (1, N) min) and the packet tmax ((B, 128) min/max): the running
    nearest hit lives in two (B, 128) VMEM scratch refs holding PER-LANE
    minima (lane = tri slot), updated with an elementwise min per visit;
    the cross-lane argmin happens once per packet after the loop;
  - triangle ids are c*128 + lane -- the scene is spatially renumbered at
    build time (accel.cluster.cluster_order median splits in production;
    morton_order is also valid), so no id table exists at all.

Correctness does not depend on traversal order: the cluster build is a
partition (no straddler duplicates, unlike create_kd_tree.cuh:176-218), so
the nearest hit is the plain min over every cluster whose box a ray
pierces; the early exit only skips boxes whose entry distance exceeds
EVERY active ray's current best (min-over-rays entry > max-over-rays
best). Intersection maths and acceptance rules match the reference
(trace_ray.cuh:73-113): plane hit, Cramer barycentric inside test,
t >= eps, ties to the lowest triangle id (lane/cluster order = id order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaklm_raytracer_tpu.accel.cluster import OCT_BRANCH, ClusterBVH

DEFAULT_PACKET = 256
# VMEM budget for the resident-table kernel; beyond this the HBM+DMA
# variant is used (make_trace_fn picks automatically).
VMEM_TABLE_LIMIT = 6 * 1024 * 1024
# At or below this many REAL clusters the flat unconditional kernel beats
# the priority-queue kernel (its per-iteration overhead exceeds the saved
# intersections; see _flat_kernel). Measured on a 262K-ray beam
# (scripts/small_sweep.py): flat wins at every size tried up to 63
# clusters (8K tris: 3.7 vs 3.1 M rays/s; 660 tris: 7.9 vs 5.4).
FLAT_CLUSTER_LIMIT = 64
_INF = 3.4e38  # python scalars: jnp constants can't be captured by kernels
_BIG_ID = 2**31 - 1


def _ray_columns(rays_ref):
    """(B, 1) per-component columns, broadcast against (1, 128) tri rows."""
    return (
        rays_ref[:, 0:1], rays_ref[:, 1:2], rays_ref[:, 2:3],
        rays_ref[:, 3:4], rays_ref[:, 4:5], rays_ref[:, 5:6],
        rays_ref[:, 6:7] > 0.0,
    )


def _compact_rays(rayt_ref):
    """(8, B/8) compact transposed components for the slab tests."""
    return (
        rayt_ref[0, 0], rayt_ref[0, 1], rayt_ref[0, 2],
        rayt_ref[0, 3], rayt_ref[0, 4], rayt_ref[0, 5],
        rayt_ref[0, 6] > 0.0,
    )


def _make_box_any(compact, t_eps):
    """Packet-level conservative slab test against one box.

    box(row) must return 6 scalars (minx miny minz maxx maxy maxz).
    Conservative under NaN (0 * inf when a ray origin lies on a slab):
    the cull comparisons are false on NaN, so NaN lanes count as hits.
    """
    oxt, oyt, ozt, ixt, iyt, izt, actt = compact

    def box_any(box6, tmax):
        bx0, by0, bz0, bx1, by1, bz1 = box6
        t1x = (bx0 - oxt) * ixt
        t2x = (bx1 - oxt) * ixt
        t1y = (by0 - oyt) * iyt
        t2y = (by1 - oyt) * iyt
        t1z = (bz0 - ozt) * izt
        t2z = (bz1 - ozt) * izt
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        cull = (near > far) | (far < t_eps) | (near > tmax)
        return jnp.any((~cull) & actt)

    return box_any


_CUT = 1e38  # visitation keys >= this mean "no ray pierces the box"


def _dense_near(box_t_ref, rays_ref, t_eps):
    """Dense slab test: every ray x every box in one VPU pass.

    box_t_ref: (8, N) component-major boxes (rows minxyz, maxxyz, valid).
    Returns:
      keys (1, N): per-box visitation key = min over active rays of the
        clamped box entry distance, +inf where no active ray pierces it;
      far_bound (B, 1): per-ray max box-EXIT distance over the boxes the
        ray pierces (-inf if none). No hit can lie beyond it, so it caps
        the packet tmax for rays that miss everything -- without it one
        escaping ray (best_t = +inf) would disable the early exit for the
        whole packet.
    Conservative under NaN (origin on a zero-direction slab): the miss
    comparisons are false on NaN, and NaN keys collapse to 0 (visit
    first).
    """
    ox, oy, oz, dx, dy, dz, act = _ray_columns(rays_ref)
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    bx0, by0, bz0 = box_t_ref[0:1, :], box_t_ref[1:2, :], box_t_ref[2:3, :]
    bx1, by1, bz1 = box_t_ref[3:4, :], box_t_ref[4:5, :], box_t_ref[5:6, :]
    valid = box_t_ref[6:7, :] > 0.0

    t1x, t2x = (bx0 - ox) * ix, (bx1 - ox) * ix  # (B, N)
    t1y, t2y = (by0 - oy) * iy, (by1 - oy) * iy
    t1z, t2z = (bz0 - oz) * iz, (bz1 - oz) * iz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    miss = (near > far) | (far < t_eps)  # false on NaN -> conservative hit
    key = jnp.where(miss | (~act), _INF, jnp.maximum(near, 0.0))
    key = jnp.where(key != key, 0.0, key)  # NaN -> visit first
    key = jnp.where(valid, key, _INF)

    pierce = (~miss) & valid  # (B, N); NaN-conservative (pierce on NaN)
    far_cap = jnp.where(pierce, far, -_INF)
    far_cap = jnp.where(far_cap != far_cap, _INF, far_cap)  # NaN -> no cap
    far_bound = jnp.max(far_cap, axis=1, keepdims=True)  # (B, 1)
    return jnp.min(key, axis=0, keepdims=True), far_bound


def _make_extract(near_ref):
    """Extract-min over the (1, N) visitation keys; marks the winner
    visited. Ties go to the lowest index; an all-+inf vector returns
    (+inf, <unvisited-but-irrelevant index>)."""
    n = near_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def extract():
        nv = near_ref[0:1, :]
        m = jnp.min(nv)
        idx = jnp.min(jnp.where(nv <= m, iota, _BIG_ID))
        near_ref[0:1, :] = jnp.where(iota == idx, _INF, nv)
        return m, idx

    return extract


def _make_intersect(cols, lane_id, best_t_ref, best_id_ref, t_eps):
    """Dense B x 128 intersection + per-lane best update.

    blk: (16, 128) constant block (see accel.cluster); c: cluster index.
    Matches trace_ray.cuh:73-113 acceptance exactly.
    """
    ox, oy, oz, dx, dy, dz, act = cols

    def intersect(blk, c):
        nx, ny, nz = blk[0:1], blk[1:2], blk[2:3]
        e1x, e1y, e1z = blk[3:4], blk[4:5], blk[5:6]
        e2x, e2y, e2z = blk[6:7], blk[7:8], blk[8:9]
        np1, p1e1, p1e2 = blk[9:10], blk[10:11], blk[11:12]
        ca, cb, cc = blk[12:13], blk[13:14], blk[14:15]

        ddn = dx * nx + dy * ny + dz * nz  # (B, 128)
        odn = ox * nx + oy * ny + oz * nz
        s = (np1 - odn) / ddn
        de1 = dx * e1x + dy * e1y + dz * e1z
        oe1 = ox * e1x + oy * e1y + oz * e1z
        d20 = oe1 + s * de1 - p1e1
        de2 = dx * e2x + dy * e2y + dz * e2z
        oe2 = ox * e2x + oy * e2y + oz * e2z
        d21 = oe2 + s * de2 - p1e2
        b = d20 * ca - d21 * cb
        c3 = d21 * cc - d20 * cb
        a = 1.0 - b - c3
        inside = (
            (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
            & (c3 >= 0.0) & (c3 <= 1.0)
        )
        valid = (ddn != 0.0) & (s >= t_eps) & inside & act
        tval = jnp.where(valid, s, _INF)
        # Per-lane strictly-closer update; earlier clusters win ties, which
        # is also lowest-id (Morton renumbering makes id = c*128 + lane).
        better = tval < best_t_ref[:]
        best_id_ref[:] = jnp.where(better, c * 128 + lane_id, best_id_ref[:])
        best_t_ref[:] = jnp.where(better, tval, best_t_ref[:])

    return intersect


def _make_intersect_mxu(
    do_ref, act, lane_id, best_t_ref, best_id_ref, t_eps
):
    """MXU-assisted dense B x 128 intersection + per-lane best update.

    All six ray/triangle dot products (d.n, o.n, d.e1, o.e1, d.e2, o.e2)
    come from three (2B, 8) @ (8, 128) matmuls against the cluster's
    weight tiles (accel.cluster.with_mxu_blocks layout): rows 0..B-1 of
    `do_ref` carry ray directions, rows B..2B-1 origins, so one product
    yields both the d-dot and the o-dot of a quantity. The VPU keeps only
    the cheap tail (plane t, barycentric fold, acceptance) -- roughly half
    the elementwise ops of `_make_intersect`, with the dots running on the
    otherwise-idle MXU. Acceptance rules identical (trace_ray.cuh:73-113).
    """
    dims = (((1,), (0,)), ((), ()))

    def intersect(w1, w2, c):
        batch = best_t_ref.shape[0]
        do = do_ref[:]  # (2B, 8)
        dots_n = jax.lax.dot_general(
            do, w1[0:8], dims, preferred_element_type=jnp.float32
        )  # (2B, 128)
        dots_e1 = jax.lax.dot_general(
            do, w1[8:16], dims, preferred_element_type=jnp.float32
        )
        dots_e2 = jax.lax.dot_general(
            do, w2[0:8], dims, preferred_element_type=jnp.float32
        )
        ddn, odn = dots_n[0:batch], dots_n[batch:]
        de1, oe1 = dots_e1[0:batch], dots_e1[batch:]
        de2, oe2 = dots_e2[0:batch], dots_e2[batch:]
        np1, p1e1, p1e2 = w2[8:9], w2[9:10], w2[10:11]
        ca, cb, cc = w2[11:12], w2[12:13], w2[13:14]

        s = (np1 - odn) / ddn
        d20 = oe1 + s * de1 - p1e1
        d21 = oe2 + s * de2 - p1e2
        b = d20 * ca - d21 * cb
        c3 = d21 * cc - d20 * cb
        a = 1.0 - b - c3
        inside = (
            (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
            & (c3 >= 0.0) & (c3 <= 1.0)
        )
        valid = (ddn != 0.0) & (s >= t_eps) & inside & act
        tval = jnp.where(valid, s, _INF)
        better = tval < best_t_ref[:]
        best_id_ref[:] = jnp.where(better, c * 128 + lane_id, best_id_ref[:])
        best_t_ref[:] = jnp.where(better, tval, best_t_ref[:])

    return intersect


def _finalize(batch, best_t_ref, best_id_ref, out_t_ref, out_id_ref):
    """One cross-lane argmin per packet: nearest t, ties to lowest id."""
    tmin = jnp.min(best_t_ref[:], axis=1, keepdims=True)  # (B, 1)
    idmin = jnp.min(
        jnp.where(best_t_ref[:] <= tmin, best_id_ref[:], _BIG_ID),
        axis=1,
        keepdims=True,
    )
    out_t_ref[:] = jnp.broadcast_to(tmin, (batch, 8))
    out_id_ref[:] = jnp.broadcast_to(idmin, (batch, 8))


def _packet_tmax(best_t_ref, act, cap):
    """Farthest any active ray still needs to look: max over rays of
    min(per-ray running-best t, per-ray far bound). `cap` (B, 1) is the
    dense phase's max box-exit distance per ray -- it keeps rays that miss
    everything (best stays +inf) from disabling the early exit."""
    per_ray = jnp.min(best_t_ref[:], axis=1, keepdims=True)  # (B, 1)
    return jnp.max(jnp.where(act, jnp.minimum(per_ray, cap), -_INF))


def _init_best(batch, best_t_ref, best_id_ref, seed_t=None):
    """seed_t (B, 1): optional per-ray search window (rays column 7).

    Seeding the running best with a finite t bounds the walk -- any block
    (and cluster) whose entry lies at or beyond the seed is never needed,
    because a hit there could not beat the window. Used for NEE shadow
    rays (the light sample's distance is a known upper bound on the only
    hit that matters). The winning id starts at _BIG_ID either way, so a
    "hit" is id != _BIG_ID, not t < inf (see _unpack)."""
    if seed_t is None:
        best_t_ref[:] = jnp.full((batch, 128), _INF, jnp.float32)
    else:
        best_t_ref[:] = jnp.broadcast_to(seed_t, (batch, 128))
    best_id_ref[:] = jnp.full((batch, 128), _BIG_ID, jnp.int32)


def _vmem_kernel(
    clu_t_ref,  # VMEM (8, Np): component-major cluster boxes + valid row
    tri_ref,  # VMEM (C, 16, 128)
    rays_ref,  # VMEM (B, 8): ox oy oz dx dy dz active pad
    rayt_ref,  # VMEM (1, 8, 8, B/8): transposed compact comps + 1/d + active
    out_t_ref,  # VMEM (B, 8)
    out_id_ref,  # VMEM (B, 8) int32
    best_t_ref,  # VMEM scratch (B, 128): per-lane running min t
    best_id_ref,  # VMEM scratch (B, 128) int32: per-lane winning tri id
    near_ref,  # VMEM scratch (1, Np): per-cluster visitation keys
    *,
    t_eps: float,
):
    batch = rays_ref.shape[0]
    cols = _ray_columns(rays_ref)
    act = cols[6]
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    _init_best(batch, best_t_ref, best_id_ref, seed_t=rays_ref[:, 7:8])
    intersect = _make_intersect(cols, lane_id, best_t_ref, best_id_ref, t_eps)

    keys, far_bound = _dense_near(clu_t_ref, rays_ref, t_eps)
    near_ref[0:1, :] = keys
    extract = _make_extract(near_ref)

    m0, i0 = extract()
    tmax0 = _packet_tmax(best_t_ref, act, far_bound)

    def cond(c):
        m, _i, tmax = c
        return (m < _CUT) & (m <= tmax)

    def body(c):
        _m, i, _tmax = c
        intersect(tri_ref[i], i)
        m2, i2 = extract()
        return m2, i2, _packet_tmax(best_t_ref, act, far_bound)

    jax.lax.while_loop(cond, body, (m0, i0, tmax0))
    _finalize(batch, best_t_ref, best_id_ref, out_t_ref, out_id_ref)


def _hbm_kernel(
    oct_t_ref,  # VMEM (8, Np): component-major oct boxes + valid row
    tri_ref,  # ANY/HBM (C, 16, 128)
    rays_ref,  # VMEM (B, 8)
    rayt_ref,  # VMEM (1, 8, 8, B/8)
    out_t_ref,  # VMEM (B, 8)
    out_id_ref,  # VMEM (B, 8) int32
    *rest,  # [out_stats_ref if stats] + scratch refs
    t_eps: float,
    stats: bool = False,
    oct_branch: int = OCT_BRANCH,
):
    if stats:
        out_stats_ref, *rest = rest
    (best_t_ref, best_id_ref, near_ref, buf_ref, sems) = rest
    batch = rays_ref.shape[0]
    cols = _ray_columns(rays_ref)
    act = cols[6]
    box_any = _make_box_any(_compact_rays(rayt_ref), t_eps)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    _init_best(batch, best_t_ref, best_id_ref, seed_t=rays_ref[:, 7:8])
    intersect = _make_intersect(cols, lane_id, best_t_ref, best_id_ref, t_eps)

    keys, far_bound = _dense_near(oct_t_ref, rays_ref, t_eps)
    near_ref[0:1, :] = keys
    extract = _make_extract(near_ref)

    def oct_dma(slot, o_idx):
        return pltpu.make_async_copy(
            tri_ref.at[pl.ds(o_idx * oct_branch, oct_branch)],
            buf_ref.at[slot],
            sems.at[slot],
        )

    def visit(slot, oct_i, tmax, n_clu):
        """Wait the oct's landed block and intersect its clusters."""
        oct_dma(slot, oct_i).wait()

        def clu_body(k, n):
            box6 = (
                buf_ref[slot, k, 15, 0], buf_ref[slot, k, 15, 1],
                buf_ref[slot, k, 15, 2], buf_ref[slot, k, 15, 3],
                buf_ref[slot, k, 15, 4], buf_ref[slot, k, 15, 5],
            )
            pierced = box_any(box6, tmax)

            @pl.when(pierced)
            def _():
                intersect(buf_ref[slot, k], oct_i * oct_branch + k)

            return n + pierced.astype(jnp.int32)

        return jax.lax.fori_loop(0, oct_branch, clu_body, n_clu)

    # PAIR-VISIT pipeline over a 4-slot DMA ring: each loop iteration
    # retires TWO octs and prefetches the next two. The sweep-fit cost
    # model (scripts/hero_sweep.py, BASELINE.md roofline) shows ~5 us of
    # PER-ITERATION overhead (extract-min + tmax reduction + Mosaic loop
    # turnaround) against ~1 us of actual intersection math, so halving
    # the iteration count is worth more than any FLOP saving. The second
    # oct of a pair skips the early-exit re-check (its DMA is already in
    # flight and must be waited anyway); that costs at most one extra oct
    # visit per packet on the final iteration.
    m0, i0 = extract()
    m1, i1 = extract()

    @pl.when(m0 < _CUT)
    def _():
        oct_dma(jnp.int32(0), i0).start()

    @pl.when(m1 < _CUT)
    def _():
        oct_dma(jnp.int32(1), i1).start()

    def cond(c):
        m_a, _ia, _mb, _ib, _base, tmax, _nv, _nc = c
        return (m_a < _CUT) & (m_a <= tmax)

    def body(c):
        m_a, i_a, m_b, i_b, base, tmax, n_visit, n_clu = c
        m2, i2 = extract()
        m3, i3 = extract()

        # Prefetch the next pair into the two slots retired LAST iteration
        # (their reads completed in program order -- no write hazard).
        @pl.when(m2 < _CUT)
        def _():
            oct_dma((base + 2) & 3, i2).start()

        @pl.when(m3 < _CUT)
        def _():
            oct_dma((base + 3) & 3, i3).start()

        n_clu = visit(base, i_a, tmax, n_clu)
        n_visit = n_visit + 1

        def do_b(args):
            nv, nc = args
            return nv + 1, visit((base + 1) & 3, i_b, tmax, nc)

        n_visit, n_clu = jax.lax.cond(
            m_b < _CUT, do_b, lambda args: args, (n_visit, n_clu)
        )
        return ((m2, i2, m3, i3, (base + 2) & 3,
                 _packet_tmax(best_t_ref, act, far_bound), n_visit, n_clu))

    m_fa, i_fa, m_fb, i_fb, base_f, _tm, n_visit, n_clu = jax.lax.while_loop(
        cond, body,
        (m0, i0, m1, i1, jnp.int32(0),
         _packet_tmax(best_t_ref, act, far_bound),
         jnp.int32(0), jnp.int32(0)),
    )

    # Drain: the final pair's DMAs (started last iteration or pre-loop)
    # were never waited; a started DMA must complete before kernel return.
    @pl.when(m_fa < _CUT)
    def _():
        oct_dma(base_f, i_fa).wait()

    @pl.when(m_fb < _CUT)
    def _():
        oct_dma((base_f + 1) & 3, i_fb).wait()

    _finalize(batch, best_t_ref, best_id_ref, out_t_ref, out_id_ref)
    if stats:
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        out_stats_ref[:] = jnp.where(
            lane == 0, n_visit, jnp.where(lane == 1, n_clu, 0)
        )


def _flat_kernel(
    tri_ref,  # VMEM (C, 16, 128)
    rays_ref,  # VMEM (B, 8)
    rayt_ref,  # VMEM (1, 8, 8, B/8) (unused; shared ray prep layout)
    out_t_ref,  # VMEM (B, 8)
    out_id_ref,  # VMEM (B, 8) int32
    best_t_ref,  # VMEM scratch (B, 128)
    best_id_ref,  # VMEM scratch (B, 128) int32
    *,
    t_eps: float,
):
    """Tiny-scene fast path: intersect EVERY cluster unconditionally.

    For tables of a few clusters the priority-queue machinery (dense cull,
    extract-min, per-iteration packet-tmax reduction, Mosaic while_loop
    turnaround) costs more than just running the ~40-FMA intersection over
    all clusters back to back -- a fully unrolled straight-line vector
    program. Crossover measured vs the queue kernel at ~16 clusters
    (scripts/kernel_perf.py); make_trace_fn picks this variant below
    FLAT_CLUSTER_LIMIT."""
    batch = rays_ref.shape[0]
    cols = _ray_columns(rays_ref)
    act = cols[6]
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    _init_best(batch, best_t_ref, best_id_ref, seed_t=rays_ref[:, 7:8])
    intersect = _make_intersect(cols, lane_id, best_t_ref, best_id_ref, t_eps)

    # All-inactive packets (compaction padding tail) skip the math entirely.
    @pl.when(jnp.any(act))
    def _():
        for c in range(tri_ref.shape[0]):  # static unroll
            intersect(tri_ref[c], c)

    _finalize(batch, best_t_ref, best_id_ref, out_t_ref, out_id_ref)


def _flat_mxu_kernel(
    tiles_ref,  # VMEM (C, 2, 16, 128): per-cluster MXU tile pairs
    rays_ref,  # VMEM (B, 8)
    rayt_ref,  # VMEM (1, 8, 8, B/8) (unused; shared ray prep layout)
    out_t_ref,  # VMEM (B, 8)
    out_id_ref,  # VMEM (B, 8) int32
    best_t_ref,  # VMEM scratch (B, 128)
    best_id_ref,  # VMEM scratch (B, 128) int32
    do_ref,  # VMEM scratch (2B, 8)
    *,
    t_eps: float,
):
    """Tiny-scene fast path with MXU dot products (see _flat_kernel and
    _make_intersect_mxu)."""
    batch = rays_ref.shape[0]
    cols = _ray_columns(rays_ref)
    act = cols[6]
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    _init_best(batch, best_t_ref, best_id_ref, seed_t=rays_ref[:, 7:8])
    do_ref[:] = jnp.zeros((2 * batch, 8), jnp.float32)
    for j in range(3):
        do_ref[0:batch, j:j + 1] = rays_ref[:, 3 + j:4 + j]
        do_ref[batch:2 * batch, j:j + 1] = rays_ref[:, j:j + 1]
    intersect = _make_intersect_mxu(
        do_ref, act, lane_id, best_t_ref, best_id_ref, t_eps
    )

    @pl.when(jnp.any(act))
    def _():
        for c in range(tiles_ref.shape[0]):  # static unroll
            intersect(tiles_ref[c, 0], tiles_ref[c, 1], c)

    _finalize(batch, best_t_ref, best_id_ref, out_t_ref, out_id_ref)


def _blk_kernel(
    blk_bbox_t_ref,  # VMEM (8, NBp): component-major block boxes + valid row
    blk_ref,  # ANY/HBM (NB, branch + 1, 16, 128): header + cluster tiles
    rays_ref,  # VMEM (B, 8)
    rayt_ref,  # VMEM (1, 8, 8, B/8)
    out_t_ref,  # VMEM (B, 8)
    out_id_ref,  # VMEM (B, 8) int32
    *rest,  # [out_stats_ref if stats] + scratch refs
    t_eps: float,
    stats: bool = False,
    branch: int = 32,
    mxu: bool = False,
    per_ray: bool = False,
    depth: int = 4,
):
    """v3 big-scene kernel: QUAD-visit DMA pipeline over BLOCKED clusters.

    Differences vs `_hbm_kernel` (the v2 oct kernel), driven by the round-3
    roofline (BASELINE.md: 7.4 us wall per 8-cluster visit vs ~2 us of
    intersection math -- fixed per-visit/per-iteration cost dominates):

      1. DMA unit = a BLOCK of `branch` (16/32/64) clusters, so the queue
         has NB = C/branch entries and a packet retires the same geometry
         in ~branch/8 x fewer visits;
      2. each landed block's clusters are culled in ONE dense VPU pass
         against a HEADER tile embedded in the block (cluster boxes
         component-major over lanes) -- replacing 6 scalar VMEM loads +
         a scalar slab test per cluster;
      3. each while_loop iteration retires FOUR blocks over an 8-slot DMA
         ring, amortizing extract-min + packet-tmax + loop turnaround 4x.

    Visits b/c/d of a quad skip the early-exit re-check (their DMAs are in
    flight and must be waited anyway): at most 3 extra block visits per
    packet on the final iteration.

    per_ray=True (v4, the round-5 incoherent-ray path): the full (B, NBp)
    block-entry matrix is kept in VMEM scratch and the visitation keys are
    recomputed every iteration as min-over-rays of entries STRICTLY BELOW
    EACH RAY'S OWN running best t -- per-ray early termination instead of
    the global packet tmax. A resolved ray stops contributing need for ANY
    further block, so visits collapse to the union of per-ray NEEDED
    blocks rather than the union of pierced blocks within the slowest
    ray's front. On the deep-bounce population the pierced union is ~250
    of 488 blocks while the needed union is ~the packet's origin blocks
    (bounce rays start ON geometry: entry 0, usually hit there), which is
    the structural gap the round-4 global-tmax kernel could not close
    (BASELINE.md round-4 analysis; reference per-thread equivalent:
    trace_ray.cuh:244-318 where each SIMT thread's walk ends at its own
    first hit)."""
    if stats:
        out_stats_ref, *rest = rest
    if mxu:
        (best_t_ref, best_id_ref, near_ref, mask_ref, do_ref, buf_ref,
         sems) = rest
    elif per_ray:
        (best_t_ref, best_id_ref, near_ref, mask_ref, near_all_ref,
         visited_ref, buf_ref, sems) = rest
    else:
        (best_t_ref, best_id_ref, near_ref, mask_ref, buf_ref, sems) = rest
    batch = rays_ref.shape[0]
    cols = _ray_columns(rays_ref)
    act = cols[6]
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    _init_best(batch, best_t_ref, best_id_ref, seed_t=rays_ref[:, 7:8])
    if mxu:
        # (2B, 8) [directions; origins] matmul operand, built once per
        # packet; lanes 3-7 zero.
        do_ref[:] = jnp.zeros((2 * batch, 8), jnp.float32)
        for j in range(3):
            do_ref[0:batch, j:j + 1] = rays_ref[:, 3 + j:4 + j]
            do_ref[batch:2 * batch, j:j + 1] = rays_ref[:, j:j + 1]
        intersect = _make_intersect_mxu(
            do_ref, act, lane_id, best_t_ref, best_id_ref, t_eps
        )
    else:
        intersect = _make_intersect(
            cols, lane_id, best_t_ref, best_id_ref, t_eps
        )

    ox, oy, oz, dx, dy, dz, _ = cols
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    if per_ray:
        # Dense phase, matrix form: keep every ray's clamped block-entry
        # distance (+inf where the ray does not pierce the block) so the
        # keys can be re-derived per iteration under per-ray bounds.
        bx0, by0, bz0 = (blk_bbox_t_ref[0:1, :], blk_bbox_t_ref[1:2, :],
                         blk_bbox_t_ref[2:3, :])
        bx1, by1, bz1 = (blk_bbox_t_ref[3:4, :], blk_bbox_t_ref[4:5, :],
                         blk_bbox_t_ref[5:6, :])
        bvalid = blk_bbox_t_ref[6:7, :] > 0.0
        t1x, t2x = (bx0 - ox) * ix, (bx1 - ox) * ix  # (B, NBp)
        t1y, t2y = (by0 - oy) * iy, (by1 - oy) * iy
        t1z, t2z = (bz0 - oz) * iz, (bz1 - oz) * iz
        bnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        bfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        bmiss = (bnear > bfar) | (bfar < t_eps)  # false on NaN: conservative
        ent = jnp.where(bmiss | (~act), _INF, jnp.maximum(bnear, 0.0))
        ent = jnp.where(ent != ent, 0.0, ent)  # NaN -> visit first
        near_all_ref[:] = jnp.where(bvalid, ent, _INF)
        visited_ref[0:1, :] = jnp.zeros_like(visited_ref[0:1, :])

        def rekey():
            """Visitation keys under PER-RAY need: a block is needed by ray
            r only while its entry lies strictly in front of r's own best
            hit. Unvisited-needed min over rays; resolved rays (and rays
            whose best beat a block's entry) contribute nothing."""
            per_best = jnp.min(best_t_ref[:], axis=1, keepdims=True)  # (B,1)
            na = near_all_ref[:]
            key = jnp.min(
                jnp.where(na < per_best, na, _INF), axis=0, keepdims=True
            )
            near_ref[0:1, :] = jnp.where(
                visited_ref[0:1, :] > 0.0, _INF, key
            )

        rekey()
        base_extract = _make_extract(near_ref)
        vis_iota = jax.lax.broadcasted_iota(
            jnp.int32, visited_ref.shape, 1
        )[0:1, :]

        def extract():
            m, idx = base_extract()
            visited_ref[0:1, :] = jnp.where(
                vis_iota == idx, 1.0, visited_ref[0:1, :]
            )
            return m, idx

        far_bound = None
    else:
        keys, far_bound = _dense_near(blk_bbox_t_ref, rays_ref, t_eps)
        near_ref[0:1, :] = keys
        extract = _make_extract(near_ref)

    def dma(slot, blk_i):
        return pltpu.make_async_copy(
            blk_ref.at[blk_i], buf_ref.at[slot], sems.at[slot]
        )

    inner_extract = _make_extract(mask_ref)

    def visit(slot, blk_i, tmax, n_clu, guard_m=None):
        """Wait the block, cull its clusters vectorized, intersect hits.

        The landed header tile gives every cluster's box in lanes; ONE
        dense (B, 128) slab pass produces a per-cluster visitation key
        (min entry distance over piercing rays, +inf if none), and an
        extract-min mini-queue walks ONLY the pierced clusters -- Mosaic
        has no dynamic-lane scalar loads, so the queue's vector-reduce
        extract (the same pattern as the outer block queue) is also the
        legal way to iterate a lane-indexed set.

        `guard_m` (block entry distance): when given, the visit's COMPUTE is
        skipped if the packet's hit front has already advanced past the
        block (its prefetch DMA must still be waited -- the slot/semaphore
        are reused next iteration)."""
        dma(slot, blk_i).wait()

        if guard_m is not None:
            def run(n):
                return visit_compute(slot, blk_i, tmax, n)

            return jax.lax.cond(
                guard_m <= tmax, run, lambda n: n, n_clu
            )
        return visit_compute(slot, blk_i, tmax, n_clu)

    def visit_compute(slot, blk_i, tmax, n_clu):
        hdr = buf_ref[slot, 0]  # (16, 128)
        bx0, by0, bz0 = hdr[0:1, :], hdr[1:2, :], hdr[2:3, :]
        bx1, by1, bz1 = hdr[3:4, :], hdr[4:5, :], hdr[5:6, :]
        valid = hdr[6:7, :] > 0.0
        t1x, t2x = (bx0 - ox) * ix, (bx1 - ox) * ix  # (B, 128)
        t1y, t2y = (by0 - oy) * iy, (by1 - oy) * iy
        t1z, t2z = (bz0 - oz) * iz, (bz1 - oz) * iz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        if per_ray:
            # Fresh per-ray bound: a ray culls every cluster at or behind
            # its OWN best hit, so stale/prefetched block visits degrade to
            # a header cull with an empty inner queue (self-guarding).
            tmax = jnp.min(best_t_ref[:], axis=1, keepdims=True)  # (B, 1)
        # NaN-conservative: comparisons false on NaN -> lane counts as hit.
        miss = (near > far) | (far < t_eps) | (near > tmax)
        pierce = (~miss) & act & valid  # (B, 128)
        key = jnp.where(pierce, jnp.maximum(near, 0.0), _INF)
        key = jnp.where(key != key, 0.0, key)  # NaN -> visit first
        mask_ref[0:1, :] = jnp.min(key, axis=0, keepdims=True)

        m0, i0 = inner_extract()

        def cond(c):
            m, _i, _n = c
            return m < _CUT

        def body(c):
            _m, i, n = c
            if mxu:
                intersect(
                    buf_ref[slot, 1 + 2 * i], buf_ref[slot, 2 + 2 * i],
                    blk_i * branch + i,
                )
            else:
                intersect(buf_ref[slot, 1 + i], blk_i * branch + i)
            m2, i2 = inner_extract()
            return m2, i2, n + 1

        _, _, n_clu = jax.lax.while_loop(cond, body, (m0, i0, n_clu))
        return n_clu

    n_pre = depth if per_ray else 4
    pre = []
    for slot in range(n_pre):
        m_p, i_p = extract()
        pre.append((m_p, i_p))

        @pl.when(m_p < _CUT)
        def _(slot=slot, i_p=i_p):
            dma(jnp.int32(slot), i_p).start()

    if per_ray:
        # Per-ray loop: the recomputed keys already encode need (a key is
        # +inf once no ray's own best can be beaten there), so the cond is
        # just key-exhaustion and no tmax rides the carry. Trailing visits
        # of a group run unguarded -- their fresh per-ray inner cull
        # empties the mini-queue of a stale block, so a guard would only
        # save one header-cull pass. `depth` visits retire per iteration
        # over a 2*depth-slot ring (4 = the measured optimum; 2 trades
        # fewer stale end-of-walk visits for less DMA latency hiding).
        mask = 2 * depth - 1

        def cond(c):
            grp, _base, _nv, _nc = c
            return grp[0][0] < _CUT

        def body(c):
            grp, base, n_visit, n_clu = c
            rekey()  # reflects every visit of the PREVIOUS iteration
            nxt = []
            for j in range(depth):
                m_n, i_n = extract()
                nxt.append((m_n, i_n))

                @pl.when(m_n < _CUT)
                def _(j=j, i_n=i_n):
                    dma((base + depth + j) & mask, i_n).start()

            n_clu = visit(base, grp[0][1], _INF, n_clu)
            n_visit = n_visit + 1
            for j in range(1, depth):
                def do_visit(args, j=j):
                    nv, nc = args
                    return nv + 1, visit(
                        (base + j) & mask, grp[j][1], _INF, nc
                    )

                n_visit, n_clu = jax.lax.cond(
                    grp[j][0] < _CUT,
                    do_visit,
                    lambda args: args,
                    (n_visit, n_clu),
                )
            return tuple(nxt), (base + depth) & mask, n_visit, n_clu

        quad_f, base_f, n_visit, n_clu = jax.lax.while_loop(
            cond,
            body,
            (tuple(pre), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )
        drain_n, drain_mask = depth, mask
    else:
        def cond(c):
            quad, _base, tmax, _nv, _nc = c
            return (quad[0][0] < _CUT) & (quad[0][0] <= tmax)

        def body(c):
            quad, base, tmax, n_visit, n_clu = c
            nxt = []
            for j in range(4):
                m_n, i_n = extract()
                nxt.append((m_n, i_n))

                @pl.when(m_n < _CUT)
                def _(j=j, i_n=i_n):
                    dma((base + 4 + j) & 7, i_n).start()

            # Visit a: the loop cond already proved it is in front of the
            # hit front. Visits b/c/d re-check against ONE fresh tmax taken
            # after visit a (the big front advance; a per-visit recompute
            # measured no better); a stale block's DMA is waited but its
            # compute skipped.
            n_clu = visit(base, quad[0][1], tmax, n_clu)
            n_visit = n_visit + 1
            tmax_now = _packet_tmax(best_t_ref, act, far_bound)
            for j in range(1, 4):
                def do_visit(args, j=j):
                    nv, nc = args
                    nc2 = visit(
                        (base + j) & 7, quad[j][1], tmax_now, nc,
                        guard_m=quad[j][0],
                    )
                    return nv + 1, nc2

                n_visit, n_clu = jax.lax.cond(
                    quad[j][0] < _CUT,
                    do_visit,
                    lambda args: args,
                    (n_visit, n_clu),
                )
            return (
                tuple(nxt),
                (base + 4) & 7,
                _packet_tmax(best_t_ref, act, far_bound),
                n_visit,
                n_clu,
            )

        quad_f, base_f, _tm, n_visit, n_clu = jax.lax.while_loop(
            cond,
            body,
            (
                tuple(pre),
                jnp.int32(0),
                _packet_tmax(best_t_ref, act, far_bound),
                jnp.int32(0),
                jnp.int32(0),
            ),
        )
        drain_n, drain_mask = 4, 7

    # Drain: the carried group's DMAs were started but never waited.
    for j in range(drain_n):
        @pl.when(quad_f[j][0] < _CUT)
        def _(j=j):
            dma((base_f + j) & drain_mask, quad_f[j][1]).wait()

    _finalize(batch, best_t_ref, best_id_ref, out_t_ref, out_id_ref)
    if stats:
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        out_stats_ref[:] = jnp.where(
            lane == 0, n_visit, jnp.where(lane == 1, n_clu, 0)
        )


def _first_blocks_kernel(blk_bbox_t_ref, rays_ref, out_ref, *, t_eps):
    """Per-ray traversal-order sort key for the binned blk path.

    One dense (B, NBp) slab pass (same maths as `_dense_near`, reduced
    per RAY instead of per box) yields each ray's nearest and
    second-nearest pierced block; the emitted key is

        ((first * (NBp + 1) + second) * 8 + direction_octant)

    so an argsort groups rays that NEED the same first block (then the
    same second block, then a similar heading) into the same packets.
    Rays that pierce nothing key to _BIG_ID - 1, inactive rays to
    _BIG_ID -- both sort to the tail where their packets exit the
    traversal immediately. int32 capacity bounds NBp at ~16k blocks
    (~67M triangles at branch 32); assert in the wrapper.
    """
    n = blk_bbox_t_ref.shape[1]
    batch = rays_ref.shape[0]
    ox, oy, oz, dx, dy, dz, act = _ray_columns(rays_ref)
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    bx0, by0, bz0 = blk_bbox_t_ref[0:1, :], blk_bbox_t_ref[1:2, :], blk_bbox_t_ref[2:3, :]
    bx1, by1, bz1 = blk_bbox_t_ref[3:4, :], blk_bbox_t_ref[4:5, :], blk_bbox_t_ref[5:6, :]
    valid = blk_bbox_t_ref[6:7, :] > 0.0

    t1x, t2x = (bx0 - ox) * ix, (bx1 - ox) * ix  # (B, NBp)
    t1y, t2y = (by0 - oy) * iy, (by1 - oy) * iy
    t1z, t2z = (bz0 - oz) * iz, (bz1 - oz) * iz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    miss = (near > far) | (far < t_eps)  # false on NaN -> conservative hit
    key = jnp.where(miss, _INF, jnp.maximum(near, 0.0))
    key = jnp.where(key != key, 0.0, key)  # NaN -> treat as nearest
    key = jnp.where(valid, key, _INF)

    iota = jax.lax.broadcasted_iota(jnp.int32, (batch, n), 1)
    first = jnp.min(key, axis=1, keepdims=True)  # (B, 1)
    fidx = jnp.min(jnp.where(key <= first, iota, _BIG_ID), axis=1, keepdims=True)
    key2 = jnp.where(iota == fidx, _INF, key)
    second = jnp.min(key2, axis=1, keepdims=True)
    sidx = jnp.min(
        jnp.where(key2 <= second, iota, _BIG_ID), axis=1, keepdims=True
    )
    sidx = jnp.where(second >= _CUT, n, sidx)

    octant = (
        (dx > 0.0).astype(jnp.int32)
        + 2 * (dy > 0.0).astype(jnp.int32)
        + 4 * (dz > 0.0).astype(jnp.int32)
    )  # (B, 1)
    comp = (fidx * (n + 1) + sidx) * 8 + octant
    comp = jnp.where(first >= _CUT, _BIG_ID - 1, comp)
    comp = jnp.where(act, comp, _BIG_ID)
    out_ref[:] = jnp.broadcast_to(comp, (batch, 8))


@functools.partial(jax.jit, static_argnames=("t_eps", "packet", "interpret"))
def first_block_keys(
    cbvh: ClusterBVH,
    o: jnp.ndarray,
    d: jnp.ndarray,
    active=None,
    t_eps: float = 1e-5,
    packet: int = DEFAULT_PACKET,
    interpret: bool = False,
):
    """(R,) int32 binned-traversal sort keys (see _first_blocks_kernel).

    The pre-pass behind `sort_rays="block"`: exact first-needed-block
    binning. The Morton origin/direction proxy cannot collapse the
    deep-bounce packet union (254 of 488 blocks per 256-ray packet,
    BASELINE.md round-4 analysis) because it does not know WHICH block a
    ray actually enters first; with ~134 rays per block by pigeonhole at
    hero scale, the exact key makes packets share their first (and
    usually second) DMA block."""
    assert cbvh.blk_bbox_t is not None, "run accel.cluster.with_blocks"
    n = cbvh.blk_bbox_t.shape[1]
    assert (n + 1) * n * 8 < 2**31, "block count overflows the int32 key"
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    num_rays = o.shape[0]
    pad = (-num_rays) % packet
    if active is None:
        act = jnp.ones((num_rays,), jnp.float32)
    else:
        act = jax.lax.stop_gradient(active).astype(jnp.float32)
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)))
    act_p = jnp.pad(act, (0, pad))
    total = num_rays + pad
    rays = jnp.concatenate(
        [o_p, d_p, act_p[:, None], jnp.zeros((total, 1), jnp.float32)], axis=1
    )

    out = pl.pallas_call(
        functools.partial(_first_blocks_kernel, t_eps=t_eps),
        grid=(total // packet,),
        in_specs=[
            pl.BlockSpec(
                cbvh.blk_bbox_t.shape, lambda p: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (packet, 8), lambda p: (p, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (packet, 8), lambda p: (p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total, 8), jnp.int32),
        interpret=interpret,
    )(cbvh.blk_bbox_t, rays)
    return out[:num_rays, 0]


def _spread3_u32(v):
    """Spread the low 10 bits of a uint32 to every 3rd bit (Morton)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _coherence_perm(o, d, act):
    """Permutation sorting rays into spatially/angularly coherent packets.

    Key = Morton(origin, 5 bits/axis over the batch bbox) << 15 |
          Morton(direction, 5 bits/axis over [-1,1]). Packet traversal
    cost scales with the UNION of boxes the packet's rays pierce, not the
    per-ray average -- e.g. hero-scene camera rays pierce ~32 octs each
    but a 256-consecutive-pixel strip unions to ~530; Morton-tiled packets
    shrink that to near the per-ray floor. Inactive rays sort to the tail
    so their packets exit the traversal loop immediately.
    """
    lo = jnp.min(o, axis=0)
    span = jnp.maximum(jnp.max(o, axis=0) - lo, 1e-12)
    qo = jnp.clip((o - lo) / span * 31.0, 0.0, 31.0).astype(jnp.uint32)
    qd = jnp.clip((d * 0.5 + 0.5) * 31.0, 0.0, 31.0).astype(jnp.uint32)
    mo = (_spread3_u32(qo[:, 0]) | (_spread3_u32(qo[:, 1]) << 1)
          | (_spread3_u32(qo[:, 2]) << 2))
    md = (_spread3_u32(qd[:, 0]) | (_spread3_u32(qd[:, 1]) << 1)
          | (_spread3_u32(qd[:, 2]) << 2))
    key = ((mo << 15) | md).astype(jnp.int32)
    key = jnp.where(act > 0.0, key, jnp.int32(2**31 - 1))
    return jnp.argsort(key)


def _prep_rays(o, d, active, packet, sort_rays=True, sort_key=None,
               t_max=None):
    # Detach the kernel INPUTS: pallas_call has no JVP/VJP rule, so any
    # tangent reaching it (e.g. ray origins carried through the bounce-scan
    # linearization of jax.grad) would crash in _pallas_call_jvp_rule.
    # Hit topology is semantically non-differentiable anyway (the outputs
    # are detached in _unpack); gradients flow through hit_attributes'
    # re-derivation of the hit point instead (accel/traverse.py).
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    num_rays = o.shape[0]
    pad = (-num_rays) % packet
    total = num_rays + pad

    if active is None:
        act = jnp.ones((num_rays,), jnp.float32)
    else:
        act = jax.lax.stop_gradient(active).astype(jnp.float32)
    # Column 7 = per-ray search-window seed (see _init_best): +inf when
    # unbounded; NEE shadow rays pass their light-sample distance.
    if t_max is None:
        tm = jnp.full((num_rays,), _INF, jnp.float32)
    else:
        tm = jax.lax.stop_gradient(t_max).astype(jnp.float32)

    perm = None
    if sort_rays and num_rays > packet:
        if sort_key is not None:
            # Precomputed key (first_block_keys): inactive rays already key
            # to _BIG_ID, so they still sort to the tail.
            perm = jnp.argsort(sort_key)
        else:
            perm = _coherence_perm(o, d, act)
        o, d, act, tm = o[perm], d[perm], act[perm], tm[perm]

    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)))
    act_p = jnp.pad(act, (0, pad))
    tm_p = jnp.pad(tm, (0, pad), constant_values=_INF)

    rays = jnp.concatenate(
        [o_p, d_p, act_p[:, None], tm_p[:, None]], axis=1
    )  # (total, 8)

    # Transposed compact layout for slab tests: comp x (8, total/8), with
    # ray r at [r % 8, r // 8]. Components 3-5 are reciprocals of d
    # (signed-zero aware: 1/+-0 = +-inf, the standard slab convention).
    inv_d = 1.0 / d_p
    comps = jnp.stack(
        [o_p[:, 0], o_p[:, 1], o_p[:, 2], inv_d[:, 0], inv_d[:, 1], inv_d[:, 2],
         act_p, jnp.zeros((total,), jnp.float32)]
    )  # (8, total)
    num_packets = total // packet
    # (P, comp, sublane, lane): ray r of packet p sits at [p, :, r % 8, r // 8].
    rays_t = comps.reshape(8, num_packets, packet // 8, 8).transpose(1, 0, 3, 2)
    return rays, rays_t, num_packets, num_rays, perm


def _unpack(out_t, out_id, num_rays, perm=None):
    t = out_t[:num_rays, 0]
    idx = out_id[:num_rays, 0]
    if perm is not None:
        # Results are in coherence-sorted order; scatter back to ray order.
        t = jnp.zeros_like(t).at[perm].set(t)
        idx = jnp.zeros_like(idx).at[perm].set(idx)
    # A hit is a WON id, not a finite t: with a seeded search window
    # (rays column 7) t returns the seed when nothing inside beat it.
    hit = idx != _BIG_ID
    idx = jnp.where(hit, idx, -1)
    t = jnp.where(hit, t, jnp.inf)
    return (
        jax.lax.stop_gradient(t),
        jax.lax.stop_gradient(idx),
        jax.lax.stop_gradient(hit),
    )


def _ray_specs(packet):
    return [
        pl.BlockSpec((packet, 8), lambda p: (p, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 8, 8, packet // 8),
            lambda p: (p, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]


def _out_specs(packet):
    return [
        pl.BlockSpec((packet, 8), lambda p: (p, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((packet, 8), lambda p: (p, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("t_eps", "packet", "interpret"))
def nearest_hit_cluster(
    cbvh: ClusterBVH,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_eps: float = 1e-5,
    active=None,
    t_max=None,
    packet: int = DEFAULT_PACKET,
    interpret: bool = False,
):
    """Batched nearest hit via the VMEM-resident Pallas packet kernel.

    o, d: (R, 3) -> (t (R,), idx (R,) int32, hit (R,) bool), all detached.
    Drop-in replacement for accel.wavefront.nearest_hit_wavefront.
    """
    rays, rays_t, num_packets, num_rays, perm = _prep_rays(
        o, d, active, packet, t_max=t_max
    )

    out_t, out_id = pl.pallas_call(
        functools.partial(_vmem_kernel, t_eps=t_eps),
        grid=(num_packets,),
        in_specs=[
            pl.BlockSpec(
                cbvh.clu_bbox_t.shape, lambda p: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                cbvh.tri_const.shape, lambda p: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_ray_specs(packet),
        ],
        out_specs=_out_specs(packet),
        out_shape=[
            jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.float32),
            jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((packet, 128), jnp.float32),
            pltpu.VMEM((packet, 128), jnp.int32),
            pltpu.VMEM((1, cbvh.clu_bbox_t.shape[1]), jnp.float32),
        ],
        interpret=interpret,
    )(cbvh.clu_bbox_t, cbvh.tri_const, rays, rays_t)

    return _unpack(out_t, out_id, num_rays, perm)


@functools.partial(
    jax.jit, static_argnames=("t_eps", "packet", "interpret", "sort_rays")
)
def nearest_hit_cluster_flat(
    cbvh: ClusterBVH,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_eps: float = 1e-5,
    active=None,
    t_max=None,
    packet: int = DEFAULT_PACKET,
    interpret: bool = False,
    sort_rays: bool = True,
):
    """Batched nearest hit via the flat unconditional VMEM kernel (tiny
    scenes, <= FLAT_CLUSTER_LIMIT real clusters). Spatial order within a
    packet is irrelevant (every packet visits the whole table), but the
    coherence sort STAYS ON by default for its inactive-ray tail: deep
    bounces and NEE calls carry sparse active masks, and packing dead
    lanes into all-inactive packets lets them skip the unrolled intersect
    entirely (measured: default preset 21.7 vs 16.4 M rays/s fwd).
    Same interface/results as nearest_hit_cluster."""
    # Slice off the CLUSTER_PAD padding clusters -- the flat loop visits
    # everything it is given. num_triangles is a static field.
    real_c = max(1, -(-cbvh.num_triangles // 128))
    tri = jax.lax.slice_in_dim(cbvh.tri_const, 0, real_c, axis=0)
    rays, rays_t, num_packets, num_rays, perm = _prep_rays(
        o, d, active, packet, sort_rays=sort_rays, t_max=t_max
    )

    out_t, out_id = pl.pallas_call(
        functools.partial(_flat_kernel, t_eps=t_eps),
        grid=(num_packets,),
        in_specs=[
            pl.BlockSpec(
                (real_c, 16, 128), lambda p: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_ray_specs(packet),
        ],
        out_specs=_out_specs(packet),
        out_shape=[
            jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.float32),
            jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((packet, 128), jnp.float32),
            pltpu.VMEM((packet, 128), jnp.int32),
        ],
        interpret=interpret,
    )(tri, rays, rays_t)

    return _unpack(out_t, out_id, num_rays, perm)


@functools.partial(jax.jit, static_argnames=("t_eps", "packet", "interpret"))
def nearest_hit_cluster_flat_mxu(
    cbvh: ClusterBVH,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_eps: float = 1e-5,
    active=None,
    t_max=None,
    packet: int = DEFAULT_PACKET,
    interpret: bool = False,
):
    """Flat tiny-scene kernel with MXU dot products (requires
    accel.cluster.with_mxu_tiles). Same interface/results as
    nearest_hit_cluster_flat."""
    assert cbvh.mxu_tiles is not None, "run accel.cluster.with_mxu_tiles"
    real_c = max(1, -(-cbvh.num_triangles // 128))
    tiles = jax.lax.slice_in_dim(cbvh.mxu_tiles, 0, real_c, axis=0)
    rays, rays_t, num_packets, num_rays, perm = _prep_rays(
        o, d, active, packet, sort_rays=False, t_max=t_max
    )

    out_t, out_id = pl.pallas_call(
        functools.partial(_flat_mxu_kernel, t_eps=t_eps),
        grid=(num_packets,),
        in_specs=[
            pl.BlockSpec(
                (real_c, 2, 16, 128), lambda p: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_ray_specs(packet),
        ],
        out_specs=_out_specs(packet),
        out_shape=[
            jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.float32),
            jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((packet, 128), jnp.float32),
            pltpu.VMEM((packet, 128), jnp.int32),
            pltpu.VMEM((2 * packet, 8), jnp.float32),
        ],
        interpret=interpret,
    )(tiles, rays, rays_t)

    return _unpack(out_t, out_id, num_rays, perm)


@functools.partial(
    jax.jit,
    static_argnames=("t_eps", "packet", "interpret", "stats", "mxu",
                     "sort_rays", "per_ray", "pipeline_depth"),
)
def nearest_hit_cluster_blk(
    cbvh: ClusterBVH,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_eps: float = 1e-5,
    active=None,
    t_max=None,
    packet: int = DEFAULT_PACKET,
    interpret: bool = False,
    stats: bool = False,
    mxu: bool = False,
    sort_rays: bool = True,
    per_ray: bool = False,
    pipeline_depth: int = 4,
):
    """Batched nearest hit via the v3 blocked HBM kernel (big scenes).

    Requires `cbvh.blk_const` (accel.cluster.with_blocks) -- or, with
    mxu=True, `cbvh.mxu_const` (with_mxu_blocks): the six ray/tri dot
    products then run as MXU matmuls per cluster (see _make_intersect_mxu).
    stats=True also returns (num_packets, 2) int32 [block visits, clusters
    intersected].

    sort_rays: True = Morton origin/direction packets (coherent-beam
    default), "block" = exact first-needed-block binning via the
    `first_block_keys` pre-pass (kept as a DOCUMENTED NEGATIVE result:
    measured no better than Morton on the bounce population and 4x worse
    on coherent beams, BASELINE.md round 5), False = caller order.

    per_ray=True enables per-ray early termination (the v4 kernel mode,
    see _blk_kernel): needs (packet x NBp) f32 of extra VMEM scratch, so
    it is limited to scenes whose 128-padded block count fits."""
    table = cbvh.mxu_const if mxu else cbvh.blk_const
    assert table is not None, "run accel.cluster.with_blocks/with_mxu_blocks"
    assert not (mxu and per_ray), "per_ray is a plain-VPU kernel mode"
    if per_ray:
        nbp = cbvh.blk_bbox_t.shape[1]
        assert packet * nbp * 4 <= 6 * 1024 * 1024, (
            f"per_ray entry matrix {packet}x{nbp} overflows the VMEM "
            "budget; use per_ray=False for this scene/packet size"
        )
    branch = cbvh.mxu_branch if mxu else cbvh.blk_branch
    sort_key = None
    if sort_rays == "block" and o.shape[0] > packet:
        sort_key = first_block_keys(
            cbvh, o, d, active=active, t_eps=t_eps, packet=packet,
            interpret=interpret,
        )
    rays, rays_t, num_packets, num_rays, perm = _prep_rays(
        o, d, active, packet, sort_rays=bool(sort_rays), sort_key=sort_key,
        t_max=t_max,
    )

    out_shape = [
        jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.float32),
        jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.int32),
    ]
    out_specs = _out_specs(packet)
    if stats:
        out_shape.append(
            jax.ShapeDtypeStruct((num_packets * 8, 128), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec((8, 128), lambda p: (p, 0), memory_space=pltpu.VMEM)
        )

    scratch = [
        pltpu.VMEM((packet, 128), jnp.float32),
        pltpu.VMEM((packet, 128), jnp.int32),
        pltpu.VMEM((1, cbvh.blk_bbox_t.shape[1]), jnp.float32),
        pltpu.VMEM((1, 128), jnp.float32),
    ]
    if per_ray:
        scratch.append(
            pltpu.VMEM((packet, cbvh.blk_bbox_t.shape[1]), jnp.float32)
        )
        scratch.append(
            pltpu.VMEM((1, cbvh.blk_bbox_t.shape[1]), jnp.float32)
        )
    slots = 2 * pipeline_depth if per_ray else 8
    if mxu:
        scratch.append(pltpu.VMEM((2 * packet, 8), jnp.float32))
        scratch.append(pltpu.VMEM((8, 2 * branch + 1, 16, 128), jnp.float32))
    else:
        scratch.append(
            pltpu.VMEM((slots, branch + 1, 16, 128), jnp.float32)
        )
    scratch.append(pltpu.SemaphoreType.DMA((slots,)))

    out = pl.pallas_call(
        functools.partial(
            _blk_kernel, t_eps=t_eps, stats=stats, branch=branch, mxu=mxu,
            per_ray=per_ray, depth=pipeline_depth,
        ),
        grid=(num_packets,),
        in_specs=[
            pl.BlockSpec(
                cbvh.blk_bbox_t.shape, lambda p: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # block table stays in HBM
            *_ray_specs(packet),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(cbvh.blk_bbox_t, table, rays, rays_t)

    if stats:
        per_packet = out[2].reshape(num_packets, 8, 128)[:, 0, :2]
        return _unpack(out[0], out[1], num_rays, perm) + (per_packet,)
    return _unpack(out[0], out[1], num_rays, perm)


@functools.partial(
    jax.jit,
    static_argnames=("t_eps", "packet", "interpret", "stats", "oct_branch"),
)
def nearest_hit_cluster_hbm(
    cbvh: ClusterBVH,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_eps: float = 1e-5,
    active=None,
    t_max=None,
    packet: int = DEFAULT_PACKET,
    interpret: bool = False,
    stats: bool = False,
    oct_branch: int = OCT_BRANCH,
):
    """Batched nearest hit via the HBM+DMA Pallas packet kernel (big scenes:
    the triangle table stays in HBM; 64KB oct blocks are DMA'd on demand).

    stats=True additionally returns a (num_packets, 2) int32 array of
    [oct visits, clusters intersected] per packet -- the exact work counts
    behind the roofline numbers in BASELINE.md."""
    rays, rays_t, num_packets, num_rays, perm = _prep_rays(
        o, d, active, packet, t_max=t_max
    )

    out_shape = [
        jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.float32),
        jax.ShapeDtypeStruct((num_packets * packet, 8), jnp.int32),
    ]
    out_specs = _out_specs(packet)
    if stats:
        # (8, 128) per-packet block: Mosaic requires >= (8, 128) tiles for
        # VMEM outputs; lanes 0/1 of each packet's first row carry the
        # [oct visits, clusters intersected] counters.
        out_shape.append(
            jax.ShapeDtypeStruct((num_packets * 8, 128), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec((8, 128), lambda p: (p, 0), memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        functools.partial(
            _hbm_kernel, t_eps=t_eps, stats=stats, oct_branch=oct_branch
        ),
        grid=(num_packets,),
        in_specs=[
            pl.BlockSpec(
                cbvh.oct_bbox_t.shape, lambda p: (0, 0),
                memory_space=pltpu.VMEM,
            ),  # oct boxes, component-major
            pl.BlockSpec(memory_space=pl.ANY),  # tri_const stays in HBM
            *_ray_specs(packet),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((packet, 128), jnp.float32),
            pltpu.VMEM((packet, 128), jnp.int32),
            pltpu.VMEM((1, cbvh.oct_bbox_t.shape[1]), jnp.float32),
            pltpu.VMEM((4, oct_branch, 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(cbvh.oct_bbox_t, cbvh.tri_const, rays, rays_t)

    if stats:
        per_packet = out[2].reshape(num_packets, 8, 128)[:, 0, :2]
        return _unpack(out[0], out[1], num_rays, perm) + (per_packet,)
    return _unpack(out[0], out[1], num_rays, perm)
