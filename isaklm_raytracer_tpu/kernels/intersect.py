"""Pallas TPU kernels: packet nearest-hit over the cluster BVH.

The hot inner kernel of the framework (the TPU re-architecture of
trace_ray.cuh:244-318). One grid program owns a PACKET of B rays; control
flow is per-packet scalar (bbox slab culling + `pl.when` skips), compute is
dense per-(ray, triangle) VPU work on (B, 128) tiles:

  for each supercluster (fori):            ~20 VPU ops on a (8, B/8) tile
      if any active ray hits its bbox:     scalar branch -- skipped work
          ... descend ...                   is really skipped, unlike XLA
              intersect all B rays x 128 triangles   ~40 (B,128) FMAs

Two variants share all the maths:

  - `nearest_hit_cluster` (VMEM-resident): the whole (C, 16, 128) constant
    table lives in VMEM. Two-level culling (supercluster -> cluster).
    For scenes up to ~100K triangles.
  - `nearest_hit_cluster_hbm` (HBM + DMA): the table stays in HBM; on an
    oct (8-cluster) box hit its contiguous (8, 16, 128) block is DMA'd
    into a VMEM scratch buffer. Three-level culling (supercluster -> oct
    -> cluster, the last from VMEM scalars). Scales to the 2M-triangle
    hero scene (README.md:12) whose table is ~128 MB.

Design rules that make this fast on the VPU:
  - NO per-ray gathers or scatters anywhere: triangle constants stream in
    as (1, 128) rows broadcast over ray sublanes, ray components as (B, 1)
    columns broadcast over triangle lanes;
  - NO per-visit reductions or loop carries: the running nearest hit lives
    in two (B, 128) VMEM scratch refs holding PER-LANE minima (lane = tri
    slot), updated with an elementwise min per visit; the cross-lane argmin
    happens once per packet after the loop;
  - triangle ids are c*128 + lane -- the scene is Morton-renumbered at
    build time (accel.cluster.morton_order), so no id table exists at all.

Correctness does not depend on traversal order: the cluster build is a
partition (no straddler duplicates, unlike create_kd_tree.cuh:176-218), so
the nearest hit is the plain min over every cluster whose box a ray
pierces. Intersection maths and acceptance rules match the reference
(trace_ray.cuh:73-113): plane hit, Cramer barycentric inside test,
t >= eps, ties to the lowest triangle id (lane/cluster order = id order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaklm_raytracer_tpu.accel.cluster import (
    OCT_BRANCH,
    SUP_BRANCH,
    ClusterBVH,
)

DEFAULT_PACKET = 256
# VMEM budget for the resident-table kernel; beyond this the HBM+DMA
# variant is used (make_trace_fn picks automatically).
VMEM_TABLE_LIMIT = 6 * 1024 * 1024
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


def _row6(ref, row):
    return (ref[row, 0], ref[row, 1], ref[row, 2],
            ref[row, 3], ref[row, 4], ref[row, 5])


def _blk_box6(blk_ref, c):
    """Cluster bbox scalars from row 15 of its own constant block."""
    return (blk_ref[c, 15, 0], blk_ref[c, 15, 1], blk_ref[c, 15, 2],
            blk_ref[c, 15, 3], blk_ref[c, 15, 4], blk_ref[c, 15, 5])


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


def _packet_tmax(best_t_ref, act):
    """Farthest any active ray still needs to look: max over rays of the
    per-ray running-best t (misses keep it at +inf -> no pruning)."""
    per_ray = jnp.min(best_t_ref[:], axis=1, keepdims=True)  # (B, 1)
    return jnp.max(jnp.where(act, per_ray, -_INF))


def _init_best(batch, best_t_ref, best_id_ref):
    best_t_ref[:] = jnp.full((batch, 128), _INF, jnp.float32)
    best_id_ref[:] = jnp.full((batch, 128), _BIG_ID, jnp.int32)


def _vmem_kernel(
    sup_ref,  # SMEM (S, 8)
    tri_ref,  # VMEM (C, 16, 128)
    rays_ref,  # VMEM (B, 8): ox oy oz dx dy dz active pad
    rayt_ref,  # VMEM (1, 8, 8, B/8): transposed compact comps + 1/d + active
    out_t_ref,  # VMEM (B, 8)
    out_id_ref,  # VMEM (B, 8) int32
    best_t_ref,  # VMEM scratch (B, 128): per-lane running min t
    best_id_ref,  # VMEM scratch (B, 128) int32: per-lane winning tri id
    *,
    t_eps: float,
):
    num_sup = sup_ref.shape[0]
    batch = rays_ref.shape[0]
    cols = _ray_columns(rays_ref)
    act = cols[6]
    box_any = _make_box_any(_compact_rays(rayt_ref), t_eps)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    _init_best(batch, best_t_ref, best_id_ref)
    intersect = _make_intersect(cols, lane_id, best_t_ref, best_id_ref, t_eps)

    def sup_body(s_i, carry):
        tmax = _packet_tmax(best_t_ref, act)

        @pl.when(box_any(_row6(sup_ref, s_i), tmax))
        def _():
            def clu_body(ci, carry2):
                c = s_i * SUP_BRANCH + ci

                @pl.when(box_any(_blk_box6(tri_ref, c), tmax))
                def _():
                    intersect(tri_ref[c], c)

                return carry2

            jax.lax.fori_loop(0, SUP_BRANCH, clu_body, 0)

        return carry

    jax.lax.fori_loop(0, num_sup, sup_body, 0)
    _finalize(batch, best_t_ref, best_id_ref, out_t_ref, out_id_ref)


def _hbm_kernel(
    sup_ref,  # SMEM (S, 8)
    oct_ref,  # VMEM (C/8, 8) -- scalar reads; SMEM scalars cost 64B each,
    #           so a hero-scale oct table blows the 1MB SMEM budget
    tri_ref,  # ANY/HBM (C, 16, 128)
    rays_ref,  # VMEM (B, 8)
    rayt_ref,  # VMEM (1, 8, 8, B/8)
    out_t_ref,  # VMEM (B, 8)
    out_id_ref,  # VMEM (B, 8) int32
    best_t_ref,  # VMEM scratch (B, 128)
    best_id_ref,  # VMEM scratch (B, 128) int32
    buf_ref,  # VMEM scratch (OCT_BRANCH, 16, 128): DMA landing buffer
    sem,  # DMA semaphore
    *,
    t_eps: float,
):
    num_sup = sup_ref.shape[0]
    batch = rays_ref.shape[0]
    cols = _ray_columns(rays_ref)
    act = cols[6]
    box_any = _make_box_any(_compact_rays(rayt_ref), t_eps)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    _init_best(batch, best_t_ref, best_id_ref)
    intersect = _make_intersect(cols, lane_id, best_t_ref, best_id_ref, t_eps)

    octs_per_sup = SUP_BRANCH // OCT_BRANCH

    def sup_body(s_i, carry):
        tmax = _packet_tmax(best_t_ref, act)

        @pl.when(box_any(_row6(sup_ref, s_i), tmax))
        def _():
            def oct_body(oi, carry2):
                o_idx = s_i * octs_per_sup + oi

                @pl.when(box_any(_row6(oct_ref, o_idx), tmax))
                def _():
                    dma = pltpu.make_async_copy(
                        tri_ref.at[pl.ds(o_idx * OCT_BRANCH, OCT_BRANCH)],
                        buf_ref,
                        sem,
                    )
                    dma.start()
                    dma.wait()

                    def clu_body(k, carry3):
                        c = o_idx * OCT_BRANCH + k

                        @pl.when(box_any(_blk_box6(buf_ref, k), tmax))
                        def _():
                            intersect(buf_ref[k], c)

                        return carry3

                    jax.lax.fori_loop(0, OCT_BRANCH, clu_body, 0)

                return carry2

            jax.lax.fori_loop(0, octs_per_sup, oct_body, 0)

        return carry

    jax.lax.fori_loop(0, num_sup, sup_body, 0)
    _finalize(batch, best_t_ref, best_id_ref, out_t_ref, out_id_ref)


def _prep_rays(o, d, active, packet):
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

    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)))
    act_p = jnp.pad(act, (0, pad))

    rays = jnp.concatenate(
        [o_p, d_p, act_p[:, None], jnp.zeros((total, 1), jnp.float32)], axis=1
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
    return rays, rays_t, num_packets, num_rays


def _unpack(out_t, out_id, num_rays):
    t = out_t[:num_rays, 0]
    idx = out_id[:num_rays, 0]
    hit = t < _INF
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
    packet: int = DEFAULT_PACKET,
    interpret: bool = False,
):
    """Batched nearest hit via the VMEM-resident Pallas packet kernel.

    o, d: (R, 3) -> (t (R,), idx (R,) int32, hit (R,) bool), all detached.
    Drop-in replacement for accel.wavefront.nearest_hit_wavefront.
    """
    rays, rays_t, num_packets, num_rays = _prep_rays(o, d, active, packet)

    out_t, out_id = pl.pallas_call(
        functools.partial(_vmem_kernel, t_eps=t_eps),
        grid=(num_packets,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sup_bbox
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
        ],
        interpret=interpret,
    )(cbvh.sup_bbox, cbvh.tri_const, rays, rays_t)

    return _unpack(out_t, out_id, num_rays)


@functools.partial(jax.jit, static_argnames=("t_eps", "packet", "interpret"))
def nearest_hit_cluster_hbm(
    cbvh: ClusterBVH,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_eps: float = 1e-5,
    active=None,
    packet: int = DEFAULT_PACKET,
    interpret: bool = False,
):
    """Batched nearest hit via the HBM+DMA Pallas packet kernel (big scenes:
    the triangle table stays in HBM; 64KB oct blocks are DMA'd on demand)."""
    rays, rays_t, num_packets, num_rays = _prep_rays(o, d, active, packet)

    out_t, out_id = pl.pallas_call(
        functools.partial(_hbm_kernel, t_eps=t_eps),
        grid=(num_packets,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sup_bbox
            pl.BlockSpec(
                cbvh.oct_bbox.shape, lambda p: (0, 0),
                memory_space=pltpu.VMEM,
            ),  # oct_bbox
            pl.BlockSpec(memory_space=pl.ANY),  # tri_const stays in HBM
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
            pltpu.VMEM((OCT_BRANCH, 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cbvh.sup_bbox, cbvh.oct_bbox, cbvh.tri_const, rays, rays_t)

    return _unpack(out_t, out_id, num_rays)
