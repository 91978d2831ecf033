"""Cluster-BVH build + Pallas packet intersector (interpret mode on CPU).

The production kernel runs compiled on TPU (see kernels/intersect.py); in
CI it runs through the Pallas interpreter, which executes the identical
kernel program, so these tests pin the full hit semantics against the
brute-force oracle (SURVEY.md section 4: KD-tree vs brute-force
intersect_triangle over random rays -- same strategy, new structure).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isaklm_raytracer_tpu.accel.cluster import (
    CLUSTER_PAD,
    CLUSTER_WIDTH,
    build_cluster_bvh,
    cluster_order,
    morton_order,
    with_oct_branch,
)
from isaklm_raytracer_tpu.accel.traverse import nearest_hit_brute
from isaklm_raytracer_tpu.kernels.intersect import (
    nearest_hit_cluster,
    nearest_hit_cluster_blk,
    nearest_hit_cluster_flat,
    nearest_hit_cluster_hbm,
)


def _random_soup(rng, num_tris, spread=2.0, size=0.4):
    base = rng.uniform(-spread, spread, (num_tris, 1, 3)).astype(np.float32)
    return (base + rng.uniform(-size, size, (num_tris, 3, 3))).astype(
        np.float32
    )


def _random_rays(rng, num_rays, spread=3.0):
    o = rng.uniform(-spread, spread, (num_rays, 3)).astype(np.float32)
    d = rng.normal(size=(num_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestBuild:
    def test_morton_order_is_permutation(self):
        rng = np.random.default_rng(0)
        verts = _random_soup(rng, 333)
        order = morton_order(verts)
        assert sorted(order.tolist()) == list(range(333))

    @pytest.mark.parametrize("num_tris", [333, 128 * 3, 128 * 5 + 1])
    def test_cluster_order_is_permutation_with_tail_last(self, num_tris):
        """cluster_order is the PRODUCTION renumbering (accel.prepare_scene):
        it must be a permutation whose partial cluster (num_tris % 128) is
        emitted LAST, every other leaf exactly CLUSTER_WIDTH wide -- the
        invariant the kernels' id reconstruction (c*128 + lane) rests on."""
        rng = np.random.default_rng(num_tris)
        verts = _random_soup(rng, num_tris)
        order = cluster_order(verts)
        assert sorted(order.tolist()) == list(range(num_tris))
        # Leaf structure: with the DFS median-split rounding every leaf
        # except the global tail holds exactly CLUSTER_WIDTH triangles.
        tail = num_tris % CLUSTER_WIDTH
        n_full = num_tris // CLUSTER_WIDTH
        # Spatial coherence of full leaves: each full cluster's bbox volume
        # should be far below the whole soup's (sanity, not exact).
        ordered = verts[order]
        cbvh = build_cluster_bvh(ordered)
        bb = np.asarray(cbvh.clu_bbox)
        n_clusters = n_full + (1 if tail else 0)
        # all real clusters non-inverted, all pad clusters inverted
        assert (bb[:n_clusters, 0:3] <= bb[:n_clusters, 3:6] + 1e-6).all()
        assert (bb[n_clusters:, 0] > bb[n_clusters:, 3]).all()
        if tail:
            # the tail cluster holds exactly the remainder: its slots past
            # `tail` are padding (tri_const rows all zero there)
            tc = np.asarray(cbvh.tri_const[n_clusters - 1])
            assert (tc[0:15, tail:] == 0.0).all()
            assert np.abs(tc[0:3, :tail]).sum() > 0

    def test_cluster_padding_and_boxes(self):
        rng = np.random.default_rng(1)
        verts = _random_soup(rng, 200)
        verts = verts[morton_order(verts)]
        cbvh = build_cluster_bvh(verts)
        assert cbvh.num_clusters % CLUSTER_PAD == 0
        assert cbvh.tri_const.shape == (cbvh.num_clusters, 16, CLUSTER_WIDTH)
        # real clusters bound their triangles
        bb = np.asarray(cbvh.clu_bbox)
        n_real = -(-200 // CLUSTER_WIDTH)
        for c in range(n_real):
            tris = verts[c * CLUSTER_WIDTH : (c + 1) * CLUSTER_WIDTH]
            assert (bb[c, 0:3] <= tris.reshape(-1, 3).min(0) + 1e-6).all()
            assert (bb[c, 3:6] >= tris.reshape(-1, 3).max(0) - 1e-6).all()
        # pad clusters have inverted boxes (always culled)
        assert (bb[n_real:, 0:3] > bb[n_real:, 3:6]).all()



class TestKernelVsOracle:
    @pytest.mark.parametrize("num_tris,num_rays", [(60, 257), (900, 512)])
    def test_random_soup(self, num_tris, num_rays):
        rng = np.random.default_rng(num_tris)
        verts = _random_soup(rng, num_tris)
        verts = verts[morton_order(verts)]
        cbvh = build_cluster_bvh(verts)
        o, d = _random_rays(rng, num_rays)

        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster(cbvh, o, d, interpret=True)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        same = np.asarray(h0)
        np.testing.assert_array_equal(
            np.asarray(i0)[same], np.asarray(i1)[same]
        )
        np.testing.assert_allclose(
            np.asarray(t0)[same], np.asarray(t1)[same], rtol=1e-4, atol=1e-6
        )

    def test_active_mask(self):
        rng = np.random.default_rng(7)
        verts = _random_soup(rng, 100)
        verts = verts[morton_order(verts)]
        cbvh = build_cluster_bvh(verts)
        o, d = _random_rays(rng, 256)
        act = jnp.asarray(rng.random(256) > 0.5)

        _, i_all, h_all = nearest_hit_cluster(cbvh, o, d, interpret=True)
        t, i, h = nearest_hit_cluster(cbvh, o, d, active=act, interpret=True)
        act_np = np.asarray(act)
        assert not np.asarray(h)[~act_np].any()
        assert (np.asarray(i)[~act_np] == -1).all()
        np.testing.assert_array_equal(
            np.asarray(h)[act_np], np.asarray(h_all)[act_np]
        )
        np.testing.assert_array_equal(
            np.asarray(i)[act_np], np.asarray(i_all)[act_np]
        )

    def test_ray_count_not_multiple_of_packet(self):
        rng = np.random.default_rng(9)
        verts = _random_soup(rng, 100)
        verts = verts[morton_order(verts)]
        cbvh = build_cluster_bvh(verts)
        o, d = _random_rays(rng, 77)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster(cbvh, o, d, interpret=True)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        same = np.asarray(h0)
        np.testing.assert_array_equal(
            np.asarray(i0)[same], np.asarray(i1)[same]
        )

    def test_hbm_kernel_matches_vmem_kernel(self):
        """The HBM+DMA variant (big scenes) must agree bit-for-bit with the
        VMEM-resident kernel -- identical maths, different data motion."""
        rng = np.random.default_rng(21)
        verts = _random_soup(rng, 1200)
        verts = verts[morton_order(verts)]
        cbvh = build_cluster_bvh(verts)
        o, d = _random_rays(rng, 512)
        tv, iv, hv = nearest_hit_cluster(cbvh, o, d, interpret=True)
        th, ih, hh = nearest_hit_cluster_hbm(cbvh, o, d, interpret=True)
        np.testing.assert_array_equal(np.asarray(hv), np.asarray(hh))
        np.testing.assert_array_equal(np.asarray(iv), np.asarray(ih))
        np.testing.assert_array_equal(np.asarray(tv), np.asarray(th))

    @pytest.mark.parametrize("num_tris,num_rays", [(60, 257), (900, 300)])
    def test_flat_kernel_vs_oracle(self, num_tris, num_rays):
        """The tiny-scene flat kernel (no queue, no sort) must match the
        oracle including the active mask and non-multiple-of-packet rays."""
        rng = np.random.default_rng(num_tris + 1)
        verts = _random_soup(rng, num_tris)
        verts = verts[cluster_order(verts)]
        cbvh = build_cluster_bvh(verts)
        o, d = _random_rays(rng, num_rays)
        act = jnp.asarray(rng.random(num_rays) > 0.3)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster_flat(
            cbvh, o, d, active=act, interpret=True
        )
        a = np.asarray(act)
        np.testing.assert_array_equal(np.asarray(h0)[a], np.asarray(h1)[a])
        assert not np.asarray(h1)[~a].any()
        same = np.asarray(h0) & a
        np.testing.assert_array_equal(np.asarray(i0)[same], np.asarray(i1)[same])
        np.testing.assert_allclose(
            np.asarray(t0)[same], np.asarray(t1)[same], rtol=1e-4, atol=1e-6
        )

    @pytest.mark.parametrize("branch", [16, 32])
    def test_blk_kernel_vs_oracle(self, branch):
        """The v3 blocked HBM kernel (header-tile cull + quad-visit ring)
        must match the oracle at both candidate block sizes."""
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        rng = np.random.default_rng(100 + branch)
        verts = _random_soup(rng, 1800)
        verts = verts[cluster_order(verts)]
        cbvh = with_blocks(build_cluster_bvh(verts), branch)
        o, d = _random_rays(rng, 384)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster_blk(cbvh, o, d, interpret=True)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        same = np.asarray(h0)
        np.testing.assert_array_equal(np.asarray(i0)[same], np.asarray(i1)[same])
        np.testing.assert_allclose(
            np.asarray(t0)[same], np.asarray(t1)[same], rtol=1e-4, atol=1e-6
        )
        # stats mode returns per-packet [block visits, clusters intersected]
        *_, st = nearest_hit_cluster_blk(cbvh, o, d, interpret=True, stats=True)
        st = np.asarray(st)
        assert st.shape[1] == 2 and (st >= 0).all() and st[:, 0].sum() > 0

    def test_flat_mxu_kernel_vs_oracle(self):
        from isaklm_raytracer_tpu.accel.cluster import with_mxu_tiles
        from isaklm_raytracer_tpu.kernels.intersect import (
            nearest_hit_cluster_flat_mxu,
        )

        rng = np.random.default_rng(77)
        verts = _random_soup(rng, 700)
        verts = verts[cluster_order(verts)]
        cbvh = with_mxu_tiles(build_cluster_bvh(verts))
        o, d = _random_rays(rng, 300)
        act = jnp.asarray(rng.random(300) > 0.3)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster_flat_mxu(
            cbvh, o, d, active=act, interpret=True
        )
        a = np.asarray(act)
        np.testing.assert_array_equal(np.asarray(h0)[a], np.asarray(h1)[a])
        same = np.asarray(h0) & a
        np.testing.assert_array_equal(np.asarray(i0)[same], np.asarray(i1)[same])
        np.testing.assert_allclose(
            np.asarray(t0)[same], np.asarray(t1)[same], rtol=1e-4, atol=1e-6
        )

    @pytest.mark.parametrize("branch", [16, 32])
    def test_blk_kernel_mxu_vs_oracle(self, branch):
        """The MXU-layout variant (dot products as per-cluster matmuls)
        must reproduce the oracle exactly (f32 dot_general in interpret
        mode; on TPU the bench oracle gate covers the bf16x3 MXU path)."""
        from isaklm_raytracer_tpu.accel.cluster import with_mxu_blocks

        rng = np.random.default_rng(300 + branch)
        verts = _random_soup(rng, 1700)
        verts = verts[cluster_order(verts)]
        cbvh = with_mxu_blocks(build_cluster_bvh(verts), branch)
        o, d = _random_rays(rng, 384)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster_blk(cbvh, o, d, interpret=True,
                                             mxu=True)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        same = np.asarray(h0)
        np.testing.assert_array_equal(np.asarray(i0)[same], np.asarray(i1)[same])
        np.testing.assert_allclose(
            np.asarray(t0)[same], np.asarray(t1)[same], rtol=1e-4, atol=1e-6
        )

    def test_blk_kernel_via_build_flag(self):
        """build_cluster_bvh(blk_branch=...) (the prepare_scene path) must
        produce the same blocked tables as with_blocks."""
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        rng = np.random.default_rng(5)
        verts = _random_soup(rng, 700)
        verts = verts[cluster_order(verts)]
        a = build_cluster_bvh(verts, blk_branch=16)
        b = with_blocks(build_cluster_bvh(verts), 16)
        np.testing.assert_array_equal(
            np.asarray(a.blk_const), np.asarray(b.blk_const)
        )
        np.testing.assert_array_equal(
            np.asarray(a.blk_bbox_t), np.asarray(b.blk_bbox_t)
        )
        assert a.blk_branch == 16

    @pytest.mark.parametrize("branch", [16, 32])
    def test_hbm_kernel_other_oct_branches(self, branch):
        """with_oct_branch rebuilds the DMA-block tables for 16/32-cluster
        blocks; the kernel's matching oct_branch static arg must keep full
        oracle agreement (the hero sweep's candidate defaults)."""
        rng = np.random.default_rng(branch)
        verts = _random_soup(rng, 1500)
        verts = verts[cluster_order(verts)]
        cbvh = with_oct_branch(build_cluster_bvh(verts), branch)
        o, d = _random_rays(rng, 384)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster_hbm(
            cbvh, o, d, interpret=True, oct_branch=branch
        )
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        same = np.asarray(h0)
        np.testing.assert_array_equal(np.asarray(i0)[same], np.asarray(i1)[same])
        np.testing.assert_allclose(
            np.asarray(t0)[same], np.asarray(t1)[same], rtol=1e-4, atol=1e-6
        )

    def test_rays_from_inside_scene(self):
        """Origins on/inside geometry: the t_eps rule and axis-parallel
        rays (d component == 0 -> inf slab reciprocals)."""
        rng = np.random.default_rng(11)
        verts = _random_soup(rng, 300, spread=1.0)
        verts = verts[morton_order(verts)]
        cbvh = build_cluster_bvh(verts)
        o = jnp.zeros((256, 3), jnp.float32)
        axes = np.zeros((256, 3), np.float32)
        axes[np.arange(256), np.arange(256) % 3] = np.where(
            (np.arange(256) // 3) % 2 == 0, 1.0, -1.0
        )
        d = jnp.asarray(axes)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster(cbvh, o, d, interpret=True)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        same = np.asarray(h0)
        np.testing.assert_array_equal(
            np.asarray(i0)[same], np.asarray(i1)[same]
        )


class TestGradThroughKernel:
    """Regression: jax.grad through a render using the Pallas intersector
    must not crash (pallas_call has no autodiff rule; inputs are detached in
    _prep_rays). Round-1 shipped with this broken -- BENCH_r01.json rc=1."""

    def _setup(self):
        import functools

        from isaklm_raytracer_tpu.accel import prepare_scene
        from isaklm_raytracer_tpu.camera import Camera
        from isaklm_raytracer_tpu.config import RenderConfig
        from isaklm_raytracer_tpu.scene import procedural

        config = RenderConfig(width=8, height=8, max_bounces=3, ray_chunk=0)
        scene = prepare_scene(procedural.cornell_box())
        trace_fn = functools.partial(
            nearest_hit_cluster,
            scene.cbvh,
            t_eps=config.t_epsilon,
            interpret=True,
        )
        camera = Camera.create(position=(0.0, 0.0, -0.9), fov=3.14159 / 2)
        return scene, camera, config, trace_fn

    def test_grad_albedo(self):
        from isaklm_raytracer_tpu.integrator.render import render_sample

        scene, camera, config, trace_fn = self._setup()
        key = jax.random.PRNGKey(0)

        def loss(albedo):
            s = scene.replace(materials=scene.materials.replace(albedo=albedo))
            return jnp.mean(render_sample(s, camera, key, config, trace_fn=trace_fn))

        g = jax.grad(loss)(scene.materials.albedo)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0

    def test_grad_camera_position(self):
        """Camera-pose tangents flow through ray ORIGINS straight into the
        kernel inputs -- the exact path that crashed round 1."""
        from isaklm_raytracer_tpu.integrator.render import render_sample

        scene, camera, config, trace_fn = self._setup()
        key = jax.random.PRNGKey(1)

        def loss(pos):
            cam = camera.replace(position=pos)
            return jnp.mean(render_sample(scene, cam, key, config, trace_fn=trace_fn))

        g = np.asarray(jax.grad(loss)(camera.position))
        assert np.isfinite(g).all()


class TestPreparedSceneConsistency:
    def test_renumbering_keeps_render_semantics(self):
        """prepare_scene permutes triangles; lights/materials/uvs must stay
        consistent: a cornell render through the wavefront path must be
        finite and lit."""
        from isaklm_raytracer_tpu.accel import prepare_scene
        from isaklm_raytracer_tpu.camera import Camera
        from isaklm_raytracer_tpu.config import RenderConfig
        from isaklm_raytracer_tpu.integrator.render import render, resolve_image
        from isaklm_raytracer_tpu.scene import procedural

        config = RenderConfig(width=16, height=16, max_bounces=3, ray_chunk=0)
        scene = prepare_scene(procedural.cornell_box())
        mats = np.asarray(scene.materials.emittance[np.asarray(scene.mat_id)])
        lights = np.asarray(scene.light_indices)
        # every light triangle is emissive in the permuted numbering
        assert (mats[lights] > 0).any(axis=-1).all()
        camera = Camera.create(position=(0.0, 0.0, -0.9), fov=3.14159 / 2)
        gb = render(scene, camera, config, num_samples=2)
        img = np.asarray(resolve_image(gb, config))
        assert np.isfinite(img).all() and img.mean() > 0.01


class TestSelectionAndKnobs:
    def test_compact_bucket_ceil_halving_odd_sizes(self):
        from isaklm_raytracer_tpu.integrator.render import compact_bucket

        # odd pixel count must still halve (VERDICT r3 weak #6)
        assert compact_bucket(10, 399, 8) < 399
        assert compact_bucket(10, 399, 8) >= 10
        # ladder floors at chunk
        assert compact_bucket(1, 1024, 128) == 128
        # full when active ~ all
        assert compact_bucket(1000, 1024, 8) == 1024

    def test_intersector_name_auto_and_override(self, monkeypatch):
        from isaklm_raytracer_tpu.integrator.render import intersector_name

        rng = np.random.default_rng(0)
        small = build_cluster_bvh(_random_soup(rng, 200))
        assert intersector_name(small) == "flat"
        big = build_cluster_bvh(_random_soup(rng, 2000))  # > 64 clusters?
        # 2000 tris -> 16 real clusters -> still flat; force the override
        monkeypatch.setenv("ISAKLM_INTERSECTOR", "queue")
        assert intersector_name(big) == "queue"
        monkeypatch.delenv("ISAKLM_INTERSECTOR")
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        blk = with_blocks(small, 16)
        # small cluster count still picks flat even with blk tables
        assert intersector_name(blk) == "flat"

    def test_blk_kernel_sort_off_matches_sorted(self):
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        rng = np.random.default_rng(3)
        verts = _random_soup(rng, 1500)
        verts = verts[cluster_order(verts)]
        cbvh = with_blocks(build_cluster_bvh(verts), 16)
        o, d = _random_rays(rng, 300)
        t1, i1, h1 = nearest_hit_cluster_blk(cbvh, o, d, interpret=True)
        t2, i2, h2 = nearest_hit_cluster_blk(
            cbvh, o, d, interpret=True, sort_rays=False
        )
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    @pytest.mark.parametrize("branch", [16, 32])
    def test_blk_kernel_per_ray_vs_oracle(self, branch):
        """The v4 per-ray-early-termination mode (round-5 incoherent-ray
        path) must match the oracle exactly, including sparse active masks
        and rays that miss everything."""
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        rng = np.random.default_rng(500 + branch)
        verts = _random_soup(rng, 1800)
        verts = verts[cluster_order(verts)]
        cbvh = with_blocks(build_cluster_bvh(verts), branch)
        # mix of coherent rays, surface-origin bounce rays and far misses
        o1, d1 = _random_rays(rng, 300)
        pick = rng.integers(0, verts.shape[0], 200)
        o2 = jnp.asarray(verts[pick, 0] + 1e-3)
        d2_np = rng.normal(size=(200, 3)).astype(np.float32)
        d2 = jnp.asarray(d2_np / np.linalg.norm(d2_np, axis=1, keepdims=True))
        o = jnp.concatenate([o1, o2])
        d = jnp.concatenate([d1, d2])
        act = jnp.asarray(rng.random(500) > 0.3)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster_blk(
            cbvh, o, d, active=act, interpret=True, per_ray=True
        )
        a = np.asarray(act)
        np.testing.assert_array_equal(np.asarray(h0)[a], np.asarray(h1)[a])
        assert not np.asarray(h1)[~a].any()
        same = np.asarray(h0) & a
        np.testing.assert_array_equal(np.asarray(i0)[same], np.asarray(i1)[same])
        np.testing.assert_allclose(
            np.asarray(t0)[same], np.asarray(t1)[same], rtol=1e-4, atol=1e-6
        )
        # stats mode works in per-ray mode too
        *_, st = nearest_hit_cluster_blk(
            cbvh, o, d, active=act, interpret=True, per_ray=True, stats=True
        )
        st = np.asarray(st)
        assert st.shape[1] == 2 and (st >= 0).all() and st[:, 0].sum() > 0

    def test_blk_kernel_pipeline_depth_2(self):
        """The per-ray loop's pipeline depth (visits per iteration / DMA
        ring size) must not change results."""
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        rng = np.random.default_rng(22)
        verts = _random_soup(rng, 1800)
        verts = verts[cluster_order(verts)]
        cbvh = with_blocks(build_cluster_bvh(verts), 16)
        o, d = _random_rays(rng, 400)
        t4, i4, h4 = nearest_hit_cluster_blk(
            cbvh, o, d, interpret=True, per_ray=True
        )
        t2, i2, h2 = nearest_hit_cluster_blk(
            cbvh, o, d, interpret=True, per_ray=True, pipeline_depth=2
        )
        np.testing.assert_array_equal(np.asarray(h4), np.asarray(h2))
        np.testing.assert_array_equal(np.asarray(i4), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(t4), np.asarray(t2))

    def test_blk_kernel_t_max_window(self):
        """Seeded search windows (NEE shadow rays): hits strictly inside a
        ray's window match the unbounded result exactly; rays whose true
        nearest lies beyond their window report a clean miss."""
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        rng = np.random.default_rng(77)
        verts = _random_soup(rng, 1800)
        verts = verts[cluster_order(verts)]
        cbvh = with_blocks(build_cluster_bvh(verts), 16)
        o, d = _random_rays(rng, 400)
        t0, i0, h0 = nearest_hit_cluster_blk(cbvh, o, d, interpret=True,
                                             per_ray=True)
        # window: half the rays get a window beyond their hit (unchanged),
        # half get one in front of it (forced miss)
        t_np = np.asarray(t0)
        beyond = np.where(np.isfinite(t_np), t_np * 1.5, 1e3).astype(np.float32)
        before = np.where(np.isfinite(t_np), t_np * 0.5, 1e-2).astype(np.float32)
        sel = np.arange(400) % 2 == 0
        window = jnp.asarray(np.where(sel, beyond, before))
        t1, i1, h1 = nearest_hit_cluster_blk(
            cbvh, o, d, t_max=window, interpret=True, per_ray=True
        )
        np.testing.assert_array_equal(np.asarray(h1)[sel], np.asarray(h0)[sel])
        np.testing.assert_array_equal(np.asarray(i1)[sel], np.asarray(i0)[sel])
        np.testing.assert_array_equal(np.asarray(t1)[sel], np.asarray(t0)[sel])
        assert not np.asarray(h1)[~sel].any()
        assert (np.asarray(i1)[~sel] == -1).all()
        # global-tmax mode honors the window too
        t2, i2, h2 = nearest_hit_cluster_blk(
            cbvh, o, d, t_max=window, interpret=True, per_ray=False
        )
        np.testing.assert_array_equal(np.asarray(h2), np.asarray(h1))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))

    def test_blk_kernel_production_combo_vs_oracle(self):
        """The exact production configuration for big scenes (branch-128
        DMA blocks, packet 128, per-ray termination -- accel.prepare_scene
        + integrator.render.BLK_PACKET) must match the oracle."""
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        rng = np.random.default_rng(64128)
        verts = _random_soup(rng, 33000)  # > 128 clusters -> several blocks
        verts = verts[cluster_order(verts)]
        cbvh = with_blocks(build_cluster_bvh(verts), 128)
        o, d = _random_rays(rng, 500)
        t0, i0, h0 = nearest_hit_brute(o, d, vertices=jnp.asarray(verts))
        t1, i1, h1 = nearest_hit_cluster_blk(
            cbvh, o, d, interpret=True, per_ray=True, packet=128
        )
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        same = np.asarray(h0)
        np.testing.assert_array_equal(np.asarray(i0)[same], np.asarray(i1)[same])
        np.testing.assert_allclose(
            np.asarray(t0)[same], np.asarray(t1)[same], rtol=1e-4, atol=1e-6
        )

    def test_blk_kernel_block_sort_matches_morton(self):
        """sort_rays="block" (the round-5 binned incoherent-ray path) must
        be bit-identical to the Morton ordering -- traversal order cannot
        change results (the cluster build is a partition)."""
        from isaklm_raytracer_tpu.accel.cluster import with_blocks

        rng = np.random.default_rng(9)
        verts = _random_soup(rng, 1800)
        verts = verts[cluster_order(verts)]
        cbvh = with_blocks(build_cluster_bvh(verts), 16)
        # incoherent bounce-like population: origins on triangles, random
        # directions, sparse active mask (the NEE/deep-bounce regime)
        pick = rng.integers(0, verts.shape[0], 600)
        o = jnp.asarray(verts[pick, 0] + 1e-3)
        d_np = rng.normal(size=(600, 3)).astype(np.float32)
        d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))
        act = jnp.asarray(rng.random(600) > 0.4)
        t1, i1, h1 = nearest_hit_cluster_blk(
            cbvh, o, d, active=act, interpret=True
        )
        t2, i2, h2 = nearest_hit_cluster_blk(
            cbvh, o, d, active=act, interpret=True, sort_rays="block"
        )
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_first_block_keys_semantics(self):
        """first_block_keys: the key's leading factor must be the block
        whose bbox the ray ACTUALLY enters first; miss-all rays key to
        _BIG_ID - 1 and inactive rays to _BIG_ID (sorted past misses)."""
        from isaklm_raytracer_tpu.accel.cluster import with_blocks
        from isaklm_raytracer_tpu.kernels.intersect import (
            _BIG_ID,
            first_block_keys,
        )

        rng = np.random.default_rng(21)
        verts = _random_soup(rng, 1800)
        verts = verts[cluster_order(verts)]
        cbvh = with_blocks(build_cluster_bvh(verts), 16)
        o, d = _random_rays(rng, 300)
        act = np.ones(300, bool)
        act[::7] = False
        keys = np.asarray(first_block_keys(
            cbvh, o, d, active=jnp.asarray(act), interpret=True
        ))
        assert keys.shape == (300,)
        assert (keys[~act] == _BIG_ID).all()

        # oracle: slab test per (ray, block) in numpy
        bb = np.asarray(cbvh.blk_bbox_t)
        n = bb.shape[1]
        o_np, d_np = np.asarray(o), np.asarray(d)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            inv = 1.0 / d_np
            t1 = (bb[0:3, :].T[None] - o_np[:, None]) * inv[:, None]  # (R, n, 3)
            t2 = (bb[3:6, :].T[None] - o_np[:, None]) * inv[:, None]
        near = np.minimum(t1, t2).max(axis=2)
        far = np.maximum(t1, t2).min(axis=2)
        pierce = (near <= far) & (far >= 1e-5) & (bb[6, :] > 0)[None]
        entry = np.where(pierce, np.maximum(near, 0.0), np.inf)
        first = entry.argmin(axis=1)
        any_pierce = pierce.any(axis=1)
        lead = keys[act] // (8 * (n + 1))
        np.testing.assert_array_equal(
            lead[any_pierce[act]], first[act][any_pierce[act]]
        )
        assert (keys[act][~any_pierce[act]] == _BIG_ID - 1).all()
