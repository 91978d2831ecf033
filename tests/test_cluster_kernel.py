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
    CLUSTER_WIDTH,
    SUP_BRANCH,
    build_cluster_bvh,
    morton_order,
)
from isaklm_raytracer_tpu.accel.traverse import nearest_hit_brute
from isaklm_raytracer_tpu.kernels.intersect import (
    nearest_hit_cluster,
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

    def test_cluster_padding_and_boxes(self):
        rng = np.random.default_rng(1)
        verts = _random_soup(rng, 200)
        verts = verts[morton_order(verts)]
        cbvh = build_cluster_bvh(verts)
        assert cbvh.num_clusters % SUP_BRANCH == 0
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

    def test_supercluster_contains_children(self):
        rng = np.random.default_rng(2)
        verts = _random_soup(rng, 500)
        verts = verts[morton_order(verts)]
        cbvh = build_cluster_bvh(verts)
        sup = np.asarray(cbvh.sup_bbox)
        clu = np.asarray(cbvh.clu_bbox).reshape(-1, SUP_BRANCH, 8)
        real = clu[..., 0] <= clu[..., 3]
        for s in range(sup.shape[0]):
            if not real[s].any():
                continue
            kids = clu[s][real[s]]
            assert (sup[s, 0:3] <= kids[:, 0:3].min(0) + 1e-6).all()
            assert (sup[s, 3:6] >= kids[:, 3:6].max(0) - 1e-6).all()


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
