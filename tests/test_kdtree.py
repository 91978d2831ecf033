"""KD-tree build + traversal vs the brute-force oracle
(create_kd_tree.cuh / trace_ray.cuh:244-318). The reference validated its
tree visually; here every random ray must agree with the exact O(N) scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaklm_raytracer_tpu.accel.kd_traverse import nearest_hit_kd
from isaklm_raytracer_tpu.accel.kdtree import build_kd_tree
from isaklm_raytracer_tpu.accel.traverse import nearest_hit_brute
from isaklm_raytracer_tpu.scene.procedural import cornell_box, triangle_soup


def random_rays(n, extent, seed):
    key = jax.random.PRNGKey(seed)
    o = jax.random.uniform(key, (n, 3), minval=-extent, maxval=extent)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def assert_matches_oracle(scene_vertices, kd, o, d):
    t_b, i_b, h_b = nearest_hit_brute(o, d, scene_vertices)
    t_k, i_k, h_k = nearest_hit_kd(kd, scene_vertices, o, d)
    np.testing.assert_array_equal(np.asarray(h_k), np.asarray(h_b))
    hits = np.asarray(h_b)
    # The same nearest t must be found. Indices may differ only when two
    # triangles intersect at exactly equal t (shared edges).
    # 1e-5: the oracle normalizes with 1/sqrt, the traversal with rsqrt --
    # same formula, last-ulp differences in fp32.
    np.testing.assert_allclose(
        np.asarray(t_k)[hits], np.asarray(t_b)[hits], rtol=1e-5, atol=1e-5
    )
    same = np.asarray(i_k) == np.asarray(i_b)
    assert same[hits].mean() > 0.99


def test_build_shapes_and_invariants():
    scene = cornell_box()
    kd = build_kd_tree(np.asarray(scene.vertices), max_depth=6, leaf_size=4)
    child_a = np.asarray(kd.child_a)
    child_b = np.asarray(kd.child_b)
    is_leaf = np.asarray(kd.is_leaf)
    n_nodes = len(is_leaf)
    assert not is_leaf[0]  # root always inner (create_kd_tree.cuh:273-283)
    # inner children in range; leaves reference the flat index array
    idx = np.asarray(kd.tri_indices)
    for i in range(n_nodes):
        if is_leaf[i]:
            assert child_a[i] + child_b[i] <= len(idx)
        else:
            assert 0 < child_a[i] < n_nodes
            assert 0 < child_b[i] < n_nodes
    # every triangle appears somewhere
    assert set(idx.tolist()) == set(range(scene.num_triangles))
    # bbox padded by the reference epsilon
    verts = np.asarray(scene.vertices).reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(kd.bbox_min), verts.min(0) - 0.01, atol=1e-6)
    np.testing.assert_allclose(np.asarray(kd.bbox_max), verts.max(0) + 0.01, atol=1e-6)


def test_traversal_matches_oracle_cornell():
    scene = cornell_box()
    kd = build_kd_tree(np.asarray(scene.vertices), max_depth=8, leaf_size=4)
    o, d = random_rays(512, 0.95, seed=0)
    assert_matches_oracle(scene.vertices, kd, o, d)


def test_traversal_matches_oracle_soup():
    scene = triangle_soup(3000, seed=3)
    kd = build_kd_tree(np.asarray(scene.vertices))
    o, d = random_rays(512, 12.0, seed=1)
    assert_matches_oracle(scene.vertices, kd, o, d)


def test_traversal_matches_oracle_from_outside():
    scene = triangle_soup(500, seed=5)
    kd = build_kd_tree(np.asarray(scene.vertices))
    # rays starting far outside the bbox
    o, d = random_rays(256, 40.0, seed=2)
    assert_matches_oracle(scene.vertices, kd, o, d)


def test_degenerate_axis_aligned_rays():
    scene = cornell_box()
    kd = build_kd_tree(np.asarray(scene.vertices))
    o = jnp.array([[0.0, 0.0, 0.0], [0.3, -0.2, 0.1], [0.0, 0.0, -0.5]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
    assert_matches_oracle(scene.vertices, kd, o, d)


def test_duplicated_straddlers_no_false_hit():
    # A triangle straddling a split plane is in both leaves; the exit-dist
    # clamp must prevent reporting a farther hit first.
    scene = triangle_soup(64, seed=9, extent=2.0, tri_size=1.5)  # big overlapping tris
    kd = build_kd_tree(np.asarray(scene.vertices), max_depth=10, leaf_size=2)
    o, d = random_rays(512, 3.0, seed=7)
    assert_matches_oracle(scene.vertices, kd, o, d)


class TestWavefront:
    """Batched lockstep traversal (accel/wavefront.py) vs the oracle."""

    def _check(self, scene, extent, seed, kd_kwargs=None, leaf_width=8):
        from isaklm_raytracer_tpu.accel.wavefront import (
            build_wavefront_kd,
            nearest_hit_wavefront,
        )

        V = np.asarray(scene.vertices)
        kd = build_kd_tree(V, **(kd_kwargs or {}))
        wkd = build_wavefront_kd(kd, V, leaf_width=leaf_width)
        o, d = random_rays(512, extent, seed)
        t_b, i_b, h_b = nearest_hit_brute(o, d, scene.vertices)
        t_w, i_w, h_w = nearest_hit_wavefront(wkd, o, d)
        np.testing.assert_array_equal(np.asarray(h_w), np.asarray(h_b))
        hits = np.asarray(h_b)
        np.testing.assert_allclose(
            np.asarray(t_w)[hits], np.asarray(t_b)[hits], rtol=1e-5, atol=1e-5
        )
        same = np.asarray(i_w) == np.asarray(i_b)
        assert same[hits].mean() > 0.99

    def test_cornell(self):
        self._check(cornell_box(), 0.95, 0, dict(max_depth=8, leaf_size=4))

    def test_soup(self):
        self._check(triangle_soup(3000, seed=3), 12.0, 1)

    def test_straddlers(self):
        self._check(
            triangle_soup(64, seed=9, extent=2.0, tri_size=1.5), 3.0, 7,
            dict(max_depth=10, leaf_size=2),
        )

    def test_chunk_chains(self):
        # leaf_width 2 forces multi-chunk chains through most leaves
        self._check(cornell_box(), 0.95, 2, dict(max_depth=4, leaf_size=7),
                    leaf_width=2)

    def test_active_mask(self):
        from isaklm_raytracer_tpu.accel.wavefront import (
            build_wavefront_kd,
            nearest_hit_wavefront,
        )

        scene = cornell_box()
        V = np.asarray(scene.vertices)
        wkd = build_wavefront_kd(build_kd_tree(V), V)
        o, d = random_rays(64, 0.9, 11)
        active = jnp.arange(64) % 2 == 0
        t, i, h = nearest_hit_wavefront(wkd, o, d, active=active)
        assert not np.asarray(h)[1::2].any()
        t2, i2, h2 = nearest_hit_wavefront(wkd, o, d)
        np.testing.assert_array_equal(np.asarray(h)[::2], np.asarray(h2)[::2])
        np.testing.assert_array_equal(np.asarray(i)[::2], np.asarray(i2)[::2])
