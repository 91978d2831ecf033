"""Ray-triangle and nearest-hit oracle tests (trace_ray.cuh:73-172)."""

import jax
import jax.numpy as jnp
import numpy as np

from isaklm_raytracer_tpu.accel.traverse import (
    barycentric,
    hit_attributes,
    nearest_hit_brute,
)
from isaklm_raytracer_tpu.scene.procedural import SceneBuilder, cornell_box


def simple_scene():
    b = SceneBuilder()
    m = b.add_material(albedo=(1, 0, 0))
    # unit triangle in z=2 plane
    b.add_triangle((0, 0, 2), (1, 0, 2), (0, 1, 2), m)
    # farther triangle straight ahead
    b.add_triangle((-1, -1, 5), (1, -1, 5), (0, 2, 5), m)
    return b.build()


def test_hits_nearest():
    scene = simple_scene()
    o = jnp.array([[0.2, 0.2, 0.0], [-0.3, 0.5, 0.0], [5.0, 5.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, idx, hit = nearest_hit_brute(o, d, scene.vertices)
    assert bool(hit[0]) and int(idx[0]) == 0 and np.isclose(float(t[0]), 2.0)
    # second ray passes outside tri 0 (x < 0) but hits tri 1
    assert bool(hit[1]) and int(idx[1]) == 1 and np.isclose(float(t[1]), 5.0)
    assert not bool(hit[2])


def test_t_epsilon_rejects_origin_surface():
    scene = simple_scene()
    o = jnp.array([[0.2, 0.2, 2.0]])  # ray starts ON triangle 0
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, idx, hit = nearest_hit_brute(o, d, scene.vertices)
    assert not bool(hit[0]) or int(idx[0]) != 0


def test_backface_hits_still_count():
    # The reference has no back-face culling: hitting a triangle from behind
    # is a hit with the normal flipped (trace_ray.cuh:165-168).
    scene = simple_scene()
    o = jnp.array([[0.2, 0.2, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, idx, hit = nearest_hit_brute(o, d, scene.vertices)
    assert bool(hit[0]) and int(idx[0]) == 0
    attrs = hit_attributes(scene, o, d, idx, hit)
    # shading normal flipped toward the ray origin (+z)
    assert float(attrs.normal[0, 2]) > 0


def test_chunking_consistency():
    scene = cornell_box()
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (64, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t1, i1, h1 = nearest_hit_brute(o, d, scene.vertices, chunk=4)
    t2, i2, h2 = nearest_hit_brute(o, d, scene.vertices, chunk=2048)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)


def test_barycentric_recovers_vertices():
    p1 = jnp.array([[0.0, 0.0, 0.0]])
    p2 = jnp.array([[2.0, 0.0, 0.0]])
    p3 = jnp.array([[0.0, 3.0, 0.0]])
    for pt, expected in [
        ((0.0, 0.0, 0.0), (1, 0, 0)),
        ((2.0, 0.0, 0.0), (0, 1, 0)),
        ((0.0, 3.0, 0.0), (0, 0, 1)),
        ((1.0, 0.75, 0.0), (0.25, 0.5, 0.25)),
    ]:
        b = np.asarray(barycentric(jnp.array([pt]), p1, p2, p3))[0]
        np.testing.assert_allclose(b, expected, atol=1e-6)


def test_hit_attributes_interpolation():
    b = SceneBuilder()
    m = b.add_material(albedo=(0.5, 0.5, 0.5))
    b.add_triangle(
        (0, 0, 2), (1, 0, 2), (0, 1, 2), m,
        n1=(0, 0, -1), n2=(0, 0, -1), n3=(0, 0, -1),
        uvs=[(0, 0), (1, 0), (0, 1)],
    )
    scene = b.build()
    o = jnp.array([[0.25, 0.25, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, idx, hit = nearest_hit_brute(o, d, scene.vertices)
    attrs = hit_attributes(scene, o, d, idx, hit)
    np.testing.assert_allclose(np.asarray(attrs.position)[0], [0.25, 0.25, 2.0], atol=1e-5)
    assert np.isclose(float(attrs.t[0]), 2.0)
    # normal faces the incoming ray (flipped to -z)
    np.testing.assert_allclose(np.asarray(attrs.normal)[0], [0, 0, -1], atol=1e-6)


def test_hit_attributes_gradient_wrt_origin():
    """Hit distance must be differentiable w.r.t. the ray origin through the
    detached topology (the differentiable spine)."""
    scene = simple_scene()

    def depth(z0):
        o = jnp.stack([jnp.array(0.2), jnp.array(0.2), z0])[None]
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, idx, hit = nearest_hit_brute(o, d, scene.vertices)
        return hit_attributes(scene, o, d, idx, hit).t[0]

    g = jax.grad(depth)(jnp.float32(0.0))
    assert np.isclose(float(g), -1.0, atol=1e-5)  # moving origin +z reduces t
