"""3x3 transforms: yaw/pitch/roll rotation, uniform scale, inverse.

Matches the reference's conventions (math_library.cuh:384-420): the CUDA
Matrix3X3 stores column vectors and composes Rz(roll) @ Ry(yaw) @ Rx(pitch);
here matrices are ordinary row-major (3, 3) jnp arrays applied as ``M @ v``.
Works under jit/grad; angles may be traced values.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_matrix(yaw, pitch=0.0, roll=0.0) -> jnp.ndarray:
    """Rz(roll) @ Ry(yaw) @ Rx(pitch), reference math_library.cuh:384-408."""
    yaw = jnp.asarray(yaw, jnp.float32)
    pitch = jnp.asarray(pitch, jnp.float32)
    roll = jnp.asarray(roll, jnp.float32)

    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)

    one = jnp.ones_like(cy)
    zero = jnp.zeros_like(cy)

    # Column-vector initializers at math_library.cuh:386-405, transposed to
    # row-major.
    ry = jnp.stack(
        [
            jnp.stack([cy, zero, sy]),
            jnp.stack([zero, one, zero]),
            jnp.stack([-sy, zero, cy]),
        ]
    )
    rx = jnp.stack(
        [
            jnp.stack([one, zero, zero]),
            jnp.stack([zero, cp, -sp]),
            jnp.stack([zero, sp, cp]),
        ]
    )
    rz = jnp.stack(
        [
            jnp.stack([cr, -sr, zero]),
            jnp.stack([sr, cr, zero]),
            jnp.stack([zero, zero, one]),
        ]
    )
    return rz @ ry @ rx


def scale_matrix(scale) -> jnp.ndarray:
    """Uniform scale (math_library.cuh:410-420)."""
    return jnp.eye(3, dtype=jnp.float32) * jnp.asarray(scale, jnp.float32)


def invert(m: jnp.ndarray) -> jnp.ndarray:
    """Adjugate-based 3x3 inverse (math_library.cuh:357-382)."""
    m = jnp.asarray(m, jnp.float32)
    return jnp.linalg.inv(m).astype(jnp.float32)


def orthonormal_frame(normal: jnp.ndarray, edge: jnp.ndarray):
    """Shading frame used by the reference at hit points.

    tangent = normalize(cross(edge, normal)) with edge = p2 - p1, and
    bitangent = normalize(cross(normal, tangent)) (trace_ray.cuh:161-162).
    ``normal`` (..., 3) must be normalized; ``edge`` is any non-parallel
    vector.
    """
    tangent = normalize(cross(edge, normal))
    bitangent = normalize(cross(normal, tangent))
    return tangent, bitangent


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3D cross product on the last axis."""
    return jnp.cross(a, b)


def normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """v / |v| along ``axis`` (reference normalize, math_library.cuh:232-237).

    Like the reference, does not guard against zero vectors.
    """
    v = jnp.asarray(v, jnp.float32)
    # 1e-30 floor: identical to the reference away from the zero vector, but
    # keeps gradients finite on masked-out lanes (gradient hygiene for the
    # wavefront integrator's where-combinators).
    return v * jnp.reciprocal(
        jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), 1e-30))
    )
