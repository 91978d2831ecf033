"""Reparameterized sampling warps and microfacet/Fresnel terms.

Every sampler is a pure function of explicit uniform random numbers
(``u`` in [0,1)), so the same warp serves forward rendering and gradient
computation (low-variance reparameterized estimators: gradients flow through
the warp, the uniforms are constants).

Distribution-level parity with the reference (bitwise RNG parity is not a
goal; the reference uses a per-pixel PCG hash, path_tracing.cuh:34-43, while
we use counter-based threefry keys -- deterministic under any sharding):

  - cosine_hemisphere  <-> diffuse_direction      path_tracing.cuh:45-59
  - ggx_half_vector    <-> microfacet_normal      path_tracing.cuh:103-118
  - fresnel_dielectric                            path_tracing.cuh:61-74
  - fresnel_conductor                             path_tracing.cuh:76-101
  - smith_lambda / specular_weight                path_tracing.cuh:120-136
  - reflect / refract                             path_tracing.cuh:138-149
  - uniform_triangle   <-> random_point_in_triangle path_tracing.cuh:222-233
  - disc_aperture      <-> random_point_in_pinhole  path_tracing.cuh:327-336

All inputs are broadcastable; vectors live on the last axis (..., 3).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

TAU = 2.0 * math.pi


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cosine_hemisphere(u1, u2, normal, tangent, bitangent) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction (path_tracing.cuh:45-59).

    dir = sqrt(u2)*cos(phi)*T + sqrt(1-u2)*N + sqrt(u2)*sin(phi)*B with
    phi = u1 * 2pi. The returned direction is unit length by construction.
    """
    phi = u1 * TAU
    sqrt_u2 = jnp.sqrt(u2)
    cos_t = jnp.sqrt(1.0 - u2)
    return (
        (sqrt_u2 * jnp.cos(phi))[..., None] * tangent
        + cos_t[..., None] * normal
        + (sqrt_u2 * jnp.sin(phi))[..., None] * bitangent
    )


def ggx_half_vector(u1, u2, roughness, normal, tangent, bitangent) -> jnp.ndarray:
    """GGX NDF-sampled microfacet normal (path_tracing.cuh:103-118).

    cos(theta) = sqrt((1-u1) / (u1*(a^2-1)+1)) with a = roughness.
    """
    a2 = roughness * roughness
    denom = jnp.maximum(u1 * (a2 - 1.0) + 1.0, 1e-12)
    cos_t = jnp.sqrt(jnp.clip((1.0 - u1) / denom, 0.0, 1.0))
    # The 1e-12 floor keeps d(sin)/d(roughness) finite at roughness -> 0
    # (sin deviates from 0 by 1e-6; far below fp32 render noise).
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    phi = u2 * TAU
    return (
        (sin_t * jnp.cos(phi))[..., None] * tangent
        + cos_t[..., None] * normal
        + (sin_t * jnp.sin(phi))[..., None] * bitangent
    )


def fresnel_dielectric(wi, half, n1, n2) -> jnp.ndarray:
    """Exact dielectric Fresnel, Walter et al. form (path_tracing.cuh:61-74)."""
    c = jnp.abs(_dot(wi, half))
    g = jnp.sqrt(jnp.maximum((n2 * n2) / (n1 * n1) - 1.0 + c * c, 1e-12))
    factor1 = 0.5 * ((g - c) / jnp.maximum(g + c, 1e-12)) ** 2
    den = c * (g - c) + 1.0
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    factor2 = 1.0 + ((c * (g + c) - 1.0) / den) ** 2
    return factor1 * factor2


def fresnel_conductor(wi, half, n, k) -> jnp.ndarray:
    """Conductor Fresnel (path_tracing.cuh:76-101).

    NOTE: faithfully reproduces the reference's t3 term
    ``cos2 * a2b2 * sin2^2`` (multiplicative), which deviates from the
    Lagarde memo it cites (additive ``cos2*a2b2 + sin2^2``); the reference's
    rendered look depends on it. The exact normal-incidence point is 0/0 in
    the reference (CUDA NaN); we substitute the formula's analytic limit
    (ratio -> -1) to keep gradients finite -- a measure-zero difference.
    """
    n2 = n * n
    k2 = k * k
    cos_t = _dot(wi, half)
    cos2 = cos_t * cos_t
    sin2 = 1.0 - cos2

    t0 = n2 - k2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * n2 * k2, 0.0))
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))

    t1 = a2b2 + cos2
    t2 = 2.0 * a * cos_t
    rs = (t1 - t2) / (t1 + t2)

    t3 = cos2 * a2b2 * sin2 * sin2
    t4 = t2 * sin2
    denom = t3 + t4
    ratio = jnp.where(denom != 0.0, (t3 - t4) / jnp.where(denom != 0.0, denom, 1.0), -1.0)
    rp = rs * ratio

    return 0.5 * (rs + rp)


def smith_lambda(direction, normal, roughness) -> jnp.ndarray:
    """Reference's Smith lambda term (path_tracing.cuh:120-127).

    NOTE: faithfully reproduces the reference formula
    (sqrt(1 + roughness^2 + tan^2) - 1)/2 -- the roughness^2 term is additive
    there, not multiplying tan^2 as in canonical Smith-GGX. Image parity wins.
    """
    d = _dot(direction, normal)
    d2 = jnp.maximum(d * d, 1e-12)
    tan2 = (1.0 - d2) / d2
    return (jnp.sqrt(1.0 + roughness * roughness + tan2) - 1.0) * 0.5


def specular_weight(wi, wo, half, normal, roughness) -> jnp.ndarray:
    """Microfacet sample weight |i.h| G / (|n.h| |i.n|).

    Reference path_tracing.cuh:129-136 (scalar; caller broadcasts to RGB).
    """
    g = 1.0 / (
        1.0 + smith_lambda(wi, normal, roughness) + smith_lambda(wo, normal, roughness)
    )
    return jnp.abs(_dot(wi, half)) * g / jnp.maximum(
        jnp.abs(_dot(normal, half)) * jnp.abs(_dot(wi, normal)), 1e-12
    )


def reflect(wi, half) -> jnp.ndarray:
    """Mirror direction 2(i.h)h - i (path_tracing.cuh:138-141)."""
    return 2.0 * _dot(wi, half)[..., None] * half - wi


def refract(wi, half, n1, n2) -> jnp.ndarray:
    """Refraction direction (path_tracing.cuh:143-149); total internal
    reflection is clamped to the grazing direction exactly as the reference
    clamps the sqrt argument to 0."""
    c = _dot(wi, half)
    n = n1 / n2
    root = jnp.sqrt(jnp.maximum(1.0 + n * n * (c * c - 1.0), 1e-12))
    return (n * c - root)[..., None] * half - n[..., None] * wi


def uniform_triangle(u1, u2, p1, p2, p3) -> jnp.ndarray:
    """Uniform point on a triangle via sqrt warp (path_tracing.cuh:222-233)."""
    sqrt_x = jnp.sqrt(u1)
    u = 1.0 - sqrt_x
    v = u2 * sqrt_x
    w = 1.0 - u - v
    return u[..., None] * p1 + v[..., None] * p2 + w[..., None] * p3


def disc_aperture(u1, u2, radius):
    """(x, y) offset inside an aperture disc (path_tracing.cuh:327-336)."""
    theta = u1 * TAU
    r = jnp.sqrt(u2) * radius
    return r * jnp.cos(theta), r * jnp.sin(theta)
