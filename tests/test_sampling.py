"""Statistical tests for the sampling warps and closed-form checks for the
Fresnel/microfacet terms (reference path_tracing.cuh:45-149). The reference
validated these visually only (SURVEY.md section 4); here: chi^2 /
moment tests against the analytic distributions."""

import jax
import jax.numpy as jnp
import numpy as np

from isaklm_raytracer_tpu.math import sampling

FRAME = (
    jnp.array([0.0, 1.0, 0.0]),  # normal
    jnp.array([1.0, 0.0, 0.0]),  # tangent
    jnp.array([0.0, 0.0, 1.0]),  # bitangent
)


def _uniforms(n, seed=0):
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (2, n))
    return u[0], u[1]


def test_cosine_hemisphere_is_unit_and_upper():
    u1, u2 = _uniforms(4096)
    n, t, b = FRAME
    d = sampling.cosine_hemisphere(u1, u2, n, t, b)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    assert np.all(np.asarray(d)[:, 1] >= 0.0)


def test_cosine_hemisphere_cos_theta_moments():
    # pdf(theta) = cos(theta)/pi on the hemisphere => E[cos] = 2/3,
    # E[cos^2] = 1/2.
    u1, u2 = _uniforms(200_000)
    n, t, b = FRAME
    cos_t = np.asarray(sampling.cosine_hemisphere(u1, u2, n, t, b))[:, 1]
    assert np.isclose(cos_t.mean(), 2.0 / 3.0, atol=5e-3)
    assert np.isclose((cos_t**2).mean(), 0.5, atol=5e-3)


def test_ggx_half_vector_cdf():
    # GGX NDF sampling: CDF(theta) = (1-u) mapping gives
    # cos^2 = (1-u)/(u(a^2-1)+1). Check the empirical CDF of cos^2 theta
    # against the closed form inverse.
    a = 0.5
    u1, u2 = _uniforms(100_000, seed=1)
    n, t, b = FRAME
    h = sampling.ggx_half_vector(u1, u2, jnp.float32(a), n, t, b)
    cos2 = np.asarray(h)[:, 1] ** 2
    # invert: u = (1 - cos2) / (cos2 * (a^2 - 1) + 1)... derive from the warp
    u = (1.0 - cos2) / (cos2 * (a * a - 1.0) + 1.0)
    # u must be uniform [0,1]
    hist, _ = np.histogram(u, bins=20, range=(0, 1))
    expected = len(u) / 20
    chi2 = ((hist - expected) ** 2 / expected).sum()
    assert chi2 < 60.0  # 19 dof, p ~ 1e-5 cutoff


def test_fresnel_dielectric_normal_incidence():
    # At normal incidence F = ((n2-n1)/(n2+n1))^2.
    wi = jnp.array([[0.0, 1.0, 0.0]])
    h = jnp.array([[0.0, 1.0, 0.0]])
    for n2 in [1.5, 2.0]:
        f = float(sampling.fresnel_dielectric(wi, h, jnp.float32(1.0), jnp.float32(n2))[0])
        assert np.isclose(f, ((n2 - 1) / (n2 + 1)) ** 2, rtol=1e-4)


def test_fresnel_dielectric_grazing_is_one():
    wi = jnp.array([[1.0, 1e-4, 0.0]])
    wi = wi / jnp.linalg.norm(wi)
    h = jnp.array([[0.0, 1.0, 0.0]])
    f = float(sampling.fresnel_dielectric(wi, h, jnp.float32(1.0), jnp.float32(1.5))[0])
    assert f > 0.98


def _ref_fresnel_conductor(cos_t, n, k):
    """Double-precision re-evaluation of the reference formula
    (path_tracing.cuh:76-101) including its nonstandard t3 term."""
    n2, k2 = n * n, k * k
    cos2 = cos_t * cos_t
    sin2 = 1.0 - cos2
    t0 = n2 - k2 - sin2
    a2b2 = np.sqrt(t0 * t0 + 4.0 * n2 * k2)
    a = np.sqrt(0.5 * (a2b2 + t0))
    t1 = a2b2 + cos2
    t2 = 2.0 * a * cos_t
    rs = (t1 - t2) / (t1 + t2)
    t3 = cos2 * a2b2 * sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / (t3 + t4)
    return 0.5 * (rs + rp)


def test_fresnel_conductor_matches_reference_formula():
    n, k = 0.27732, 2.9278  # gold (materials/dragon.mat)
    for angle in [np.pi / 6, np.pi / 4, np.pi / 3]:
        wi = jnp.array([[np.sin(angle), np.cos(angle), 0.0]], dtype=jnp.float32)
        h = jnp.array([[0.0, 1.0, 0.0]])
        f = float(sampling.fresnel_conductor(wi, h, jnp.float32(n), jnp.float32(k))[0])
        assert np.isclose(f, _ref_fresnel_conductor(np.cos(angle), n, k), rtol=1e-3)


def test_fresnel_conductor_normal_incidence_finite():
    # Exact normal incidence is 0/0 in the reference (CUDA NaN); we take the
    # formula's limit so gradients stay finite.
    wi = jnp.array([[0.0, 1.0, 0.0]])
    h = jnp.array([[0.0, 1.0, 0.0]])
    f = float(sampling.fresnel_conductor(wi, h, jnp.float32(0.27732), jnp.float32(2.9278))[0])
    assert np.isfinite(f)
    limit = _ref_fresnel_conductor(np.cos(1e-4), 0.27732, 2.9278)
    assert np.isclose(f, limit, atol=1e-3)


def test_reflect_mirrors():
    wi = jnp.array([[0.6, 0.8, 0.0]])
    h = jnp.array([[0.0, 1.0, 0.0]])
    out = np.asarray(sampling.reflect(wi, h))[0]
    np.testing.assert_allclose(out, [-0.6, 0.8, 0.0], atol=1e-6)


def test_refract_snell():
    # incidence 45 deg, n1=1, n2=1.5 -> sin(theta_t) = sin(45)/1.5
    wi = jnp.array([[np.sin(np.pi / 4), np.cos(np.pi / 4), 0.0]], dtype=jnp.float32)
    h = jnp.array([[0.0, 1.0, 0.0]])
    out = np.asarray(
        sampling.refract(wi, h, jnp.float32(1.0), jnp.float32(1.5))
    )[0]
    out = out / np.linalg.norm(out)
    sin_t = abs(out[0])
    assert np.isclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-5)
    assert out[1] < 0  # transmitted through the surface


def test_uniform_triangle_in_triangle_and_uniform():
    p1 = jnp.array([0.0, 0.0, 0.0])
    p2 = jnp.array([1.0, 0.0, 0.0])
    p3 = jnp.array([0.0, 1.0, 0.0])
    u1, u2 = _uniforms(50_000, seed=2)
    pts = np.asarray(sampling.uniform_triangle(u1, u2, p1, p2, p3))
    assert np.all(pts[:, 0] >= -1e-6)
    assert np.all(pts[:, 1] >= -1e-6)
    assert np.all(pts[:, 0] + pts[:, 1] <= 1.0 + 1e-5)
    # centroid of uniform distribution = (1/3, 1/3)
    assert np.allclose(pts.mean(axis=0)[:2], [1 / 3, 1 / 3], atol=5e-3)


def test_disc_aperture_radius():
    u1, u2 = _uniforms(50_000, seed=3)
    x, y = sampling.disc_aperture(u1, u2, jnp.float32(2.0))
    r = np.hypot(np.asarray(x), np.asarray(y))
    assert r.max() <= 2.0 + 1e-5
    # uniform disc => E[r] = 2/3 * R
    assert np.isclose(r.mean(), 4.0 / 3.0, atol=2e-2)


def test_specular_weight_near_one_for_smooth_normal_reflection():
    # Mirror-like bounce at near-normal incidence with tiny roughness should
    # carry weight ~= 1 (energy-preserving limit).
    n = jnp.array([[0.0, 1.0, 0.0]])
    wi = jnp.array([[0.05, 1.0, 0.0]])
    wi = wi / jnp.linalg.norm(wi)
    h = n
    wo = sampling.reflect(wi, h)
    w = float(sampling.specular_weight(wi, wo, h, n, jnp.float32(1e-3))[0])
    assert np.isclose(w, 1.0, atol=5e-3)
