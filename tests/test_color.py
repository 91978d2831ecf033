"""Color pipeline unit tests (reference math_library.cuh:37-52, 422-460).

The reference has no tests; expected values here are independent NumPy
float32/float64 re-evaluations of the published formulas.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from isaklm_raytracer_tpu.math import color


def ref_gamma(x):
    x = np.asarray(x, np.float64)
    return np.where(x > 0.0031308, 1.055 * np.power(np.maximum(x, 0), 1 / 2.4) - 0.055, 12.92 * x)


def test_gamma_correction_matches_srgb_oetf():
    x = np.linspace(0.0, 1.0, 257, dtype=np.float32)
    got = np.asarray(color.gamma_correction(x))
    np.testing.assert_allclose(got, ref_gamma(x), rtol=2e-5, atol=2e-6)


def test_gamma_correction_linear_segment():
    assert np.isclose(float(color.gamma_correction(0.001)), 0.01292, rtol=1e-5)


def test_aces_curve_values():
    # Hand-evaluated rational at a few points.
    for x in [0.0, 0.18, 1.0, 4.0]:
        num = x * (x + 0.0245786) - 0.000090537
        den = x * (0.983729 * x + 0.4329510) + 0.238081
        assert np.isclose(float(color.aces_curve(x)), num / den, rtol=1e-6)


def test_aces_matrices_are_reference_transposes():
    # Column-vector initializers at math_library.cuh:424-436.
    cols_in = np.array(
        [[0.59719, 0.07600, 0.02840], [0.35458, 0.90834, 0.13383], [0.04823, 0.01566, 0.83777]]
    )
    np.testing.assert_allclose(np.asarray(color.ACES_INPUT), cols_in.T, atol=1e-7)


def test_correct_color_grey_reference_pipeline():
    c = np.array([0.5, 0.5, 0.5], np.float64)
    m_in = np.asarray(color.ACES_INPUT, np.float64)
    m_out = np.asarray(color.ACES_OUTPUT, np.float64)
    v = m_in @ c
    v = (v * (v + 0.0245786) - 0.000090537) / (v * (0.983729 * v + 0.4329510) + 0.238081)
    v = m_out @ v
    v = ref_gamma(np.maximum(v, 0))
    expected = np.clip(v, 0, 1)
    got = np.asarray(color.correct_color(jnp.asarray(c, jnp.float32)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_correct_color_clamps():
    out = np.asarray(color.correct_color(jnp.array([[-1.0, 0.0, 100.0]])))
    assert np.all(out >= 0) and np.all(out <= 1)
    # negative input clamps to 0 BEFORE tonemapping: same result as 0 input
    out0 = np.asarray(color.correct_color(jnp.array([[0.0, 0.0, 100.0]])))
    np.testing.assert_allclose(out, out0)


def test_luminance_weights():
    assert np.isclose(float(color.luminance(jnp.array([1.0, 1.0, 1.0]))), 1.0, atol=1e-4)
    assert np.isclose(float(color.luminance(jnp.array([0.0, 1.0, 0.0]))), 0.7152)


def test_batched_shapes():
    img = jnp.ones((4, 5, 3))
    assert color.correct_color(img).shape == (4, 5, 3)
    assert color.luminance(img).shape == (4, 5)
