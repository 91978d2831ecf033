"""Color pipeline: sRGB OETF, ACES (Stephen Hill RRT+ODT fit), luminance.

Numerically matches the reference in float32 so golden images agree:
  - gamma_correction: math_library.cuh:37-47
  - aces_curve:       math_library.cuh:49-52
  - aces_tone_mapping (input/output 3x3 matrices): math_library.cuh:422-443
  - correct_color:    math_library.cuh:445-460
  - luminance (Rec.709 weights): math_library.cuh:263-266

All functions take arrays whose last axis is RGB (shape (..., 3)) and are
differentiable; `correct_color` is the display transform applied both to the
progressive preview and to the saved PNG (render.cuh:48-53,
save_render.cuh:47-52).
"""

from __future__ import annotations

import jax.numpy as jnp

# The reference's Matrix3X3 stores COLUMN vectors (math_library.cuh:319-335,
# m*v = x*i + y*j + z*k), so the row-major matrices here are the transpose of
# the initializer lists at math_library.cuh:424-436.
ACES_INPUT = jnp.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    dtype=jnp.float32,
)

ACES_OUTPUT = jnp.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    dtype=jnp.float32,
)

LUMINANCE_WEIGHTS = jnp.array([0.2126, 0.7152, 0.0722], dtype=jnp.float32)


def gamma_correction(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB OETF (math_library.cuh:37-47). Elementwise."""
    x = jnp.asarray(x, jnp.float32)
    linear = 12.92 * x
    # Guard the pow against negative bases; the curve branch is only selected
    # for x > 0.0031308 so the guard never changes values, only gradients/nans.
    safe = jnp.maximum(x, 1e-10)
    curved = 1.055 * jnp.power(safe, 1.0 / 2.4) - 0.055
    return jnp.where(x > 0.0031308, curved, linear)


def aces_curve(x: jnp.ndarray) -> jnp.ndarray:
    """Fitted RRT+ODT rational curve (math_library.cuh:49-52). Elementwise."""
    x = jnp.asarray(x, jnp.float32)
    num = x * (x + 0.0245786) - 0.000090537
    den = x * (0.983729 * x + 0.4329510) + 0.238081
    return num / den


def aces_tone_mapping(color: jnp.ndarray) -> jnp.ndarray:
    """ACES tonemap on (..., 3) RGB (math_library.cuh:422-443)."""
    color = jnp.asarray(color, jnp.float32)
    color = color @ ACES_INPUT.T
    color = aces_curve(color)
    return color @ ACES_OUTPUT.T


def correct_color(color: jnp.ndarray) -> jnp.ndarray:
    """Display transform: clamp>=0 -> ACES -> sRGB gamma -> clamp [0,1].

    Reference: math_library.cuh:445-460.
    """
    color = jnp.maximum(jnp.asarray(color, jnp.float32), 0.0)
    color = aces_tone_mapping(color)
    color = gamma_correction(color)
    return jnp.clip(color, 0.0, 1.0)


def luminance(color: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance of (..., 3) RGB (math_library.cuh:263-266)."""
    return jnp.asarray(color, jnp.float32) @ LUMINANCE_WEIGHTS
