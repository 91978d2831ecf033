"""Finite-difference gradient checking harness (BASELINE.json metric:
"grad allclose vs FD").

Monte-Carlo rendering makes naive FD useless; the harness relies on COMMON
RANDOM NUMBERS: the render function must be deterministic in its PRNG key,
so f(theta+h) - f(theta-h) differences the very same light paths and the
FD quotient estimates the same reparameterized derivative that
backpropagation computes. Discrete decisions (lobe selection, RR, light
pick, hit topology) flip only when a uniform crosses a moving threshold --
an O(h) probability per path, vanishing in the comparison tolerance.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def central_difference(
    f: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray, h: float = 1e-3
) -> np.ndarray:
    """Per-coordinate central differences of a scalar function."""
    import jax

    f = jax.jit(f)
    x = np.asarray(x, np.float32)
    flat = x.reshape(-1)
    grad = np.zeros_like(flat)
    for i in range(flat.size):
        xp = flat.copy()
        xm = flat.copy()
        xp[i] += h
        xm[i] -= h
        fp = float(f(jnp.asarray(xp.reshape(x.shape))))
        fm = float(f(jnp.asarray(xm.reshape(x.shape))))
        grad[i] = (fp - fm) / (2.0 * h)
    return grad.reshape(x.shape)


def check_grad_vs_fd(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    h: float = 1e-3,
    rtol: float = 0.05,
    atol: float = 1e-4,
):
    """Returns (autodiff_grad, fd_grad); raises AssertionError on mismatch.

    Tolerances are loose by design: fp32 render accumulation + O(h) discrete
    flips bound the achievable agreement.
    """
    import jax

    auto = np.asarray(jax.grad(f)(jnp.asarray(x, jnp.float32)))
    fd = central_difference(f, x, h)
    np.testing.assert_allclose(auto, fd, rtol=rtol, atol=atol)
    return auto, fd
