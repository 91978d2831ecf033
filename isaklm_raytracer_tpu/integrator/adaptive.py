"""Per-pixel adaptive sampling gate as a differentiable-friendly predicate.

Matches the reference's confidence-interval test (path_tracing.cuh:347-376):
always sample below MIN_SAMPLES; afterwards estimate the per-pixel luminance
mean and (Bessel-corrected) variance from the running sums and keep sampling
while the 95% CI half-width  sqrt(2) * erfinv(1 - tol) * sqrt(var / n)
exceeds  mean * tol.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erfinv

from isaklm_raytracer_tpu.config import RenderConfig
from isaklm_raytracer_tpu.math.color import luminance
from isaklm_raytracer_tpu.scene.types import GBuffer


def needs_sample(gbuffer: GBuffer, config: RenderConfig) -> jnp.ndarray:
    """Boolean (H*W,) mask: which pixels still need another sample."""
    n = gbuffer.count
    nf = n.astype(jnp.float32)

    total_lum = luminance(gbuffer.frame)
    total_sq = gbuffer.sq_luminance

    # Guard n <= 1 lanes; they are forced to sample by the MIN_SAMPLES branch.
    safe_n = jnp.maximum(nf, 2.0)
    mean = total_lum / safe_n
    variance = (total_sq - total_lum * total_lum / safe_n) / (safe_n - 1.0)
    variance = jnp.maximum(variance, 0.0)

    half_width = (
        jnp.sqrt(2.0)
        * erfinv(1.0 - config.max_tolerance)
        * jnp.sqrt(variance / safe_n)
    )
    unconverged = half_width > mean * config.max_tolerance

    return (n < config.min_samples) | ((n < config.max_samples) & unconverged)
