"""Estimator correctness: furnace test + gradient-vs-finite-differences.

The furnace test validates the ENTIRE integrator bookkeeping analytically:
in a closed box whose every surface emits E and reflects albedo a
(diffuse), the equilibrium radiance solves L = E + a L => L = E/(1-a).
This exercises emittance pickup (non-diffuse-only, path_tracing.cuh:285-288),
NEE weighting (path_tracing.cuh:235-265), the diffuse cosine-pdf
cancellation, and Russian-roulette reweighting in one number.

Gradient tests implement the BASELINE.json metric "grad allclose vs FD"
with common random numbers (diff/fd.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaklm_raytracer_tpu.camera import Camera
from isaklm_raytracer_tpu.config import RenderConfig
from isaklm_raytracer_tpu.diff.fd import check_grad_vs_fd
from isaklm_raytracer_tpu.integrator.render import render_sample
from isaklm_raytracer_tpu.scene.procedural import SceneBuilder, cornell_box


def furnace_box(emit=1.0, albedo=0.5):
    b = SceneBuilder()
    m = b.add_material(
        albedo=(albedo,) * 3, emittance=(emit,) * 3, roughness=0.5, ior=1.0001
    )
    lo, hi = -1.0, 1.0
    b.add_quad((lo, lo, lo), (hi, lo, lo), (hi, lo, hi), (lo, lo, hi), m)
    b.add_quad((lo, hi, hi), (hi, hi, hi), (hi, hi, lo), (lo, hi, lo), m)
    b.add_quad((lo, lo, hi), (hi, lo, hi), (hi, hi, hi), (lo, hi, hi), m)
    b.add_quad((lo, lo, lo), (lo, lo, hi), (lo, hi, hi), (lo, hi, lo), m)
    b.add_quad((hi, lo, hi), (hi, lo, lo), (hi, hi, lo), (hi, hi, hi), m)
    b.add_quad((hi, lo, lo), (lo, lo, lo), (lo, hi, lo), (hi, hi, lo), m)  # front
    return b.build()


def test_furnace_equilibrium():
    emit, albedo = 1.0, 0.5
    expected = emit / (1.0 - albedo)  # = 2
    scene = furnace_box(emit, albedo)
    config = RenderConfig(width=16, height=16, max_bounces=32)
    camera = Camera.create((0.0, 0.0, 0.0), fov=jnp.pi / 2)
    vals = []
    for s in range(24):
        r = render_sample(scene, camera, jax.random.PRNGKey(s), config)
        vals.append(np.asarray(r).mean())
    mean = np.mean(vals)
    sem = np.std(vals) / np.sqrt(len(vals))
    assert abs(mean - expected) < max(4 * sem, 0.05 * expected), (mean, sem)


def test_furnace_unbiased_vs_albedo():
    # different albedo, same identity: L = E/(1-a)
    emit, albedo = 0.7, 0.3
    scene = furnace_box(emit, albedo)
    config = RenderConfig(width=16, height=16, max_bounces=32)
    camera = Camera.create((0.0, 0.0, 0.0), fov=jnp.pi / 2)
    vals = [
        np.asarray(render_sample(scene, camera, jax.random.PRNGKey(100 + s), config)).mean()
        for s in range(16)
    ]
    expected = emit / (1 - albedo)
    assert abs(np.mean(vals) - expected) < 0.06 * expected


class TestGradVsFD:
    """BASELINE configs[0]: image + material-gradient check vs FD."""

    @pytest.fixture(scope="class")
    def setup(self):
        scene = cornell_box(include_blockers=False)
        config = RenderConfig(width=16, height=16, max_bounces=4)
        camera = Camera.create((0.0, 0.0, -0.9), fov=jnp.pi / 2)
        key = jax.random.PRNGKey(11)
        return scene, config, camera, key

    def test_albedo_grad(self, setup):
        scene, config, camera, key = setup
        # Disable Russian roulette inside the bounce cap: the RR survival
        # threshold is max(throughput) which moves with albedo, so FD across
        # it measures discrete path-length flips, not the derivative. With RR
        # off (and fixed uniforms) the estimator is smooth in albedo.
        no_rr = config.__class__(
            **{**config.__dict__, "rr_start_bounce": config.max_bounces}
        )

        def loss(albedo):
            s = scene.replace(materials=scene.materials.replace(albedo=albedo))
            return jnp.mean(render_sample(s, camera, key, no_rr))

        check_grad_vs_fd(loss, scene.materials.albedo, h=2e-3, rtol=0.05, atol=2e-4)

    def test_emittance_grad_is_exact(self, setup):
        # radiance is LINEAR in emittance -> FD agrees to fp precision
        scene, config, camera, key = setup

        def loss(emittance):
            s = scene.replace(materials=scene.materials.replace(emittance=emittance))
            return jnp.mean(render_sample(s, camera, key, config))

        check_grad_vs_fd(loss, scene.materials.emittance, h=5e-2, rtol=0.02, atol=1e-5)

    def test_roughness_grad(self, setup):
        scene, config, camera, key = setup

        def loss(roughness):
            s = scene.replace(materials=scene.materials.replace(roughness=roughness))
            return jnp.mean(render_sample(s, camera, key, config))

        auto = np.asarray(jax.grad(loss)(scene.materials.roughness))
        assert np.isfinite(auto).all()

    def test_camera_position_grad(self, setup):
        scene, config, camera, key = setup

        def loss(pos):
            return jnp.mean(render_sample(scene, camera.replace(position=pos), key, config))

        auto = np.asarray(jax.grad(loss)(camera.position))
        assert np.isfinite(auto).all()
        assert np.abs(auto).max() > 0
