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
        # Roughness moves BOTH the GGX half-vector (smooth, reparameterized)
        # and the dielectric Fresnel lobe-selection probability; the
        # detached-ratio estimator (bsdf.py) carries the latter, so CRN FD
        # agrees as long as no uniform crosses its threshold in +-h.
        scene, config, camera, key = setup
        no_rr = config.__class__(
            **{**config.__dict__, "rr_start_bounce": config.max_bounces,
               "lobe_ratio_grad": False}
        )

        def loss(roughness):
            s = scene.replace(materials=scene.materials.replace(roughness=roughness))
            return jnp.mean(render_sample(s, camera, key, no_rr))

        check_grad_vs_fd(
            loss, scene.materials.roughness, h=1e-3, rtol=0.08, atol=5e-4
        )

    def test_camera_grad_finite_nonzero_in_cornell(self, setup):
        # In a box scene camera FD is dominated by silhouette flips (pixels
        # whose hit triangle changes inside +-h) -- a real boundary term that
        # detached hit topology cannot carry; the FD agreement of the interior
        # term is checked silhouette-free in TestGradVsFDCamera.
        scene, config, camera, key = setup

        def loss(pos, yp):
            cam = camera.replace(position=pos, yaw=yp[0], pitch=yp[1])
            return jnp.mean(render_sample(scene, cam, key, config))

        g_pos, g_yp = jax.grad(loss, argnums=(0, 1))(
            camera.position, jnp.zeros((2,), jnp.float32)
        )
        for g in (g_pos, g_yp):
            assert np.isfinite(np.asarray(g)).all()
            assert np.abs(np.asarray(g)).max() > 0


class TestGradVsFDCamera:
    """Camera pose FD on a silhouette-free view: every camera ray lands on
    one large diffuse floor (ior=1 -> Fresnel 0, no stochastic lobe) and the
    radiance is a single smooth NEE estimate, so the estimator is C^1 in
    position/yaw/pitch and CRN FD must match autodiff tightly."""

    @pytest.fixture(scope="class")
    def setup(self):
        b = SceneBuilder()
        light = b.add_material(
            albedo=(0.0, 0.0, 0.0), emittance=(6.0, 6.0, 6.0), ior=1.0
        )
        floor = b.add_material(albedo=(0.6, 0.5, 0.4), roughness=0.7, ior=1.0)
        s = 60.0
        b.add_quad((-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s), floor)
        # Light panel above and behind the camera, outside every camera
        # ray's (downward) frustum; shadow rays to it are always unoccluded.
        b.add_quad((-2, 6, -9), (2, 6, -9), (2, 6, -5), (-2, 6, -5), light)
        scene = b.build()
        config = RenderConfig(
            width=12, height=12, max_bounces=1, rr_start_bounce=1,
            lobe_ratio_grad=False,
        )
        camera = Camera.create((0.0, 3.0, 0.0), yaw=0.0, pitch=0.9, fov=0.9)
        key = jax.random.PRNGKey(23)

        # Preconditions for smoothness: the view is all floor, lit.
        r = np.asarray(render_sample(scene, camera, key, config))
        assert (r.sum(-1) > 0).all(), "every camera ray must land on lit floor"
        return scene, config, camera, key

    def test_camera_position_grad_vs_fd(self, setup):
        scene, config, camera, key = setup

        def loss(pos):
            return jnp.mean(
                render_sample(scene, camera.replace(position=pos), key, config)
            )

        auto, fd = check_grad_vs_fd(
            loss, camera.position, h=1e-3, rtol=0.05, atol=5e-4
        )
        assert np.abs(auto).max() > 0

    def test_camera_yaw_pitch_grad_vs_fd(self, setup):
        scene, config, camera, key = setup

        def loss(yp):
            cam = camera.replace(yaw=yp[0], pitch=yp[1])
            return jnp.mean(render_sample(scene, cam, key, config))

        auto, fd = check_grad_vs_fd(
            loss,
            jnp.asarray([camera.yaw, camera.pitch], jnp.float32),
            h=1e-3,
            rtol=0.05,
            atol=5e-4,
        )
        assert np.abs(auto).max() > 0


class TestLobeRatioEstimator:
    """Unit check of the detached-ratio lobe estimator (bsdf.scatter):
    against the EXPECTED radiance (integrated over the lobe uniform) its
    autodiff gradient must equal the true derivative, including the
    d(selection probability)/d(ior) term that pure reparameterization drops.

    Expectation is taken by stratifying u_lobe over [0,1): E[g] =
    mean_k weight_k . g(direction_k); with K midpoints the quantization
    error of the moving F threshold is O(1/K)."""

    K = 32768

    def _expected_value(self, ior_scalar, ratio: bool):
        from isaklm_raytracer_tpu.accel.traverse import HitAttributes
        from isaklm_raytracer_tpu.integrator.bsdf import scatter

        k = self.K
        ones = jnp.ones((k,), jnp.float32)
        n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (k, 1))
        t = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (k, 1))
        bt = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (k, 1))
        hit = HitAttributes(
            albedo=jnp.full((k, 3), 0.7, jnp.float32),
            emittance=jnp.zeros((k, 3), jnp.float32),
            roughness=0.3 * ones,
            ior=ior_scalar * ones,
            extinction=0.0 * ones,
            transparent=0.0 * ones,
            triangle_index=jnp.zeros((k,), jnp.int32),
            position=jnp.zeros((k, 3), jnp.float32),
            normal=n, tangent=t, bitangent=bt,
            t=ones,
        )
        wi = jnp.tile(
            jnp.asarray([[0.5, -0.8, 0.1]], jnp.float32), (k, 1)
        )
        ray_d = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        u_lobe = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k  # stratified
        ev = scatter(
            hit, ray_d, jnp.zeros((k,), bool),
            0.37 * ones, 0.61 * ones, u_lobe, 0.23 * ones, 0.84 * ones,
            lobe_ratio_grad=ratio,
        )
        # A fixed linear functional of the outgoing event, sensitive to both
        # the chosen lobe's weight and its direction.
        probe = jnp.asarray([0.2, 1.0, 0.4], jnp.float32)
        g = 1.0 + jnp.maximum(ev.direction @ probe, 0.0)
        return jnp.mean(jnp.sum(ev.weight, axis=-1) * g)

    def test_ratio_grad_matches_expected_derivative(self):
        ior0 = 1.5
        auto = float(
            jax.grad(lambda i: self._expected_value(i, ratio=True))(
                jnp.float32(ior0)
            )
        )
        h = 1e-2
        fd = (
            float(self._expected_value(jnp.float32(ior0 + h), ratio=True))
            - float(self._expected_value(jnp.float32(ior0 - h), ratio=True))
        ) / (2 * h)
        # The reparameterized-only gradient must NOT agree (the selection
        # term is material here) ...
        reparam = float(
            jax.grad(lambda i: self._expected_value(i, ratio=False))(
                jnp.float32(ior0)
            )
        )
        assert abs(reparam - fd) > 5 * abs(auto - fd), (reparam, auto, fd)
        # ... while the ratio estimator's gradient must.
        np.testing.assert_allclose(auto, fd, rtol=0.05, atol=1e-3)

    def test_ratio_is_forward_identity(self):
        # lobe_ratio_grad changes gradients ONLY: forward radiance values
        # are bit-identical.
        a = self._expected_value(jnp.float32(1.5), ratio=True)
        b = self._expected_value(jnp.float32(1.5), ratio=False)
        assert float(a) == float(b)


class TestGradVsFDMixedMaterials:
    """FD checks for the parameter classes only metal/glass exercise:
    conductor extinction k, conductor IOR, and dielectric IOR (through both
    the refraction direction and the detached-ratio Fresnel selection)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from isaklm_raytracer_tpu.scene.procedural import material_demo_scene

        scene = material_demo_scene()
        config = RenderConfig(
            width=12, height=12, max_bounces=4, rr_start_bounce=4,
            lobe_ratio_grad=False,
        )
        camera = Camera.create((0.0, 1.2, -1.8), pitch=0.15, fov=jnp.pi / 2)
        key = jax.random.PRNGKey(17)
        return scene, config, camera, key

    def test_extinction_grad(self, setup):
        # Perturb ONLY the conductor's k: FD across extinction=0 would flip
        # the metal/dielectric branch (is_metal = extinction > 0, bsdf.py),
        # measuring the branch jump rather than the derivative.
        scene, config, camera, key = setup
        gold = int(np.argmax(np.asarray(scene.materials.extinction)))
        base = scene.materials.extinction[gold]

        def loss(k_gold):
            ext = jnp.asarray(scene.materials.extinction).at[gold].set(k_gold.reshape(()))
            s = scene.replace(materials=scene.materials.replace(extinction=ext))
            return jnp.mean(render_sample(s, camera, key, config))

        auto, fd = check_grad_vs_fd(
            loss, jnp.asarray([base]), h=2e-3, rtol=0.08, atol=5e-4
        )
        assert np.abs(auto).max() > 0  # the gold sphere is visible

    def test_ior_grad(self, setup):
        scene, config, camera, key = setup

        def loss(ior):
            s = scene.replace(materials=scene.materials.replace(ior=ior))
            return jnp.mean(render_sample(s, camera, key, config))

        auto, fd = check_grad_vs_fd(
            loss, scene.materials.ior, h=1e-3, rtol=0.08, atol=1e-3
        )
        assert np.abs(auto).max() > 0
