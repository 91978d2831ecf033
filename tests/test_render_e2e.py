"""End-to-end: Cornell box render + gradient spine (BASELINE.json configs[0]).

Physical sanity checks replace the reference's eyeball validation: the light
is the brightest patch, the left/right walls are tinted red/green by direct
view, energy is finite and positive, and pixel gradients w.r.t. material
albedo / emission / camera pose are non-zero and finite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaklm_raytracer_tpu.camera import Camera
from isaklm_raytracer_tpu.config import RenderConfig
from isaklm_raytracer_tpu.integrator.render import (
    render,
    render_sample,
    resolve_image,
)
from isaklm_raytracer_tpu.scene.procedural import cornell_box

CONFIG = RenderConfig(width=48, height=48, max_bounces=6, min_samples=2, max_samples=16)


@pytest.fixture(scope="module")
def scene():
    return cornell_box(include_blockers=False)


@pytest.fixture(scope="module")
def camera():
    # Inside the box, looking at the back wall; the ceiling light is visible
    # in the top image rows.
    return Camera.create(position=(0.0, 0.0, -0.9), yaw=0.0, pitch=0.0, fov=jnp.pi / 2)


@pytest.fixture(scope="module")
def image(scene, camera):
    gb = render(scene, camera, CONFIG, num_samples=16, seed=0)
    return np.asarray(resolve_image(gb, CONFIG))


def test_image_is_finite_and_positive(image):
    assert np.all(np.isfinite(image))
    assert image.mean() > 0.01


def test_light_is_brightest_region(image):
    # Light quad spans |x|,|z| <= 0.4 at the ceiling; image rows are
    # y-up (row-major pixel index y*W + x, path_tracing.cuh:350), so the
    # light lands in the TOP rows near the horizontal center.
    lum = image.mean(axis=-1)
    row, col = np.unravel_index(np.argmax(lum), lum.shape)
    assert row >= lum.shape[0] * 2 // 3
    assert lum.shape[1] // 4 <= col <= lum.shape[1] * 3 // 4


def test_wall_tint(image):
    # left wall (low x -> low pixel x) should be red-dominant, right green.
    left = image[8:40, :6]
    right = image[8:40, -6:]
    assert left[..., 0].mean() > left[..., 1].mean() * 1.5
    assert right[..., 1].mean() > right[..., 0].mean() * 1.5


def test_deterministic_same_seed(scene, camera):
    r1 = render_sample(scene, camera, jax.random.PRNGKey(7), CONFIG)
    r2 = render_sample(scene, camera, jax.random.PRNGKey(7), CONFIG)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_adaptive_counts_progress(scene, camera):
    gb = render(scene, camera, CONFIG, num_samples=4, seed=1, adaptive=True)
    counts = np.asarray(gb.count)
    assert counts.min() >= 2  # min_samples floor honored
    assert counts.max() <= 4


def test_compact_adaptive_step_matches_full_masked_step(scene, camera):
    """Compute-skipping adaptive sampling (gather unconverged ids, render the
    compacted wavefront, scatter-add) must be BIT-IDENTICAL to the full
    masked render: every variate is a counter-mode function of the GLOBAL
    pixel id (math/rng.py), so compaction cannot change any sample."""
    from isaklm_raytracer_tpu.integrator.render import (
        compact_bucket,
        make_compact_step_fn,
        render_step,
    )

    cfg = RenderConfig(
        width=32, height=32, max_bounces=4, min_samples=1, max_samples=64,
        ray_chunk=128,
    )
    # A partially-converged G-buffer: ~85% of pixels artificially saturated.
    gb = render(scene, camera, cfg, num_samples=2, seed=5)
    rng = np.random.default_rng(0)
    converged = rng.random(cfg.num_pixels) < 0.85
    count = np.asarray(gb.count).copy()
    count[converged] = cfg.max_samples
    gb = gb.replace(count=jnp.asarray(count))

    n_active = int((~converged).sum())
    bucket = compact_bucket(n_active, cfg.num_pixels, cfg.ray_chunk)
    assert bucket < cfg.num_pixels  # the launch actually shrank
    assert bucket >= n_active

    key = jax.random.PRNGKey(9)
    full = render_step(scene, camera, gb, key, cfg, adaptive=True)
    compact = make_compact_step_fn(cfg, bucket)(
        scene, camera,
        jax.tree_util.tree_map(jnp.copy, gb),  # step donates its gbuffer
        key,
    )
    np.testing.assert_array_equal(np.asarray(full.count), np.asarray(compact.count))
    np.testing.assert_allclose(
        np.asarray(full.frame), np.asarray(compact.frame), rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(full.sq_luminance), np.asarray(compact.sq_luminance)
    )


def test_render_adaptive_stops_when_all_converged(scene, camera):
    cfg = RenderConfig(
        width=16, height=16, max_bounces=3, min_samples=1, max_samples=3,
        ray_chunk=64,
    )
    gb = render(scene, camera, cfg, num_samples=50, seed=2, adaptive=True)
    counts = np.asarray(gb.count)
    assert counts.max() <= cfg.max_samples
    assert counts.min() >= cfg.min_samples


def test_gradient_wrt_albedo_emission_camera(scene, camera):
    small = RenderConfig(width=12, height=12, max_bounces=3, min_samples=1, max_samples=4)

    def loss_fn(albedo, emittance, cam_pos):
        s = scene.replace(
            materials=scene.materials.replace(albedo=albedo, emittance=emittance)
        )
        cam = camera.replace(position=cam_pos)
        radiance = render_sample(s, cam, jax.random.PRNGKey(3), small)
        return jnp.mean(radiance)

    g_alb, g_emit, g_cam = jax.grad(loss_fn, argnums=(0, 1, 2))(
        scene.materials.albedo, scene.materials.emittance, camera.position
    )
    for g in (g_alb, g_emit, g_cam):
        assert np.all(np.isfinite(np.asarray(g))), g
    assert np.abs(np.asarray(g_alb)).max() > 0
    assert np.abs(np.asarray(g_emit)).max() > 0
    assert np.abs(np.asarray(g_cam)).max() > 0


def test_tail_mode_render_matches_masked_steps(scene, camera):
    """render(adaptive=True) -- which enters O(bucket) TAIL MODE once the
    active set shrinks (make_tail_step_fn) -- must be bit-identical to the
    naive loop of full masked adaptive steps, including for an ODD pixel
    count (compact_bucket ceil-halving, VERDICT r3 weak #6)."""
    from isaklm_raytracer_tpu.integrator.render import make_step_fn

    config = RenderConfig(
        width=21, height=19, max_bounces=3, min_samples=2, max_samples=64,
        max_tolerance=0.5, min_wavefront=16,
    )
    n_steps = 12
    gb_fast = render(
        scene, camera, config, num_samples=n_steps, seed=9, adaptive=True
    )
    from isaklm_raytracer_tpu.scene.types import GBuffer

    gb_ref = GBuffer.create(config.num_pixels)
    step = make_step_fn(config)
    base = jax.random.PRNGKey(9)
    for i in range(n_steps):
        gb_ref = step(scene, camera, gb_ref, jax.random.fold_in(base, i), True)
    np.testing.assert_array_equal(
        np.asarray(gb_fast.count), np.asarray(gb_ref.count)
    )
    np.testing.assert_array_equal(
        np.asarray(gb_fast.frame), np.asarray(gb_ref.frame)
    )
    # tail mode actually engaged (some pixels converged before the end)
    assert (np.asarray(gb_fast.count) < n_steps).any()
