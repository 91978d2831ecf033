"""Sweep inverse-rendering recipes across seeds to find a stable operating
point (VERDICT round 2, item #1).

Compares SGD vs Adam, lr grid, on the exact failing-test configuration
(cornell box 24x24, 1-spp target, 12 steps, 4x2 mesh).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from isaklm_raytracer_tpu.camera import Camera
from isaklm_raytracer_tpu.config import RenderConfig
from isaklm_raytracer_tpu.dist.sharding import (
    make_render_mesh,
    sharded_value_and_grad_fn,
)
from isaklm_raytracer_tpu.integrator.render import render_sample
from isaklm_raytracer_tpu.scene.procedural import cornell_box

CONFIG = RenderConfig(width=24, height=24, max_bounces=4)
SEEDS = (3, 5, 7, 11, 13, 23)
STEPS = 12


def run_recipe(vg, scene, camera, seed, opt, true_albedo):
    key = jax.random.PRNGKey(seed)
    target = render_sample(scene, camera, jax.random.fold_in(key, 0), CONFIG)
    p = scene.materials.replace(albedo=scene.materials.albedo * 0.4)
    err0 = float(np.abs(np.asarray(p.albedo) - true_albedo).mean())
    floats = {f: getattr(p, f) for f in (
        "albedo", "emittance", "roughness", "ior", "extinction", "transparent")}
    state = opt.init(floats)
    for i in range(STEPS):
        loss, grads = vg(p, camera, target, jax.random.fold_in(key, 10 + i))
        updates, state = opt.update(grads, state, floats)
        floats = optax.apply_updates(floats, updates)
        p = p.replace(**floats)
    err = float(np.abs(np.asarray(p.albedo) - true_albedo).mean())
    return err0, err


def main():
    scene = cornell_box(include_blockers=False)
    camera = Camera.create((0.0, 0.0, -0.9), fov=jnp.pi / 2)
    true_albedo = np.asarray(scene.materials.albedo)
    mesh = make_render_mesh(num_tile=4, num_sample=2)
    vg_plain = sharded_value_and_grad_fn(scene, CONFIG, mesh)
    vg_dec = sharded_value_and_grad_fn(scene, CONFIG, mesh, decorrelate=True)

    recipes = {
        "dec_sgd_0.3": (vg_dec, optax.sgd(0.3)),
        "dec_sgd_0.2": (vg_dec, optax.sgd(0.2)),
        "dec_sgd_0.1": (vg_dec, optax.sgd(0.1)),
        "dec_mom_0.1": (vg_dec, optax.sgd(0.1, momentum=0.9)),
        "sgd_0.1": (vg_plain, optax.sgd(0.1)),
        "sgd_mom_0.1": (vg_plain, optax.sgd(0.1, momentum=0.9)),
    }
    for name, (vg, opt) in recipes.items():
        rows = []
        for seed in SEEDS:
            err0, err = run_recipe(vg, scene, camera, seed, opt, true_albedo)
            rows.append((seed, err0, err, err / err0))
        ratios = [r[3] for r in rows]
        ok = sum(1 for r in ratios if r < 0.95)
        print(f"{name:12s} pass {ok}/{len(SEEDS)} ratios:",
              " ".join(f"{s}:{r:.3f}" for s, _, _, r in rows), flush=True)


if __name__ == "__main__":
    main()
