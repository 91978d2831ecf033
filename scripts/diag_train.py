"""Diagnose the sharded inverse-rendering train step (VERDICT weak #2).

Runs the exact failing-test configuration and prints the loss trajectory,
the albedo L2 error to the true material, and gradient norms, for a grid of
learning rates -- plus a single-device control with the same objective.
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

from isaklm_raytracer_tpu.camera import Camera
from isaklm_raytracer_tpu.config import RenderConfig
from isaklm_raytracer_tpu.dist.sharding import (
    make_render_mesh,
    sharded_value_and_grad_fn,
)
from isaklm_raytracer_tpu.integrator.render import render_sample
from isaklm_raytracer_tpu.scene.procedural import cornell_box

CONFIG = RenderConfig(width=24, height=24, max_bounces=4)


def main():
    scene = cornell_box(include_blockers=False)
    camera = Camera.create((0.0, 0.0, -0.9), fov=jnp.pi / 2)
    true_albedo = np.asarray(scene.materials.albedo)

    for seed in (7, 11):
        key = jax.random.PRNGKey(seed)
        target = render_sample(scene, camera, jax.random.fold_in(key, 0), CONFIG)
        mesh = make_render_mesh(num_tile=4, num_sample=2)
        vg = sharded_value_and_grad_fn(scene, CONFIG, mesh)

        for lr in (0.05, 0.02):
            p = scene.materials.replace(albedo=scene.materials.albedo * 0.4)
            losses, aerrs, gnorms = [], [], []
            for i in range(10):
                loss, grads = vg(p, camera, target, jax.random.fold_in(key, 10 + i))
                p = p.replace(
                    **{f: getattr(p, f) - lr * g for f, g in grads.items()}
                )
                losses.append(float(loss))
                aerrs.append(float(np.abs(np.asarray(p.albedo) - true_albedo).mean()))
                gnorms.append(
                    {f: float(jnp.abs(g).max()) for f, g in grads.items()}
                )
            print(f"seed={seed} lr={lr}")
            print("  losses:", " ".join(f"{l:.4f}" for l in losses))
            print("  albedo err:", " ".join(f"{e:.4f}" for e in aerrs))
            print("  max|g| first step:", {k: round(v, 3) for k, v in gnorms[0].items()})
            print("  max|g| last step:", {k: round(v, 3) for k, v in gnorms[-1].items()})


if __name__ == "__main__":
    main()
