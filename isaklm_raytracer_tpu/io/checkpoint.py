"""Checkpoint / resume for progressive rendering state.

The reference has NO mid-render persistence (SURVEY.md section 5): its
progressive state (frame_buffer, squared_luminance, sample_count) lives
only in device memory and dies with the process (screen.cuh:15-21). Here
the G-buffer pytree IS the checkpointable state -- accumulation is a plain
sum, so save/restore at sample k is exact -- plus the camera pose and the
RNG bookkeeping (seed + next sample index) needed to continue the exact
same sample sequence.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from isaklm_raytracer_tpu.camera.camera import Camera
from isaklm_raytracer_tpu.scene.types import GBuffer

FORMAT_VERSION = 1


def save_checkpoint(
    path: str,
    gbuffer: GBuffer,
    camera: Camera,
    seed: int,
    next_sample: int,
) -> None:
    """Write render state to an .npz (atomic rename)."""
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    tmp = path + ".tmp.npz"
    meta = {
        "version": FORMAT_VERSION,
        "seed": int(seed),
        "next_sample": int(next_sample),
    }
    np.savez_compressed(
        tmp,
        frame=np.asarray(gbuffer.frame),
        sq_luminance=np.asarray(gbuffer.sq_luminance),
        count=np.asarray(gbuffer.count),
        camera_position=np.asarray(camera.position),
        camera_scalars=np.asarray(
            [camera.yaw, camera.pitch, camera.fov, camera.aperture_radius],
            np.float32,
        ),
        meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
    )
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (gbuffer, camera, seed, next_sample)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        if meta["version"] != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        gbuffer = GBuffer(
            frame=jnp.asarray(data["frame"]),
            sq_luminance=jnp.asarray(data["sq_luminance"]),
            count=jnp.asarray(data["count"]),
        )
        yaw, pitch, fov, aperture = (float(v) for v in data["camera_scalars"])
        camera = Camera.create(
            data["camera_position"], yaw, pitch, fov, aperture
        )
    return gbuffer, camera, meta["seed"], meta["next_sample"]
