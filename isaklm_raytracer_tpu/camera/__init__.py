from isaklm_raytracer_tpu.camera.camera import Camera, camera_movement, generate_rays

__all__ = ["Camera", "camera_movement", "generate_rays"]
