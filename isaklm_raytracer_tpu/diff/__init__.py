from isaklm_raytracer_tpu.diff.fd import central_difference, check_grad_vs_fd

__all__ = ["central_difference", "check_grad_vs_fd"]
