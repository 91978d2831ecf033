from isaklm_raytracer_tpu.integrator.bsdf import scatter
from isaklm_raytracer_tpu.integrator.nee import sample_direct_light
from isaklm_raytracer_tpu.integrator.path_trace import trace_paths

__all__ = ["scatter", "sample_direct_light", "trace_paths"]
