from bevy_raytrace_tpu.kernels.pallas_render import render_pallas

__all__ = ["render_pallas"]
