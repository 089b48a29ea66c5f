from bevy_raytrace_tpu.wavefront.render import make_renderer, render, trace_paths

__all__ = ["render", "make_renderer", "trace_paths"]
