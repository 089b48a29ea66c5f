from bevy_raytrace_tpu.wavefront.render import (
    make_renderer,
    render,
    render_pixel_range,
    trace_paths,
)
from bevy_raytrace_tpu.wavefront.engine import Renderer

__all__ = [
    "render",
    "render_pixel_range",
    "make_renderer",
    "trace_paths",
    "Renderer",
]
