from bevy_raytrace_tpu.utils.metrics import FrameTimer, RenderMetrics, trace_profile

__all__ = ["FrameTimer", "RenderMetrics", "trace_profile"]
