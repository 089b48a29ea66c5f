from bevy_raytrace_tpu.inverse.loss import image_l2_loss, render_loss
from bevy_raytrace_tpu.inverse.fast_grad import (
    make_fast_renderer,
    replay_image,
)
from bevy_raytrace_tpu.inverse.optimize import (
    InverseProblem,
    optimize,
)
from bevy_raytrace_tpu.inverse.shard_grad import make_fast_renderer_sharded

__all__ = [
    "image_l2_loss",
    "render_loss",
    "InverseProblem",
    "optimize",
    "make_fast_renderer",
    "make_fast_renderer_sharded",
    "replay_image",
]
