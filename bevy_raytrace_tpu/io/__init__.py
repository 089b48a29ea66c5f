from bevy_raytrace_tpu.io.image import (
    tonemap,
    write_exr,
    write_image,
    write_png,
    write_ppm,
)

__all__ = ["tonemap", "write_png", "write_ppm", "write_exr", "write_image"]
