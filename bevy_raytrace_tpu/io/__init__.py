from bevy_raytrace_tpu.io.image import (
    assemble_tiles,
    png_bytes,
    tonemap,
    write_exr,
    write_image,
    write_png,
    write_ppm,
)
from bevy_raytrace_tpu.io.writer import FrameWriter

__all__ = ["assemble_tiles", "png_bytes", "tonemap", "write_png", "write_ppm",
           "write_exr", "write_image", "FrameWriter"]
