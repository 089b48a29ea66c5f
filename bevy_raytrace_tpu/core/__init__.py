from bevy_raytrace_tpu.core.types import Hit, Materials, Ray, Scene
from bevy_raytrace_tpu.core.camera import Camera

__all__ = ["Hit", "Materials", "Ray", "Scene", "Camera"]
