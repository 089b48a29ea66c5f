from bevy_raytrace_tpu.kernels.pallas_render import render_pallas
from bevy_raytrace_tpu.kernels.clusters import ClusterPlan, cluster_scene

__all__ = ["render_pallas", "cluster_scene", "ClusterPlan"]
