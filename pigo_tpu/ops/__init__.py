from pigo_tpu.ops.windows import WindowPlan, build_window_plan
from pigo_tpu.ops.cluster import cluster_detections

__all__ = ["WindowPlan", "build_window_plan", "cluster_detections"]
