from surface_vision_transformers_tpu.obs.logging import (
    MetricLogger,
    profile_trace,
    run_folder_name,
)

__all__ = ["MetricLogger", "profile_trace", "run_folder_name"]
