from surface_vision_transformers_tpu.data import npy
from surface_vision_transformers_tpu.data.synthetic import (
    make_norm_stats,
    make_regression_dataset,
)

__all__ = ["make_norm_stats", "make_regression_dataset", "npy"]
