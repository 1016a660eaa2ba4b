from surface_vision_transformers_tpu.data import gifti, npy, preprocess
from surface_vision_transformers_tpu.data.synthetic import (
    make_norm_stats,
    make_regression_dataset,
)

__all__ = [
    "gifti",
    "make_norm_stats",
    "make_regression_dataset",
    "npy",
    "preprocess",
]
