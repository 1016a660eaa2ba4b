from surface_vision_transformers_tpu.models.sit import (
    Attention,
    Encoder,
    FeedForward,
    SiT,
)
from surface_vision_transformers_tpu.models.mpp import (
    MPP,
    corrupt_sequence,
    exact_count_mask,
)
from surface_vision_transformers_tpu.models.mssit import MSSiT

__all__ = [
    "Attention",
    "Encoder",
    "FeedForward",
    "MPP",
    "MSSiT",
    "SiT",
    "corrupt_sequence",
    "exact_count_mask",
]
