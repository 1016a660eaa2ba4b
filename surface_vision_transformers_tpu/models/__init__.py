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
from surface_vision_transformers_tpu.models.mpp_mssit import MPPMSSiT

__all__ = [
    "Attention",
    "Encoder",
    "FeedForward",
    "MPP",
    "MPPMSSiT",
    "MSSiT",
    "SiT",
    "corrupt_sequence",
    "exact_count_mask",
]
