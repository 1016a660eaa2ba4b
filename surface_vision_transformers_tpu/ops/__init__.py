from surface_vision_transformers_tpu.ops.attention import (
    multi_head_attention,
    xla_attention,
)
from surface_vision_transformers_tpu.ops.exact_move import exact_linear_move
from surface_vision_transformers_tpu.ops.patchify import (
    fold_normalization,
    normalize_tokens,
    fused_patch_embed,
    patchify,
    patchify_chunked,
    rearrange_patched,
)

__all__ = [
    "exact_linear_move",
    "fold_normalization",
    "normalize_tokens",
    "fused_patch_embed",
    "multi_head_attention",
    "patchify",
    "patchify_chunked",
    "rearrange_patched",
    "xla_attention",
]
