"""Pallas patch-embedding GEMM kernel (tokens @ W + b per batch tile).

The triangle-table GATHER stays in XLA by measurement: this Mosaic build has
no vectorized sublane-gather primitive (jnp.take/take_along_axis fail to
lower in-kernel), per-row dynamic-slice loops are ~50x slower than XLA's
gather, and the interleaved single-gather formulation in ops.patchify is
already bandwidth-bound (docs/design.md §3). What Pallas adds here is the
embedding GEMM fused with bias in one kernel per batch tile, which the
megakernel block path then consumes directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surface_vision_transformers_tpu.ops.patchify import patchify as _patchify


def _embed_kernel(t_ref, w_ref, b_ref, o_ref):
    o_ref[0] = (
        jax.lax.dot_general(
            t_ref[0], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)


def pallas_patch_embed(
    x: jax.Array, indices, kernel: jax.Array, bias: jax.Array,
    *, compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """(B, C, G) raw vertices -> (B, L, dim) embedded tokens; gather in XLA,
    GEMM+bias in a Pallas kernel. Normalization should already be folded into
    (kernel, bias) by the caller (ops.fold_normalization)."""
    tokens = _patchify(x, indices).astype(compute_dtype)
    B, L, F = tokens.shape
    dim = kernel.shape[1]
    w = kernel.astype(compute_dtype)
    b = bias.reshape(1, -1)
    blk_t = pl.BlockSpec((1, L, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    blk_o = pl.BlockSpec((1, L, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _embed_kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, dim), compute_dtype),
        grid=(B,),
        in_specs=[
            blk_t,
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=blk_o,
        interpret=jax.default_backend() != "tpu",
    )(tokens, w, b)
