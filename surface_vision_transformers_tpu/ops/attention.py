"""Multi-head attention ops with pluggable backends.

The reference inherits attention from vit-pytorch's ``Transformer`` (fused
no-bias QKV, softmax(QK^T * d_head^-0.5) V, biased output projection;
structure pinned by the key map at reference utils/utils.py:17-33) and runs it
through cuDNN/cuBLAS. Here the op is a pure function over (B, H, N, Dh)
tensors with two backends:

  * ``xla``   — einsum + softmax, fused by XLA; scores/softmax in fp32 even
                under bf16 compute (MXU accumulates fp32 anyway; this keeps
                the numerics of the reference's fp32 softmax).
  * ``pallas`` — blockwise flash-attention TPU kernel
                 (ops/pallas/flash_attention.py), used on TPU when shapes
                 qualify.

``backend='auto'`` picks pallas on TPU when available, else xla.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid_len: int | None = None,
    *,
    precision=None,
) -> jax.Array:
    """Reference-semantics attention. q, k, v: (B, H, N, Dh) -> (B, H, N, Dh).

    ``valid_len`` masks key/value positions >= valid_len (used when the caller
    pre-padded the sequence to a tile-aligned length)."""
    dh = q.shape[-1]
    scale = dh ** -0.5
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, precision=precision,
        preferred_element_type=jnp.float32,
    )
    if valid_len is not None and valid_len < q.shape[2]:
        mask = jnp.arange(q.shape[2]) < valid_len
        logits = jnp.where(mask[None, None, None, :], logits, -1e30)
    weights = jax.nn.softmax(logits * scale, axis=-1)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", weights, v, precision=precision)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid_len: int | None = None,
    *,
    backend: str = "auto",
    precision=None,
) -> jax.Array:
    """Dispatching attention entry point. q, k, v: (B, H, N, Dh)."""
    if backend == "auto":
        # HIGHEST precision signals parity mode -> exact XLA path; otherwise
        # the fused Pallas kernel wins on TPU (no HBM logits roundtrip).
        if precision in (jax.lax.Precision.HIGHEST, "highest"):
            backend = "xla"
        else:
            backend = "pallas" if _on_tpu() else "xla"
    if backend == "pallas":
        try:
            from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
                MAX_SINGLE_BLOCK_SEQ,
                flash_attention,
                flash_attention_tiled,
            )

            if q.shape[2] > MAX_SINGLE_BLOCK_SEQ:
                return flash_attention_tiled(q, k, v, valid_len)
            return flash_attention(q, k, v, valid_len)
        except (ImportError, NotImplementedError):
            backend = "xla"
    if backend != "xla":
        raise ValueError(f"unknown attention backend {backend!r}")
    return xla_attention(q, k, v, valid_len, precision=precision)
