"""On-device icosahedral patchification ops.

The reference does patch extraction OFFLINE in a per-subject, per-patch Python
loop writing .npy files (reference: tools/preprocessing.py:74-84), so its
models only ever see pre-patched (B, C, L, V) arrays. Here patchification is
an on-device op over raw (B, C, G) vertex arrays (G = 10*4^ico + 2):

  patchify:             static-table gather -> (B, L, V*C) tokens,
  fused_patch_embed:    gather + per-channel z-score + patch-embedding GEMM in
                        one jit region, with the normalization *folded into
                        the embedding weights* so it costs zero FLOPs at
                        runtime.

Token layout matches the reference's ``Rearrange('b c n v -> b n (v c)')``
(reference: models/sit.py:49): feature index = v * C + c (channel-fastest).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def patchify(x: jax.Array, indices) -> jax.Array:
    """Gather raw vertex features into patch tokens.

    Args:
      x: (B, C, G) raw per-vertex features.
      indices: (L, V) int32 patch table (static).

    Returns:
      (B, L, V*C) patch tokens, feature order (v c).
    """
    indices = np.asarray(indices)
    L, V = indices.shape
    B, C, G = x.shape
    # ONE interleaved gather producing (v c) order directly: feature
    # (l, v*C + c) reads flattened position c*G + idx[l, v]. The naive
    # gather-then-transpose pays an extra minor-dim-4 transpose that XLA
    # executes poorly (24.6 ms vs 7.8 ms for B=1024 on v5e).
    flat2 = (np.arange(C)[None, :] * G + indices.reshape(-1, 1)).reshape(-1)
    xf = x.reshape(B, C * G)
    return jnp.take(xf, jnp.asarray(flat2), axis=1).reshape(B, L, V * C)


def patchify_chunked(x: jax.Array, indices, chunk: int = 256,
                     post=None) -> jax.Array:
    """``patchify`` as a lax.map over row tiles — for DATASET-scale inputs.

    XLA's compile time for the single fused gather grows superlinearly with
    the row count (measured on v5e at (4096, 4, 40962): 200.8 s to compile
    unchunked vs 12.4 s chunked, identical output); per-batch model inputs
    are fine unchunked, whole-dataset tokenization is not. Ragged row counts
    pad to a chunk multiple and slice back. ``post`` (e.g. normalization)
    is applied per chunk inside the map so it fuses with the gather."""
    n = x.shape[0]
    one = (lambda c: post(patchify(c, indices))) if post is not None else (
        lambda c: patchify(c, indices))
    if n <= chunk:
        return one(x)
    pad = (-n) % chunk
    xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)) if pad else x
    xt = xp.reshape((n + pad) // chunk, chunk, *x.shape[1:])
    out = jax.lax.map(one, xt)
    out = out.reshape((n + pad), *out.shape[2:])
    return out[:n] if pad else out


def rearrange_patched(x: jax.Array) -> jax.Array:
    """(B, C, L, V) pre-patched input -> (B, L, V*C) tokens ((v c) order)."""
    B, C, L, V = x.shape
    return x.transpose(0, 2, 3, 1).reshape(B, L, V * C)


def fold_normalization(
    kernel: jax.Array,
    bias: jax.Array,
    means: jax.Array | np.ndarray,
    stds: jax.Array | np.ndarray,
    num_vertices: int,
) -> tuple[jax.Array, jax.Array]:
    """Fold per-channel z-score normalization into embedding weights.

    With tokens t = (gather(x) - mean) / std and embedding t @ W + b, we have
    equivalently gather(x) @ W' + b' with W' = W / std_flat[:, None] and
    b' = b - (mean_flat / std_flat) @ W. means/stds come in the reference's
    (1, C, 1) stats layout (reference: tools/preprocessing.py:55-56) or flat
    (C,).

    Args:
      kernel: (V*C, dim) embedding weights (feature order (v c)).
      bias: (dim,).

    Returns:
      (kernel', bias') of the same shapes/dtypes.
    """
    means = jnp.asarray(means).reshape(-1)  # (C,)
    stds = jnp.asarray(stds).reshape(-1)
    C = means.shape[0]
    mean_flat = jnp.tile(means, num_vertices)  # (V*C,), index v*C+c
    std_flat = jnp.tile(stds, num_vertices)
    kernel = kernel.astype(jnp.float32)
    k2 = kernel / std_flat[:, None]
    b2 = bias.astype(jnp.float32) - (mean_flat / std_flat) @ kernel
    return k2, b2


def normalize_tokens(
    tokens: jax.Array, means, stds
) -> jax.Array:
    """Apply per-channel z-score to (.., V*C) tokens in (v c) order (stats in
    the reference's (1, C, 1) layout or flat (C,))."""
    means = jnp.asarray(means).reshape(-1)
    stds = jnp.asarray(stds).reshape(-1)
    reps = tokens.shape[-1] // means.shape[0]
    return (tokens - jnp.tile(means, reps)) / jnp.tile(stds, reps)


# XLA's row gather runs SUPERLINEAR in batch on v5e (0.80 / 2.05 / 4.76 ms
# at B=256/512/1024 for sub-ico-2 — the only non-linear stage in the whole
# forward); chunking the gather+GEMM to this batch granularity via lax.map
# restores linear scaling (B=1024: 51.5 -> 49.9 ms full-model, reaching
# B=256's per-surface throughput). 128 measured best among {64, 128, 256}.
_GATHER_CHUNK = 128
_EMBED_BARRIER_MIN_PATCHES = 4096  # see the barrier note in fused_patch_embed


def fused_patch_embed(
    x: jax.Array,
    indices,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    means=None,
    stds=None,
    backend: str = "auto",
    compute_dtype=jnp.bfloat16,
    gather_chunk: int | None = None,
) -> jax.Array:
    """Patchify + (optional) normalize + embed: (B, C, G) -> (B, L, dim).

    The normalization folds into (kernel, bias) at trace time; the gather and
    GEMM execute in one jit region (XLA fuses), or in a single Pallas kernel
    with ``backend='pallas'`` on TPU.

    ``gather_chunk``: split the gather+GEMM into lax.map tiles of this many
    samples (bitwise-identical output; see _GATHER_CHUNK). OPT-IN because the
    (B, ...) -> (B/chunk, chunk, ...) reshape is hostile to GSPMD batch
    sharding — callers on the single-device / per-shard path (models.fused,
    trainer without a mesh) pass _GATHER_CHUNK; sharded callers leave None.
    """
    if means is not None:
        kernel, bias = fold_normalization(
            kernel, bias, means, stds, int(np.asarray(indices).shape[1])
        )
    if backend == "auto":
        backend = "xla"  # pallas path opted into explicitly until it wins
    if backend == "pallas":
        from surface_vision_transformers_tpu.ops.pallas.patch_embed import (
            pallas_patch_embed,
        )

        return pallas_patch_embed(
            x, indices, jnp.asarray(kernel), jnp.asarray(bias),
            compute_dtype=compute_dtype,
        )
    # Gather along the VERTEX axis only, then contract the (c, v) feature
    # dims directly in one multi-dim dot_general against the kernel reordered
    # to (C, V, dim) — no (v c) interleave materializes at all. Measured
    # 0.66 ms vs 1.54 ms (B=256) / 5.2 ms vs 7.7 ms (B=1024) for the
    # interleaved single-gather + 2-D GEMM on v5e. Same result bit-for-bit:
    # sum_{v,c} token[(v c)] * W[(v c), d] == sum_{c,v} gathered[c,v] * Wr[c,v,d].
    indices = np.asarray(indices)
    L, V = indices.shape
    B, C, G = x.shape
    flat_v = jnp.asarray(np.ascontiguousarray(indices.reshape(-1)))
    w_cv = (
        kernel.reshape(V, C, -1).transpose(1, 0, 2).astype(compute_dtype)
    )  # (C, V, dim); kernel rows are (v c)-ordered: row v*C + c
    bias_c = bias.astype(compute_dtype)

    def embed_chunk(xc):
        gathered = jnp.take(xc, flat_v, axis=2).reshape(xc.shape[0], C, L, V)
        if L >= _EMBED_BARRIER_MIN_PATCHES:
            # at many-patch geometries XLA's gather-into-GEMM fusion codegen
            # explodes COMPILE time (MS-SiT ico-6 L=20480: 232-1295 s across
            # sessions vs 0.8 s with the fusion broken; runtime identical,
            # 1.18 vs 1.20 ms at B=32). Few-patch SiT grids keep the fusion:
            # it wins there (0.66 vs 1.54 ms at B=256 sub-ico-2) and
            # compiles in ~1.5 s.
            gathered = jax.lax.optimization_barrier(gathered)
        return jax.lax.dot_general(
            gathered.astype(compute_dtype), w_cv, (((1, 3), (0, 1)), ((), ()))
        ) + bias_c

    if gather_chunk and B > gather_chunk and B % gather_chunk == 0:
        out = jax.lax.map(
            embed_chunk, x.reshape(B // gather_chunk, gather_chunk, C, G)
        )
        return out.reshape(B, L, out.shape[-1])
    return embed_chunk(x)
