"""Masked-patch pretraining (MPP), stateless-PRNG on-device corruption.

Capability match with the reference MPP head (reference: models/mpp.py:46-134):
BERT-style corruption of the patch-token sequence — exactly ceil(mask_prob*L)
tokens selected per sample via rand+topk (reference: models/mpp.py:25-39), of
which a subset is swapped with random other patches (swap rate
swap_prob/(1-replace_prob), reference: models/mpp.py:90-107) and a
replace_prob fraction is replaced with a learned mask token (reference:
models/mpp.py:109-112) — then the shared SiT embedding+encoder runs on the
corrupted sequence and a linear head reconstructs the original patches, with
MSE on masked positions only (reference: models/mpp.py:132).

Differences by design:
  * corruption is a pure function of a JAX PRNG key (traceable, shardable,
    reproducible) instead of stateful torch RNG; distributions match.
  * the reconstruction head and mask token ARE optimized by default — the
    reference's optimizer silently skips them (reference:
    tools/pretrain.py:269-280 optimizes model.parameters() only); set
    ``MPPConfig.optimize_decoder=False`` to reproduce that quirk.
  * because the masked count is exact per sample, the masked-MSE denominator
    is static — no dynamic shapes under jit.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.models.sit import (
    SiT,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from surface_vision_transformers_tpu.ops import (
    exact_linear_move,
    normalize_tokens,
    patchify,
    rearrange_patched,
)


def exact_count_mask(key: jax.Array, batch: int, seq_len: int, prob: float):
    """Boolean (batch, seq_len) mask with exactly ceil(prob*seq_len) True per
    row, positions chosen uniformly (rand + top-k, matching reference
    models/mpp.py:25-39 in distribution).

    When more than half the row is masked (the recipe's 0.75), the top-k
    selects the COMPLEMENT — the ceil((1-prob)*L) kept positions — since a
    uniform size-k subset's complement is a uniform size-(L-k) subset and
    lax.top_k cost grows with k (240 -> 80 for the recipe)."""
    n_masked = math.ceil(prob * seq_len)
    rand = jax.random.uniform(key, (batch, seq_len))
    rows = jnp.arange(batch)[:, None]
    if n_masked > seq_len // 2:
        _, idx = jax.lax.top_k(-rand, seq_len - n_masked)
        mask = jnp.ones((batch, seq_len), bool)
        return mask.at[rows, idx].set(False), n_masked
    _, idx = jax.lax.top_k(rand, n_masked)
    mask = jnp.zeros((batch, seq_len), bool)
    return mask.at[rows, idx].set(True), n_masked


def corrupt_sequence(
    key: jax.Array,
    tokens: jax.Array,
    mask_token: jax.Array,
    *,
    mask_prob: float,
    replace_prob: float,
    swap_prob: float,
):
    """Corrupt a (B, L, D) patch-token sequence.

    Returns (corrupted (B, L, D), mask (B, L) bool, n_masked int).
    """
    B, L, _ = tokens.shape
    k_mask, k_swapsel, k_swapidx, k_repl = jax.random.split(key, 4)

    mask, n_masked = exact_count_mask(k_mask, B, L, mask_prob)
    corrupted = tokens

    if swap_prob > 0:
        # clamp: replace_prob == 1.0 is config-reachable and would divide by
        # zero; every masked token gets the mask token afterwards anyway
        swap_rate = swap_prob / max(1.0 - replace_prob, 1e-9)
        swap_sel = jax.random.uniform(k_swapsel, (B, L)) < swap_rate
        swap_sel = jnp.logical_and(mask, swap_sel)
        rand_idx = jax.random.randint(k_swapidx, (B, L), 0, L)
        # self-indices on unswapped rows, so ONE pass moves everything
        # (~92% of rows keep themselves at the recipe's rates)
        idx = jnp.where(swap_sel, rand_idx, jnp.arange(L)[None, :])
        if L <= 512:
            # apply the row permutation as a one-hot batched GEMM: the MXU
            # runs it ~5x faster than XLA's per-sample gather (184 -> 179
            # ms/step at bs=1024 on v5e), and the result is BITWISE the
            # gather's (pinned by test): bf16 tokens take one exact pass;
            # fp32 tokens go through ops.exact_move's three-plane split —
            # a single DEFAULT-precision pass would silently quantize every
            # row (including unmasked ones, breaking the never-corrupted
            # contract) to bf16 on TPU. Long sequences keep the gather —
            # the (B, L, L) one-hot outgrows its win.
            onehot = jax.nn.one_hot(idx, L, dtype=jnp.bfloat16)
            corrupted = exact_linear_move(
                corrupted,
                lambda planes: jax.lax.dot_general(
                    onehot, planes, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ),
            )
        else:
            corrupted = jnp.take_along_axis(
                corrupted, idx[:, :, None], axis=1
            )

    repl_sel = jax.random.uniform(k_repl, (B, L)) < replace_prob
    repl_sel = jnp.logical_and(mask, repl_sel)
    corrupted = jnp.where(
        repl_sel[:, :, None], mask_token.astype(corrupted.dtype), corrupted
    )
    return corrupted, mask, n_masked


class MPP(nn.Module):
    """MPP wrapper around a (shared) SiT encoder.

    ``__call__(batch, rng)`` takes pre-patched (B, C, L, V), raw (B, C, G)
    (with the encoder's patch_table set), or pre-flattened (B, L, V*C) input
    and returns (loss, reconstruction).
    """

    encoder: SiT
    mask_prob: float = 0.75
    replace_prob: float = 0.8
    swap_prob: float = 0.02

    @nn.compact
    def __call__(
        self,
        batch: jax.Array,
        rng: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        fixed_mask: Optional[jax.Array] = None,
        fixed_corrupted: Optional[jax.Array] = None,
        sample_weights: Optional[jax.Array] = None,
    ):
        enc = self.encoder
        patch_dim = enc.patch_dim
        mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (1, 1, patch_dim),
            enc.param_dtype,
        )

        if batch.ndim == 4:
            target = rearrange_patched(batch)
        elif batch.ndim == 3 and batch.shape[-1] == patch_dim:
            target = batch
        elif batch.ndim == 3:
            # plain (unchunked) gather: this runs at BATCH scale and may sit
            # under a GSPMD mesh, where lax.map row tiling would fight the
            # batch sharding (see ops.patchify_chunked — dataset-scale
            # tokenization is the compile-time hazard, handled in
            # trainer._mpp_tokens)
            target = patchify(batch, enc.patch_table)
            if enc.norm_means is not None:
                # raw-vertex input: match the supervised path's folded
                # normalization so SSL and finetune see the same scaling
                target = normalize_tokens(target, enc.norm_means, enc.norm_stds)
        else:
            raise ValueError(f"bad MPP input shape {batch.shape}")

        if fixed_mask is not None:
            # parity/testing hook: caller supplies the corruption outcome
            mask = fixed_mask
            corrupted = fixed_corrupted
            n_masked = None
        else:
            if rng is None:
                rng = self.make_rng("mpp")
            corrupted, mask, n_masked = corrupt_sequence(
                rng,
                target,
                mask_token,
                mask_prob=self.mask_prob,
                replace_prob=self.replace_prob,
                swap_prob=self.swap_prob,
            )

        tokens = (
            jnp.dot(
                corrupted.astype(enc.dtype),
                enc.pe_kernel.astype(enc.dtype),
                precision=enc.precision,
            )
            + enc.pe_bias.astype(enc.dtype)
        )
        x = enc.embed_tokens(tokens, deterministic=deterministic)
        x = enc.encoder(
            x,
            deterministic=deterministic,
            valid_len=enc.valid_len if enc.padded_len > enc.valid_len else None,
        )
        x = x[:, : enc.valid_len]

        recon = nn.Dense(
            patch_dim,
            dtype=jnp.float32,
            param_dtype=enc.param_dtype,
            kernel_init=torch_linear_kernel_init
            if enc.torch_init
            else nn.initializers.lecun_normal(),
            bias_init=torch_linear_bias_init(enc.dim)
            if enc.torch_init
            else nn.initializers.zeros_init(),
            name="to_original",
        )(x[:, 1:, :].astype(jnp.float32))

        err = jnp.square(recon - target.astype(jnp.float32))
        masked_err = jnp.where(mask[:, :, None], err, 0.0)
        if sample_weights is not None:
            # padded-batch support: weight-0 samples contribute nothing
            masked_err = masked_err * sample_weights[:, None, None]
            batch_count = jnp.maximum(sample_weights.sum(), 1e-9)
        else:
            batch_count = target.shape[0]
        if n_masked is not None:
            denom = batch_count * n_masked * patch_dim
        else:
            denom = jnp.maximum(mask.sum() * patch_dim, 1)
        loss = masked_err.sum() / denom
        return loss, recon
