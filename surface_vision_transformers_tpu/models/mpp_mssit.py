"""Masked-window pretraining for the MS-SiT family (SimMIM-style).

The reference makes MPP a first-class workflow for its single-scale SiT
(reference: tools/pretrain.py:303-323, models/mpp.py:46-134); its recipe
reconstructs FINEST-grid patches through the shared embedding, which has no
direct inverse through MS-SiT's merged multiscale tokens. This module gives
the multiscale family an SSL objective that fits the hierarchy instead:

  * **Corruption is window-granular at the finest grid.** The unit of
    masking is a stage-0 attention window (a contiguous run of ``W`` sibling
    patches under one ancestor face — a pure reshape, like everything else
    in MS-SiT). Masking whole windows prevents the FIRST-BLOCK intra-window
    leak (a masked token reconstructed from unmasked neighbors inside the
    same local-attention window); later axial cross-window blocks, merged
    stages, and global stage-0 attention (when ``num_patches <=
    global_max``) still mix masked windows with unmasked content — the
    standard (and intended) context path of masked-image modelling, not a
    guarantee of isolation. The corruption law mirrors the SiT MPP /
    BERT recipe at window granularity: exactly ``ceil(mask_prob * nW)``
    windows per sample are selected (exact-count top-k, static shapes), of
    which ``replace_prob`` become a learned mask token, a
    ``swap_prob/(1-replace_prob)`` fraction are swapped with random other
    windows of the same sample, and the rest pass through unchanged (still
    scored).
  * **Corruption happens in patch-token space** (before the embedding GEMM),
    as in models/mpp.py — the swap gather runs on constants, so its
    transpose (a TPU scatter) never enters the gradient path; only the
    mask-token ``where`` carries gradient.
  * **The decoder reconstructs stage-0 resolution from the final stage.**
    Each final-stage token is the merge-image of ``up = 4^(n_stages-1)``
    contiguous finest tokens, so one linear head ``dim_last ->
    up * patch_dim`` followed by a reshape is a pixel-shuffle-style
    upsampling decoder (SimMIM's one-linear-layer finding; see PAPERS.md).
    Masked MSE over masked finest tokens, static denominator.

Param names follow models/mpp.py ("mask_token", "to_original") so the
trainer's ``optimize_decoder=False`` freeze labels apply unchanged.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.models.mpp import exact_count_mask
from surface_vision_transformers_tpu.models.mssit import MSSiT
from surface_vision_transformers_tpu.models.sit import (
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from surface_vision_transformers_tpu.ops import (
    normalize_tokens,
    patchify,
    rearrange_patched,
)


def corruption_window(model: MSSiT) -> int:
    """Masking granularity: the stage-0 face-hierarchy window (independent
    of whether stage-0 ATTENTION runs global at small token counts)."""
    T = model.num_patches
    w = min(model.window, 4**model.patch_level, T)
    if w < 1 or T % w:
        raise ValueError(f"window {w} does not divide {T} tokens")
    return w


def corrupt_window_sequence(
    key: jax.Array,
    target: jax.Array,
    mask_token: jax.Array,
    *,
    window: int,
    mask_prob: float,
    replace_prob: float,
    swap_prob: float,
):
    """Corrupt a (B, T, P) patch-token sequence at window granularity.

    Returns (corrupted (B, T, P), mask (B, T) bool, n_masked_windows int).
    Swapped units are whole windows (take_along_axis on the window axis of a
    reshaped view — rows are (W*P)-wide, one gather); the mask token
    broadcasts over every token of a replaced window.
    """
    B, T, P = target.shape
    W = min(window, T)
    nW = T // W
    k_mask, k_swapsel, k_swapidx, k_repl = jax.random.split(key, 4)

    wmask, n_masked = exact_count_mask(k_mask, B, nW, mask_prob)
    wins = target.reshape(B, nW, W * P)
    if swap_prob > 0:
        # replace_prob == 1.0 would divide by zero (reference recipe keeps
        # replace < 1 when swap > 0); clamp — every masked window is
        # replaced by the mask token afterwards anyway, so the swap outcome
        # is unobservable at that point
        swap_rate = swap_prob / max(1.0 - replace_prob, 1e-9)
        swap_sel = jnp.logical_and(
            wmask, jax.random.uniform(k_swapsel, (B, nW)) < swap_rate
        )
        rand_idx = jax.random.randint(k_swapidx, (B, nW), 0, nW)
        idx = jnp.where(swap_sel, rand_idx, jnp.arange(nW)[None, :])
        wins = jnp.take_along_axis(wins, idx[:, :, None], axis=1)

    repl_sel = jnp.logical_and(
        wmask, jax.random.uniform(k_repl, (B, nW)) < replace_prob
    )
    corrupted = jnp.where(
        repl_sel[:, :, None],
        jnp.broadcast_to(
            jnp.tile(mask_token.reshape(1, 1, P).astype(wins.dtype), (1, 1, W)),
            wins.shape,
        ),
        wins,
    ).reshape(B, T, P)
    token_mask = jnp.repeat(wmask, W, axis=1)
    return corrupted, token_mask, n_masked


def mssit_target_tokens(model: MSSiT, batch: jax.Array) -> jax.Array:
    """Finest-grid (B, T0, patch_dim) reconstruction targets from raw
    (B, C, G), pre-patched (B, C, T, V), or already-flattened token input —
    the same branches (and normalization) as models/mpp.py's target."""
    patch_dim = model.patch_dim
    if batch.ndim == 4:
        return rearrange_patched(batch)
    if batch.ndim == 3 and batch.shape[-1] == patch_dim:
        return batch
    if batch.ndim == 3:
        target = patchify(batch, model.patch_table)
        if model.norm_means is not None:
            target = normalize_tokens(target, model.norm_means, model.norm_stds)
        return target
    raise ValueError(f"bad MPP input shape {batch.shape}")


class MPPMSSiT(nn.Module):
    """Masked-window pretraining wrapper around a (shared) MS-SiT encoder.

    Same call contract as models/mpp.py::MPP — ``__call__(batch, rng)``
    returns (loss, reconstruction) — so the Trainer's MPP plumbing (init,
    loss, eval, decoder freezing) applies unchanged.
    """

    encoder: MSSiT
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

        target = mssit_target_tokens(enc, batch)
        W = corruption_window(enc)

        if fixed_mask is not None:
            # parity/testing hook: caller supplies the corruption outcome
            mask = fixed_mask
            corrupted = fixed_corrupted
            n_masked = None
        else:
            if rng is None:
                rng = self.make_rng("mpp")
            corrupted, mask, n_masked = corrupt_window_sequence(
                rng, target, mask_token,
                window=W,
                mask_prob=self.mask_prob,
                replace_prob=self.replace_prob,
                swap_prob=self.swap_prob,
            )

        feats = enc(corrupted, deterministic=deterministic, features=True)

        up = enc.num_patches // feats.shape[1]
        recon = nn.Dense(
            up * patch_dim,
            dtype=jnp.float32,
            param_dtype=enc.param_dtype,
            kernel_init=torch_linear_kernel_init
            if enc.torch_init
            else nn.initializers.lecun_normal(),
            bias_init=torch_linear_bias_init(enc.stage_dims()[-1])
            if enc.torch_init
            else nn.initializers.zeros_init(),
            name="to_original",
        )(feats.astype(jnp.float32))
        recon = recon.reshape(target.shape[0], enc.num_patches, patch_dim)

        err = jnp.square(recon - target.astype(jnp.float32))
        masked_err = jnp.where(mask[:, :, None], err, 0.0)
        if sample_weights is not None:
            masked_err = masked_err * sample_weights[:, None, None]
            batch_count = jnp.maximum(sample_weights.sum(), 1e-9)
        else:
            batch_count = target.shape[0]
        if n_masked is not None:
            denom = batch_count * n_masked * W * patch_dim
        elif sample_weights is not None:
            # fixed-mask hook with weights: weight each sample's masked-token
            # count so the normalization matches the random path's
            # batch_count * n_masked (mask rows may differ per sample here)
            denom = jnp.maximum(
                (sample_weights[:, None] * mask).sum() * patch_dim, 1e-9
            )
        else:
            denom = jnp.maximum(mask.sum() * patch_dim, 1)
        loss = masked_err.sum() / denom
        return loss, recon
