"""Fused MS-SiT: whole windowed blocks through the SiT megakernels.

The key fact making this possible: everything in a pre-norm transformer block
except attention is token-local, and MS-SiT's attention is local to a window.
Fold windows into the batch dimension (a reshape — models/mssit.fold_tokens)
and a windowed block IS a standard block on (B*nW, W, dim) — so the whole
fused-kernel stack built for SiT (``fused_block`` inference megakernel,
``fused_block_train`` with the single-kernel/split backward) applies to the
multiscale family unchanged. Merges, embedding, and the head stay XLA (they
are cheap, bandwidth-bound, and autodiff-friendly).

Folded window lengths that miss the kernels' N % 8 requirement (e.g. the
axial fold at stage 3: nW=20 groups) pad with masked rows (valid_len) and
slice after — attention never reads the padding keys, and the padded rows'
token-local garbage is discarded.

Numerics match the modular bf16 path to the same bounds as SiT's fused
runner: tanh-GELU in-kernel (< 3e-4 from exact erf, below bf16 resolution),
fp32 LN/softmax. Exact-parity fp32 mode stays on the modular path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.models.fused import (
    _dp_shard_map,
    _layer_norm,
    _pure_dp,
)
from surface_vision_transformers_tpu.models.mssit import (
    MSSiT,
    fold_tokens,
    stage_plan,
    unfold_tokens,
)
from surface_vision_transformers_tpu.ops import fused_patch_embed, rearrange_patched
from surface_vision_transformers_tpu.ops.pallas.fused_block import (
    fused_block,
    fused_block_train,
)


def _embed(model: MSSiT, p: dict, x: jax.Array) -> jax.Array:
    dt = model.dtype
    if x.ndim == 3:
        tokens = fused_patch_embed(
            x, model.patch_table, p["patch_embedding_kernel"],
            p["patch_embedding_bias"], means=model.norm_means,
            stds=model.norm_stds, compute_dtype=dt,
        )
    else:
        tokens = rearrange_patched(x).astype(dt)
        tokens = tokens @ p["patch_embedding_kernel"].astype(dt) + p[
            "patch_embedding_bias"
        ].astype(dt)
    return tokens + p["pos_embedding"].astype(tokens.dtype)


# int8 serving pays only where the GEMMs are wide enough for the 2x int8
# MXU rate to beat the quant/dequant VPU overhead — measured a wash at
# dim 192 and 1.45x at dim 768 for SiT (docs/design.md); MS-SiT stages at
# or above this dim run W8A8, narrower stages stay bf16.
INT8_MIN_DIM = 384


def _run_block(block_fn, a, m, folded, heads, dim_head, dt, quant=None):
    """One (attn, mlp) param pair through a megakernel on the folded layout,
    padding the per-window length to the kernels' N % 8 requirement."""
    Nf = folded.shape[1]
    pad = (-Nf) % 8
    if pad:
        folded = jnp.pad(folded, [(0, 0), (0, pad), (0, 0)])
    vl = Nf if pad else None
    if quant == "int8":
        from surface_vision_transformers_tpu.ops.pallas.fused_block_int8 import (
            fused_block_int8, quantize_block_weights,
        )

        (q_qkv, s_qkv, q_out, s_out, q_fc1, s_fc1, q_fc2, s_fc2) = (
            quantize_block_weights(
                a["to_qkv"]["kernel"], a["to_out"]["kernel"],
                m["fc1"]["kernel"], m["fc2"]["kernel"],
            )
        )
        out = fused_block_int8(
            folded,
            a["norm"]["scale"], a["norm"]["bias"],
            q_qkv, s_qkv, q_out, s_out, a["to_out"]["bias"],
            m["norm"]["scale"], m["norm"]["bias"],
            q_fc1, s_fc1, m["fc1"]["bias"],
            q_fc2, s_fc2, m["fc2"]["bias"],
            heads=heads, dim_head=dim_head, valid_len=vl,
        )
        return out[:, :Nf] if pad else out
    out = block_fn(
        folded,
        a["norm"]["scale"], a["norm"]["bias"],
        a["to_qkv"]["kernel"].astype(dt),
        a["to_out"]["kernel"].astype(dt), a["to_out"]["bias"],
        m["norm"]["scale"], m["norm"]["bias"],
        m["fc1"]["kernel"].astype(dt), m["fc1"]["bias"],
        m["fc2"]["kernel"].astype(dt), m["fc2"]["bias"],
        heads=heads, dim_head=dim_head,
        valid_len=vl,
    )
    return out[:, :Nf] if pad else out


def _train_block(a, m, folded, heads, dim_head, dt):
    Nf = folded.shape[1]
    pad = (-Nf) % 8
    if pad:
        folded = jnp.pad(folded, [(0, 0), (0, pad), (0, 0)])
    out = fused_block_train(
        folded,
        a["norm"]["scale"], a["norm"]["bias"],
        a["to_qkv"]["kernel"].astype(dt),
        a["to_out"]["kernel"].astype(dt), a["to_out"]["bias"],
        m["norm"]["scale"], m["norm"]["bias"],
        m["fc1"]["kernel"].astype(dt), m["fc1"]["bias"],
        m["fc2"]["kernel"].astype(dt), m["fc2"]["bias"],
        heads, dim_head, Nf if pad else None,
    )
    return out[:, :Nf] if pad else out


def _flat_block(leaves, folded, heads, dim_head, dt, *, train, quant=None):
    """_run_block/_train_block on an 11-array UNCAST weight tuple (the
    lax.scan body slice of the depth-stacked weights — see _stages
    scan_blocks). Casts exactly as the unrolled runners do: GEMM kernels to
    the compute dtype (int8 quantizes from the uncast params), norms and
    biases untouched."""
    (l1s, l1b, wqkv, wout, bout, l2s, l2b, wfc1, bfc1, wfc2, bfc2) = leaves
    Nf = folded.shape[1]
    pad = (-Nf) % 8
    if pad:
        folded = jnp.pad(folded, [(0, 0), (0, pad), (0, 0)])
    vl = Nf if pad else None
    if train:
        out = fused_block_train(
            folded, l1s, l1b, wqkv.astype(dt), wout.astype(dt), bout,
            l2s, l2b, wfc1.astype(dt), bfc1, wfc2.astype(dt), bfc2,
            heads, dim_head, vl,
        )
    elif quant == "int8":
        from surface_vision_transformers_tpu.ops.pallas.fused_block_int8 import (
            fused_block_int8, quantize_block_weights,
        )

        (q_qkv, s_qkv, q_out, s_out, q_fc1, s_fc1, q_fc2, s_fc2) = (
            quantize_block_weights(wqkv, wout, wfc1, wfc2)
        )
        out = fused_block_int8(
            folded, l1s, l1b,
            q_qkv, s_qkv, q_out, s_out, bout,
            l2s, l2b, q_fc1, s_fc1, bfc1, q_fc2, s_fc2, bfc2,
            heads=heads, dim_head=dim_head, valid_len=vl,
        )
    else:
        out = fused_block(
            folded, l1s, l1b, wqkv.astype(dt), wout.astype(dt), bout,
            l2s, l2b, wfc1.astype(dt), bfc1, wfc2.astype(dt), bfc2,
            heads=heads, dim_head=dim_head, valid_len=vl,
        )
    return out[:, :Nf] if pad else out


def _block_leaves(p: dict, s: int, i: int):
    """The 11 UNCAST weight arrays of stage-s block-i (see _flat_block)."""
    a = p[f"stage_{s}_block_{i}_attn"]
    m = p[f"stage_{s}_block_{i}_mlp"]
    return (
        a["norm"]["scale"], a["norm"]["bias"],
        a["to_qkv"]["kernel"],
        a["to_out"]["kernel"], a["to_out"]["bias"],
        m["norm"]["scale"], m["norm"]["bias"],
        m["fc1"]["kernel"], m["fc1"]["bias"],
        m["fc2"]["kernel"], m["fc2"]["bias"],
    )


def _stages(
    model: MSSiT, p: dict, x: jax.Array, *, train: bool, quant=None,
    scan_blocks: bool = False,
) -> jax.Array:
    dt = model.dtype
    for st in stage_plan(model):
        s, dim_s, heads_s = st["stage"], st["dim"], st["heads"]
        dh = dim_s // heads_s
        B, T = x.shape[0], x.shape[1]
        q_s = quant if (quant and dim_s >= INT8_MIN_DIM) else None
        mixes = st["mixes"]
        # scan over the mix CYCLE (stage_plan alternates 'window' with the
        # cross mix): one scan iteration runs one full cycle, so each stage
        # Mosaic-compiles its kernel pair once per distinct mix instead of
        # once per block. Same bitwise-stack / bf16-glue contract as
        # models.fused._scan_block_stack. Odd-depth alternating stages scan
        # the largest full-cycle prefix and unroll the remainder blocks
        # (mirroring fused.py's n_plain scan + cls tail).
        pc = 1 if all(mx == mixes[0] for mx in mixes) else 2
        reps = len(mixes) // pc
        tail_off = 0
        if (
            scan_blocks and reps > 1
            and mixes[: pc * reps] == mixes[:pc] * reps
        ):
            stacked = tuple(
                tuple(
                    jnp.stack([
                        _block_leaves(p, s, k * pc + j)[mleaf]
                        for k in range(reps)
                    ])
                    for mleaf in range(11)
                )
                for j in range(pc)
            )

            def body(h, layer, *, _w=st["window"], _hs=heads_s, _dh=dh,
                     _mixes=tuple(mixes[:pc]), _B=B, _T=T, _q=q_s):
                for j, mix in enumerate(_mixes):
                    folded = fold_tokens(h, _w, mix)
                    out = _flat_block(layer[j], folded, _hs, _dh, dt,
                                      train=train, quant=_q)
                    h = (
                        unfold_tokens(out, _B, _T, _w, mix)
                        if folded is not h
                        else out
                    )
                return h, None

            x, _ = jax.lax.scan(body, x, stacked)
            tail_off = pc * reps
            mixes = mixes[tail_off:]
        for i, mix in enumerate(mixes):
            a = p[f"stage_{s}_block_{tail_off + i}_attn"]
            m = p[f"stage_{s}_block_{tail_off + i}_mlp"]
            folded = fold_tokens(x, st["window"], mix)
            if train:
                out = _train_block(a, m, folded, heads_s, dh, dt)
            else:
                out = _run_block(
                    fused_block, a, m, folded, heads_s, dh, dt, quant=q_s
                )
            x = (
                unfold_tokens(out, B, T, st["window"], mix)
                if folded is not x
                else out
            )
        if s < model.num_stages - 1:
            mg = p[f"stage_{s}_merge"]
            y = x.reshape(B, T // 4, 4 * dim_s)
            y = _layer_norm(
                y, mg["norm"]["scale"].astype(jnp.float32),
                mg["norm"]["bias"].astype(jnp.float32),
            ).astype(dt)
            x = y @ mg["reduce"]["kernel"].astype(dt)
    return x


def _head(model: MSSiT, p: dict, x: jax.Array) -> jax.Array:
    h = _layer_norm(
        x.astype(jnp.float32), p["head_norm"]["scale"].astype(jnp.float32),
        p["head_norm"]["bias"].astype(jnp.float32),
    )
    h = jnp.mean(h, axis=1)
    return h @ p["head"]["kernel"].astype(jnp.float32) + p["head"][
        "bias"
    ].astype(jnp.float32)


def _forward(model: MSSiT, variables, x: jax.Array, *, train: bool,
             quant=None, scan_blocks: bool = False):
    p = variables["params"] if "params" in variables else variables
    tokens = _embed(model, p, x)
    enc = _stages(model, p, tokens, train=train, quant=quant,
                  scan_blocks=scan_blocks)
    return _head(model, p, enc)


def fused_mssit_forward(model: MSSiT, variables, x, *, mesh=None, quant=None,
                        scan_blocks: bool = False):
    """Inference through the megakernel blocks; == model.apply at bf16
    bounds. Under a PURE-DP mesh the whole forward shard_maps over the batch
    axes (params replicated) like models.fused.fused_forward.
    ``quant="int8"``: stages at dim >= INT8_MIN_DIM serve through the W8A8
    megakernel (per-channel int8 weights, per-token dynamic int8
    activations, int32 MXU accumulation); narrower stages stay bf16 —
    int8 is a measured wash below ~dim 384 (docs/design.md).
    ``scan_blocks``: per-stage scan over the mix cycle (fewer kernel
    compiles; ``tpu.scan_blocks``) — int8 stages quantize per scan step
    from the same uncast weights, identical numerics."""
    if quant not in (None, "int8"):
        raise ValueError(f"unknown quant mode {quant!r}")
    if mesh is not None and mesh.size > 1:
        if not _pure_dp(mesh) or x.shape[0] % mesh.shape["data"]:
            raise ValueError(
                "fused MS-SiT under a mesh requires pure DP with the batch "
                "divisible by the data axis; use the modular model"
            )
        return _dp_shard_map(
            lambda v, xx: _forward(model, v, xx, train=False, quant=quant,
                                   scan_blocks=scan_blocks),
            mesh, variables, x,
        )
    return _forward(model, variables, x, train=False, quant=quant,
                    scan_blocks=scan_blocks)


def fused_mssit_mpp_loss(mpp, variables, batch, rng, sample_weights=None, *,
                         mesh=None, scan_blocks: bool = False):
    """Differentiable masked-window SSL loss over the fused-block stages —
    functional equivalent of models.mpp_mssit.MPPMSSiT.__call__ (window
    corruption -> shared embed -> fused stages -> upsampling decoder ->
    masked MSE) reading the param tree directly. Returns (loss, recon).

    When the corruption window is a multiple of the merge factor ``up``
    (every final-stage token's finest-grid group falls inside ONE corruption
    window — true for the shipped ico-6 config, W = up = 64) the loss runs
    through models.fused._masked_mse_recon, the memory-lean custom-VJP
    reconstruction head; otherwise the plain XLA expression (autodiff).

    ``mesh``: pure-DP only, like fused_mpp_loss — the stages shard_map over
    the batch axes, corruption/embed/loss stay global XLA ops."""
    from surface_vision_transformers_tpu.models.fused import (
        _masked_mse_recon,
    )
    from surface_vision_transformers_tpu.models.mpp_mssit import (
        corrupt_window_sequence,
        corruption_window,
        mssit_target_tokens,
    )

    if mesh is not None and mesh.size > 1 and not _pure_dp(mesh):
        raise ValueError(
            "fused_mssit_mpp_loss under a mesh requires pure DP; use the "
            "modular MPPMSSiT module"
        )

    p = variables["params"] if "params" in variables else variables
    model = mpp.encoder
    dt = model.dtype
    patch_dim = model.patch_dim

    target = mssit_target_tokens(model, batch)
    W = corruption_window(model)
    corrupted, mask, n_masked = corrupt_window_sequence(
        rng, target, p["mask_token"],
        window=W, mask_prob=mpp.mask_prob,
        replace_prob=mpp.replace_prob, swap_prob=mpp.swap_prob,
    )

    ep = p["encoder"]
    tokens = corrupted.astype(dt) @ ep["patch_embedding_kernel"].astype(
        dt
    ) + ep["patch_embedding_bias"].astype(dt)
    tokens = tokens + ep["pos_embedding"].astype(tokens.dtype)

    B = tokens.shape[0]
    if mesh is not None and mesh.size > 1:
        if B % mesh.shape["data"]:
            raise ValueError(
                "fused_mssit_mpp_loss under a mesh needs the batch divisible "
                "by the data axis; use the modular MPPMSSiT module"
            )
        feats = _dp_shard_map(
            lambda e, tt: _stages(model, e, tt, train=True,
                                  scan_blocks=scan_blocks),
            mesh, ep, tokens,
        )
    else:
        feats = _stages(model, ep, tokens, train=True, scan_blocks=scan_blocks)

    T_last = feats.shape[1]
    up = model.num_patches // T_last
    maskw = mask.astype(jnp.float32)
    if sample_weights is not None:
        maskw = maskw * sample_weights[:, None]
        batch_count = jnp.maximum(sample_weights.sum(), 1e-9)
    else:
        batch_count = jnp.float32(target.shape[0])
    inv_denom = 1.0 / (batch_count * n_masked * W * patch_dim)

    k = p["to_original"]["kernel"]
    b = p["to_original"]["bias"]
    if W % up == 0:
        # window-constant mask per final token: fold finest tokens into the
        # feature axis and reuse the memory-lean recon VJP
        loss = _masked_mse_recon(
            dt, feats, k, b,
            target.reshape(B, T_last, up * patch_dim),
            maskw.reshape(B, T_last, up)[:, :, 0], inv_denom,
        )
    else:
        recon_f = (
            jnp.matmul(feats.astype(dt), k.astype(dt),
                       preferred_element_type=jnp.float32)
            + b.astype(jnp.float32)
        ).reshape(B, model.num_patches, patch_dim)
        d = recon_f - target.astype(jnp.float32)
        loss = jnp.sum(jnp.square(d) * maskw[:, :, None]) * inv_denom
    recon = jax.lax.stop_gradient(
        (
            feats.astype(jnp.float32) @ k.astype(jnp.float32)
            + b.astype(jnp.float32)
        ).reshape(B, model.num_patches, patch_dim)
    )
    return loss, recon


def fused_mssit_train_forward(model: MSSiT, variables, x, *, mesh=None,
                              scan_blocks: bool = False):
    """DIFFERENTIABLE fused forward: every windowed block runs
    fused_block_train (single-kernel or split backward per its per-shape
    policy); embed/merge/head stay XLA autodiff. ``scan_blocks``: per-stage
    lax.scan over the mix cycle — kernels compile once per distinct mix per
    stage instead of once per block (``tpu.scan_blocks``)."""
    if mesh is not None and mesh.size > 1:
        if not _pure_dp(mesh) or x.shape[0] % mesh.shape["data"]:
            raise ValueError(
                "fused MS-SiT under a mesh requires pure DP with the batch "
                "divisible by the data axis; use the modular model"
            )
        return _dp_shard_map(
            lambda v, xx: _forward(model, v, xx, train=True,
                                   scan_blocks=scan_blocks),
            mesh, variables, x,
        )
    return _forward(model, variables, x, train=True, scan_blocks=scan_blocks)
