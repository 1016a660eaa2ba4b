"""Fused inference runner: the whole SiT forward over megakernel blocks.

Executes a SiT parameter tree (same tree the flax modules train) through
``ops.pallas.fused_block`` — one Pallas kernel per transformer block, with
activations resident in VMEM across LN/QKV/attention/projection/MLP — for
evaluation and serving. Numerics match ``SiT.apply`` (fp32 LN eps 1e-5, fp32
softmax, exact GELU) at bf16 compute; gradients are NOT defined through this
path (train with the composable modules; their attention kernel has a custom
VJP).

Usage::

    out = fused_forward(model, params, x)   # == model.apply(params, x)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.models.sit import SiT
from surface_vision_transformers_tpu.ops import fused_patch_embed, rearrange_patched
from surface_vision_transformers_tpu.ops.patchify import _GATHER_CHUNK
from surface_vision_transformers_tpu.ops.pallas.fused_block import fused_block



def _batch_axes(mesh) -> tuple:
    from surface_vision_transformers_tpu.parallel import batch_axes

    return batch_axes(mesh)


def _pure_dp(mesh) -> bool:
    """Only the 'data' batch axis is nontrivial — params replicated, batch
    sharded; the preconditions for shard_mapping a megakernel with P() param
    specs. Meshes using other axis names are rejected (the specs below bind
    'data'/'fsdp' literally)."""
    if mesh is None or mesh.size == 1:
        return False
    shape = dict(mesh.shape)
    if "data" not in shape:
        return False
    return all(v == 1 for k, v in shape.items() if k != "data")


def _dp_shard_map(fn, mesh, variables, x):
    """Run ``fn(variables, x)`` per data shard: params replicated (P() spec
    prefix), batch sharded. The shard_map transpose psums replicated-input
    cotangents, so differentiating through this yields correctly summed
    weight grads."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axes = _batch_axes(mesh)
    spec_x = P(axes, *([None] * (x.ndim - 1)))
    spec_o = P(axes, None)
    return shard_map(
        fn, mesh=mesh, in_specs=(P(), spec_x), out_specs=spec_o,
        check_vma=False,
    )(variables, x)


def _layer_norm(x, scale, bias, eps=1e-5):
    h = x.astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + eps) * scale + bias


# Per-surface throughput is flat-to-best at B=256 and everything in the
# forward scales linearly except residual gather/batch effects, so large
# serving batches run as an on-device lax.map over tiles of this size
# (B=1024: 4 x the B=256 time + ~0.3 ms map overhead, instead of ~4% worse
# per surface).
_INFER_MICROBATCH = 256


def fused_forward(
    model: SiT, variables, x: jax.Array, *, mesh=None,
    microbatch: int | None = _INFER_MICROBATCH,
    quant: str | None = None,
    scan_blocks: bool = False,
) -> jax.Array:
    """Inference-only forward with fused-block kernels. x: raw (B, C, G) or
    pre-patched (B, C, L, V); returns (B, num_classes).

    ``mesh``: under a PURE-DP mesh the whole forward shard_maps over the
    batch axes (params replicated), keeping every megakernel on the per-shard
    path — a raw pallas_call on GSPMD-sharded activations would be
    unpartitionable. Non-DP meshes (FSDP/TP shard the params) must use the
    modular model instead.

    ``microbatch``: batches larger than this run as an on-device lax.map
    over tiles of this size (identical outputs; see _INFER_MICROBATCH).

    ``quant="int8"``: run the non-final blocks through the W8A8 megakernel
    (``fused_block_int8`` — per-channel int8 weights quantized on the fly,
    per-token dynamic int8 activations, int32 MXU accumulation; 2x MXU rate
    on v5e). Embedding, attention internals, the final cls block, and the
    head stay bf16/fp32. Serving only; expect W8A8-level logit error (see
    tests/test_int8.py).

    ``scan_blocks``: run the non-final block stack as one lax.scan over
    depth-stacked weights (bf16 AND int8 paths) — the block kernel compiles
    once instead of once per layer, mirroring ``fused_train_forward`` /
    ``fused_mssit_forward``; see ``TPUConfig.scan_blocks``.

    The sequence pads to the next SUBLANE multiple (N % 8; 321 -> 328 for
    sub-ico-2) rather than the modular path's lane multiple (384): score
    intermediates are VREG-padded by Mosaic either way, so the smaller pad
    saves ~15% of the row work. With CLS pooling the final block runs the
    ``fused_block_cls`` kernel, which computes only the 8-row output tile the
    pool reads (~1/7 of a full block)."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        fused_block_cls,
    )

    if mesh is not None and mesh.size > 1:
        if not _pure_dp(mesh) or x.shape[0] % mesh.shape["data"]:
            raise ValueError(
                "fused paths under a mesh require pure DP with the batch "
                "divisible by the data axis; use the modular model"
            )
        return _dp_shard_map(
            lambda v, xx: fused_forward(
                model, v, xx, microbatch=microbatch, quant=quant,
                scan_blocks=scan_blocks,
            ),
            mesh, variables, x,
        )

    B = x.shape[0]
    if microbatch and B > microbatch and B % microbatch == 0:
        xt = x.reshape(B // microbatch, microbatch, *x.shape[1:])
        out = jax.lax.map(
            lambda c: fused_forward(
                model, variables, c, microbatch=None, quant=quant,
                scan_blocks=scan_blocks,
            ),
            xt,
        )
        return out.reshape(B, out.shape[-1])

    p = variables["params"] if "params" in variables else variables
    dt = model.dtype

    if x.ndim == 3:
        tokens = fused_patch_embed(
            x, model.patch_table, p["patch_embedding_kernel"],
            p["patch_embedding_bias"], means=model.norm_means,
            stds=model.norm_stds, compute_dtype=dt,
            gather_chunk=_GATHER_CHUNK,
        )
    else:
        tokens = rearrange_patched(x).astype(dt)
        tokens = tokens @ p["patch_embedding_kernel"].astype(dt) + p[
            "patch_embedding_bias"
        ].astype(dt)

    B, n = tokens.shape[0], tokens.shape[1]
    cls = jnp.broadcast_to(p["cls_token"].astype(dt), (B, 1, model.dim))
    h = jnp.concatenate([cls, tokens], axis=1)
    h = h + p["pos_embedding"][:, : n + 1].astype(dt)
    n_pad = -(-(n + 1) // 8) * 8
    if n_pad > n + 1:
        h = jnp.pad(h, [(0, 0), (0, n_pad - (n + 1)), (0, 0)])

    valid = n + 1 if n_pad > n + 1 else None
    enc = p["encoder"]
    cls_last = model.pool == "cls"
    if quant not in (None, "int8"):
        raise ValueError(f"unknown quant mode {quant!r}")
    n_plain = model.depth - 1 if cls_last else model.depth
    if scan_blocks and n_plain > 1:
        stacked = _stacked_block_weights(
            enc, range(n_plain), dt, cast=quant != "int8"
        )

        def body(hh, layer):
            return _infer_block(layer, hh, model.heads, model.dim_head,
                                valid, dt, quant=quant), None

        h, _ = jax.lax.scan(body, h, stacked)
        rest = range(n_plain, model.depth)
    else:
        rest = range(model.depth)
    for i in rest:
        a = enc[f"layers_{i}_attn"]
        m = enc[f"layers_{i}_mlp"]
        if cls_last and i == model.depth - 1:
            # the cls final block computes only ~1/7 of a block; keep bf16
            h = fused_block_cls(
                h,
                a["norm"]["scale"], a["norm"]["bias"],
                a["to_qkv"]["kernel"].astype(dt),
                a["to_out"]["kernel"].astype(dt), a["to_out"]["bias"],
                m["norm"]["scale"], m["norm"]["bias"],
                m["fc1"]["kernel"].astype(dt), m["fc1"]["bias"],
                m["fc2"]["kernel"].astype(dt), m["fc2"]["bias"],
                heads=model.heads, dim_head=model.dim_head, valid_len=valid,
            )
        elif quant == "int8":
            from surface_vision_transformers_tpu.ops.pallas.fused_block_int8 import (
                fused_block_int8, quantize_block_weights,
            )

            (q_qkv, s_qkv, q_out, s_out, q_fc1, s_fc1, q_fc2, s_fc2) = (
                quantize_block_weights(
                    a["to_qkv"]["kernel"], a["to_out"]["kernel"],
                    m["fc1"]["kernel"], m["fc2"]["kernel"],
                )
            )
            h = fused_block_int8(
                h,
                a["norm"]["scale"], a["norm"]["bias"],
                q_qkv, s_qkv, q_out, s_out, a["to_out"]["bias"],
                m["norm"]["scale"], m["norm"]["bias"],
                q_fc1, s_fc1, m["fc1"]["bias"],
                q_fc2, s_fc2, m["fc2"]["bias"],
                heads=model.heads, dim_head=model.dim_head, valid_len=valid,
            )
        else:
            h = fused_block(
                h,
                a["norm"]["scale"], a["norm"]["bias"],
                a["to_qkv"]["kernel"].astype(dt),
                a["to_out"]["kernel"].astype(dt), a["to_out"]["bias"],
                m["norm"]["scale"], m["norm"]["bias"],
                m["fc1"]["kernel"].astype(dt), m["fc1"]["bias"],
                m["fc2"]["kernel"].astype(dt), m["fc2"]["bias"],
                heads=model.heads, dim_head=model.dim_head, valid_len=valid,
            )

    if model.pool == "mean":
        pooled = jnp.mean(h[:, : n + 1], axis=1)
    else:
        pooled = h[:, 0]
    out = _layer_norm(
        pooled, p["head_norm"]["scale"].astype(jnp.float32),
        p["head_norm"]["bias"].astype(jnp.float32),
    )
    return out @ p["head"]["kernel"].astype(jnp.float32) + p["head"][
        "bias"
    ].astype(jnp.float32)


def predict(model: SiT, variables, data, *, batch_size: int = 256,
            quant: str | None = None):
    """Batched serving helper: pads the last batch, jit-caches per shape,
    uses the megakernel path on TPU (modular apply elsewhere). Returns a
    numpy (N, num_classes) array. ``quant="int8"`` serves through the W8A8
    megakernels (TPU fused path only)."""
    import numpy as np

    use_fused = (
        jax.default_backend() == "tpu" and model.dtype == jnp.bfloat16
    )

    @jax.jit
    def fwd(p, x):
        if use_fused:
            return fused_forward(model, p, x, quant=quant)
        return model.apply(p, x)

    n = data.shape[0]
    outs = []
    for s in range(0, n, batch_size):
        chunk = data[s : s + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [np.asarray(chunk),
                 np.zeros((pad, *chunk.shape[1:]), np.asarray(chunk).dtype)]
            )
        out = fwd(variables, jnp.asarray(chunk))
        outs.append(np.asarray(out)[: batch_size - pad if pad else batch_size])
    return np.concatenate(outs, axis=0)


def fused_train_forward(
    model: SiT, variables, x: jax.Array, *, mesh=None,
    scan_blocks: bool = False,
) -> jax.Array:
    """DIFFERENTIABLE fused forward: same megakernel blocks with the
    single-kernel backward (fused_block_train). Gradients flow to every
    parameter in the tree; embed/pool/head stay XLA (they are cheap and
    autodiff-friendly). GELU is the tanh form in both directions (deviation
    from erf-GELU is below bf16 resolution).

    ``mesh``: pure-DP meshes shard_map the whole step over the batch axes
    (params replicated; the shard_map transpose psums the weight grads), so
    multi-chip data-parallel training keeps the single-kernel-per-block
    backward. FSDP/TP meshes use the modular model.

    ``scan_blocks``: run the block stack as one lax.scan over depth-stacked
    weights — the stack is bitwise the unrolled loop's, and the block kernel
    pair compiles once instead of once per layer (``tpu.scan_blocks``)."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        fused_block_train,
    )

    if mesh is not None and mesh.size > 1:
        if not _pure_dp(mesh) or x.shape[0] % mesh.shape["data"]:
            raise ValueError(
                "fused paths under a mesh require pure DP with the batch "
                "divisible by the data axis; use the modular model"
            )
        return _dp_shard_map(
            lambda v, xx: fused_train_forward(
                model, v, xx, scan_blocks=scan_blocks
            ),
            mesh, variables, x,
        )

    p = variables["params"] if "params" in variables else variables
    dt = model.dtype

    if x.ndim == 3:
        tokens = fused_patch_embed(
            x, model.patch_table, p["patch_embedding_kernel"],
            p["patch_embedding_bias"], means=model.norm_means,
            stds=model.norm_stds, compute_dtype=dt,
            gather_chunk=_GATHER_CHUNK,
        )
    else:
        tokens = rearrange_patched(x).astype(dt)
        tokens = tokens @ p["patch_embedding_kernel"].astype(dt) + p[
            "patch_embedding_bias"
        ].astype(dt)

    B, n = tokens.shape[0], tokens.shape[1]
    cls = jnp.broadcast_to(p["cls_token"].astype(dt), (B, 1, model.dim))
    h = jnp.concatenate([cls, tokens], axis=1)
    h = h + p["pos_embedding"][:, : n + 1].astype(dt)
    # sublane padding (N % 8, like fused_forward); the chained backward
    # measured faster at 328 than the lane-aligned 384 too
    n_pad = -(-(n + 1) // 8) * 8
    if n_pad > n + 1:
        h = jnp.pad(h, [(0, 0), (0, n_pad - (n + 1)), (0, 0)])

    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        fused_block_cls_train,
    )

    valid = n + 1
    enc = p["encoder"]
    cls_last = model.pool == "cls"
    n_plain = model.depth - 1 if cls_last else model.depth
    if scan_blocks and n_plain > 1:
        stacked = _stacked_block_weights(enc, range(n_plain), dt)
        h = _scan_block_stack(h, stacked, model.heads, model.dim_head, valid)
        rest = range(n_plain, model.depth)
    else:
        rest = range(model.depth)
    for i in rest:
        a = enc[f"layers_{i}_attn"]
        m = enc[f"layers_{i}_mlp"]
        block_fn = (
            fused_block_cls_train
            if (cls_last and i == model.depth - 1)
            else fused_block_train
        )
        h = block_fn(
            h,
            a["norm"]["scale"], a["norm"]["bias"], a["to_qkv"]["kernel"].astype(dt),
            a["to_out"]["kernel"].astype(dt), a["to_out"]["bias"],
            m["norm"]["scale"], m["norm"]["bias"],
            m["fc1"]["kernel"].astype(dt), m["fc1"]["bias"],
            m["fc2"]["kernel"].astype(dt), m["fc2"]["bias"],
            model.heads, model.dim_head, valid,
        )

    if model.pool == "mean":
        pooled = jnp.mean(h[:, : n + 1], axis=1)
    else:
        pooled = h[:, 0]
    out = _layer_norm(
        pooled, p["head_norm"]["scale"].astype(jnp.float32),
        p["head_norm"]["bias"].astype(jnp.float32),
    )
    return out @ p["head"]["kernel"].astype(jnp.float32) + p["head"][
        "bias"
    ].astype(jnp.float32)


def _stacked_block_weights(enc, idxs, dt, *, cast: bool = True):
    """Depth-stack the 11 per-block weight arrays for ``lax.scan`` over the
    block kernel: each leaf gains a leading len(idxs) axis. Differentiable
    (the stack's transpose un-stacks cotangents back onto the layer leaves).
    ``cast=False`` stacks the GEMM kernels UNCAST (int8 scan quantizes from
    the original-precision params, matching the unrolled path)."""
    def leaves(i):
        a = enc[f"layers_{i}_attn"]
        m = enc[f"layers_{i}_mlp"]
        ct = (lambda w: w.astype(dt)) if cast else (lambda w: w)
        return (
            a["norm"]["scale"], a["norm"]["bias"],
            ct(a["to_qkv"]["kernel"]),
            ct(a["to_out"]["kernel"]), a["to_out"]["bias"],
            m["norm"]["scale"], m["norm"]["bias"],
            ct(m["fc1"]["kernel"]), m["fc1"]["bias"],
            ct(m["fc2"]["kernel"]), m["fc2"]["bias"],
        )

    per_layer = [leaves(i) for i in idxs]
    return tuple(jnp.stack(ws) for ws in zip(*per_layer))


def _infer_block(leaves, h, heads: int, dim_head: int, valid, dt, *,
                 quant: str | None = None):
    """One inference megakernel block on an 11-leaf weight tuple (the
    lax.scan body slice of ``_stacked_block_weights``) — bf16 (leaves already
    cast) or W8A8 (leaves uncast; quantized here like the unrolled path)."""
    (l1s, l1b, wqkv, wout, bout, l2s, l2b, wfc1, bfc1, wfc2, bfc2) = leaves
    if quant == "int8":
        from surface_vision_transformers_tpu.ops.pallas.fused_block_int8 import (
            fused_block_int8, quantize_block_weights,
        )

        (q_qkv, s_qkv, q_out, s_out, q_fc1, s_fc1, q_fc2, s_fc2) = (
            quantize_block_weights(wqkv, wout, wfc1, wfc2)
        )
        return fused_block_int8(
            h, l1s, l1b,
            q_qkv, s_qkv, q_out, s_out, bout,
            l2s, l2b, q_fc1, s_fc1, bfc1, q_fc2, s_fc2, bfc2,
            heads=heads, dim_head=dim_head, valid_len=valid,
        )
    return fused_block(
        h, l1s, l1b, wqkv, wout, bout, l2s, l2b, wfc1, bfc1, wfc2, bfc2,
        heads=heads, dim_head=dim_head, valid_len=valid,
    )


def _scan_block_stack(h, stacked, heads: int, dim_head: int, valid: int):
    """Run fused_block_train over depth-stacked weights as ONE lax.scan: the
    megakernel pair (fwd + split bwd) is traced and Mosaic-compiled once
    instead of once per layer, so first-compile time stops scaling with
    depth. The stack itself (outputs AND grads) is bitwise the unrolled
    loop's on TPU (tests_tpu pins this); end-to-end train steps agree to
    bf16 rounding because XLA fuses the ops AROUND the stack differently
    between the two program shapes. See ``TPUConfig.scan_blocks``."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        fused_block_train,
    )

    def body(hh, layer):
        return fused_block_train(hh, *layer, heads, dim_head, valid), None

    h, _ = jax.lax.scan(body, h, stacked)
    return h


def _fused_encoder_blocks(enc_model, enc, h, valid: int,
                          scan_blocks: bool = False):
    """The fused_block_train stack: (B, Npad, dim) -> (B, Npad, dim). ``enc``
    is the encoder param subtree; everything here is Pallas megakernels, so
    under a mesh this is the region that must run per shard (shard_map)."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        fused_block_train,
    )

    dt = enc_model.dtype
    if scan_blocks and enc_model.depth > 1:
        stacked = _stacked_block_weights(enc, range(enc_model.depth), dt)
        return _scan_block_stack(
            h, stacked, enc_model.heads, enc_model.dim_head, valid
        )
    for i in range(enc_model.depth):
        a = enc[f"layers_{i}_attn"]
        m = enc[f"layers_{i}_mlp"]
        h = fused_block_train(
            h,
            a["norm"]["scale"], a["norm"]["bias"], a["to_qkv"]["kernel"].astype(dt),
            a["to_out"]["kernel"].astype(dt), a["to_out"]["bias"],
            m["norm"]["scale"], m["norm"]["bias"],
            m["fc1"]["kernel"].astype(dt), m["fc1"]["bias"],
            m["fc2"]["kernel"].astype(dt), m["fc2"]["bias"],
            enc_model.heads, enc_model.dim_head, valid,
        )
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _masked_mse_recon(cdt, h, kernel, bias, target, maskw, inv_denom):
    """Reconstruction head + masked MSE as one memory-lean op.

    loss = sum(maskw * (h @ kernel + bias - target)^2) * inv_denom, with the
    GEMM operands cast to ``cdt`` (the encoder compute dtype) and fp32 MXU
    accumulation. Autodiff of the plain expression keeps the fp32 recon
    residual (802 MB at bs=1024 sub-ico-2) and runs both backward GEMMs with
    an fp32 cotangent operand — off the MXU's bf16 rate. This VJP saves only
    the ``cdt`` masked residual and feeds the grad GEMMs ``cdt`` operands,
    which is lossless relative to the ``cdt``-input GEMMs themselves. With
    ``cdt == float32`` (parity mode) it reproduces autodiff exactly.
    maskw must carry the 0/1 mask (already multiplied by any 0/1 sample
    weights)."""
    loss, _ = _masked_mse_recon_fwd(cdt, h, kernel, bias, target, maskw,
                                    inv_denom)
    return loss


def _masked_mse_recon_fwd(cdt, h, kernel, bias, target, maskw, inv_denom):
    hd = h.astype(cdt)
    kd = kernel.astype(cdt)
    recon = jnp.matmul(hd, kd, preferred_element_type=jnp.float32)
    recon = recon + bias.astype(jnp.float32)
    d = recon - target.astype(jnp.float32)
    masked_d = d * maskw[:, :, None]
    # masked_d * d = maskw * d^2 without assuming maskw is idempotent
    loss = jnp.sum(masked_d * d) * inv_denom
    res = (h, kernel, bias, target[:0], masked_d.astype(cdt), inv_denom)
    return loss, res


def _masked_mse_recon_bwd(cdt, res, g):
    h, kernel, bias, target0, masked_d, inv_denom = res
    gb = 2.0 * g * inv_denom  # d_recon = gb * masked_d
    kd = kernel.astype(cdt)
    dh = (
        jnp.matmul(masked_d, kd.T, preferred_element_type=jnp.float32) * gb
    ).astype(h.dtype)
    dk = (
        jax.lax.dot_general(
            h.astype(cdt), masked_d, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * gb
    ).astype(kernel.dtype)
    db = (masked_d.astype(jnp.float32).sum((0, 1)) * gb).astype(bias.dtype)
    # target/maskw/inv_denom never depend on params; their zero cotangents
    # are DCE'd by XLA
    dt_target = jnp.zeros(masked_d.shape, target0.dtype)
    return (dh, dk, db, dt_target,
            jnp.zeros(masked_d.shape[:2], jnp.float32),
            jnp.zeros((), jnp.float32))


_masked_mse_recon.defvjp(_masked_mse_recon_fwd, _masked_mse_recon_bwd)


def fused_mpp_loss(mpp, variables, batch, rng, sample_weights=None, *,
                   mesh=None, scan_blocks: bool = False):
    """Differentiable MPP loss over the fused-block encoder — functional
    equivalent of models.mpp.MPP.__call__ (corruption -> shared embed ->
    encoder -> reconstruction -> masked MSE) reading the param tree directly.
    Returns (loss, recon).

    ``mesh``: under a PURE-DP mesh only the megakernel block stack shard_maps
    over the batch axes (params replicated per shard); the corruption,
    embedding, and loss stay global XLA ops — GSPMD partitions them — so the
    loss is EXACTLY the single-device value (same global corruption from the
    same ``rng``). Non-DP meshes must use the modular MPP module."""
    from surface_vision_transformers_tpu.models.mpp import corrupt_sequence
    from surface_vision_transformers_tpu.ops import patchify, patchify_chunked

    if mesh is not None and mesh.size > 1 and not _pure_dp(mesh):
        raise ValueError(
            "fused_mpp_loss under a mesh requires pure DP; use the modular "
            "MPP module"
        )

    p = variables["params"] if "params" in variables else variables
    enc_model = mpp.encoder
    dt = enc_model.dtype
    patch_dim = enc_model.patch_dim

    if batch.ndim == 4:
        target = rearrange_patched(batch)
    elif batch.ndim == 3 and batch.shape[-1] == patch_dim:
        target = batch
    else:
        if mesh is None or mesh.size == 1:
            # chunked keeps XLA's gather compile flat in the row count
            target = patchify_chunked(batch, enc_model.patch_table)
        else:
            # under a mesh the batch is GSPMD-sharded; lax.map row tiling
            # would fight the sharding, so keep the one partitionable gather
            target = patchify(batch, enc_model.patch_table)
        if enc_model.norm_means is not None:
            from surface_vision_transformers_tpu.ops import normalize_tokens

            target = normalize_tokens(
                target, enc_model.norm_means, enc_model.norm_stds
            )

    corrupted, mask, n_masked = corrupt_sequence(
        rng, target, p["mask_token"],
        mask_prob=mpp.mask_prob, replace_prob=mpp.replace_prob,
        swap_prob=mpp.swap_prob,
    )

    ep = p["encoder"]
    tokens = corrupted.astype(dt) @ ep["patch_embedding_kernel"].astype(dt) + ep[
        "patch_embedding_bias"
    ].astype(dt)
    B, n = tokens.shape[0], tokens.shape[1]
    cls = jnp.broadcast_to(ep["cls_token"].astype(dt), (B, 1, enc_model.dim))
    h = jnp.concatenate([cls, tokens], axis=1)
    h = h + ep["pos_embedding"][:, : n + 1].astype(dt)
    n_pad = -(-(n + 1) // 8) * 8
    if n_pad > n + 1:
        h = jnp.pad(h, [(0, 0), (0, n_pad - (n + 1)), (0, 0)])

    enc = ep["encoder"]
    if mesh is not None and mesh.size > 1:
        if B % mesh.shape["data"]:
            raise ValueError(
                "fused_mpp_loss under a mesh needs the batch divisible by "
                "the data axis; use the modular MPP module"
            )
        h = _dp_shard_map(
            lambda e, hh: _fused_encoder_blocks(
                enc_model, e, hh, n + 1, scan_blocks=scan_blocks
            ),
            mesh, enc, h,
        )
    else:
        h = _fused_encoder_blocks(
            enc_model, enc, h, n + 1, scan_blocks=scan_blocks
        )
    h = h[:, 1 : n + 1]

    maskw = mask.astype(jnp.float32)
    if sample_weights is not None:
        maskw = maskw * sample_weights[:, None]
        batch_count = jnp.maximum(sample_weights.sum(), 1e-9)
    else:
        batch_count = jnp.float32(target.shape[0])
    inv_denom = 1.0 / (batch_count * n_masked * patch_dim)
    loss = _masked_mse_recon(
        dt, h, p["to_original"]["kernel"], p["to_original"]["bias"],
        target, maskw, inv_denom,
    )
    # API value only (tests/eval); computed outside the custom-VJP loss so the
    # jitted train step DCEs it when the caller discards it
    recon = jax.lax.stop_gradient(
        h.astype(jnp.float32)
        @ p["to_original"]["kernel"].astype(jnp.float32)
        + p["to_original"]["bias"].astype(jnp.float32)
    )
    return loss, recon
