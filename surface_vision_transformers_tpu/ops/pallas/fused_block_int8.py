"""int8 serving variant of the fused transformer-block megakernel.

Same one-kernel-per-block structure as ``fused_block`` (LN -> QKV ->
attention -> out-proj -> residual -> LN -> MLP -> residual, activations
resident in VMEM), but the four weight GEMMs — QKV, out-projection, MLP
fc1, MLP fc2, ~75% of block FLOPs — run on the MXU in int8, which v5e
executes at 2x the bf16 rate (394 TOPS vs 197 TFLOP/s).

Quantization scheme (standard dynamic W8A8):
  - weights: symmetric per-OUTPUT-CHANNEL int8, scales fp32 (quantized
    once outside the kernel by ``quantize_block_weights`` — cheap enough
    to run per call under jit, ~5 MB of HBM traffic for SiT-tiny);
  - activations: symmetric per-TOKEN (per GEMM row) int8, computed
    dynamically inside the kernel from the fp32 row absmax.
Accumulation is int32 on the MXU; dequantization is the rank-1 outer
product of row and column scales. Attention (QK^T, softmax, PV), the
LayerNorms, GELU, residuals, biases all stay fp32/bf16 exactly as in the
bf16 kernel — int8 touches only the weight GEMMs.

Inference-only (no VJP): this is the serving path. Reference parity
target: the same logits the reference's fp32 eval produces
(/root/reference/tools/train.py:316-332), within W8A8 quantization error
(see tests/test_int8.py bounds: per-token-per-channel W8A8 on
LN-conditioned activations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surface_vision_transformers_tpu.ops.pallas.fused_block import (
    _NEG_INF,
    _auto_group,
    _clamp_group,
    _fit_group,
    _layer_norm,
    _softmax_rows,
)


def quantize_weight_int8(w: jax.Array):
    """Symmetric per-output-channel int8 quantization of a (in, out)
    kernel. Returns (int8 weights, (1, out) fp32 scales)."""
    wf = w.astype(jnp.float32)
    a = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    s = jnp.maximum(a, 1e-30) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_block_weights(w_qkv, w_out, w_fc1, w_fc2):
    """Quantize the four GEMM weights of one block. Returns a flat tuple
    (q_qkv, s_qkv, q_out, s_out, q_fc1, s_fc1, q_fc2, s_fc2)."""
    out = []
    for w in (w_qkv, w_out, w_fc1, w_fc2):
        out.extend(quantize_weight_int8(w))
    return tuple(out)


def _quant_rows(h):
    """Dynamic symmetric per-row int8: fp32 (M, K) -> (int8 (M, K),
    fp32 (M, 1) scales)."""
    a = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(a, 1e-30) / 127.0
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


def _int8_mm(h, wq_ref, ws_ref):
    """fp32 (M, K) x int8 (K, Nout) -> fp32 (M, Nout) via dynamic
    per-row activation quant and an int8 x int8 -> int32 MXU GEMM."""
    q, s = _quant_rows(h)
    acc = jax.lax.dot_general(
        q, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s * ws_ref[0]


def _block_kernel_int8(
    x_ref,
    ln1_s_ref, ln1_b_ref,
    qw_qkv_ref, qs_qkv_ref,
    qw_out_ref, qs_out_ref, bout_ref,
    ln2_s_ref, ln2_b_ref,
    qw_fc1_ref, qs_fc1_ref, bfc1_ref,
    qw_fc2_ref, qs_fc2_ref, bfc2_ref,
    o_ref,
    *, heads, dim_head, valid_len, group, ln_eps, fast_softmax,
):
    np_ = x_ref.shape[1]
    dim = x_ref.shape[2]
    hd = heads * dim_head
    scale = dim_head ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    ln1_s = ln1_s_ref[0].astype(jnp.float32)
    ln1_b = ln1_b_ref[0].astype(jnp.float32)
    ln2_s = ln2_s_ref[0].astype(jnp.float32)
    ln2_b = ln2_b_ref[0].astype(jnp.float32)

    # Flattened sample group in the GEMM M dim, as in the bf16 kernel.
    x = x_ref[...].reshape(group * np_, dim)
    h = _layer_norm(x, ln1_s, ln1_b, ln_eps)  # fp32 (LN-conditioned rows)
    qkv = _int8_mm(h, qw_qkv_ref, qs_qkv_ref).astype(x.dtype)

    attn_rows = []
    for g in range(group):
        qkv_g = qkv[g * np_:(g + 1) * np_]
        outs = []
        for hh in range(heads):
            q = qkv_g[:, hh * dim_head:(hh + 1) * dim_head]
            k = qkv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
            v = qkv_g[:, 2 * hd + hh * dim_head:2 * hd + (hh + 1) * dim_head]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(col < valid_len, s, _NEG_INF)
            p, l = _softmax_rows(s, fast_softmax)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((o / l).astype(x.dtype))
        attn_rows.append(jnp.concatenate(outs, axis=-1))
    attn = jnp.concatenate(attn_rows, axis=0).astype(jnp.float32)
    attn = _int8_mm(attn, qw_out_ref, qs_out_ref) + bout_ref[0].astype(
        jnp.float32
    )
    x1 = x.astype(jnp.float32) + attn

    h2 = _layer_norm(x1, ln2_s, ln2_b, ln_eps)
    f = _int8_mm(h2, qw_fc1_ref, qs_fc1_ref) + bfc1_ref[0].astype(jnp.float32)
    c = 0.7978845608028654  # sqrt(2/pi); tanh-GELU as in the bf16 kernel
    f = 0.5 * f * (1.0 + jnp.tanh(c * (f + 0.044715 * f * f * f)))
    f = _int8_mm(f, qw_fc2_ref, qs_fc2_ref) + bfc2_ref[0].astype(jnp.float32)
    o_ref[...] = (x1 + f).astype(o_ref.dtype).reshape(group, np_, dim)


def fused_block_int8(
    x: jax.Array,
    ln1_scale, ln1_bias,
    qw_qkv, qs_qkv,
    qw_out, qs_out, b_out,
    ln2_scale, ln2_bias,
    qw_fc1, qs_fc1, b_fc1,
    qw_fc2, qs_fc2, b_fc2,
    *,
    heads: int,
    dim_head: int,
    valid_len: int | None = None,
    ln_eps: float = 1e-5,
    group: int | None = None,
    fast_softmax: bool = True,
) -> jax.Array:
    """One transformer block with int8 weight GEMMs. x: (B, N, dim),
    N % 8 == 0; ``qw_*``/``qs_*`` from ``quantize_block_weights``.
    Inference only (no autodiff)."""
    B, N, dim = x.shape
    if N % 8 != 0:
        raise NotImplementedError("fused_block_int8 requires N % 8 == 0")
    vl = N if valid_len is None else int(valid_len)
    # The bf16 VMEM model is an upper bound here (int8 weights are 4x
    # smaller; the activation tiles are the same), so reusing _clamp_group
    # only ever under-sizes G, never overflows VMEM.
    G = _fit_group(_clamp_group(
        group or _auto_group(dim), N, dim, qw_fc1.shape[1], qw_qkv.shape[1]
    ), B)

    def vec(v):
        return v.reshape(1, -1)

    blk_x = pl.BlockSpec((G, N, dim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda b: tuple([0] * w.ndim),
                            memory_space=pltpu.VMEM)

    args = [
        vec(ln1_scale), vec(ln1_bias),
        qw_qkv, qs_qkv,
        qw_out, qs_out, vec(b_out),
        vec(ln2_scale), vec(ln2_bias),
        qw_fc1, qs_fc1, vec(b_fc1),
        qw_fc2, qs_fc2, vec(b_fc2),
    ]
    return pl.pallas_call(
        functools.partial(
            _block_kernel_int8, heads=heads, dim_head=dim_head, valid_len=vl,
            group=G, ln_eps=ln_eps, fast_softmax=fast_softmax,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, dim), x.dtype),
        grid=(B // G,),
        in_specs=[blk_x] + [wspec(a) for a in args],
        out_specs=blk_x,
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(x, *args)
