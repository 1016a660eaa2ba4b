"""Fused transformer-block Pallas kernel (inference path).

One kernel executes an ENTIRE pre-norm block — LN -> fused QKV -> attention
-> out-projection -> residual -> LN -> MLP(GELU) -> residual — per batch
tile, entirely in VMEM. HBM traffic per block drops to one read + one write
of the (B, N, dim) activations plus the weights; the unfused path pays ~10
intermediate tensor round-trips (measured ~2.2 ms/layer vs a ~0.9 ms
compute+traffic floor for SiT-tiny at B=256 on v5e).

``fused_block`` / ``fused_block_cls`` are the inference kernels (the
headline benchmark path); ``fused_block_train`` / ``fused_block_cls_train``
add custom VJPs whose backward is ONE kernel per block computing dx plus all
11 weight gradients, recomputing activations from the block input
flash-attention style (the trainer uses them whenever the recipe allows —
bf16, no dropout). The modular flax modules with the flash-attention kernel
remain the fallback (dropout, fp32 parity mode, CPU).

Semantics match models.sit.Attention + FeedForward: fp32 LayerNorm, dh^-0.5
scaling, fp32 softmax with valid_len masking (unshifted clamped form — see
``_softmax_rows``), tanh-GELU (< 3e-4 from exact erf, below bf16
resolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_CLAMP = 60.0  # fast-softmax overflow clamp; see _softmax_rows


def _layer_norm(x, scale, bias, eps=1e-6):
    h = x.astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _softmax_rows(s, fast: bool):
    """Row softmax numerator/denominator on masked scores (masked cols are
    ``_NEG_INF`` -> contribute exactly 0 either way).

    ``fast=True`` skips the row-max shift: softmax needs no shift unless
    ``exp`` overflows, so clamping at 60 (exp(60) ~ 1e26, and a full fp32 row
    sum stays < 3e38) gives the EXACT softmax whenever every score <= 60 —
    which LN-bounded bf16 activations satisfy by orders of magnitude — and a
    graceful saturation beyond. Measured -0.09 ms/block on SiT-tiny B=256
    (v5e) vs the shifted form. The training kernels use the same form in the
    forward and the backward's recomputation (bitwise-consistent), and the
    backward zeroes ``ds`` wherever the clamp binds (``_CLAMP`` indicator),
    so the gradient is exact for the computed function even past the clamp."""
    if fast:
        p = jnp.exp(jnp.minimum(s, _CLAMP))
        l = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
    return p, l



# epoch-level sweep overrides for the backward kernel's group / prob-cache
# policy (scripts/exp_bwd_epoch.py); None -> shipped defaults
_BWD_GROUP: int | None = None
_BWD_CACHE = None

# flattened-group VMEM working-set budget, calibrated so every MEASURED
# optimum stays untouched (SiT-base fwd G=8 estimates ~68M and is the
# fastest) while unmeasured larger shapes (e.g. dim 1024, mlp 4096: ~91M at
# G=8 against the 96M hard vmem_limit_bytes) clamp down instead of failing
# to compile
_GROUP_VMEM_BUDGET = 72 * 1024 * 1024


def _auto_group(dim: int, bwd: bool = False, n: int | None = None) -> int:
    """Measured flattened-group defaults (v5e, scripts/exp_group_by_shape.py):
    fwd ms/block at B=256, N=328 —
      dim 192 (tiny):  G=2 0.947, G=4 0.937, G=8 0.899  -> 8
      dim 384 (small): G=2 2.255, G=4 2.483, G=8 2.542  -> 2
      dim 768 (base):  G=2 8.659, G=4 8.123, G=8 7.779  -> 8
    backward (dim 192): G=1 3.43, G=2 2.30, G=4 1.66, G=8 3.32 -> 4; larger
    dims cap at 2 (the per-(sample, head) cached (Np, Np) fp32 prob tiles
    scale with G*heads and spill VMEM). The result is additionally clamped
    by a VMEM working-set estimate (_clamp_group) for shapes beyond the
    measured set.

    ``n``: per-sample window length when known. SHORT windows (MS-SiT's
    folded N=64, scripts/exp_mssit_group_sweep.py) want much larger groups
    than the N=328 defaults — per-sample working sets are ~5x smaller and
    the per-program GEMM M would otherwise sit far below the MXU tile:
    fwd ms/block at the ico-6 shapes (G=None -> with the N-aware pick) —
      dim  96 (s0): 4.99 -> 4.75 (G=16)     dim 384 (s2): 1.41 -> 1.17 (G=16)
      dim 192 (s1): 2.43 -> 2.43 (G=None)   dim 768 (s3): 0.84 -> 0.63 (G=32)
    backward: dim 768 4.14 -> 3.68 (G=32), dim <= 192 keep 8/4."""
    if n is not None and n <= 64:
        if bwd:
            if dim > 512:
                return 32
            return 16 if 96 < dim <= 256 else 8
        if dim > 512:
            return 32
        if dim > 256:
            return 16
        return 16 if dim <= 96 else 8
    if bwd:
        return 4 if dim <= 256 else 2
    return 2 if 256 < dim <= 512 else 8


def _clamp_group(G: int, N: int, dim: int, mlp: int, hd3: int,
                 heads: int = 0, bwd: bool = False) -> int:
    """Halve G until the estimated per-program working set fits the budget.
    Forward: the fp32 (G*N, mlp) MLP intermediate dominates, plus the
    x/h/qkv/x1/h2 tiles. Backward adds the cached per-(sample, head)
    (N, N) fp32 probability tiles and the fp32 gradient tiles."""
    per = N * (mlp * 4 + hd3 * 2 + dim * 12)
    if bwd:
        per += heads * N * N * 8 + N * (mlp * 4 + dim * 12)
    while G > 1 and G * per > _GROUP_VMEM_BUDGET:
        G //= 2
    return G


def _clamp_group_cls(G: int, N: int, dim: int, hd3: int,
                     heads: int = 0, rows: int = 8, bwd: bool = False) -> int:
    """cls-block variant of _clamp_group: the MLP and Q/out-proj stages run
    at M = G*rows (negligible), so the estimate keeps only the full-length
    terms — x/h/kv tiles, and for the backward the (G*N, dim)/(G*N, 2hd)
    fp32 gradient tiles plus the (rows, N) per-(sample, head) prob cache."""
    per = N * (dim * 12 + hd3 * 2)
    if bwd:
        per += N * (dim * 4 + hd3 * 2) + heads * rows * N * 8
    while G > 1 and G * per > _GROUP_VMEM_BUDGET:
        G //= 2
    return G


def _fit_group(G: int, B: int) -> int:
    """Largest power-of-two divisor of B that is <= G."""
    while G > 1 and B % G:
        G //= 2
    return G


def _block_kernel(
    x_ref,
    ln1_s_ref, ln1_b_ref, wqkv_ref,
    wout_ref, bout_ref,
    ln2_s_ref, ln2_b_ref,
    wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    o_ref,
    *opt_x1_ref,
    heads, dim_head, valid_len, group, ln_eps, fast_softmax,
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

    # FLATTEN the G samples into the GEMM M dimension: LN/QKV/out-proj/MLP
    # (~75% of block FLOPs) run once at M = G*Np instead of G times at
    # M = Np — bit-identical, measured 0.98 -> 0.90 ms/block at G=8 on
    # SiT-tiny B=256 (v5e). Only attention stays per sample.
    x = x_ref[...].reshape(group * np_, dim)
    h = _layer_norm(x, ln1_s, ln1_b, ln_eps).astype(x.dtype)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (G*Np, 3*hd), [q|k|v] lanes

    attn_rows = []
    # NOTE (r5, negative result worth keeping): batching all heads of a
    # sample into one score GEMM + one PV GEMM against BLOCK-DIAGONAL K/V
    # wins 1.4-2.1x when the attention runs as a standalone kernel at the
    # MS-SiT folded shapes (N=64), but LOSES 10-110% inside this fused
    # block at every stage (s0 4.75 -> 5.34, s3 0.63 -> 1.34 ms/block on
    # chip) — Mosaic already overlaps the per-(g, h) loop with the
    # surrounding GEMMs, and the (Np, heads*Np) buffers break that
    # schedule. The per-head loop stays.
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
    attn = jnp.concatenate(attn_rows, axis=0)  # (G*Np, hd)
    attn = (
        jax.lax.dot_general(
            attn, wout_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout_ref[0].astype(jnp.float32)
    )
    x1 = (x.astype(jnp.float32) + attn).astype(x.dtype)

    h2 = _layer_norm(x1, ln2_s, ln2_b, ln_eps).astype(x.dtype)
    f = (
        jax.lax.dot_general(
            h2, wfc1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bfc1_ref[0].astype(jnp.float32)
    )
    # tanh-approx GELU in fp32: this Mosaic lowers neither erf nor erfc;
    # the tanh form deviates from exact-erf GELU by < 3e-4 absolute,
    # below bf16 resolution (~8e-3), so bf16 outputs are unchanged
    c = 0.7978845608028654  # sqrt(2/pi)
    f = (0.5 * f * (1.0 + jnp.tanh(c * (f + 0.044715 * f * f * f)))).astype(
        x.dtype
    )
    f = (
        jax.lax.dot_general(
            f, wfc2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bfc2_ref[0].astype(jnp.float32)
    )
    o_ref[...] = (x1.astype(jnp.float32) + f).astype(o_ref.dtype).reshape(
        group, np_, dim
    )
    if opt_x1_ref:
        # split-backward support: save the attention-branch residual so the
        # MLP-grad kernel needn't recompute the whole attention forward
        opt_x1_ref[0][...] = x1.reshape(group, np_, dim)


def fused_block(
    x: jax.Array,
    ln1_scale, ln1_bias, w_qkv,
    w_out, b_out,
    ln2_scale, ln2_bias,
    w_fc1, b_fc1, w_fc2, b_fc2,
    *,
    heads: int,
    dim_head: int,
    valid_len: int | None = None,
    ln_eps: float = 1e-5,  # torch nn.LayerNorm default (reference parity)
    group: int | None = None,
    fast_softmax: bool = True,
    save_x1: bool = False,
) -> jax.Array:
    """One transformer block. x: (B, N, dim), N % 8 == 0. Weights in flax
    layout (kernels (in, out)). No autodiff — use ``fused_block_train`` for
    the VJP-carrying variant. ``group`` samples flatten into one GEMM per
    program (None -> measured per-dim default, see _auto_group).
    ``save_x1=True`` returns (out, x1) — x1 is the attention-branch
    residual the split backward consumes (see _block_bwd_split)."""
    B, N, dim = x.shape
    if N % 8 != 0:
        raise NotImplementedError("fused_block requires N % 8 == 0")
    vl = N if valid_len is None else int(valid_len)
    # an EXPLICIT group is budget-clamped too (ADVICE r2): a caller-chosen
    # large G on a big shape must degrade to a smaller G, not fail Mosaic
    # compilation against vmem_limit_bytes
    G = _fit_group(_clamp_group(
        group or _auto_group(dim, n=N), N, dim, w_fc1.shape[1], w_qkv.shape[1]
    ), B)

    def vec(v):  # 1-D params as (1, dim) VMEM rows
        return v.reshape(1, -1)

    blk_x = pl.BlockSpec((G, N, dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda b: tuple([0] * w.ndim),
                            memory_space=pltpu.VMEM)

    args = [
        vec(ln1_scale), vec(ln1_bias), w_qkv,
        w_out, vec(b_out),
        vec(ln2_scale), vec(ln2_bias),
        w_fc1, vec(b_fc1), w_fc2, vec(b_fc2),
    ]
    out_shape = jax.ShapeDtypeStruct((B, N, dim), x.dtype)
    return pl.pallas_call(
        functools.partial(
            _block_kernel, heads=heads, dim_head=dim_head, valid_len=vl,
            group=G, ln_eps=ln_eps, fast_softmax=fast_softmax,
        ),
        out_shape=(out_shape, out_shape) if save_x1 else out_shape,
        grid=(B // G,),
        in_specs=[blk_x] + [wspec(a) for a in args],
        out_specs=(blk_x, blk_x) if save_x1 else blk_x,
        interpret=jax.default_backend() != "tpu",
        # the default 16M scoped-vmem budget throttles Mosaic's scheduling;
        # raising it measurably speeds the backward and gives headroom here
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(x, *args)


# -- training variant: custom-VJP fused block ---------------------------------
#
# Forward = the inference megakernel (residuals: just the block input x).
# Backward = ONE kernel per block computing dx and ALL 11 weight gradients,
# recomputing activations from x flash-attention style. Weight-gradient
# outputs use constant index_maps, so their blocks persist in VMEM across the
# batch-tile grid and accumulate with an init-on-first-program pattern.
# The in-kernel GELU is the tanh form (fwd and bwd consistently); everything
# else matches the modular bf16 training path.


def _ln_fwd_cache(x, scale, bias, eps):
    h = x.astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = (h - mu) * rstd
    return n * scale + bias, n, rstd


def _ln_bwd(dy, n, rstd, scale):
    """dy: grad wrt the post-affine LN output. Returns (dx, dscale, dbias)
    with the param grads already summed over rows."""
    dn = dy * scale
    dx = (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - n * jnp.mean(dn * n, axis=-1, keepdims=True)
    ) * rstd
    return dx, jnp.sum(dy * n, axis=0, keepdims=True), jnp.sum(dy, axis=0, keepdims=True)


def _gelu_tanh_and_grad(f):
    c = 0.7978845608028654  # sqrt(2/pi)
    u = c * (f + 0.044715 * f * f * f)
    t = jnp.tanh(u)
    gl = 0.5 * f * (1.0 + t)
    dgl = 0.5 * (1.0 + t) + 0.5 * f * (1.0 - t * t) * c * (
        1.0 + 3 * 0.044715 * f * f
    )
    return gl, dgl


def _mm(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), preferred_element_type=jnp.float32
    )


def _block_bwd_kernel(
    x_ref, g_ref,
    ln1_s_ref, ln1_b_ref, wqkv_ref, wout_ref, bout_ref,
    ln2_s_ref, ln2_b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
    dx_ref,
    dln1_s_ref, dln1_b_ref, dwqkv_ref, dwout_ref, dbout_ref,
    dln2_s_ref, dln2_b_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref,
    *, heads, dim_head, valid_len, ln_eps, group, fast_softmax, cache_probs,
):
    first = pl.program_id(0) == 0
    np_ = x_ref.shape[1]
    dim = x_ref.shape[2]
    hd = heads * dim_head
    scale = dim_head ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)

    ln1_s = ln1_s_ref[0].astype(jnp.float32)
    ln1_b = ln1_b_ref[0].astype(jnp.float32)
    ln2_s = ln2_s_ref[0].astype(jnp.float32)
    ln2_b = ln2_b_ref[0].astype(jnp.float32)

    # FLATTENED over the G samples (see _block_kernel): every GEMM —
    # recompute QKV/out-proj/MLP and ALL weight-gradient contractions —
    # runs once at M = G*Np; attention (and its grads) stay per sample.
    # Weight grads come out already summed over the G samples.
    x = x_ref[...].reshape(group * np_, dim)
    g = g_ref[...].reshape(group * np_, dim).astype(jnp.float32)

    # ---- forward recompute: attention branch to x1 ----
    # ``cache_probs``: keep the per-(sample, head) normalized probabilities
    # (fp32 (Np, Np) tiles) live across the MLP section for the gradient
    # loop — cheapest at small G. At larger G those long-lived tiles are
    # what spills VMEM, so the gradient loop instead RECOMPUTES scores +
    # softmax per (sample, head) (flash-attention style): +1 scores GEMM
    # and exp per head, but the live set during both loops stays tiny.
    h1f, n1, rstd1 = _ln_fwd_cache(x, ln1_s, ln1_b, ln_eps)
    h1 = h1f.astype(x.dtype)
    qkv = _mm(h1, wqkv_ref[:]).astype(x.dtype)  # (G*Np, 3*hd)

    def attn_probs(qkv_g, hh):
        q = qkv_g[:, hh * dim_head:(hh + 1) * dim_head]
        k = qkv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
        s = _mm(q, k, ((1,), (1,))) * scale
        s = jnp.where(col < valid_len, s, _NEG_INF)
        p, l = _softmax_rows(s, fast_softmax)
        ok = (s <= _CLAMP) if fast_softmax else None
        return p / l, ok

    att_rows, pn_parts, ok_parts = [], [], []
    for g_i in range(group):
        qkv_g = qkv[g_i * np_:(g_i + 1) * np_]
        att_parts = []
        for hh in range(heads):
            v = qkv_g[:, 2 * hd + hh * dim_head:2 * hd + (hh + 1) * dim_head]
            pn, ok = attn_probs(qkv_g, hh)
            if cache_probs == "compact":
                # one x.dtype tile per (sample, head): probs with the clamp
                # indicator folded into the SIGN bit (pn >= 0 always, so
                # sign(cached) == ok; pn == 0 rows decode ok=True, where ds
                # is 0 anyway). Quarter the fp32+mask cache footprint.
                enc = pn if ok is None else jnp.where(ok, pn, -pn)
                pn_parts.append(enc.astype(x.dtype))
                ok_parts.append(None)
            elif cache_probs:
                pn_parts.append(pn)
                # where the overflow clamp binds, d(exp(min(s,C)))/ds = 0
                ok_parts.append(ok)
            att_parts.append(_mm(pn.astype(v.dtype), v).astype(x.dtype))
        att_rows.append(jnp.concatenate(att_parts, axis=-1))
    a = jnp.concatenate(att_rows, axis=0)  # (G*Np, hd) bf16
    o1 = _mm(a, wout_ref[:]) + bout_ref[0].astype(jnp.float32)
    x1 = (x.astype(jnp.float32) + o1).astype(x.dtype)

    # ---- MLP branch: forward recompute + backward ----
    h2f, n2, rstd2 = _ln_fwd_cache(x1, ln2_s, ln2_b, ln_eps)
    h2 = h2f.astype(x.dtype)
    f1 = _mm(h2, wfc1_ref[:]) + bfc1_ref[0].astype(jnp.float32)
    gl, dgl_df1 = _gelu_tanh_and_grad(f1)
    glb = gl.astype(x.dtype)
    gb = g.astype(x.dtype)

    dwfc2 = _mm(glb, gb, ((0,), (0,)))  # (mlp, dim)
    dbfc2 = jnp.sum(g, axis=0, keepdims=True)
    dgl = _mm(gb, wfc2_ref[:], ((1,), (1,)))  # (G*Np, mlp) f32
    df1 = dgl * dgl_df1
    df1b = df1.astype(x.dtype)
    dwfc1 = _mm(h2, df1b, ((0,), (0,)))  # (dim, mlp)
    dbfc1 = jnp.sum(df1, axis=0, keepdims=True)
    dh2 = _mm(df1b, wfc1_ref[:], ((1,), (1,)))  # (G*Np, dim) f32
    dx1_ln, dln2_s, dln2_b = _ln_bwd(dh2, n2, rstd2, ln2_s)
    dx1 = g + dx1_ln  # (G*Np, dim) f32

    # ---- attention branch backward ----
    dx1b = dx1.astype(x.dtype)
    dbout = jnp.sum(dx1, axis=0, keepdims=True)
    dwout = _mm(a, dx1b, ((0,), (0,)))  # (hd, dim)
    da = _mm(dx1b, wout_ref[:], ((1,), (1,))).astype(x.dtype)  # (G*Np, hd)

    dqkv_rows = []
    for g_i in range(group):
        qkv_g = qkv[g_i * np_:(g_i + 1) * np_]
        da_g = da[g_i * np_:(g_i + 1) * np_]
        dq_parts, dk_parts, dv_parts = [], [], []
        for hh in range(heads):
            q = qkv_g[:, hh * dim_head:(hh + 1) * dim_head]
            k = qkv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
            v = qkv_g[:, 2 * hd + hh * dim_head:2 * hd + (hh + 1) * dim_head]
            da_h = da_g[:, hh * dim_head:(hh + 1) * dim_head]
            if cache_probs == "compact":
                enc = pn_parts[g_i * heads + hh].astype(jnp.float32)
                pn = jnp.abs(enc)
                ok = enc >= 0.0 if fast_softmax else None
            elif cache_probs:
                pn, ok = pn_parts[g_i * heads + hh], ok_parts[g_i * heads + hh]
            else:
                pn, ok = attn_probs(qkv_g, hh)
            # zero padding ROWS so their cotangents don't leak into the
            # weight grads
            p = jnp.where(row < valid_len, pn, 0.0)
            pb = p.astype(x.dtype)
            dv_parts.append(_mm(pb, da_h, ((0,), (0,))).astype(x.dtype))
            dp = _mm(da_h, v, ((1,), (1,)))  # (Np, Np) f32
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            if ok is not None:
                ds = jnp.where(ok, ds, 0.0)
            ds = ds.astype(x.dtype)
            dq_parts.append(_mm(ds, k).astype(x.dtype))
            dk_parts.append(_mm(ds, q, ((0,), (0,))).astype(x.dtype))
        dqkv_rows.append(
            jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
        )
    dqkv = jnp.concatenate(dqkv_rows, axis=0)  # (G*Np, 3hd)

    dwqkv = _mm(h1, dqkv, ((0,), (0,)))  # (dim, 3hd)
    dh1 = _mm(dqkv, wqkv_ref[:], ((1,), (1,)))  # (G*Np, dim) f32
    dx_ln, dln1_s, dln1_b = _ln_bwd(dh1, n1, rstd1, ln1_s)
    dx_ref[...] = (dx1 + dx_ln).astype(dx_ref.dtype).reshape(group, np_, dim)

    grads = (dln1_s, dln1_b, dwqkv, dwout, dbout,
             dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2)

    # ---- weight-grad accumulation across the batch-tile grid ----
    out_refs = (dln1_s_ref, dln1_b_ref, dwqkv_ref, dwout_ref, dbout_ref,
                dln2_s_ref, dln2_b_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref,
                dbfc2_ref)

    @pl.when(first)
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] += val


def _block_bwd(x, g, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
               ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
               *, heads, dim_head, valid_len, ln_eps, group: int | None = None,
               fast_softmax: bool = True, cache_probs: bool | None = None):
    """Single-kernel block backward with the G samples FLATTENED into every
    GEMM's M dimension (per-sample grouping was neutral; flattened grouping
    is a real win — 2.61 -> 1.66 ms/block at G=4, SiT-tiny B=256 v5e).

    ``cache_probs=True`` keeps the (Np, Np) fp32 probability tiles from the
    forward recompute live for the gradient loop; their G*heads working set
    is what used to cap G at 4. ``False`` recomputes scores+softmax in the
    gradient loop instead (one extra scores GEMM per head; measured SLOWER —
    4.26 vs 1.85 ms at G=4 on v5e). ``"compact"`` caches in x.dtype with the
    clamp indicator folded into the sign bit (quarter footprint for bf16
    inputs, bitwise-identical grads for fp32 inputs). ``None`` -> policy
    (module overrides _BWD_GROUP/_BWD_CACHE exist for epoch-level sweeps)."""
    B, N, dim = x.shape
    mlp = w_fc1.shape[1]
    hd = heads * dim_head
    if cache_probs is None:
        cache_probs = True if _BWD_CACHE is None else _BWD_CACHE
    if group is None:
        group = _BWD_GROUP
    # explicit group (incl. the _BWD_GROUP sweep override) is budget-clamped
    # like the forward (ADVICE r2)
    G = _fit_group(_clamp_group(
        group or _auto_group(dim, bwd=True, n=N), N, dim, mlp, 3 * hd,
        heads=heads, bwd=True,
    ), B)

    def vec(v):
        return v.reshape(1, -1)

    blk_x = pl.BlockSpec((G, N, dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    in_arrays = [
        x, g,
        vec(ln1_scale), vec(ln1_bias), w_qkv, w_out, vec(b_out),
        vec(ln2_scale), vec(ln2_bias), w_fc1, vec(b_fc1), w_fc2,
    ]
    in_specs = [blk_x, blk_x] + [wspec(a.shape) for a in in_arrays[2:]]
    out_shapes = (
        jax.ShapeDtypeStruct((B, N, dim), x.dtype),        # dx
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln1_s
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln1_b
        jax.ShapeDtypeStruct((dim, 3 * hd), jnp.float32),  # dwqkv
        jax.ShapeDtypeStruct((hd, dim), jnp.float32),      # dwout
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dbout
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln2_s
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln2_b
        jax.ShapeDtypeStruct((dim, mlp), jnp.float32),     # dwfc1
        jax.ShapeDtypeStruct((1, mlp), jnp.float32),       # dbfc1
        jax.ShapeDtypeStruct((mlp, dim), jnp.float32),     # dwfc2
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dbfc2
    )
    out_specs = (blk_x,) + tuple(wspec(o.shape) for o in out_shapes[1:])
    return pl.pallas_call(
        functools.partial(
            _block_bwd_kernel, heads=heads, dim_head=dim_head,
            valid_len=valid_len, ln_eps=ln_eps, group=G,
            fast_softmax=fast_softmax, cache_probs=cache_probs,
        ),
        out_shape=out_shapes,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=jax.default_backend() != "tpu",
        # G>1 temporaries exceed the default 16M scoped-vmem budget; the
        # weight-grad accumulators + per-sample (N,N) fp32 score tensors are
        # still far under physical VMEM (128M on v5e)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(*in_arrays)


# -- split backward: MLP-grad kernel + attention-grad kernel ------------------
#
# The single-kernel backward holds ALL weight-grad accumulators (fp32 dwqkv +
# dwout + dwfc1 + dwfc2 = 4·dim·(3hd+..)/..) live across the grid; at dim >=
# 768 that live set plus the recompute working set exceeds what Mosaic can
# register-allocate (_bwd_kernel_feasible). The split halves the problem:
# kernel M consumes the attention-branch residual x1 (saved by the forward,
# one extra bf16 HBM write) and produces the MLP grads + dx1; kernel A
# consumes (x, dx1) and produces the attention grads + dx. Each kernel's
# accumulators are those of ONE branch, and neither holds the other branch's
# working set, so shapes the monolithic kernel rejects still run fused
# instead of falling back to XLA-with-flash-attention (~10 intermediate HBM
# round trips per block). Total GEMM FLOPs are identical to the monolithic
# kernel; the extra cost is the x1 save and the dx1 HBM round trip between
# the kernels (2·(B,N,dim) bf16, same precision as the XLA fallback's
# intermediate cotangents).


def _mlp_bwd_kernel(
    x1_ref, g_ref,
    ln2_s_ref, ln2_b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
    dx1_ref,
    dln2_s_ref, dln2_b_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref,
    *, group, ln_eps,
):
    first = pl.program_id(0) == 0
    np_ = x1_ref.shape[1]
    dim = x1_ref.shape[2]
    ln2_s = ln2_s_ref[0].astype(jnp.float32)
    ln2_b = ln2_b_ref[0].astype(jnp.float32)

    x1 = x1_ref[...].reshape(group * np_, dim)
    g = g_ref[...].reshape(group * np_, dim).astype(jnp.float32)

    # forward recompute of the MLP branch from the saved x1 (identical math
    # to _block_bwd_kernel's MLP section)
    h2f, n2, rstd2 = _ln_fwd_cache(x1, ln2_s, ln2_b, ln_eps)
    h2 = h2f.astype(x1.dtype)
    f1 = _mm(h2, wfc1_ref[:]) + bfc1_ref[0].astype(jnp.float32)
    gl, dgl_df1 = _gelu_tanh_and_grad(f1)
    glb = gl.astype(x1.dtype)
    gb = g.astype(x1.dtype)

    dwfc2 = _mm(glb, gb, ((0,), (0,)))  # (mlp, dim)
    dbfc2 = jnp.sum(g, axis=0, keepdims=True)
    dgl = _mm(gb, wfc2_ref[:], ((1,), (1,)))  # (G*Np, mlp) f32
    df1 = dgl * dgl_df1
    df1b = df1.astype(x1.dtype)
    dwfc1 = _mm(h2, df1b, ((0,), (0,)))  # (dim, mlp)
    dbfc1 = jnp.sum(df1, axis=0, keepdims=True)
    dh2 = _mm(df1b, wfc1_ref[:], ((1,), (1,)))  # (G*Np, dim) f32
    dx1_ln, dln2_s, dln2_b = _ln_bwd(dh2, n2, rstd2, ln2_s)
    dx1 = g + dx1_ln
    dx1_ref[...] = dx1.astype(dx1_ref.dtype).reshape(group, np_, dim)

    grads = (dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2)
    out_refs = (dln2_s_ref, dln2_b_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref,
                dbfc2_ref)

    @pl.when(first)
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] += val


def _mlp_bwd_kernel_chunked(
    x1_ref, g_ref,
    ln2_s_ref, ln2_b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
    dh2_ref,
    dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref,
    *, group, ln_eps, n_chunks,
):
    """MLP-grad kernel with the mlp (hidden) dimension CHUNKED over a second
    grid axis, for dims whose full (dim, mlp) fp32 accumulators don't fit
    VMEM (dim 1024/mlp 4096: ~34M accums + working set > the 40M bound).
    Each program recomputes LN2 (cheap, dim-wide) and its mlp slice of
    f1/GELU, producing that slice's dwfc1/dbfc1/dwfc2 and a PARTIAL dh2.
    dh2 accumulates across the chunk axis (fp32, exact); the LN2 backward
    and the residual add run OUTSIDE in XLA (see _block_bwd_split) because
    they mix across the full dim. dbfc2 = sum(g) is chunk-invariant and
    written once at c == 0."""
    first_b = pl.program_id(0) == 0
    first_c = pl.program_id(1) == 0
    np_ = x1_ref.shape[1]
    dim = x1_ref.shape[2]
    ln2_s = ln2_s_ref[0].astype(jnp.float32)
    ln2_b = ln2_b_ref[0].astype(jnp.float32)

    x1 = x1_ref[...].reshape(group * np_, dim)
    g = g_ref[...].reshape(group * np_, dim).astype(jnp.float32)

    h2f, _, _ = _ln_fwd_cache(x1, ln2_s, ln2_b, ln_eps)
    h2 = h2f.astype(x1.dtype)
    f1 = _mm(h2, wfc1_ref[:]) + bfc1_ref[0].astype(jnp.float32)
    gl, dgl_df1 = _gelu_tanh_and_grad(f1)
    glb = gl.astype(x1.dtype)
    gb = g.astype(x1.dtype)

    dwfc2 = _mm(glb, gb, ((0,), (0,)))  # (mc, dim)
    dgl = _mm(gb, wfc2_ref[:], ((1,), (1,)))  # (G*Np, mc) f32
    df1 = dgl * dgl_df1
    df1b = df1.astype(x1.dtype)
    dwfc1 = _mm(h2, df1b, ((0,), (0,)))  # (dim, mc)
    dbfc1 = jnp.sum(df1, axis=0, keepdims=True)
    dh2_part = _mm(df1b, wfc1_ref[:], ((1,), (1,)))  # (G*Np, dim) f32

    @pl.when(first_c)
    def _():
        dh2_ref[...] = dh2_part.reshape(group, np_, dim)

    @pl.when(jnp.logical_not(first_c))
    def _():
        dh2_ref[...] += dh2_part.reshape(group, np_, dim)

    @pl.when(jnp.logical_and(first_b, first_c))
    def _():
        dbfc2_ref[:] = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(jnp.logical_not(first_b), first_c))
    def _():
        dbfc2_ref[:] += jnp.sum(g, axis=0, keepdims=True)

    @pl.when(first_b)
    def _():
        dwfc1_ref[:] = dwfc1
        dbfc1_ref[:] = dbfc1
        dwfc2_ref[:] = dwfc2

    @pl.when(jnp.logical_not(first_b))
    def _():
        dwfc1_ref[:] += dwfc1
        dbfc1_ref[:] += dbfc1
        dwfc2_ref[:] += dwfc2


def _attn_bwd_kernel(
    x_ref, dx1_ref,
    ln1_s_ref, ln1_b_ref, wqkv_ref, wout_ref,
    dx_ref,
    dln1_s_ref, dln1_b_ref, dwqkv_ref, dwout_ref, dbout_ref,
    *, heads, dim_head, valid_len, ln_eps, group, fast_softmax,
):
    first = pl.program_id(0) == 0
    np_ = x_ref.shape[1]
    dim = x_ref.shape[2]
    hd = heads * dim_head
    scale = dim_head ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    ln1_s = ln1_s_ref[0].astype(jnp.float32)
    ln1_b = ln1_b_ref[0].astype(jnp.float32)

    x = x_ref[...].reshape(group * np_, dim)
    dx1 = dx1_ref[...].reshape(group * np_, dim).astype(jnp.float32)

    # attention-branch forward recompute (identical math to
    # _block_bwd_kernel); probs recomputed per (sample, head) in the grad
    # loop — with the MLP section gone the two loops are adjacent, so the
    # recompute form's small live set wins over caching at these dims
    h1f, n1, rstd1 = _ln_fwd_cache(x, ln1_s, ln1_b, ln_eps)
    h1 = h1f.astype(x.dtype)
    qkv = _mm(h1, wqkv_ref[:]).astype(x.dtype)  # (G*Np, 3*hd)

    def attn_probs(qkv_g, hh):
        q = qkv_g[:, hh * dim_head:(hh + 1) * dim_head]
        k = qkv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
        s = _mm(q, k, ((1,), (1,))) * scale
        s = jnp.where(col < valid_len, s, _NEG_INF)
        p, l = _softmax_rows(s, fast_softmax)
        ok = (s <= _CLAMP) if fast_softmax else None
        return p / l, ok

    att_rows = []
    for g_i in range(group):
        qkv_g = qkv[g_i * np_:(g_i + 1) * np_]
        att_parts = []
        for hh in range(heads):
            v = qkv_g[:, 2 * hd + hh * dim_head:2 * hd + (hh + 1) * dim_head]
            pn, _ = attn_probs(qkv_g, hh)
            att_parts.append(_mm(pn.astype(v.dtype), v).astype(x.dtype))
        att_rows.append(jnp.concatenate(att_parts, axis=-1))
    a = jnp.concatenate(att_rows, axis=0)  # (G*Np, hd)

    dx1b = dx1.astype(x.dtype)
    dbout = jnp.sum(dx1, axis=0, keepdims=True)
    dwout = _mm(a, dx1b, ((0,), (0,)))  # (hd, dim)
    da = _mm(dx1b, wout_ref[:], ((1,), (1,))).astype(x.dtype)  # (G*Np, hd)

    dqkv_rows = []
    for g_i in range(group):
        qkv_g = qkv[g_i * np_:(g_i + 1) * np_]
        da_g = da[g_i * np_:(g_i + 1) * np_]
        dq_parts, dk_parts, dv_parts = [], [], []
        for hh in range(heads):
            q = qkv_g[:, hh * dim_head:(hh + 1) * dim_head]
            k = qkv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
            v = qkv_g[:, 2 * hd + hh * dim_head:2 * hd + (hh + 1) * dim_head]
            da_h = da_g[:, hh * dim_head:(hh + 1) * dim_head]
            pn, ok = attn_probs(qkv_g, hh)
            p = jnp.where(row < valid_len, pn, 0.0)  # zero padding rows
            pb = p.astype(x.dtype)
            dv_parts.append(_mm(pb, da_h, ((0,), (0,))).astype(x.dtype))
            dp = _mm(da_h, v, ((1,), (1,)))  # (Np, Np) f32
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            if ok is not None:
                ds = jnp.where(ok, ds, 0.0)
            ds = ds.astype(x.dtype)
            dq_parts.append(_mm(ds, k).astype(x.dtype))
            dk_parts.append(_mm(ds, q, ((0,), (0,))).astype(x.dtype))
        dqkv_rows.append(
            jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
        )
    dqkv = jnp.concatenate(dqkv_rows, axis=0)  # (G*Np, 3hd)

    dwqkv = _mm(h1, dqkv, ((0,), (0,)))  # (dim, 3hd)
    dh1 = _mm(dqkv, wqkv_ref[:], ((1,), (1,)))  # (G*Np, dim) f32
    dx_ln, dln1_s, dln1_b = _ln_bwd(dh1, n1, rstd1, ln1_s)
    dx_ref[...] = (dx1 + dx_ln).astype(dx_ref.dtype).reshape(group, np_, dim)

    grads = (dln1_s, dln1_b, dwqkv, dwout, dbout)
    out_refs = (dln1_s_ref, dln1_b_ref, dwqkv_ref, dwout_ref, dbout_ref)

    @pl.when(first)
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] += val


def _split_groups(N: int, dim: int, mlp: int, hd: int, heads: int,
                  B: int) -> tuple[int, int]:
    """(G_mlp, G_attn) for the split backward: start from the backward
    default and clamp each kernel against ITS OWN accumulator + working
    set (each holds one branch only)."""
    g0 = _auto_group(dim, bwd=True, n=N)
    per_m = N * (mlp * 12 + dim * 16)  # h2/f1/gl/dgl/df1 (f32) + x1/g tiles
    acc_m = 2 * dim * mlp * 4
    gm = g0
    while gm > 1 and gm * per_m + acc_m > _GROUP_VMEM_BUDGET:
        gm //= 2
    # prob/score live set: Mosaic keeps ~4 (N, N) fp32 temporaries PER
    # UNROLLED HEAD iteration alive (measured: heads=24, N=320, G=2 needed
    # 98.7M on chip — 44.6M/group ≈ 8.4M row tiles + 24 x 1.5M/head; the
    # old 2-buffer coefficient under-read it as 65.5M and OOM'd the 96M
    # scoped-vmem cap). 16 B/elem = 4 fp32 buffers keeps SiT-base
    # (heads=12, N=328) at its measured-optimal G=2 (67.8M est <= 72M) and
    # clamps head-heavy shapes (MS-SiT stage 3: heads=24, dh=32) to G=1.
    per_a = N * (hd * 3 * 6 + dim * 16) + heads * N * N * 16
    acc_a = (dim * 3 * hd + hd * dim) * 4
    ga = g0
    while ga > 1 and ga * per_a + acc_a > _GROUP_VMEM_BUDGET:
        ga //= 2
    return _fit_group(gm, B), _fit_group(ga, B)


def _mlp_chunks(N: int, dim: int, mlp: int) -> int:
    """Smallest power-of-two chunking of the mlp dimension whose per-chunk
    MLP-grad working set + accumulators fit the per-kernel bound (0 when
    the UNCHUNKED kernel fits; chunking pays an LN2 recompute per chunk
    and moves the LN2 backward to XLA, so it's reserved for dims the plain
    kernel rejects — validated on chip at dim 1024/mlp 4096 -> C=2)."""
    bound = 40 * 1024 * 1024
    if N * (mlp * 12 + dim * 16) + 2 * dim * mlp * 4 <= bound:
        return 0
    c = 2
    while c < mlp:
        mc = mlp // c
        if (N * (mc * 12 + dim * 20) + 2 * dim * mc * 4 + dim * 4 <= bound
                and mlp % c == 0):
            return c
        c *= 2
    return 0


def _prefer_split(dim: int) -> bool:
    """Use the split backward even where the monolithic kernel fits:
    epoch-level A/B on chip (3 repeats, same session) — dim 384: mono
    1,942 vs split 2,215 surf/s (+14%); dim 512: 1,271 vs 1,350 (+6%);
    dim 192: 5,632 vs 5,600 (mono, within noise). The split's two light
    kernels schedule better than one kernel holding both branches' working
    sets once the prob cache + accumulators grow past tiny dims."""
    return dim > 256


def _split_bwd_feasible(N: int, dim: int, mlp: int, hd: int,
                        heads: int) -> bool:
    """Can each split kernel run? MLP side: the unchunked kernel fits the
    40M per-kernel bound, or an mlp-chunked grid does (_mlp_chunks).
    Attention side: the G=1 working set under the HEADS-AWARE live-set
    model from _split_groups (Mosaic keeps ~4 (N, N) fp32 temporaries per
    unrolled head iteration — measured heads=24/N=320 at 44.6M/group)
    plus accumulators must fit the 96M scoped-vmem hard cap (with slack).
    dim 768 (SiT-base): MLP ~35M, attn ~38M est; dim 1024/mlp 4096: MLP
    chunks at C=2 (~28M/chunk), attn ~56M est — both validated on chip."""
    bound = 40 * 1024 * 1024
    mlp_ok = (N * (mlp * 12 + dim * 16) + 2 * dim * mlp * 4 <= bound
              or _mlp_chunks(N, dim, mlp) > 0)
    acc_a = (dim * 3 * hd + hd * dim) * 4
    work_a = N * (hd * 3 * 6 + dim * 16) + heads * N * N * 16
    return mlp_ok and acc_a + work_a <= 88 * 1024 * 1024


def _block_bwd_split(x, x1, g, ln1_scale, ln1_bias, w_qkv, w_out,
                     ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
                     *, heads, dim_head, valid_len, ln_eps,
                     fast_softmax: bool = True):
    """Two-kernel block backward for shapes the monolithic kernel can't
    hold: kernel M (MLP grads + dx1 from the forward-saved x1), then
    kernel A (attention grads + dx). Same math and cast points as
    _block_bwd_kernel; returns the same 12 gradients."""
    B, N, dim = x.shape
    mlp = w_fc1.shape[1]
    hd = heads * dim_head
    gm, ga = _split_groups(N, dim, mlp, hd, heads, B)

    def vec(v):
        return v.reshape(1, -1)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    interp = jax.default_backend() != "tpu"
    params = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

    blk_m = pl.BlockSpec((gm, N, dim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    n_chunks = _mlp_chunks(N, dim, mlp)
    if n_chunks == 0:
        m_in = [x1, g, vec(ln2_scale), vec(ln2_bias), w_fc1, vec(b_fc1),
                w_fc2]
        m_out_shapes = (
            jax.ShapeDtypeStruct((B, N, dim), x.dtype),       # dx1
            jax.ShapeDtypeStruct((1, dim), jnp.float32),      # dln2_s
            jax.ShapeDtypeStruct((1, dim), jnp.float32),      # dln2_b
            jax.ShapeDtypeStruct((dim, mlp), jnp.float32),    # dwfc1
            jax.ShapeDtypeStruct((1, mlp), jnp.float32),      # dbfc1
            jax.ShapeDtypeStruct((mlp, dim), jnp.float32),    # dwfc2
            jax.ShapeDtypeStruct((1, dim), jnp.float32),      # dbfc2
        )
        (dx1, dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2) = pl.pallas_call(
            functools.partial(_mlp_bwd_kernel, group=gm, ln_eps=ln_eps),
            out_shape=m_out_shapes,
            grid=(B // gm,),
            in_specs=[blk_m, blk_m] + [wspec(a.shape) for a in m_in[2:]],
            out_specs=(blk_m,) + tuple(
                wspec(o.shape) for o in m_out_shapes[1:]
            ),
            interpret=interp,
            compiler_params=params,
        )(*m_in)
    else:
        # mlp-chunked variant (dims whose full accumulators don't fit):
        # the kernel emits dh2 (pre-LN2-backward, fp32, accumulated over
        # chunks); LN2 backward + residual add run here in XLA — they mix
        # across the full dim, and three bandwidth-bound passes are cheap
        # next to the GEMMs at these dims
        mc = mlp // n_chunks
        blk_mc = pl.BlockSpec((gm, N, dim), lambda b, c: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        m_in = [x1, g, vec(ln2_scale), vec(ln2_bias), w_fc1, vec(b_fc1),
                w_fc2]
        m_in_specs = [
            blk_mc, blk_mc,
            pl.BlockSpec((1, dim), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, mc), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, dim), lambda b, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ]
        m_out_shapes = (
            jax.ShapeDtypeStruct((B, N, dim), jnp.float32),   # dh2
            jax.ShapeDtypeStruct((dim, mlp), jnp.float32),    # dwfc1
            jax.ShapeDtypeStruct((1, mlp), jnp.float32),      # dbfc1
            jax.ShapeDtypeStruct((mlp, dim), jnp.float32),    # dwfc2
            jax.ShapeDtypeStruct((1, dim), jnp.float32),      # dbfc2
        )
        m_out_specs = (
            pl.BlockSpec((gm, N, dim), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, mc), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, dim), lambda b, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        )
        (dh2, dwfc1, dbfc1, dwfc2, dbfc2) = pl.pallas_call(
            functools.partial(_mlp_bwd_kernel_chunked, group=gm,
                              ln_eps=ln_eps, n_chunks=n_chunks),
            out_shape=m_out_shapes,
            grid=(B // gm, n_chunks),  # chunk axis fastest: dh2 accumulates
            in_specs=m_in_specs,
            out_specs=m_out_specs,
            interpret=interp,
            compiler_params=params,
        )(*m_in)
        x1f = x1.reshape(B * N, dim).astype(jnp.float32)
        mu = jnp.mean(x1f, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x1f - mu), axis=-1, keepdims=True)
        rstd2 = jax.lax.rsqrt(var + ln_eps)
        n2 = (x1f - mu) * rstd2
        gf = g.reshape(B * N, dim).astype(jnp.float32)
        dx1_ln, dln2_s, dln2_b = _ln_bwd(
            dh2.reshape(B * N, dim), n2, rstd2,
            ln2_scale.reshape(-1).astype(jnp.float32),
        )
        dx1 = (gf + dx1_ln).astype(x.dtype).reshape(B, N, dim)
        dln2_s = dln2_s.reshape(1, dim)
        dln2_b = dln2_b.reshape(1, dim)

    blk_a = pl.BlockSpec((ga, N, dim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    a_in = [x, dx1, vec(ln1_scale), vec(ln1_bias), w_qkv, w_out]
    a_out_shapes = (
        jax.ShapeDtypeStruct((B, N, dim), x.dtype),        # dx
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln1_s
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln1_b
        jax.ShapeDtypeStruct((dim, 3 * hd), jnp.float32),  # dwqkv
        jax.ShapeDtypeStruct((hd, dim), jnp.float32),      # dwout
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dbout
    )
    (dx, dln1_s, dln1_b, dwqkv, dwout, dbout) = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, heads=heads, dim_head=dim_head,
            valid_len=valid_len, ln_eps=ln_eps, group=ga,
            fast_softmax=fast_softmax,
        ),
        out_shape=a_out_shapes,
        grid=(B // ga,),
        in_specs=[blk_a, blk_a] + [wspec(a.shape) for a in a_in[2:]],
        out_specs=(blk_a,) + tuple(wspec(o.shape) for o in a_out_shapes[1:]),
        interpret=interp,
        compiler_params=params,
    )(*a_in)

    return (dx, dln1_s, dln1_b, dwqkv, dwout, dbout,
            dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2)


def _xla_block_ref(
    x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
    ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
    *, heads, dim_head, valid_len, ln_eps, fast_softmax=True,
    attn: str = "auto",
):
    """jnp mirror of _block_kernel (same math: fp32 LN, softmax, tanh GELU,
    same cast points). Differentiable by plain autodiff — the structural
    BACKWARD FALLBACK when the single-kernel backward's weight-grad
    accumulators + working set exceed what Mosaic can hold in VMEM (large
    dims; see _bwd_kernel_feasible).

    ``attn``: 'flash' routes attention through the flash kernel (custom
    VJP; keeps the (N, N) probabilities in VMEM both directions — the
    default on TPU, where the fallback actually runs for SiT-base-sized
    blocks); 'einsum' is the pure-XLA GSPMD-partitionable form (CPU tests).
    The flash kernel uses the SHIFTED softmax rather than the megakernel's
    clamped unshifted form; both are exact for in-range scores, so fallback
    gradients agree with the forward to softmax-roundoff."""
    B, N, dim = x.shape
    hd = heads * dim_head
    scale = dim_head ** -0.5
    dt = x.dtype
    if attn == "auto":
        attn = "flash" if jax.default_backend() == "tpu" else "einsum"
    h = _layer_norm(x, ln1_scale.astype(jnp.float32),
                    ln1_bias.astype(jnp.float32), ln_eps).astype(dt)
    qkv = jax.lax.dot_general(
        h, w_qkv, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)

    def heads_t(t):
        return t.reshape(B, N, heads, dim_head).transpose(0, 2, 1, 3)

    q = heads_t(qkv[..., :hd])
    k = heads_t(qkv[..., hd:2 * hd])
    v = heads_t(qkv[..., 2 * hd:])
    if attn == "flash":
        from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
            flash_attention,
        )

        o = flash_attention(q, k, v, valid_len)
        a = o.transpose(0, 2, 1, 3).reshape(B, N, hd).astype(dt)
    else:
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where((jnp.arange(N) < valid_len)[None, None, None, :], s,
                      _NEG_INF)
        if fast_softmax:
            p = jnp.exp(jnp.minimum(s, _CLAMP))
            l = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(dt), v,
                       preferred_element_type=jnp.float32)
        a = (o / l).astype(dt).transpose(0, 2, 1, 3).reshape(B, N, hd)
    attn = jax.lax.dot_general(
        a, w_out, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_out.astype(jnp.float32)
    x1 = (x.astype(jnp.float32) + attn).astype(dt)

    h2 = _layer_norm(x1, ln2_scale.astype(jnp.float32),
                     ln2_bias.astype(jnp.float32), ln_eps).astype(dt)
    f = jax.lax.dot_general(
        h2, w_fc1, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_fc1.astype(jnp.float32)
    c = 0.7978845608028654
    f = (0.5 * f * (1.0 + jnp.tanh(c * (f + 0.044715 * f * f * f)))).astype(dt)
    f = jax.lax.dot_general(
        f, w_fc2, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_fc2.astype(jnp.float32)
    return (x1.astype(jnp.float32) + f).astype(dt)


def _bwd_kernel_feasible(N: int, dim: int, mlp: int, hd: int,
                         heads: int) -> bool:
    """Can the single-kernel backward hold its VMEM-resident weight-grad
    accumulators PLUS a G=1 working set? The accumulators (dwqkv, dwout,
    dwfc1, dwfc2 in fp32) live across the whole grid with constant index
    maps, and Mosaic's register-allocator spill slots amplify the live set —
    measured on chip: dim 512/mlp 2048 (estimate 30M) compiles; dim 768/mlp
    3072 (54M) and dim 1024/mlp 4096 (85M; 183M actual with 115M of spill
    slots) both fail Mosaic compilation. The 40M bound keeps every
    measured-good shape and routes larger ones to the XLA fallback — which
    also un-blocks SiT-base (dim 768) fused training on chip."""
    acc = (dim * 3 * hd + hd * dim + 2 * dim * mlp) * 4
    work = (N * (mlp * 4 + 3 * hd * 2 + dim * 12)
            + heads * N * N * 8 + N * (mlp * 4 + dim * 12))
    return acc + work <= 40 * 1024 * 1024


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15)
)
def fused_block_train(
    x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
    ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
    heads: int, dim_head: int, valid_len: int | None = None,
    ln_eps: float = 1e-5,
):
    """Differentiable fused block: megakernel forward + single-kernel
    backward producing dx and all weight grads. NOTE: GELU is the tanh form
    in BOTH directions (consistent gradient of the computed function), and
    the softmax is the unshifted clamped form in BOTH the forward and the
    backward's recomputation, so they stay bitwise-consistent."""
    return fused_block(
        x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
        ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
        heads=heads, dim_head=dim_head, valid_len=valid_len, ln_eps=ln_eps,
    )


def _fbt_fwd(x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
             ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
             heads, dim_head, valid_len, ln_eps):
    hd = heads * dim_head
    mono = _bwd_kernel_feasible(x.shape[1], x.shape[2], w_fc1.shape[1],
                                hd, heads)
    split = (not mono or _prefer_split(x.shape[2])) and _split_bwd_feasible(
        x.shape[1], x.shape[2], w_fc1.shape[1], hd, heads
    )
    if split:
        out, x1 = fused_block(
            x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
            ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
            heads=heads, dim_head=dim_head, valid_len=valid_len,
            ln_eps=ln_eps, save_x1=True,
        )
    else:
        out = fused_block(
            x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
            ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
            heads=heads, dim_head=dim_head, valid_len=valid_len,
            ln_eps=ln_eps,
        )
        x1 = None
    res = (x, x1, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
           ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2)
    return out, res


def _fbt_bwd(heads, dim_head, valid_len, ln_eps, res, g):
    (x, x1, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
     ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2) = res
    vl = x.shape[1] if valid_len is None else int(valid_len)
    if x1 is not None:
        # split two-kernel backward (forward saved x1 — either the
        # monolithic kernel doesn't fit, or _prefer_split measured faster)
        (dx, dln1_s, dln1_b, dwqkv, dwout, dbout,
         dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2) = _block_bwd_split(
            x, x1, g, ln1_scale, ln1_bias, w_qkv, w_out,
            ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
            heads=heads, dim_head=dim_head, valid_len=vl, ln_eps=ln_eps,
        )

        def like_s(d, ref):
            return d.reshape(ref.shape).astype(ref.dtype)

        return (
            dx,
            like_s(dln1_s, ln1_scale), like_s(dln1_b, ln1_bias),
            like_s(dwqkv, w_qkv), like_s(dwout, w_out),
            like_s(dbout, b_out),
            like_s(dln2_s, ln2_scale), like_s(dln2_b, ln2_bias),
            like_s(dwfc1, w_fc1), like_s(dbfc1, b_fc1),
            like_s(dwfc2, w_fc2), like_s(dbfc2, b_fc2),
        )
    if not _bwd_kernel_feasible(x.shape[1], x.shape[2], w_fc1.shape[1],
                                heads * dim_head, heads):
        # largest-dim fallback: autodiff through the XLA mirror of the block
        _, vjp = jax.vjp(
            functools.partial(
                _xla_block_ref, heads=heads, dim_head=dim_head, valid_len=vl,
                ln_eps=ln_eps,
            ),
            x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
            ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
        )
        return vjp(g)
    (dx, dln1_s, dln1_b, dwqkv, dwout, dbout,
     dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2) = _block_bwd(
        x, g, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
        ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
        heads=heads, dim_head=dim_head, valid_len=vl, ln_eps=ln_eps,
    )

    def like(d, ref):
        return d.reshape(ref.shape).astype(ref.dtype)

    return (
        dx,
        like(dln1_s, ln1_scale), like(dln1_b, ln1_bias),
        like(dwqkv, w_qkv), like(dwout, w_out), like(dbout, b_out),
        like(dln2_s, ln2_scale), like(dln2_b, ln2_bias),
        like(dwfc1, w_fc1), like(dbfc1, b_fc1), like(dwfc2, w_fc2),
        like(dbfc2, b_fc2),
    )


fused_block_train.defvjp(_fbt_fwd, _fbt_bwd)


# -- CLS-pooling final block ---------------------------------------------------
#
# The LAST block's output is only read at row 0 (CLS pooling), so Q, the
# out-projection, and the MLP need just one 8-row sublane tile; K/V still come
# from every row. Costs ~1/7 of a full block (SiT-tiny B=256 on v5e: ~0.15 ms
# vs ~0.98 ms). A whole-encoder megakernel (all 12 blocks in one pallas_call,
# layer-stacked weights + in-kernel fori_loop) was measured SLOWER than the
# per-block pipeline (13.0 vs 12.8 ms/12 blocks): Mosaic already overlaps the
# inter-block activation DMAs with compute across grid steps, and the dynamic
# per-layer weight indexing costs more than the launches save.


def _top_rows(t, group: int, n_block: int, n_take: int):
    """Concatenate the first ``n_take`` rows of each of the ``group``
    flattened sample blocks: (G*n_block, d) -> (G*n_take, d)."""
    return jnp.concatenate(
        [t[g * n_block:g * n_block + n_take] for g in range(group)], axis=0
    )


def _block_cls_kernel(
    x_ref,
    ln1_s_ref, ln1_b_ref, wq_ref, wkv_ref, wout_ref, bout_ref,
    ln2_s_ref, ln2_b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    o_ref,
    *opt_x1_ref,
    heads, dim_head, valid_len, group, ln_eps, fast_softmax,
):
    np_ = x_ref.shape[1]
    dim = x_ref.shape[2]
    rows = o_ref.shape[1]
    hd = heads * dim_head
    scale = dim_head ** -0.5
    col8 = jax.lax.broadcasted_iota(jnp.int32, (rows, np_), 1)
    ln1_s = ln1_s_ref[0].astype(jnp.float32)
    ln1_b = ln1_b_ref[0].astype(jnp.float32)
    ln2_s = ln2_s_ref[0].astype(jnp.float32)
    ln2_b = ln2_b_ref[0].astype(jnp.float32)

    # flattened over the G samples like _block_kernel: LN + the KV GEMM (the
    # dominant cost here) run at M = G*Np; the 8-row Q/out-proj/MLP stages
    # run at M = G*rows
    x = x_ref[...].reshape(group * np_, dim)
    h = _layer_norm(x, ln1_s, ln1_b, ln_eps).astype(x.dtype)
    kv = jax.lax.dot_general(
        h, wkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (G*Np, 2*hd), [k|v] lanes
    h_top = _top_rows(h, group, np_, rows)  # (G*rows, dim)
    q_top = jax.lax.dot_general(
        h_top, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (G*rows, hd)

    attn_rows = []
    for g in range(group):
        kv_g = kv[g * np_:(g + 1) * np_]
        q_g = q_top[g * rows:(g + 1) * rows]
        outs = []
        for hh in range(heads):
            q = q_g[:, hh * dim_head:(hh + 1) * dim_head]
            k = kv_g[:, hh * dim_head:(hh + 1) * dim_head]
            v = kv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (rows, N)
            s = jnp.where(col8 < valid_len, s, _NEG_INF)
            p, l = _softmax_rows(s, fast_softmax)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((o / l).astype(x.dtype))
        attn_rows.append(jnp.concatenate(outs, axis=-1))
    attn = jnp.concatenate(attn_rows, axis=0)  # (G*rows, hd)
    attn = (
        jax.lax.dot_general(
            attn, wout_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout_ref[0].astype(jnp.float32)
    )
    x_top = _top_rows(x, group, np_, rows)
    x1 = (x_top.astype(jnp.float32) + attn).astype(x.dtype)

    h2 = _layer_norm(x1, ln2_s, ln2_b, ln_eps).astype(x.dtype)
    f = (
        jax.lax.dot_general(
            h2, wfc1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bfc1_ref[0].astype(jnp.float32)
    )
    c = 0.7978845608028654
    f = (0.5 * f * (1.0 + jnp.tanh(c * (f + 0.044715 * f * f * f)))).astype(
        x.dtype
    )
    f = jax.lax.dot_general(
        f, wfc2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc2_ref[0].astype(jnp.float32)
    o_ref[...] = (x1.astype(jnp.float32) + f).astype(o_ref.dtype).reshape(
        group, rows, dim
    )
    if opt_x1_ref:
        # split-backward support (see _block_cls_bwd_split)
        opt_x1_ref[0][...] = x1.reshape(group, rows, dim)


def fused_block_cls(
    x: jax.Array,
    ln1_scale, ln1_bias, w_qkv, w_out, b_out,
    ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
    *,
    heads: int,
    dim_head: int,
    valid_len: int | None = None,
    ln_eps: float = 1e-5,
    group: int | None = None,
    fast_softmax: bool = True,
    save_x1: bool = False,
) -> jax.Array:
    """Final transformer block for CLS pooling: returns only the first 8
    output rows (row 0 is the CLS token). x: (B, N, dim), N % 8 == 0.
    Samples flatten into the LN/KV GEMMs like fused_block. ``save_x1=True``
    returns (out, x1) with x1 the 8-row attention-branch residual for the
    split backward."""
    B, N, dim = x.shape
    if N % 8 != 0:
        raise NotImplementedError("fused_block_cls requires N % 8 == 0")
    vl = N if valid_len is None else int(valid_len)
    hd = heads * dim_head
    # explicit group clamped like fused_block (ADVICE r2)
    G = _fit_group(_clamp_group_cls(
        group or _auto_group(dim, n=N), N, dim, 3 * hd
    ), B)

    def vec(v):
        return v.reshape(1, -1)

    blk_x = pl.BlockSpec((G, N, dim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_o = pl.BlockSpec((G, 8, dim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda b: tuple([0] * w.ndim),
                            memory_space=pltpu.VMEM)

    args = [
        vec(ln1_scale), vec(ln1_bias), w_qkv[:, :hd], w_qkv[:, hd:],
        w_out, vec(b_out),
        vec(ln2_scale), vec(ln2_bias),
        w_fc1, vec(b_fc1), w_fc2, vec(b_fc2),
    ]
    out_shape = jax.ShapeDtypeStruct((B, 8, dim), x.dtype)
    return pl.pallas_call(
        functools.partial(
            _block_cls_kernel, heads=heads, dim_head=dim_head, valid_len=vl,
            group=G, ln_eps=ln_eps, fast_softmax=fast_softmax,
        ),
        out_shape=(out_shape, out_shape) if save_x1 else out_shape,
        grid=(B // G,),
        in_specs=[blk_x] + [wspec(a) for a in args],
        out_specs=(blk_o, blk_o) if save_x1 else blk_o,
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(x, *args)


# -- CLS-pooling final block, TRAINING variant ---------------------------------
#
# Training counterpart of fused_block_cls: under CLS pooling the last block's
# output cotangent is nonzero only in the first 8-row tile, so the backward
# recomputes Q/out-proj/MLP on that tile alone; K/V (and their grads, plus
# LN1) still span every row. fwd ~0.15 ms + bwd ~0.5 ms vs ~0.98 + ~3.0 for
# the full block (SiT-tiny B=256, v5e).


def _block_cls_bwd_kernel(
    x_ref, g_ref,
    ln1_s_ref, ln1_b_ref, wq_ref, wkv_ref, wout_ref, bout_ref,
    ln2_s_ref, ln2_b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
    dx_ref,
    dln1_s_ref, dln1_b_ref, dwqkv_ref, dwout_ref, dbout_ref,
    dln2_s_ref, dln2_b_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref,
    *, heads, dim_head, valid_len, ln_eps, group, fast_softmax,
):
    first = pl.program_id(0) == 0
    np_ = x_ref.shape[1]
    dim = x_ref.shape[2]
    rows = g_ref.shape[1]
    hd = heads * dim_head
    scale = dim_head ** -0.5
    col8 = jax.lax.broadcasted_iota(jnp.int32, (rows, np_), 1)

    ln1_s = ln1_s_ref[0].astype(jnp.float32)
    ln1_b = ln1_b_ref[0].astype(jnp.float32)
    ln2_s = ln2_s_ref[0].astype(jnp.float32)
    ln2_b = ln2_b_ref[0].astype(jnp.float32)

    # FLATTENED over the G samples (see _block_bwd_kernel): the LN/KV
    # recompute and every weight-grad contraction run once at M = G*Np (or
    # G*rows for the 8-row stages); attention and its grads stay per sample.
    x = x_ref[...].reshape(group * np_, dim)
    g = g_ref[...].reshape(group * rows, dim).astype(jnp.float32)

    # ---- forward recompute ----
    h1f, n1, rstd1 = _ln_fwd_cache(x, ln1_s, ln1_b, ln_eps)
    h1 = h1f.astype(x.dtype)
    kv = _mm(h1, wkv_ref[:]).astype(x.dtype)  # (G*Np, 2*hd)
    h1_top = _top_rows(h1, group, np_, rows)  # (G*rows, dim)
    q_top = _mm(h1_top, wq_ref[:]).astype(x.dtype)  # (G*rows, hd)

    att_rows, pn_parts, ok_parts = [], [], []
    for g_i in range(group):
        kv_g = kv[g_i * np_:(g_i + 1) * np_]
        q_g = q_top[g_i * rows:(g_i + 1) * rows]
        att_parts = []
        for hh in range(heads):
            q = q_g[:, hh * dim_head:(hh + 1) * dim_head]
            k = kv_g[:, hh * dim_head:(hh + 1) * dim_head]
            s = _mm(q, k, ((1,), (1,))) * scale  # (rows, Np)
            s = jnp.where(col8 < valid_len, s, _NEG_INF)
            p, l = _softmax_rows(s, fast_softmax)
            pn = p / l
            pn_parts.append(pn)
            ok_parts.append((s <= _CLAMP) if fast_softmax else None)
            v = kv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
            att_parts.append(_mm(pn.astype(v.dtype), v).astype(x.dtype))
        att_rows.append(jnp.concatenate(att_parts, axis=-1))
    a = jnp.concatenate(att_rows, axis=0)  # (G*rows, hd)
    o1 = _mm(a, wout_ref[:]) + bout_ref[0].astype(jnp.float32)
    x_top = _top_rows(x, group, np_, rows)
    x1 = (x_top.astype(jnp.float32) + o1).astype(x.dtype)

    # ---- MLP branch (G*rows only) ----
    h2f, n2, rstd2 = _ln_fwd_cache(x1, ln2_s, ln2_b, ln_eps)
    h2 = h2f.astype(x.dtype)
    f1 = _mm(h2, wfc1_ref[:]) + bfc1_ref[0].astype(jnp.float32)
    gl, dgl_df1 = _gelu_tanh_and_grad(f1)
    glb = gl.astype(x.dtype)
    gb = g.astype(x.dtype)

    dwfc2 = _mm(glb, gb, ((0,), (0,)))
    dbfc2 = jnp.sum(g, axis=0, keepdims=True)
    dgl = _mm(gb, wfc2_ref[:], ((1,), (1,)))
    df1 = dgl * dgl_df1
    df1b = df1.astype(x.dtype)
    dwfc1 = _mm(h2, df1b, ((0,), (0,)))
    dbfc1 = jnp.sum(df1, axis=0, keepdims=True)
    dh2 = _mm(df1b, wfc1_ref[:], ((1,), (1,)))
    dx1_ln, dln2_s, dln2_b = _ln_bwd(dh2, n2, rstd2, ln2_s)
    dx1 = g + dx1_ln  # (G*rows, dim) f32

    # ---- attention branch backward ----
    dx1b = dx1.astype(x.dtype)
    dbout = jnp.sum(dx1, axis=0, keepdims=True)
    dwout = _mm(a, dx1b, ((0,), (0,)))
    da = _mm(dx1b, wout_ref[:], ((1,), (1,))).astype(x.dtype)  # (G*rows, hd)

    dq_rows, dkv_rows = [], []
    for g_i in range(group):
        kv_g = kv[g_i * np_:(g_i + 1) * np_]
        q_g = q_top[g_i * rows:(g_i + 1) * rows]
        da_g = da[g_i * rows:(g_i + 1) * rows]
        dq_parts, dk_parts, dv_parts = [], [], []
        for hh in range(heads):
            q = q_g[:, hh * dim_head:(hh + 1) * dim_head]
            k = kv_g[:, hh * dim_head:(hh + 1) * dim_head]
            v = kv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
            da_h = da_g[:, hh * dim_head:(hh + 1) * dim_head]
            pn = pn_parts[g_i * heads + hh]  # CLS rows are always valid
            pb = pn.astype(x.dtype)
            dv_parts.append(_mm(pb, da_h, ((0,), (0,))).astype(x.dtype))
            dp = _mm(da_h, v, ((1,), (1,)))  # (rows, Np)
            delta = jnp.sum(pn * dp, axis=-1, keepdims=True)
            ds = pn * (dp - delta) * scale
            if ok_parts[g_i * heads + hh] is not None:
                ds = jnp.where(ok_parts[g_i * heads + hh], ds, 0.0)
            ds = ds.astype(x.dtype)
            dq_parts.append(_mm(ds, k).astype(x.dtype))  # (rows, dh)
            dk_parts.append(_mm(ds, q, ((0,), (0,))).astype(x.dtype))  # (Np, dh)
        dq_rows.append(jnp.concatenate(dq_parts, axis=-1))
        dkv_rows.append(jnp.concatenate(dk_parts + dv_parts, axis=-1))
    dq_top = jnp.concatenate(dq_rows, axis=0)  # (G*rows, hd)
    dkv = jnp.concatenate(dkv_rows, axis=0)  # (G*Np, 2hd)

    dw_q = _mm(h1_top, dq_top, ((0,), (0,)))  # (dim, hd)
    dw_kv = _mm(h1, dkv, ((0,), (0,)))  # (dim, 2hd)
    dwqkv = jnp.concatenate([dw_q, dw_kv], axis=-1)  # (dim, 3hd)

    dh1 = _mm(dkv, wkv_ref[:], ((1,), (1,)))  # (G*Np, dim)
    dh1_top = _mm(dq_top, wq_ref[:], ((1,), (1,)))  # (G*rows, dim)
    dh1 = jnp.concatenate([
        jnp.concatenate([
            dh1[g_i * np_:g_i * np_ + rows]
            + dh1_top[g_i * rows:(g_i + 1) * rows],
            dh1[g_i * np_ + rows:(g_i + 1) * np_],
        ], axis=0)
        for g_i in range(group)
    ], axis=0)
    dx_ln, dln1_s, dln1_b = _ln_bwd(dh1, n1, rstd1, ln1_s)
    # residual: x[:rows] of each sample feeds x1 directly
    dx = jnp.concatenate([
        jnp.concatenate([
            dx_ln[g_i * np_:g_i * np_ + rows]
            + dx1[g_i * rows:(g_i + 1) * rows],
            dx_ln[g_i * np_ + rows:(g_i + 1) * np_],
        ], axis=0)
        for g_i in range(group)
    ], axis=0)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(group, np_, dim)

    grads = (dln1_s, dln1_b, dwqkv, dwout, dbout,
             dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2)

    out_refs = (dln1_s_ref, dln1_b_ref, dwqkv_ref, dwout_ref, dbout_ref,
                dln2_s_ref, dln2_b_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref,
                dbfc2_ref)

    @pl.when(first)
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] += val


def _block_cls_bwd(x, g, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
                   ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
                   *, heads, dim_head, valid_len, ln_eps,
                   group: int | None = None, fast_softmax: bool = True):
    B, N, dim = x.shape
    rows = g.shape[1]
    mlp = w_fc1.shape[1]
    hd = heads * dim_head
    # the cls backward's prob cache is (rows, Np) per (sample, head) —
    # far lighter than the full block's (Np, Np) — but the (G*N, dim)
    # fp32 gradient tiles still apply, so the conservative bwd rule picks
    # the base G and the cls-specific estimate clamps it
    G = _fit_group(_clamp_group_cls(
        group or _auto_group(dim, bwd=True, n=N), N, dim, 3 * hd, heads=heads,
        rows=rows, bwd=True,
    ), B)

    def vec(v):
        return v.reshape(1, -1)

    blk_x = pl.BlockSpec((G, N, dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    blk_g = pl.BlockSpec((G, rows, dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    in_arrays = [
        x, g,
        vec(ln1_scale), vec(ln1_bias), w_qkv[:, :hd], w_qkv[:, hd:],
        w_out, vec(b_out),
        vec(ln2_scale), vec(ln2_bias), w_fc1, vec(b_fc1), w_fc2,
    ]
    in_specs = [blk_x, blk_g] + [wspec(a.shape) for a in in_arrays[2:]]
    out_shapes = (
        jax.ShapeDtypeStruct((B, N, dim), x.dtype),        # dx
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln1_s
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln1_b
        jax.ShapeDtypeStruct((dim, 3 * hd), jnp.float32),  # dwqkv
        jax.ShapeDtypeStruct((hd, dim), jnp.float32),      # dwout
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dbout
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln2_s
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dln2_b
        jax.ShapeDtypeStruct((dim, mlp), jnp.float32),     # dwfc1
        jax.ShapeDtypeStruct((1, mlp), jnp.float32),       # dbfc1
        jax.ShapeDtypeStruct((mlp, dim), jnp.float32),     # dwfc2
        jax.ShapeDtypeStruct((1, dim), jnp.float32),       # dbfc2
    )
    out_specs = (blk_x,) + tuple(wspec(o.shape) for o in out_shapes[1:])
    return pl.pallas_call(
        functools.partial(
            _block_cls_bwd_kernel, heads=heads, dim_head=dim_head,
            valid_len=valid_len, ln_eps=ln_eps, group=G,
            fast_softmax=fast_softmax,
        ),
        out_shape=out_shapes,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(*in_arrays)


def _attn_cls_bwd_kernel(
    x_ref, dx1_ref,
    ln1_s_ref, ln1_b_ref, wq_ref, wkv_ref, wout_ref,
    dx_ref,
    dln1_s_ref, dln1_b_ref, dwqkv_ref, dwout_ref, dbout_ref,
    *, heads, dim_head, valid_len, ln_eps, group, fast_softmax,
):
    """Attention-branch half of the cls split backward: same math as
    _block_cls_bwd_kernel with the MLP section replaced by the incoming
    dx1 cotangent (produced by _mlp_bwd_kernel on the 8-row tiles)."""
    first = pl.program_id(0) == 0
    np_ = x_ref.shape[1]
    dim = x_ref.shape[2]
    rows = dx1_ref.shape[1]
    hd = heads * dim_head
    scale = dim_head ** -0.5
    col8 = jax.lax.broadcasted_iota(jnp.int32, (rows, np_), 1)
    ln1_s = ln1_s_ref[0].astype(jnp.float32)
    ln1_b = ln1_b_ref[0].astype(jnp.float32)

    x = x_ref[...].reshape(group * np_, dim)
    dx1 = dx1_ref[...].reshape(group * rows, dim).astype(jnp.float32)

    h1f, n1, rstd1 = _ln_fwd_cache(x, ln1_s, ln1_b, ln_eps)
    h1 = h1f.astype(x.dtype)
    kv = _mm(h1, wkv_ref[:]).astype(x.dtype)  # (G*Np, 2*hd)
    h1_top = _top_rows(h1, group, np_, rows)
    q_top = _mm(h1_top, wq_ref[:]).astype(x.dtype)  # (G*rows, hd)

    att_rows, pn_parts, ok_parts = [], [], []
    for g_i in range(group):
        kv_g = kv[g_i * np_:(g_i + 1) * np_]
        q_g = q_top[g_i * rows:(g_i + 1) * rows]
        att_parts = []
        for hh in range(heads):
            q = q_g[:, hh * dim_head:(hh + 1) * dim_head]
            k = kv_g[:, hh * dim_head:(hh + 1) * dim_head]
            s = _mm(q, k, ((1,), (1,))) * scale  # (rows, Np)
            s = jnp.where(col8 < valid_len, s, _NEG_INF)
            p, l = _softmax_rows(s, fast_softmax)
            pn = p / l
            pn_parts.append(pn)
            ok_parts.append((s <= _CLAMP) if fast_softmax else None)
            v = kv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
            att_parts.append(_mm(pn.astype(v.dtype), v).astype(x.dtype))
        att_rows.append(jnp.concatenate(att_parts, axis=-1))
    a = jnp.concatenate(att_rows, axis=0)  # (G*rows, hd)

    dx1b = dx1.astype(x.dtype)
    dbout = jnp.sum(dx1, axis=0, keepdims=True)
    dwout = _mm(a, dx1b, ((0,), (0,)))
    da = _mm(dx1b, wout_ref[:], ((1,), (1,))).astype(x.dtype)

    dq_rows, dkv_rows = [], []
    for g_i in range(group):
        kv_g = kv[g_i * np_:(g_i + 1) * np_]
        q_g = q_top[g_i * rows:(g_i + 1) * rows]
        da_g = da[g_i * rows:(g_i + 1) * rows]
        dq_parts, dk_parts, dv_parts = [], [], []
        for hh in range(heads):
            q = q_g[:, hh * dim_head:(hh + 1) * dim_head]
            k = kv_g[:, hh * dim_head:(hh + 1) * dim_head]
            v = kv_g[:, hd + hh * dim_head:hd + (hh + 1) * dim_head]
            da_h = da_g[:, hh * dim_head:(hh + 1) * dim_head]
            pn = pn_parts[g_i * heads + hh]
            pb = pn.astype(x.dtype)
            dv_parts.append(_mm(pb, da_h, ((0,), (0,))).astype(x.dtype))
            dp = _mm(da_h, v, ((1,), (1,)))  # (rows, Np)
            delta = jnp.sum(pn * dp, axis=-1, keepdims=True)
            ds = pn * (dp - delta) * scale
            if ok_parts[g_i * heads + hh] is not None:
                ds = jnp.where(ok_parts[g_i * heads + hh], ds, 0.0)
            ds = ds.astype(x.dtype)
            dq_parts.append(_mm(ds, k).astype(x.dtype))
            dk_parts.append(_mm(ds, q, ((0,), (0,))).astype(x.dtype))
        dq_rows.append(jnp.concatenate(dq_parts, axis=-1))
        dkv_rows.append(jnp.concatenate(dk_parts + dv_parts, axis=-1))
    dq_top = jnp.concatenate(dq_rows, axis=0)
    dkv = jnp.concatenate(dkv_rows, axis=0)

    dw_q = _mm(h1_top, dq_top, ((0,), (0,)))
    dw_kv = _mm(h1, dkv, ((0,), (0,)))
    dwqkv = jnp.concatenate([dw_q, dw_kv], axis=-1)

    dh1 = _mm(dkv, wkv_ref[:], ((1,), (1,)))
    dh1_top = _mm(dq_top, wq_ref[:], ((1,), (1,)))
    dh1 = jnp.concatenate([
        jnp.concatenate([
            dh1[g_i * np_:g_i * np_ + rows]
            + dh1_top[g_i * rows:(g_i + 1) * rows],
            dh1[g_i * np_ + rows:(g_i + 1) * np_],
        ], axis=0)
        for g_i in range(group)
    ], axis=0)
    dx_ln, dln1_s, dln1_b = _ln_bwd(dh1, n1, rstd1, ln1_s)
    dx = jnp.concatenate([
        jnp.concatenate([
            dx_ln[g_i * np_:g_i * np_ + rows]
            + dx1[g_i * rows:(g_i + 1) * rows],
            dx_ln[g_i * np_ + rows:(g_i + 1) * np_],
        ], axis=0)
        for g_i in range(group)
    ], axis=0)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(group, np_, dim)

    grads = (dln1_s, dln1_b, dwqkv, dwout, dbout)
    out_refs = (dln1_s_ref, dln1_b_ref, dwqkv_ref, dwout_ref, dbout_ref)

    @pl.when(first)
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, val in zip(out_refs, grads):
            ref[:] += val


def _block_cls_bwd_split(x, x1, g, ln1_scale, ln1_bias, w_qkv, w_out,
                         ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
                         *, heads, dim_head, valid_len, ln_eps,
                         fast_softmax: bool = True):
    """Two-kernel cls-block backward for dims the monolithic cls kernel
    can't hold: _mlp_bwd_kernel on the 8-row (x1, g) tiles, then
    _attn_cls_bwd_kernel on (x, dx1). Returns the same 12 gradients as
    _block_cls_bwd."""
    B, N, dim = x.shape
    rows = g.shape[1]
    mlp = w_fc1.shape[1]
    hd = heads * dim_head

    # MLP kernel group: accum 2*dim*mlp fp32 + tiny 8-row tiles
    gm = _auto_group(dim, bwd=True, n=N)
    per_m = rows * (mlp * 12 + dim * 16)
    acc_m = 2 * dim * mlp * 4
    while gm > 1 and gm * per_m + acc_m > _GROUP_VMEM_BUDGET:
        gm //= 2
    gm = _fit_group(gm, B)
    # attention kernel group: accum (3hd+hd)*dim fp32 + full-length kv tiles
    ga = _auto_group(dim, bwd=True, n=N)
    per_a = N * (hd * 2 * 6 + dim * 16) + heads * rows * N * 8
    acc_a = (dim * 3 * hd + hd * dim) * 4
    while ga > 1 and ga * per_a + acc_a > _GROUP_VMEM_BUDGET:
        ga //= 2
    ga = _fit_group(ga, B)

    def vec(v):
        return v.reshape(1, -1)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    interp = jax.default_backend() != "tpu"
    params = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

    blk_m = pl.BlockSpec((gm, rows, dim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    m_in = [x1, g, vec(ln2_scale), vec(ln2_bias), w_fc1, vec(b_fc1), w_fc2]
    m_out_shapes = (
        jax.ShapeDtypeStruct((B, rows, dim), x.dtype),    # dx1
        jax.ShapeDtypeStruct((1, dim), jnp.float32),
        jax.ShapeDtypeStruct((1, dim), jnp.float32),
        jax.ShapeDtypeStruct((dim, mlp), jnp.float32),
        jax.ShapeDtypeStruct((1, mlp), jnp.float32),
        jax.ShapeDtypeStruct((mlp, dim), jnp.float32),
        jax.ShapeDtypeStruct((1, dim), jnp.float32),
    )
    (dx1, dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2) = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, group=gm, ln_eps=ln_eps),
        out_shape=m_out_shapes,
        grid=(B // gm,),
        in_specs=[blk_m, blk_m] + [wspec(a.shape) for a in m_in[2:]],
        out_specs=(blk_m,) + tuple(wspec(o.shape) for o in m_out_shapes[1:]),
        interpret=interp,
        compiler_params=params,
    )(*m_in)

    blk_a = pl.BlockSpec((ga, N, dim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_a8 = pl.BlockSpec((ga, rows, dim), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    a_in = [x, dx1, vec(ln1_scale), vec(ln1_bias), w_qkv[:, :hd],
            w_qkv[:, hd:], w_out]
    a_out_shapes = (
        jax.ShapeDtypeStruct((B, N, dim), x.dtype),        # dx
        jax.ShapeDtypeStruct((1, dim), jnp.float32),
        jax.ShapeDtypeStruct((1, dim), jnp.float32),
        jax.ShapeDtypeStruct((dim, 3 * hd), jnp.float32),
        jax.ShapeDtypeStruct((hd, dim), jnp.float32),
        jax.ShapeDtypeStruct((1, dim), jnp.float32),
    )
    (dx, dln1_s, dln1_b, dwqkv, dwout, dbout) = pl.pallas_call(
        functools.partial(
            _attn_cls_bwd_kernel, heads=heads, dim_head=dim_head,
            valid_len=valid_len, ln_eps=ln_eps, group=ga,
            fast_softmax=fast_softmax,
        ),
        out_shape=a_out_shapes,
        grid=(B // ga,),
        in_specs=[blk_a, blk_a8] + [wspec(a.shape) for a in a_in[2:]],
        out_specs=(blk_a,) + tuple(wspec(o.shape) for o in a_out_shapes[1:]),
        interpret=interp,
        compiler_params=params,
    )(*a_in)

    return (dx, dln1_s, dln1_b, dwqkv, dwout, dbout,
            dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2)


def _split_cls_bwd_feasible(N: int, dim: int, mlp: int, hd: int,
                            heads: int, rows: int = 8) -> bool:
    """Per-kernel bound for the cls split (mirrors _split_bwd_feasible)."""
    acc_m = 2 * dim * mlp * 4
    work_m = rows * (mlp * 12 + dim * 16)
    acc_a = (dim * 3 * hd + hd * dim) * 4
    work_a = N * (hd * 2 * 6 + dim * 16) + heads * rows * N * 8
    bound = 40 * 1024 * 1024
    return acc_m + work_m <= bound and acc_a + work_a <= bound


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15)
)
def fused_block_cls_train(
    x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
    ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
    heads: int, dim_head: int, valid_len: int | None = None,
    ln_eps: float = 1e-5,
):
    """Differentiable CLS-pooling final block: (B, N, dim) -> (B, 8, dim)
    (row 0 is the CLS token). Same numerics contract as fused_block_train."""
    return fused_block_cls(
        x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
        ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
        heads=heads, dim_head=dim_head, valid_len=valid_len, ln_eps=ln_eps,
    )


def _fbct_fwd(x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
              ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
              heads, dim_head, valid_len, ln_eps):
    hd = heads * dim_head
    mono = _bwd_kernel_feasible(x.shape[1], x.shape[2], w_fc1.shape[1],
                                hd, heads)
    split = (
        not mono or _prefer_split(x.shape[2])
    ) and _split_cls_bwd_feasible(
        x.shape[1], x.shape[2], w_fc1.shape[1], hd, heads
    )
    if split:
        out, x1 = fused_block_cls(
            x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
            ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
            heads=heads, dim_head=dim_head, valid_len=valid_len,
            ln_eps=ln_eps, save_x1=True,
        )
    else:
        out = fused_block_cls(
            x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
            ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
            heads=heads, dim_head=dim_head, valid_len=valid_len,
            ln_eps=ln_eps,
        )
        x1 = None
    res = (x, x1, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
           ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2)
    return out, res


def _fbct_bwd(heads, dim_head, valid_len, ln_eps, res, g):
    (x, x1, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
     ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2) = res
    vl = x.shape[1] if valid_len is None else int(valid_len)
    if x1 is not None:
        # split two-kernel cls backward (forward saved the 8-row x1)
        (dx, dln1_s, dln1_b, dwqkv, dwout, dbout,
         dln2_s, dln2_b, dwfc1, dbfc1, dwfc2,
         dbfc2) = _block_cls_bwd_split(
            x, x1, g, ln1_scale, ln1_bias, w_qkv, w_out,
            ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
            heads=heads, dim_head=dim_head, valid_len=vl, ln_eps=ln_eps,
        )

        def like_s(d, ref):
            return d.reshape(ref.shape).astype(ref.dtype)

        return (
            dx,
            like_s(dln1_s, ln1_scale), like_s(dln1_b, ln1_bias),
            like_s(dwqkv, w_qkv), like_s(dwout, w_out),
            like_s(dbout, b_out),
            like_s(dln2_s, ln2_scale), like_s(dln2_b, ln2_bias),
            like_s(dwfc1, w_fc1), like_s(dbfc1, b_fc1),
            like_s(dwfc2, w_fc2), like_s(dbfc2, b_fc2),
        )
    if not _bwd_kernel_feasible(x.shape[1], x.shape[2], w_fc1.shape[1],
                                heads * dim_head, heads):
        # largest-dim fallback (the cls backward carries the same
        # VMEM-resident weight-grad accumulators); cotangent covers the
        # first 8 rows only
        rows = g.shape[1]
        _, vjp = jax.vjp(
            lambda *a: _xla_block_ref(
                *a, heads=heads, dim_head=dim_head, valid_len=vl,
                ln_eps=ln_eps,
            )[:, :rows],
            x, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
            ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
        )
        return vjp(g)
    (dx, dln1_s, dln1_b, dwqkv, dwout, dbout,
     dln2_s, dln2_b, dwfc1, dbfc1, dwfc2, dbfc2) = _block_cls_bwd(
        x, g, ln1_scale, ln1_bias, w_qkv, w_out, b_out,
        ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
        heads=heads, dim_head=dim_head, valid_len=vl, ln_eps=ln_eps,
    )

    def like(d, ref):
        return d.reshape(ref.shape).astype(ref.dtype)

    return (
        dx,
        like(dln1_s, ln1_scale), like(dln1_b, ln1_bias),
        like(dwqkv, w_qkv), like(dwout, w_out), like(dbout, b_out),
        like(dln2_s, ln2_scale), like(dln2_b, ln2_bias),
        like(dwfc1, w_fc1), like(dbfc1, b_fc1), like(dwfc2, w_fc2),
        like(dbfc2, b_fc2),
    )


fused_block_cls_train.defvjp(_fbct_fwd, _fbct_bwd)
