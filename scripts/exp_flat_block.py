"""EXPERIMENT: flattened-GEMM fused block vs the shipped per-sample loop.

The shipped ``fused_block`` loops ``for g in range(G)`` running every GEMM at
M=Np rows. This variant flattens the G samples into the GEMM M dimension for
the LN/QKV/projection/MLP stages (75% of block FLOPs at 4x the rows) and
keeps only the attention per sample. Measures both + parity at several G.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from bench import timed_scan  # single timing methodology (bench.py docstring)
from surface_vision_transformers_tpu.ops.pallas.fused_block import (
    _layer_norm, _softmax_rows, fused_block,
)

_NEG_INF = -1e30


def _flat_block_kernel(
    x_ref,
    ln1_s_ref, ln1_b_ref, wqkv_ref,
    wout_ref, bout_ref,
    ln2_s_ref, ln2_b_ref,
    wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
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

    x = x_ref[...].reshape(group * np_, dim)  # flatten samples into rows
    h = _layer_norm(x, ln1_s, ln1_b, ln_eps).astype(x.dtype)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (G*Np, 3hd)

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
    c = 0.7978845608028654
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


def flat_block(x, *args, heads, dim_head, valid_len, group=4,
               fast_softmax=True, ln_eps=1e-5):
    B, N, dim = x.shape
    G = group if B % group == 0 else 1

    def vec(v):
        return v.reshape(1, -1)

    (ln1_scale, ln1_bias, w_qkv, w_out, b_out,
     ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2) = args
    arr = [
        vec(ln1_scale), vec(ln1_bias), w_qkv,
        w_out, vec(b_out),
        vec(ln2_scale), vec(ln2_bias),
        w_fc1, vec(b_fc1), w_fc2, vec(b_fc2),
    ]
    blk_x = pl.BlockSpec((G, N, dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda b: tuple([0] * w.ndim),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _flat_block_kernel, heads=heads, dim_head=dim_head,
            valid_len=valid_len, group=G, ln_eps=ln_eps,
            fast_softmax=fast_softmax,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, dim), x.dtype),
        grid=(B // G,),
        in_specs=[blk_x] + [wspec(a) for a in arr],
        out_specs=blk_x,
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(x, *arr)


def main():
    key = jax.random.PRNGKey(0)
    B, N, dim, heads, dh, mlp = 256, 328, 192, 3, 64, 768
    hd = heads * dh
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (B, N, dim), jnp.bfloat16)
    args = (
        jnp.ones((dim,), jnp.float32), jnp.zeros((dim,), jnp.float32),
        (jax.random.normal(ks[1], (dim, 3 * hd)) * 0.05).astype(jnp.bfloat16),
        (jax.random.normal(ks[2], (hd, dim)) * 0.05).astype(jnp.bfloat16),
        jnp.zeros((dim,), jnp.float32),
        jnp.ones((dim,), jnp.float32), jnp.zeros((dim,), jnp.float32),
        (jax.random.normal(ks[3], (dim, mlp)) * 0.05).astype(jnp.bfloat16),
        jnp.zeros((mlp,), jnp.float32),
        (jax.random.normal(ks[4], (mlp, dim)) * 0.05).astype(jnp.bfloat16),
        jnp.zeros((dim,), jnp.float32),
    )
    vl = 321

    ref = jax.jit(lambda x: fused_block(
        x, *args, heads=heads, dim_head=dh, valid_len=vl))(x)

    for G in (2, 4, 8, 16, 32):
        out = jax.jit(lambda x: flat_block(
            x, *args, heads=heads, dim_head=dh, valid_len=vl, group=G))(x)
        d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
        print(f"G={G} parity max|diff| vs shipped: {d}")

    def run_ref(xx, i):
        h = xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
        for _ in range(12):
            h = fused_block(h, *args, heads=heads, dim_head=dh, valid_len=vl)
        return h.astype(jnp.float32).mean()

    dt = timed_scan(run_ref, (x,), iters=11)
    print(f"shipped fused_block x12:  {dt*1e3:7.3f} ms "
          f"({dt/12*1e3:.3f} ms/block)")

    for G in (2, 4, 8, 16, 32):
        def run_flat(xx, i, G=G):
            h = xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
            for _ in range(12):
                h = flat_block(h, *args, heads=heads, dim_head=dh,
                               valid_len=vl, group=G)
            return h.astype(jnp.float32).mean()

        dt = timed_scan(run_flat, (x,), iters=11)
        print(f"flat block G={G} x12:     {dt*1e3:7.3f} ms "
              f"({dt/12*1e3:.3f} ms/block)")


if __name__ == "__main__":
    main()
