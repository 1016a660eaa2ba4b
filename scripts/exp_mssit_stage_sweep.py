"""MS-SiT per-stage profile + flattened-group sweep at the shipped config.

VERDICT r3: MS-SiT runs at ~28% MFU vs the SiT family's 52% (907 inf /
225 train surf/s at ico-6, B=32). Hypotheses to measure here:
 1. the dim-keyed _auto_group defaults (calibrated at SiT's N=328) leave
    the folded small-N window shapes (N=64) at tiny GEMM M — sweep G;
 2. the axial fold/unfold transposes relayout the whole tensor in HBM;
 3. merges/embed (XLA) may not be free at 20,480 tokens.

Stage shapes (B=32, shipped ico-6 96/(2,2,6,2), w=64):
  stage0: folded (10240, 64,  96), 2 blocks (window, axial)
  stage1: folded ( 2560, 64, 192), 2 blocks
  stage2: folded (  640, 64, 384), 6 blocks
  stage3: global (   32, 320, 768), 2 blocks

Run: python scripts/exp_mssit_stage_sweep.py
"""

import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import timed_scan
from surface_vision_transformers_tpu.ops.pallas.fused_block import (
    fused_block, fused_block_train,
)
from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

assert jax.default_backend() == "tpu", jax.default_backend()
enable_compilation_cache()

KEY = jax.random.PRNGKey(0)
B = 32

STAGES = [
    # (name, folded_B, N, dim, heads, blocks)
    ("s0", B * 320, 64, 96, 3, 2),
    ("s1", B * 80, 64, 192, 6, 2),
    ("s2", B * 20, 64, 384, 12, 6),
    ("s3", B, 320, 768, 24, 2),
]


def block_weights(dim, heads, dh=32):
    hd = heads * dh
    k = jax.random.PRNGKey(dim)
    ws = dict(
        l1s=jnp.ones((dim,)), l1b=jnp.zeros((dim,)),
        wqkv=(jax.random.normal(k, (dim, 3 * hd)) * 0.02).astype(jnp.bfloat16),
        wout=(jax.random.normal(k, (hd, dim)) * 0.02).astype(jnp.bfloat16),
        bout=jnp.zeros((dim,)),
        l2s=jnp.ones((dim,)), l2b=jnp.zeros((dim,)),
        wfc1=(jax.random.normal(k, (dim, 4 * dim)) * 0.02).astype(jnp.bfloat16),
        bfc1=jnp.zeros((4 * dim,)),
        wfc2=(jax.random.normal(k, (4 * dim, dim)) * 0.02).astype(jnp.bfloat16),
        bfc2=jnp.zeros((dim,)),
    )
    return ws


def fwd_sweep():
    print("== forward fused_block sweep (ms per BLOCK at stage shape) ==",
          flush=True)
    for name, fb, N, dim, heads, blocks in STAGES:
        ws = block_weights(dim, heads)
        x = (jax.random.normal(KEY, (fb, N, dim)) * 0.1).astype(jnp.bfloat16)
        gflop_block = 12 * fb * N * dim * dim / 1e9
        for G in (None, 8, 16, 32, 64, 128):
            if G is not None and (fb % G or G * N > 8192 * 8):
                continue

            def step(xx, i, _G=G):
                o = fused_block(
                    xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-9),
                    ws["l1s"], ws["l1b"], ws["wqkv"], ws["wout"], ws["bout"],
                    ws["l2s"], ws["l2b"], ws["wfc1"], ws["bfc1"],
                    ws["wfc2"], ws["bfc2"],
                    heads=heads, dim_head=32, group=_G,
                )
                return o.mean().astype(jnp.float32)

            try:
                dt = timed_scan(step, (x,), iters=21)
            except Exception as e:  # noqa: BLE001
                print(f"{name} G={G}: FAIL {type(e).__name__}", flush=True)
                continue
            tf = gflop_block / dt / 1e3
            print(f"{name} (fb={fb:5d} N={N} d={dim}) G={str(G):>4}: "
                  f"{dt*1e3:7.3f} ms/block  {tf:6.1f} TF/s", flush=True)


def train_sweep():
    print("== train fused_block_train sweep (fwd+bwd ms per block) ==",
          flush=True)
    from surface_vision_transformers_tpu.ops.pallas import fused_block as FB

    for name, fb, N, dim, heads, blocks in STAGES:
        ws = block_weights(dim, heads)
        x = (jax.random.normal(KEY, (fb, N, dim)) * 0.1).astype(jnp.bfloat16)
        for G in (None, 8, 16, 32, 64):
            if G is not None and fb % G:
                continue
            FB._BWD_GROUP = G

            def step(xx, wq, i):
                def loss(w):
                    o = fused_block_train(
                        xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-9),
                        ws["l1s"], ws["l1b"], w, ws["wout"], ws["bout"],
                        ws["l2s"], ws["l2b"], ws["wfc1"], ws["bfc1"],
                        ws["wfc2"], ws["bfc2"],
                        heads, 32,
                    )
                    return o.astype(jnp.float32).mean()

                l, g = jax.value_and_grad(loss)(wq)
                return l + g.astype(jnp.float32).mean()

            try:
                dt = timed_scan(step, (x, ws["wqkv"]), iters=11)
            except Exception as e:  # noqa: BLE001
                print(f"{name} bwdG={G}: FAIL {type(e).__name__}: {e}",
                      flush=True)
                continue
            print(f"{name} (fb={fb:5d} N={N} d={dim}) bwdG={str(G):>4}: "
                  f"{dt*1e3:7.3f} ms/block fwd+bwd", flush=True)
        FB._BWD_GROUP = None


def glue_costs():
    print("== glue: axial fold/unfold, merges, embed ==", flush=True)
    from surface_vision_transformers_tpu.models.mssit import (
        fold_tokens, unfold_tokens,
    )

    for name, T, dim in (("s0", 20480, 96), ("s1", 5120, 192),
                         ("s2", 1280, 384)):
        t = (jax.random.normal(KEY, (B, T, dim)) * 0.1).astype(jnp.bfloat16)

        def step(tt, i):
            f = fold_tokens(
                tt + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-9), 64, "axial"
            )
            u = unfold_tokens(f * jnp.bfloat16(1.0001), B, T, 64, "axial")
            return u.mean().astype(jnp.float32)

        dt = timed_scan(step, (t,), iters=21)
        print(f"{name} axial fold+unfold roundtrip: {dt*1e3:7.3f} ms",
              flush=True)

    for name, T, dim in (("m0", 20480, 96), ("m1", 5120, 192),
                         ("m2", 1280, 384)):
        t = (jax.random.normal(KEY, (B, T, dim)) * 0.1).astype(jnp.bfloat16)
        red = (jax.random.normal(KEY, (4 * dim, 2 * dim)) * 0.02).astype(
            jnp.bfloat16
        )
        sc, bi = jnp.ones((4 * dim,)), jnp.zeros((4 * dim,))

        def step(tt, i):
            y = (tt + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-9)).reshape(
                B, T // 4, 4 * dim
            )
            h = y.astype(jnp.float32)
            mu = h.mean(-1, keepdims=True)
            var = ((h - mu) ** 2).mean(-1, keepdims=True)
            h = ((h - mu) * jax.lax.rsqrt(var + 1e-5) * sc + bi).astype(
                jnp.bfloat16
            )
            return (h @ red).mean().astype(jnp.float32)

        dt = timed_scan(step, (t,), iters=21)
        print(f"{name} merge (LN + 4d->2d proj): {dt*1e3:7.3f} ms", flush=True)

    from surface_vision_transformers_tpu.geometry import load_patch_table
    from surface_vision_transformers_tpu.ops import fused_patch_embed

    table = load_patch_table(6, 5).indices
    x = jax.random.normal(KEY, (B, 4, 40962), jnp.bfloat16)
    k = (jax.random.normal(KEY, (24, 96)) * 0.1).astype(jnp.float32)
    bias = jnp.zeros((96,), jnp.float32)

    def step(xx, i):
        t = fused_patch_embed(
            xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7), table, k, bias,
            compute_dtype=jnp.bfloat16,
        )
        return t.mean().astype(jnp.float32)

    dt = timed_scan(step, (x,), iters=21)
    print(f"embed (gather+GEMM, 20480 tokens): {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fwd"):
        fwd_sweep()
    if which in ("all", "glue"):
        glue_costs()
    if which in ("all", "train"):
        train_sweep()
