"""Window-packing probe for MS-SiT's small-dim stages.

Hypothesis (from exp_mssit_stage_sweep: s0 14.9 TF/s, s1 31.5 TF/s): the
64-token windows leave attention matmuls at (64,32)@(32,64) — M/N far below
the 128-wide MXU tiles. Packing P windows into one kernel sample of
N = P*64 with a block-diagonal mask turns them into (P*64,32)@(32,P*64):
P^2/P = P-fold more attention FLOPs but up-to-P-fold fuller tiles, and
P-fold fewer matmul dispatches. Token-local GEMMs/LN/MLP see the same
total M either way.

This probe measures the PERF shape only (no mask — a `where` on the score
tile is ~free) by reshaping the folded layout (fb, 64, d) -> (fb/P, P*64, d).

Run: python scripts/exp_mssit_winpack.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import timed_scan
from surface_vision_transformers_tpu.ops.pallas.fused_block import fused_block
from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

assert jax.default_backend() == "tpu", jax.default_backend()
enable_compilation_cache()

KEY = jax.random.PRNGKey(0)
B = 32

STAGES = [
    ("s0", B * 320, 64, 96, 3),
    ("s1", B * 80, 64, 192, 6),
    ("s2", B * 20, 64, 384, 12),
]


def block_weights(dim, heads, dh=32):
    hd = heads * dh
    k = jax.random.PRNGKey(dim)
    return dict(
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


for name, fb, N, dim, heads in STAGES:
    ws = block_weights(dim, heads)
    gflop = 12 * fb * N * dim * dim / 1e9  # useful GEMM FLOPs, fixed
    for P in (1, 4, 8):
        fbp, Np = fb // P, N * P
        x = (jax.random.normal(KEY, (fbp, Np, dim)) * 0.1).astype(jnp.bfloat16)
        for G in (None, 16):
            if G is not None and fbp % G:
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
                print(f"{name} P={P} G={G}: FAIL {type(e).__name__}",
                      flush=True)
                continue
            print(f"{name} P={P} (fb={fbp:5d} N={Np:3d} d={dim}) "
                  f"G={str(G):>4}: {dt*1e3:7.3f} ms/block "
                  f"{gflop/dt/1e3:6.1f} TF/s(useful)", flush=True)
