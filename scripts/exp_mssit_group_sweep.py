"""Group-size sweep at MS-SiT's folded window shapes (N=64).

_auto_group's defaults were measured at SiT's N=328; the folded MS-SiT
blocks run N=64 where the VMEM working set per sample is ~5x smaller, so
much larger G (GEMM M = G*64) should fit and fill the MXU. Sweeps
fused_block (fwd) and fused_block_train's backward at each stage shape.

Run: python scripts/exp_mssit_group_sweep.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

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
    ("s0", B * 320, 64, 96, 3),
    ("s1", B * 80, 64, 192, 6),
    ("s2", B * 20, 64, 384, 12),
    ("s3", B * 5, 64, 768, 24),
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
    gflop = 12 * fb * N * dim * dim / 1e9
    x = (jax.random.normal(KEY, (fb, N, dim)) * 0.1).astype(jnp.bfloat16)

    for G in (None, 16, 32, 64, 128):
        if G is not None and fb % G:
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
            print(f"{name} fwd  G={str(G):>4}: {dt*1e3:7.3f} ms/block "
                  f"{gflop/dt/1e3:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} fwd  G={G}: FAIL {type(e).__name__}: {e}"[:120],
                  flush=True)

    # backward: value_and_grad through fused_block_train (group is chosen
    # internally — _auto_group(bwd=True); sweep via monkeypatched default)
    import surface_vision_transformers_tpu.ops.pallas.fused_block as fb_mod

    for Gb in (None, 8, 16, 32):
        orig = fb_mod._auto_group
        if Gb is not None:
            fb_mod._auto_group = lambda d, bwd=False, _o=orig, _g=Gb: (
                _g if bwd else _o(d)
            )
        try:
            def loss(xx, i):
                o = fused_block_train(
                    xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-9),
                    ws["l1s"], ws["l1b"], ws["wqkv"], ws["wout"], ws["bout"],
                    ws["l2s"], ws["l2b"], ws["wfc1"], ws["bfc1"],
                    ws["wfc2"], ws["bfc2"],
                    heads, 32, None,
                )
                return o.astype(jnp.float32).mean()

            def step_b(xx, i):
                l, g = jax.value_and_grad(loss)(xx, i)
                return l + g.astype(jnp.float32).mean()

            dt = timed_scan(step_b, (x,), iters=11)
            print(f"{name} f+b  G={str(Gb):>4}: {dt*1e3:7.3f} ms/block "
                  f"{3*gflop/dt/1e3:6.1f} TF/s(3x-fwd)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} f+b  G={Gb}: FAIL {type(e).__name__}: {e}"[:120],
                  flush=True)
        finally:
            fb_mod._auto_group = orig
