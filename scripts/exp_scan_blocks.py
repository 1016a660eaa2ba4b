"""Scan-over-blocks vs unrolled block loop: compile time and runtime.

The fused-train path unrolls ``depth`` fused_block_train calls, so XLA/Mosaic
compiles the same kernel pair (fwd + split bwd) once per block. A
``lax.scan`` over depth-stacked weights compiles the body ONCE — if runtime
is unchanged this is a pure compile-time win for deep models (SiT depth 12,
MS-SiT stages, dim-768+ shapes whose Mosaic compiles are slow).

usage: exp_scan_blocks.py [B] [dim] [depth]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.ops.pallas.fused_block import (
    fused_block_train,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 192
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 12
HEADS = max(3, DIM // 64)
DH = DIM // HEADS
MLP = 4 * DIM
N = 328
VALID = 321


def make_weights(key, depth):
    ks = jax.random.split(key, 11)
    dt = jnp.bfloat16

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, (depth, *shape)) * scale).astype(dt)

    return (
        jnp.ones((depth, DIM), jnp.float32),   # ln1_scale
        jnp.zeros((depth, DIM), jnp.float32),  # ln1_bias
        w(ks[0], (DIM, 3 * HEADS * DH)),
        w(ks[1], (HEADS * DH, DIM)),
        jnp.zeros((depth, DIM), jnp.float32),
        jnp.ones((depth, DIM), jnp.float32),
        jnp.zeros((depth, DIM), jnp.float32),
        w(ks[2], (DIM, MLP)),
        jnp.zeros((depth, MLP), jnp.float32),
        w(ks[3], (MLP, DIM)),
        jnp.zeros((depth, DIM), jnp.float32),
    )


def unrolled(x, ws):
    for i in range(DEPTH):
        layer = tuple(w[i] for w in ws)
        x = fused_block_train(x, *layer, HEADS, DH, VALID)
    return x


def scanned(x, ws):
    def body(h, layer):
        return fused_block_train(h, *layer, HEADS, DH, VALID), None

    x, _ = jax.lax.scan(body, x, ws)
    return x


def loss_of(fwd):
    def loss(x, ws):
        return (fwd(x, ws).astype(jnp.float32) ** 2).mean()

    return jax.jit(jax.grad(loss, argnums=(0, 1)))


def bench(tag, fwd, x, ws):
    f = loss_of(fwd)
    t0 = time.perf_counter()
    lowered = f.lower(x, ws)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_comp = time.perf_counter() - t0
    out = compiled(x, ws)
    jax.block_until_ready(out)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(x, ws)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:9s} B={B} dim={DIM} depth={DEPTH}: lower {t_lower:5.1f} s  "
          f"compile {t_comp:6.1f} s  step {dt:7.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    ws = make_weights(key, DEPTH)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.bfloat16)
    o_u = bench("unrolled", unrolled, x, ws)
    o_s = bench("scan", scanned, x, ws)
    import numpy as np

    dx_u, dw_u = o_u, o_s  # grads (dx, dws) tuples
    for a, b in zip(jax.tree_util.tree_leaves(dx_u),
                    jax.tree_util.tree_leaves(dw_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("grads bitwise equal", flush=True)


if __name__ == "__main__":
    main()
