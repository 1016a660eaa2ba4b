"""Sweep the FLATTENED backward kernel's group size on the chip, plus a
value_and_grad step time at the winning G."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from bench import timed_scan  # single timing methodology (bench.py docstring)
from surface_vision_transformers_tpu.ops.pallas.fused_block import (
    _block_bwd, fused_block,
)


def main():
    key = jax.random.PRNGKey(0)
    B, N, dim, heads, dh, mlp = 256, 328, 192, 3, 64, 768
    hd = heads * dh
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (B, N, dim), jnp.bfloat16)
    gct = jax.random.normal(ks[5], (B, N, dim), jnp.bfloat16)
    args = (
        jnp.ones((dim,), jnp.float32), jnp.zeros((dim,), jnp.float32),
        (jax.random.normal(ks[1], (dim, 3 * hd)) * 0.05).astype(jnp.bfloat16),
        (jax.random.normal(ks[2], (hd, dim)) * 0.05).astype(jnp.bfloat16),
        jnp.zeros((dim,), jnp.float32),
        jnp.ones((dim,), jnp.float32), jnp.zeros((dim,), jnp.float32),
        (jax.random.normal(ks[3], (dim, mlp)) * 0.05).astype(jnp.bfloat16),
        jnp.zeros((mlp,), jnp.float32),
        (jax.random.normal(ks[4], (mlp, dim)) * 0.05).astype(jnp.bfloat16),
    )
    vl = 321

    # forward block timing (flattened, shipped defaults)
    def run_fwd(xx, i):
        h = xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
        for _ in range(12):
            h = fused_block(
                h, *args, jnp.zeros((dim,), jnp.float32),
                heads=heads, dim_head=dh, valid_len=vl)
        return h.astype(jnp.float32).mean()

    dt = timed_scan(run_fwd, (x,), iters=11)
    print(f"fwd (shipped, flattened) x12: {dt*1e3:7.3f} ms "
          f"({dt/12*1e3:.3f} ms/block)")

    ref = None
    for G in (1, 2, 4, 8):
        def run_bwd(xx, i, G=G):
            outs = _block_bwd(
                xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7), gct,
                *args, heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
                group=G)
            return sum(o.astype(jnp.float32).mean() for o in outs)

        out_g = jax.jit(lambda xx: _block_bwd(
            xx, gct, *args, heads=heads, dim_head=dh, valid_len=vl,
            ln_eps=1e-5, group=G))(x)
        if ref is None:
            ref = out_g
        else:
            for i, (a, b) in enumerate(zip(ref, out_g)):
                d = np.abs(np.asarray(a, np.float32)
                           - np.asarray(b, np.float32)).max()
                sc = max(float(np.abs(np.asarray(b, np.float32)).max()), 1e-9)
                assert d / sc < 2e-2, (i, d, sc)

        dt = timed_scan(run_bwd, (x,), iters=7)
        print(f"bwd G={G}: {dt*1e3:7.3f} ms/block-bwd")


if __name__ == "__main__":
    main()
