"""A/B the backward block kernel's prob-cache vs recompute modes across G,
isolated-kernel AND epoch-level (the trustworthy number — COMPONENTS.md
records ~2x cross-session variance on isolated backward microbenches)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from bench import timed_scan
from surface_vision_transformers_tpu.ops.pallas import fused_block as fb


def kernel_sweep():
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

    ref = None
    for cache, G in ((True, 2), (True, 4), (False, 4), (False, 8),
                     (False, 16), (True, 8)):
        def run_bwd(xx, i, G=G, cache=cache):
            outs = fb._block_bwd(
                xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7), gct,
                *args, heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
                group=G, cache_probs=cache)
            return sum(o.astype(jnp.float32).mean() for o in outs)

        out_g = jax.jit(lambda xx, G=G, cache=cache: fb._block_bwd(
            xx, gct, *args, heads=heads, dim_head=dh, valid_len=vl,
            ln_eps=1e-5, group=G, cache_probs=cache))(x)
        if ref is None:
            ref = out_g
        else:
            for i, (a, b) in enumerate(zip(ref, out_g)):
                d = np.abs(np.asarray(a, np.float32)
                           - np.asarray(b, np.float32)).max()
                sc = max(float(np.abs(np.asarray(b, np.float32)).max()), 1e-9)
                assert d / sc < 2e-2, (i, d, sc)

        dt = timed_scan(run_bwd, (x,), iters=7)
        print(f"bwd cache={int(cache)} G={G:2d}: {dt*1e3:7.3f} ms/block-bwd",
              flush=True)


if __name__ == "__main__":
    kernel_sweep()
