"""Per-shape sweep of the flattened block group size: SiT-small regressed
under the G=8 default while tiny/base improved — find the right G rule."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from bench import timed_scan  # single timing methodology (bench.py docstring)
from surface_vision_transformers_tpu.ops.pallas.fused_block import fused_block


def main():
    key = jax.random.PRNGKey(0)
    B = 256
    for name, dim, heads, N in (
        ("tiny", 192, 3, 328), ("small", 384, 6, 328), ("base", 768, 12, 328),
        ("tiny-sub1", 192, 3, 88),
    ):
        dh, mlp, hd = 64, 4 * dim, heads * 64
        ks = jax.random.split(key, 6)
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
        vl = N - 7
        for G in (2, 4, 8):
            def run(xx, i, G=G):
                h = xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
                for _ in range(12):
                    h = fused_block(h, *args, heads=heads, dim_head=dh,
                                    valid_len=vl, group=G)
                return h.astype(jnp.float32).mean()

            dt = timed_scan(run, (x,), iters=7)
            print(f"{name} G={G}: {dt/12*1e3:6.3f} ms/block", flush=True)


if __name__ == "__main__":
    main()
