"""MS-SiT scan_blocks A/B at the shipped config (96/(2,2,6,2), w=64, ico-6):
train-step first-compile time (cold persistent cache) and steady step time.
Shipped depths give scan savings in stage 2 (6 blocks -> one 2-block cycle)
and stage 3 (2 -> 1): 12 kernel-pair compiles -> 7.

Run on the bench chip: python scripts/exp_mssit_scan.py [scan0|scan1 ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from bench import timed_scan
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import MSSiT
from surface_vision_transformers_tpu.models.fused_mssit import (
    fused_mssit_train_forward,
)

TABLE = load_patch_table(6, 5).indices
B = 32


def run(scan: bool):
    model = MSSiT(patch_table=TABLE)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 40962), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 40962)))

    def loss(p, xx):
        out = fused_mssit_train_forward(model, p, xx, scan_blocks=scan)
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)
    t0 = time.perf_counter()
    lowered = jax.jit(g).lower(params, x)
    t_l = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_c = time.perf_counter() - t0

    def step(p, xx, i):
        gr = g(p, xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7))
        return jax.tree_util.tree_leaves(gr)[0].mean().astype(jnp.float32)

    dt = timed_scan(step, (params, x), iters=7)
    print(f"mssit scan={int(scan)}: lower {t_l:5.1f} s  compile {t_c:6.1f} s  "
          f"train-fwd+bwd {dt*1e3:8.2f} ms/b{B}  {B/dt:7.1f} surf/s",
          flush=True)


def main():
    variants = sys.argv[1:] or ["scan0", "scan1"]
    for v in variants:
        run(v == "scan1")


if __name__ == "__main__":
    main()
