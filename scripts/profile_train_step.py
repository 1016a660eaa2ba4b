"""Decompose the training step at bs=1024 on the real chip.

All timings use the on-device lax.scan methodology ((t_n - t_1)/(n-1),
scalar fetch) — through this relay, block_until_ready returns before
execution, so naive per-call timing lies (docs/design.md §4).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import time

import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.models.fused import fused_train_forward
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict


from bench import timed_scan  # single timing methodology (bench.py docstring)


def main():
    key = jax.random.PRNGKey(0)
    n, bs = 8192, 1024
    data = jax.random.normal(key, (n, 4, 40962), jnp.bfloat16)
    labels = jax.random.normal(key, (n,))

    # 1. whole-dataset permutation gather
    def permute(d, i):
        # reduce over ALL outputs — a single-element demand would let XLA
        # shrink the gather to one row and under-measure it. Accumulate the
        # sum in fp32 WITHOUT an astype (the materialized 5.4 GB f32 cast
        # never finished compiling on the remote-compile relay).
        perm = jax.random.permutation(jax.random.fold_in(key, i), n)
        return jnp.take(d, perm, axis=0).sum(dtype=jnp.float32) * 1e-9

    dt = timed_scan(permute, (data,), iters=5)
    gb = data.size * 2 * 2 / 1e9
    print(f"permute n={n}: {dt*1e3:7.1f} ms ({gb/dt:.0f} GB/s) "
          f"-> {dt/ (n // bs) * 1e3:.1f} ms/step at bs={bs}")

    table = load_patch_table(6, 2)
    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, patch_table=table.indices)
    exp = from_dict({
        "resolution": {"ico": 6, "sub_ico": 2},
        "transformer": {"dim": 192, "depth": 12, "heads": 3, "mlp_dim": 768},
        "training": {"LR": 1e-5, "bs": bs, "epochs": 1},
        "optimisation": {"optimiser": "SGD"},
        "SGD": {"momentum": 0.9},
    })
    trainer = Trainer(exp, model=model)
    state = trainer.init_state(data[:1])
    xb, yb = data[:bs], labels[:bs]

    # 2. train-forward only (fused blocks, differentiable variant)
    def fwd_only(p, x, i):
        return fused_train_forward(
            model, {"params": p}, x + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
        ).astype(jnp.float32).mean()

    dt_f = timed_scan(fwd_only, (state.params, xb), iters=7)
    print(f"train-forward only:  {dt_f*1e3:7.1f} ms")

    # 3. value_and_grad (fwd + all backward kernels)
    def vg(p, x, y, i):
        def loss_fn(p):
            preds = fused_train_forward(
                model, {"params": p},
                x + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7))
            preds = preds.reshape(preds.shape[0], -1).squeeze(-1)
            return jnp.mean(jnp.square(preds - y))

        l, g = jax.value_and_grad(loss_fn)(p)
        return l + jax.tree.leaves(g)[0].astype(jnp.float32).ravel()[0]

    dt_vg = timed_scan(vg, (state.params, xb, yb), iters=7)
    print(f"value_and_grad:      {dt_vg*1e3:7.1f} ms "
          f"(bwd+opt headroom vs epoch step below)")

    # 4. whole epoch through the trainer (includes permute, slicing, optimizer)
    t0 = time.perf_counter()
    state, _ = trainer.train_epoch(state, data, labels)
    print(f"epoch compile+run: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    state, m = trainer.train_epoch(state, data, labels)
    e = time.perf_counter() - t0
    print(f"trainer epoch: {e*1e3:7.1f} ms  ({n/e:.0f} surf/s, "
          f"{e / (n // bs) * 1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
