"""Decompose the ~15 ms/step of non-value_and_grad overhead in the epoch
scan at bs=1024 (epoch 182.4 ms/step vs vg 165 + permute 2.6)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from bench import timed_scan
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.models.fused import fused_train_forward
from surface_vision_transformers_tpu.train.optim import build_optimizer
from surface_vision_transformers_tpu.utils.config import OptimConfig

import optax


def main():
    key = jax.random.PRNGKey(0)
    n, bs = 8192, 1024
    table = load_patch_table(6, 2)
    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, patch_table=table.indices)
    params = model.init(key, jnp.zeros((1, 4, 40962)))["params"]
    data = jax.random.normal(key, (n, 4, 40962), jnp.bfloat16)
    labels = jax.random.normal(key, (n,))
    xb, yb = data[:bs], labels[:bs]

    tx = optax.flatten(build_optimizer(OptimConfig(name="SGD", lr=1e-5,
                                                   momentum=0.9)))
    opt_state = tx.init(params)

    def vg(p, x, y):
        def loss_fn(p):
            preds = fused_train_forward(model, {"params": p}, x)
            preds = preds.reshape(preds.shape[0], -1).squeeze(-1)
            return jnp.mean(jnp.square(preds - y))

        return jax.value_and_grad(loss_fn)(p)

    # A: vg on a fixed batch
    def step_a(p, x, y, i):
        l, g = vg(p, x + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7), y)
        return l + jax.tree.leaves(g)[0].astype(jnp.float32).ravel()[0]

    dt = timed_scan(lambda x, y, i: step_a(params, x, y, i), (xb, yb), iters=7)
    print(f"A vg fixed batch:          {dt*1e3:7.1f} ms", flush=True)

    # B: + dynamic_slice the batch out of the full dataset
    def step_b(p, d, y, i):
        ii = (i % (n // bs)).astype(jnp.int32)
        x = jax.lax.dynamic_slice_in_dim(d, ii * bs, bs, axis=0)
        yy = jax.lax.dynamic_slice_in_dim(y, ii * bs, bs, axis=0)
        l, g = vg(p, x, yy)
        return l + jax.tree.leaves(g)[0].astype(jnp.float32).ravel()[0]

    dt = timed_scan(lambda d, y, i: step_b(params, d, y, i), (data, labels),
                    iters=7)
    print(f"B + slice from dataset:    {dt*1e3:7.1f} ms", flush=True)

    # C: + optimizer update (flattened SGD momentum)
    def step_c(carry, i, d, y):
        p, os_ = carry
        ii = (i % (n // bs)).astype(jnp.int32)
        x = jax.lax.dynamic_slice_in_dim(d, ii * bs, bs, axis=0)
        yy = jax.lax.dynamic_slice_in_dim(y, ii * bs, bs, axis=0)
        l, g = vg(p, x, yy)
        up, os_ = tx.update(g, os_, p)
        p = optax.apply_updates(p, up)
        return (p, os_), l

    import functools

    @functools.partial(jax.jit, static_argnums=(4,))
    def epoch_c(p, os_, d, y, k):
        (p, os_), ls = jax.lax.scan(
            lambda c, i: step_c(c, i, d, y), (p, os_), jnp.arange(k))
        return ls.mean() + jax.tree.leaves(p)[0].astype(jnp.float32).ravel()[0]

    import time
    for k in (1, 8):
        float(epoch_c(params, opt_state, data, labels, k))
    t0 = time.perf_counter(); float(epoch_c(params, opt_state, data, labels, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(epoch_c(params, opt_state, data, labels, 8)); t8 = time.perf_counter() - t0
    print(f"C full step in scan:       {(t8-t1)/7*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
