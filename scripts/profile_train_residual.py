"""Locate the train-step backward residual: vg(raw input) was 167.9 ms at
bs=1024 while 11 flattened block-bwds + fwd predict ~130 — measure
(a) vg with PRE-PATCHED input (no patchify fwd/bwd),
(b) blocks-only grad (no embed/head),
to attribute the difference."""

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
from surface_vision_transformers_tpu.ops.pallas.fused_block import (
    fused_block_train,
)


def main():
    key = jax.random.PRNGKey(0)
    bs = 1024
    table = load_patch_table(6, 2)
    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, patch_table=table.indices)
    params = model.init(key, jnp.zeros((1, 4, 40962)))
    p = params["params"]
    y = jax.random.normal(key, (bs,))

    x_raw = jax.random.normal(key, (bs, 4, 40962), jnp.bfloat16)
    x_pre = jax.random.normal(key, (bs, 4, 320, 153), jnp.bfloat16)

    def vg(xx, i, pre):
        def loss_fn(pp):
            preds = fused_train_forward(
                model, {"params": pp},
                xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7))
            preds = preds.reshape(preds.shape[0], -1).squeeze(-1)
            return jnp.mean(jnp.square(preds - y))

        l, g = jax.value_and_grad(loss_fn)(p)
        return l + jax.tree.leaves(g)[0].astype(jnp.float32).ravel()[0]

    dt_raw = timed_scan(lambda xx, i: vg(xx, i, False), (x_raw,), iters=7)
    print(f"vg raw input:        {dt_raw*1e3:7.1f} ms", flush=True)
    dt_pre = timed_scan(lambda xx, i: vg(xx, i, True), (x_pre,), iters=7)
    print(f"vg pre-patched:      {dt_pre*1e3:7.1f} ms "
          f"(patchify fwd+bwd = {(dt_raw-dt_pre)*1e3:.1f})", flush=True)

    # blocks-only: grads through 11 full + implicit cls-last via mean loss
    h0 = jax.random.normal(key, (bs, 328, 192), jnp.bfloat16)
    enc = p["encoder"]

    def blocks_grad(hh, i):
        def loss_fn(ep):
            h = hh + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
            for li in range(11):
                a = ep[f"layers_{li}_attn"]
                m = ep[f"layers_{li}_mlp"]
                h = fused_block_train(
                    h, a["norm"]["scale"], a["norm"]["bias"],
                    a["to_qkv"]["kernel"].astype(jnp.bfloat16),
                    a["to_out"]["kernel"].astype(jnp.bfloat16),
                    a["to_out"]["bias"],
                    m["norm"]["scale"], m["norm"]["bias"],
                    m["fc1"]["kernel"].astype(jnp.bfloat16), m["fc1"]["bias"],
                    m["fc2"]["kernel"].astype(jnp.bfloat16), m["fc2"]["bias"],
                    3, 64, 321)
            return jnp.mean(h.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss_fn)(enc)
        return l + jax.tree.leaves(g)[0].astype(jnp.float32).ravel()[0]

    dt_blk = timed_scan(blocks_grad, (h0,), iters=7)
    print(f"11-block fwd+bwd:    {dt_blk*1e3:7.1f} ms "
          f"({dt_blk/11*1e3:.2f} ms/block both ways)", flush=True)


if __name__ == "__main__":
    main()


def one_block(argv=None):
    """1-block value_and_grad vs isolated fwd/bwd kernels: if the +38%
    chain overhead already shows at depth 1 it is per-VJP-wrapper; if not,
    it is chain-level (residual threading)."""
    key = jax.random.PRNGKey(0)
    bs = 1024
    table = load_patch_table(6, 2)
    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, patch_table=table.indices)
    params = model.init(key, jnp.zeros((1, 4, 40962)))
    enc = params["params"]["encoder"]
    h0 = jax.random.normal(key, (bs, 328, 192), jnp.bfloat16)

    def nblock_grad(hh, i, depth):
        def loss_fn(ep):
            h = hh + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
            for li in range(depth):
                a = ep[f"layers_{li}_attn"]
                m = ep[f"layers_{li}_mlp"]
                h = fused_block_train(
                    h, a["norm"]["scale"], a["norm"]["bias"],
                    a["to_qkv"]["kernel"].astype(jnp.bfloat16),
                    a["to_out"]["kernel"].astype(jnp.bfloat16),
                    a["to_out"]["bias"],
                    m["norm"]["scale"], m["norm"]["bias"],
                    m["fc1"]["kernel"].astype(jnp.bfloat16), m["fc1"]["bias"],
                    m["fc2"]["kernel"].astype(jnp.bfloat16), m["fc2"]["bias"],
                    3, 64, 321)
            return jnp.mean(h.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss_fn)(enc)
        return l + jax.tree.leaves(g)[0].astype(jnp.float32).ravel()[0]

    for depth in (1, 2, 4):
        dt = timed_scan(lambda hh, i, d=depth: nblock_grad(hh, i, d),
                        (h0,), iters=7)
        print(f"{depth}-block vg: {dt*1e3:7.2f} ms "
              f"({dt/depth*1e3:.2f} ms/block)", flush=True)
