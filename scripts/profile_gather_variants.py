"""Variant hunt for the patchify gather superlinearity.

Measures:
  A. fused_patch_embed alone at B in {64, 128, 256, 512, 1024}
  B. full model with the GATHER ONLY chunked via lax.map (chunk 256 / 128)
     at B=1024
  C. full model microbatched (lax.map over fused_forward) at chunk 128
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.models.fused import fused_forward
from surface_vision_transformers_tpu.ops import fused_patch_embed


from bench import timed_scan  # single timing methodology (bench.py docstring)


def main():
    table = load_patch_table(6, 2)
    key = jax.random.PRNGKey(0)
    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, patch_table=table.indices)
    params = model.init(key, jnp.zeros((1, 4, 40962)))
    p = params["params"] if "params" in params else params

    # A: patch_embed alone across batch sizes
    for bs in (64, 128, 256, 512, 1024):
        x = jax.random.normal(key, (bs, 4, 40962), jnp.bfloat16)

        def pe(pp, xx, i):
            return fused_patch_embed(
                xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7),
                model.patch_table, pp["patch_embedding_kernel"],
                pp["patch_embedding_bias"], compute_dtype=jnp.bfloat16,
            ).mean().astype(jnp.float32)

        dt = timed_scan(pe, (p, x), iters=11)
        print(f"A pe-only B={bs}: {dt*1e3:7.3f} ms  "
              f"({dt*1e6/bs:5.2f} us/surface)")

    # B: full model, gather chunked internally
    bs = 1024
    x = jax.random.normal(key, (bs, 4, 40962), jnp.bfloat16)
    for chunk in (128, 256):
        chunks = bs // chunk

        def full_chunked_pe(pp, xx, i):
            xx = xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
            pr = pp["params"]

            def one(c):
                return fused_patch_embed(
                    c, model.patch_table, pr["patch_embedding_kernel"],
                    pr["patch_embedding_bias"], compute_dtype=jnp.bfloat16,
                )

            tokens = jax.lax.map(
                one, xx.reshape(chunks, chunk, 4, 40962)
            ).reshape(bs, 320, 192)
            # rest of fused_forward, re-run from tokens
            import surface_vision_transformers_tpu.models.fused as F
            dt_ = model.dtype
            B, n = tokens.shape[0], tokens.shape[1]
            cls = jnp.broadcast_to(pr["cls_token"].astype(dt_), (B, 1, model.dim))
            h = jnp.concatenate([cls, tokens], axis=1)
            h = h + pr["pos_embedding"][:, : n + 1].astype(dt_)
            n_pad = -(-(n + 1) // 8) * 8
            h = jnp.pad(h, [(0, 0), (0, n_pad - (n + 1)), (0, 0)])
            from surface_vision_transformers_tpu.ops.pallas.fused_block import (
                fused_block, fused_block_cls)
            enc = pr["encoder"]
            for li in range(model.depth):
                a = enc[f"layers_{li}_attn"]
                m = enc[f"layers_{li}_mlp"]
                bf = fused_block_cls if li == model.depth - 1 else fused_block
                h = bf(h, a["norm"]["scale"], a["norm"]["bias"],
                       a["to_qkv"]["kernel"].astype(dt_),
                       a["to_out"]["kernel"].astype(dt_), a["to_out"]["bias"],
                       m["norm"]["scale"], m["norm"]["bias"],
                       m["fc1"]["kernel"].astype(dt_), m["fc1"]["bias"],
                       m["fc2"]["kernel"].astype(dt_), m["fc2"]["bias"],
                       heads=model.heads, dim_head=model.dim_head,
                       valid_len=n + 1)
            pooled = h[:, 0]
            out = F._layer_norm(pooled, pr["head_norm"]["scale"].astype(jnp.float32),
                                pr["head_norm"]["bias"].astype(jnp.float32))
            out = out @ pr["head"]["kernel"].astype(jnp.float32) + pr["head"][
                "bias"].astype(jnp.float32)
            return out.mean().astype(jnp.float32)

        dt = timed_scan(full_chunked_pe, (params, x), iters=11)
        print(f"B full, gather-chunk={chunk}, B=1024: {dt*1e3:7.3f} ms "
              f"({bs/dt:8.1f} surf/s)")

    # C: full microbatch chunk=128
    for chunk in (128,):
        chunks = bs // chunk

        def micro(pp, xx, i):
            xr = (xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)).reshape(
                chunks, chunk, 4, 40962)
            outs = jax.lax.map(lambda c: fused_forward(model, pp, c), xr)
            return outs.mean().astype(jnp.float32)

        dt = timed_scan(micro, (params, x), iters=11)
        print(f"C micro{chunk} B=1024: {dt*1e3:7.3f} ms ({bs/dt:8.1f} surf/s)")


if __name__ == "__main__":
    main()
