"""Profile the MPP pretraining step's corruption pipeline (VERDICT r2 #2):
mpp_pretrain ran 4,358 surf/s at bs=512 vs 4,941 supervised — locate the
~14 ms/step gap (top_k masking? swap gather? masked-MSE traffic?)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from bench import timed_scan
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import MPP, SiT
from surface_vision_transformers_tpu.models.fused import fused_mpp_loss
from surface_vision_transformers_tpu.models.mpp import (
    corrupt_sequence, exact_count_mask,
)
from surface_vision_transformers_tpu.ops import patchify


def main():
    key = jax.random.PRNGKey(0)
    bs = 512
    table = load_patch_table(6, 2)
    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, patch_table=table.indices)
    mpp = MPP(encoder=model, mask_prob=0.75, replace_prob=0.8, swap_prob=0.02)
    x = jax.random.normal(key, (bs, 4, 40962), jnp.bfloat16)
    params = mpp.init({"params": key}, x[:1], jax.random.PRNGKey(1))["params"]
    tokens = patchify(x, table.indices)  # (bs, 320, 612)

    # 1. exact_count_mask alone (rand + top_k(240) + scatter)
    def mask_only(t, i):
        m, _ = exact_count_mask(jax.random.fold_in(key, i), bs, 320, 0.75)
        return m.sum().astype(jnp.float32) + t[0, 0, 0].astype(jnp.float32)

    print(f"exact_count_mask:      {timed_scan(mask_only, (tokens,), iters=21)*1e3:7.2f} ms",
          flush=True)

    # 2. full corrupt_sequence
    def corrupt_only(t, i):
        c, m, _ = corrupt_sequence(
            jax.random.fold_in(key, i), t, params["mask_token"],
            mask_prob=0.75, replace_prob=0.8, swap_prob=0.02)
        return c.astype(jnp.float32).mean() + m.sum().astype(jnp.float32)

    print(f"corrupt_sequence:      {timed_scan(corrupt_only, (tokens,), iters=21)*1e3:7.2f} ms",
          flush=True)

    # 3. patchify (raw -> tokens)
    def patch_only(xx, i):
        t = patchify(xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7),
                     table.indices)
        return t.astype(jnp.float32).mean()

    print(f"patchify:              {timed_scan(patch_only, (x,), iters=21)*1e3:7.2f} ms",
          flush=True)

    # 4. full MPP vg step
    def vg(xx, i):
        def loss_fn(p):
            loss, _ = fused_mpp_loss(
                mpp, {"params": p},
                xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7),
                jax.random.fold_in(key, i))
            return loss

        l, g = jax.value_and_grad(loss_fn)(params)
        return l + jax.tree.leaves(g)[0].astype(jnp.float32).ravel()[0]

    print(f"mpp vg full:           {timed_scan(vg, (x,), iters=7)*1e3:7.2f} ms",
          flush=True)

    # 5. vg with a FIXED corruption (no rng/top_k/swap work in the step)
    c0, m0, nm = jax.jit(lambda t: corrupt_sequence(
        key, t, params["mask_token"], mask_prob=0.75, replace_prob=0.8,
        swap_prob=0.02))(tokens)

    def vg_fixed(tt, cc, i):
        def loss_fn(p):
            # replicate fused_mpp_loss's post-corruption math directly
            from surface_vision_transformers_tpu.models.fused import (
                _fused_encoder_blocks,
            )

            ep = p["encoder"]
            dt = model.dtype
            tok = cc.astype(dt) @ ep["patch_embedding_kernel"].astype(dt) + ep[
                "patch_embedding_bias"].astype(dt)
            B, n = tok.shape[0], tok.shape[1]
            cls = jnp.broadcast_to(ep["cls_token"].astype(dt), (B, 1, 192))
            h = jnp.concatenate([cls, tok], axis=1)
            h = h + ep["pos_embedding"][:, : n + 1].astype(dt)
            h = jnp.pad(h, [(0, 0), (0, 328 - (n + 1)), (0, 0)])
            h = _fused_encoder_blocks(model, ep["encoder"], h, n + 1)
            h = h[:, 1:n + 1]
            recon = h.astype(jnp.float32) @ p["to_original"]["kernel"].astype(
                jnp.float32) + p["to_original"]["bias"].astype(jnp.float32)
            err = jnp.square(recon - (tt.astype(jnp.float32)
                                      + i.astype(jnp.float32) * 0))
            masked = jnp.where(m0[:, :, None], err, 0.0)
            return masked.sum() / (B * nm * 612)

        l, g = jax.value_and_grad(loss_fn)(params)
        return l + jax.tree.leaves(g)[0].astype(jnp.float32).ravel()[0]

    print(f"mpp vg fixed-corrupt:  {timed_scan(vg_fixed, (tokens, c0), iters=7)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
