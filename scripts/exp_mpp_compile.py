"""Bisect the MPP fused-train COMPILE time (bs=1024 measured ~245 s vs ~34 s
supervised). Times jit(...).lower().compile() of the optimizer step with the
persistent compilation cache DISABLED, for a sequence of variants:

  sup        supervised fused-train step (control)
  mpp        full MPP fused-train step
  mpp-nocorr MPP step with corruption replaced by identity (fixed mask)
  mpp-nohead MPP step with the custom-VJP recon head replaced by plain MSE
  mpp-b256   full MPP step at bs=256 (does compile scale with batch?)

usage: exp_mpp_compile.py [variant ...]   (default: all)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.train.trainer import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict


def build_trainer(bs, mpp: bool):
    table = load_patch_table(6, 2)
    raw = {
        "data": {"task": "scan_age", "configuration": "template"},
        "mesh_resolution": {"ico_mesh": 6, "ico_grid": 2},
        "model": {"dim": 192, "depth": 12, "heads": 3, "mlp_dim": 768},
        "training": {"LR": 3e-4, "bs": bs, "epochs": 1},
        "optimisation": {"optimiser": "Adam"},
    }
    if mpp:
        raw["SSL"] = "mpp"
        raw["pretraining_mpp"] = {
            "mask_prob": 0.75, "replace_prob": 0.8, "swap_prob": 0.02,
        }
    exp = from_dict(raw)
    return Trainer(exp, patch_table=table.indices)


def time_compile(tag, trainer, bs, tokens_dim):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, 320, tokens_dim), jnp.bfloat16)
    state = trainer.init_state(x[:1])
    w = jnp.ones((bs,), jnp.float32)
    tgt = (
        jnp.zeros((bs, 1), jnp.float32)
        if trainer.exp.mpp is None
        else None
    )

    def step(state, batch, tgt, w):
        return trainer._optimizer_step(state, batch, tgt, w, True)

    t0 = time.perf_counter()
    lowered = jax.jit(step).lower(state, x, tgt, w)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_comp = time.perf_counter() - t0
    print(f"{tag:12s} bs={bs:5d}: lower {t_lower:6.1f} s  compile {t_comp:6.1f} s",
          flush=True)


def main():
    variants = sys.argv[1:] or ["sup", "mpp", "mpp-nocorr", "mpp-nohead",
                                "mpp-b256"]
    for v in variants:
        if v == "sup":
            time_compile("sup", build_trainer(1024, False), 1024, 612)
        elif v == "mpp":
            time_compile("mpp", build_trainer(1024, True), 1024, 612)
        elif v == "mpp-b256":
            time_compile("mpp-b256", build_trainer(256, True), 256, 612)
        elif v == "mpp-nocorr":
            import surface_vision_transformers_tpu.models.fused as F

            orig = F.fused_mpp_loss.__globals__["corrupt_sequence"]

            def no_corrupt(key, tokens, mask_token, **kw):
                B, L, _ = tokens.shape
                mask = jnp.zeros((B, L), bool).at[:, :240].set(True)
                return tokens, mask, 240

            F.fused_mpp_loss.__globals__["corrupt_sequence"] = no_corrupt
            try:
                time_compile("mpp-nocorr", build_trainer(1024, True), 1024, 612)
            finally:
                F.fused_mpp_loss.__globals__["corrupt_sequence"] = orig
        elif v == "mpp-nohead":
            import surface_vision_transformers_tpu.models.fused as F

            orig = F.fused_mpp_loss.__globals__["_masked_mse_recon"]

            def plain_head(cdt, h, kernel, bias, target, maskw, inv_denom):
                recon = h.astype(jnp.float32) @ kernel.astype(jnp.float32) \
                    + bias.astype(jnp.float32)
                d = recon - target.astype(jnp.float32)
                return jnp.sum(maskw[:, :, None] * d * d) * inv_denom

            F.fused_mpp_loss.__globals__["_masked_mse_recon"] = plain_head
            try:
                time_compile("mpp-nohead", build_trainer(1024, True), 1024, 612)
            finally:
                F.fused_mpp_loss.__globals__["_masked_mse_recon"] = orig
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
