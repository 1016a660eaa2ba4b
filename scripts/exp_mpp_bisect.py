"""Bisect the r3 MPP changes at bs=1024 (tokens-cache vs bf16 recon head):
usage: exp_mpp_bisect.py [tokens|head|both|none]"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.train.trainer import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict

mode = sys.argv[1] if len(sys.argv) > 1 else "both"


def main():
    key = jax.random.PRNGKey(0)
    table = load_patch_table(6, 2)
    n, bs = 4096, 1024
    x = jax.random.normal(key, (n, 4, 40962), jnp.bfloat16)
    exp = from_dict({
        "data": {"task": "scan_age", "configuration": "template"},
        "mesh_resolution": {"ico_mesh": 6, "ico_grid": 2},
        "model": {"dim": 192, "depth": 12, "heads": 3, "mlp_dim": 768},
        "training": {"LR": 3e-4, "bs": bs, "epochs": 1},
        "optimisation": {"optimiser": "Adam"},
        "SSL": "mpp",
        "pretraining_mpp": {"mask_prob": 0.75, "replace_prob": 0.8,
                            "swap_prob": 0.02},
    })
    trainer = Trainer(exp, patch_table=table.indices)
    if mode in ("head", "none"):
        trainer._mpp_tokens = lambda d: d  # disable the tokens cache
    if mode in ("tokens", "none"):
        # revert fused_mpp_loss to autodiff of the fp32 head
        from surface_vision_transformers_tpu.models import fused as F

        def plain_head(cdt, h, kernel, bias, target, maskw, inv_denom):
            recon = h.astype(jnp.float32) @ kernel.astype(jnp.float32) \
                + bias.astype(jnp.float32)
            d = recon - target.astype(jnp.float32)
            return jnp.sum(maskw[:, :, None] * d * d) * inv_denom

        F.fused_mpp_loss.__globals__["_masked_mse_recon"] = plain_head

    state = trainer.init_state(x[:1])
    t0 = time.perf_counter()
    state, _ = trainer.train_epoch(state, x, None)  # compile
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, _ = trainer.train_epoch(state, x, None)
    dt = time.perf_counter() - t0
    print(f"mode={mode} bs={bs}: {n / dt:8.1f} surf/s  (epoch {dt*1e3:.1f} ms,"
          f" compile {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
