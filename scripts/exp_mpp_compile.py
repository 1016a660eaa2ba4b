"""Bisect the MPP fused-train COMPILE time.

Round-3 finding so far (v5e, cold cache, scan_blocks ON so the 12 block
kernels cost ~15 s instead of ~340 s):
  - supervised EPOCH (scan over 4 steps of bs=1024) compiles in ~17 s
  - the MPP STEP alone compiles in ~14 s (lower 2.6 s)
  - the MPP EPOCH compiles in ~220 s  <- the gap lives in the epoch scan
    around the corruption pipeline, not in the step body

Variants (all with tpu.scan_blocks=true):
  sup-step / mpp-step       jit(.lower().compile()) of _optimizer_step
  sup-epoch / mpp-epoch     first train_epoch call (compile + run)
  mpp-epoch-nocorr          corruption replaced by identity (fixed mask)
  mpp-epoch-nohead          custom-VJP recon head replaced by plain MSE

usage: exp_mpp_compile.py [variant ...]   (default: the epoch bisect)
"""

import contextlib
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
        # scan the block stack so kernel compiles (~15 s) don't mask the
        # XLA-glue compile this script is bisecting
        "tpu": {"scan_blocks": True},
    }
    if mpp:
        raw["SSL"] = "mpp"
        raw["pretraining_mpp"] = {
            "mask_prob": 0.75, "replace_prob": 0.8, "swap_prob": 0.02,
        }
    exp = from_dict(raw)
    return Trainer(exp, patch_table=table.indices)


def time_step_compile(tag, trainer, bs):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, 320, 612), jnp.bfloat16)
    state = trainer.init_state(x[:1])
    w = jnp.ones((bs,), jnp.float32)
    tgt = jnp.zeros((bs, 1), jnp.float32) if trainer.exp.mpp is None else None

    def step(state, batch, tgt, w):
        return trainer._optimizer_step(state, batch, tgt, w, True)

    t0 = time.perf_counter()
    lowered = jax.jit(step).lower(state, x, tgt, w)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_comp = time.perf_counter() - t0
    print(f"{tag:18s} bs={bs:5d}: lower {t_lower:6.1f} s  "
          f"compile {t_comp:6.1f} s", flush=True)


def time_epoch_compile(tag, trainer, bs, n=4096):
    key = jax.random.PRNGKey(0)
    # pre-patched input (both tasks accept it; MPP tokenizes once up front)
    x = jax.random.normal(key, (n, 4, 320, 153), jnp.bfloat16)
    tgt = None
    if trainer.exp.mpp is None:
        tgt = jax.random.normal(jax.random.PRNGKey(1), (n, 1))
    state = trainer.init_state(x[:1])
    t0 = time.perf_counter()
    trainer.train_epoch(state, x, tgt)
    t = time.perf_counter() - t0
    print(f"{tag:18s} bs={bs:5d}: first epoch {t:6.1f} s", flush=True)


@contextlib.contextmanager
def no_corruption():
    """Identity corruption (fixed mask, no top_k/scatter/swap/replace).
    fused_mpp_loss does ``from ...models.mpp import corrupt_sequence`` at
    call time, so patching the models.mpp attribute reroutes it."""
    import surface_vision_transformers_tpu.models.mpp as mpp_mod

    orig = mpp_mod.corrupt_sequence

    def no_corrupt(key, tokens, mask_token, **kw):
        B, L, _ = tokens.shape
        mask = jnp.zeros((B, L), bool).at[:, :240].set(True)
        return tokens, mask, 240

    mpp_mod.corrupt_sequence = no_corrupt
    try:
        yield
    finally:
        mpp_mod.corrupt_sequence = orig


@contextlib.contextmanager
def plain_recon_head():
    import surface_vision_transformers_tpu.models.fused as F

    orig = F._masked_mse_recon

    def plain_head(cdt, h, kernel, bias, target, maskw, inv_denom):
        recon = h.astype(jnp.float32) @ kernel.astype(jnp.float32) \
            + bias.astype(jnp.float32)
        d = recon - target.astype(jnp.float32)
        return jnp.sum(maskw[:, :, None] * d * d) * inv_denom

    F._masked_mse_recon = plain_head
    try:
        yield
    finally:
        F._masked_mse_recon = orig


def main():
    variants = sys.argv[1:] or [
        "sup-epoch", "mpp-epoch", "mpp-epoch-nocorr", "mpp-epoch-nohead",
    ]
    bs = 1024
    for v in variants:
        if v == "sup-step":
            time_step_compile(v, build_trainer(bs, False), bs)
        elif v == "mpp-step":
            time_step_compile(v, build_trainer(bs, True), bs)
        elif v == "sup-epoch":
            time_epoch_compile(v, build_trainer(bs, False), bs)
        elif v == "mpp-epoch":
            time_epoch_compile(v, build_trainer(bs, True), bs)
        elif v == "mpp-epoch-nocorr":
            with no_corruption():
                time_epoch_compile(v, build_trainer(bs, True), bs)
        elif v == "mpp-epoch-nohead":
            with plain_recon_head():
                time_epoch_compile(v, build_trainer(bs, True), bs)
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
