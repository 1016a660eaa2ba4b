"""MS-SiT profile round 2: pick the shipped window/mix policy.

Round 1 (exp_mssit_profile.py, same session): axial's fold/unfold transposes
relayout the full qkv in HBM (w=64 axial 319 surf/s vs parent 460 at B=32);
w=256 windows beat w=64 (348 vs 319 — larger GEMMs tile better, and the
packed flash kernel applies at 128-multiple window lengths). This round
completes the grid and checks the embed cost floor.
"""

import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import timed_scan
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import MSSiT
from surface_vision_transformers_tpu.ops import fused_patch_embed
from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

assert jax.default_backend() == "tpu", jax.default_backend()
enable_compilation_cache()

TABLE = load_patch_table(6, 5).indices
B = 32
KEY = jax.random.PRNGKey(0)


def fwd_point(name, model, iters=11):
    x = jax.random.normal(KEY, (B, 4, 40962), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 40962)))

    def step(p, xx, i):
        return model.apply(
            p, xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
        ).mean().astype(jnp.float32)

    dt = timed_scan(step, (params, x), iters=iters)
    print(f"{name:36s} fwd {dt*1e3:8.2f} ms/b{B}  {B/dt:9.0f} surf/s",
          flush=True)
    return B / dt


def embed_floor():
    """Cost of patchify+embed alone (the stage-0 input gather)."""
    x = jax.random.normal(KEY, (B, 4, 40962), jnp.bfloat16)
    k = jax.random.normal(KEY, (24, 96), jnp.float32)
    b = jnp.zeros((96,), jnp.float32)

    def step(xx, i):
        t = fused_patch_embed(
            xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7), TABLE, k, b,
            compute_dtype=jnp.bfloat16,
        )
        return t.mean().astype(jnp.float32)

    dt = timed_scan(step, (x,), iters=11)
    print(f"{'patchify+embed floor':36s} fwd {dt*1e3:8.2f} ms/b{B}", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}; B={B}")
    embed_floor()
    fwd_point("w=256 parent", MSSiT(patch_table=TABLE, window=256,
                                    cross_mix="parent"))
    fwd_point("w=256 none", MSSiT(patch_table=TABLE, window=256,
                                  cross_mix="none"))
    fwd_point("w=64 parent xla", MSSiT(patch_table=TABLE, cross_mix="parent",
                                       attn_backend="xla"))
    fwd_point("w=1024 none", MSSiT(patch_table=TABLE, window=1024,
                                   cross_mix="none"))
    fused_points()
    fwd_point("w=256 parent B=64",
              MSSiT(patch_table=TABLE, window=256, cross_mix="parent"))


def fused_points():
    from surface_vision_transformers_tpu.models.fused_mssit import (
        fused_mssit_forward,
    )
    from surface_vision_transformers_tpu.train.trainer import Trainer  # noqa: F401

    for name, kw in (
        ("FUSED w=64 axial", {}),
        ("FUSED w=64 parent", {"cross_mix": "parent"}),
        ("FUSED w=256 parent", {"window": 256, "cross_mix": "parent"}),
    ):
        model = MSSiT(patch_table=TABLE, **kw)
        x = jax.random.normal(KEY, (B, 4, 40962), jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 40962)))

        def step(p, xx, i, m=model):
            return fused_mssit_forward(
                m, p, xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
            ).mean().astype(jnp.float32)

        dt = timed_scan(step, (params, x), iters=11)
        print(f"{name:36s} fwd {dt*1e3:8.2f} ms/b{B}  {B/dt:9.0f} surf/s",
              flush=True)
