"""Decompose B=1024 vs B=256 inference time on the real chip.

Times, with bench.py's on-device-scan methodology:
  1. fused_patch_embed alone          (gather + embed GEMM)
  2. full fused_forward               (headline path)
  3. microbatched fused_forward       (lax.map over 256-sample chunks)
to find where B=1024 loses ~5%/surface vs B=256 and whether fixed-size
microbatching recovers it.
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

    for bs in (256, 512, 1024):
        x = jax.random.normal(key, (bs, 4, 40962), jnp.bfloat16)

        def pe(pp, xx, i):
            return fused_patch_embed(
                xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7),
                model.patch_table, pp["patch_embedding_kernel"],
                pp["patch_embedding_bias"], compute_dtype=jnp.bfloat16,
            ).mean().astype(jnp.float32)

        def full(pp, xx, i):
            # microbatch=None: measure the WHOLE-batch path (fused_forward
            # now defaults to 256-sample tiles, which is the micro column)
            return fused_forward(
                model, pp, xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7),
                microbatch=None,
            ).mean().astype(jnp.float32)

        dt_pe = timed_scan(pe, (p, x), iters=11)
        dt_full = timed_scan(full, (params, x), iters=11)
        line = (f"B={bs}: patch_embed {dt_pe*1e3:7.3f} ms  "
                f"full {dt_full*1e3:7.3f} ms  "
                f"({bs/dt_full:8.1f} surf/s)")

        if bs > 256:
            chunks = bs // 256

            def micro(pp, xx, i):
                xr = (xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)).reshape(
                    chunks, 256, 4, 40962)
                outs = jax.lax.map(lambda c: fused_forward(model, pp, c), xr)
                return outs.mean().astype(jnp.float32)

            dt_micro = timed_scan(micro, (params, x), iters=11)
            line += (f"  micro256 {dt_micro*1e3:7.3f} ms "
                     f"({bs/dt_micro:8.1f} surf/s)")
        print(line)


if __name__ == "__main__":
    main()
