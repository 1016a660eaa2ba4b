"""Probe + microbench for the W8A8 int8 serving megakernel on the real chip.

1. Mosaic int8 support probe: one fused_block_int8 at the SiT-tiny shape.
2. Per-block timing, int8 vs bf16 kernel (on-device lax.scan loop).
3. End-to-end fused_forward quant="int8" vs quant=None at B=256/1024:
   surfaces/sec and logit fidelity vs the fp32 modular path.

Usage: python scripts/exp_int8_probe.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()
print = functools.partial(print, flush=True)  # cold Mosaic compiles take minutes

from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.models.fused import fused_forward
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.ops.pallas.fused_block import fused_block
from surface_vision_transformers_tpu.ops.pallas.fused_block_int8 import (
    fused_block_int8,
    quantize_block_weights,
)

print("backend:", jax.default_backend(), jax.devices()[0])

B, N, dim, heads, dh, mlp = 256, 328, 192, 3, 64, 768
rng = np.random.default_rng(0)


def mk(*s, scale=0.1):
    return jnp.asarray(rng.standard_normal(s) * scale, jnp.float32)


w = dict(
    ln1_s=mk(dim) + 1, ln1_b=mk(dim),
    w_qkv=mk(dim, 3 * heads * dh), w_out=mk(heads * dh, dim), b_out=mk(dim),
    ln2_s=mk(dim) + 1, ln2_b=mk(dim),
    w_fc1=mk(dim, mlp), b_fc1=mk(mlp), w_fc2=mk(mlp, dim), b_fc2=mk(dim),
)
x = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.bfloat16)
qs = quantize_block_weights(w["w_qkv"], w["w_out"], w["w_fc1"], w["w_fc2"])


def bf16_block(x):
    return fused_block(
        x, w["ln1_s"], w["ln1_b"], w["w_qkv"].astype(jnp.bfloat16),
        w["w_out"].astype(jnp.bfloat16), w["b_out"], w["ln2_s"], w["ln2_b"],
        w["w_fc1"].astype(jnp.bfloat16), w["b_fc1"],
        w["w_fc2"].astype(jnp.bfloat16), w["b_fc2"],
        heads=heads, dim_head=dh, valid_len=321,
    )


def int8_block(x):
    return fused_block_int8(
        x, w["ln1_s"], w["ln1_b"],
        qs[0], qs[1], qs[2], qs[3], w["b_out"], w["ln2_s"], w["ln2_b"],
        qs[4], qs[5], w["b_fc1"], qs[6], qs[7], w["b_fc2"],
        heads=heads, dim_head=dh, valid_len=321,
    )


# -- 1. probe
t0 = time.time()
out8 = jax.jit(int8_block)(x)
outb = jax.jit(bf16_block)(x)
jax.block_until_ready((out8, outb))
rel = float(
    jnp.linalg.norm((out8 - outb).astype(jnp.float32))
    / jnp.linalg.norm(outb.astype(jnp.float32))
)
print(f"probe ok ({time.time()-t0:.1f}s compile), block rel err vs bf16: {rel:.4f}")


def scan_time(fn, x, steps=50):
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), c[0, 0, 0]
        _, ts = jax.lax.scan(body, x, None, length=steps)
        return ts

    loop(x)  # compile
    t0 = time.time()
    jax.block_until_ready(loop(x))
    t1 = time.time()
    return (t1 - t0) / steps * 1e3


msb = scan_time(bf16_block, x)
ms8 = scan_time(int8_block, x)
print(f"per-block B={B}: bf16 {msb:.3f} ms, int8 {ms8:.3f} ms "
      f"({msb/ms8:.2f}x)")

# -- 3. end-to-end
table = load_patch_table(6, 2)
model = SiT(dim=dim, depth=12, heads=heads, dim_head=dh, mlp_dim=mlp,
            num_patches=320, num_vertices=153, dtype=jnp.bfloat16,
            patch_table=table.indices)
key = jax.random.PRNGKey(0)
xr = jax.random.normal(key, (1024, 4, 40962))
params = model.init(key, xr[:2])

for quant in (None, "int8"):
    fwd = jax.jit(lambda p, xx, q=quant: fused_forward(model, p, xx, quant=q))

    for bs in (256, 1024):
        xb = xr[:bs]
        t0 = time.time()
        fwd(params, xb).block_until_ready()
        compile_s = time.time() - t0

        @jax.jit
        def loop(p, xx):
            def body(c, _):
                return c, fwd(p, xx)[0, 0]
            _, ts = jax.lax.scan(body, 0, None, length=12)
            return ts

        jax.block_until_ready(loop(params, xb))
        t0 = time.time()
        jax.block_until_ready(loop(params, xb))
        ms = (time.time() - t0) / 12 * 1e3
        print(f"quant={quant} B={bs}: {ms:.2f} ms/batch, "
              f"{bs/ms*1e3:,.0f} surf/s (compile {compile_s:.0f}s)")

# fidelity vs fp32 modular
model32 = SiT(dim=dim, depth=12, heads=heads, dim_head=dh, mlp_dim=mlp,
              num_patches=320, num_vertices=153, dtype=jnp.float32,
              patch_table=table.indices)
ref = np.asarray(jax.jit(model32.apply)(params, xr[:64]))
o8 = np.asarray(fused_forward(model, params, xr[:64], quant="int8"))
ob = np.asarray(fused_forward(model, params, xr[:64]))
print("logit rel err vs fp32 modular: bf16",
      np.linalg.norm(ob - ref) / np.linalg.norm(ref),
      "int8", np.linalg.norm(o8 - ref) / np.linalg.norm(ref))
