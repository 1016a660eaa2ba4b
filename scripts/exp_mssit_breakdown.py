"""Per-phase time breakdown of the fused MS-SiT inference forward at the
shipped ico-6 config (VERDICT r4 #1: 907 surf/s, ~28% MFU — find where the
35 ms/batch actually goes before optimizing).

Measures prefix forwards (embed, +stage0, +stage1, ..., +head) and reports
the differences, so each phase's number includes its folds/merges exactly as
the product path runs them.

Run: python scripts/exp_mssit_breakdown.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import timed_scan
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import MSSiT
from surface_vision_transformers_tpu.models import fused_mssit as F
from surface_vision_transformers_tpu.models.mssit import stage_plan
from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

assert jax.default_backend() == "tpu", jax.default_backend()
enable_compilation_cache()

B = 32
model = MSSiT(ico=6, patch_level=5,
              patch_table=load_patch_table(6, 5).indices)
x = jnp.asarray(
    np.random.default_rng(0).standard_normal((B, 4, 40962)), jnp.bfloat16
)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 40962)))["params"]
plan = stage_plan(model)


def prefix_fn(n_stages, with_head):
    def f(xx, i):
        p = params
        tokens = F._embed(model, p, xx + i.astype(xx.dtype) * jnp.bfloat16(0))
        h = tokens
        for st in plan[:n_stages]:
            s, dim_s, heads_s = st["stage"], st["dim"], st["heads"]
            dh = dim_s // heads_s
            Bc, T = h.shape[0], h.shape[1]
            for bi, mix in enumerate(st["mixes"]):
                a = p[f"stage_{s}_block_{bi}_attn"]
                m = p[f"stage_{s}_block_{bi}_mlp"]
                folded = F.fold_tokens(h, st["window"], mix)
                out = F._run_block(
                    F.fused_block, a, m, folded, heads_s, dh, model.dtype
                )
                h = (
                    F.unfold_tokens(out, Bc, T, st["window"], mix)
                    if folded is not h
                    else out
                )
            if s < model.num_stages - 1:
                mg = p[f"stage_{s}_merge"]
                y = h.reshape(Bc, T // 4, 4 * dim_s)
                y = F._layer_norm(
                    y, mg["norm"]["scale"].astype(jnp.float32),
                    mg["norm"]["bias"].astype(jnp.float32),
                ).astype(model.dtype)
                h = y @ mg["reduce"]["kernel"].astype(model.dtype)
        if with_head:
            return F._head(model, p, h).sum().astype(jnp.float32)
        return h.astype(jnp.float32).mean()

    return f


labels = ["embed", "s0", "s1", "s2", "full"]
cuts = [(0, False), (1, False), (2, False), (3, False), (4, True)]
prev = 0.0
times = []
for lab, (n, head) in zip(labels, cuts):
    dt = timed_scan(prefix_fn(n, head), (x,), iters=11)
    times.append(dt - prev)
    print(f"prefix through {lab:6s}: {dt*1e3:8.3f} ms  "
          f"(phase {times[-1]*1e3:+8.3f} ms)", flush=True)
    prev = dt

total = prev
print("\nphase breakdown @ B=32:")
for lab, t in zip(labels, times):
    print(f"  {lab:6s} {t*1e3:8.3f} ms  {100*t/total:5.1f}%")
print(f"  total  {total*1e3:8.3f} ms  -> {B/total:.1f} surf/s")
