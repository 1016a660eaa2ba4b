"""A/B the split two-kernel block backward vs the XLA fallback at SiT-base.

dim 768 fails _bwd_kernel_feasible (monolithic backward), so round-3 code
ran the XLA-mirror fallback (flash attention, ~10 intermediate HBM round
trips per block backward). The split backward (_block_bwd_split) keeps it
fused: MLP-grad kernel from the forward-saved x1, then attention-grad
kernel. This measures, same-session:
  1. grad parity of the split path vs autodiff of the XLA mirror on chip;
  2. epoch-level SiT-base train throughput, split vs fallback
     (bench variants_train config: bs=128, n=512).

Usage: python scripts/exp_split_bwd.py
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
print = functools.partial(print, flush=True)

import surface_vision_transformers_tpu.ops.pallas.fused_block as fb
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict

print("backend:", jax.default_backend(), jax.devices()[0])

# -- 1. on-chip grad parity at the real SiT-base block shape
N, dim, heads, dh, mlp = 328, 768, 12, 64, 3072
hd = heads * dh
assert not fb._bwd_kernel_feasible(N, dim, mlp, hd, heads)
assert fb._split_bwd_feasible(N, dim, mlp, hd, heads)
rng = np.random.default_rng(0)


def mk(*s):
    return jnp.asarray(rng.standard_normal(s) * 0.05, jnp.bfloat16)


x = mk(16, N, dim)
w = (mk(dim) + 1, mk(dim), mk(dim, 3 * hd), mk(hd, dim), mk(dim),
     mk(dim) + 1, mk(dim), mk(dim, mlp), mk(mlp), mk(mlp, dim), mk(dim))
vl = 321


def loss_k(args):
    return jnp.mean(
        fb.fused_block_train(x, *args, heads, dh, vl)[:, :vl].astype(
            jnp.float32
        ) ** 2
    )


def loss_ref(args):
    return jnp.mean(
        fb._xla_block_ref(
            x, *args, heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
        )[:, :vl].astype(jnp.float32) ** 2
    )


t0 = time.time()
lk, gk = jax.jit(jax.value_and_grad(loss_k))(w)
jax.block_until_ready(gk)
print(f"split-path compile+run {time.time()-t0:.0f}s")
lr_, gr = jax.jit(jax.value_and_grad(loss_ref))(w)
print("loss split vs ref:", float(lk), float(lr_))
worst = 0.0
for a, b in zip(gk, gr):
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    rel = np.linalg.norm(a64 - b64) / (np.linalg.norm(b64) + 1e-12)
    worst = max(worst, rel)
print("worst grad rel err (bf16 params):", worst)

# -- 2. epoch-level SiT-base train A/B
table = load_patch_table(6, 2)
key = jax.random.PRNGKey(0)
model = SiT(dim=768, depth=12, heads=12, mlp_dim=3072, num_patches=320,
            num_vertices=153, patch_table=table.indices)
xb = jax.random.normal(key, (512, 4, 40962), jnp.bfloat16)
yb = jax.random.normal(key, (512,))
exp = from_dict({
    "resolution": {"ico": 6, "sub_ico": 2},
    "transformer": {"dim": 768, "depth": 12, "heads": 12, "mlp_dim": 3072},
    "training": {"LR": 1e-5, "bs": 128, "epochs": 1},
    "optimisation": {"optimiser": "SGD"},
    "SGD": {"momentum": 0.9},
})

orig = fb._split_bwd_feasible
for name, gate in (("xla-fallback", lambda *a: False), ("split", orig)):
    fb._split_bwd_feasible = gate
    trainer = Trainer(exp, model=model)
    state = trainer.init_state(xb[:1])
    t0 = time.time()
    state, _ = trainer.train_epoch(state, xb, yb)  # compile
    c = time.time() - t0
    t0 = time.time()
    state, m = trainer.train_epoch(state, xb, yb)
    e = time.time() - t0
    print(f"SiT-base train [{name}]: {512/e:,.1f} surf/s "
          f"(epoch {e:.2f}s, compile {c:.0f}s, loss {m.loss:.4f})")
fb._split_bwd_feasible = orig
