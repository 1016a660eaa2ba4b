"""MS-SiT fused-megakernel A/B at the shipped config (96/(2,2,6,2), w=64,
axial, ico-6 → 20,480 tokens): Trainer product path with tpu.fused_train
on vs off, plus fused vs modular inference (bench.timed_scan, relay-safe).

Run on the bench chip: python scripts/exp_mssit_fused.py
"""

import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import timed_scan
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import MSSiT
from surface_vision_transformers_tpu.models.fused_mssit import (
    fused_mssit_forward,
)
from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

assert jax.default_backend() == "tpu", jax.default_backend()
enable_compilation_cache()

TABLE = load_patch_table(6, 5).indices
B = 32
KEY = jax.random.PRNGKey(0)


def infer_ab(iters=11):
    model = MSSiT(patch_table=TABLE)
    x = jax.random.normal(KEY, (B, 4, 40962), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 40962)))

    def mod_step(p, xx, i):
        return model.apply(
            p, xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
        ).mean().astype(jnp.float32)

    def fused_step(p, xx, i):
        return fused_mssit_forward(
            model, p, xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
        ).mean().astype(jnp.float32)

    # parity first
    ym = np.asarray(jax.jit(model.apply)(params, x), np.float32)
    yf = np.asarray(
        jax.jit(lambda p, xx: fused_mssit_forward(model, p, xx))(params, x),
        np.float32,
    )
    rel = np.abs(yf - ym).max() / max(np.abs(ym).max(), 1e-6)
    print(f"infer parity fused-vs-modular rel {rel:.5f}", flush=True)
    assert rel < 0.05

    dm = timed_scan(mod_step, (params, x), iters=iters)
    df = timed_scan(fused_step, (params, x), iters=iters)
    print(f"infer modular {dm*1e3:8.2f} ms/b{B}  {B/dm:9.0f} surf/s", flush=True)
    print(f"infer fused   {df*1e3:8.2f} ms/b{B}  {B/df:9.0f} surf/s "
          f"({dm/df:.2f}x)", flush=True)
    return B / df


def train_point(name, fused, bs=B, steps=8):
    from surface_vision_transformers_tpu.train.trainer import Trainer
    from surface_vision_transformers_tpu.utils.config import from_dict

    raw = {
        "resolution": {"ico": 6, "sub_ico": 5},
        "transformer": {"model": "MS-SiT", "num_channels": 4},
        "mssit": {"embed_dim": 96, "depths": [2, 2, 6, 2],
                  "heads": [3, 6, 12, 24]},
        "training": {"LR": 3e-4, "bs": bs, "epochs": 1, "seed": 0,
                     "val_epoch": 10, "save_ckpt": False},
        "optimisation": {"optimiser": "AdamW"},
        "AdamW": {"weight_decay": 0.01},
        "tpu": {"compute_dtype": "bfloat16", "fused_train": fused},
    }
    n = bs * steps
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((n, 4, 40962)), jnp.bfloat16)
    labels = jnp.asarray(rng.standard_normal(n), jnp.float32)
    tr = Trainer(from_dict(raw), patch_table=TABLE)
    assert tr._use_fused_train() == fused
    state = tr.init_state(np.zeros((1, 4, 40962), np.float32))
    t0 = time.perf_counter()
    state, m = tr.train_epoch(state, data, labels)  # compile
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, m = tr.train_epoch(state, data, labels)
    dt = time.perf_counter() - t0
    print(f"{name:28s} train {dt*1e3:8.1f} ms/epoch  {n/dt:9.0f} surf/s "
          f"(compile {c:.0f}s, loss {m.loss:.4f})", flush=True)
    return n / dt


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}; B={B}")
    infer_ab()
    sm = train_point("train modular (fused off)", fused=False)
    sf = train_point("train fused megakernels", fused=True)
    print(f"train fused/modular: {sf/sm:.2f}x", flush=True)
