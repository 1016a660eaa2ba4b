"""MS-SiT on-chip profile: forward/train throughput and window-policy A/B.

Measures (bench.timed_scan — on-device lax.scan, (t_n - t_1)/(n-1),
relay-safe):
  1. inference surf/s at the shipped config (96/(2,2,6,2), w=64, axial);
  2. window=256 (lane-aligned: the packed flash kernel applies when the
     folded window length is a 128-multiple) vs 64;
  3. cross_mix variants (axial vs parent vs none) and xla-only attention;
  4. train epoch throughput via the Trainer product path.

Run on the bench chip: python scripts/exp_mssit_profile.py
"""

import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import timed_scan
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import MSSiT
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


def train_point(name, bs=B, steps=8, **mssit_over):
    from surface_vision_transformers_tpu.train.trainer import Trainer
    from surface_vision_transformers_tpu.utils.config import from_dict

    raw = {
        "resolution": {"ico": 6, "sub_ico": 5},
        "transformer": {"model": "MS-SiT", "num_channels": 4},
        "mssit": {"embed_dim": 96, "depths": [2, 2, 6, 2],
                  "heads": [3, 6, 12, 24], **mssit_over},
        "training": {"LR": 3e-4, "bs": bs, "epochs": 1, "seed": 0,
                     "val_epoch": 10, "save_ckpt": False},
        "optimisation": {"optimiser": "AdamW"},
        "AdamW": {"weight_decay": 0.01},
        "tpu": {"compute_dtype": "bfloat16"},
    }
    n = bs * steps
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.standard_normal((n, 4, 40962)), jnp.bfloat16
    )
    labels = jnp.asarray(rng.standard_normal(n), jnp.float32)
    exp = from_dict(raw)
    tr = Trainer(exp, patch_table=TABLE)
    state = tr.init_state(np.zeros((1, 4, 40962), np.float32))
    t0 = time.perf_counter()
    state, m = tr.train_epoch(state, data, labels)  # compile
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, m = tr.train_epoch(state, data, labels)
    dt = time.perf_counter() - t0
    print(f"{name:36s} train {dt*1e3:8.1f} ms/epoch  {n/dt:9.0f} surf/s "
          f"(compile {c:.0f}s, loss {m.loss:.4f})", flush=True)
    return n / dt


def kernel_parity_w256():
    """w=256 folds windows to 128-multiple sequences, so the packed flash
    kernel dispatches — at dim_head 32, which no SiT config exercises.
    Check numerics against the einsum path before trusting its timing."""
    m_k = MSSiT(patch_table=TABLE, window=256)
    m_x = MSSiT(patch_table=TABLE, window=256, attn_backend="xla")
    x = jax.random.normal(KEY, (4, 4, 40962), jnp.bfloat16)
    p = m_k.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 40962)))
    yk = np.asarray(jax.jit(m_k.apply)(p, x), np.float32)
    yx = np.asarray(jax.jit(m_x.apply)(p, x), np.float32)
    d = np.abs(yk - yx).max()
    rel = d / max(np.abs(yx).max(), 1e-6)
    print(f"w=256 kernel-vs-xla: max abs {d:.5f} rel {rel:.5f}", flush=True)
    assert rel < 0.05, "packed kernel at dh=32 disagrees with einsum"


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}; B={B}")
    kernel_parity_w256()
    fwd_point("w=64 axial (shipped)", MSSiT(patch_table=TABLE))
    fwd_point("w=256 axial (kernel-aligned)", MSSiT(patch_table=TABLE, window=256))
    fwd_point("w=64 parent", MSSiT(patch_table=TABLE, cross_mix="parent"))
    fwd_point("w=64 none", MSSiT(patch_table=TABLE, cross_mix="none"))
    fwd_point("w=64 axial xla-attn", MSSiT(patch_table=TABLE, attn_backend="xla"))
    fwd_point("w=256 axial xla-attn",
              MSSiT(patch_table=TABLE, window=256, attn_backend="xla"))
    train_point("train w=64 axial (shipped)")
    train_point("train w=256 axial", window=256)
