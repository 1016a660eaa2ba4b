"""scan_blocks at the flagship shape: first-compile time and epoch-level
throughput, supervised and MPP, scan vs unrolled (persistent compile cache
OFF so compile numbers are honest).

usage: exp_scan_blocks_epoch.py [sup|mpp ...]   (default: both)
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


def run(task: str, scan: bool, n=4096, bs=1024):
    raw = {
        "data": {"task": "scan_age", "configuration": "template"},
        "mesh_resolution": {"ico_mesh": 6, "ico_grid": 2},
        "model": {"dim": 192, "depth": 12, "heads": 3, "mlp_dim": 768},
        "training": {"LR": 3e-4, "bs": bs, "epochs": 1},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"scan_blocks": scan},
    }
    if task == "mpp":
        raw["SSL"] = "mpp"
        raw["pretraining_mpp"] = {"mask_prob": 0.75, "replace_prob": 0.8,
                                  "swap_prob": 0.02}
    exp = from_dict(raw)
    table = load_patch_table(6, 2)
    trainer = Trainer(exp, patch_table=table.indices)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, 4, 40962), jnp.bfloat16)
    tgt = None
    if task == "sup":
        tgt = jax.random.normal(jax.random.PRNGKey(1), (n, 1))
    state = trainer.init_state(x[:1])
    t0 = time.perf_counter()
    state, _ = trainer.train_epoch(state, x, tgt)  # compile + run
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        state, _ = trainer.train_epoch(state, x, tgt)
    dt = (time.perf_counter() - t0) / iters
    print(f"{task} scan={int(scan)} bs={bs}: first-epoch {compile_s:6.1f} s   "
          f"steady {n / dt:8.1f} surf/s ({dt*1e3:.1f} ms/epoch)", flush=True)


def main():
    tasks = sys.argv[1:] or ["sup", "mpp"]
    for t in tasks:
        for scan in (False, True):
            run(t, scan)


if __name__ == "__main__":
    main()
