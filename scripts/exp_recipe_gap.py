"""Isolate the recipe-vs-bench throughput gap (VERDICT r4 weak #2 / next #3).

RECIPE_r04: 100 bf16 epochs took 1,004 s where the benched train throughput
(5,150 surf/s at bs=256) implies ~16 s of step compute — and bf16 ran 3.2x
SLOWER than fp32. This script times each candidate in isolation on the
chip, with the EXACT recipe data shapes (846 pre-patched fp32 samples):

  a. trainer.train_epoch steady-state on pre-patched fp32 data (the recipe
     feed) vs raw bf16 vertices (the bench feed), bf16 and fp32 compute;
  b. evaluate() on the 106-row val split;
  c. orbax best-checkpoint save + params npz (the per-improvement cost);
  d. the no-op epoch overhead (dispatch + scalar fetch through the relay).

Run: python scripts/exp_recipe_gap.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict

N = 846


def timeit(f, n=5):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out) if out is not None else None
    return (time.perf_counter() - t0) / n


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    data_pp = rng.standard_normal((N, 4, 320, 153)).astype(np.float32)
    labels = rng.standard_normal(N).astype(np.float32)
    table = load_patch_table(6, 2)

    for dtype in ("bfloat16", "float32"):
        exp = from_dict({
            "resolution": {"ico": 6, "sub_ico": 2},
            "transformer": {"dim": 192, "depth": 12, "heads": 3,
                            "mlp_dim": 768},
            "training": {"LR": 1e-5, "bs": 256, "epochs": 1},
            "optimisation": {"optimiser": "SGD"},
            "SGD": {"momentum": 0.9},
            "tpu": {"compute_dtype": dtype},
        })
        tr = Trainer(exp)  # pre-patched feed: no patch table
        d = jnp.asarray(data_pp)
        l = jnp.asarray(labels)
        st = tr.init_state(np.asarray(data_pp[:1]))
        t0 = time.perf_counter()
        st, m = tr.train_epoch(st, d, l)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            st, m = tr.train_epoch(st, d, l)
            times.append(time.perf_counter() - t0)
        print(f"[{dtype}] pre-patched epoch: compile {compile_s:.1f}s, "
              f"steady {np.median(times)*1e3:.0f} ms "
              f"({N/np.median(times):.0f} surf/s) loss={m.loss:.4f}",
              flush=True)

        # val evaluate (106 rows, bs_val=bs)
        dv = jnp.asarray(data_pp[:106])
        lv = jnp.asarray(labels[:106])
        t0 = time.perf_counter()
        vm, preds = tr.evaluate(st, dv, lv)
        eval_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            vm, preds = tr.evaluate(st, dv, lv)
        eval_s = (time.perf_counter() - t0) / 3
        print(f"[{dtype}] evaluate(106): compile {eval_compile:.1f}s, "
              f"steady {eval_s*1e3:.0f} ms", flush=True)

        # checkpoint save cost
        import tempfile

        from surface_vision_transformers_tpu.checkpoints import orbax_io

        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            orbax_io.save_state(Path(td) / "best", st, {"epoch": 0})
            orbax_io.save_params_npz(Path(td) / "best_params.npz",
                                     {"params": tr.eval_params(st)})
            print(f"[{dtype}] ckpt save: {time.perf_counter()-t0:.2f}s",
                  flush=True)

    # raw-vertex bf16 contrast (the bench feed) at the same sample count
    exp = from_dict({
        "resolution": {"ico": 6, "sub_ico": 2},
        "transformer": {"dim": 192, "depth": 12, "heads": 3, "mlp_dim": 768},
        "training": {"LR": 1e-5, "bs": 256, "epochs": 1},
        "optimisation": {"optimiser": "SGD"},
        "SGD": {"momentum": 0.9},
    })
    tr = Trainer(exp, patch_table=table.indices)
    xb = jax.random.normal(jax.random.PRNGKey(0), (N, 4, 40962), jnp.bfloat16)
    yb = jnp.asarray(labels)
    st = tr.init_state(np.zeros((1, 4, 40962), np.float32))
    t0 = time.perf_counter()
    st, m = tr.train_epoch(st, xb, yb)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        st, m = tr.train_epoch(st, xb, yb)
        times.append(time.perf_counter() - t0)
    print(f"[bf16 raw-vertex] epoch: compile {compile_s:.1f}s, steady "
          f"{np.median(times)*1e3:.0f} ms ({N/np.median(times):.0f} surf/s)",
          flush=True)


if __name__ == "__main__":
    main()
