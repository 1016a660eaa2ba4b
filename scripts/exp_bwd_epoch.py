"""EPOCH-LEVEL sweep of the backward kernel's (group, prob-cache) policy —
the only trustworthy measurement on this relay (isolated backward
microbenches varied 1.85 -> 2.88 ms for identical code WITHIN one session;
see COMPONENTS.md). Trains real epochs at bs=1024 through the Trainer for
each policy and prints surf/s."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.ops.pallas import fused_block as fb
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict


def main():
    key = jax.random.PRNGKey(0)
    n, bs = 8192, 1024
    table = load_patch_table(6, 2)
    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, patch_table=table.indices)
    data = jax.random.normal(key, (n, 4, 40962), jnp.bfloat16)
    labels = jax.random.normal(key, (n,))
    exp = from_dict({
        "resolution": {"ico": 6, "sub_ico": 2},
        "transformer": {"dim": 192, "depth": 12, "heads": 3, "mlp_dim": 768},
        "training": {"LR": 1e-5, "bs": bs, "epochs": 1},
        "optimisation": {"optimiser": "SGD"},
        "SGD": {"momentum": 0.9},
    })

    for G, cache in ((None, None), (8, True), (4, "compact"),
                     (8, "compact"), (2, True)):
        fb._BWD_GROUP, fb._BWD_CACHE = G, cache
        try:
            trainer = Trainer(exp, model=model)
            state = trainer.init_state(data[:1])
            t0 = time.perf_counter()
            state, _ = trainer.train_epoch(state, data, labels)  # compile
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                state, m = trainer.train_epoch(state, data, labels)
                e = time.perf_counter() - t0
                best = e if best is None else min(best, e)
            print(f"G={G} cache={cache}: {n/best:7.0f} surf/s "
                  f"({best/(n//bs)*1e3:6.1f} ms/step, compile {compile_s:.0f}s)",
                  flush=True)
        finally:
            fb._BWD_GROUP, fb._BWD_CACHE = None, None


if __name__ == "__main__":
    main()
