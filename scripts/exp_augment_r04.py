"""Re-measure augmented training at bs=256 after the r4 quota-warp +
identity-skip-rotation work (VERDICT r3 #2: target >= 4,700 surf/s for
rotations+warps, from 3,647).

Also profiles the augmentation pass ALONE (rotation / warp legs) to see
what remains after the quota assignment, guiding whether table
composition into the patchify gather is still needed.

Run: python scripts/exp_augment_r04.py [train|profile|all]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import timed_scan
from surface_vision_transformers_tpu.data.augment import SurfaceAugment
from surface_vision_transformers_tpu.geometry import (
    generate_patch_table, remap_table_to_icosphere,
)
from surface_vision_transformers_tpu.geometry.tables import PatchTable
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.train.trainer import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict
from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

assert jax.default_backend() == "tpu", jax.default_backend()
enable_compilation_cache()

key = jax.random.PRNGKey(0)

tab_c, verts_c = generate_patch_table(6, 2)
tab_c = remap_table_to_icosphere(tab_c, verts_c, 6)
tab_c = PatchTable(tab_c, 6, 2, ordering="canonical").validate()

xb_raw = jax.random.normal(key, (2560, 4, 40962), jnp.bfloat16)
xb = xb_raw[:, :, jnp.asarray(tab_c.indices)]  # (N,4,320,153)
yb = jax.random.normal(key, (2560,))


def train_bench():
    exp_a = from_dict({
        "resolution": {"ico": 6, "sub_ico": 2},
        "transformer": {"dim": 192, "depth": 12, "heads": 3, "mlp_dim": 768},
        "training": {"LR": 1e-5, "bs": 256, "epochs": 1},
        "optimisation": {"optimiser": "SGD"},
        "SGD": {"momentum": 0.9},
    })
    for aname, n_warps, kw in (
        ("none", 0, {}),
        ("rotations", 0, {}),
        ("rotations+warps(quota)", 4, {}),
        ("rotations+warps(multinomial)", 4, {"warp_assign": "multinomial"}),
    ):
        aug = None
        if aname != "none":
            aug = SurfaceAugment(ico=6, patch_table=tab_c.indices,
                                 exact_rotations=True, num_warps=n_warps,
                                 seed=0, **kw)
        model_a = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                      num_patches=320, num_vertices=153)
        trainer_a = Trainer(exp_a, model=model_a, augment=aug)
        state_a = trainer_a.init_state(xb[:1])
        t0 = time.perf_counter()
        state_a, _ = trainer_a.train_epoch(state_a, xb, yb)  # compile
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        state_a, _ = trainer_a.train_epoch(state_a, xb, yb)
        e = time.perf_counter() - t0
        print(f"{aname:32s}: {2560/e:8.1f} surf/s  (compile {c:.1f}s)",
              flush=True)


def profile_pass():
    x1 = xb[:256]
    for aname, n_warps, rot_on in (
        ("rot-only", 0, True),
        ("warps-only(quota)", 4, False),
        ("rot+warps(quota)", 4, True),
    ):
        aug = SurfaceAugment(ico=6, patch_table=tab_c.indices,
                             exact_rotations=rot_on, num_warps=n_warps,
                             seed=0)

        def step(xx, i):
            k = jax.random.fold_in(jax.random.PRNGKey(1), i)
            return aug(k, xx + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-9)
                       ).mean().astype(jnp.float32)

        dt = timed_scan(step, (x1,), iters=21)
        print(f"{aname:24s}: {dt*1e3:7.3f} ms/batch (bs=256)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "profile"):
        profile_pass()
    if which in ("all", "train"):
        train_bench()
