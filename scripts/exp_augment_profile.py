"""Profile on-device augmentation (r3: augmented training measured 593
surf/s vs 5,061 plain at bs=256 — an 8.5x cliff) and candidate gather
formulations for the per-sample vertex permutation."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from bench import timed_scan
from surface_vision_transformers_tpu.data.augment import SurfaceAugment
from surface_vision_transformers_tpu.geometry import (
    generate_patch_table, remap_table_to_icosphere,
)
from surface_vision_transformers_tpu.geometry.tables import PatchTable


def main():
    key = jax.random.PRNGKey(0)
    B, C, G = 256, 4, 40962
    tab, verts = generate_patch_table(6, 2)
    tab = remap_table_to_icosphere(tab, verts, 6)
    tab = PatchTable(tab, 6, 2, ordering="canonical").validate()
    x = jax.random.normal(key, (B, C, G), jnp.bfloat16)

    aug_rot = SurfaceAugment(ico=6, patch_table=tab.indices,
                             exact_rotations=True, num_warps=0, seed=0)
    aug_full = SurfaceAugment(ico=6, patch_table=tab.indices,
                              exact_rotations=True, num_warps=4, seed=0)

    def run_rot(xx, i):
        return aug_rot(jax.random.fold_in(key, i), xx).astype(
            jnp.float32).mean()

    def run_full(xx, i):
        return aug_full(jax.random.fold_in(key, i), xx).astype(
            jnp.float32).mean()

    print(f"rotation only:        {timed_scan(run_rot, (x,), iters=7)*1e3:8.2f} ms",
          flush=True)
    print(f"rotation + warps:     {timed_scan(run_full, (x,), iters=7)*1e3:8.2f} ms",
          flush=True)

    perms = jnp.asarray(aug_rot._perms)  # (60, G)

    # formulation A: current take_along_axis
    def form_a(xx, i):
        r = jax.random.randint(jax.random.fold_in(key, i), (B,), 0, 60)
        idx = jnp.take(perms, r, axis=0)
        return jnp.take_along_axis(xx, idx[:, None, :], axis=2).astype(
            jnp.float32).mean()

    # formulation B: one flat 1-D gather with globalized indices
    def form_b(xx, i):
        r = jax.random.randint(jax.random.fold_in(key, i), (B,), 0, 60)
        idx = jnp.take(perms, r, axis=0)  # (B, G)
        base = (jnp.arange(B)[:, None, None] * C
                + jnp.arange(C)[None, :, None]) * G
        flat_idx = base + idx[:, None, :]
        return jnp.take(xx.reshape(-1), flat_idx.reshape(-1)).astype(
            jnp.float32).mean()

    # formulation C: batch groups share one rotation (shared-index gather),
    # 8 groups of 32 -> vmapped shared take
    def form_c(xx, i):
        ng = 8
        r = jax.random.randint(jax.random.fold_in(key, i), (ng,), 0, 60)
        idx = jnp.take(perms, r, axis=0)  # (ng, G)
        xg = xx.reshape(ng, B // ng, C, G)
        out = jax.vmap(lambda xc, ic: jnp.take(xc, ic, axis=2))(xg, idx)
        return out.astype(jnp.float32).mean()

    # formulation D: one-hot GEMM over the 60 rotations is impossible at
    # G=40962; instead per-sample gather via XLA sort? skipped.

    for name, f in (("A take_along_axis", form_a), ("B flat take", form_b),
                    ("C grouped shared", form_c)):
        print(f"{name}:  {timed_scan(f, (x,), iters=7)*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
