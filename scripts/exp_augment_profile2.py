"""Round 2 of the augmentation gather hunt: bounds-check elision and
patch-level BLOCK gathers (V=153-contiguous slices instead of scalars)."""

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
    L, V = 320, 153
    tab, verts = generate_patch_table(6, 2)
    tab = remap_table_to_icosphere(tab, verts, 6)
    tab = PatchTable(tab, 6, 2, ordering="canonical").validate()
    x = jax.random.normal(key, (B, C, G), jnp.bfloat16)
    xp = jax.random.normal(key, (B, C, L, V), jnp.bfloat16)

    aug = SurfaceAugment(ico=6, patch_table=tab.indices,
                         exact_rotations=True, num_warps=0, seed=0)
    perms = jnp.asarray(aug._perms)  # (60, G)

    # A2: take_along_axis with bounds-check elision
    def form_a2(xx, i):
        r = jax.random.randint(jax.random.fold_in(key, i), (B,), 0, 60)
        idx = jnp.take(perms, r, axis=0)
        return jnp.take_along_axis(
            xx, idx[:, None, :], axis=2, mode="promise_in_bounds"
        ).astype(jnp.float32).mean()

    print(f"A2 taa promise_in_bounds: {timed_scan(form_a2, (x,), iters=7)*1e3:8.2f} ms",
          flush=True)

    # E: patch-level BLOCK gather on pre-patched data: per (b, l) pick a
    # source patch (slice of V contiguous) — upper-bounds the patch-perm
    # stage of a structured rotation
    pperm = np.asarray(
        np.random.default_rng(0).permutation(
            np.tile(np.arange(L), (60, 1)).T
        ).T, np.int32,
    )
    pperm = jnp.asarray(pperm)  # (60, L) stand-in patch-level permutation

    def form_e(xx, i):
        r = jax.random.randint(jax.random.fold_in(key, i), (B,), 0, 60)
        pidx = jnp.take(pperm, r, axis=0)  # (B, L)
        return jnp.take_along_axis(
            xx, pidx[:, None, :, None], axis=2, mode="promise_in_bounds"
        ).astype(jnp.float32).mean()

    print(f"E patch block gather:     {timed_scan(form_e, (xp,), iters=7)*1e3:8.2f} ms",
          flush=True)

    # F: within-patch one-hot GEMM select over O orientations:
    # y_o = x @ P_o for O (V,V) one-hots, then per-(b,l) pick orientation
    O = 6
    Ps = np.stack([np.eye(V, dtype=np.float32)[np.random.default_rng(o).permutation(V)]
                   for o in range(O)])
    Ps = jnp.asarray(Ps, jnp.bfloat16)  # (O, V, V)
    oid = jnp.asarray(np.random.default_rng(1).integers(0, O, (60, L)), jnp.int32)

    def form_f(xx, i):
        r = jax.random.randint(jax.random.fold_in(key, i), (B,), 0, 60)
        osel = jnp.take(oid, r, axis=0)  # (B, L)
        ys = jnp.einsum("bclv,ovw->obclw", xx, Ps)  # (O, B, C, L, V)
        return jnp.take_along_axis(
            ys, osel[None, :, None, :, None], axis=0,
            mode="promise_in_bounds",
        )[0].astype(jnp.float32).mean()

    print(f"F orient one-hot GEMM:    {timed_scan(form_f, (xp,), iters=7)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
