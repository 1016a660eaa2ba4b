"""On-device surface augmentation: exact icosahedral rotations + warps.

New capability vs the reference (which has no augmentation; BASELINE config
'SiT-small birth-age, native space with rotation/warp augmentation' requires
it). All randomness is a JAX PRNG key and all geometry is precomputed into
static gather(+blend) tables, so augmentation executes inside the jitted
train step — TPU-native, zero host work per batch.

Works on BOTH input formats:
  * raw (B, C, G) vertex arrays: tables index the vertex axis directly;
  * pre-patched (B, C, L, V) arrays: vertex-space tables are composed with
    the patch table (vertex -> first (l, v) occurrence) into flattened-
    (L*V) index tables, so the same augmentation applies without access to
    the raw data.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.geometry import rotations as rot


def _vertex_to_patch_slot(indices: np.ndarray, num_vertices_total: int) -> np.ndarray:
    """inv[g] = first flattened (l*V + v) slot holding vertex g."""
    flat = indices.reshape(-1)
    inv = np.full((num_vertices_total,), -1, np.int64)
    # reversed so the FIRST occurrence wins
    inv[flat[::-1]] = np.arange(flat.size - 1, -1, -1)
    assert (inv >= 0).all(), "patch table does not cover the mesh"
    return inv


@dataclasses.dataclass
class SurfaceAugment:
    """Precomputed augmentation tables.

    Args:
      ico: icosphere order (canonical ordering; pass ``verts`` for atlas
        meshes with different numbering).
      patch_table: (L, V) table — required to augment pre-patched inputs.
      exact_rotations: include the 60 icosahedral rotations (exact perms).
      num_warps: number of random warp tables (barycentric resampling of a
        random rotation of up to ``max_warp_deg`` degrees).
      warp_prob: probability a sample additionally gets a warp.
    """

    ico: int = 6
    patch_table: np.ndarray | None = None
    exact_rotations: bool = True
    num_warps: int = 8
    max_warp_deg: float = 15.0
    warp_prob: float = 0.5
    seed: int = 0
    # atlas geometry override: (verts, faces) of the sphere in the SAME
    # vertex numbering as the patch table / data (e.g. the dHCP ico-6
    # sphere); defaults to the canonical icosphere
    mesh_verts: np.ndarray | None = None
    mesh_faces: np.ndarray | None = None

    def __post_init__(self):
        from surface_vision_transformers_tpu.geometry.icosphere import num_vertices

        G = num_vertices(self.ico)
        rng = np.random.default_rng(self.seed)

        if self.exact_rotations:
            perms = rot.exact_rotation_permutations(self.ico, self.mesh_verts)
        else:
            perms = np.arange(G, dtype=np.int32)[None]
        self._perms = perms

        widx, ww = [], []
        for _ in range(self.num_warps):
            R = rot.random_rotation_matrix(rng, self.max_warp_deg)
            i, w = rot.barycentric_resample_table(
                self.ico, R, self.mesh_verts, self.mesh_faces
            )
            widx.append(i)
            ww.append(w)
        if self.num_warps:
            self._warp_idx = np.stack(widx)  # (K, G, 3)
            self._warp_w = np.stack(ww)  # (K, G, 3)
        else:
            self._warp_idx = self._warp_w = None

        if self.patch_table is not None:
            inv = _vertex_to_patch_slot(np.asarray(self.patch_table), G)
            # composed tables in flattened (L*V) space
            flat = np.asarray(self.patch_table).reshape(-1)
            self._perms_patched = inv[self._perms[:, flat]].astype(np.int32)
            if self._warp_idx is not None:
                self._warp_idx_patched = inv[self._warp_idx[:, flat]].astype(
                    np.int32
                )  # (K, L*V, 3)
                self._warp_w_patched = self._warp_w[:, flat]

    # -- application ---------------------------------------------------------

    def __call__(self, key: jax.Array, x: jax.Array) -> jax.Array:
        """Augment a batch: raw (B, C, G) or pre-patched (B, C, L, V)."""
        if x.ndim == 3:
            return self._apply(key, x, jnp.asarray(self._perms),
                               self._warp_idx, self._warp_w)
        if x.ndim == 4:
            if self.patch_table is None:
                raise ValueError("pre-patched input needs patch_table set")
            B, C, L, V = x.shape
            flat = x.reshape(B, C, L * V)
            out = self._apply(
                key, flat, jnp.asarray(self._perms_patched),
                getattr(self, "_warp_idx_patched", None),
                getattr(self, "_warp_w_patched", None),
            )
            return out.reshape(B, C, L, V)
        raise ValueError(f"bad input shape {x.shape}")

    def _apply(self, key, x, perms, warp_idx, warp_w):
        B = x.shape[0]
        k_rot, k_warp_sel, k_warp_on = jax.random.split(key, 3)

        r = jax.random.randint(k_rot, (B,), 0, perms.shape[0])
        idx = jnp.take(perms, r, axis=0)  # (B, Gf)
        x = jnp.take_along_axis(x, idx[:, None, :], axis=2)

        if warp_idx is not None and self.warp_prob > 0:
            t = jax.random.randint(k_warp_sel, (B,), 0, warp_idx.shape[0])
            on = jax.random.uniform(k_warp_on, (B,)) < self.warp_prob
            wi = jnp.take(jnp.asarray(warp_idx), t, axis=0)  # (B, Gf, 3)
            ww = jnp.take(jnp.asarray(warp_w), t, axis=0)
            warped = sum(
                jnp.take_along_axis(x, wi[:, None, :, k], axis=2)
                * ww[:, None, :, k].astype(x.dtype)
                for k in range(3)
            )
            x = jnp.where(on[:, None, None], warped, x)
        return x
