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
from surface_vision_transformers_tpu.ops.exact_move import exact_linear_move


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
    # True: all warped samples in a batch share ONE table per step (chosen
    # randomly each step; tables still vary across steps). Computes 1
    # instead of all K warp resamplings per batch — the K-table where-select
    # form is the TPU-fast per-SAMPLE variant, but still pays K full passes
    # (see _apply_warps). Trades within-batch warp diversity for ~(K-1)/K
    # of the warp cost; rotation diversity is unaffected.
    warp_per_batch: bool = False
    # 'quota' (default): EXACT-count assignment — exactly round(warp_prob*B)
    # samples warp per step, split as evenly as possible across the K tables,
    # positions drawn by a random permutation. Each table then resamples only
    # a static contiguous slice of the permuted batch, so the whole warp costs
    # ~1 batch pass instead of K (measured 15.3 -> ~2 ms at bs=256). The
    # per-sample marginal stays warp_prob/K per table; only the joint law
    # changes (exact counts instead of multinomial) — the same trade the
    # reference itself makes for MPP masking (reference models/mpp.py:25-39).
    # 'multinomial': independent per-sample coin flips + table picks (the
    # pre-r4 law; computes all K tables on the full batch).
    warp_assign: str = "quota"
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
            # STRUCTURED rotation tables for patched inputs: an icosahedral
            # rotation maps each patch's vertex set exactly onto another
            # patch's, so in patch space it decomposes into a PATCH
            # permutation (a V-contiguous BLOCK gather — ~65x faster on TPU
            # than the scalar gather, measured 1.4 vs 93 ms at B=256) times
            # a small set of within-patch orientations (applied as one-hot
            # GEMMs + a block select). Canonical tables collapse to a
            # handful of orientations; arbitrary atlas orderings don't and
            # keep the general gather path.
            self._structured = self._build_structured_tables(
                np.asarray(self.patch_table)
            )

    def _build_structured_tables(self, tab: np.ndarray):
        """(rot_patch (R, L), orient_id (R, L), orients (O, V)) or None."""
        R = self._perms.shape[0]
        L, V = tab.shape
        patch_of = {np.sort(tab[l]).tobytes(): l for l in range(L)}
        slot_of = [
            {int(g): i for i, g in enumerate(tab[l])} for l in range(L)
        ]
        rot_patch = np.empty((R, L), np.int32)
        orient_id = np.empty((R, L), np.int32)
        odict: dict = {}
        orients: list = []
        for r in range(R):
            perm = self._perms[r]
            for l in range(L):
                src = perm[tab[l]]  # source vertex id for each dest slot
                p = patch_of.get(np.sort(src).tobytes())
                if p is None:
                    return None  # rotation doesn't map patches to patches
                sidx = slot_of[p]
                vperm = np.fromiter(
                    (sidx[int(g)] for g in src), np.int32, V
                )  # dest slot w reads source slot vperm[w]
                key = vperm.tobytes()
                oid = odict.get(key)
                if oid is None:
                    if len(orients) >= 16:
                        return None  # atlas-ordered: orientations don't collapse
                    oid = len(orients)
                    odict[key] = oid
                    orients.append(vperm)
                rot_patch[r, l] = p
                orient_id[r, l] = oid
        return rot_patch, orient_id, np.stack(orients)

    # -- application ---------------------------------------------------------

    def __call__(self, key: jax.Array, x: jax.Array) -> jax.Array:
        """Augment a batch: raw (B, C, G) or pre-patched (B, C, L, V).

        Pre-patched inputs with a structured table (canonical orderings)
        take the fast rotation path: block gather + orientation GEMMs —
        the scalar vertex gather XLA generates otherwise runs ~65x slower
        on TPU (93 vs 1.4+6 ms at B=256 for sub-ico-2). Warps (if enabled)
        still use the general gather; warp-heavy recipes on TPU should
        prefer host-side augmentation via the streaming pipeline."""
        if x.ndim == 3:
            return self._apply(key, x, jnp.asarray(self._perms),
                               self._warp_idx, self._warp_w)
        if x.ndim == 4:
            if self.patch_table is None:
                raise ValueError("pre-patched input needs patch_table set")
            B, C, L, V = x.shape
            if getattr(self, "_structured", None) is not None:
                return self._apply_structured(key, x)
            flat = x.reshape(B, C, L * V)
            out = self._apply(
                key, flat, jnp.asarray(self._perms_patched),
                getattr(self, "_warp_idx_patched", None),
                getattr(self, "_warp_w_patched", None),
            )
            return out.reshape(B, C, L, V)
        raise ValueError(f"bad input shape {x.shape}")

    def _apply_structured(self, key, xp):
        """Rotation via patch-block gather + within-patch one-hot GEMMs
        (bitwise-identical to the general gather: one-hot matmuls move exact
        values), then the standard warp branch in flattened space."""
        B, C, L, V = xp.shape
        rot_patch, orient_id, orients = self._structured
        O = orients.shape[0]
        k_rot, k_warp_sel, k_warp_on = jax.random.split(key, 3)

        r = jax.random.randint(k_rot, (B,), 0, rot_patch.shape[0])
        pidx = jnp.take(jnp.asarray(rot_patch), r, axis=0)  # (B, L)
        xg = jnp.take_along_axis(
            xp, pidx[:, None, :, None], axis=2, mode="promise_in_bounds"
        )
        # P[o][v, w] = 1 iff dest slot w reads source slot v under orient o.
        # The identity orientation (always present on canonical tables: the
        # identity rotation collapses to it) needs no GEMM — its result IS
        # xg — and the remaining orientations where-select into it, fusing
        # with the GEMM consumers instead of materializing an O-stacked
        # fp32 tensor + take_along_axis (measured ~2x on the rotation pass).
        ident = next(
            (o for o in range(O)
             if (orients[o] == np.arange(V, dtype=orients.dtype)).all()),
            None,
        )
        osel = jnp.take(jnp.asarray(orient_id), r, axis=0)  # (B, L)
        sel = osel[:, None, :, None]  # broadcast over (C, V)
        x = None
        for o in range(O):
            if o == ident:
                continue
            onehot = np.zeros((V, V), np.float32)
            onehot[orients[o], np.arange(V)] = 1.0
            # ops.exact_move keeps fp32 data bitwise through the one-hot GEMM
            # (three bf16 planes): a plain DEFAULT-precision pass would
            # quantize every rotated value to bf16 on TPU; HIGHEST would pay
            # 6 passes. bf16 data takes the single exact pass.
            oh16 = jnp.asarray(onehot, jnp.bfloat16)
            y_o = exact_linear_move(
                xg,
                lambda planes, _oh=oh16: jnp.einsum(
                    "bclv,vw->bclw", planes, _oh,
                    preferred_element_type=jnp.float32,
                ),
            )
            x = y_o if x is None else jnp.where(sel == o, y_o, x)
        if ident is not None:
            x = xg if x is None else jnp.where(sel == ident, xg, x)

        warp_idx = getattr(self, "_warp_idx_patched", None)
        if warp_idx is not None and self.warp_prob > 0:
            flat = self._apply_warps(
                x.reshape(B, C, L * V), self._warp_idx_patched,
                self._warp_w_patched, k_warp_sel, k_warp_on,
            )
            x = flat.reshape(B, C, L, V)
        return x

    def _apply_warps(self, x, warp_idx, warp_w, k_warp_sel, k_warp_on):
        """Warp selection the TPU-fast way: each of the K warp tables is
        CONSTANT, so a table applies to a batch (or batch slice) as 3
        static-index gathers (the pattern XLA runs at bandwidth — same as
        patchify). Per-sample dynamic-index gathers ran ~65x slower.

        'quota' assignment (default): a random permutation routes exactly
        round(warp_prob*B) samples into static contiguous per-table slices,
        so the 3 gather legs run once over the warped fraction instead of
        K times over the whole batch. 'multinomial': the pre-r4 independent
        per-sample law — all K tables resample the full batch, then each
        sample where-selects its own."""
        B = x.shape[0]
        K = warp_idx.shape[0]

        def one_warp(xs, k):
            return sum(
                jnp.take(xs, jnp.asarray(warp_idx[k, :, j]), axis=2)
                * jnp.asarray(warp_w[k, :, j], x.dtype)
                for j in range(3)
            )

        if self.warp_per_batch:
            # one table per step: a K-way lax.switch computes a single
            # warp resampling instead of all K
            on = jax.random.uniform(k_warp_on, (B,)) < self.warp_prob
            t0 = jax.random.randint(k_warp_sel, (), 0, K)
            warped = jax.lax.switch(
                t0, [lambda k=k: one_warp(x, k) for k in range(K)]
            )
            return jnp.where(on[:, None, None], warped, x)

        if self.warp_assign == "quota":
            m_on = int(round(self.warp_prob * B))
            if m_on == 0:
                return x
            base, rem = divmod(m_on, K)
            counts = [base + (k < rem) for k in range(K)]
            perm = jax.random.permutation(k_warp_sel, B)
            xs = jnp.take(x, perm, axis=0)
            parts, off = [], 0
            for k in range(K):
                if counts[k]:
                    parts.append(one_warp(xs[off:off + counts[k]], k))
                    off += counts[k]
            if off < B:
                parts.append(xs[off:])
            ys = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            return jnp.take(ys, jnp.argsort(perm), axis=0)

        if self.warp_assign != "multinomial":
            raise ValueError(f"unknown warp_assign {self.warp_assign!r}")
        on = jax.random.uniform(k_warp_on, (B,)) < self.warp_prob
        t = jax.random.randint(k_warp_sel, (B,), 0, K)
        warped_all = jnp.stack([one_warp(x, k) for k in range(K)])
        warped = jnp.take_along_axis(
            warped_all, t[None, :, None, None], axis=0,
            mode="promise_in_bounds",
        )[0]
        return jnp.where(on[:, None, None], warped, x)

    def _apply(self, key, x, perms, warp_idx, warp_w):
        B = x.shape[0]
        k_rot, k_warp_sel, k_warp_on = jax.random.split(key, 3)

        r = jax.random.randint(k_rot, (B,), 0, perms.shape[0])
        idx = jnp.take(perms, r, axis=0)  # (B, Gf)
        x = jnp.take_along_axis(x, idx[:, None, :], axis=2)

        if warp_idx is not None and self.warp_prob > 0:
            x = self._apply_warps(x, np.asarray(warp_idx), np.asarray(warp_w),
                                  k_warp_sel, k_warp_on)
        return x
