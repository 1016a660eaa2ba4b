"""MS-SiT — Multiscale Surface Vision Transformer (hierarchical, windowed).

A second model family beyond the reference's scope (the reference ships only
the single-scale SiT, reference: models/sit.py:25-82; the multiscale follow-up
is the MS-SiT paper, arXiv:2303.11909 — see PAPERS.md). This implementation is
designed TPU-first from the icosphere's own subdivision structure rather than
as a port of any Swin-style CUDA code:

  * **Windows and merges are pure reshapes.** Our canonical face ordering
    (geometry.icosphere.subdivide) lists the 4 children of face ``f`` at rows
    ``4f..4f+3``, so the patches under any coarser ancestor face are a
    CONTIGUOUS id range (pinned by tests/test_geometry.py). Window partition
    = ``reshape(B, T//W, W, D)``; 4-to-1 patch merging between stages =
    ``reshape(B, T//4, 4D)``. No gather, no scatter, no index tables at
    runtime — the patterns XLA tiles perfectly onto the MXU.
  * **Local attention folds windows into the batch dim**, reusing the same
    attention machinery (fp32-softmax einsum, or the packed flash kernel when
    the window is lane-aligned) as the SiT family.
  * **Cross-window mixing is axial, not shifted.** The ico hierarchy has no
    half-window translation (Swin's shift doesn't exist on a sphere's face
    tree), so alternate blocks attend ACROSS windows at matching intra-window
    index — a transpose of the same reshape, same FLOPs as window attention,
    global receptive field every two blocks. ``cross_mix='parent'`` (attend
    within the 4x-coarser parent window) is available as the conservative
    local alternative.

Hierarchy defaults follow the Swin/MS-SiT convention: 4 stages, channel
doubling (embed_dim * 2^s), depths (2, 2, 6, 2), one merge between stages.
For an ico-6 input patched at level 5 (20,480 patches x 6 vertices) the token
counts run 20480 -> 5120 -> 1280 -> 320.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.models.sit import (
    Dtype,
    FeedForward,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from surface_vision_transformers_tpu.ops import (
    fused_patch_embed,
    rearrange_patched,
)


def window_size_for_stage(
    window: int, tokens: int, level: int, global_max: int
) -> int:
    """Effective window (tokens per attention group) at a stage.

    ``window`` is clamped to ``4**level`` so a window never spans patches
    with unrelated top-level ancestors (beyond level 0 the contiguous-range
    trick stops being a geometric unit), and stages small enough
    (``tokens <= global_max``) run full global attention — at these sizes
    full attention is cheaper than bookkeeping.
    """
    if tokens <= global_max:
        return tokens
    w = min(window, 4**level, tokens)
    if w < 4:  # level 0: the only coarser grouping is the whole sphere
        return tokens
    if tokens % w:
        raise ValueError(f"window {w} does not divide {tokens} tokens")
    return w


def stage_plan(model: "MSSiT") -> list[dict]:
    """Resolved per-stage schedule shared by the modular module and the
    fused-megakernel runner (models/fused_mssit.py): dims, heads, effective
    window, token count, and the per-block mix (even blocks 'window', odd
    blocks the model's cross_mix when the stage is windowed)."""
    plan = []
    tokens_s = model.num_patches
    dims = model.stage_dims()
    for s, (depth_s, heads_s, dim_s) in enumerate(
        zip(model.depths, model.heads, dims)
    ):
        level = model.patch_level - s
        w = window_size_for_stage(
            model.window, tokens_s, level, model.global_max
        )
        mixes = []
        for i in range(depth_s):
            mix = "window"
            if w < tokens_s and i % 2 == 1 and model.cross_mix != "none":
                mix = model.cross_mix
            mixes.append(mix)
        plan.append(dict(stage=s, dim=dim_s, heads=heads_s, depth=depth_s,
                         tokens=tokens_s, window=w, mixes=mixes))
        tokens_s //= 4
    return plan


def fold_tokens(t, window: int, mix: str):
    """(B, T, F) -> (B', W', F) grouping per ``mix`` ('window' contiguous,
    'axial' across windows at matching intra-window index, 'parent' the
    4x-coarser contiguous window). Inverse: unfold_tokens with the same
    arguments. Token-local ops commute with the fold, so a whole pre-norm
    block may run in the folded layout."""
    B, T, F = t.shape
    W = min(window, T)
    if W >= T:
        return t
    nW = T // W
    if mix == "axial":
        return (
            t.reshape(B, nW, W, F).transpose(0, 2, 1, 3).reshape(B * W, nW, F)
        )
    Wp = min(4 * W, T) if mix == "parent" else W
    return t.reshape(B * (T // Wp), Wp, F)


def unfold_tokens(y, B: int, T: int, window: int, mix: str):
    F = y.shape[-1]
    W = min(window, T)
    if W >= T:
        return y
    nW = T // W
    if mix == "axial":
        return y.reshape(B, W, nW, F).transpose(0, 2, 1, 3).reshape(B, T, F)
    return y.reshape(B, T, F)


class WindowAttention(nn.Module):
    """Pre-norm MHSA within non-overlapping token windows.

    ``mix`` selects the grouping: 'window' attends within each contiguous
    window (descendants of one ancestor face); 'axial' attends across windows
    at matching intra-window index (the transpose — global reach, same cost);
    'parent' attends within the 4x-coarser parent window. A window equal to
    the full sequence is global attention.
    """

    dim: int
    heads: int
    dim_head: int
    window: int
    mix: str = "window"
    dropout: float = 0.0
    attn_backend: str = "auto"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    precision: Any = None
    torch_init: bool = True
    sharded: bool = False  # activations sharded (mesh run): einsum only

    def _fold(self, t):
        """(B, T, F) -> (B', W', F) per ``mix``; returns (folded, unfold) —
        the shared fold_tokens/unfold_tokens grouping (feature width may
        differ between fold and unfold: attention output is narrower than
        the packed qkv input)."""
        B, T, _ = t.shape
        folded = fold_tokens(t, self.window, self.mix)
        if folded is t:
            return t, lambda y: y
        return folded, lambda y: unfold_tokens(y, B, T, self.window, self.mix)

    def _use_packed_kernel(self, seq_len: int) -> bool:
        if self.sharded or self.attn_backend not in ("auto", "pallas"):
            return False
        if self.precision in (jax.lax.Precision.HIGHEST, "highest"):
            return False
        if seq_len % 128 != 0 or seq_len > 1536:
            return False
        if self.attn_backend == "pallas":
            return True
        return jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = self.heads * self.dim_head
        kernel_init = (
            torch_linear_kernel_init
            if self.torch_init
            else nn.initializers.lecun_normal()
        )
        h = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="norm",
        )(x).astype(self.dtype)
        qkv = nn.Dense(
            3 * inner,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=kernel_init,
            precision=self.precision,
            name="to_qkv",
        )(h)
        folded, unfold = self._fold(qkv)
        Bf, Wf = folded.shape[0], folded.shape[1]

        use_kernel = (
            self._use_packed_kernel(Wf)
            and not (0.0 < self.dropout and not deterministic)
        )
        if use_kernel:
            from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
                flash_attention_qkv,
            )

            out = flash_attention_qkv(folded, self.heads, None)
        else:
            q, k, v = jnp.split(folded, 3, axis=-1)

            def heads_t(t):
                return t.reshape(Bf, Wf, self.heads, self.dim_head).transpose(
                    0, 2, 1, 3
                )

            q, k, v = heads_t(q), heads_t(k), heads_t(v)
            logits = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, precision=self.precision,
                preferred_element_type=jnp.float32,
            ) * (self.dim_head ** -0.5)
            weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            if self.dropout > 0.0 and not deterministic:
                weights = nn.Dropout(self.dropout)(weights, deterministic=False)
            out = jnp.einsum(
                "bhnm,bhmd->bhnd", weights, v, precision=self.precision
            )
            out = out.transpose(0, 2, 1, 3).reshape(Bf, Wf, inner)
        out = unfold(out)
        out = nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=kernel_init,
            bias_init=torch_linear_bias_init(inner)
            if self.torch_init
            else nn.initializers.zeros_init(),
            precision=self.precision,
            name="to_out",
        )(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class PatchMerge(nn.Module):
    """4-to-1 token merge between stages: the 4 children of each parent face
    concatenate on channels (a reshape — children are contiguous) and project
    4*dim -> 2*dim (LayerNorm then bias-free Linear, the Swin convention)."""

    dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    precision: Any = None
    torch_init: bool = True

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        y = x.reshape(B, T // 4, 4 * D)
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="norm",
        )(y).astype(self.dtype)
        return nn.Dense(
            2 * self.dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=torch_linear_kernel_init
            if self.torch_init
            else nn.initializers.lecun_normal(),
            precision=self.precision,
            name="reduce",
        )(y)


class MSSiT(nn.Module):
    """Multiscale Surface Vision Transformer.

    Input: raw (B, C, 10*4^ico + 2) vertex arrays (fused on-device patchify
    via ``patch_table``) or pre-patched (B, C, T0, V) arrays at the FINEST
    grid (``patch_level``). Patch ordering must be this framework's canonical
    face order (generated tables) — the window/merge reshapes assume the
    subdivision hierarchy's contiguous child ranges.
    """

    ico: int = 6
    patch_level: int = 5  # finest patching grid (20*4^patch_level tokens)
    num_channels: int = 4
    num_vertices: int = 6  # vertices per finest patch
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    heads: tuple = (3, 6, 12, 24)
    window: int = 64  # tokens per attention window (a power of 4)
    global_max: int = 512  # stages with <= this many tokens go global
    cross_mix: str = "axial"  # 'axial' | 'parent' | 'none'
    mlp_ratio: float = 4.0
    num_classes: int = 1
    dropout: float = 0.0
    emb_dropout: float = 0.0
    patch_table: Optional[np.ndarray] = None
    norm_means: Optional[np.ndarray] = None
    norm_stds: Optional[np.ndarray] = None
    attn_backend: str = "auto"
    patch_backend: str = "auto"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    precision: Any = None
    torch_init: bool = True
    remat: bool = False
    # mesh plumbing (Trainer.clone contract shared with SiT): under any mesh
    # the einsum attention path is the GSPMD-partitionable form
    batch_mesh: Any = None
    seq_shard_axis: Optional[str] = None
    seq_mesh: Any = None

    @property
    def num_patches(self) -> int:
        return 20 * 4**self.patch_level

    @property
    def patch_dim(self) -> int:
        return self.num_channels * self.num_vertices

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    def stage_dims(self) -> list[int]:
        return [self.embed_dim * 2**s for s in range(self.num_stages)]

    def _validate(self):
        if len(self.heads) != self.num_stages:
            raise ValueError("depths and heads must have equal length")
        if self.window & (self.window - 1) or self.window % 4:
            # powers of 4 keep windows aligned with the face hierarchy
            if self.window != 1:
                raise ValueError(f"window must be a power of 4, got {self.window}")
        if self.num_patches % 4 ** (self.num_stages - 1):
            raise ValueError(
                f"{self.num_stages} stages need {4**(self.num_stages-1)} | "
                f"{self.num_patches} tokens"
            )
        for s, (d, hd) in enumerate(zip(self.stage_dims(), self.heads)):
            if d % hd:
                raise ValueError(f"stage {s}: dim {d} not divisible by heads {hd}")
        if self.cross_mix not in ("axial", "parent", "none"):
            raise ValueError(f"unknown cross_mix {self.cross_mix!r}")
        if self.patch_table is not None:
            # 3-D input dispatch (raw (B, C, G) vs flattened (B, T, C*V)
            # tokens) keys on the last dim: refuse configs where the two
            # shapes would be indistinguishable instead of silently
            # misrouting raw input through the token branch
            G = int(np.asarray(self.patch_table).max()) + 1
            if G == self.patch_dim:
                raise ValueError(
                    f"ambiguous input dispatch: raw vertex count G={G} "
                    f"equals patch_dim C*V={self.patch_dim}; feed "
                    "pre-patched (B, C, T, V) input or drop patch_table"
                )

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 features: bool = False):
        """``features=True`` returns the final-stage tokens (B, T_last,
        dim_last) BEFORE head_norm/pooling/head — the SSL decoder input
        (models/mpp_mssit.py); head params are not created in this mode, so
        a pretraining checkpoint carries the encoder only."""
        self._validate()
        pe_kernel = self.param(
            "patch_embedding_kernel",
            torch_linear_kernel_init
            if self.torch_init
            else nn.initializers.lecun_normal(),
            (self.patch_dim, self.embed_dim),
            self.param_dtype,
        )
        pe_bias = self.param(
            "patch_embedding_bias",
            torch_linear_bias_init(self.patch_dim)
            if self.torch_init
            else nn.initializers.zeros_init(),
            (self.embed_dim,),
            self.param_dtype,
        )
        if x.ndim == 3 and x.shape[-1] != self.patch_dim:
            if self.patch_table is None:
                raise ValueError("raw (B, C, G) input requires patch_table")
            tokens = fused_patch_embed(
                x,
                self.patch_table,
                pe_kernel,
                pe_bias,
                means=self.norm_means,
                stds=self.norm_stds,
                backend="xla" if self.batch_mesh is not None else self.patch_backend,
                compute_dtype=self.dtype,
            )
        elif x.ndim == 4 or x.shape[-1] == self.patch_dim:
            # 4-D pre-patched (B, C, T, V), or already-flattened patch
            # tokens (B, T, C*V) — the MPP corruption path feeds the latter
            # (unambiguous vs raw (B, C, G): G = 10*4^ico + 2 != C*V)
            t = rearrange_patched(x) if x.ndim == 4 else x
            t = t.astype(self.dtype)
            tokens = (
                jnp.dot(t, pe_kernel.astype(self.dtype), precision=self.precision)
                + pe_bias.astype(self.dtype)
            )
        else:
            raise ValueError(f"expected 3D raw or 4D pre-patched input, got {x.shape}")

        T0 = tokens.shape[1]
        if T0 != self.num_patches:
            raise ValueError(
                f"input has {T0} patches, model expects {self.num_patches}"
            )
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, self.num_patches, self.embed_dim),
            self.param_dtype,
        )
        x = tokens + pos.astype(tokens.dtype)
        if self.emb_dropout > 0.0:
            x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        common = dict(
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            torch_init=self.torch_init,
        )
        AttnMod, FFMod, MergeMod = WindowAttention, FeedForward, PatchMerge
        if self.remat:
            AttnMod = nn.remat(WindowAttention, static_argnums=())
            FFMod = nn.remat(FeedForward, static_argnums=())

        for st in stage_plan(self):
            s, dim_s, heads_s = st["stage"], st["dim"], st["heads"]
            for i, mix in enumerate(st["mixes"]):
                x = x + AttnMod(
                    dim=dim_s,
                    heads=heads_s,
                    dim_head=dim_s // heads_s,
                    window=st["window"],
                    mix=mix,
                    dropout=self.dropout,
                    attn_backend=self.attn_backend,
                    sharded=self.batch_mesh is not None,
                    name=f"stage_{s}_block_{i}_attn",
                    **common,
                )(x, deterministic=deterministic)
                x = x + FFMod(
                    dim=dim_s,
                    hidden_dim=int(dim_s * self.mlp_ratio),
                    dropout=self.dropout,
                    name=f"stage_{s}_block_{i}_mlp",
                    **common,
                )(x, deterministic=deterministic)
            if s < self.num_stages - 1:
                x = MergeMod(dim=dim_s, name=f"stage_{s}_merge", **common)(x)

        if features:
            return x
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="head_norm",
        )(x.astype(jnp.float32))
        x = jnp.mean(x, axis=1)
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            kernel_init=torch_linear_kernel_init
            if self.torch_init
            else nn.initializers.lecun_normal(),
            bias_init=torch_linear_bias_init(self.stage_dims()[-1])
            if self.torch_init
            else nn.initializers.zeros_init(),
            precision=self.precision,
            name="head",
        )(x)

    @classmethod
    def from_config(cls, cfg, **overrides) -> "MSSiT":
        """Build from a utils.config.Experiment (``transformer.model:
        MS-SiT`` + the ``mssit:`` block); geometry comes from
        ``resolution.{ico,sub_ico}`` with sub_ico as the finest patch level."""
        m = cfg.model
        ms = cfg.mssit
        tpu = getattr(cfg, "tpu", None)
        kw = dict(
            ico=cfg.ico,
            patch_level=cfg.sub_ico,
            num_channels=m.num_channels,
            num_vertices=m.num_vertices,
            num_classes=m.num_classes,
            dropout=m.dropout,
            emb_dropout=m.emb_dropout,
            embed_dim=ms.embed_dim,
            depths=tuple(ms.depths),
            heads=tuple(ms.heads),
            window=ms.window,
            global_max=ms.global_max,
            cross_mix=ms.cross_mix,
            mlp_ratio=ms.mlp_ratio,
        )
        if tpu is not None:
            kw.update(
                dtype=jnp.dtype(tpu.compute_dtype),
                param_dtype=jnp.dtype(tpu.params_dtype),
                attn_backend="auto" if tpu.kernel_backend == "auto" else tpu.kernel_backend,
                patch_backend="auto" if tpu.kernel_backend == "auto" else tpu.kernel_backend,
                torch_init=tpu.torch_init,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if tpu.matmul_precision == "highest"
                    else None
                ),
            )
        kw.update(overrides)
        return cls(**kw)
