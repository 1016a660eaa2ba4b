"""Pipeline parallelism: stage-sharded SiT training over a 'pipe' mesh axis.

The reference has no distributed code at all (SURVEY §2); this module adds the
remaining classic scale-out axis to the framework's DP/FSDP/TP/SP set — GPipe
microbatch pipelining, TPU-native:

  * the encoder's ``depth`` blocks split into ``pipe`` contiguous stages;
    each stage's block parameters live on its own mesh shard (the 'pipe'
    axis), so a model whose parameters exceed one chip's HBM trains with
    each chip holding only ``depth/pipe`` blocks;
  * the schedule is a single ``lax.scan`` over ``M + S - 1`` ticks inside one
    ``shard_map``: every tick each stage runs its blocks on its current
    microbatch and ``ppermute``s the activations to the next stage (ICI
    neighbour traffic only, the pattern XLA pipelines best);
  * bubbles are explicit: stages compute garbage for ticks where no valid
    microbatch has reached them and the last stage masks those losses out —
    static shapes, no data-dependent control flow;
  * the backward is plain ``jax.grad`` through the scan: the transpose of
    ``ppermute`` is the reverse ``ppermute``, so gradient activations flow
    backwards through the pipeline with the same neighbour traffic, and the
    stage-sharded parameter gradients come out on their own shards.

Composition: the 'pipe' axis multiplies with the 'data'/'fsdp' batch axes
(each data shard runs its own pipeline); TP ('model' > 1) and MPP are not
combined with PP — the shipped model family never needs both at once.

The TrainState keeps the ORIGINAL per-layer parameter tree (checkpoint,
resume, and torch-interop formats are unchanged); the (S, d, ...) stacking
happens inside the jitted step, where XLA turns it into the pipe-sharded
layout. At SiT scales the restack is noise; a model that genuinely needs PP
would hold the stacked layout in the state instead (documented trade-off).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from surface_vision_transformers_tpu.models.sit import (
    Attention,
    FeedForward,
    SiT,
)
from surface_vision_transformers_tpu.ops import fused_patch_embed, rearrange_patched


def pipe_size(mesh) -> int:
    return dict(mesh.shape).get("pipe", 1) if mesh is not None else 1


def _stack_stage_params(enc: dict, depth: int, stages: int):
    """Per-layer encoder params -> one tree with (stages, d_per, ...) leaves.

    jax.grad through this stacking slices the stage gradients back onto the
    original per-layer leaves, so the optimizer sees the ordinary tree."""
    per_block = [
        {"attn": enc[f"layers_{i}_attn"], "mlp": enc[f"layers_{i}_mlp"]}
        for i in range(depth)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_block)
    d_per = depth // stages
    return jax.tree.map(
        lambda x: x.reshape(stages, d_per, *x.shape[1:]), stacked
    )


def _block_modules(model: SiT) -> tuple[Attention, FeedForward]:
    """Fresh Attention/FeedForward modules with the encoder's exact config;
    applied functionally on per-block param subtrees inside the pipeline (no
    mesh plumbing — activations inside shard_map are shard-local)."""
    common = dict(
        dtype=model.dtype,
        param_dtype=model.param_dtype,
        precision=model.precision,
        torch_init=model.torch_init,
    )
    attn = Attention(
        dim=model.dim, heads=model.heads, dim_head=model.dim_head,
        dropout=0.0, attn_backend=model.attn_backend, **common,
    )
    ff = FeedForward(
        dim=model.dim, hidden_dim=model.mlp_dim, dropout=0.0, **common,
    )
    return attn, ff


def _embed(model: SiT, p: dict, x: jax.Array) -> jax.Array:
    """Functional SiT.embed (tokens + CLS + pos + pad) — same numerics as the
    module path at dropout 0 (models/sit.py embed/embed_tokens)."""
    dt = model.dtype
    if x.ndim == 3:
        tokens = fused_patch_embed(
            x, model.patch_table, p["patch_embedding_kernel"],
            p["patch_embedding_bias"], means=model.norm_means,
            stds=model.norm_stds, compute_dtype=dt, backend="xla",
        )
    else:
        tokens = rearrange_patched(x).astype(dt)
        tokens = tokens @ p["patch_embedding_kernel"].astype(dt) + p[
            "patch_embedding_bias"
        ].astype(dt)
    B, n = tokens.shape[0], tokens.shape[1]
    cls = jnp.broadcast_to(p["cls_token"].astype(dt), (B, 1, model.dim))
    h = jnp.concatenate([cls, tokens], axis=1)
    h = h + p["pos_embedding"][:, : n + 1].astype(dt)
    if model.padded_len > n + 1:
        h = jnp.pad(h, [(0, 0), (0, model.padded_len - (n + 1)), (0, 0)])
    return h


def _head(model: SiT, p: dict, h: jax.Array) -> jax.Array:
    if model.pool == "mean":
        pooled = jnp.mean(h[:, : model.valid_len], axis=1)
    else:
        pooled = h[:, 0]
    pooled = pooled.astype(jnp.float32)
    hn = p["head_norm"]
    mu = jnp.mean(pooled, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(pooled - mu), axis=-1, keepdims=True)
    normed = (pooled - mu) * jax.lax.rsqrt(var + 1e-5) * hn["scale"] + hn["bias"]
    return normed @ p["head"]["kernel"].astype(jnp.float32) + p["head"][
        "bias"
    ].astype(jnp.float32)


def pipeline_loss(
    model: SiT,
    mesh,
    params,
    batch: jax.Array,
    targets: jax.Array,
    weights: jax.Array,
    l1: bool = False,
    n_microbatches: Optional[int] = None,
):
    """Weighted regression loss of the SiT forward, computed through a
    ``pipe``-staged GPipe schedule under ``mesh``. Differentiable; exact
    parity with the modular forward (same ops per block, same fp32
    softmax/LN) — pipelining changes the schedule, not the math.

    batch: (B, ...) with B divisible by n_data_shards * n_microbatches.
    """
    S = pipe_size(mesh)
    if model.depth % S:
        raise ValueError(f"depth {model.depth} not divisible by pipe={S}")
    M = n_microbatches or S
    shape = dict(mesh.shape)
    nb = shape.get("data", 1) * shape.get("fsdp", 1)
    B = batch.shape[0]
    if B % (nb * M):
        raise ValueError(
            f"batch {B} must divide into data_shards({nb}) x microbatches({M})"
        )
    if shape.get("model", 1) != 1:
        raise ValueError("pipeline parallelism does not compose with TP here")

    attn_mod, ff_mod = _block_modules(model)
    valid_len = (
        model.valid_len if model.padded_len > model.valid_len else None
    )
    d_per = model.depth // S

    stage_tree = _stack_stage_params(params["encoder"], model.depth, S)
    other = {k: v for k, v in params.items() if k != "encoder"}

    batch_axes = tuple(a for a in ("data", "fsdp") if a in shape)

    def run_stage(blocks, h):
        """d_per blocks via scan over the stage's stacked params."""

        def one_block(hh, bp):
            hh = hh + attn_mod.apply(
                {"params": bp["attn"]}, hh, valid_len=valid_len
            )
            hh = hh + ff_mod.apply({"params": bp["mlp"]}, hh)
            return hh, None

        h, _ = jax.lax.scan(one_block, h, blocks)
        return h

    def body(stage_blocks, other_p, x, tgt, w):
        # stage_blocks: (1, d_per, ...) leaves (this stage's slice)
        stage_blocks = jax.tree.map(lambda t: t[0], stage_blocks)
        s = jax.lax.axis_index("pipe")
        mb = x.shape[0] // M
        x_mb = x.reshape(M, mb, *x.shape[1:])
        tgt_mb = tgt.reshape(M, mb, *tgt.shape[1:])
        w_mb = w.reshape(M, mb)

        h0 = jnp.zeros(
            (mb, model.padded_len, model.dim), model.dtype
        )

        def tick(state, t):
            # stage 0 embeds microbatch t (clamped; bubbles masked below)
            t_in = jnp.clip(t, 0, M - 1)
            x_t = jax.lax.dynamic_index_in_dim(x_mb, t_in, keepdims=False)
            emb = _embed(model, other_p, x_t)
            h = jnp.where(s == 0, emb, state)
            h = run_stage(stage_blocks, h)
            # last stage finishes microbatch t - (S-1) at tick t
            t_out = t - (S - 1)
            t_oc = jnp.clip(t_out, 0, M - 1)
            preds = _head(model, other_p, h)
            preds = preds.reshape(preds.shape[0], -1).squeeze(-1)
            tgt_t = jax.lax.dynamic_index_in_dim(tgt_mb, t_oc, keepdims=False)
            w_t = jax.lax.dynamic_index_in_dim(w_mb, t_oc, keepdims=False)
            lvalid = (
                (s == S - 1) & (t_out >= 0) & (t_out < M)
            ).astype(jnp.float32)
            d = preds - tgt_t.reshape(preds.shape)
            sq_sum = jnp.sum(jnp.square(d) * w_t) * lvalid
            abs_sum = jnp.sum(jnp.abs(d) * w_t) * lvalid
            # rotate activations one stage forward (ring; stage 0's garbage
            # inbound is overwritten by its embed next tick)
            state = jax.lax.ppermute(
                h, "pipe", [(i, (i + 1) % S) for i in range(S)]
            )
            return state, (sq_sum, abs_sum)

        _, (sq_sums, abs_sums) = jax.lax.scan(
            tick, h0, jnp.arange(M + S - 1)
        )
        reduce_axes = ("pipe",) + batch_axes
        sq = jax.lax.psum(sq_sums.sum(), reduce_axes)
        ab = jax.lax.psum(abs_sums.sum(), reduce_axes)
        wsum = jax.lax.psum(w.sum(), batch_axes)
        return sq, ab, wsum

    bspec = lambda nd: P(batch_axes, *([None] * (nd - 1)))  # noqa: E731
    from jax import shard_map

    sq, ab, wsum = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("pipe"), P(), bspec(batch.ndim), bspec(targets.ndim), bspec(1)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(stage_tree, other, batch, targets, weights.reshape(-1))

    denom = jnp.maximum(wsum, 1e-9)
    mse = sq / denom
    mae = ab / denom
    loss = mae if l1 else mse
    return loss, mae
