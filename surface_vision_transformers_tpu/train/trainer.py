"""One Trainer for supervised regression AND masked-patch pretraining.

The reference implements two ~70%-duplicated driver scripts
(tools/train.py:271-435 and tools/pretrain.py:303-418, SURVEY §1); here a
single Trainer covers both via a task switch, redesigned TPU-first:

  * the whole (small) dataset lives on device; an epoch is ONE jitted
    ``lax.scan`` over shuffled batch indices — zero host<->device traffic per
    step, unlike the reference's per-batch ``.to(device)`` + ``.item()`` syncs
    (reference: tools/train.py:282,293-296);
  * the last partial batch is padded with weight-0 samples rather than
    dropped, so per-batch gradient scale matches the reference's
    mean-reduction exactly while shapes stay static for XLA;
  * metrics (loss sums, |err| sums) accumulate on device and are fetched once
    per epoch;
  * state (params, optimizer, PRNG) is donated between epochs;
  * everything runs under an optional ``jax.sharding.Mesh`` — batch sharded
    over the data axes, params replicated or sharded per ``parallel`` rules.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from surface_vision_transformers_tpu.models import MPP, SiT
from surface_vision_transformers_tpu.train.losses import get_loss_fn
from surface_vision_transformers_tpu.train.optim import build_optimizer
from surface_vision_transformers_tpu.utils.config import Experiment


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array
    # EMA shadow of params when training.ema > 0 (None = off). A pytree
    # None is an empty subtree, so states saved before this field existed
    # restore unchanged.
    ema_params: Any = None


@dataclasses.dataclass
class EpochMetrics:
    loss: float
    mae: float

    def as_dict(self) -> dict:
        return {"loss": self.loss, "mae": self.mae}


# Test-only hook: force the fused megakernel gates open (interpret mode on
# CPU meshes, any dtype). Deliberately NOT an env var — a leaked variable
# must never reroute a production run onto unvalidated-dtype paths (ADVICE
# r2); tests/dryrun set it via monkeypatch / try-finally on this module.
FORCE_FUSED = False


def _local_scalar(x) -> float:
    """The local copy of a jit-produced scalar under multi-process
    execution: the value is already globally reduced inside jit and
    replicated on every device, but `float(x)` refuses arrays spanning
    non-addressable devices — read this process's shard instead."""
    return float(np.asarray(x.addressable_data(0)))


def _seed_ema(params):
    """Fresh buffers for the EMA shadow — aliasing the live param arrays
    would make the donated epoch step pass the same buffer twice."""
    return jax.tree_util.tree_map(jnp.array, params)


def _batch_weights(n: int, bs: int) -> jnp.ndarray:
    """(steps, bs) float32 sample weights for clamped contiguous batching:
    batch i reads rows [min(i*bs, n-bs), ...+bs) of a (possibly permuted)
    dataset — ``lax.dynamic_slice`` clamps the final start the same way — so
    the last batch's first ``steps*bs - n`` rows repeat already-processed
    rows and get weight 0. Contiguous slices replace the per-step random-row
    gather, which XLA executes ~30x off bandwidth (measured 6.3 ms per
    (256, 4, 40962) take on v5e vs 0.12 ms for the slice)."""
    steps = math.ceil(n / bs)
    w = np.ones((steps, bs), np.float32)
    overlap = steps * bs - n
    if overlap:
        w[-1, :overlap] = 0.0
    return jnp.asarray(w)


class Trainer:
    """Task-generic trainer.

    Args:
      exp: resolved experiment config.
      model: SiT module (built from exp if None).
      mesh: optional jax.sharding.Mesh; data axes shard the batch.
    """

    def __init__(
        self,
        exp: Experiment,
        model: Optional[SiT] = None,
        mesh=None,
        patch_table=None,
        augment: Optional[Callable] = None,
    ):
        self.exp = exp
        self.mesh = mesh
        self.augment = augment  # callable(key, batch) -> batch, train-only
        model_overrides = {}
        if mesh is not None and getattr(exp.tpu, "seq_sharding", False):
            # both fields: a user-supplied model built without seq_sharding
            # has seq_shard_axis=None, and seq_mesh alone is inert
            model_overrides = {"seq_mesh": mesh, "seq_shard_axis": "model"}
        elif mesh is not None and mesh.size > 1:
            # DP/FSDP/TP without sequence sharding: attention shard_maps the
            # packed kernel over the batch axes (or falls back to the
            # GSPMD-partitionable einsum under TP) — a raw pallas_call on
            # sharded activations would be unpartitionable
            model_overrides = {"batch_mesh": mesh}
        if model is not None and model_overrides:
            # a user-supplied model must get the same mesh plumbing, or its
            # attention would dispatch a raw pallas kernel on sharded
            # activations (flax modules are frozen dataclasses -> clone)
            model = model.clone(**model_overrides)
        if model is None:
            if exp.model.model == "MS-SiT":
                from surface_vision_transformers_tpu.models import MSSiT

                model = MSSiT.from_config(
                    exp, patch_table=patch_table, **model_overrides
                )
            else:
                model = SiT.from_config(
                    exp, patch_table=patch_table, **model_overrides
                )
        self.model = model
        self.task = "mpp" if exp.is_pretraining else "regression"
        if self.task == "mpp":
            m = exp.mpp
            if isinstance(self.model, SiT):
                # reference MPP: per-token BERT corruption + linear recon
                # through the shared embedding (reference models/mpp.py:77-132)
                self.mpp = MPP(
                    encoder=self.model,
                    mask_prob=m.mask_prob,
                    replace_prob=m.replace_prob,
                    swap_prob=m.swap_prob,
                )
            else:
                # MS-SiT: the merged multiscale tokens have no per-token
                # inverse, so SSL is masked-WINDOW reconstruction through an
                # upsampling decoder (models/mpp_mssit.py, SimMIM-style)
                from surface_vision_transformers_tpu.models.mpp_mssit import (
                    MPPMSSiT,
                )

                self.mpp = MPPMSSiT(
                    encoder=self.model,
                    mask_prob=m.mask_prob,
                    replace_prob=m.replace_prob,
                    swap_prob=m.swap_prob,
                )
        else:
            self.mpp = None
        from surface_vision_transformers_tpu.parallel.pipeline import pipe_size

        self.pipe = pipe_size(mesh)
        if self.pipe > 1:
            if self.task == "mpp":
                raise ValueError(
                    "pipeline parallelism (tpu.mesh_pipe > 1) supports "
                    "supervised training only; MPP's corruption/recon head "
                    "is not stage-sharded"
                )
            if not isinstance(self.model, SiT):
                raise ValueError(
                    "pipeline parallelism is implemented for the SiT family "
                    "(uniform block stack); MS-SiT's per-stage shapes differ"
                )
            if self.model.dropout or self.model.emb_dropout:
                raise ValueError(
                    "pipeline parallelism requires dropout 0 (the staged "
                    "schedule is deterministic)"
                )
            if self.model.depth % self.pipe:
                raise ValueError(
                    f"depth {self.model.depth} not divisible by "
                    f"mesh_pipe={self.pipe}"
                )
            if exp.training.grad_accum > 1:
                raise ValueError(
                    "training.grad_accum > 1 with pipeline parallelism is "
                    "redundant — tune tpu.pipe_microbatches instead (the "
                    "GPipe schedule already microbatches each step)"
                )
        self.loss_fn = get_loss_fn(exp.training.l1loss)
        self.optimizer = build_optimizer(exp.optim)
        self._epoch_fns: dict[tuple, Callable] = {}
        self._eval_fns: dict[tuple, Callable] = {}
        self._token_cache: dict[int, tuple[Any, Any]] = {}

        mask_decoder = self.task == "mpp" and not exp.mpp.optimize_decoder
        if mesh is None and not mask_decoder:
            # one fused update over a single flat vector instead of ~150
            # per-leaf fusions — measured -8.8 ms/step for Adam on SiT-tiny
            # (v5e). Also holds for SGD at the EPOCH level (A/B: flattened
            # 5,613 surf/s vs 5,509 raw at bs=1024), even though the
            # ISOLATED flattened update microbenches 2.8 ms vs 0.02 raw —
            # one more case of microbenchmarks lying on this relay; epoch
            # numbers decide. Under a mesh the per-leaf TP/FSDP shardings
            # must survive, so the tree stays unflattened there.
            self.optimizer = optax.flatten(self.optimizer)

        if mask_decoder:
            # reproduce the reference quirk: decoder params get zero updates
            # (reference tools/pretrain.py:269-280 optimizes the encoder
            # only). NOTE: optax.masked alone is WRONG here — masked-out
            # leaves pass their updates (the raw gradients!) through
            # unchanged, which silently gradient-ASCENDS the decoder;
            # multi_transform routes them to set_to_zero instead.
            def labels(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "freeze" if any(
                        getattr(k, "key", None) in ("to_original", "mask_token")
                        for k in path
                    ) else "train",
                    params,
                )

            self.optimizer = optax.multi_transform(
                {"train": self.optimizer, "freeze": optax.set_to_zero()},
                labels,
            )

    # -- initialization -----------------------------------------------------

    def module(self):
        return self.mpp if self.task == "mpp" else self.model

    def init_state(self, sample_batch, seed: Optional[int] = None) -> TrainState:
        seed = self.exp.training.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(rng)
        mod = self.module()
        sample = jnp.asarray(sample_batch[:1])

        # ONE jitted computation for model init + optimizer init + EMA seed:
        # eager flax init dispatches every param op individually (hundreds of
        # ~60 ms relay round-trips on this host — measured 73 s of recipe
        # "setup"); compiled it is one dispatch and the compilation cache
        # makes later runs ~free
        def build(k, x):
            if self.task == "mpp":
                variables = mod.init({"params": k}, x, jax.random.PRNGKey(0))
            else:
                variables = mod.init(k, x)
            params = variables["params"]
            return (
                params,
                self.optimizer.init(params),
                _seed_ema(params) if self.exp.training.ema > 0 else None,
            )

        params, opt_state, ema = jax.jit(build)(init_rng, sample)
        return TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            ema_params=ema,
        )

    def load_params(self, state: TrainState, params) -> TrainState:
        return state.replace(
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=_seed_ema(params) if self.exp.training.ema > 0 else None,
        )

    def _ensure_ema(self, state: TrainState) -> TrainState:
        """Give a state the EMA leaf structure this Trainer expects — seeds
        the shadow from the raw params when resuming a pre-EMA checkpoint
        into an EMA run, and drops a stale shadow when EMA is off."""
        if self.exp.training.ema > 0:
            if state.ema_params is None:
                state = state.replace(ema_params=_seed_ema(state.params))
        elif state.ema_params is not None:
            state = state.replace(ema_params=None)
        return state

    def _ema_update(self, ema_params, params):
        """One shadow step (no-op pass-through when EMA is off)."""
        d = self.exp.training.ema
        if d <= 0 or ema_params is None:
            return ema_params
        return jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
        )

    def eval_params(self, state: TrainState):
        """The weights evaluation should use: the EMA shadow when enabled."""
        if self.exp.training.ema > 0 and state.ema_params is not None:
            return state.ema_params
        return state.params

    def _constrain_batch(self, x):
        """Pin per-step batch tensors to the ('data','fsdp') axes inside jit.
        This keeps compute data-parallel even when the whole dataset array is
        replicated (e.g. its row count doesn't divide the mesh); GSPMD pads
        uneven shards internally."""
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding

        from surface_vision_transformers_tpu.parallel import batch_pspec

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, batch_pspec(x.ndim))
        )

    # -- single-step loss ----------------------------------------------------

    def _mpp_tokens(self, data):
        """MPP without augmentation: tokenize the device-resident dataset ONCE
        per run (cached by array identity) instead of re-patchifying every
        batch every epoch (~7.8 ms per bs=1024 raw-input step on v5e).
        Produces exactly MPP.__call__'s per-batch ``target`` — the same
        patchify/rearrange/normalize functions in the same order — so loss
        numerics are unchanged. Costs ~1.2x the raw dataset in extra HBM
        (tokens coexist with the caller's raw array); datasets where that
        matters belong on the streaming path, which keeps per-batch
        tokenization."""
        if self.task != "mpp" or self.augment is not None or data is None:
            return data
        patch_dim = self.model.patch_dim
        if data.ndim == 3 and data.shape[-1] == patch_dim:
            return data  # already tokens
        key = id(data)
        cached = self._token_cache.get(key)
        if cached is not None and cached[0] is data:
            return cached[1]

        from surface_vision_transformers_tpu.ops import (
            normalize_tokens, patchify, patchify_chunked, rearrange_patched,
        )

        # chunk only when the dataset is not GSPMD-sharded: lax.map row
        # tiling fights a mesh-sharded batch axis (same opt-in rule as
        # fused_patch_embed's gather_chunk)
        chunked = self.mesh is None or self.mesh.size == 1

        @jax.jit
        def tok(x):
            if x.ndim == 4:
                return rearrange_patched(x)
            if chunked:
                post = None
                if self.model.norm_means is not None:
                    post = lambda t: normalize_tokens(
                        t, self.model.norm_means, self.model.norm_stds
                    )
                # the unchunked dataset-scale gather costs ~200 s of XLA
                # compile at n=4096 (12 s chunked; see ops.patchify_chunked)
                return patchify_chunked(x, self.model.patch_table, post=post)
            t = patchify(x, self.model.patch_table)
            if self.model.norm_means is not None:
                t = normalize_tokens(
                    t, self.model.norm_means, self.model.norm_stds
                )
            return t

        tokens = tok(data)
        self._token_cache[key] = (data, tokens)
        return tokens

    def _use_fused_train(self) -> bool:
        """Fused-block kernels with the single-kernel backward for the
        training forward: TPU + bf16 + no dropout + tile-aligned sequence;
        never in fp32 parity mode (set tpu.fused_train: false to disable)."""
        import jax as _jax

        from surface_vision_transformers_tpu.models.fused import _pure_dp

        from surface_vision_transformers_tpu.models import MSSiT

        forced = FORCE_FUSED  # test-only module flag (see its definition)
        return (
            # both families run the block megakernels (MS-SiT folds windows
            # into the batch dim — models/fused_mssit.py)
            type(self.model) in (SiT, MSSiT)
            and getattr(self.exp.tpu, "fused_train", True)
            and (_jax.default_backend() == "tpu" or forced)
            and (self.model.dtype == jnp.bfloat16 or forced)
            and self.model.precision is None
            and self.model.dropout == 0.0
            and self.model.emb_dropout == 0.0
            and self.model.seq_shard_axis is None
            # raw pallas megakernels are unpartitionable under GSPMD. A
            # PURE-DP mesh keeps them via the batch shard_map inside
            # models.fused (params replicated per shard); FSDP/TP meshes
            # run the modular path (attention still keeps its kernel via
            # Attention.batch_mesh)
            and (
                self.mesh is None
                or self.mesh.size == 1
                or _pure_dp(self.mesh)
            )
        )

    def _fused_batch_ok(self, b: int) -> bool:
        """Pure-DP fused shard_map needs the batch divisible by the data
        axis (mesh-trivial runs are always fine)."""
        return (
            self.mesh is None
            or self.mesh.size == 1
            or b % dict(self.mesh.shape).get("data", 1) == 0
        )

    def _loss(self, params, batch, targets, weights, rng, deterministic):
        if self.task == "mpp":
            if (
                deterministic
                and self._use_fused_train()
                and self._fused_batch_ok(batch.shape[0])
            ):
                from surface_vision_transformers_tpu.models import MSSiT

                if isinstance(self.model, MSSiT):
                    from surface_vision_transformers_tpu.models.fused_mssit import (
                        fused_mssit_mpp_loss as _fused_mpp,
                    )
                else:
                    from surface_vision_transformers_tpu.models.fused import (
                        fused_mpp_loss as _fused_mpp,
                    )

                loss, _ = _fused_mpp(
                    self.mpp, {"params": params}, batch, rng,
                    sample_weights=weights, mesh=self.mesh,
                    scan_blocks=self.exp.tpu.scan_blocks,
                )
                return loss, loss
            rngs = {"dropout": rng} if not deterministic else {}
            loss, _ = self.mpp.apply(
                {"params": params}, batch, rng,
                deterministic=deterministic, sample_weights=weights,
                rngs=rngs,
            )
            # MAE is not meaningful for MPP; report loss twice
            return loss, loss
        rngs = {"dropout": rng} if not deterministic else {}
        if self.pipe > 1:
            # GPipe stage sharding: the whole forward+loss runs as one
            # shard_map'd pipeline schedule (parallel/pipeline.py)
            from surface_vision_transformers_tpu.parallel.pipeline import (
                pipeline_loss,
            )

            return pipeline_loss(
                self.model, self.mesh, params, batch, targets, weights,
                l1=self.exp.training.l1loss,
                n_microbatches=getattr(
                    self.exp.tpu, "pipe_microbatches", 0
                ) or None,
            )
        if (
            deterministic
            and self._use_fused_train()
            and self._fused_batch_ok(batch.shape[0])
        ):
            from surface_vision_transformers_tpu.models import MSSiT

            if isinstance(self.model, MSSiT):
                from surface_vision_transformers_tpu.models.fused_mssit import (
                    fused_mssit_train_forward,
                )

                preds = fused_mssit_train_forward(
                    self.model, {"params": params}, batch, mesh=self.mesh,
                    scan_blocks=self.exp.tpu.scan_blocks,
                )
            else:
                from surface_vision_transformers_tpu.models.fused import (
                    fused_train_forward,
                )

                preds = fused_train_forward(
                    self.model, {"params": params}, batch, mesh=self.mesh,
                    scan_blocks=self.exp.tpu.scan_blocks,
                )
        else:
            preds = self.model.apply(
                {"params": params}, batch, deterministic=deterministic, rngs=rngs
            )
        preds = preds.reshape(preds.shape[0], -1).squeeze(-1)
        loss = self.loss_fn(preds, targets, weights)
        mae = (jnp.abs(preds - targets.reshape(preds.shape)) * weights).sum() / (
            jnp.maximum(weights.sum(), 1e-9)
        )
        return loss, mae

    def _grads_and_metrics(self, params, batch, targets, weights, rng,
                           deterministic):
        """(loss, mae), grads for one optimizer step — directly, or as a
        ``lax.scan`` over ``training.grad_accum`` microbatches with fp32
        gradient accumulation.

        Every loss here is a weighted mean (sum(w*err)/sum(w), losses.py; the
        MPP masked MSE normalizes per sample the same way), so the full-batch
        value and gradient are EXACTLY the weight-sum-scaled combination of
        the microbatch ones: g = sum_k W_k g_k / sum_k W_k. Peak activation
        memory drops to one microbatch's forward+backward; params, grads and
        the accumulators stay resident.
        """

        def loss_fg(p, b, t, w, r):
            return self._loss(p, b, t, w, r, deterministic)

        accum = self.exp.training.grad_accum
        if accum <= 1 or batch.shape[0] % accum:
            # ragged batches (smaller final dataset, bs clamped to n) fall
            # back to the direct step — correctness first, memory second
            (loss, mae), grads = jax.value_and_grad(loss_fg, has_aux=True)(
                params, batch, targets, weights, rng
            )
            return (loss, mae), grads

        mbs = batch.shape[0] // accum
        mb = batch.reshape(accum, mbs, *batch.shape[1:])
        mt = (
            targets.reshape(accum, mbs, *targets.shape[1:])
            if targets is not None
            else None
        )
        mw = weights.reshape(accum, mbs)
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )

        def body(carry, xs):
            g_acc, l_acc, m_acc, w_acc = carry
            b_k, t_k, w_k, k = xs
            # re-pin the microbatch to the data axes: the (accum, mbs, ...)
            # reshape lets GSPMD spread axis 0's sharding across the accum
            # axis, which would leave each scanned microbatch on a device
            # subset (or pay a resharding collective per microbatch)
            b_k = self._constrain_batch(b_k)
            t_k = self._constrain_batch(t_k) if t_k is not None else None
            # decorrelate from the augmentation key fold_in(step_rng, 7):
            # at grad_accum >= 8 a bare fold_in(rng, k) would hand
            # microbatch 7 the exact key that augmented this step's batch
            mrng = jax.random.fold_in(jax.random.fold_in(rng, 0x5EED), k)
            (loss, mae), g = jax.value_and_grad(loss_fg, has_aux=True)(
                params, b_k, t_k, w_k, mrng
            )
            w_sum = w_k.sum()
            g_acc = jax.tree_util.tree_map(
                lambda a, gi: a + gi.astype(jnp.float32) * w_sum, g_acc, g
            )
            return (
                g_acc,
                l_acc + loss * w_sum,
                m_acc + mae * w_sum,
                w_acc + w_sum,
            ), None

        (g_acc, l_acc, m_acc, w_acc), _ = jax.lax.scan(
            body,
            (zeros, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)),
            (mb, mt, mw, jnp.arange(accum)),
        )
        w_tot = jnp.maximum(w_acc, 1e-9)
        grads = jax.tree_util.tree_map(
            lambda g, p: (g / w_tot).astype(p.dtype), g_acc, params
        )
        return (l_acc / w_tot, m_acc / w_tot), grads

    def _optimizer_step(self, state: TrainState, batch, tgt, w, deterministic):
        """The one optimizer step both epoch modes share (on-device scan AND
        streaming): constrain/augment the batch, grads (direct or
        accumulated), optimizer update, EMA shadow. Returns
        (new_state, loss, weighted |err| sum)."""
        batch = self._constrain_batch(batch)
        tgt = self._constrain_batch(tgt) if tgt is not None else None
        rng, step_rng = jax.random.split(state.rng)
        if self.augment is not None:
            batch = self.augment(jax.random.fold_in(step_rng, 7), batch)

        (loss, mae), grads = self._grads_and_metrics(
            state.params, batch, tgt, w, step_rng, deterministic
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            rng=rng,
            ema_params=self._ema_update(state.ema_params, params),
        )
        return new_state, loss, mae * w.sum()

    # -- jitted epoch --------------------------------------------------------

    def _build_epoch_fn(self, steps: int, bs: int):
        deterministic = (
            self.exp.model.dropout == 0.0 and self.exp.model.emb_dropout == 0.0
        )

        def epoch_fn(state: TrainState, data, targets, w):
            # shuffle ONCE per epoch (a single whole-dataset permute), then
            # every step slices a contiguous batch — per-step random-row
            # gathers cost ~6 ms each on v5e (see _batch_weights). The
            # permuted copy doubles dataset-resident HBM for the epoch;
            # datasets too big for that belong on the streaming path
            # (train_epoch_streaming).
            perm_rng = jax.random.fold_in(state.rng, 17)
            perm = jax.random.permutation(perm_rng, data.shape[0])
            data_p = self._constrain_batch(jnp.take(data, perm, axis=0))
            targets_p = (
                self._constrain_batch(jnp.take(targets, perm, axis=0))
                if targets is not None
                else None
            )

            def one_step(state, sl):
                i, b_w = sl
                batch = jax.lax.dynamic_slice_in_dim(data_p, i * bs, bs, axis=0)
                tgt = (
                    jax.lax.dynamic_slice_in_dim(targets_p, i * bs, bs, axis=0)
                    if targets_p is not None
                    else None
                )
                new_state, loss, mae_sum = self._optimizer_step(
                    state, batch, tgt, b_w, deterministic
                )
                return new_state, (loss, mae_sum)

            state, (losses, mae_sums) = jax.lax.scan(
                one_step, state, (jnp.arange(steps), w)
            )
            return state, losses.mean(), mae_sums.sum()

        return jax.jit(epoch_fn, donate_argnums=(0,))

    def train_epoch(self, state: TrainState, data, targets=None) -> tuple[TrainState, EpochMetrics]:
        state = self._ensure_ema(state)
        data = self._mpp_tokens(data)
        n = data.shape[0]
        bs = min(self.exp.training.bs, n)
        steps = math.ceil(n / bs)
        key = (steps, bs, "train")
        if key not in self._epoch_fns:
            self._epoch_fns[key] = self._build_epoch_fn(steps, bs)
        w = _batch_weights(n, bs)
        state, loss, mae_sum = self._epoch_fns[key](state, data, targets, w)
        return state, EpochMetrics(loss=float(loss), mae=float(mae_sum) / n)

    # -- streaming epoch (host-resident datasets, e.g. bigger than HBM) ------

    def _build_step_fn(self):
        deterministic = (
            self.exp.model.dropout == 0.0 and self.exp.model.emb_dropout == 0.0
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, batch, tgt, w):
            return self._optimizer_step(state, batch, tgt, w, deterministic)

        return step_fn

    def train_epoch_streaming(self, state: TrainState, loader) -> tuple[TrainState, EpochMetrics]:
        """One epoch over a data.pipeline.StreamingLoader (host-resident
        data); per-step jit with donated state, H2D overlapped by the loader."""
        state = self._ensure_ema(state)
        if not hasattr(self, "_step_fn"):
            self._step_fn = self._build_step_fn()
        losses, mae_sums = [], []
        for batch, tgt, w in loader:
            state, loss, mae_sum = self._step_fn(state, batch, tgt, w)
            losses.append(loss)
            mae_sums.append(mae_sum)
        n = loader.num_samples
        try:
            loss = float(jnp.stack(losses).mean())
            mae = float(jnp.stack(mae_sums).sum()) / n
        except RuntimeError:
            # multi-process execution: the jitted scalars are global
            # replicated arrays that can't be fetched whole across
            # processes — every process holds an addressable copy of the
            # (already globally-reduced) value
            loss = float(np.mean([_local_scalar(v) for v in losses]))
            mae = float(np.sum([_local_scalar(v) for v in mae_sums])) / n
        return state, EpochMetrics(loss=loss, mae=mae)

    def evaluate_streaming(self, state: TrainState, loader):
        """Full-split eval over a StreamingLoader (host-resident data).
        The loader must have ``shuffle=False`` so predictions come back in
        row order. Returns (metrics, predictions | None)."""
        if loader.shuffle:
            raise ValueError("evaluate_streaming needs a shuffle=False loader")
        if not hasattr(self, "_eval_step_fn"):
            @jax.jit
            def eval_step(params, batch, tgt, w, i):
                batch = self._constrain_batch(batch)
                tgt = self._constrain_batch(tgt)
                if self.task == "mpp":
                    rng = jax.random.fold_in(jax.random.PRNGKey(1234), i)
                    loss, _ = self.mpp.apply(
                        {"params": params}, batch, rng, sample_weights=w
                    )
                    return loss * w.sum(), jnp.zeros(()), jnp.zeros(
                        (batch.shape[0],)
                    )
                preds = self._infer(params, batch)
                preds = preds.reshape(preds.shape[0], -1).squeeze(-1)
                err = jnp.abs(preds - tgt.reshape(preds.shape))
                sq = jnp.square(preds - tgt.reshape(preds.shape))
                return (sq * w).sum(), (err * w).sum(), preds

            self._eval_step_fn = eval_step

        loss_sum = err_sum = 0.0
        preds_all = []
        for i, (batch, tgt, w) in enumerate(loader):
            ls, es, preds = self._eval_step_fn(
                self.eval_params(state), batch, tgt, w, jnp.int32(i)
            )
            try:
                ls_f, es_f = float(ls), float(es)
                p_np = np.asarray(jax.device_get(preds))
            except RuntimeError:
                # multi-process: scalars are replicated (read the local
                # copy); per-sample preds span processes — allgather them
                # so every process exports the full row-ordered CSV
                from jax.experimental import multihost_utils

                ls_f, es_f = _local_scalar(ls), _local_scalar(es)
                p_np = np.asarray(
                    multihost_utils.process_allgather(preds, tiled=True)
                )
            loss_sum += ls_f
            err_sum += es_f
            preds_all.append(p_np)
        n = loader.num_samples
        if self.task == "mpp":
            return EpochMetrics(loss=loss_sum / n, mae=loss_sum / n), None
        flat = np.concatenate(preds_all)[:n]  # drop last-batch padding rows
        return EpochMetrics(loss=loss_sum / n, mae=err_sum / n), flat

    # -- evaluation ----------------------------------------------------------

    def _use_fused_inference(self) -> bool:
        """Megakernel forward for evaluation: TPU + bf16 + tile-aligned
        sequence + regression task (MPP eval needs the recon head)."""
        import jax as _jax

        from surface_vision_transformers_tpu.models.fused import _pure_dp

        from surface_vision_transformers_tpu.models import MSSiT

        forced = FORCE_FUSED
        return (
            type(self.model) in (SiT, MSSiT)
            and self.task == "regression"
            and (_jax.default_backend() == "tpu" or forced)
            and (self.model.dtype == jnp.bfloat16 or forced)
            and self.model.precision is None
            # same mesh rule as _use_fused_train
            and (
                self.mesh is None
                or self.mesh.size == 1
                or _pure_dp(self.mesh)
            )
        )

    def _resolve_quant(self) -> str | None:
        """tpu.quant with the measured crossover applied: W8A8 serving only
        pays off from dim >= INT8_MIN_DIM (SiT-base 1.45-1.47x; SiT-tiny is a
        wash-to-loss, 22.7k int8 vs 23.3k bf16 surf/s at bs=256 — see
        BENCH_DETAILS.json inference_int8 / docs/design.md). Below the
        crossover int8 falls back to bf16 with a one-time notice. MS-SiT
        applies the same bound per stage inside fused_mssit."""
        quant = getattr(self.exp.tpu, "quant", "none")
        if quant == "none":
            return None
        from surface_vision_transformers_tpu.models import MSSiT
        from surface_vision_transformers_tpu.models.fused_mssit import (
            INT8_MIN_DIM,
        )

        if isinstance(self.model, MSSiT):
            return quant  # per-stage dims gated in fused_mssit._stages
        if self.model.dim < INT8_MIN_DIM:
            if not getattr(self, "_quant_fallback_warned", False):
                self._quant_fallback_warned = True
                print(
                    f"tpu.quant: int8 requested but dim {self.model.dim} < "
                    f"{INT8_MIN_DIM}: serving bf16 instead (int8 is a wash "
                    "below the crossover — SiT-tiny measured 22.7k int8 vs "
                    "23.3k bf16 surf/s; it wins 1.45x at SiT-base)"
                )
            return None
        return quant

    def _infer(self, params, batch):
        if self._use_fused_inference() and self._fused_batch_ok(batch.shape[0]):
            from surface_vision_transformers_tpu.models import MSSiT

            quant = self._resolve_quant()
            if isinstance(self.model, MSSiT):
                from surface_vision_transformers_tpu.models.fused_mssit import (
                    fused_mssit_forward,
                )

                return fused_mssit_forward(
                    self.model, {"params": params}, batch, mesh=self.mesh,
                    quant=quant,
                    scan_blocks=self.exp.tpu.scan_blocks,
                )
            from surface_vision_transformers_tpu.models.fused import fused_forward

            return fused_forward(
                self.model, {"params": params}, batch, mesh=self.mesh,
                quant=quant,
                scan_blocks=self.exp.tpu.scan_blocks,
            )
        return self.model.apply({"params": params}, batch)

    def _build_eval_fn(self, steps: int, bs: int):
        def eval_fn(params, data, targets, w):
            def one_step(carry, sl):
                i, b_w = sl
                batch = self._constrain_batch(
                    jax.lax.dynamic_slice_in_dim(data, i * bs, bs, axis=0)
                )
                if self.task == "mpp":
                    # deterministic eval corruption: fixed fold-in of batch id
                    rng = jax.random.fold_in(jax.random.PRNGKey(1234), i)
                    loss, _ = self.mpp.apply(
                        {"params": params}, batch, rng, sample_weights=b_w
                    )
                    return carry, (loss * b_w.sum(), jnp.zeros(()), jnp.zeros((bs,)))
                tgt = jax.lax.dynamic_slice_in_dim(targets, i * bs, bs, axis=0)
                preds = self._infer(params, batch)
                preds = preds.reshape(preds.shape[0], -1).squeeze(-1)
                err = jnp.abs(preds - tgt.reshape(preds.shape))
                sq = jnp.square(preds - tgt.reshape(preds.shape))
                return carry, ((sq * b_w).sum(), (err * b_w).sum(), preds)

            _, (loss_sums, err_sums, preds) = jax.lax.scan(
                one_step, None, (jnp.arange(steps), w)
            )
            return loss_sums.sum(), err_sums.sum(), preds

        return jax.jit(eval_fn)

    def evaluate(self, state: TrainState, data, targets=None):
        """Full-split eval at training.bs_val (0 -> training.bs).
        Returns (metrics, predictions)."""
        data = self._mpp_tokens(data)
        n = data.shape[0]
        bs_val = self.exp.training.bs_val or self.exp.training.bs
        bs = min(bs_val, n)
        steps = math.ceil(n / bs)
        key = (steps, bs, "eval")
        if key not in self._eval_fns:
            self._eval_fns[key] = self._build_eval_fn(steps, bs)
        w = _batch_weights(n, bs)
        loss_sum, err_sum, preds = self._eval_fns[key](
            self.eval_params(state), data, targets, w
        )
        if self.task == "mpp":
            return EpochMetrics(loss=float(loss_sum) / n, mae=float(loss_sum) / n), None
        # batch i holds rows [min(i*bs, n-bs), +bs): drop the last batch's
        # re-read prefix to restore row order
        if jax.process_count() > 1:
            # preds shard across processes; np.asarray on a non-addressable
            # array raises — gather every host's shards first
            from jax.experimental import multihost_utils

            preds = multihost_utils.process_allgather(preds, tiled=True)
        preds = np.asarray(preds)
        overlap = steps * bs - n
        flat = np.concatenate([preds[:-1].reshape(-1), preds[-1][overlap:]])
        return (
            EpochMetrics(loss=float(loss_sum) / n, mae=float(err_sum) / n),
            flat,
        )
