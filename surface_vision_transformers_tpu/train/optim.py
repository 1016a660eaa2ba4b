"""Optimizer + LR-schedule construction (optax).

Covers the reference's optimizer matrix (reference: tools/train.py:228-243 —
Adam / SGD(momentum, nesterov) / AdamW, each with weight_decay) with matching
semantics: torch SGD/Adam treat weight_decay as L2-into-gradient (applied
before momentum/moment accumulation), AdamW as decoupled decay. The reference
imports StepLR / ReduceLROnPlateau / warmup schedulers but never instantiates
any (reference: tools/pretrain.py:42-50,284-288), i.e. its effective schedule
is constant; here step / cosine / warmup-cosine are first-class and selected
by ``optimisation.schedule``.
"""

from __future__ import annotations

import optax

from surface_vision_transformers_tpu.utils.config import OptimConfig


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.lr)
    if cfg.schedule == "step":
        # StepLR(stepsize, decay) staircase (reference config block
        # config/SiT/training/hparams.yml:63-65)
        return lambda step: cfg.lr * cfg.step_decay ** (step // cfg.step_size)
    if cfg.schedule == "cosine":
        return optax.cosine_decay_schedule(
            cfg.lr, cfg.cosine_t_max, alpha=cfg.cosine_eta_min / cfg.lr
        )
    if cfg.schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, cfg.cosine_t_max,
            end_value=cfg.cosine_eta_min,
        )
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    base = _build_base(cfg)
    if cfg.grad_clip > 0:
        # clip the raw gradient's global norm BEFORE any decay/momentum —
        # torch recipes call clip_grad_norm_ between backward and step,
        # which is the same placement
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), base)
    return base


def _build_base(cfg: OptimConfig) -> optax.GradientTransformation:
    schedule = build_schedule(cfg)
    if cfg.name == "SGD":
        parts = []
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(
            optax.sgd(
                schedule,
                momentum=cfg.momentum if cfg.momentum > 0 else None,
                nesterov=cfg.nesterov,
            )
        )
        return optax.chain(*parts)
    if cfg.name == "Adam":
        parts = []
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.adam(schedule))
        return optax.chain(*parts)
    if cfg.name == "AdamW":
        return optax.adamw(schedule, weight_decay=cfg.weight_decay)
    raise ValueError(f"unknown optimiser {cfg.name!r}")
