"""Optimizer-semantics parity vs torch: one update step on identical params
and gradients must match for SGD(momentum, nesterov, weight_decay), Adam and
AdamW — the reference's exact optimizer matrix (tools/train.py:228-243)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from surface_vision_transformers_tpu.train import build_optimizer
from surface_vision_transformers_tpu.utils.config import OptimConfig


def _run_parity(cfg: OptimConfig, torch_opt_fn, steps=3):
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 5)).astype(np.float32)
    grads = [rng.standard_normal((4, 5)).astype(np.float32) for _ in range(steps)]

    # torch
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch_opt_fn([wt])
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    params = {"w": jnp.asarray(w0)}
    tx = build_optimizer(cfg)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=2e-5, atol=1e-6
    )


def test_sgd_momentum_parity():
    _run_parity(
        OptimConfig(name="SGD", lr=0.1, momentum=0.9, weight_decay=1e-2),
        lambda p: torch.optim.SGD(p, lr=0.1, momentum=0.9, weight_decay=1e-2),
    )


def test_sgd_nesterov_parity():
    _run_parity(
        OptimConfig(name="SGD", lr=0.05, momentum=0.9, nesterov=True),
        lambda p: torch.optim.SGD(p, lr=0.05, momentum=0.9, nesterov=True),
    )


def test_adam_parity():
    _run_parity(
        OptimConfig(name="Adam", lr=1e-3, weight_decay=1e-2),
        lambda p: torch.optim.Adam(p, lr=1e-3, weight_decay=1e-2),
    )


def test_adamw_parity():
    _run_parity(
        OptimConfig(name="AdamW", lr=1e-3, weight_decay=1e-2),
        lambda p: torch.optim.AdamW(p, lr=1e-3, weight_decay=1e-2),
    )


def test_grad_clip_parity():
    """optimisation.grad_clip == torch clip_grad_norm_ between backward and
    step (new knob; 0 = off = reference behaviour)."""
    rng = np.random.default_rng(1)
    w0 = rng.standard_normal((4, 5)).astype(np.float32)
    # large-magnitude grads so the clip actually engages every step
    grads = [10.0 * rng.standard_normal((4, 5)).astype(np.float32)
             for _ in range(3)]
    clip = 0.5

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([wt], clip)
        opt.step()

    params = {"w": jnp.asarray(w0)}
    tx = build_optimizer(
        OptimConfig(name="SGD", lr=0.1, momentum=0.9, grad_clip=clip)
    )
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=2e-5, atol=1e-6
    )


def test_grad_clip_config_contract():
    with pytest.raises(ValueError, match="grad_clip"):
        OptimConfig(grad_clip=-1.0)
