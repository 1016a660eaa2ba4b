"""Regression losses with sample weights.

The reference uses unweighted nn.MSELoss / nn.L1Loss over each batch
(reference: tools/train.py:245-248). Sample weights exist here so the
on-device epoch loop can pad the last partial batch instead of dropping it
(weight 0 on padding) while keeping per-batch gradient scale identical to the
reference's mean-reduction over the true batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_mse(pred: jax.Array, target: jax.Array, weights=None) -> jax.Array:
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    err = jnp.square(pred - target)
    if weights is None:
        return err.mean()
    weights = weights.reshape(-1)
    return (err * weights).sum() / jnp.maximum(weights.sum(), 1e-9)


def weighted_l1(pred: jax.Array, target: jax.Array, weights=None) -> jax.Array:
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    err = jnp.abs(pred - target)
    if weights is None:
        return err.mean()
    weights = weights.reshape(-1)
    return (err * weights).sum() / jnp.maximum(weights.sum(), 1e-9)


def get_loss_fn(l1: bool):
    return weighted_l1 if l1 else weighted_mse
