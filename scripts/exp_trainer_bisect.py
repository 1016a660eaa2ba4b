"""Bisect the trainer epoch's per-step overhead beyond value_and_grad:
raw vg-in-scan measures 169.4 ms/step while trainer.train_epoch runs 182.4
(bs=1024) — locate the missing ~13 ms by toggling epoch_fn features."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import math

import optax

from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.train.trainer import TrainState
from surface_vision_transformers_tpu.utils.config import from_dict


def main():
    key = jax.random.PRNGKey(0)
    n, bs = 8192, 1024
    steps = n // bs
    table = load_patch_table(6, 2)
    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, patch_table=table.indices)
    data = jax.random.normal(key, (n, 4, 40962), jnp.bfloat16)
    labels = jax.random.normal(key, (n,))
    exp = from_dict({
        "resolution": {"ico": 6, "sub_ico": 2},
        "transformer": {"dim": 192, "depth": 12, "heads": 3, "mlp_dim": 768},
        "training": {"LR": 1e-5, "bs": bs, "epochs": 1},
        "optimisation": {"optimiser": "SGD"},
        "SGD": {"momentum": 0.9},
    })
    trainer = Trainer(exp, model=model)
    state0 = trainer.init_state(data[:1])

    def timed_epoch(fn, state):
        # block_until_ready returns BEFORE execution through this relay
        # (bench.py docstring) — fetching the scalar loss is the fence
        state, loss, _ = fn(state, data, labels, trainer_w)  # compile
        float(loss)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            state, loss, _ = fn(state, data, labels, trainer_w)
            float(loss)
            e = time.perf_counter() - t0
            best = e if best is None else min(best, e)
        return best

    from surface_vision_transformers_tpu.train.trainer import _batch_weights

    trainer_w = _batch_weights(n, bs)

    def build(permute=True, mae=True, opt=True, rng_split=True):
        def epoch_fn(state, data, targets, w):
            if permute:
                perm_rng = jax.random.fold_in(state.rng, 17)
                perm = jax.random.permutation(perm_rng, data.shape[0])
                data_p = jnp.take(data, perm, axis=0)
                targets_p = jnp.take(targets, perm, axis=0)
            else:
                data_p, targets_p = data, targets

            def one_step(state, sl):
                i, b_w = sl
                batch = jax.lax.dynamic_slice_in_dim(data_p, i * bs, bs, 0)
                tgt = jax.lax.dynamic_slice_in_dim(targets_p, i * bs, bs, 0)
                if rng_split:
                    rng, step_rng = jax.random.split(state.rng)
                else:
                    rng, step_rng = state.rng, state.rng

                def loss_for_grad(p):
                    return trainer._loss(p, batch, tgt, b_w, step_rng, True)

                (loss, m), grads = jax.value_and_grad(
                    loss_for_grad, has_aux=True)(state.params)
                if opt:
                    updates, opt_state = trainer.optimizer.update(
                        grads, state.opt_state, state.params)
                    params = optax.apply_updates(state.params, updates)
                else:
                    params, opt_state = state.params, state.opt_state
                new_state = TrainState(params=params, opt_state=opt_state,
                                       step=state.step + 1, rng=rng)
                return new_state, (loss, m * b_w.sum() if mae else loss)

            state, (losses, maes) = jax.lax.scan(
                one_step, state, (jnp.arange(steps), w))
            return state, losses.mean(), maes.sum()

        return jax.jit(epoch_fn, donate_argnums=(0,))

    for name, kw in (
        ("full (trainer-equivalent)", {}),
        ("no permute", {"permute": False}),
        ("no optimizer", {"opt": False}),
        ("no mae aux", {"mae": False}),
        ("no rng split", {"rng_split": False}),
        ("bare (none of the above)", {"permute": False, "opt": False,
                                      "mae": False, "rng_split": False}),
    ):
        st = trainer.init_state(data[:1])  # fresh buffers (epochs donate)
        e = timed_epoch(build(**kw), st)
        print(f"{name:28s}: {e/steps*1e3:7.1f} ms/step ({n/e:6.0f} surf/s)",
              flush=True)


if __name__ == "__main__":
    main()
