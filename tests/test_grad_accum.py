"""Gradient accumulation (``training.grad_accum``): the recipe's effective
batch size at ~1/K of the activation memory.

The weighted-mean losses make the microbatch combination exact
(g = sum_k W_k g_k / sum_k W_k, trainer._grads_and_metrics), so accumulated
training is the SAME trajectory as direct training up to fp32 reduction
order — pinned here per optimizer, plus the ragged-batch fallback, the MPP
task, and the config contract. New capability; the reference has none
(its only batch knob is the DataLoader bs, tools/train.py:107-122).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.data import make_regression_dataset
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict

from tests.test_trainer import L, V, C, tiny_config, _model_override


@pytest.fixture(scope="module")
def synth():
    data, labels = make_regression_dataset(
        96, num_channels=C, num_patches=L, num_vertices=V, seed=3,
        label_range=(-1.0, 1.0),
    )
    return jnp.asarray(data), jnp.asarray(labels)


def _run_epochs(raw, synth, epochs=3):
    data, labels = synth
    exp = from_dict(raw)
    trainer = Trainer(exp, model=_model_override(exp))
    state = trainer.init_state(data[:1])
    losses = []
    for _ in range(epochs):
        state, m = trainer.train_epoch(state, data, labels)
        losses.append(m.loss)
    return np.asarray(losses), state


@pytest.mark.parametrize("optimiser", ["SGD", "AdamW"])
def test_accum_matches_direct_trajectory(synth, optimiser):
    base = tiny_config(bs=32)
    base["optimisation"] = {"optimiser": optimiser}
    direct, s1 = _run_epochs(base, synth)

    accum_cfg = tiny_config(bs=32, grad_accum=4)
    accum_cfg["optimisation"] = {"optimiser": optimiser}
    accum, s2 = _run_epochs(accum_cfg, synth)

    np.testing.assert_allclose(accum, direct, rtol=2e-4)
    p1 = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(s1.params)])
    p2 = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(s2.params)])
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=5e-3, atol=1e-5)


def test_accum_with_ragged_final_batch(synth):
    # 96 samples at bs 36 -> final batch is the weight-padded ragged one;
    # 36 % grad_accum(3) == 0 so every batch still accumulates, and the
    # zero-weight padding rows contribute zero to the weighted combination
    direct, _ = _run_epochs(tiny_config(bs=36), synth)
    accum, _ = _run_epochs(tiny_config(bs=36, grad_accum=3), synth)
    np.testing.assert_allclose(accum, direct, rtol=2e-4)


def test_accum_mpp_runs(synth):
    data, _ = synth
    raw = tiny_config(bs=32, grad_accum=2, epochs=2)
    raw["SSL"] = "mpp"
    raw["pretraining_mpp"] = {"mask_prob": 0.5, "replace_prob": 0.8,
                              "swap_prob": 0.02}
    exp = from_dict(raw)
    trainer = Trainer(exp, model=_model_override(exp))
    state = trainer.init_state(data[:1])
    state, m0 = trainer.train_epoch(state, data)
    state, m1 = trainer.train_epoch(state, data)
    assert np.isfinite(m0.loss) and np.isfinite(m1.loss)
    assert m1.loss < m0.loss  # two epochs of a tiny model should improve


def test_accum_under_data_mesh_matches_direct(synth):
    """Microbatch reshape (bs -> K, bs/K) composes with batch sharding over
    the data axis: each scanned microbatch keeps its axis-0 sharding."""
    from surface_vision_transformers_tpu.parallel import make_mesh

    data, labels = synth
    mesh = make_mesh(data=2)

    def run(ga):
        exp = from_dict(tiny_config(bs=32, grad_accum=ga))
        trainer = Trainer(exp, model=_model_override(exp), mesh=mesh)
        state = trainer.init_state(data[:1])
        losses = []
        for _ in range(2):
            state, m = trainer.train_epoch(state, data, labels)
            losses.append(m.loss)
        return np.asarray(losses)

    np.testing.assert_allclose(run(4), run(1), rtol=2e-4)


def test_grad_accum_config_contract():
    with pytest.raises(ValueError, match="divisible"):
        from_dict(tiny_config(bs=30, grad_accum=4))
    with pytest.raises(ValueError, match="grad_accum"):
        from_dict(tiny_config(grad_accum=0))


def test_grad_accum_rejected_with_pipeline(synth):
    from surface_vision_transformers_tpu.parallel import make_mesh

    raw = tiny_config(bs=32, grad_accum=2)
    raw["transformer"]["depth"] = 2
    exp = from_dict(raw)
    with pytest.raises(ValueError, match="pipe_microbatches"):
        Trainer(exp, model=_model_override(exp), mesh=make_mesh(data=1, pipe=2))


def test_accum_matches_direct_on_streaming_path(synth):
    """train_epoch_streaming shares _optimizer_step, so accumulation must be
    exact there too (same weighted combination; loader order fixed by seed)."""
    from surface_vision_transformers_tpu.data.pipeline import StreamingLoader

    data, labels = synth

    def run(ga):
        exp = from_dict(tiny_config(bs=32, grad_accum=ga))
        trainer = Trainer(exp, model=_model_override(exp))
        state = trainer.init_state(data[:1])
        losses = []
        for epoch in range(2):
            loader = StreamingLoader(np.asarray(data), np.asarray(labels),
                                     batch_size=32, shuffle=True, seed=0)
            loader.set_epoch(epoch)
            state, m = trainer.train_epoch_streaming(state, loader)
            losses.append(m.loss)
        return np.asarray(losses)

    np.testing.assert_allclose(run(2), run(1), rtol=2e-4)
