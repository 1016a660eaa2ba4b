"""EMA of parameters (``training.ema``): validation/best-checkpoint/testing
use an exponential moving average of the weights while the raw weights keep
training. New capability (the reference evaluates raw weights only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.data import make_regression_dataset
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.train.trainer import TrainState
from surface_vision_transformers_tpu.utils.config import TrainingConfig, from_dict

from tests.test_trainer import L, V, C, tiny_config, _model_override

N = 32  # bs == n -> exactly one optimizer step per epoch (recurrence test)
DECAY = 0.5


@pytest.fixture(scope="module")
def synth():
    data, labels = make_regression_dataset(
        N, num_channels=C, num_patches=L, num_vertices=V, seed=7,
        label_range=(-1.0, 1.0),
    )
    return jnp.asarray(data), jnp.asarray(labels)


def _trainer(synth, **training_overrides):
    exp = from_dict(tiny_config(bs=N, **training_overrides))
    trainer = Trainer(exp, model=_model_override(exp))
    state = trainer.init_state(synth[0][:1])
    return trainer, state


def _flat(tree):
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(tree)]
    )


def test_ema_matches_hand_recurrence(synth):
    """With one step per epoch, the shadow after k epochs must equal the
    recurrence e_k = d*e_{k-1} + (1-d)*p_k over the raw-params trajectory
    (which EMA must not perturb)."""
    data, labels = synth
    tr_raw, st_raw = _trainer(synth)
    tr_ema, st_ema = _trainer(synth, ema=DECAY)

    # capture host copies: the epoch step donates the state, deleting the
    # device buffers a plain reference would still point at
    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    ema_ref = host(st_raw.params)  # same seed -> same init; e_0 = p_0
    for _ in range(3):
        st_raw, m_raw = tr_raw.train_epoch(st_raw, data, labels)
        st_ema, m_ema = tr_ema.train_epoch(st_ema, data, labels)
        # training itself is untouched by the shadow
        np.testing.assert_allclose(m_ema.loss, m_raw.loss, rtol=1e-6)
        ema_ref = jax.tree_util.tree_map(
            lambda e, p: e * DECAY + p * (1 - DECAY), ema_ref, host(st_raw.params)
        )
    np.testing.assert_allclose(
        _flat(st_ema.ema_params), _flat(ema_ref), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        _flat(st_ema.params), _flat(st_raw.params), rtol=1e-5, atol=1e-7
    )


def test_evaluate_uses_ema_weights(synth):
    data, labels = synth
    tr_ema, st = _trainer(synth, ema=0.9)
    for _ in range(3):
        st, _ = tr_ema.train_epoch(st, data, labels)
    m_ema, _ = tr_ema.evaluate(st, data, labels)

    # same weights evaluated through an EMA-off trainer
    tr_raw, _ = _trainer(synth)
    m_shadow, _ = tr_raw.evaluate(st.replace(params=st.ema_params), data, labels)
    m_raw, _ = tr_raw.evaluate(st, data, labels)

    np.testing.assert_allclose(m_ema.mae, m_shadow.mae, rtol=1e-6)
    assert abs(m_ema.mae - m_raw.mae) > 1e-7  # shadow genuinely differs


def test_pre_ema_checkpoint_resumes_into_ema_run(synth):
    """A state saved without the shadow (ema_params=None) enters an EMA run:
    _ensure_ema seeds the shadow from the raw params."""
    data, labels = synth
    tr_raw, st = _trainer(synth)
    st, _ = tr_raw.train_epoch(st, data, labels)
    assert st.ema_params is None

    tr_ema, _ = _trainer(synth, ema=DECAY)
    st2, m = tr_ema.train_epoch(st, data, labels)
    assert st2.ema_params is not None and np.isfinite(m.loss)

    # and the reverse: a shadow-carrying state entering an EMA-off trainer
    st3, m3 = tr_raw.train_epoch(st2, data, labels)
    assert st3.ema_params is None and np.isfinite(m3.loss)


def test_ema_config_contract():
    with pytest.raises(ValueError, match="ema"):
        TrainingConfig(ema=1.0)
    with pytest.raises(ValueError, match="ema"):
        TrainingConfig(ema=-0.1)


def test_restore_flex_across_ema_settings(synth, tmp_path):
    """Orbax checkpoints cross the EMA boundary both ways: a pre-EMA
    checkpoint restores into an EMA run (shadow seeded) and an EMA checkpoint
    restores into an EMA-off run (shadow dropped)."""
    from surface_vision_transformers_tpu.checkpoints import orbax_io
    from surface_vision_transformers_tpu.train.runner import _restore_state_flex

    data, labels = synth
    tr_raw, st_raw = _trainer(synth)
    st_raw, _ = tr_raw.train_epoch(st_raw, data, labels)
    orbax_io.save_state(tmp_path / "raw", st_raw, {})

    tr_ema, st_tmpl = _trainer(synth, ema=DECAY)
    restored, _ = _restore_state_flex(tmp_path / "raw", st_tmpl, tr_ema)
    restored = tr_ema._ensure_ema(restored)
    assert restored.ema_params is not None
    np.testing.assert_allclose(_flat(restored.params), _flat(st_raw.params))

    st_ema, _ = tr_ema.train_epoch(restored, data, labels)
    orbax_io.save_state(tmp_path / "ema", st_ema, {})
    tr_raw2, st_tmpl2 = _trainer(synth)
    back, _ = _restore_state_flex(tmp_path / "ema", st_tmpl2, tr_raw2)
    assert back.ema_params is None
    np.testing.assert_allclose(_flat(back.params), _flat(st_ema.params))


def test_ema_composes_with_accum_and_clip(synth):
    """All three new training knobs together (ema + grad_accum + grad_clip):
    one config, finite decreasing loss, shadow differing from raw."""
    data, labels = synth
    raw = tiny_config(bs=N, ema=0.9, grad_accum=2)
    raw["optimisation"] = {"optimiser": "AdamW", "grad_clip": 1.0}
    exp = from_dict(raw)
    trainer = Trainer(exp, model=_model_override(exp))
    st = trainer.init_state(data[:1])
    losses = []
    for _ in range(3):
        st, m = trainer.train_epoch(st, data, labels)
        losses.append(m.loss)
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]
    m_ema, _ = trainer.evaluate(st, data, labels)
    m_raw, _ = trainer.evaluate(st.replace(ema_params=None), data, labels)
    assert m_ema.mae != m_raw.mae
