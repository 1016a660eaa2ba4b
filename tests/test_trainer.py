"""Integration tests: tiny end-to-end train / pretrain / test runs on
synthetic data (SURVEY §4 integration tier — the reference has no equivalent)."""

import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.data import make_regression_dataset
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.train import Trainer, runner
from surface_vision_transformers_tpu.utils.config import from_dict

L, V, C = 20, 9, 4


def tiny_config(**training_overrides):
    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},  # L=20 patches
        "transformer": {
            "dim": 16, "depth": 1, "heads": 2, "mlp_dim": 32,
            "num_channels": C, "dim_head": 8,
        },
        "training": {
            "LR": 1e-3, "bs": 16, "epochs": 12, "val_epoch": 4,
            "seed": 0, **training_overrides,
        },
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
        "logging": {"folder_to_save_model": "logs-test"},
    }
    return raw


@pytest.fixture(scope="module")
def synth():
    # centered labels keep the learnability check fast (no long bias warmup)
    data, labels = make_regression_dataset(
        96, num_channels=C, num_patches=L, num_vertices=V, seed=0,
        label_range=(-1.0, 1.0),
    )
    return data, labels


def _model_override(exp):
    # geometry says ico2/sub0 -> V=45; synthetic uses V=9, override the model
    return SiT.from_config(exp, num_patches=L, num_vertices=V)


def test_supervised_training_learns(synth, tmp_path):
    data, labels = synth
    exp = from_dict(tiny_config())
    trainer = Trainer(exp, model=_model_override(exp))
    state = trainer.init_state(data[:1])
    d, l = jnp.asarray(data), jnp.asarray(labels)

    m0, _ = trainer.evaluate(state, d, l)
    for _ in range(12):
        state, _ = trainer.train_epoch(state, d, l)
    m1, preds = trainer.evaluate(state, d, l)
    assert m1.mae < 0.5 * m0.mae, (m0.mae, m1.mae)
    assert preds.shape == (96,)


def test_partial_last_batch_included(synth):
    # 96 samples, bs 36 -> 3 batches with 24-sample padded remainder
    data, labels = synth
    exp = from_dict(tiny_config(bs=36))
    trainer = Trainer(exp, model=_model_override(exp))
    state = trainer.init_state(data[:1])
    state, m = trainer.train_epoch(state, jnp.asarray(data), jnp.asarray(labels))
    assert np.isfinite(m.loss) and np.isfinite(m.mae)


def test_mpp_training_learns(synth):
    data, _ = synth
    raw = tiny_config(epochs=6)
    raw["SSL"] = "mpp"
    raw["pretraining_mpp"] = {"mask_prob": 0.5, "replace_prob": 0.8,
                              "swap_prob": 0.02}
    exp = from_dict(raw)
    trainer = Trainer(exp, model=_model_override(exp))
    assert trainer.task == "mpp"
    d = jnp.asarray(data)
    state = trainer.init_state(data[:1])
    m0, _ = trainer.evaluate(state, d)
    for _ in range(8):
        state, _ = trainer.train_epoch(state, d)
    m1, _ = trainer.evaluate(state, d)
    assert m1.loss < m0.loss, (m0.loss, m1.loss)


def test_runner_end_to_end(tmp_path):
    # runner builds the model from config geometry (ico2/sub0 -> L=20, V=15),
    # so the dataset must match it
    raw = tiny_config(epochs=4, val_epoch=2)
    exp = from_dict(raw)
    data45, labels45 = make_regression_dataset(
        48, num_channels=C, num_patches=20, num_vertices=15, seed=1
    )
    datasets = {
        "train": (data45[:32], labels45[:32]),
        "validation": (data45[32:], labels45[32:]),
    }
    results = runner.run_training(
        exp, datasets=datasets, run_root=tmp_path, progress=False
    )
    assert results["training_finished"]
    assert np.isfinite(results["best_mae"])
    run_dir = results["run_dir"]
    import os
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "hparams_results.yml"))
    assert os.path.exists(os.path.join(run_dir, "preds.csv"))

    # resume restores exactly
    trainer, state, meta = runner.resume(exp, run_dir, datasets=datasets)
    assert meta["epoch"] == results["best_epoch"]
    m, _ = trainer.evaluate(
        state, jnp.asarray(datasets["validation"][0]),
        jnp.asarray(datasets["validation"][1]),
    )
    assert abs(m.mae - results["best_mae"]) < 1e-5

    # testing path over the saved checkpoint
    raw_t = dict(raw)
    raw_t["testing"] = {"path_to_ckpt": run_dir, "bs_test": 8}
    raw_t["data"] = {"split": "validation"}
    exp_t = from_dict(raw_t)
    res = runner.run_testing(exp_t, datasets={"validation": datasets["validation"]})
    assert abs(res["mae"] - results["best_mae"]) < 1e-4


def test_optimizers_and_schedules():
    from surface_vision_transformers_tpu.train import build_optimizer, build_schedule
    from surface_vision_transformers_tpu.utils.config import OptimConfig

    for name in ("SGD", "Adam", "AdamW"):
        opt = build_optimizer(OptimConfig(name=name, lr=1e-3, weight_decay=1e-4))
        params = {"w": jnp.ones((4, 4))}
        s = opt.init(params)
        up, s = opt.update({"w": jnp.ones((4, 4))}, s, params)
        assert jnp.all(jnp.isfinite(up["w"]))

    sch = build_schedule(OptimConfig(schedule="step", lr=1.0, step_size=10, step_decay=0.5))
    assert sch(0) == 1.0 and sch(10) == 0.5 and sch(25) == 0.25
    sch = build_schedule(OptimConfig(schedule="cosine", lr=1.0, cosine_t_max=100,
                                     cosine_eta_min=0.1))
    assert abs(float(sch(100)) - 0.1) < 1e-6


def test_streaming_epoch_matches_on_device(synth):
    """Streaming (host) epoch must produce the same kind of learning signal
    and identical metrics semantics as the on-device scan."""
    from surface_vision_transformers_tpu.data.pipeline import StreamingLoader

    data, labels = synth
    exp = from_dict(tiny_config(bs=36))  # exercises the padded last batch
    trainer = Trainer(exp, model=_model_override(exp))
    state = trainer.init_state(data[:1])

    loader = StreamingLoader(data, labels, batch_size=36, shuffle=True, seed=0)
    state, m = trainer.train_epoch_streaming(state, loader)
    assert np.isfinite(m.loss) and np.isfinite(m.mae)
    m_eval, _ = trainer.evaluate(state, jnp.asarray(data), jnp.asarray(labels))

    # same update count and metric scale as the on-device path
    trainer2 = Trainer(exp, model=_model_override(exp))
    state2 = trainer2.init_state(data[:1])
    state2, m2 = trainer2.train_epoch(state2, jnp.asarray(data), jnp.asarray(labels))
    assert int(state.step) == int(state2.step)
    assert abs(m.mae - m2.mae) < 0.25  # different shuffles, same scale


def test_streaming_loader_padding_and_memmap(tmp_path):
    from surface_vision_transformers_tpu.data.pipeline import StreamingLoader

    data = np.arange(10 * 2, dtype=np.float32).reshape(10, 2)
    path = tmp_path / "data.npy"
    np.save(path, data)
    mm = np.load(path, mmap_mode="r")
    loader = StreamingLoader(mm, np.arange(10.0, dtype=np.float32),
                             batch_size=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    b, t, w = batches[-1]
    assert b.shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(w), [1, 1, 0, 0])
    with pytest.raises(ValueError):
        StreamingLoader(data, np.arange(9.0), batch_size=4)


def test_mpp_optimize_decoder_false_freezes_decoder(synth):
    """The reference quirk (optimize_decoder: False -> encoder-only updates,
    reference tools/pretrain.py:269-280) must actually FREEZE to_original and
    mask_token. Regression: optax.masked alone passes the raw gradients of
    masked-out leaves through as updates (gradient ascent on the decoder) —
    caught by the full-recipe MPP trajectory test."""
    import jax

    data, labels = synth
    raw = tiny_config(epochs=2, val_epoch=1)
    raw["SSL"] = "mpp"
    raw["pretraining_mpp"] = {"mask_prob": 0.5, "replace_prob": 0.8,
                              "swap_prob": 0.02, "optimize_decoder": False}
    exp = from_dict(raw)
    t = Trainer(exp, model=_model_override(exp))
    state = t.init_state(data[:1])
    before = jax.tree.map(np.asarray, state.params)
    state, m = t.train_epoch(state, jnp.asarray(data), None)
    after = jax.tree.map(np.asarray, state.params)
    assert np.isfinite(m.loss)
    np.testing.assert_array_equal(after["to_original"]["kernel"],
                                  before["to_original"]["kernel"])
    np.testing.assert_array_equal(after["to_original"]["bias"],
                                  before["to_original"]["bias"])
    np.testing.assert_array_equal(after["mask_token"], before["mask_token"])
    # and the encoder DID train
    assert not np.allclose(
        after["encoder"]["patch_embedding_kernel"],
        before["encoder"]["patch_embedding_kernel"],
    )
