"""Product-path streaming: ``data.streaming`` routes run_training through the
host-resident StreamingLoader (per-step jit, memmap-friendly) instead of the
device-resident epoch scan — the TPU-native replacement for the reference's
only scaling mechanism, the torch DataLoader (reference tools/train.py:107-122),
at dataset sizes the device-resident path cannot hold."""

import numpy as np
import pytest
from pathlib import Path

from surface_vision_transformers_tpu.data import make_regression_dataset
from surface_vision_transformers_tpu.train import runner
from surface_vision_transformers_tpu.utils.config import from_dict

L, V = 20, 15  # ico2 / sub0 geometry


def base_raw(**training):
    return {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 16, "depth": 1, "heads": 2, "mlp_dim": 32,
                        "dim_head": 8},
        "training": {"LR": 1e-3, "bs": 16, "epochs": 2, "val_epoch": 1,
                     "seed": 0, **training},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
        "logging": {"folder_to_save_model": "logs-test"},
    }


def _write_split_files(tmp_path, data, labels):
    ddir = tmp_path / "data"
    ddir.mkdir()
    n = data.shape[0]
    cut = int(n * 0.75)
    np.save(ddir / "train_data.npy", data[:cut])
    np.save(ddir / "train_labels.npy", labels[:cut])
    np.save(ddir / "validation_data.npy", data[cut:])
    np.save(ddir / "validation_labels.npy", labels[cut:])
    return ddir


def test_streaming_on_trains_from_files(tmp_path):
    """data.streaming: on -> memmap-loaded splits, StreamingLoader epochs,
    streamed validation with preds CSV; loss decreases on learnable data."""
    data, labels = make_regression_dataset(
        48, num_patches=L, num_vertices=V, label_range=(-1, 1), seed=0
    )
    ddir = _write_split_files(tmp_path, data.astype(np.float64), labels)

    raw = base_raw(epochs=3)
    raw["data"] = {"data_path": str(ddir), "streaming": True}
    raw["logging"] = {"folder_to_save_model": str(tmp_path / "logs")}

    # the loader must see a memmap (not a RAM copy): check the loader level
    ds = runner.load_datasets(from_dict(raw))
    assert isinstance(ds["train"][0], np.memmap)
    assert ds["train"][0].dtype == np.float64  # cast happens per batch

    res = runner.run_training(from_dict(raw), run_root=tmp_path / "run",
                              progress=False)
    assert res["streaming"] is True
    assert np.isfinite(res["best_mae"])
    assert (Path(res["run_dir"]) / "preds.csv").exists()

    # learnable relationship: training must actually make progress
    import json

    metrics = [
        json.loads(l)
        for l in (Path(res["run_dir"]) / "metrics.jsonl").read_text().splitlines()
    ]
    tr = [m for m in metrics if "train/loss" in m]
    assert tr[-1]["train/loss"] < tr[0]["train/loss"]


def test_streaming_auto_thresholds():
    """'auto' compares 2x the float32 dataset bytes against the budget."""
    data = np.zeros((4, 4, L, V), np.float32)
    exp_small = from_dict({**base_raw(),
                           "data": {"streaming_budget_gb": 1.0}})
    assert runner._use_streaming(exp_small, data) is False
    tiny_budget = {**base_raw(),
                   "data": {"streaming_budget_gb": data.nbytes / 2**30}}
    assert runner._use_streaming(from_dict(tiny_budget), data) is True
    forced_off = {**base_raw(), "data": {"streaming": False,
                                         "streaming_budget_gb": 1e-9}}
    assert runner._use_streaming(from_dict(forced_off), data) is False


def test_streaming_matches_deviceresident_eval(tmp_path):
    """Same params, same split: streamed evaluation must equal the on-device
    eval scan (identical metrics and predictions, batch padding included)."""
    from surface_vision_transformers_tpu.data.pipeline import StreamingLoader
    from surface_vision_transformers_tpu.train import Trainer
    import jax.numpy as jnp

    data, labels = make_regression_dataset(
        23, num_patches=L, num_vertices=V, label_range=(-1, 1), seed=1
    )  # 23 % 16 != 0 -> exercises last-batch padding
    exp = from_dict(base_raw())
    t = Trainer(exp)
    state = t.init_state(data[:1])

    m_dev, p_dev = t.evaluate(state, jnp.asarray(data), jnp.asarray(labels))
    loader = StreamingLoader(data, labels, batch_size=16, shuffle=False)
    m_st, p_st = t.evaluate_streaming(state, loader)

    assert abs(m_dev.mae - m_st.mae) < 1e-6
    assert abs(m_dev.loss - m_st.loss) < 1e-6
    np.testing.assert_allclose(p_dev, p_st, atol=1e-6)


def test_streaming_mpp_pretrain(tmp_path):
    """MPP pretraining streams too (encoder best exports intact)."""
    data, labels = make_regression_dataset(
        32, num_patches=L, num_vertices=V, label_range=(-1, 1), seed=0
    )
    raw = base_raw()
    raw["SSL"] = "mpp"
    raw["pretraining_mpp"] = {"mask_prob": 0.5, "replace_prob": 0.8,
                              "swap_prob": 0.02}
    raw["data"] = {"streaming": True}
    res = runner.run_training(
        from_dict(raw),
        datasets={"train": (data[:24], labels[:24]),
                  "validation": (data[24:], labels[24:])},
        run_root=tmp_path / "ssl", progress=False,
    )
    assert res["streaming"] is True
    assert np.isfinite(res["best_loss"])
    assert (Path(res["run_dir"]) / "encoder_best_params.npz").exists()


@pytest.mark.slow
def test_streaming_ico7_raw_input(tmp_path):
    """ico-7 raw vertex input (163,842 vertices — the scale claim) through
    the streaming product path with a generated patch table."""
    from surface_vision_transformers_tpu.geometry import load_patch_table

    table = load_patch_table(7, 1)  # 80 patches x 2145 vertices, generated
    G = 10 * 4**7 + 2
    rng = np.random.default_rng(0)
    data = rng.standard_normal((12, 4, G)).astype(np.float32)
    labels = data[:, 0, :64].mean(axis=1).astype(np.float32)

    raw = {
        "resolution": {"ico": 7, "sub_ico": 1},
        "transformer": {"dim": 16, "depth": 1, "heads": 2, "mlp_dim": 32,
                        "dim_head": 8},
        "training": {"LR": 1e-3, "bs": 4, "epochs": 1, "val_epoch": 1,
                     "seed": 0, "save_ckpt": False},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
        "data": {"streaming": True},
        "logging": {"folder_to_save_model": str(tmp_path / "logs")},
    }
    res = runner.run_training(
        from_dict(raw),
        datasets={"train": (data[:8], labels[:8]),
                  "validation": (data[8:], labels[8:])},
        run_root=tmp_path / "run", progress=False,
    )
    assert res["streaming"] is True
    assert np.isfinite(res["best_mae"])


def test_streaming_loader_sharded_placement():
    """Under a mesh with a divisible batch the loader places batches
    batch-sharded (local_batch_to_global); indivisible batches fall back to
    replicated placement, and a full sharded-mesh training run through the
    runner matches expectations."""
    import jax
    from jax.sharding import PartitionSpec as P

    from surface_vision_transformers_tpu.data.pipeline import StreamingLoader
    from surface_vision_transformers_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    data, labels = make_regression_dataset(
        32, num_patches=L, num_vertices=V, label_range=(-1, 1), seed=2
    )
    mesh = make_mesh(8, 1, 1)
    loader = StreamingLoader(data, labels, batch_size=16, shuffle=False,
                             mesh=mesh)
    batch, tgt, w = next(iter(loader))
    spec = batch.sharding.spec
    assert spec == P(("data", "fsdp"), None, None, None), spec
    assert tgt.sharding.spec == P(("data", "fsdp")), tgt.sharding.spec

    # indivisible batch -> replicated fallback (no error)
    loader7 = StreamingLoader(data[:21], labels[:21], batch_size=7,
                              shuffle=False, mesh=mesh)
    batch7, _, _ = next(iter(loader7))
    assert batch7.shape[0] == 7


def test_streaming_under_mesh_through_runner(tmp_path):
    """data.streaming: on + tpu.mesh_data: -1 — streamed sharded training
    through the public entry point."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    data, labels = make_regression_dataset(
        48, num_patches=L, num_vertices=V, label_range=(-1, 1), seed=0
    )
    raw = base_raw(epochs=2)
    raw["data"] = {"streaming": True}
    raw["tpu"] = {"compute_dtype": "float32", "mesh_data": -1}
    res = runner.run_training(
        from_dict(raw),
        datasets={"train": (data[:32], labels[:32]),
                  "validation": (data[32:], labels[32:])},
        run_root=tmp_path / "run", progress=False,
    )
    assert res["streaming"] is True
    assert res["mesh"] == {"data": 8, "fsdp": 1, "model": 1}
    assert np.isfinite(res["best_mae"])


def test_streaming_composes_with_mssit(tmp_path):
    """data.streaming: on + the MS-SiT family: the loader is model-agnostic
    (per-step jit over raw (n, C, V) vertex batches), so the multiscale
    family streams from memmap files through the same product path."""
    from surface_vision_transformers_tpu import geometry as G

    rng = np.random.default_rng(0)
    ico, level = 3, 1
    data = rng.standard_normal((24, 4, G.num_vertices(ico))).astype(np.float64)
    labels = data[:, 0].mean(axis=1).astype(np.float32)
    ddir = _write_split_files(tmp_path, data, labels)

    raw = {
        "resolution": {"ico": ico, "sub_ico": level},
        "transformer": {"model": "MS-SiT", "num_channels": 4},
        "mssit": {"embed_dim": 16, "depths": [2, 2], "heads": [2, 4],
                  "window": 16, "global_max": 8},
        "training": {"LR": 1e-3, "bs": 8, "epochs": 2, "seed": 0,
                     "val_epoch": 1, "save_ckpt": False},
        "optimisation": {"optimiser": "AdamW"},
        "AdamW": {"weight_decay": 0.01},
        "tpu": {"compute_dtype": "float32"},
        "data": {"data_path": str(ddir), "streaming": True},
        "logging": {"folder_to_save_model": str(tmp_path / "logs")},
    }
    ds = runner.load_datasets(from_dict(raw))
    assert isinstance(ds["train"][0], np.memmap)
    res = runner.run_training(from_dict(raw), run_root=tmp_path / "run",
                              progress=False)
    assert res["streaming"] is True
    assert np.isfinite(res["best_mae"])
