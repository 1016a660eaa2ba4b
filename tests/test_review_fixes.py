"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.data import make_regression_dataset
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.train import Trainer, runner
from surface_vision_transformers_tpu.utils.config import from_dict


def tiny_raw(**training):
    return {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 16, "depth": 1, "heads": 2, "mlp_dim": 32,
                        "dim_head": 8},
        "training": {"LR": 1e-3, "bs": 8, "epochs": 2, "val_epoch": 1,
                     **training},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
    }


def test_pallas_patch_backend_exists(table_sub2):
    """Finding 1: backend='pallas' used to ImportError."""
    from surface_vision_transformers_tpu.ops import fused_patch_embed

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 40962))
    k = jax.random.normal(jax.random.PRNGKey(1), (612, 16)) * 0.05
    b = jnp.zeros((16,))
    out_p = fused_patch_embed(x, table_sub2.indices, k, b, backend="pallas",
                              compute_dtype=jnp.float32)
    out_x = fused_patch_embed(x, table_sub2.indices, k, b, backend="xla",
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)


def test_augment_atlas_table_guard(tmp_path):
    """Finding 2: canonical rotation tables must not silently apply to
    atlas-ordered (dHCP) data."""
    raw = {
        "resolution": {"ico": 6, "sub_ico": 2},  # shipped table = atlas order
        "transformer": {"dim": 16, "depth": 1, "heads": 2, "mlp_dim": 32,
                        "dim_head": 8},
        "training": {"LR": 1e-3, "bs": 4, "epochs": 1},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
        "augmentation": {"enabled": True, "num_warps": 0},
    }
    data, labels = make_regression_dataset(8, num_patches=320, num_vertices=153)
    with pytest.raises(ValueError, match="sphere"):
        runner.run_training(from_dict(raw),
                            datasets={"train": (data, labels)},
                            run_root=tmp_path, progress=False)


def test_run_testing_with_file_checkpoint(tmp_path):
    """Finding 3: path_to_ckpt pointing at an npz FILE used to crash."""
    from surface_vision_transformers_tpu.checkpoints import orbax_io

    raw = tiny_raw()
    exp = from_dict(raw)
    data, labels = make_regression_dataset(16, num_patches=20, num_vertices=15,
                                           label_range=(-1, 1))
    trainer = Trainer(exp)
    state = trainer.init_state(data[:1])
    npz = tmp_path / "best_params.npz"
    orbax_io.save_params_npz(npz, {"params": state.params})

    raw_t = tiny_raw()
    raw_t["testing"] = {"path_to_ckpt": str(npz)}
    raw_t["data"] = {"split": "validation"}
    res = runner.run_testing(from_dict(raw_t),
                             datasets={"validation": (data, labels)})
    assert np.isfinite(res["mae"])
    assert (tmp_path / "results.csv").exists()


def test_ssl_load_into_mpp_actually_loads(tmp_path):
    """Finding 4: loading an encoder-only SSL npz into an MPP run used to
    silently no-op."""
    from surface_vision_transformers_tpu.checkpoints import orbax_io
    from surface_vision_transformers_tpu.models import SiT

    model = SiT(dim=16, depth=1, heads=2, mlp_dim=32, dim_head=8,
                num_patches=20, num_vertices=15, dtype=jnp.float32)
    sit_params = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 4, 20, 15)))
    npz = tmp_path / "enc.npz"
    orbax_io.save_params_npz(npz, {"params": sit_params["params"]})

    raw = tiny_raw(load_weights_ssl=True, epochs=1)
    raw["SSL"] = "mpp"
    raw["pretraining_mpp"] = {"mask_prob": 0.5, "replace_prob": 0.8,
                              "swap_prob": 0.0}
    raw["weights"] = {"ssl_mpp": str(npz)}
    exp = from_dict(raw)
    data, _ = make_regression_dataset(8, num_patches=20, num_vertices=15)

    trainer = Trainer(exp)
    state = trainer.init_state(data[:1])
    from surface_vision_transformers_tpu.train.runner import _load_initial_weights

    state2 = _load_initial_weights(exp, trainer, state)
    np.testing.assert_array_equal(
        np.asarray(state2.params["encoder"]["pos_embedding"]),
        np.asarray(sit_params["params"]["pos_embedding"]),
    )
    # and a bogus checkpoint (wrong structure) raises instead of no-opping
    bad = tmp_path / "bad.npz"
    np.savez(bad, **{"params/nonsense": np.zeros(3)})
    raw["weights"] = {"ssl_mpp": str(bad)}
    with pytest.raises(ValueError, match="shares no parameter"):
        _load_initial_weights(from_dict(raw), trainer, state)


def test_metric_logger_val_columns(tmp_path):
    """Finding 5: val/ metrics used to vanish from the CSV."""
    from surface_vision_transformers_tpu.obs import MetricLogger

    log = MetricLogger(tmp_path, use_tensorboard=False)
    log.log(0, {"loss": 1.0, "mae": 2.0}, prefix="train/")
    log.log(0, {"loss": 0.5, "mae": 1.5}, prefix="val/")
    log.close()
    train_csv = (tmp_path / "metrics_train.csv").read_text()
    val_csv = (tmp_path / "metrics_val.csv").read_text()
    assert "train/mae" in train_csv and "2.0" in train_csv
    assert "val/mae" in val_csv and "1.5" in val_csv


def test_mpp_raw_path_normalizes(table_sub2):
    """Finding 6: raw-input MPP must see the same normalization as the
    supervised folded path."""
    from surface_vision_transformers_tpu.models import MPP, SiT

    means = np.array([1.0, 2.0, 3.0, 4.0], np.float32).reshape(1, 4, 1)
    stds = np.array([0.5, 0.5, 2.0, 1.0], np.float32).reshape(1, 4, 1)
    model = SiT(dim=16, depth=1, heads=2, mlp_dim=32, dim_head=8,
                num_patches=320, num_vertices=153, dtype=jnp.float32,
                patch_table=table_sub2.indices,
                norm_means=means, norm_stds=stds)
    mpp = MPP(encoder=model, mask_prob=0.5, replace_prob=1.0, swap_prob=0.0)
    x = means.reshape(1, 4, 1) * jnp.ones((2, 4, 40962))  # == per-channel mean
    params = mpp.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    _, recon = mpp.apply(params, x, jax.random.PRNGKey(2))
    # normalized target of the all-mean input is exactly zero; a zero-init
    # head reconstructs near zero -> tiny loss only if targets were normalized
    loss, _ = mpp.apply(params, x, jax.random.PRNGKey(2))
    # target is exactly 0 after normalization; loss = mean(recon^2) at masked,
    # which is small (head init), whereas unnormalized targets (~means) give
    # loss >> 1
    assert float(loss) < 1.0


def test_bs_val_used_in_eval():
    """Finding 9: bs_val used to be dead."""
    exp = from_dict(tiny_raw(bs_val=4))
    trainer = Trainer(exp)
    data, labels = make_regression_dataset(12, num_patches=20, num_vertices=15)
    state = trainer.init_state(data[:1])
    trainer.evaluate(state, jnp.asarray(data), jnp.asarray(labels))
    # eval fn was compiled at bs_val=4 -> 3 steps
    assert any(k[1] == 4 for k in trainer._eval_fns)


def test_final_checkpoint_without_validation(tmp_path):
    """Finding 10: runs without a validation split must still save weights."""
    raw = tiny_raw(epochs=1)
    data, labels = make_regression_dataset(8, num_patches=20, num_vertices=15,
                                           label_range=(-1, 1))
    res = runner.run_training(from_dict(raw),
                              datasets={"train": (data, labels)},
                              run_root=tmp_path, progress=False)
    run_dir = res["run_dir"]
    import os
    assert os.path.exists(os.path.join(run_dir, "final_params.npz"))
    assert os.path.exists(os.path.join(run_dir, "best"))


def test_run_testing_with_reference_pth(tmp_path):
    """C6 interop: a reference-layout torch checkpoint feeds run_testing."""
    torch = pytest.importorskip("torch")
    sys_path_mod = __import__("sys")
    from tests.torch_ref import TorchSiT

    torch.manual_seed(0)
    tm = TorchSiT(dim=16, depth=1, heads=2, mlp_dim=32, dim_head=8,
                  num_patches=20, num_vertices=15)
    pth = tmp_path / "checkpoint.pth"
    torch.save(tm.state_dict(), pth)

    raw = tiny_raw()
    raw["testing"] = {"path_to_ckpt": str(pth)}
    raw["data"] = {"split": "validation"}
    data, labels = make_regression_dataset(12, num_patches=20, num_vertices=15)
    res = runner.run_testing(from_dict(raw),
                             datasets={"validation": (data, labels)})
    assert np.isfinite(res["mae"])

    # the loaded params must reproduce the torch model's outputs (fp32)
    from surface_vision_transformers_tpu.checkpoints.torch_import import (
        merge_params, sit_params_from_torch,
    )
    from surface_vision_transformers_tpu.models import SiT

    model = SiT(dim=16, depth=1, heads=2, mlp_dim=32, dim_head=8,
                num_patches=20, num_vertices=15, dtype=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    base = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 20, 15)))
    params = {"params": merge_params(base["params"],
                                     sit_params_from_torch(tm.state_dict(), 1))}
    x = data[:4]
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=5e-5)
