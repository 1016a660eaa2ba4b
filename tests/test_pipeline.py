"""Pipeline parallelism (GPipe stage sharding over the 'pipe' mesh axis).

The reference has no distributed code (SURVEY §2); parallel/pipeline.py adds
stage-sharded training. These tests pin exact loss parity with the unstaged
modular path — pipelining changes the schedule, not the math — plus the
config/product-path wiring and the guard rails.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.parallel import make_mesh
from surface_vision_transformers_tpu.parallel.pipeline import (
    pipe_size,
    pipeline_loss,
)
from surface_vision_transformers_tpu.train.trainer import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict


def _raw(**tpu_over):
    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 64, "depth": 4, "heads": 2, "mlp_dim": 128,
                        "dim_head": 32},
        "training": {"LR": 1e-3, "bs": 16, "epochs": 2, "seed": 0,
                     "val_epoch": 1, "save_ckpt": False},
        "optimisation": {"optimiser": "AdamW"},
        "AdamW": {"weight_decay": 0.01},
        "tpu": {"compute_dtype": "float32", **tpu_over},
    }
    return raw


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((32, 4, 20, 15)).astype(np.float32)
    lab = d[:, 0].mean(axis=(1, 2)).astype(np.float32)
    return d, lab


def test_pipeline_loss_matches_modular(data):
    """loss AND all parameter grads from the staged schedule == the plain
    modular forward's (fp32, rtol ~1e-5)."""
    d, lab = data
    mesh = make_mesh(data=1, pipe=4)
    assert pipe_size(mesh) == 4
    model = SiT(
        dim=64, depth=4, heads=2, mlp_dim=128, dim_head=32,
        num_patches=20, num_vertices=15, dtype=jnp.float32,
    )
    x = jnp.asarray(d[:8])
    y = jnp.asarray(lab[:8])
    w = jnp.ones((8,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def pipe_fn(p):
        loss, _ = pipeline_loss(model, mesh, p, x, y, w, n_microbatches=2)
        return loss

    def plain_fn(p):
        preds = model.apply({"params": p}, x).reshape(-1)
        return jnp.mean(jnp.square(preds - y))

    l1, g1 = jax.value_and_grad(pipe_fn)(params)
    l2, g2 = jax.value_and_grad(plain_fn)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0],
        jax.tree_util.tree_flatten_with_path(g2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=str(kp),
        )


def test_runner_pp_times_dp_parity(tmp_path, data):
    """2-data x 4-pipe mesh from the config alone (the cli.train contract)
    matches the single-device trajectory."""
    from surface_vision_transformers_tpu.train import runner

    d, lab = data
    datasets = {"train": (d, lab), "validation": (d[:16], lab[:16])}

    def run(tpu_over):
        return runner.run_training(
            from_dict(_raw(**tpu_over)), datasets=datasets,
            run_root=str(tmp_path), progress=False,
        )

    base = run({"mesh_data": 1, "mesh_fsdp": 1, "mesh_model": 1})
    pp = run({"mesh_data": 2, "mesh_pipe": 4})
    assert pp["mesh"] == {"data": 2, "fsdp": 1, "model": 1, "pipe": 4}
    assert abs(base["best_mae"] - pp["best_mae"]) < 1e-4, (base, pp)


def test_pipeline_guards():
    from surface_vision_transformers_tpu.parallel import mesh_from_config

    def trainer_for(raw):
        exp = from_dict(raw)
        return Trainer(exp, mesh=mesh_from_config(exp.tpu))

    with pytest.raises(ValueError, match="depth 4 not divisible"):
        trainer_for(_raw(mesh_data=1, mesh_pipe=8))
    raw = _raw(mesh_data=1, mesh_pipe=4)
    raw["SSL"] = "mpp"
    with pytest.raises(ValueError, match="supervised training only"):
        trainer_for(raw)
    raw = _raw(mesh_data=1, mesh_pipe=4)
    raw["transformer"]["dropout"] = 0.1
    with pytest.raises(ValueError, match="dropout 0"):
        trainer_for(raw)


def test_microbatch_divisibility_error(data):
    d, lab = data
    mesh = make_mesh(data=1, pipe=4)
    model = SiT(dim=64, depth=4, heads=2, mlp_dim=128, dim_head=32,
                num_patches=20, num_vertices=15, dtype=jnp.float32)
    x = jnp.asarray(d[:6])
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_loss(
            model, mesh, params, x, jnp.zeros((6,)), jnp.ones((6,)),
            n_microbatches=4,
        )
