"""Sharding tests on a fake 8-device CPU mesh (SURVEY §4 multi-device tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from surface_vision_transformers_tpu.data import make_regression_dataset
from surface_vision_transformers_tpu.parallel import (
    batch_pspec,
    make_mesh,
    params_pspecs,
    shard_batch,
    shard_params,
)
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 fake devices"
)


def tiny_exp(**over):
    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 64, "depth": 2, "heads": 2, "mlp_dim": 128,
                        "dim_head": 32},
        "training": {"LR": 1e-3, "bs": 16, "epochs": 1, "seed": 0, **over},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
    }
    return from_dict(raw)


@pytest.fixture(scope="module")
def data():
    return make_regression_dataset(
        32, num_patches=20, num_vertices=15, seed=0, label_range=(-1, 1)
    )


def test_make_mesh_shapes():
    m = make_mesh(data=2, fsdp=2, model=2)
    assert dict(m.shape) == {"data": 2, "fsdp": 2, "model": 2}
    m = make_mesh()  # all devices on data
    assert m.shape["data"] == 8
    with pytest.raises(ValueError):
        make_mesh(data=3, fsdp=2, model=2)


def test_param_pspecs_tp_rules(data):
    exp = tiny_exp()
    mesh = make_mesh(data=2, fsdp=1, model=4)
    trainer = Trainer(exp, mesh=mesh)
    state = trainer.init_state(data[0][:1])
    specs = params_pspecs(state.params, mesh)
    attn = specs["encoder"]["layers_0_attn"]
    assert attn["to_qkv"]["kernel"] == P(None, "model")
    assert attn["to_out"]["kernel"] == P("model", None)
    mlp = specs["encoder"]["layers_0_mlp"]
    assert mlp["fc1"]["kernel"] == P(None, "model")
    assert mlp["fc1"]["bias"] == P("model")
    assert mlp["fc2"]["kernel"] == P("model", None)
    # norms replicated
    assert attn["norm"]["scale"] == P(None)


@pytest.mark.parametrize("shape", [(8, 1, 1), (2, 2, 2), (1, 2, 4)])
def test_sharded_training_matches_single_device(data, shape):
    d_np, l_np = data
    exp = tiny_exp()

    # single-device baseline
    t0 = Trainer(exp)
    s0 = t0.init_state(d_np[:1])
    s0, m0 = t0.train_epoch(s0, jnp.asarray(d_np), jnp.asarray(l_np))

    # sharded run
    mesh = make_mesh(*shape)
    t1 = Trainer(exp, mesh=mesh)
    s1 = t1.init_state(d_np[:1])
    with mesh:
        s1 = s1.replace(params=shard_params(s1.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        l = shard_batch(jnp.asarray(l_np), mesh)
        s1, m1 = t1.train_epoch(s1, d, l)

    assert abs(m0.loss - m1.loss) < 1e-4, (m0.loss, m1.loss)
    # parameters after one epoch agree across partitionings
    p0 = jax.tree.leaves(s0.params)
    p1 = jax.tree.leaves(jax.device_get(s1.params))
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_batch_pspec():
    assert batch_pspec(4) == P(("data", "fsdp"), None, None, None)


def test_graft_entry_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_mpp_sharded_training_matches_single_device(data):
    """MPP task under the mesh: loss parity with the unsharded run."""
    d_np, _ = data
    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 64, "depth": 2, "heads": 2, "mlp_dim": 128,
                        "dim_head": 32},
        "training": {"LR": 1e-3, "bs": 16, "epochs": 1, "seed": 0},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
        "SSL": "mpp",
        "pretraining_mpp": {"mask_prob": 0.5, "replace_prob": 0.8,
                            "swap_prob": 0.02},
    }
    from surface_vision_transformers_tpu.utils.config import from_dict

    exp = from_dict(raw)
    t0 = Trainer(exp)
    s0 = t0.init_state(d_np[:1])
    s0, m0 = t0.train_epoch(s0, jnp.asarray(d_np))

    mesh = make_mesh(2, 2, 2)
    t1 = Trainer(exp, mesh=mesh)
    s1 = t1.init_state(d_np[:1])
    with mesh:
        s1 = s1.replace(params=shard_params(s1.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        s1, m1 = t1.train_epoch(s1, d)
    assert abs(m0.loss - m1.loss) < 1e-4, (m0.loss, m1.loss)


def test_sequence_parallel_matches_replicated(data):
    """sp: sharding token activations over the model axis must not change
    results (GSPMD inserts the collectives)."""
    d_np, l_np = data
    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 64, "depth": 2, "heads": 2, "mlp_dim": 128,
                        "dim_head": 32},
        "training": {"LR": 1e-3, "bs": 16, "epochs": 1, "seed": 0},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
    }
    from surface_vision_transformers_tpu.utils.config import from_dict

    exp_plain = from_dict(raw)
    raw_sp = dict(raw); raw_sp["tpu"] = {"compute_dtype": "float32",
                                         "seq_sharding": True}
    exp_sp = from_dict(raw_sp)

    t0 = Trainer(exp_plain)
    s0 = t0.init_state(d_np[:1])
    s0, m0 = t0.train_epoch(s0, jnp.asarray(d_np), jnp.asarray(l_np))

    mesh = make_mesh(2, 1, 4)
    t1 = Trainer(exp_sp, mesh=mesh)
    s1 = t1.init_state(d_np[:1])
    # with_sharding_constraint(PartitionSpec) needs the jax.set_mesh context
    with jax.set_mesh(mesh):
        s1 = s1.replace(params=shard_params(s1.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        l = shard_batch(jnp.asarray(l_np), mesh)
        s1, m1 = t1.train_epoch(s1, d, l)
    assert abs(m0.loss - m1.loss) < 1e-4, (m0.loss, m1.loss)
