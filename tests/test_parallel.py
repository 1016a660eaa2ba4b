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


def test_runner_builds_mesh_from_config(data, tmp_path):
    """The cli.train contract (VERDICT r1 #1): a config with tpu.mesh_* keys
    trains DP x FSDP x TP through runner.run_training alone, matching the
    single-device loss."""
    from surface_vision_transformers_tpu.train import runner

    d_np, l_np = data
    datasets = {"train": (d_np, l_np), "validation": (d_np[:16], l_np[:16])}

    def run(mesh_over, sub):
        raw = {
            "resolution": {"ico": 2, "sub_ico": 0},
            "transformer": {"dim": 64, "depth": 2, "heads": 2, "mlp_dim": 128,
                            "dim_head": 32},
            "training": {"LR": 1e-3, "bs": 16, "epochs": 2, "seed": 0,
                         "val_epoch": 1, "save_ckpt": False},
            "optimisation": {"optimiser": "Adam"},
            "tpu": {"compute_dtype": "float32", **mesh_over},
        }
        return runner.run_training(
            from_dict(raw), datasets=datasets, run_root=str(tmp_path / sub),
            progress=False,
        )

    base = run({"mesh_data": 1}, "single")
    assert "mesh" not in base or base["mesh"] == {"data": 1, "fsdp": 1, "model": 1}
    res = run({"mesh_data": 2, "mesh_fsdp": 2, "mesh_model": 2}, "sharded")
    assert res["mesh"] == {"data": 2, "fsdp": 2, "model": 2}
    assert abs(res["best_mae"] - base["best_mae"]) < 1e-3, (res, base)


def test_shard_state_places_optimizer_moments(data):
    """state_shardings: adam mu/nu leaves follow the param TP/FSDP specs,
    scalars and PRNG stay replicated."""
    from surface_vision_transformers_tpu.parallel import (
        shard_state,
        state_shardings,
    )

    d_np, _ = data
    exp = tiny_exp()
    mesh = make_mesh(data=2, fsdp=2, model=2)
    trainer = Trainer(exp, mesh=mesh)
    state = trainer.init_state(d_np[:1])
    sh = state_shardings(state, state.params, mesh)
    qkv_spec = sh.params["encoder"]["layers_0_attn"]["to_qkv"]["kernel"].spec
    assert "model" in str(qkv_spec)
    # adam mu/nu moments mirror the param spec
    flat = jax.tree_util.tree_flatten_with_path(
        sh.opt_state, is_leaf=lambda x: hasattr(x, "spec")
    )[0]
    moment_specs = [
        leaf.spec
        for kp, leaf in flat
        if "to_qkv" in str(kp) and "kernel" in str(kp)
    ]
    assert moment_specs and all(s == qkv_spec for s in moment_specs)
    assert sh.step.spec == P()
    assert sh.rng.spec == P()
    sharded = shard_state(state, mesh)
    assert sharded.params["encoder"]["layers_0_attn"]["to_qkv"][
        "kernel"
    ].sharding.spec == qkv_spec


def test_resume_sharded_state(data, tmp_path):
    """Mesh-aware resume (VERDICT r1 weak #4): a run trained under a mesh
    restores exactly, with leaves back on their shardings."""
    import jax.numpy as jnp
    from surface_vision_transformers_tpu.train import runner

    d_np, l_np = data
    datasets = {"train": (d_np, l_np), "validation": (d_np[:16], l_np[:16])}
    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 64, "depth": 2, "heads": 2, "mlp_dim": 128,
                        "dim_head": 32},
        "training": {"LR": 1e-3, "bs": 16, "epochs": 1, "seed": 0,
                     "val_epoch": 1},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32", "mesh_data": 2, "mesh_fsdp": 2,
                "mesh_model": 2},
    }
    exp = from_dict(raw)
    res = runner.run_training(
        exp, datasets=datasets, run_root=str(tmp_path), progress=False
    )
    trainer, state, meta = runner.resume(exp, res["run_dir"], datasets=datasets)
    assert meta["epoch"] == 0
    assert dict(trainer.mesh.shape) == {"data": 2, "fsdp": 2, "model": 2}
    qkv = state.params["encoder"]["layers_0_attn"]["to_qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    # restored state continues training under the mesh
    with jax.set_mesh(trainer.mesh):
        d = shard_batch(jnp.asarray(d_np), trainer.mesh)
        l = shard_batch(jnp.asarray(l_np), trainer.mesh)
        state, m = trainer.train_epoch(state, d, l)
    assert np.isfinite(m.loss)


def test_multihost_helpers_single_process():
    from surface_vision_transformers_tpu.parallel import (
        initialize_multihost,
        local_batch_to_global,
    )
    from surface_vision_transformers_tpu.parallel.multihost import (
        process_local_slice,
    )

    assert initialize_multihost() == 0  # no-op single process
    # slice arithmetic is exhaustive over processes
    for pc in (1, 2, 3, 8):
        spans = [process_local_slice(13, process_index=i, process_count=pc)
                 for i in range(pc)]
        assert spans[0][0] == 0 and spans[-1][1] == 13
        for (_, e0), (s1, _) in zip(spans, spans[1:]):
            assert e0 == s1
    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = local_batch_to_global(x, mesh, 16)
    assert g.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(g), x)


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


@pytest.mark.parametrize("backend", ["auto", "pallas"])
def test_sequence_parallel_matches_replicated(data, backend):
    """sp: sharding token activations over the model axis must not change
    results. backend='auto' exercises the GSPMD einsum path; 'pallas' the
    shard_map'd flash kernel on local Q + all-gathered K/V (VERDICT r1 #7;
    interpret mode on CPU)."""
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
                                         "seq_sharding": True,
                                         "kernel_backend": backend}
    exp_sp = from_dict(raw_sp)

    t0 = Trainer(exp_plain)
    s0 = t0.init_state(d_np[:1])
    s0, m0 = t0.train_epoch(s0, jnp.asarray(d_np), jnp.asarray(l_np))

    mesh = make_mesh(2, 1, 4)
    t1 = Trainer(exp_sp, mesh=mesh)
    if backend == "pallas":
        # the sp flash-kernel branch must actually engage (N=128 padded, 4-way
        # shard over 'model')
        attn = t1.model.encoder if hasattr(t1.model, "encoder") else None
        assert t1.model.seq_shard_axis == "model"
    s1 = t1.init_state(d_np[:1])
    # with_sharding_constraint(PartitionSpec) needs the jax.set_mesh context
    with jax.set_mesh(mesh):
        s1 = s1.replace(params=shard_params(s1.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        l = shard_batch(jnp.asarray(l_np), mesh)
        s1, m1 = t1.train_epoch(s1, d, l)
    assert abs(m0.loss - m1.loss) < 1e-4, (m0.loss, m1.loss)


@pytest.mark.parametrize("shape", [(8, 1, 1), (2, 2, 1), (1, 2, 4)])
def test_batch_sharded_kernel_matches_single_device(data, shape):
    """With kernel_backend='pallas' under a DP/FSDP mesh, attention runs the
    packed kernel PER SHARD via shard_map (models.sit.Attention.batch_mesh);
    under TP (model>1) it must fall back to the GSPMD-partitionable einsum.
    Either way the training trajectory matches single-device."""
    d_np, l_np = data
    exp = tiny_exp()
    exp = from_dict({**exp.raw, "tpu": {"compute_dtype": "float32",
                                        "kernel_backend": "pallas"}})

    t0 = Trainer(exp)
    assert t0.model.attn_backend == "pallas"
    s0 = t0.init_state(d_np[:1])
    s0, m0 = t0.train_epoch(s0, jnp.asarray(d_np), jnp.asarray(l_np))

    mesh = make_mesh(*shape)
    t1 = Trainer(exp, mesh=mesh)
    assert t1.model.batch_mesh is mesh
    s1 = t1.init_state(d_np[:1])
    with mesh:
        s1 = s1.replace(params=shard_params(s1.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        l = shard_batch(jnp.asarray(l_np), mesh)
        s1, m1 = t1.train_epoch(s1, d, l)

    assert abs(m0.loss - m1.loss) < 1e-4, (m0.loss, m1.loss)
    p0 = jax.tree.leaves(s0.params)
    p1 = jax.tree.leaves(jax.device_get(s1.params))
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dropout_kernel_under_mesh_runs(data):
    """Training with dropout>0 + pallas backend under a DP mesh takes the
    shard_map'd dropout kernel; losses stay finite and params update."""
    d_np, l_np = data
    exp = tiny_exp()
    raw = dict(exp.raw)
    raw["tpu"] = {"compute_dtype": "float32", "kernel_backend": "pallas"}
    raw["transformer"] = {**raw["transformer"], "dropout": 0.1}
    exp = from_dict(raw)

    mesh = make_mesh(8, 1, 1)
    t = Trainer(exp, mesh=mesh)
    s = t.init_state(d_np[:1])
    import numpy as _np

    p_before = jax.tree.leaves(jax.device_get(s.params))
    with mesh:
        s = s.replace(params=shard_params(s.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        l = shard_batch(jnp.asarray(l_np), mesh)
        s, m = t.train_epoch(s, d, l)
    assert _np.isfinite(m.loss)
    p_after = jax.tree.leaves(jax.device_get(s.params))
    assert any(
        not _np.allclose(_np.asarray(a), _np.asarray(b))
        for a, b in zip(p_before, p_after)
    )


def test_fused_megakernel_pure_dp_matches_single_device(data, monkeypatch):
    """Under a PURE-DP mesh the fused megakernel train path runs per shard
    via shard_map in models.fused (params replicated; weight grads psummed
    by the shard_map transpose). Forced on for CPU interpret mode via the
    trainer module flag; trajectory must match the single-device fused run."""
    from surface_vision_transformers_tpu.train import trainer as trainer_mod

    monkeypatch.setattr(trainer_mod, "FORCE_FUSED", True)
    d_np, l_np = data
    exp = tiny_exp()

    t0 = Trainer(exp)
    assert t0._use_fused_train()
    s0 = t0.init_state(d_np[:1])
    s0, m0 = t0.train_epoch(s0, jnp.asarray(d_np), jnp.asarray(l_np))
    ev0, _ = t0.evaluate(s0, jnp.asarray(d_np), jnp.asarray(l_np))

    mesh = make_mesh(8, 1, 1)
    t1 = Trainer(exp, mesh=mesh)
    assert t1._use_fused_train()
    s1 = t1.init_state(d_np[:1])
    with mesh:
        s1 = s1.replace(params=shard_params(s1.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        l = shard_batch(jnp.asarray(l_np), mesh)
        s1, m1 = t1.train_epoch(s1, d, l)
        ev1, _ = t1.evaluate(s1, d, l)

    assert abs(m0.loss - m1.loss) < 1e-4, (m0.loss, m1.loss)
    assert abs(ev0.mae - ev1.mae) < 1e-4, (ev0.mae, ev1.mae)
    p0 = jax.tree.leaves(s0.params)
    p1 = jax.tree.leaves(jax.device_get(s1.params))
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_split_backward_composes_with_pure_dp_shard_map(data, monkeypatch):
    """The SPLIT two-kernel backward (forced via the feasibility gate, as
    at dim > 256 on chip) composes with the pure-DP shard_map wrapper:
    trajectory matches the single-device split run AND the monolithic
    single-device run."""
    import surface_vision_transformers_tpu.ops.pallas.fused_block as fb
    from surface_vision_transformers_tpu.train import trainer as trainer_mod

    monkeypatch.setattr(trainer_mod, "FORCE_FUSED", True)
    d_np, l_np = data
    exp = tiny_exp()

    t_mono = Trainer(exp)
    s = t_mono.init_state(d_np[:1])
    s, m_mono = t_mono.train_epoch(s, jnp.asarray(d_np), jnp.asarray(l_np))

    monkeypatch.setattr(fb, "_bwd_kernel_feasible", lambda *a, **k: False)
    t0 = Trainer(exp)
    s0 = t0.init_state(d_np[:1])
    s0, m0 = t0.train_epoch(s0, jnp.asarray(d_np), jnp.asarray(l_np))
    assert abs(m_mono.loss - m0.loss) < 1e-4, (m_mono.loss, m0.loss)

    mesh = make_mesh(8, 1, 1)
    t1 = Trainer(exp, mesh=mesh)
    s1 = t1.init_state(d_np[:1])
    with mesh:
        s1 = s1.replace(params=shard_params(s1.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        l = shard_batch(jnp.asarray(l_np), mesh)
        s1, m1 = t1.train_epoch(s1, d, l)
    assert abs(m0.loss - m1.loss) < 1e-4, (m0.loss, m1.loss)
    for a, b in zip(jax.tree.leaves(s0.params),
                    jax.tree.leaves(jax.device_get(s1.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_under_fsdp_mesh_falls_back(data, monkeypatch):
    """FSDP/TP meshes shard params, so the fused shard_map (P() replicated
    param specs) does not apply — the trainer must take the modular path and
    still match single-device."""
    from surface_vision_transformers_tpu.train import trainer as trainer_mod

    monkeypatch.setattr(trainer_mod, "FORCE_FUSED", True)
    d_np, l_np = data
    exp = tiny_exp()
    mesh = make_mesh(2, 2, 2)
    t1 = Trainer(exp, mesh=mesh)
    assert not t1._use_fused_train()  # not pure DP

    monkeypatch.setattr(trainer_mod, "FORCE_FUSED", False)
    t0 = Trainer(exp)  # single-device MODULAR baseline
    s0 = t0.init_state(d_np[:1])
    s0, m0 = t0.train_epoch(s0, jnp.asarray(d_np), jnp.asarray(l_np))

    s1 = t1.init_state(d_np[:1])
    with mesh:
        s1 = s1.replace(params=shard_params(s1.params, mesh))
        d = shard_batch(jnp.asarray(d_np), mesh)
        l = shard_batch(jnp.asarray(l_np), mesh)
        s1, m1 = t1.train_epoch(s1, d, l)
    assert abs(m0.loss - m1.loss) < 1e-4, (m0.loss, m1.loss)


def test_tp_mesh_keeps_flash_kernel(data, monkeypatch):
    """Under TP (model > 1) attention must take the heads-sharded flash
    kernel (Attention._tp_heads_attention), not the HBM-materialized einsum
    fallback — and match the single-device modular result, grads included."""
    import surface_vision_transformers_tpu.ops.pallas.flash_attention as fa
    from surface_vision_transformers_tpu.models import SiT

    d_np, l_np = data
    calls = {"n": 0}
    orig = fa.flash_attention_qkv

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(fa, "flash_attention_qkv", counting)

    kw = dict(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
              num_patches=20, num_vertices=15, dtype=jnp.float32,
              attn_backend="pallas")
    mesh = make_mesh(2, 1, 2)  # DP x TP; model=2 divides heads=2
    model_tp = SiT(**kw, batch_mesh=mesh)
    model_ref = SiT(**kw)

    x = jnp.asarray(d_np[:16])
    y = jnp.asarray(l_np[:16])
    params = model_ref.init(jax.random.PRNGKey(0), x[:1])

    def loss(m, p, xx):
        preds = m.apply(p, xx)
        return jnp.mean(jnp.square(preds.reshape(-1) - y))

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(model_ref, p, x))(params)
    calls["n"] = 0
    with mesh:
        xs = shard_batch(x, mesh)
        ps = shard_params(params, mesh)
        l_tp, g_tp = jax.jit(
            jax.value_and_grad(lambda p: loss(model_tp, p, xs))
        )(ps)
    assert calls["n"] > 0, "TP path fell back to einsum"
    assert abs(float(l_tp) - float(l_ref)) < 1e-5, (l_tp, l_ref)
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(b), atol=2e-5
        )


def test_user_supplied_model_gets_mesh_plumbing():
    """A user-supplied model (e.g. bench.py's) under a mesh must be cloned
    with batch_mesh (or seq_mesh AND seq_shard_axis — the mesh alone is
    inert) so its attention never dispatches a raw pallas kernel on sharded
    activations."""
    from surface_vision_transformers_tpu.models import SiT

    exp = tiny_exp()
    mesh = make_mesh(8, 1, 1)
    user_model = SiT(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
                     num_patches=20, num_vertices=15, dtype=jnp.float32)
    t = Trainer(exp, model=user_model, mesh=mesh)
    assert t.model.batch_mesh is mesh

    raw = {**exp.raw, "tpu": {"compute_dtype": "float32",
                              "seq_sharding": True}}
    t2 = Trainer(from_dict(raw), model=user_model, mesh=make_mesh(2, 1, 4))
    assert t2.model.seq_mesh is not None
    assert t2.model.seq_shard_axis == "model"


def test_run_testing_pure_dp_fused(data, tmp_path, monkeypatch):
    """The product eval entry point under a pure-DP mesh takes the
    shard_mapped fused megakernel path (forced for CPU interpret) and
    matches the meshless result."""
    from surface_vision_transformers_tpu.train import trainer as trainer_mod

    monkeypatch.setattr(trainer_mod, "FORCE_FUSED", True)
    from surface_vision_transformers_tpu.train import runner

    d_np, l_np = data
    datasets = {"validation": (d_np, l_np)}
    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 64, "depth": 2, "heads": 2, "mlp_dim": 128,
                        "dim_head": 32},
        "training": {"LR": 1e-3, "bs": 16, "seed": 0},
        "optimisation": {"optimiser": "Adam"},
        "data": {"split": "validation"},
        "logging": {"folder_to_save_model": str(tmp_path)},
    }
    # run_testing hard-requires weights (reference tools/testing.py:68);
    # build one deterministic param set and score it under both meshes.
    exp_base = from_dict({**raw, "tpu": {"compute_dtype": "float32",
                                         "mesh_data": 1}})
    t0 = trainer_mod.Trainer(exp_base)
    params = jax.tree.map(np.asarray, t0.init_state(d_np[:1]).params)
    base = runner.run_testing(exp_base, datasets=datasets, params=params)
    res = runner.run_testing(
        from_dict({**raw, "tpu": {"compute_dtype": "float32",
                                  "mesh_data": -1}}),
        datasets=datasets,
        params=params,
    )
    assert abs(res["mae"] - base["mae"]) < 1e-4, (res, base)
