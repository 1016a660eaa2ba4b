"""MS-SiT (multiscale, windowed) model family tests.

The family is beyond the reference's scope (the reference ships only the
single-scale SiT); these tests pin the properties the TPU-first design relies
on — above all that windows and merges really are pure reshapes over the
canonical face hierarchy — plus end-to-end training through the product path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surface_vision_transformers_tpu import geometry as G
from surface_vision_transformers_tpu.models import MSSiT
from surface_vision_transformers_tpu.models.mssit import (
    WindowAttention,
    window_size_for_stage,
)
from surface_vision_transformers_tpu.utils.config import from_dict

ICO, LEVEL = 3, 2  # 642-vertex sphere, 320 patches x 6 vertices


@pytest.fixture(scope="module")
def table():
    return G.load_patch_table(ICO, LEVEL)


@pytest.fixture(scope="module")
def model(table):
    return MSSiT(
        ico=ICO, patch_level=LEVEL, num_vertices=6, embed_dim=16,
        depths=(2, 2), heads=(2, 4), window=16, global_max=8,
        dtype=jnp.float32, patch_table=table.indices,
    )


@pytest.fixture(scope="module")
def params(model):
    x = np.zeros((1, 4, G.num_vertices(ICO)), np.float32)
    return model.init(jax.random.PRNGKey(0), x)


# -- geometry: the reshape-window invariant ----------------------------------


def test_face_hierarchy_children_contiguous():
    """Patches [f*4^d, (f+1)*4^d) of the fine table cover EXACTLY the vertex
    set of patch f of the coarse table — the invariant that makes window
    partition and 4->1 merging pure reshapes (models/mssit.py)."""
    fine_t, fine_v = G.generate_patch_table(3, 2)
    fine = G.remap_table_to_icosphere(fine_t, fine_v, 3)
    coarse_t, coarse_v = G.generate_patch_table(3, 1)
    coarse = G.remap_table_to_icosphere(coarse_t, coarse_v, 3)
    for f in range(coarse.shape[0]):
        children = fine[4 * f : 4 * (f + 1)]
        assert set(children.ravel()) == set(coarse[f]), f"face {f}"


def test_window_size_for_stage():
    assert window_size_for_stage(64, 20480, 5, 512) == 64
    assert window_size_for_stage(64, 320, 2, 512) == 320  # global (small)
    assert window_size_for_stage(64, 1280, 3, 512) == 64
    assert window_size_for_stage(64, 320, 2, 16) == 16  # clamp to 4^level
    assert window_size_for_stage(64, 20, 0, 4) == 20  # level 0 -> global


# -- window attention semantics ----------------------------------------------


def test_window_attention_matches_per_window_full_attention(rng):
    """mix='window' on (B, T) == full attention run separately per window."""
    B, T, W, dim, heads = 2, 32, 8, 16, 2
    attn = WindowAttention(
        dim=dim, heads=heads, dim_head=dim // heads, window=W,
        dtype=jnp.float32,
    )
    x = jnp.asarray(rng.standard_normal((B, T, dim)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(1), x)
    y = attn.apply(params, x)

    glob = WindowAttention(
        dim=dim, heads=heads, dim_head=dim // heads, window=W,
        dtype=jnp.float32,
    )
    per_win = jnp.concatenate(
        [
            glob.apply(params, x[:, i * W : (i + 1) * W])
            for i in range(T // W)
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(per_win), atol=1e-5)


def test_axial_mix_is_transpose_of_window_groups(rng):
    """mix='axial' equals mix='window' applied to the (nW, W)-transposed
    sequence — the grouping is exactly the other axis of the window grid."""
    B, T, W, dim, heads = 2, 32, 8, 16, 2
    nW = T // W
    x = jnp.asarray(rng.standard_normal((B, T, dim)), jnp.float32)
    ax = WindowAttention(
        dim=dim, heads=heads, dim_head=dim // heads, window=W, mix="axial",
        dtype=jnp.float32,
    )
    params = ax.init(jax.random.PRNGKey(1), x)
    y_ax = ax.apply(params, x)

    # transpose the (nW, W) grid, run plain window attention at window nW
    xt = x.reshape(B, nW, W, dim).transpose(0, 2, 1, 3).reshape(B, T, dim)
    win = WindowAttention(
        dim=dim, heads=heads, dim_head=dim // heads, window=nW, mix="window",
        dtype=jnp.float32,
    )
    y_t = win.apply(params, xt)
    y_back = (
        y_t.reshape(B, W, nW, dim).transpose(0, 2, 1, 3).reshape(B, T, dim)
    )
    np.testing.assert_allclose(np.asarray(y_ax), np.asarray(y_back), atol=1e-5)


def test_cross_mix_extends_receptive_field():
    """An 'axial' block spreads a perturbation from one window into OTHER
    windows (the cross-window mixing Swin gets from shifts); a 'window' block
    must keep it strictly inside its window."""
    for mix, expect_spread in (("window", False), ("axial", True)):
        wa = WindowAttention(
            dim=16, heads=2, dim_head=8, window=16, mix=mix,
            dtype=jnp.float32,
        )
        base = np.random.default_rng(3).standard_normal((1, 320, 16))
        t = jnp.asarray(base, jnp.float32)
        # non-constant perturbation of the first window (a constant one would
        # be invisible through the pre-norm LayerNorm)
        t2 = t.at[0, :16, :].add(
            jnp.asarray(
                np.random.default_rng(4).standard_normal((16, 16)), jnp.float32
            )
        )
        wp = wa.init(jax.random.PRNGKey(1), t)
        d = np.asarray(wa.apply(wp, t2) - wa.apply(wp, t))
        outside = np.abs(d[0, 16:]).max()
        if expect_spread:
            assert outside > 1e-8, f"{mix}: no cross-window flow"
        else:
            assert outside < 1e-8, f"{mix}: leaked across windows"


# -- model forward/backward ----------------------------------------------------


def test_forward_shapes_and_input_paths(model, params, table, rng):
    x = rng.standard_normal((3, 4, G.num_vertices(ICO))).astype(np.float32)
    y = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert y.shape == (3, 1)
    assert np.all(np.isfinite(np.asarray(y)))
    xp = x[:, :, table.indices].transpose(0, 1, 2, 3)  # (B, C, L, V)
    y2 = model.apply(params, jnp.asarray(xp))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_grads_finite(model, params, rng):
    x = jnp.asarray(
        rng.standard_normal((2, 4, G.num_vertices(ICO))), jnp.float32
    )

    def loss(p):
        return jnp.sum(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # every parameter receives gradient (no dead branches)
    dead = [
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for kp, l in jax.tree_util.tree_flatten_with_path(g)[0]
        if not bool(jnp.any(l != 0))
    ]
    assert not dead, dead


# -- config + product path ------------------------------------------------------


def _mssit_raw(**over):
    raw = {
        "resolution": {"ico": ICO, "sub_ico": LEVEL},
        "transformer": {"model": "MS-SiT", "num_channels": 4},
        "mssit": {"embed_dim": 16, "depths": [2, 2], "heads": [2, 4],
                  "window": 16, "global_max": 8},
        "training": {"LR": 1e-3, "bs": 8, "epochs": 3, "seed": 0,
                     "val_epoch": 1, "save_ckpt": False},
        "optimisation": {"optimiser": "AdamW"},
        "AdamW": {"weight_decay": 0.01},
        "tpu": {"compute_dtype": "float32"},
    }
    raw.update(over)
    return raw


def test_config_parses_mssit_block():
    exp = from_dict(_mssit_raw())
    assert exp.model.model == "MS-SiT"
    assert exp.mssit.depths == (2, 2)
    assert exp.mssit.heads == (2, 4)
    assert exp.mssit.window == 16
    m = MSSiT.from_config(exp)
    assert m.num_patches == 320
    assert m.stage_dims() == [16, 32]


def test_runner_trains_mssit_from_config(tmp_path, rng):
    from surface_vision_transformers_tpu.train import runner

    n = 24
    data = rng.standard_normal((n, 4, G.num_vertices(ICO))).astype(np.float32)
    # learnable signal: label = mean of channel 0
    labels = data[:, 0].mean(axis=1).astype(np.float32)
    datasets = {"train": (data, labels), "validation": (data[:8], labels[:8])}
    res = runner.run_training(
        from_dict(_mssit_raw()), datasets=datasets, run_root=str(tmp_path),
        progress=False,
    )
    assert res["training_finished"]
    assert np.isfinite(res["best_mae"])


def test_runner_trains_mssit_sharded_parity(tmp_path, rng):
    """DP x TP mesh run through the product path matches single-device."""
    from surface_vision_transformers_tpu.train import runner

    n = 16
    data = rng.standard_normal((n, 4, G.num_vertices(ICO))).astype(np.float32)
    labels = data[:, 0].mean(axis=1).astype(np.float32)
    datasets = {"train": (data, labels), "validation": (data, labels)}

    def run(mesh_over):
        raw = _mssit_raw()
        raw["training"]["epochs"] = 2
        raw["tpu"].update(mesh_over)
        return runner.run_training(
            from_dict(raw), datasets=datasets, run_root=str(tmp_path),
            progress=False,
        )

    base = run({"mesh_data": 1, "mesh_fsdp": 1, "mesh_model": 1})
    shard = run({"mesh_data": -1, "mesh_fsdp": 2, "mesh_model": 2})
    assert shard["mesh"] == {"data": 2, "fsdp": 2, "model": 2}
    assert abs(base["best_mae"] - shard["best_mae"]) < 1e-3, (base, shard)


def test_mpp_with_mssit_builds_window_ssl(table):
    """MS-SiT pretraining routes to the masked-window SSL module (r3 gap:
    the family used to hard-error on the MPP workflow; full coverage in
    tests/test_mpp_mssit.py)."""
    from surface_vision_transformers_tpu.models import MPPMSSiT
    from surface_vision_transformers_tpu.train.trainer import Trainer

    raw = _mssit_raw(SSL="mpp")
    t = Trainer(from_dict(raw), patch_table=table.indices)
    assert t.task == "mpp"
    assert isinstance(t.mpp, MPPMSSiT)


def test_checkpoint_roundtrip(model, params, tmp_path, rng):
    from surface_vision_transformers_tpu.checkpoints import orbax_io

    orbax_io.save_params_npz(tmp_path / "p.npz", {"params": params["params"]})
    loaded = orbax_io.load_params_npz(tmp_path / "p.npz")["params"]
    x = jnp.asarray(
        rng.standard_normal((2, 4, G.num_vertices(ICO))), jnp.float32
    )
    y1 = model.apply(params, x)
    y2 = model.apply({"params": loaded}, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
