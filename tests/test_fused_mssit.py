"""Fused MS-SiT runner (models/fused_mssit.py): megakernel blocks on folded
windows vs the modular module, forward and gradients, plus the Trainer
dispatch and pure-DP shard_map parity. Interpret mode on CPU (the compiled
check lives in tests_tpu)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surface_vision_transformers_tpu import geometry as G
from surface_vision_transformers_tpu.models import MSSiT
from surface_vision_transformers_tpu.models.fused_mssit import (
    fused_mssit_forward,
    fused_mssit_train_forward,
)

ICO, LEVEL = 2, 1  # 162 vertices, 80 patches x 6


@pytest.fixture(scope="module")
def setup():
    table = G.load_patch_table(ICO, LEVEL)
    # window 4 folds to N=4 (pads to 8); the axial odd block folds to
    # nW=20 groups (pads to 24) — both padding paths exercised
    model = MSSiT(
        ico=ICO, patch_level=LEVEL, num_vertices=6, embed_dim=16,
        depths=(2, 2), heads=(2, 4), window=4, global_max=2,
        dtype=jnp.float32, patch_table=table.indices,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 4, 162)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_fused_forward_matches_modular(setup):
    model, params, x = setup
    ref = model.apply(params, x)
    out = jax.jit(lambda p, xx: fused_mssit_forward(model, p, xx))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_fused_train_forward_grads_match_modular(setup):
    model, params, x = setup

    def loss_fused(p):
        return jnp.sum(fused_mssit_train_forward(model, p, x) ** 2)

    def loss_mod(p):
        return jnp.sum(model.apply(p, x) ** 2)

    (l1, g1) = jax.value_and_grad(loss_fused)(params)
    (l2, g2) = jax.value_and_grad(loss_mod)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-3)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0],
        jax.tree_util.tree_flatten_with_path(g2)[0],
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(
            a, b, atol=5e-3 * scale, rtol=5e-3, err_msg=str(kp)
        )


def test_trainer_dispatches_fused_mssit(setup):
    from surface_vision_transformers_tpu.train import trainer as trainer_mod
    from surface_vision_transformers_tpu.train.trainer import Trainer
    from surface_vision_transformers_tpu.utils.config import from_dict

    raw = {
        "resolution": {"ico": ICO, "sub_ico": LEVEL},
        "transformer": {"model": "MS-SiT", "num_channels": 4},
        "mssit": {"embed_dim": 16, "depths": [2, 2], "heads": [2, 4],
                  "window": 4, "global_max": 2},
        "training": {"LR": 1e-3, "bs": 4, "epochs": 1, "seed": 0,
                     "save_ckpt": False},
        "optimisation": {"optimiser": "AdamW"},
        "AdamW": {"weight_decay": 0.01},
        "tpu": {"compute_dtype": "float32"},
    }
    table = G.load_patch_table(ICO, LEVEL)
    tr = Trainer(from_dict(raw), patch_table=table.indices)
    trainer_mod.FORCE_FUSED = True
    try:
        assert tr._use_fused_train()
        assert tr._use_fused_inference()
        rng = np.random.default_rng(1)
        d = jnp.asarray(rng.standard_normal((8, 4, 162)), jnp.float32)
        lab = jnp.asarray(d[:, 0].mean(axis=1), jnp.float32)
        state = tr.init_state(np.asarray(d[:1], np.float32))
        losses = []
        for _ in range(3):
            state, m = tr.train_epoch(state, d, lab)
            losses.append(m.loss)
        assert losses[-1] < losses[0], losses
    finally:
        trainer_mod.FORCE_FUSED = False


def test_mssit_int8_serving_close_to_bf16(setup):
    """quant="int8" routes stages at dim >= INT8_MIN_DIM through the W8A8
    megakernel; narrower stages stay bf16. With the threshold forced to 0
    every block runs int8 — outputs stay within quantization error of the
    modular path, and exact-bf16 when the threshold excludes all stages."""
    from surface_vision_transformers_tpu.models import fused_mssit as fm

    model, params, x = setup
    ref = np.asarray(model.apply(params, x), np.float32)
    scale = np.abs(ref).max() + 1e-6
    old = fm.INT8_MIN_DIM
    try:
        fm.INT8_MIN_DIM = 0  # all stages int8
        out = jax.jit(
            lambda p, xx: fused_mssit_forward(model, p, xx, quant="int8")
        )(params, x)
        d = np.abs(np.asarray(out, np.float32) - ref).max()
        assert d < 0.08 * scale, (d, scale)
        fm.INT8_MIN_DIM = 10**9  # no stage qualifies -> pure bf16 path
        out_bf = jax.jit(
            lambda p, xx: fused_mssit_forward(model, p, xx, quant="int8")
        )(params, x)
        base = jax.jit(lambda p, xx: fused_mssit_forward(model, p, xx))(
            params, x
        )
        np.testing.assert_array_equal(np.asarray(out_bf), np.asarray(base))
    finally:
        fm.INT8_MIN_DIM = old
    with pytest.raises(ValueError, match="quant"):
        fused_mssit_forward(model, params, x, quant="int4")


def test_mssit_trainer_int8_dispatch(setup):
    from surface_vision_transformers_tpu.train import trainer as trainer_mod
    from surface_vision_transformers_tpu.train.trainer import Trainer
    from surface_vision_transformers_tpu.utils.config import from_dict

    raw = {
        "resolution": {"ico": ICO, "sub_ico": LEVEL},
        "transformer": {"model": "MS-SiT", "num_channels": 4},
        "mssit": {"embed_dim": 16, "depths": [1], "heads": [2],
                  "window": 4, "global_max": 2},
        "training": {"LR": 1e-3, "bs": 4, "epochs": 1, "save_ckpt": False},
        "optimisation": {"optimiser": "AdamW"},
        "tpu": {"compute_dtype": "float32", "quant": "int8"},
    }
    table = G.load_patch_table(ICO, LEVEL)
    tr = Trainer(from_dict(raw), patch_table=table.indices)
    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.standard_normal((4, 4, 162)), jnp.float32)
    trainer_mod.FORCE_FUSED = True
    try:
        preds = tr._infer(
            tr.init_state(np.asarray(d[:1], np.float32)).params, d
        )
        assert preds.shape == (4, 1) and bool(jnp.isfinite(preds).all())
    finally:
        trainer_mod.FORCE_FUSED = False


def test_fused_mssit_pure_dp_shard_map(setup):
    from surface_vision_transformers_tpu.parallel import make_mesh

    model, params, x = setup
    mesh = make_mesh(data=4)
    base = fused_mssit_forward(model, params, x)
    out = fused_mssit_forward(model, params, x, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base), atol=1e-5, rtol=1e-5
    )
    with pytest.raises(ValueError, match="pure DP"):
        fused_mssit_forward(
            model, params, x, mesh=make_mesh(data=2, model=2)
        )


def test_scan_blocks_parity_mssit():
    """tpu.scan_blocks for MS-SiT: per-stage lax.scan over the mix cycle
    must match the unrolled stage loop (same kernels, same order). depths
    (4, 2): stage 0 scans a window+axial cycle twice, stage 1 (global,
    all-'window') scans two single-mix iterations. CPU-interpret parity is
    ulp-level (XLA fuses glue differently across program shapes)."""
    table = G.load_patch_table(ICO, LEVEL)
    model = MSSiT(
        ico=ICO, patch_level=LEVEL, num_vertices=6, embed_dim=16,
        depths=(4, 2), heads=(2, 4), window=4, global_max=2,
        dtype=jnp.float32, patch_table=table.indices,
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 4, 162)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p, sb):
        out = fused_mssit_train_forward(model, p, x, scan_blocks=sb)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l_u, g_u = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    l_s, g_s = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    np.testing.assert_allclose(float(l_u), float(l_s), rtol=1e-6)
    for a, e in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-7)


def test_scan_blocks_odd_depth_prefix():
    """Odd-depth alternating stages scan the largest full-cycle PREFIX and
    unroll the remainder (depth 5 = 2 scanned window/axial cycles + 1
    unrolled tail block) — previously they silently fell back to fully
    unrolled. Parity vs the unrolled loop pins both the scan slicing and
    the tail block's index offset."""
    table = G.load_patch_table(ICO, LEVEL)
    model = MSSiT(
        ico=ICO, patch_level=LEVEL, num_vertices=6, embed_dim=16,
        depths=(5, 2), heads=(2, 4), window=4, global_max=2,
        dtype=jnp.float32, patch_table=table.indices,
    )
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, 4, 162)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p, sb):
        out = fused_mssit_train_forward(model, p, x, scan_blocks=sb)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l_u, g_u = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    l_s, g_s = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    np.testing.assert_allclose(float(l_u), float(l_s), rtol=1e-6)
    for a, e in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-7)
    o_u = jax.jit(lambda p: fused_mssit_forward(
        model, p, x, scan_blocks=False))(params)
    o_s = jax.jit(lambda p: fused_mssit_forward(
        model, p, x, scan_blocks=True))(params)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_u),
                               rtol=1e-4, atol=1e-6)


def test_scan_blocks_inference_and_int8_parity():
    """scan_blocks through fused_mssit_forward: bf16-contract parity for the
    plain path and the int8 path (which quantizes per scan step from the
    same uncast weights — must match the unrolled quantize-per-block)."""
    table = G.load_patch_table(ICO, LEVEL)
    model = MSSiT(
        ico=ICO, patch_level=LEVEL, num_vertices=6, embed_dim=16,
        depths=(4, 2), heads=(2, 4), window=4, global_max=2,
        dtype=jnp.float32, patch_table=table.indices,
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((4, 4, 162)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)

    for quant in (None, "int8"):
        o_u = jax.jit(lambda p, xx: fused_mssit_forward(
            model, p, xx, quant=quant, scan_blocks=False))(params, x)
        o_s = jax.jit(lambda p, xx: fused_mssit_forward(
            model, p, xx, quant=quant, scan_blocks=True))(params, x)
        np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_u),
                                   rtol=1e-4, atol=1e-6)
