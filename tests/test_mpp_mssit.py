"""MS-SiT masked-window pretraining (models/mpp_mssit.py).

The reference makes MPP first-class for its single-scale SiT
(tools/pretrain.py:303-323); MS-SiT is beyond its scope, so these tests pin
the framework's own SSL design for the family: window-granular corruption
law, modular/fused parity (both decoder branches), the Trainer product path
learning, and the SSL -> finetune handoff."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surface_vision_transformers_tpu import geometry as G
from surface_vision_transformers_tpu.models import MPPMSSiT, MSSiT
from surface_vision_transformers_tpu.models.fused_mssit import (
    fused_mssit_mpp_loss,
)
from surface_vision_transformers_tpu.models.mpp_mssit import (
    corrupt_window_sequence,
    corruption_window,
)
from surface_vision_transformers_tpu.train import Trainer
from surface_vision_transformers_tpu.utils.config import from_dict

ICO, LEVEL = 2, 1  # 162 vertices, 80 patches x 6


@pytest.fixture(scope="module")
def setup():
    table = G.load_patch_table(ICO, LEVEL)
    model = MSSiT(
        ico=ICO, patch_level=LEVEL, num_vertices=6, embed_dim=16,
        depths=(2, 2), heads=(2, 4), window=4, global_max=2,
        dtype=jnp.float32, patch_table=table.indices,
    )
    mpp = MPPMSSiT(encoder=model, mask_prob=0.5)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 4, 162)), jnp.float32
    )
    params = mpp.init({"params": jax.random.PRNGKey(0)}, x,
                      jax.random.PRNGKey(1))
    return model, mpp, params, x


def test_corruption_window_law():
    key = jax.random.PRNGKey(7)
    B, T, P, W = 16, 80, 24, 4
    nW = T // W
    target = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T, P)), jnp.float32
    )
    mask_token = jnp.full((1, 1, P), 9.0, jnp.float32)
    corrupted, mask, n_masked = corrupt_window_sequence(
        key, target, mask_token, window=W, mask_prob=0.75,
        replace_prob=0.8, swap_prob=0.02,
    )
    assert n_masked == math.ceil(0.75 * nW)
    wmask = np.asarray(mask).reshape(B, nW, W)
    # token mask is window-constant with the exact count per sample
    assert (wmask == wmask[:, :, :1]).all()
    assert (wmask[:, :, 0].sum(1) == n_masked).all()
    # unmasked windows pass through bitwise
    c = np.asarray(corrupted)
    t = np.asarray(target)
    keep = ~wmask[:, :, 0]
    np.testing.assert_array_equal(
        c.reshape(B, nW, W, P)[keep], t.reshape(B, nW, W, P)[keep]
    )
    # replaced windows are the mask token on EVERY row; at these rates some
    # masked window must be replaced
    repl = np.isclose(c.reshape(B, nW, W, P), 9.0).all((2, 3))
    assert repl.any()
    assert not repl[keep].any()


def test_loss_backprops_everywhere(setup):
    model, mpp, params, x = setup

    def loss(p):
        l, _ = mpp.apply({"params": p}, x, jax.random.PRNGKey(3))
        return l

    val, grads = jax.value_and_grad(loss)(params["params"])
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for kp, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), kp
    # encoder, mask token, and decoder all receive gradient
    assert np.abs(np.asarray(grads["mask_token"])).sum() > 0
    assert np.abs(np.asarray(grads["to_original"]["kernel"])).sum() > 0
    enc_g = grads["encoder"]["stage_0_block_0_attn"]["to_qkv"]["kernel"]
    assert np.abs(np.asarray(enc_g)).sum() > 0


def test_fused_matches_modular(setup):
    """W = 4 == up = 4^(2-1): the memory-lean recon-VJP branch."""
    model, mpp, params, x = setup
    assert corruption_window(model) % (4 ** (model.num_stages - 1)) == 0
    rng = jax.random.PRNGKey(11)
    ref, ref_recon = mpp.apply({"params": params["params"]}, x, rng)
    out, recon = jax.jit(
        lambda p, xx: fused_mssit_mpp_loss(mpp, p, xx, rng)
    )(params, x)
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(ref_recon), atol=5e-3
    )

    g1 = jax.grad(lambda p: mpp.apply({"params": p}, x, rng)[0])(
        params["params"]
    )
    g2 = jax.grad(lambda p: fused_mssit_mpp_loss(mpp, {"params": p}, x, rng)[0])(
        params["params"]
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g2)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0],
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(
            a, b, atol=5e-3 * scale, rtol=5e-3, err_msg=str(kp)
        )


def test_fused_fallback_branch_matches_modular():
    """W=4 < up=16 (3 stages): mask varies INSIDE a final token's group, so
    the fused path takes the plain-XLA elementwise branch."""
    table = G.load_patch_table(3, 2)  # 320 patches
    model = MSSiT(
        ico=3, patch_level=2, num_vertices=6, embed_dim=16,
        depths=(2, 2, 2), heads=(2, 4, 4), window=4, global_max=2,
        dtype=jnp.float32, patch_table=table.indices,
    )
    assert corruption_window(model) % (4 ** (model.num_stages - 1)) != 0
    mpp = MPPMSSiT(encoder=model, mask_prob=0.5)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 4, 642)), jnp.float32
    )
    params = mpp.init({"params": jax.random.PRNGKey(0)}, x,
                      jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(5)
    ref, _ = mpp.apply({"params": params["params"]}, x, rng)
    out, _ = jax.jit(lambda p, xx: fused_mssit_mpp_loss(mpp, p, xx, rng))(
        params, x
    )
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-3)


def _mssit_pretrain_config(**training_overrides):
    return {
        "SSL": "mpp",
        "resolution": {"ico": ICO, "sub_ico": LEVEL},
        "transformer": {"model": "MS-SiT", "num_channels": 4},
        "mssit": {"embed_dim": 16, "depths": [2, 2], "heads": [2, 4],
                  "window": 4, "global_max": 2},
        "pretraining_mpp": {"mask_prob": 0.5, "replace_prob": 0.8,
                            "swap_prob": 0.02},
        "training": {"LR": 1e-3, "bs": 8, "epochs": 4, "seed": 0,
                     "save_ckpt": False, **training_overrides},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
        "logging": {"folder_to_save_model": "logs-test"},
    }


def test_trainer_product_path_learns():
    exp = from_dict(_mssit_pretrain_config())
    trainer = Trainer(exp, patch_table=G.load_patch_table(ICO, LEVEL).indices)
    assert trainer.task == "mpp"
    assert type(trainer.mpp).__name__ == "MPPMSSiT"
    data = jnp.asarray(
        np.random.default_rng(3).standard_normal((32, 4, 162)), jnp.float32
    )
    state = trainer.init_state(data[:1])
    m0, _ = trainer.evaluate(state, data)
    for _ in range(6):
        state, _ = trainer.train_epoch(state, data)
    m1, _ = trainer.evaluate(state, data)
    assert m1.loss < m0.loss, (m0.loss, m1.loss)


def test_ssl_to_finetune_handoff(setup, tmp_path):
    """Pretrained MS-SiT encoder params merge into the supervised model
    (the runner's encoder_best_params.npz handoff) — every encoder leaf is
    shared, and the finetune forward runs on them."""
    model, mpp, params, x = setup
    from surface_vision_transformers_tpu.checkpoints import orbax_io
    from surface_vision_transformers_tpu.train.runner import (
        _count_shared_leaves, merge_params,
    )

    enc_params = params["params"]["encoder"]
    p = tmp_path / "encoder_best_params.npz"
    orbax_io.save_params_npz(p, {"params": enc_params})
    loaded = orbax_io.load_params_npz(p)["params"]

    sup_params = model.init(jax.random.PRNGKey(9), x)["params"]
    n_shared = _count_shared_leaves(sup_params, loaded)
    n_enc = len(jax.tree_util.tree_leaves(enc_params))
    assert n_shared == n_enc, (n_shared, n_enc)
    merged = merge_params(sup_params, loaded)
    out = model.apply({"params": merged}, x)
    assert np.all(np.isfinite(np.asarray(out)))
    # head params (absent from the SSL tree) kept their fresh init
    np.testing.assert_array_equal(
        np.asarray(merged["head"]["kernel"]),
        np.asarray(sup_params["head"]["kernel"]),
    )
