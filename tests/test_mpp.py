"""MPP tests: exact mask counts, corruption-rate distributions, masked-loss
semantics, and golden parity vs the torch reference under a fixed corruption
(SURVEY §4: 'MPP loss parity under a fixed mask')."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.models import MPP, SiT, corrupt_sequence, exact_count_mask

CFG = dict(dim=64, depth=2, heads=2, mlp_dim=128,
           num_patches=320, num_vertices=153)


def small_sit():
    return SiT(dtype=jnp.float32, **CFG)


def test_exact_mask_count():
    # exactly ceil(0.75 * L) per sample (reference models/mpp.py:31-39)
    for prob, L in [(0.75, 320), (0.15, 80), (0.5, 20)]:
        mask, n = exact_count_mask(jax.random.PRNGKey(0), 8, L, prob)
        assert n == math.ceil(prob * L)
        np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), n)


def test_corruption_rates():
    B, L, D = 64, 320, 12
    tokens = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
    mask_token = jnp.full((1, 1, D), 1e9)
    corrupted, mask, n = corrupt_sequence(
        jax.random.PRNGKey(1), tokens, mask_token,
        mask_prob=0.75, replace_prob=0.8, swap_prob=0.02,
    )
    mask = np.asarray(mask)
    corrupted = np.asarray(corrupted)
    assert n == 240
    replaced = (corrupted[:, :, 0] > 1e8)
    # replaced fraction of masked positions ~ replace_prob
    frac_replaced = replaced[mask].mean()
    assert abs(frac_replaced - 0.8) < 0.02
    # unmasked positions never corrupted
    np.testing.assert_array_equal(corrupted[~mask], np.asarray(tokens)[~mask])
    # changed-but-not-replaced (swapped) fraction of masked ~ swap_prob/(1-replace)
    changed = np.abs(corrupted - np.asarray(tokens)).max(-1) > 0
    swapped = changed & ~replaced & mask
    swap_rate = 0.02 / (1 - 0.8)
    assert abs(swapped[mask].mean() - swap_rate * (1 - 0.8)) < 0.02


def test_onehot_swap_bitwise_equals_gather():
    """The swap's one-hot-GEMM form (L <= 512 fast path) is BITWISE the
    take_along_axis gather it replaced — one-hot matmuls move exact values.
    Checked for bf16 and fp32 tokens at the recipe's corruption rates."""
    for dtype in (jnp.bfloat16, jnp.float32):
        tokens = jax.random.normal(
            jax.random.PRNGKey(4), (8, 320, 612)).astype(dtype)
        mask_token = jax.random.normal(
            jax.random.PRNGKey(5), (1, 1, 612), jnp.float32)
        key = jax.random.PRNGKey(6)
        fast, m_fast, _ = corrupt_sequence(
            key, tokens, mask_token,
            mask_prob=0.75, replace_prob=0.8, swap_prob=0.02)

        # reference gather form (the L > 512 branch), same PRNG stream
        B, L, _ = tokens.shape
        k_mask, k_swapsel, k_swapidx, k_repl = jax.random.split(key, 4)
        mask, _ = exact_count_mask(k_mask, B, L, 0.75)
        swap_sel = jnp.logical_and(
            mask, jax.random.uniform(k_swapsel, (B, L)) < 0.02 / 0.2)
        rand_idx = jax.random.randint(k_swapidx, (B, L), 0, L)
        idx = jnp.where(swap_sel, rand_idx, jnp.arange(L)[None, :])
        ref = jnp.take_along_axis(tokens, idx[:, :, None], axis=1)
        repl_sel = jnp.logical_and(
            mask, jax.random.uniform(k_repl, (B, L)) < 0.8)
        ref = jnp.where(repl_sel[:, :, None], mask_token.astype(dtype), ref)

        assert (np.asarray(fast) == np.asarray(ref)).all(), dtype
        assert (np.asarray(m_fast) == np.asarray(mask)).all()


def test_mpp_loss_shapes_and_grads():
    model = small_sit()
    mpp = MPP(encoder=model, mask_prob=0.75, replace_prob=0.8, swap_prob=0.02)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 320, 153))
    params = mpp.init({"params": jax.random.PRNGKey(0)},
                      x, jax.random.PRNGKey(1))
    loss, recon = mpp.apply(params, x, jax.random.PRNGKey(2))
    assert recon.shape == (2, 320, 612)
    assert np.isfinite(float(loss))

    g = jax.grad(
        lambda p: mpp.apply(p, x, jax.random.PRNGKey(2))[0]
    )(params)
    # decoder params receive gradient (fixing reference tools/pretrain.py:269-280)
    gnorm = jnp.linalg.norm(g["params"]["to_original"]["kernel"])
    assert float(gnorm) > 0
    assert float(jnp.abs(g["params"]["mask_token"]).sum()) > 0


def test_mpp_golden_fixed_corruption():
    torch = pytest.importorskip("torch")
    from surface_vision_transformers_tpu.checkpoints.torch_import import (
        merge_params,
        mpp_params_from_torch,
    )
    from tests.torch_ref import TorchMPP, TorchSiT

    torch.manual_seed(0)
    tsit = TorchSiT(**CFG)
    tmpp = TorchMPP(tsit, dim_in=CFG["dim"], dim_out=612).eval()

    # build the torch-layout combined state dict the reference saves
    # (tools/pretrain.py:378-389): transformer.* + to_original.* + mask_token
    state = {"transformer." + k: v for k, v in tsit.state_dict().items()}
    state["to_original.weight"] = tmpp.to_original.weight
    state["to_original.bias"] = tmpp.to_original.bias
    state["mask_token"] = tmpp.mask_token

    model = SiT(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST, **CFG)
    mpp = MPP(encoder=model)
    x = np.random.default_rng(0).standard_normal((2, 4, 320, 153), np.float32)
    base = mpp.init({"params": jax.random.PRNGKey(0)},
                    jnp.asarray(x), jax.random.PRNGKey(1))
    loaded = mpp_params_from_torch(state, depth=CFG["depth"])
    params = {"params": merge_params(base["params"], loaded)}

    # fixed corruption computed in numpy
    rng = np.random.default_rng(1)
    target = x.transpose(0, 2, 3, 1).reshape(2, 320, 612)
    mask = rng.random((2, 320)) < 0.75
    corrupted = target.copy()
    corrupted[mask] = tmpp.mask_token.detach().numpy().reshape(-1)

    with torch.no_grad():
        ref_loss, ref_out = tmpp(
            torch.from_numpy(target),
            torch.from_numpy(corrupted),
            torch.from_numpy(mask),
        )
    loss, out = mpp.apply(
        params, jnp.asarray(x),
        fixed_mask=jnp.asarray(mask), fixed_corrupted=jnp.asarray(corrupted),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=3e-5, rtol=1e-4)
