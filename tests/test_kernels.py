"""Pallas kernel correctness vs XLA reference (interpret mode on CPU; the
same code compiles with Mosaic on TPU — bench.py exercises that path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.ops import xla_attention
from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
    flash_attention,
)


def _qkv(B, H, N, D, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (B, H, N, D), dtype) for k in ks)


@pytest.mark.parametrize("N", [321, 128, 81])
def test_flash_forward_matches_xla(N):
    q, k, v = _qkv(2, 3, N, 64)
    out = flash_attention(q, k, v)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_valid_len_matches_sliced_xla():
    # padded inputs + valid_len must equal unpadded attention on the slice
    N, VL = 384, 321
    q, k, v = _qkv(1, 2, N, 64)
    out = flash_attention(q, k, v, VL)
    ref = xla_attention(q[:, :, :VL], k[:, :, :VL], v[:, :, :VL])
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :VL], np.asarray(ref), atol=2e-5
    )


def test_flash_grads_match_xla():
    q, k, v = _qkv(2, 2, 321, 64)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v) ** 2).sum()

    def loss_xla(q, k, v):
        return (xla_attention(q, k, v) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, nm in zip(g1, g2, "qkv"):
        scale = np.abs(np.asarray(b)).max()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4 * max(scale, 1.0),
            err_msg=f"d{nm}",
        )


def test_flash_grads_with_valid_len():
    # gradients w.r.t. padding positions must be exactly zero
    N, VL = 384, 300
    q, k, v = _qkv(1, 2, N, 64)

    def loss(q, k, v):
        return (flash_attention(q, k, v, VL)[:, :, :VL] ** 2).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert float(jnp.abs(dq[:, :, VL:]).max()) == 0.0
    assert float(jnp.abs(dk[:, :, VL:]).max()) == 0.0
    assert float(jnp.abs(dv[:, :, VL:]).max()) == 0.0

    def loss_ref(q, k, v):
        return (xla_attention(q[:, :, :VL], k[:, :, :VL], v[:, :, :VL]) ** 2).sum()

    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q, k, v
    )
    np.testing.assert_allclose(np.asarray(dq[:, :, :VL]), np.asarray(rq[:, :, :VL]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk[:, :, :VL]), np.asarray(rk[:, :, :VL]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv[:, :, :VL]), np.asarray(rv[:, :, :VL]), atol=1e-4)


def test_flash_rejects_oversized_seq():
    q, k, v = _qkv(1, 1, 2048, 64)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v)


def test_dispatcher_falls_back(monkeypatch):
    from surface_vision_transformers_tpu.ops import multi_head_attention

    q, k, v = _qkv(1, 1, 40, 16)
    out = multi_head_attention(q, k, v, backend="auto")
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestTiledAttention:
    """Blockwise kernel for N > single-block limit (sub-ico-4 / ico-7)."""

    def test_tiled_forward_matches_xla(self):
        from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
            flash_attention_tiled,
        )

        q, k, v = _qkv(1, 2, 2048, 64)
        out = flash_attention_tiled(q, k, v)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_tiled_valid_len_and_padding(self):
        from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
            flash_attention_tiled,
        )

        # N not a tile multiple -> padded internally; valid_len masks
        q, k, v = _qkv(1, 1, 1664, 64)
        out = flash_attention_tiled(q, k, v, 1600)
        ref = xla_attention(q[:, :, :1600], k[:, :, :1600], v[:, :, :1600])
        np.testing.assert_allclose(
            np.asarray(out)[:, :, :1600], np.asarray(ref), atol=3e-5
        )

    def test_tiled_grads_match_xla(self):
        from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
            flash_attention_tiled,
        )

        q, k, v = _qkv(1, 1, 1024, 64)

        def lf(q, k, v):
            return (flash_attention_tiled(q, k, v) ** 2).sum()

        def lr(q, k, v):
            return (xla_attention(q, k, v) ** 2).sum()

        g1 = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for a, b, nm in zip(g1, g2, "qkv"):
            scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4 * scale, err_msg=f"d{nm}"
            )

    def test_dispatcher_uses_tiled_for_long_seq(self):
        from surface_vision_transformers_tpu.ops import multi_head_attention

        q, k, v = _qkv(1, 1, 2048, 64)
        out = multi_head_attention(q, k, v, backend="pallas")
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
