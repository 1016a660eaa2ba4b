"""ops.exact_move: the three-bf16-plane split reconstructs fp32 bitwise.

The TPU-side truncation this guards against is only visible on chip
(tests_tpu::test_onehot_moves_fp32_bitwise_on_chip); here we pin the
decomposition identity itself — a broken split loses bits on any backend.
"""

import jax
import jax.numpy as jnp
import numpy as np

from surface_vision_transformers_tpu.ops import exact_linear_move


def _hostile_fp32(n):
    """Values exercising all 24 significand bits, extreme exponents, signs."""
    rng = np.random.default_rng(0)
    v = np.concatenate([
        rng.standard_normal(n).astype(np.float32),
        (rng.standard_normal(n) * 1e30).astype(np.float32),
        (rng.standard_normal(n) * 1e-30).astype(np.float32),
        np.float32(np.pi) * np.logspace(-10, 10, n, dtype=np.float32),
        np.nextafter(np.float32(1.0), np.float32(2.0)) * np.ones(n, np.float32),
        np.zeros(n, np.float32),
        -np.ones(n, np.float32) * np.float32(2**-126),  # smallest normal
    ])
    return v


def test_plane_split_reconstructs_fp32_bitwise():
    v = jnp.asarray(_hostile_fp32(64).reshape(8, -1))
    # identity "move": linear_fn casts the bf16 plane back up, the helper
    # sums the planes in fp32 — exactly the arithmetic the one-hot GEMM does
    out = exact_linear_move(v, lambda p: p.astype(jnp.float32))
    assert out.dtype == v.dtype
    np.testing.assert_array_equal(np.asarray(out), np.asarray(v))


def test_tiny_value_caveat_region():
    """The documented exactness boundary (module docstring): XLA flushes
    subnormal fp32 intermediates, so values whose residual planes stay
    fp32-NORMAL (>= 2^-126) reconstruct bitwise — all |v| >= 2^-103 — while
    below it (fp32 subnormals, near-min-normal values with set low bits)
    reconstruction is EXPECTED-INEXACT with error < 2^-125."""
    up = lambda p: p.astype(jnp.float32)

    # exact side: full 24-bit significands down to the documented 2^-103
    # (residual bit of 2^-103*(1+2^-23) is 2^-126, the last normal fp32)
    exact = np.float32(1 + 2**-23) * np.logspace(
        0, -26, 27, base=2.0, dtype=np.float32
    ) * np.float32(2**-77)  # spans 2^-77 .. 2^-103
    got = exact_linear_move(jnp.asarray(exact.reshape(3, -1)), up)
    np.testing.assert_array_equal(np.asarray(got), exact.reshape(3, -1))

    # inexact side (carve-out): residual planes land fp32-subnormal and
    # flush — 2^-104*(1+2^-23) has residual 2^-127, already gone
    inexact = np.array(
        [
            np.float32(2**-104) * np.float32(1 + 2**-23),
            np.float32(2**-126) * np.float32(1 + 2**-23),  # 0x00800001
            np.float32(1e-45),                             # min subnormal
            np.float32(2**-140),
        ],
        dtype=np.float32,
    )
    got = np.asarray(exact_linear_move(jnp.asarray(inexact.reshape(1, -1)), up))
    err = np.abs(got.reshape(-1) - inexact)
    assert err.max() < 2.0**-125  # bounded exactly as documented
    assert err.max() > 0  # and genuinely inexact: the caveat is real


def test_permutation_move_bitwise_and_bf16_single_plane():
    key = jax.random.PRNGKey(1)
    L, D = 96, 20
    perm = jax.random.permutation(key, L)
    oh = jax.nn.one_hot(perm, L, dtype=jnp.bfloat16)

    def move(planes):
        return jax.lax.dot_general(
            oh, planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(key, (L, D)).astype(dtype)
        got = exact_linear_move(x, move)
        assert got.dtype == dtype
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(x)[np.asarray(perm)]
        )
