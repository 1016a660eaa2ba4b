"""SiT model unit tests: shape trace (SURVEY §3.5), input-path equivalence,
pooling modes, and parameter-count parity with the reference architecture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu import geometry as G
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.ops import patchify, rearrange_patched


def tiny(table=None, **kw):
    defaults = dict(
        dim=192, depth=12, heads=3, mlp_dim=768, num_patches=320,
        num_vertices=153, dtype=jnp.float32, patch_table=table,
    )
    defaults.update(kw)
    return SiT(**defaults)


def test_shape_trace_subico2():
    """(B,4,320,153) -> (B,320,612) -> (B,321,192) -> (B,1)."""
    model = tiny(depth=1)
    x = jnp.zeros((2, 4, 320, 153))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1)
    seq = model.apply(params, x, method=SiT.encode)
    # sequence is padded once to a tile-aligned length; 321 rows are valid
    assert seq.shape == (2, 384, 192)
    assert model.valid_len == 321 and model.padded_len == 384

    # seq_pad=False preserves the exact reference trace
    m2 = tiny(depth=1, seq_pad=False)
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(p2, x, method=SiT.encode).shape == (2, 321, 192)


def test_shape_trace_subico1():
    model = SiT(
        dim=192, depth=1, heads=3, mlp_dim=768, num_patches=80,
        num_vertices=561, dtype=jnp.float32,
    )
    x = jnp.zeros((2, 4, 80, 561))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (2, 1)


def test_raw_and_prepatched_paths_agree(table_sub2):
    model = tiny(table=table_sub2.indices, depth=2)
    key = jax.random.PRNGKey(1)
    xraw = jax.random.normal(key, (2, 4, 40962))
    xp = np.asarray(patchify(xraw, table_sub2.indices))
    x4 = jnp.asarray(xp.reshape(2, 320, 153, 4).transpose(0, 3, 1, 2))
    params = model.init(key, x4)
    np.testing.assert_allclose(
        model.apply(params, xraw), model.apply(params, x4), atol=1e-6
    )


def test_folded_normalization_matches_explicit(table_sub2):
    means = np.array([1.15, 0.04, 1.0, 0.07], np.float32).reshape(1, 4, 1)
    stds = np.array([0.5, 0.3, 0.2, 0.9], np.float32).reshape(1, 4, 1)
    model = tiny(table=table_sub2.indices, depth=1,
                 norm_means=means, norm_stds=stds)
    key = jax.random.PRNGKey(2)
    xraw = jax.random.normal(key, (2, 4, 40962))
    params = model.init(key, xraw)
    emb_folded = model.apply(params, xraw, method=SiT.embed)

    # explicit: normalize per channel then run without folding
    xn = (xraw - means.reshape(1, 4, 1)) / stds.reshape(1, 4, 1)
    model_plain = tiny(table=table_sub2.indices, depth=1)
    emb_explicit = model_plain.apply(params, xn, method=SiT.embed)
    # fp32 associativity only: folding reorders the reduction
    np.testing.assert_allclose(emb_folded, emb_explicit, atol=5e-4)
    out_folded = model.apply(params, xraw)
    out_explicit = model_plain.apply(params, xn)
    np.testing.assert_allclose(out_folded, out_explicit, atol=5e-3)


def test_pool_modes():
    x = jnp.ones((2, 4, 320, 153))
    for pool in ("cls", "mean"):
        m = tiny(depth=1, pool=pool)
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (2, 1)


def test_param_count_matches_reference_formula():
    """SiT-tiny sub-ico-2: patch embed (612+1)*192 + pos (321*192) + cls 192 +
    12 blocks + head; matches torch param count from the reference arch."""
    model = tiny()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 320, 153)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    dim, depth, inner, mlp = 192, 12, 192, 768
    expect = (
        (612 + 1) * dim          # patch embedding
        + 321 * dim + dim        # pos + cls
        + depth * (
            2 * 2 * dim          # two LayerNorms
            + dim * 3 * inner    # qkv (no bias)
            + inner * dim + dim  # out proj
            + dim * mlp + mlp + mlp * dim + dim  # mlp
        )
        + 2 * dim                # head norm
        + dim + 1                # head linear
    )
    assert n == expect


def test_rearrange_patched_channel_fastest():
    # feature order must be (v c): index v*C + c (reference models/sit.py:49)
    x = np.arange(2 * 3 * 2 * 5).reshape(2, 3, 2, 5).astype(np.float32)
    out = np.asarray(rearrange_patched(jnp.asarray(x)))
    b, c, l, v = 1, 2, 1, 4
    assert out[b, l, v * 3 + c] == x[b, c, l, v]


def test_bf16_close_to_fp32():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 320, 153))
    m32 = tiny(depth=2)
    params = m32.init(jax.random.PRNGKey(0), x)
    m16 = tiny(depth=2, dtype=jnp.bfloat16)
    o32 = np.asarray(m32.apply(params, x))
    o16 = np.asarray(m16.apply(params, x))
    assert np.abs(o32 - o16).max() < 0.15 * (np.abs(o32).max() + 1)


def test_patchify_chunked_matches_plain():
    """patchify_chunked (lax.map row tiles — the dataset-scale tokenize
    whose unchunked XLA gather costs ~200 s of compile at n=4096 on v5e)
    is EXACTLY patchify: even/ragged row counts, n <= chunk passthrough,
    and a fused post op."""
    from surface_vision_transformers_tpu.geometry import load_patch_table
    from surface_vision_transformers_tpu.ops import patchify_chunked

    table = load_patch_table(6, 2).indices
    key = jax.random.PRNGKey(5)
    for n, chunk in ((4, 2), (5, 2), (3, 8)):
        x = jax.random.normal(key, (n, 4, 40962))
        ref = np.asarray(patchify(x, table))
        out = np.asarray(patchify_chunked(x, table, chunk=chunk))
        np.testing.assert_array_equal(out, ref)
        post = lambda t: t * 2.0 + 1.0
        out_p = np.asarray(patchify_chunked(x, table, chunk=chunk, post=post))
        np.testing.assert_array_equal(out_p, ref * 2.0 + 1.0)
