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


class TestDropoutKernel:
    """Attention-probability dropout variant of the packed kernel.

    In interpret mode the kernel consumes the host-built keep mask
    (_keep_mask_host), so outputs/grads must match an explicit softmax ->
    mask/scale -> @V implementation using the SAME mask exactly.
    """

    @staticmethod
    def _explicit(qkv, heads, valid_len, rate, keep):
        B, N, F = qkv.shape
        dh = F // (3 * heads)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_t(t):
            return t.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads_t(q), heads_t(k), heads_t(v)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * dh**-0.5
        if valid_len is not None and valid_len < N:
            s = jnp.where((jnp.arange(N) < valid_len)[None, None, None, :],
                          s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(keep, p, 0.0) / (1.0 - rate)
        o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
        return o.transpose(0, 2, 1, 3).reshape(B, N, heads * dh)

    def test_forward_matches_explicit_same_mask(self):
        from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
            _keep_mask_host, flash_attention_qkv_dropout,
        )

        B, N, heads, dh, rate = 2, 128, 3, 64, 0.35
        qkv = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3 * heads * dh))
        seed = jnp.array(1234, jnp.int32)
        out = flash_attention_qkv_dropout(qkv, heads, 100, rate, seed)
        keep = _keep_mask_host(seed, B, heads, N, rate)
        ref = self._explicit(qkv, heads, 100, rate, keep)
        np.testing.assert_allclose(
            np.asarray(out)[:, :100], np.asarray(ref)[:, :100], atol=3e-5
        )

    def test_grads_match_explicit_same_mask(self):
        from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
            _keep_mask_host, flash_attention_qkv_dropout,
        )

        B, N, heads, dh, rate = 1, 128, 2, 64, 0.5
        qkv = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3 * heads * dh))
        seed = jnp.array(77, jnp.int32)
        keep = _keep_mask_host(seed, B, heads, N, rate)

        def lk(qkv):
            return (flash_attention_qkv_dropout(qkv, heads, N, rate, seed)
                    ** 2).sum()

        def lr(qkv):
            return (self._explicit(qkv, heads, None, rate, keep) ** 2).sum()

        g1 = jax.grad(lk)(qkv)
        g2 = jax.grad(lr)(qkv)
        scale = max(float(np.abs(np.asarray(g2)).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), atol=5e-4 * scale
        )

    def test_drop_fraction_near_rate(self):
        from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
            _keep_mask_host,
        )

        keep = _keep_mask_host(jnp.array(5, jnp.int32), 4, 3, 128, 0.25)
        frac = 1.0 - float(jnp.mean(keep.astype(jnp.float32)))
        assert abs(frac - 0.25) < 0.01

    def test_model_trains_with_dropout_through_kernel(self):
        """SiT with dropout>0 + attn_backend='pallas' routes attention through
        the dropout kernel (interpret on CPU) and takes a finite grad step."""
        from surface_vision_transformers_tpu.models import SiT

        model = SiT(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
                    num_patches=20, num_vertices=153, num_channels=4,
                    dropout=0.1, attn_backend="pallas", dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 20, 153))
        params = model.init(jax.random.PRNGKey(1), x)

        def loss(p, rng):
            out = model.apply(p, x, deterministic=False,
                              rngs={"dropout": rng})
            return (out ** 2).mean()

        val, g = jax.value_and_grad(loss)(params, jax.random.PRNGKey(2))
        assert np.isfinite(float(val))
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(t)).all() for t in flat)


def test_group_selection_rules():
    """Pin the measured flattened-group picks and the VMEM clamps for
    unmeasured shapes (fused_block._auto_group/_clamp_group[_cls])."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _auto_group, _clamp_group, _clamp_group_cls, _fit_group,
    )

    # measured optima survive the clamps (tiny / small / base, N=328)
    assert _clamp_group(_auto_group(192), 328, 192, 768, 576) == 8
    assert _clamp_group(_auto_group(384), 328, 384, 1536, 1152) == 2
    assert _clamp_group(_auto_group(768), 328, 768, 3072, 2304) == 8
    assert _clamp_group(
        _auto_group(192, bwd=True), 328, 192, 768, 576, heads=3, bwd=True
    ) == 4
    # unmeasured large shapes clamp down instead of overcommitting VMEM
    assert _clamp_group(_auto_group(1024), 328, 1024, 4096, 3072) < 8
    # cls estimate keeps large dims at full G (its MLP runs on 8 rows)
    assert _clamp_group_cls(_auto_group(1024), 328, 1024, 3072) == 8
    assert _clamp_group_cls(
        _auto_group(1024, bwd=True), 328, 1024, 3072, heads=16, bwd=True
    ) == 2
    # divisibility fitting
    assert _fit_group(8, 256) == 8
    assert _fit_group(8, 6) == 2
    assert _fit_group(8, 7) == 1
    # an EXPLICIT caller group is clamped too, on every path (ADVICE r2):
    # all four call sites compute _clamp_group[/_cls](group or auto, ...),
    # so an oversized expert knob degrades instead of failing Mosaic compile
    assert _clamp_group(8, 328, 1024, 4096, 3072) < 8
    assert _clamp_group(8, 328, 1024, 4096, 3072, heads=16, bwd=True) == 2
    assert _clamp_group_cls(8, 328, 1024, 3072, heads=16, bwd=True) == 4


def test_pick_group_dtype_aware():
    """fp32 inputs halve the packed kernels' per-program group: with grid > 1
    Mosaic double-buffers input blocks, and fp32 G=4 at Np=384 overflowed the
    16M scoped-VMEM stack at B=256 (caught by the flagship-shape TPU test)."""
    from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
        _pick_group,
    )

    assert _pick_group(256, 2) == 4   # bf16 keeps the measured G=4
    assert _pick_group(256, 4) == 2   # fp32 halves
    assert _pick_group(2, 4) == 2
    assert _pick_group(3, 2) == 1     # indivisible batch
    assert _pick_group(3, 4) == 1


def test_bwd_kernel_feasible_boundaries():
    """The backward-kernel feasibility rule matches what was measured on
    chip: dim 512 compiles (kernel path), dim 768 and 1024 do not (XLA
    fallback)."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _bwd_kernel_feasible,
    )

    assert _bwd_kernel_feasible(328, 192, 768, 192, 3)      # SiT-tiny
    assert _bwd_kernel_feasible(328, 384, 1536, 384, 6)     # SiT-small
    assert _bwd_kernel_feasible(328, 512, 2048, 512, 8)
    assert not _bwd_kernel_feasible(328, 768, 3072, 768, 12)   # SiT-base
    assert not _bwd_kernel_feasible(328, 1024, 4096, 1024, 16)


def test_split_backward_policy():
    """Backward-path routing as measured on chip (docs/design.md): the
    monolithic kernel only at tiny dims; the SPLIT two-kernel backward for
    dim > 256 (faster at 384/512 even though the monolithic fits: +14%/+6%
    epoch-level, and the only kernel option at 768+). At dim 1024 the MLP
    half runs the mlp-CHUNKED grid (full accumulators ~34M + working set
    exceed the 40M per-kernel bound; C=2 chunks fit). _fbt_fwd must save
    x1 exactly when the split will run."""
    import jax.numpy as jnp
    import numpy as np

    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _fbt_fwd, _mlp_chunks, _prefer_split, _split_bwd_feasible,
        _split_cls_bwd_feasible,
    )

    assert not _prefer_split(192)
    assert _prefer_split(384) and _prefer_split(512) and _prefer_split(768)
    assert _split_bwd_feasible(328, 384, 1536, 384, 6)
    assert _split_bwd_feasible(328, 768, 3072, 768, 12)
    assert _split_bwd_feasible(328, 1024, 4096, 1024, 16)  # via chunking

    # heads-aware attention-grad live set (docs/design.md): Mosaic keeps
    # ~4 (N, N) fp32 temporaries per unrolled head, so the MS-SiT global
    # stage (heads=24, dh=32 — same dim/hd as SiT-base) must clamp the
    # attn kernel to G=1 while SiT-base (heads=12, dh=64) keeps its
    # measured-optimal G=2 (the 98.7M-vs-96M OOM caught on chip)
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _split_groups,
    )

    assert _split_groups(328, 768, 3072, 768, 12, 8)[1] == 2  # SiT-base
    assert _split_groups(320, 768, 3072, 768, 24, 8) == (2, 1)  # MS-SiT s3
    assert _split_bwd_feasible(320, 768, 3072, 768, 24)
    assert _mlp_chunks(328, 384, 1536) == 0   # plain kernel fits
    assert _mlp_chunks(328, 768, 3072) == 0
    assert _mlp_chunks(328, 1024, 4096) == 2  # chunked grid
    assert _split_cls_bwd_feasible(328, 768, 3072, 768, 12)

    rng = np.random.default_rng(0)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)

    for dim, heads, expect_x1 in ((32, 2, False), (384, 6, True)):
        dh, mlp, hd = 16 if dim == 32 else 64, 2 * dim, None
        hd = heads * dh
        w = (mk(dim) + 1, mk(dim), mk(dim, 3 * hd), mk(hd, dim), mk(dim),
             mk(dim) + 1, mk(dim), mk(dim, mlp), mk(mlp), mk(mlp, dim),
             mk(dim))
        _, res = _fbt_fwd(mk(2, 16, dim), *w, heads, dh, 13, 1e-5)
        assert (res[1] is not None) == expect_x1, (dim, res[1] is None)


def test_pick_group_n_aware():
    """Large-N shapes clamp the packed/split kernels' sample group by the
    fp32 score-temporary estimate (N=1024 crashed the Mosaic compile helper
    before); measured SiT shapes keep their exact previous groups."""
    from surface_vision_transformers_tpu.ops.pallas.flash_attention import (
        _pick_group, _vmem_params,
    )

    # measured shapes: unchanged groups, no special compile params
    assert _pick_group(8, 2, 384, 384, temps=2) == 4
    assert _pick_group(8, 2, 512, 512, temps=2) == 4
    assert _vmem_params(4, 384, 384, temps=2) is None
    # large N steps down
    assert _pick_group(8, 2, 768, 768, temps=2) == 2
    assert _pick_group(8, 2, 1024, 1024, temps=2) == 1
    # G=1 shapes whose temporaries still crowd the default scoped stack get
    # an explicit raised limit
    assert _vmem_params(1, 1536, 1536, temps=2) is not None
    assert _vmem_params(1, 512, 512, temps=2) is None
