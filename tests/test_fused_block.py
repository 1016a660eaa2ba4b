"""Fused transformer-block megakernel vs the modular model (interpret mode on
CPU; bench.py exercises the compiled path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.models.fused import fused_forward

CFG = dict(dim=32, depth=2, heads=2, mlp_dim=64, dim_head=16,
           num_patches=320, num_vertices=153)


@pytest.fixture(scope="module")
def setup():
    table = load_patch_table(6, 2)
    # fp32 modules vs fp32 kernel: only the tanh-GELU approximation differs
    model = SiT(dtype=jnp.float32, patch_table=table.indices, **CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 40962))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_fused_forward_matches_modular(setup):
    model, params, x = setup
    ref = model.apply(params, x)
    out = fused_forward(model, params, x)
    # tanh-GELU vs erf-GELU bounds the deviation (~3e-4 per activation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_fused_forward_prepatched_and_mean_pool():
    model = SiT(dtype=jnp.float32, pool="mean", **CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 320, 153))
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)
    out = fused_forward(model, params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_block_bwd_grouped_matches_ungrouped():
    """_block_bwd group=2: identical dx and weight grads to group=1 (the
    group knob batches samples per program; pinned here so it stays live)."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _block_bwd,
    )

    rng = np.random.default_rng(3)
    B, N, dim, heads, dh, mlp = 4, 128, 32, 2, 16, 64
    x = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    w = (mk(dim) + 1, mk(dim), mk(dim, 3 * heads * dh), mk(heads * dh, dim),
         mk(dim), mk(dim) + 1, mk(dim), mk(dim, mlp), mk(mlp), mk(mlp, dim))

    outs = {}
    for G in (1, 2):
        outs[G] = _block_bwd(x, g, *w, heads=heads, dim_head=dh,
                             valid_len=99, ln_eps=1e-5, group=G)
    for a, b in zip(outs[1], outs[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_clamped_softmax_gradient_exact_past_clamp():
    """When attention logits exceed the fast-softmax clamp, the backward
    still returns the exact gradient of the COMPUTED (clamped) function.
    Ground truth is jax.grad through an explicit clamped-softmax block in
    FLOAT64 — naive fp32 autodiff through p=exp(u); p/S is itself 10-40x
    off truth in this stiff regime (huge-p times tiny-cotangent products),
    while the kernel's normalized-probability formulation stays ~4e-6."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        fused_block_train,
    )

    rng = np.random.default_rng(4)
    B, N, dim, heads, dh, mlp = 2, 128, 32, 2, 16, 64
    x_np = rng.standard_normal((B, N, dim))
    # a large QKV kernel drives logits well past the clamp at 60
    w_np = [rng.standard_normal(dim) * 0.1 + 1, rng.standard_normal(dim) * 0.1,
            rng.standard_normal((dim, 3 * heads * dh)) * 0.8,
            rng.standard_normal((heads * dh, dim)) * 0.1,
            rng.standard_normal(dim) * 0.1,
            rng.standard_normal(dim) * 0.1 + 1, rng.standard_normal(dim) * 0.1,
            rng.standard_normal((dim, mlp)) * 0.1, rng.standard_normal(mlp) * 0.1,
            rng.standard_normal((mlp, dim)) * 0.1, rng.standard_normal(dim) * 0.1]

    def explicit(args, xx):
        (l1s, l1b, wq, wout, bout, l2s, l2b, wfc1, bfc1, wfc2, bfc2) = args

        def ln(t, s_, b_):
            mu = t.mean(-1, keepdims=True)
            var = ((t - mu) ** 2).mean(-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-5) * s_ + b_

        h = ln(xx, l1s, l1b)
        qkv = h @ wq
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def hs(t):
            return t.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

        q, k, v = hs(q), hs(k), hs(v)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * dh**-0.5
        s = jnp.where((jnp.arange(N) < 99)[None, None, None, :], s, -1e30)
        p = jnp.exp(jnp.minimum(s, 60.0))  # the kernel's clamped form
        p = p / (p.sum(-1, keepdims=True) + 1e-30)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, heads * dh)
        x1 = xx + o @ wout + bout
        h2 = ln(x1, l2s, l2b)
        f = h2 @ wfc1 + bfc1
        c = 0.7978845608028654
        f = 0.5 * f * (1.0 + jnp.tanh(c * (f + 0.044715 * f**3)))
        return x1 + f @ wfc2 + bfc2, s.max()

    # float64 ground truth
    with jax.enable_x64(True):
        w64 = tuple(jnp.asarray(a, jnp.float64) for a in w_np)
        x64 = jnp.asarray(x_np, jnp.float64)
        _, s_max = explicit(w64, x64)
        assert float(s_max) > 60.0, float(s_max)  # the clamp really binds
        l64, g64 = jax.value_and_grad(
            lambda a: jnp.mean(explicit(a, x64)[0][:, :99] ** 2)
        )(w64)
        g64 = [np.asarray(t) for t in g64]
        l64 = float(l64)

    w32 = tuple(jnp.asarray(a, jnp.float32) for a in w_np)
    x32 = jnp.asarray(x_np, jnp.float32)
    lk, gk = jax.value_and_grad(
        lambda a: jnp.mean(fused_block_train(x32, *a, heads, dh, 99)[:, :99] ** 2)
    )(w32)
    assert abs(float(lk) - l64) < 1e-4 * max(abs(l64), 1.0)
    for a, b in zip(gk, g64):
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a, np.float64), b, atol=1e-4 * scale, rtol=1e-3,
        )


def test_cls_train_block_grads_match_full_block():
    """fused_block_cls_train: value and ALL gradients equal the full
    fused_block_train when the loss reads only the CLS row."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        fused_block_cls_train,
        fused_block_train,
    )

    rng = np.random.default_rng(0)
    B, N, dim, heads, dh, mlp = 4, 128, 32, 2, 16, 64
    x = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    w = (mk(dim) + 1, mk(dim), mk(dim, 3 * heads * dh), mk(heads * dh, dim),
         mk(dim), mk(dim) + 1, mk(dim), mk(dim, mlp), mk(mlp), mk(mlp, dim),
         mk(dim))

    def loss_full(args):
        out = fused_block_train(x, *args, heads, dh, 99)
        return jnp.mean(out[:, 0] ** 2)

    def loss_cls(args):
        out = fused_block_cls_train(x, *args, heads, dh, 99)
        return jnp.mean(out[:, 0] ** 2)

    l0, g0 = jax.value_and_grad(loss_full)(w)
    l1, g1 = jax.value_and_grad(loss_cls)(w)
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)

    # dx parity too
    dx0 = jax.grad(lambda xx: jnp.mean(
        fused_block_train(xx, *w, heads, dh, 99)[:, 0] ** 2))(x)
    dx1 = jax.grad(lambda xx: jnp.mean(
        fused_block_cls_train(xx, *w, heads, dh, 99)[:, 0] ** 2))(x)
    np.testing.assert_allclose(np.asarray(dx0), np.asarray(dx1),
                               atol=2e-5, rtol=1e-4)


def test_fused_forward_pads_internally():
    """fused_forward no longer needs the model's lane-aligned seq_pad: it
    pads to the next sublane multiple itself (321 -> 328) and matches the
    modular forward either way."""
    model = SiT(dtype=jnp.float32, seq_pad=False, **CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 320, 153)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)
    out = fused_forward(model, params, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-3
    )


def test_trainer_eval_fused_dispatch(setup):
    """The trainer picks the fused path only under the right conditions."""
    from surface_vision_transformers_tpu.train import Trainer
    from surface_vision_transformers_tpu.utils.config import from_dict

    raw = {"resolution": {"ico": 6, "sub_ico": 2},
           "transformer": {"dim": 32, "depth": 2, "heads": 2, "mlp_dim": 64,
                           "dim_head": 16},
           "training": {"LR": 1e-3, "bs": 4, "epochs": 1},
           "optimisation": {"optimiser": "Adam"}}
    t_bf16 = Trainer(from_dict(raw))
    # on CPU the fused path must NOT engage (interpret mode is for tests only)
    assert t_bf16._use_fused_inference() == (jax.default_backend() == "tpu")
    raw["tpu"] = {"compute_dtype": "float32"}
    assert not Trainer(from_dict(raw))._use_fused_inference()


def test_predict_helper(setup):
    from surface_vision_transformers_tpu.models.fused import predict

    model, params, _ = setup
    data = np.random.default_rng(0).standard_normal((10, 4, 40962)).astype(np.float32)
    out = predict(model, params, data, batch_size=4)  # 3 batches, last padded
    assert out.shape == (10, 1)
    ref = np.asarray(model.apply(params, jnp.asarray(data)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_mpp_loss_matches_modular():
    from surface_vision_transformers_tpu.models import MPP
    from surface_vision_transformers_tpu.models.fused import fused_mpp_loss

    model = SiT(dtype=jnp.float32, **CFG)
    mpp = MPP(encoder=model, mask_prob=0.5, replace_prob=0.8, swap_prob=0.02)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 320, 153))
    params = mpp.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(7)
    loss_mod, recon_mod = mpp.apply(params, x, rng)
    loss_fused, recon_fused = fused_mpp_loss(mpp, params, x, rng)
    # identical corruption (same rng) -> only kernel-math (tanh GELU) differs
    assert abs(float(loss_mod) - float(loss_fused)) < 5e-3 * float(loss_mod)
    np.testing.assert_allclose(np.asarray(recon_fused), np.asarray(recon_mod),
                               atol=2e-2)


def test_fused_forward_microbatch_equivalent(setup):
    """Large serving batches run as lax.map over _INFER_MICROBATCH tiles;
    outputs agree to fp32 accumulation-order tolerance (bit-identical on
    TPU per scripts/exp_flat_block.py; on CPU the flattened block kernel's
    GEMM M depends on the tile size, which reorders fp32 accumulation)."""
    model, params, _ = setup
    x4 = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 40962))
    whole = fused_forward(model, params, x4, microbatch=None)
    tiled = fused_forward(model, params, x4, microbatch=2)
    # the flattened block kernel folds the per-program sample group into the
    # GEMM M dim, so tile size can reorder fp32 accumulation on CPU
    # (bit-identical on TPU; measured in scripts/exp_flat_block.py)
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(whole), atol=1e-5
    )
    # indivisible batch falls back to the whole-batch path
    odd = fused_forward(model, params, x4[:3], microbatch=2)
    np.testing.assert_allclose(
        np.asarray(odd), np.asarray(whole[:3]), atol=1e-5
    )


def test_cls_blocks_grouped_match_ungrouped():
    """Flattened cls fwd/bwd at G=2 match G=1 exactly (pins the
    multi-sample top-rows reassembly and pn_parts indexing regardless of
    what the auto group picker selects at test shapes)."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _block_cls_bwd, fused_block_cls,
    )

    rng = np.random.default_rng(6)
    B, N, dim, heads, dh, mlp = 4, 128, 32, 2, 16, 64
    x = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 8, dim)), jnp.float32)
    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    w12 = (mk(dim) + 1, mk(dim), mk(dim, 3 * heads * dh), mk(heads * dh, dim),
           mk(dim), mk(dim) + 1, mk(dim), mk(dim, mlp), mk(mlp), mk(mlp, dim),
           mk(dim))

    outs = {}
    for G in (1, 2):
        outs[G] = fused_block_cls(x, *w12, heads=heads, dim_head=dh,
                                  valid_len=99, group=G)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(outs[2]),
                               atol=1e-5, rtol=1e-5)

    bwd = {}
    for G in (1, 2):
        bwd[G] = _block_cls_bwd(x, g, *w12[:10], heads=heads, dim_head=dh,
                                valid_len=99, ln_eps=1e-5, group=G)
    for a, b in zip(bwd[1], bwd[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_split_backward_matches_monolithic_kernel():
    """The two-kernel split backward (_block_bwd_split: MLP-grad kernel from
    the forward-saved x1, then attention-grad kernel) is the same math as
    the monolithic _block_bwd — with fp32 inputs the dx1 HBM round trip is
    lossless, so all 12 gradients must agree to float tolerance."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _block_bwd, _block_bwd_split, fused_block,
    )

    B, N, dim, heads, dh, mlp = 4, 16, 32, 2, 16, 64
    hd = heads * dh
    vl = 13
    rng = np.random.default_rng(7)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)

    x = mk(B, N, dim)
    g = mk(B, N, dim)
    w = dict(l1s=mk(dim) + 1, l1b=mk(dim), wqkv=mk(dim, 3 * hd),
             wout=mk(hd, dim), bout=mk(dim), l2s=mk(dim) + 1, l2b=mk(dim),
             wfc1=mk(dim, mlp), bfc1=mk(mlp), wfc2=mk(mlp, dim),
             bfc2=mk(dim))
    _, x1 = fused_block(
        x, w["l1s"], w["l1b"], w["wqkv"], w["wout"], w["bout"],
        w["l2s"], w["l2b"], w["wfc1"], w["bfc1"], w["wfc2"], w["bfc2"],
        heads=heads, dim_head=dh, valid_len=vl, save_x1=True,
    )
    mono = _block_bwd(
        x, g, w["l1s"], w["l1b"], w["wqkv"], w["wout"], w["bout"],
        w["l2s"], w["l2b"], w["wfc1"], w["bfc1"], w["wfc2"],
        heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
    )
    split = _block_bwd_split(
        x, x1, g, w["l1s"], w["l1b"], w["wqkv"], w["wout"],
        w["l2s"], w["l2b"], w["wfc1"], w["bfc1"], w["wfc2"],
        heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
    )
    assert len(mono) == len(split) == 12
    for a, b in zip(mono, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_chunked_mlp_split_matches_unchunked(monkeypatch):
    """The mlp-chunked MLP-grad kernel (dims whose full accumulators don't
    fit: dh2 accumulated over a chunk grid axis in fp32, LN2 backward in
    XLA) computes the same 12 gradients as the unchunked split path —
    forced here at a small shape via _mlp_chunks."""
    import surface_vision_transformers_tpu.ops.pallas.fused_block as fb

    B, N, dim, heads, dh, mlp = 4, 16, 32, 2, 16, 64
    hd = heads * dh
    vl = 13
    rng = np.random.default_rng(12)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)

    x = mk(B, N, dim)
    g = mk(B, N, dim)
    w = dict(l1s=mk(dim) + 1, l1b=mk(dim), wqkv=mk(dim, 3 * hd),
             wout=mk(hd, dim), l2s=mk(dim) + 1, l2b=mk(dim),
             wfc1=mk(dim, mlp), bfc1=mk(mlp), wfc2=mk(mlp, dim),
             bout=mk(dim), bfc2=mk(dim))
    _, x1 = fb.fused_block(
        x, w["l1s"], w["l1b"], w["wqkv"], w["wout"], w["bout"],
        w["l2s"], w["l2b"], w["wfc1"], w["bfc1"], w["wfc2"], w["bfc2"],
        heads=heads, dim_head=dh, valid_len=vl, save_x1=True,
    )

    def run():
        return fb._block_bwd_split(
            x, x1, g, w["l1s"], w["l1b"], w["wqkv"], w["wout"],
            w["l2s"], w["l2b"], w["wfc1"], w["bfc1"], w["wfc2"],
            heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
        )

    assert fb._mlp_chunks(N, dim, mlp) == 0
    plain = run()
    monkeypatch.setattr(fb, "_mlp_chunks", lambda *a: 4)
    chunked = run()
    for a, b in zip(plain, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_cls_split_backward_matches_monolithic_kernel():
    """The cls split backward (_block_cls_bwd_split: _mlp_bwd_kernel on the
    8-row tiles + _attn_cls_bwd_kernel) equals the monolithic
    _block_cls_bwd to float tolerance with fp32 inputs."""
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _block_cls_bwd, _block_cls_bwd_split, fused_block_cls,
    )

    B, N, dim, heads, dh, mlp = 4, 16, 32, 2, 16, 64
    hd = heads * dh
    vl = 13
    rng = np.random.default_rng(8)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)

    x = mk(B, N, dim)
    g = mk(B, 8, dim)
    w = dict(l1s=mk(dim) + 1, l1b=mk(dim), wqkv=mk(dim, 3 * hd),
             wout=mk(hd, dim), bout=mk(dim), l2s=mk(dim) + 1, l2b=mk(dim),
             wfc1=mk(dim, mlp), bfc1=mk(mlp), wfc2=mk(mlp, dim),
             bfc2=mk(dim))
    _, x1 = fused_block_cls(
        x, w["l1s"], w["l1b"], w["wqkv"], w["wout"], w["bout"],
        w["l2s"], w["l2b"], w["wfc1"], w["bfc1"], w["wfc2"], w["bfc2"],
        heads=heads, dim_head=dh, valid_len=vl, save_x1=True,
    )
    mono = _block_cls_bwd(
        x, g, w["l1s"], w["l1b"], w["wqkv"], w["wout"], w["bout"],
        w["l2s"], w["l2b"], w["wfc1"], w["bfc1"], w["wfc2"],
        heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
    )
    split = _block_cls_bwd_split(
        x, x1, g, w["l1s"], w["l1b"], w["wqkv"], w["wout"],
        w["l2s"], w["l2b"], w["wfc1"], w["bfc1"], w["wfc2"],
        heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
    )
    assert len(mono) == len(split) == 12
    for a, b in zip(mono, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_cls_split_gating_matches_autodiff(monkeypatch):
    """fused_block_cls_train routed through the cls split path (feasibility
    monkeypatched as at SiT-base dims) matches autodiff of the XLA mirror's
    first 8 rows."""
    import surface_vision_transformers_tpu.ops.pallas.fused_block as fb

    B, N, dim, heads, dh, mlp = 2, 16, 32, 2, 16, 64
    hd = heads * dh
    vl = 13
    monkeypatch.setattr(fb, "_bwd_kernel_feasible", lambda *a, **k: False)
    rng = np.random.default_rng(9)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)

    x = mk(B, N, dim)
    w = (mk(dim) + 1, mk(dim), mk(dim, 3 * hd), mk(hd, dim), mk(dim),
         mk(dim) + 1, mk(dim), mk(dim, mlp), mk(mlp), mk(mlp, dim), mk(dim))

    def loss_k(args):
        return jnp.mean(fb.fused_block_cls_train(x, *args, heads, dh, vl)
                        [:, :1] ** 2)

    def loss_e(args):
        return jnp.mean(fb._xla_block_ref(
            x, *args, heads=heads, dim_head=dh, valid_len=vl, ln_eps=1e-5,
            attn="einsum",
        )[:, :1] ** 2)

    lk, gk = jax.value_and_grad(loss_k)(w)
    le, ge = jax.value_and_grad(loss_e)(w)
    assert abs(float(lk) - float(le)) < 1e-5
    for a, b in zip(gk, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


@pytest.mark.parametrize("path", ["split", "xla"])
def test_large_dim_bwd_fallback_grads_match_autodiff(path, monkeypatch):
    """At dims where the single-kernel backward cannot fit VMEM
    (_bwd_kernel_feasible False — e.g. dim 1024: 183M measured vs the 128M
    chip), fused_block_train's VJP routes through the SPLIT two-kernel
    backward when each branch fits alone (this shape at N=48), else through
    autodiff of the XLA block mirror ("xla", forced here by disabling the
    split gate). Both must match jax.grad through an explicit einsum block
    (same contract as the kernel backward)."""
    import surface_vision_transformers_tpu.ops.pallas.fused_block as fb
    from surface_vision_transformers_tpu.ops.pallas.fused_block import (
        _bwd_kernel_feasible, _split_bwd_feasible, fused_block_train,
    )

    N, dim, heads, dh, mlp = 48, 1024, 4, 256, 4096
    hd = heads * dh
    assert not _bwd_kernel_feasible(N, dim, mlp, hd, heads)
    assert _split_bwd_feasible(N, dim, mlp, hd, heads)
    if path == "xla":
        monkeypatch.setattr(fb, "_split_bwd_feasible",
                            lambda *a, **k: False)
    rng = np.random.default_rng(5)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)

    x = mk(2, N, dim)
    w = (mk(dim) + 1, mk(dim), mk(dim, 3 * hd), mk(hd, dim), mk(dim),
         mk(dim) + 1, mk(dim), mk(dim, mlp), mk(mlp), mk(mlp, dim), mk(dim))
    vl = 40

    def explicit(args, xx):
        (l1s, l1b, wqkv, wout, bout, l2s, l2b, wfc1, bfc1, wfc2, bfc2) = args

        def ln(t, s, b):
            mu = t.mean(-1, keepdims=True)
            var = ((t - mu) ** 2).mean(-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-5) * s + b

        h = ln(xx, l1s, l1b)
        qkv = h @ wqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def hsplit(t):
            return t.reshape(2, N, heads, dh).transpose(0, 2, 1, 3)

        q, k, v = hsplit(q), hsplit(k), hsplit(v)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * dh**-0.5
        s = jnp.where((jnp.arange(N) < vl)[None, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, -1)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(2, N, hd)
        x1 = xx + o @ wout + bout
        h2 = ln(x1, l2s, l2b)
        f = h2 @ wfc1 + bfc1
        c = 0.7978845608028654
        f = 0.5 * f * (1.0 + jnp.tanh(c * (f + 0.044715 * f**3)))
        return x1 + f @ wfc2 + bfc2

    def loss_k(args):
        return jnp.mean(fused_block_train(x, *args, heads, dh, vl)[:, :vl] ** 2)

    def loss_e(args):
        return jnp.mean(explicit(args, x)[:, :vl] ** 2)

    lk, gk = jax.value_and_grad(loss_k)(w)
    le, ge = jax.value_and_grad(loss_e)(w)
    assert abs(float(lk) - float(le)) < 1e-4, (float(lk), float(le))
    for a, b in zip(gk, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_masked_mse_recon_vjp_matches_autodiff():
    """The custom-VJP reconstruction head (r3: bf16 grad GEMMs, cdt residual
    cache) must equal autodiff of the plain fp32 expression exactly when
    cdt=float32, and stay within bf16-GEMM tolerance when cdt=bfloat16."""
    from surface_vision_transformers_tpu.models.fused import _masked_mse_recon

    rng = np.random.default_rng(11)
    B, n, dim, pd = 3, 16, 8, 12
    h = jnp.asarray(rng.standard_normal((B, n, dim)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((dim, pd)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal(pd) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, n, pd)), jnp.float32)
    maskw = jnp.asarray(rng.random((B, n)) < 0.5, jnp.float32)
    inv = jnp.float32(1.0 / (B * n * pd))

    def plain(h, k, b):
        recon = h.astype(jnp.float32) @ k.astype(jnp.float32) + b
        d = recon - t
        return jnp.sum(maskw[:, :, None] * d * d) * inv

    lp, gp = jax.value_and_grad(plain, argnums=(0, 1, 2))(h, k, b)
    lf, gf = jax.value_and_grad(
        lambda h, k, b: _masked_mse_recon(jnp.float32, h, k, b, t, maskw, inv),
        argnums=(0, 1, 2),
    )(h, k, b)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-6)
    for a, e in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-6, rtol=1e-6)

    # bf16 compute dtype: compare against autodiff of the bf16-GEMM forward
    def plain_bf16(h, k, b):
        recon = jnp.matmul(h.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) + b
        d = recon - t
        return jnp.sum(maskw[:, :, None] * d * d) * inv

    lb, gb = jax.value_and_grad(plain_bf16, argnums=(0, 1, 2))(h, k, b)
    lf16, gf16 = jax.value_and_grad(
        lambda h, k, b: _masked_mse_recon(jnp.bfloat16, h, k, b, t, maskw, inv),
        argnums=(0, 1, 2),
    )(h, k, b)
    np.testing.assert_allclose(float(lf16), float(lb), rtol=1e-6)
    for a, e in zip(gf16, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=5e-3, rtol=5e-2)


def test_fused_mpp_loss_grads_match_plain_head():
    """fused_mpp_loss end-to-end grads with the custom-VJP head equal grads
    with a plain-autodiff fp32 head when the encoder runs fp32 (cdt=fp32 is
    the exact-parity mode); pins that swapping the head implementation does
    not change MPP training."""
    from surface_vision_transformers_tpu.models import MPP
    from surface_vision_transformers_tpu.models import fused as F

    model = SiT(dtype=jnp.float32, **CFG)
    mpp = MPP(encoder=model, mask_prob=0.5, replace_prob=0.8, swap_prob=0.02)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 320, 153))
    params = mpp.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(7)

    def loss_now(p):
        return F.fused_mpp_loss(mpp, p, x, rng)[0]

    def plain_head(cdt, h, kernel, bias, target, maskw, inv_denom):
        recon = h.astype(jnp.float32) @ kernel.astype(jnp.float32) \
            + bias.astype(jnp.float32)
        d = recon - target.astype(jnp.float32)
        return jnp.sum(maskw[:, :, None] * d * d) * inv_denom

    orig = F._masked_mse_recon
    try:
        F._masked_mse_recon = plain_head
        lp, gp = jax.value_and_grad(loss_now)(params)
    finally:
        F._masked_mse_recon = orig
    lf, gf = jax.value_and_grad(loss_now)(params)

    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-6)
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_p = jax.tree_util.tree_leaves(gp)
    for a, e in zip(flat_f, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-5, rtol=1e-4)


def test_scan_blocks_parity():
    """tpu.scan_blocks runs the SAME block kernels as one lax.scan over
    depth-stacked weights — identical math, different compilation structure.
    On CPU-interpret the unrolled and scanned programs XLA-fuse differently
    (FMA/reassociation), so parity here is ulp-level; the on-TPU tier pins
    BITWISE equality (the block is one opaque Mosaic kernel either way)."""
    from surface_vision_transformers_tpu.models.fused import (
        fused_train_forward,
    )

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 320, 153))
    for pool in ("cls", "mean"):
        model = SiT(dtype=jnp.float32, pool=pool, **{**CFG, "depth": 4})
        params = model.init(jax.random.PRNGKey(0), x)

        def loss(p, sb):
            out = fused_train_forward(model, p, x, scan_blocks=sb)
            return (out.astype(jnp.float32) ** 2).sum()

        l_u, g_u = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
        l_s, g_s = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
        np.testing.assert_allclose(float(l_u), float(l_s), rtol=1e-6)
        for a, e in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-4, atol=1e-7)


def test_scan_blocks_inference_parity_sit():
    """scan_blocks through fused_forward (SiT inference/serving): the
    scanned non-final block stack must match the unrolled loop for both
    pools (cls keeps the fused_block_cls tail unrolled) and for the int8
    path (which quantizes per scan step from the same UNCAST weights the
    unrolled path quantizes from)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 320, 153))
    for pool in ("cls", "mean"):
        model = SiT(dtype=jnp.float32, pool=pool, **{**CFG, "depth": 4})
        params = model.init(jax.random.PRNGKey(0), x)
        for quant in (None, "int8"):
            o_u = jax.jit(lambda p, xx: fused_forward(
                model, p, xx, quant=quant, scan_blocks=False))(params, x)
            o_s = jax.jit(lambda p, xx: fused_forward(
                model, p, xx, quant=quant, scan_blocks=True))(params, x)
            np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_u),
                                       rtol=1e-4, atol=1e-6)


def test_scan_blocks_mpp_and_config():
    """scan_blocks through fused_mpp_loss (bitwise loss + grads) and the
    tpu.scan_blocks config key parses into the Trainer's fused path."""
    from surface_vision_transformers_tpu.models import MPP
    from surface_vision_transformers_tpu.models.fused import fused_mpp_loss
    from surface_vision_transformers_tpu.utils.config import from_dict

    model = SiT(dtype=jnp.float32, **{**CFG, "depth": 3})
    mpp = MPP(encoder=model, mask_prob=0.5, replace_prob=0.8, swap_prob=0.02)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 320, 153))
    params = mpp.init({"params": jax.random.PRNGKey(0)}, x,
                      jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(7)

    def loss(p, sb):
        return fused_mpp_loss(mpp, p, x, rng, scan_blocks=sb)[0]

    l_u, g_u = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    l_s, g_s = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    np.testing.assert_allclose(float(l_u), float(l_s), rtol=1e-6)
    for a, e in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-7)

    exp = from_dict({
        "resolution": {"ico": 6, "sub_ico": 2},
        "transformer": {"dim": 32, "depth": 3, "heads": 2, "mlp_dim": 64},
        "training": {"LR": 1e-4, "bs": 2, "epochs": 1},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"scan_blocks": True},
    })
    assert exp.tpu.scan_blocks is True
