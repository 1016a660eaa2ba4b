"""W8A8 int8 serving path: quantizer properties, int8-GEMM accuracy, and
end-to-end logit fidelity of ``fused_forward(quant="int8")`` vs the fp32
modular model (interpret mode on CPU; tests_tpu covers the compiled MXU
path). The reference serves fp32 eval (/root/reference/tools/train.py:316);
the int8 path must reproduce its logits to within W8A8 quantization error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.models.fused import fused_forward
from surface_vision_transformers_tpu.ops.pallas.fused_block import fused_block
from surface_vision_transformers_tpu.ops.pallas.fused_block_int8 import (
    fused_block_int8,
    quantize_block_weights,
    quantize_weight_int8,
)

CFG = dict(dim=32, depth=2, heads=2, mlp_dim=64, dim_head=16,
           num_patches=320, num_vertices=153)


def test_weight_quantizer_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 96)) * 0.2, jnp.float32)
    q, s = quantize_weight_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 96)
    deq = q.astype(jnp.float32) * s
    # symmetric per-channel: error <= scale/2 = absmax/254 per channel
    col_max = np.abs(np.asarray(w)).max(axis=0)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert (err <= col_max / 254.0 + 1e-7).all()
    # full int8 range actually used on the absmax entries
    assert np.asarray(q).max() == 127 or np.asarray(q).min() == -127


def test_int8_gemm_close_to_fp32():
    from surface_vision_transformers_tpu.ops.pallas.fused_block_int8 import (
        _quant_rows,
    )

    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 96)) * 0.1, jnp.float32)
    qw, sw = quantize_weight_int8(w)
    qh, sh = _quant_rows(h)
    out = (
        jax.lax.dot_general(
            qh, qw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        * sh
        * sw
    )
    ref = h @ w
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(
        np.asarray(ref)
    )
    assert rel < 0.01, rel


def _mk_block_weights(rng, dim, heads, dh, mlp):
    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)

    return dict(
        ln1_s=mk(dim) + 1, ln1_b=mk(dim),
        w_qkv=mk(dim, 3 * heads * dh), w_out=mk(heads * dh, dim),
        b_out=mk(dim), ln2_s=mk(dim) + 1, ln2_b=mk(dim),
        w_fc1=mk(dim, mlp), b_fc1=mk(mlp), w_fc2=mk(mlp, dim),
        b_fc2=mk(dim),
    )


def test_fused_block_int8_close_to_fp32_block():
    rng = np.random.default_rng(2)
    B, N, dim, heads, dh, mlp = 4, 64, 32, 2, 16, 64
    x = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    w = _mk_block_weights(rng, dim, heads, dh, mlp)
    ref = fused_block(
        x, w["ln1_s"], w["ln1_b"], w["w_qkv"], w["w_out"], w["b_out"],
        w["ln2_s"], w["ln2_b"], w["w_fc1"], w["b_fc1"], w["w_fc2"],
        w["b_fc2"], heads=heads, dim_head=dh, valid_len=50,
    )
    qs = quantize_block_weights(w["w_qkv"], w["w_out"], w["w_fc1"],
                                w["w_fc2"])
    out = fused_block_int8(
        x, w["ln1_s"], w["ln1_b"],
        qs[0], qs[1], qs[2], qs[3], w["b_out"],
        w["ln2_s"], w["ln2_b"],
        qs[4], qs[5], w["b_fc1"], qs[6], qs[7], w["b_fc2"],
        heads=heads, dim_head=dh, valid_len=50,
    )
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    rel = np.linalg.norm(out_np - ref_np) / np.linalg.norm(ref_np)
    assert rel < 0.01, rel


@pytest.mark.parametrize("pool", ["cls", "mean"])
def test_fused_forward_int8_logit_fidelity(pool):
    """End-to-end W8A8 serving vs fp32 modular apply: logits within ~2%
    relative L2 and identical argmax on a 2-block model."""
    model = SiT(dtype=jnp.float32, pool=pool, **CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 320, 153))
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))
    out = np.asarray(fused_forward(model, params, x, quant="int8"))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    assert (out.argmax(-1) == ref.argmax(-1)).all()


def test_fused_forward_int8_microbatched_matches_single():
    model = SiT(dtype=jnp.float32, pool="cls", **CFG)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 320, 153))
    params = model.init(jax.random.PRNGKey(0), x)
    whole = np.asarray(fused_forward(model, params, x, quant="int8"))
    micro = np.asarray(
        fused_forward(model, params, x, quant="int8", microbatch=4)
    )
    np.testing.assert_allclose(micro, whole, atol=2e-5)


def test_config_quant_key_reaches_infer(monkeypatch, capsys):
    """tpu.quant: int8 is a validated config key and Trainer._infer threads
    it into fused_forward(quant=...) — the product path (cli.test /
    run_testing evaluation) reaches the W8A8 kernels from YAML alone.
    Below the measured crossover dim the trainer auto-falls-back to bf16
    with a one-time notice (int8 is a wash at SiT-tiny — BENCH_DETAILS
    inference_int8) instead of honoring the key blindly."""
    from surface_vision_transformers_tpu.train import trainer as trainer_mod
    from surface_vision_transformers_tpu.train.trainer import Trainer
    from surface_vision_transformers_tpu.utils.config import from_dict

    with pytest.raises(ValueError):
        from_dict({"tpu": {"quant": "int4"}})

    exp = from_dict({
        "resolution": {"ico": 6, "sub_ico": 2},
        "transformer": {"dim": 32, "depth": 2, "heads": 2, "mlp_dim": 64,
                        "dim_head": 16},
        "tpu": {"quant": "int8", "compute_dtype": "float32"},
    })
    assert exp.tpu.quant == "int8"
    tr = Trainer(exp)
    monkeypatch.setattr(trainer_mod, "FORCE_FUSED", True)
    seen = {}

    import surface_vision_transformers_tpu.models.fused as fused_mod

    real = fused_mod.fused_forward

    def spy(model, variables, x, **kw):
        seen["quant"] = kw.get("quant")
        return real(model, variables, x, **kw)

    monkeypatch.setattr(fused_mod, "fused_forward", spy)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 320, 153))
    params = tr.model.init(jax.random.PRNGKey(0), x)["params"]

    # dim 32 < INT8_MIN_DIM: crossover policy serves bf16, says so once
    out = tr._infer(params, x)
    assert seen["quant"] is None
    assert "int8" in capsys.readouterr().out
    tr._infer(params, x)
    assert capsys.readouterr().out == ""  # notice is one-time
    assert np.isfinite(np.asarray(out)).all()

    # above the crossover the key reaches the W8A8 kernels unchanged
    import surface_vision_transformers_tpu.models.fused_mssit as fm

    monkeypatch.setattr(fm, "INT8_MIN_DIM", 1)
    tr2 = Trainer(exp)
    out = tr2._infer(params, x)
    assert seen["quant"] == "int8"
    assert np.isfinite(np.asarray(out)).all()


def test_fused_forward_int8_under_pure_dp_mesh():
    """The int8 kernels survive the pure-DP shard_map wrapper (quant kwarg
    threads through the mesh recursion)."""
    from surface_vision_transformers_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(data=len(jax.devices()))
    model = SiT(dtype=jnp.float32, pool="cls", **CFG)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 4, 320, 153))
    params = model.init(jax.random.PRNGKey(0), x)
    single = np.asarray(fused_forward(model, params, x, quant="int8"))
    sharded = np.asarray(
        fused_forward(model, params, x, quant="int8", mesh=mesh)
    )
    np.testing.assert_allclose(sharded, single, atol=2e-5)
