"""Anchor the self-authored torch_ref encoder to a third-party implementation.

The golden-parity chain (JAX SiT vs ``tests/torch_ref.TorchSiT``) has one
self-authored link: ``torch_ref._Transformer`` reimplements the semantics the
reference inherits from third-party ``vit_pytorch.vit.Transformer`` (not
installed here).  HuggingFace ``transformers`` IS installed, and its ViT
encoder layer (`transformers.models.vit.modeling_vit.ViTLayer`) is an
independent implementation of the same pre-norm ViT block:

    LN -> MHA(scale dh^-0.5, out-proj bias) -> +residual
    LN -> Linear -> exact GELU -> Linear    -> +residual

With ``qkv_bias=False``, ``hidden_act='gelu'`` (erf form) and
``layer_norm_eps=1e-5`` the two match parameter-for-parameter, so copying
weights and comparing in float64 pins our reimplementation to code we did not
write.  This covers the encoder — the part whose semantics come from
vit-pytorch; the SiT wrapper (patchify, CLS, pool, head) is pinned directly
against the reference source (reference models/sit.py:25-82) by
test_golden_sit.py.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.vit.configuration_vit import ViTConfig
from transformers.models.vit.modeling_vit import ViTLayer

from tests.torch_ref import _Transformer

DIM, DEPTH, HEADS, DH, MLP = 128, 3, 2, 64, 256


def _hf_layers(depth: int) -> torch.nn.ModuleList:
    cfg = ViTConfig(
        hidden_size=DIM,
        num_hidden_layers=depth,
        num_attention_heads=HEADS,
        intermediate_size=MLP,
        hidden_act="gelu",  # exact erf GELU, same as nn.GELU()
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,  # torch nn.LayerNorm default, vit-pytorch's choice
        qkv_bias=False,
    )
    # constructed outside from_pretrained, the attn dispatch key is unset
    cfg._attn_implementation = "eager"
    return torch.nn.ModuleList([ViTLayer(cfg) for _ in range(depth)])


def _copy_into_hf(ours: _Transformer, hf: torch.nn.ModuleList) -> None:
    inner = HEADS * DH
    with torch.no_grad():
        for (pre_attn, pre_ff), layer in zip(ours.layers, hf):
            attn, ff = pre_attn.fn, pre_ff.fn
            sa = layer.attention.attention  # ViTSelfAttention
            # fused (3*inner, dim) QKV -> separate q/k/v Linears.  Both sides
            # split heads as view(b, n, h, dh), so rows copy through directly.
            wqkv = attn.to_qkv.weight
            sa.query.weight.copy_(wqkv[:inner])
            sa.key.weight.copy_(wqkv[inner : 2 * inner])
            sa.value.weight.copy_(wqkv[2 * inner :])
            out = layer.attention.output.dense
            out.weight.copy_(attn.to_out[0].weight)
            out.bias.copy_(attn.to_out[0].bias)
            layer.layernorm_before.weight.copy_(pre_attn.norm.weight)
            layer.layernorm_before.bias.copy_(pre_attn.norm.bias)
            layer.layernorm_after.weight.copy_(pre_ff.norm.weight)
            layer.layernorm_after.bias.copy_(pre_ff.norm.bias)
            layer.intermediate.dense.weight.copy_(ff.net[0].weight)
            layer.intermediate.dense.bias.copy_(ff.net[0].bias)
            layer.output.dense.weight.copy_(ff.net[3].weight)
            layer.output.dense.bias.copy_(ff.net[3].bias)


def test_torch_ref_encoder_matches_huggingface_vit():
    torch.manual_seed(0)
    ours = _Transformer(DIM, DEPTH, HEADS, DH, MLP).double().eval()
    # break the default-init symmetry: LN weights/biases and out-proj biases
    # are ones/zeros at init, which would mask copy mistakes in those slots
    with torch.no_grad():
        for p in ours.parameters():
            p.add_(0.05 * torch.randn_like(p))
    hf = _hf_layers(DEPTH).double().eval()
    _copy_into_hf(ours, hf)

    x = torch.randn(2, 17, DIM, dtype=torch.float64)
    with torch.no_grad():
        y_ours = ours(x)
        y_hf = x
        for layer in hf:
            out = layer(y_hf)
            y_hf = out[0] if isinstance(out, tuple) else out

    # HF's eager attention deliberately runs softmax in float32 (cast + cast
    # back), flooring the f64 agreement at ~1e-7; everything else matches to
    # roundoff.  1e-6 is still >100x tighter than the smallest semantic drift
    # this anchors against (tanh-vs-erf GELU alone is ~1e-3).
    np.testing.assert_allclose(y_ours.numpy(), y_hf.numpy(), rtol=2e-6, atol=1e-6)


def test_anchor_detects_semantic_drift():
    """The anchor has teeth: a deliberate semantics change (approx-tanh GELU,
    the kind of drift this test exists to catch) must fail the bound."""
    torch.manual_seed(1)
    ours = _Transformer(DIM, 1, HEADS, DH, MLP).double().eval()
    hf = _hf_layers(1).double().eval()
    _copy_into_hf(ours, hf)
    ours.layers[0][1].fn.net[1] = torch.nn.GELU(approximate="tanh")

    x = torch.randn(2, 17, DIM, dtype=torch.float64)
    with torch.no_grad():
        y_ours = ours(x)
        out = hf[0](x)
        y_hf = out[0] if isinstance(out, tuple) else out
    assert np.abs(y_ours.numpy() - y_hf.numpy()).max() > 1e-4
