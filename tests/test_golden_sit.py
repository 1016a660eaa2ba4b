"""Golden-value parity: JAX SiT vs the PyTorch reference architecture on
identical fixed weights and inputs at fp32 (SURVEY §4 'golden-value' tier —
the BASELINE north star demands fp32 output consistency vs models/sit.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from surface_vision_transformers_tpu.checkpoints.torch_import import (
    merge_params,
    sit_params_from_torch,
    sit_params_to_torch,
)
from surface_vision_transformers_tpu.models import SiT
from tests.torch_ref import TorchSiT

CFG = dict(dim=192, depth=12, heads=3, mlp_dim=768,
           num_patches=320, num_vertices=153)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchSiT(**CFG)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_model():
    return SiT(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST, **CFG)


@pytest.fixture(scope="module")
def jax_params(torch_model, jax_model):
    base = jax_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 320, 153)))
    loaded = sit_params_from_torch(torch_model.state_dict(), depth=CFG["depth"])
    return {"params": merge_params(base["params"], loaded)}


def test_forward_parity_fp32(torch_model, jax_model, jax_params):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((4, 4, 320, 153), dtype=np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    out = np.asarray(jax_model.apply(jax_params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_forward_parity_mean_pool(torch_model, jax_params):
    torch_model.pool = "mean"
    jm = SiT(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
             pool="mean", **CFG)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 320, 153), dtype=np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    torch_model.pool = "cls"
    out = np.asarray(jm.apply(jax_params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_state_dict_roundtrip(torch_model, jax_params):
    """flax -> torch export must reproduce the original state dict exactly."""
    exported = sit_params_to_torch(jax_params, depth=CFG["depth"])
    ref_state = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    assert set(exported) == set(ref_state)
    for k in ref_state:
        np.testing.assert_array_equal(exported[k], ref_state[k], err_msg=k)


def test_intermediate_sequence_parity(torch_model, jax_model, jax_params):
    """Encoder output (pre-pooling) parity — catches block-level drift that
    the pooled scalar output could mask."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 320, 153), dtype=np.float32)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        t = torch_model.to_patch_embedding(xt)
        b, n, _ = t.shape
        t = torch.cat((torch_model.cls_token.expand(b, -1, -1), t), dim=1)
        t = t + torch_model.pos_embedding[:, : n + 1]
        ref_seq = torch_model.transformer(t).numpy()
    seq = np.asarray(
        jax_model.apply(jax_params, jnp.asarray(x), method=SiT.encode)
    )[:, : ref_seq.shape[1]]  # padded rows beyond valid_len are not compared
    np.testing.assert_allclose(seq, ref_seq, atol=2e-5, rtol=1e-5)
