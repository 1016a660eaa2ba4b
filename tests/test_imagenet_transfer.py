"""ImageNet ViT weight-transfer test: the timm-layout mapping must transfer
exactly the key subset of reference utils/utils.py:11-35 (transformer blocks
+ final norm) and leave patch/pos embeddings untouched."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from surface_vision_transformers_tpu.checkpoints.torch_import import (
    imagenet_params_from_timm,
)
from surface_vision_transformers_tpu.models import SiT

DIM, DEPTH, HEADS, MLP = 32, 2, 2, 64


def fake_timm_state(seed=0):
    """Minimal timm-ViT-layout state dict with the keys the transfer reads."""
    g = torch.Generator().manual_seed(seed)
    s = {}

    def t(*shape):
        return torch.randn(*shape, generator=g)

    for i in range(DEPTH):
        s[f"blocks.{i}.norm1.weight"] = t(DIM)
        s[f"blocks.{i}.norm1.bias"] = t(DIM)
        s[f"blocks.{i}.attn.qkv.weight"] = t(3 * DIM, DIM)
        s[f"blocks.{i}.attn.proj.weight"] = t(DIM, DIM)
        s[f"blocks.{i}.attn.proj.bias"] = t(DIM)
        s[f"blocks.{i}.norm2.weight"] = t(DIM)
        s[f"blocks.{i}.norm2.bias"] = t(DIM)
        s[f"blocks.{i}.mlp.fc1.weight"] = t(MLP, DIM)
        s[f"blocks.{i}.mlp.fc1.bias"] = t(MLP)
        s[f"blocks.{i}.mlp.fc2.weight"] = t(DIM, MLP)
        s[f"blocks.{i}.mlp.fc2.bias"] = t(DIM)
    s["norm.weight"] = t(DIM)
    s["norm.bias"] = t(DIM)
    return s


def test_imagenet_transfer_key_subset():
    model = SiT(dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP, dim_head=16,
                num_patches=20, num_vertices=15, dtype=jnp.float32)
    base = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 20, 15)))
    params = jax.tree.map(np.asarray, base["params"])
    timm = fake_timm_state()
    out = imagenet_params_from_timm(params, timm, DEPTH)

    # transferred: block weights (transposed) + head norm
    np.testing.assert_array_equal(
        out["encoder"]["layers_0_attn"]["to_qkv"]["kernel"],
        timm["blocks.0.attn.qkv.weight"].numpy().T,
    )
    np.testing.assert_array_equal(
        out["encoder"]["layers_1_mlp"]["fc2"]["kernel"],
        timm["blocks.1.mlp.fc2.weight"].numpy().T,
    )
    np.testing.assert_array_equal(
        out["head_norm"]["scale"], timm["norm.weight"].numpy()
    )
    # NOT transferred: patch embedding, pos embedding, cls, head linear
    np.testing.assert_array_equal(
        out["patch_embedding_kernel"], params["patch_embedding_kernel"]
    )
    np.testing.assert_array_equal(out["pos_embedding"], params["pos_embedding"])
    np.testing.assert_array_equal(out["cls_token"], params["cls_token"])
    np.testing.assert_array_equal(
        out["head"]["kernel"], params["head"]["kernel"]
    )

    # transferred params still run
    y = model.apply({"params": jax.tree.map(jnp.asarray, out)},
                    jnp.zeros((2, 4, 20, 15)))
    assert y.shape == (2, 1)


def test_imagenet_transfer_via_runner(tmp_path):
    """weights.imagenet points at a local torch file; the runner loads it."""
    from surface_vision_transformers_tpu.data import make_regression_dataset
    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict

    path = tmp_path / "vit_fake.pth"
    torch.save(fake_timm_state(), path)

    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": DIM, "depth": DEPTH, "heads": HEADS,
                        "mlp_dim": MLP, "dim_head": 16},
        "training": {"LR": 1e-3, "bs": 8, "epochs": 1, "val_epoch": 1,
                     "load_weights_imagenet": True},
        "weights": {"imagenet": str(path)},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
    }
    data, labels = make_regression_dataset(16, num_patches=20, num_vertices=15,
                                           label_range=(-1, 1))
    res = runner.run_training(
        from_dict(raw),
        datasets={"train": (data[:12], labels[:12]),
                  "validation": (data[12:], labels[12:])},
        run_root=tmp_path, progress=False,
    )
    assert res["training_finished"]
    assert "-imgnet" in res["run_dir"]
