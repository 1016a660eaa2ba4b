"""Model-variant coverage: small/base sizes, sub-ico-0/1/3 grids (the
reference is data-blocked beyond sub-ico-2; we generate tables)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.geometry import load_patch_table, patch_grid
from surface_vision_transformers_tpu.models import SiT


@pytest.mark.parametrize(
    "sub_ico,dim,heads,mlp",
    [(0, 192, 3, 768), (1, 384, 6, 1536), (3, 768, 12, 3072)],
)
def test_variant_forward_shapes(sub_ico, dim, heads, mlp):
    L, V = patch_grid(6, sub_ico)
    # depth 1 keeps the CPU test fast; full-depth shapes are exercised by the
    # tiny config everywhere else
    model = SiT(dim=dim, depth=1, heads=heads, mlp_dim=mlp,
                num_patches=L, num_vertices=V, dtype=jnp.float32)
    x = jnp.zeros((2, 4, L, V))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (2, 1)


def test_subico3_generated_table_raw_path():
    # 1280-patch grid on a generated (canonical-order) table, raw input
    table = load_patch_table(4, 2)  # smaller mesh for CPU speed: L=320, V=15
    model = SiT(dim=32, depth=1, heads=2, mlp_dim=64, dim_head=16,
                num_patches=320, num_vertices=15, dtype=jnp.float32,
                patch_table=table.indices)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 2562))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (2, 1)


def test_num_classes_head():
    # regression head generalizes to multi-output (num_classes > 1)
    model = SiT(dim=32, depth=1, heads=2, mlp_dim=64, dim_head=16,
                num_patches=20, num_vertices=15, num_classes=5,
                dtype=jnp.float32)
    x = jnp.zeros((3, 4, 20, 15))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (3, 5)
