"""Compiled serving artifacts (serving/artifact.py): jax.export round trip.

The reference's deployment entry point is tools/testing.py:53-101 (load a
.pth, run batched inference); ours additionally ships the COMPILED step.
The CPU tier exports the portable pure-XLA path (fused=False); the Mosaic
megakernel export is pinned in the on-TPU tier (tests_tpu)."""

import importlib.util
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.models import SiT
from surface_vision_transformers_tpu.serving import export_serving, load_serving


@pytest.fixture(scope="module")
def small_model():
    table = np.arange(40, dtype=np.int32).reshape(8, 5)  # 8 patches, V=5
    model = SiT(dim=32, depth=2, heads=2, mlp_dim=64, num_patches=8,
                num_vertices=5, num_channels=3, patch_table=table,
                dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 40)))[
        "params"
    ]
    return model, params


def test_export_roundtrip_matches_apply(small_model, tmp_path):
    model, params = small_model
    meta = export_serving(model, params, tmp_path, batch_sizes=(2, 4),
                          fused=False, input_dtype=jnp.float32)
    assert set(meta["batch_sizes"]) == {"2", "4"}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 40), jnp.float32)
    fn, _ = load_serving(tmp_path, 4)
    got = np.asarray(fn(x))
    want = np.asarray(model.apply({"params": params}, x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_loader_is_framework_free(small_model, tmp_path):
    """The shipped loader.py must run the artifact with only jax imported:
    execute it in a subprocess whose path EXCLUDES the repo (the framework
    is unimportable there)."""
    model, params = small_model
    export_serving(model, params, tmp_path, batch_sizes=(2,), fused=False,
                   input_dtype=jnp.float32)
    env_path = [p for p in sys.path if "repo" not in p]
    r = subprocess.run(
        [sys.executable, str(tmp_path / "loader.py"), "2"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": ":".join(env_path), "HOME": "/tmp"},
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_loader_module_matches(small_model, tmp_path):
    model, params = small_model
    export_serving(model, params, tmp_path, batch_sizes=(2,), fused=False,
                   input_dtype=jnp.float32)
    spec = importlib.util.spec_from_file_location(
        "svt_artifact_loader", tmp_path / "loader.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, info = mod.load(2)
    assert info["input_shape"] == [2, 3, 40]
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 40), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        np.asarray(model.apply({"params": params}, x)),
        rtol=1e-6, atol=1e-6,
    )


def test_unknown_batch_size_errors(small_model, tmp_path):
    model, params = small_model
    export_serving(model, params, tmp_path, batch_sizes=(2,), fused=False,
                   input_dtype=jnp.float32)
    with pytest.raises(KeyError):
        load_serving(tmp_path, 3)
    meta = json.loads((tmp_path / "meta.json").read_text())
    assert meta["numerics"] == "xla"


def test_quant_requires_fused(small_model):
    model, params = small_model
    from surface_vision_transformers_tpu.serving import make_serving_fn

    # dim 32 < crossover: int8 request degrades to bf16/xla instead of
    # erroring (same policy as Trainer._resolve_quant)
    fn, mode = make_serving_fn(model, params, quant="int8", fused=False)
    assert mode == "xla"
