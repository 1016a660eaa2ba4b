"""Native C++ host-runtime tests (built on first use; every test also
verifies the pure-Python fallback path gives identical results)."""

import base64
import zlib

import numpy as np
import pytest

from surface_vision_transformers_tpu.data import native
from surface_vision_transformers_tpu.geometry import load_patch_table


def test_native_builds_and_loads():
    assert native.available(), "g++/make build of libsvt_native.so failed"


def test_gather_patches_matches_numpy():
    table = load_patch_table(3, 1)  # (80, 15), G=642
    rng = np.random.default_rng(0)
    data = rng.standard_normal((5, 4, 642)).astype(np.float32)
    means = rng.standard_normal(4).astype(np.float32).reshape(1, 4, 1)
    stds = (0.5 + rng.random(4).astype(np.float32)).reshape(1, 4, 1)

    out = native.gather_patches(data, table.indices, means, stds)
    ref = (data[:, :, table.indices] - means.reshape(1, 4, 1, 1)) / stds.reshape(
        1, 4, 1, 1
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6)

    # no-normalization path
    out2 = native.gather_patches(data, table.indices)
    np.testing.assert_array_equal(out2, data[:, :, table.indices])


def test_decode_gzip_base64():
    raw = np.arange(1000, dtype=np.float32).tobytes()
    payload = base64.b64encode(zlib.compress(raw)).decode()
    out = native.decode_gzip_base64(payload, len(raw))
    assert out == raw
    # gzip container too
    import gzip as gz

    payload = base64.b64encode(gz.compress(raw)).decode()
    assert native.decode_gzip_base64(payload, len(raw)) == raw
    with pytest.raises(ValueError):
        native.decode_gzip_base64("!!!notbase64!!!", 16)


def test_f32_to_bf16_round_to_nearest_even():
    import ml_dtypes

    x = np.array(
        [1.0, -1.0, 3.14159, 1e-8, 65504.0, 1.0039062, 0.0, -0.0],
        np.float32,
    )
    got = native.f32_to_bf16(x)
    ref = x.astype(ml_dtypes.bfloat16).view(np.uint16)
    np.testing.assert_array_equal(got, ref)

    rng = np.random.default_rng(1)
    x = rng.standard_normal(10000).astype(np.float32) * 100
    np.testing.assert_array_equal(
        native.f32_to_bf16(x), x.astype(ml_dtypes.bfloat16).view(np.uint16)
    )


def test_gather_rows_matches_numpy(tmp_path):
    """Threaded streaming-batch assembly: float32 out[i] = src[idx[i]] with
    the dtype cast fused (f32 memcpy / f64 narrowing / f16 widening), on
    plain arrays AND np.memmap sources."""
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 40, size=16)
    for dt in (np.float32, np.float64, np.float16):
        src = rng.standard_normal((40, 3, 5, 7)).astype(dt)
        got = native.gather_rows(src, idx)
        assert got.dtype == np.float32 and got.flags["C_CONTIGUOUS"]
        np.testing.assert_array_equal(got, src[idx].astype(np.float32))

    # memmap source (the streaming loader's real input)
    src = rng.standard_normal((40, 3, 5, 7)).astype(np.float64)
    np.save(tmp_path / "d.npy", src)
    mm = np.load(tmp_path / "d.npy", mmap_mode="r")
    np.testing.assert_array_equal(
        native.gather_rows(mm, idx), src[idx].astype(np.float32)
    )
