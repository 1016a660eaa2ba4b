"""Synthetic surface datasets for tests, benchmarks, and integration runs.

The reference has no synthetic-data path at all (its integration story is
"train on dHCP and eyeball val MAE", SURVEY §4); these generators produce
(2N, C, L, V) pre-patched or (2N, C, G) raw-vertex datasets with a planted
smooth signal->label relationship, so end-to-end training demonstrably learns
(val MAE falls) without any private data.
"""

from __future__ import annotations

import numpy as np


def make_regression_dataset(
    n: int,
    *,
    num_channels: int = 4,
    num_patches: int = 320,
    num_vertices: int = 153,
    raw_vertices: int | None = None,
    label_range: tuple[float, float] = (26.0, 45.0),
    noise: float = 0.1,
    seed: int = 0,
):
    """Synthetic phenotype-regression data.

    The label (e.g. "scan age") modulates channel intensities through a fixed
    random spatial footprint, so a linear readout of patch features predicts
    it; MAE should fall well below the label std under training.

    Returns (data, labels): data is (n, C, L, V) or, when ``raw_vertices`` is
    given, (n, C, G) raw per-vertex arrays.
    """
    rng = np.random.default_rng(seed)
    lo, hi = label_range
    labels = rng.uniform(lo, hi, size=n).astype(np.float32)
    t = (labels - lo) / (hi - lo)  # (n,), 0..1

    if raw_vertices is not None:
        shape_rest = (num_channels, raw_vertices)
    else:
        shape_rest = (num_channels, num_patches, num_vertices)

    base = rng.standard_normal((1, *shape_rest), dtype=np.float32)
    footprint = rng.standard_normal((1, *shape_rest), dtype=np.float32)
    eps = rng.standard_normal((n, *shape_rest), dtype=np.float32) * noise
    data = base + t.reshape(-1, *([1] * len(shape_rest))) * footprint + eps
    return data.astype(np.float32), labels


def make_norm_stats(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Dataset-level per-channel stats in the reference's (1, C, 1) layout."""
    axes = tuple(i for i in range(data.ndim) if i != 1)
    means = data.mean(axis=axes).reshape(1, -1, 1).astype(np.float32)
    stds = data.std(axis=axes).reshape(1, -1, 1).astype(np.float32)
    return means, stds
