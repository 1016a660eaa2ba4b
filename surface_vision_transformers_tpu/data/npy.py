"""Reference-format .npy dataset IO.

The reference's drivers load pre-patched arrays written by its offline ETL:
``{split}_data.npy`` of shape (2N, C, L, V) (both hemispheres as separate
samples) and ``{split}_labels.npy`` (reference: tools/train.py:97-111,
tools/preprocessing.py:98-102), plus per-channel normalization stats
``means.npy``/``stds.npy`` of shape (1, C, 1) under the label folder
(reference: tools/preprocessing.py:55-56). These loaders consume those exact
artifacts so existing preprocessed datasets work unchanged.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def load_split(
    data_path: str | os.PathLike, split: str, *, mmap: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Load ({split}_data.npy, {split}_labels.npy) from a dataset folder.

    ``mmap=True`` returns the data array as a read-only np.memmap in its
    on-disk dtype (the streaming pipeline casts per batch) so datasets larger
    than host RAM/HBM never materialize; labels always load eagerly."""
    d = Path(data_path)
    data = np.load(d / f"{split}_data.npy", mmap_mode="r" if mmap else None)
    labels = np.load(d / f"{split}_labels.npy").reshape(-1)
    if data.shape[0] != labels.shape[0]:
        raise ValueError(
            f"{split}: {data.shape[0]} samples vs {labels.shape[0]} labels"
        )
    if not mmap:
        data = data.astype(np.float32)
    return data, labels.astype(np.float32)


def load_norm_stats(
    label_path: str | os.PathLike, task: str, configuration: str
) -> tuple[np.ndarray, np.ndarray]:
    """Load means/stds (1, C, 1) from labels/{task}/{configuration}/; an
    empty/missing label dir falls back to the shipped dHCP assets."""
    from surface_vision_transformers_tpu.data.preprocess import resolve_label_dir

    d = Path(resolve_label_dir(label_path, task)) / task / configuration
    return np.load(d / "means.npy"), np.load(d / "stds.npy")


def save_split(
    data_path: str | os.PathLike, split: str, data: np.ndarray, labels: np.ndarray
) -> None:
    d = Path(data_path)
    d.mkdir(parents=True, exist_ok=True)
    np.save(d / f"{split}_data.npy", data)
    np.save(d / f"{split}_labels.npy", labels)
