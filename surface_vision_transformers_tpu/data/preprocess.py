"""Offline preprocessing ETL: GIFTI metric files -> patched .npy datasets.

Byte-compatible replacement for the reference's preprocessing script
(reference: tools/preprocessing.py): per subject it loads left/right
hemisphere metric files ``sub-{id}_ses-{ses}_{L,R}.shape.gii`` from
``{data_path}/regression_{configuration}_space_features/``, keeps the first
``channels`` metrics, z-scores with the dataset-level (1, C, 1) stats, gathers
patches via the triangle table, and writes ``{split}_data.npy`` of shape
(2N, C, L, V) — left hemispheres in rows 0..N-1, right in rows N..2N-1,
labels duplicated — plus ``{split}_labels.npy``.

Differences from the reference (behaviour-preserving):
  * the per-subject-per-patch Python loop (tools/preprocessing.py:79-84,
    O(2N*L) passes) is one vectorized fancy-index per hemisphere stack;
  * the GIFTI decode uses the stdlib reader (data.gifti), no nibabel;
  * the patch table comes from geometry.load_patch_table (shipped asset or
    any CSV), not a hardcoded relative path.

The framework's on-device path (ops.fused_patch_embed) makes this offline
step OPTIONAL — raw (2N, C, G) vertex arrays feed the model directly — but it
is kept for compatibility with reference-format datasets, and
``export_raw=True`` writes that raw format instead.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path

import numpy as np

from surface_vision_transformers_tpu.data import gifti
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.utils.config import _get


# Shipped dHCP recipe assets: subject-id/label CSVs and per-channel z-score
# stats for both tasks x both spaces, converted from the reference's data
# files (reference labels/dHCP/*, consumed at tools/preprocessing.py:51-56).
# Pure data (ids, ages in weeks, 4 floats per stat), not code.
SHIPPED_LABEL_DIR = (
    Path(__file__).resolve().parent.parent.parent / "assets" / "labels" / "dHCP"
)


def resolve_label_dir(label_path: str | os.PathLike, task: str) -> Path:
    """The label directory for the run: the configured path when it holds a
    ``{task}/`` subfolder, else the shipped dHCP assets — so the stock
    recipes run with zero extra user files. Falling back past a NON-empty
    configured path warns loudly: silently training on the shipped labels
    when the user pointed somewhere else would mask a misconfiguration."""
    if label_path:
        p = Path(label_path)
        if (p / task).exists() or not (SHIPPED_LABEL_DIR / task).exists():
            return p
        import warnings

        warnings.warn(
            f"data.label_path={str(p)!r} has no {task}/ subfolder; falling "
            f"back to the shipped assets at {str(SHIPPED_LABEL_DIR)!r}",
            stacklevel=2,
        )
    return SHIPPED_LABEL_DIR


def read_label_csv(path: str | os.PathLike) -> tuple[np.ndarray, np.ndarray]:
    """Read a reference label CSV with 'ids' and 'labels' columns."""
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    ids = np.array([r["ids"] for r in rows])
    labels = np.array([float(r["labels"]) for r in rows], np.float32)
    return ids, labels


def load_subject_hemispheres(
    data_path: str, configuration: str, subject_id: str, channels: int
) -> tuple[np.ndarray, np.ndarray]:
    """Load (C, V) metric arrays for both hemispheres of one subject; the id
    convention is '{sub}_{ses}' (reference tools/preprocessing.py:64-67)."""
    sub, ses = subject_id.split("_")[0], subject_id.split("_")[1]
    folder = Path(data_path) / f"regression_{configuration}_space_features"
    out = []
    for hemi in ("L", "R"):
        img = gifti.load(folder / f"sub-{sub}_ses-{ses}_{hemi}.shape.gii")
        out.append(np.asarray(img.agg_data())[:channels, :])
    return out[0], out[1]


def patchify_stack(
    vertex_data: np.ndarray, indices: np.ndarray
) -> np.ndarray:
    """(N, C, G) -> (N, C, L, V); threaded C++ gather when the native library
    is available (data.native), numpy fancy-indexing otherwise."""
    from surface_vision_transformers_tpu.data import native

    return native.gather_patches(vertex_data, indices)


def run(config: dict, *, export_raw: bool = False) -> dict:
    """Execute the ETL from a reference-schema preprocessing config dict."""
    ico = int(_get(config, "resolution.ico", 6))
    sub_ico = int(_get(config, "resolution.sub_ico", 2))
    configuration = _get(config, "data.configuration", "template")
    split = _get(config, "data.split", "train")
    channels = int(_get(config, "data.channels", 4))
    task = _get(config, "data.task", "scan_age")
    data_path = _get(config, "data.data_path")
    label_path = resolve_label_dir(_get(config, "data.label_path", ""), task)
    output_folder = _get(config, "output.folder").format(task, configuration)

    ids, labels = read_label_csv(Path(label_path) / task / f"{split}.csv")
    means = np.load(Path(label_path) / task / configuration / "means.npy")
    stds = np.load(Path(label_path) / task / configuration / "stds.npy")

    lefts, rights = [], []
    for sid in ids:
        l, r = load_subject_hemispheres(data_path, configuration, sid, channels)
        lefts.append(l)
        rights.append(r)
    # reference layout: all left hemispheres first, then all right
    # (tools/preprocessing.py:83-84)
    raw = np.stack(lefts + rights, axis=0).astype(np.float32)  # (2N, C, G)
    raw = (raw - means.reshape(1, channels, 1)) / stds.reshape(1, channels, 1)
    out_labels = np.concatenate([labels, labels])

    os.makedirs(output_folder, exist_ok=True)
    if export_raw:
        np.save(Path(output_folder) / f"{split}_raw.npy", raw)
    table = load_patch_table(ico, sub_ico)
    data = patchify_stack(raw, table.indices)
    np.save(Path(output_folder) / f"{split}_data.npy", data)
    np.save(Path(output_folder) / f"{split}_labels.npy", out_labels)
    return {
        "split": split,
        "shape": tuple(data.shape),
        "output_folder": str(output_folder),
        "n_subjects": int(ids.shape[0]),
    }
