"""Patch lookup tables: loading, validation, and TPU-friendly layouts.

A patch table maps (patch, within-patch-vertex) -> global vertex id on the
full-resolution icosphere. The reference consumes these as CSV files with one
COLUMN per patch and one row per within-patch vertex (reference:
utils/triangle_indices_ico_6_sub_ico_{1,2}.csv, loaded with
pandas.read_csv at tools/preprocessing.py:74); we normalise to a row-per-patch
(num_patches, vertices_per_patch) int32 array and validate the geometric
invariants up front instead of trusting the asset.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from pathlib import Path

import numpy as np

from surface_vision_transformers_tpu.geometry import icosphere as _ics_import  # noqa: F401 (ensure module is loaded)
import sys as _sys

# `geometry/__init__` re-exports the `icosphere` *function* under the package
# attribute of the same name, so we grab the submodule via sys.modules.
ics = _sys.modules["surface_vision_transformers_tpu.geometry.icosphere"]

# Default search locations for table assets (first hit wins). The shipped
# `assets/` directory carries npz conversions of the reference's dHCP-ordering
# tables (data assets, see assets/README.md); a user can point SVT_TABLE_DIR
# anywhere.
_ASSET_DIR = Path(__file__).resolve().parent.parent.parent / "assets"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class PatchTable:
    """Validated patch lookup table for (ico, sub_ico).

    Attributes:
      indices: (num_patches, vertices_per_patch) int32, global vertex ids.
      ico: full mesh resolution (dHCP default 6 -> 40,962 vertices).
      sub_ico: patching grid resolution (faces of ico-sub_ico are patches).
    """

    indices: np.ndarray
    ico: int
    sub_ico: int
    # vertex-id ordering: 'atlas' (e.g. dHCP CSV/npz assets) or 'canonical'
    # (this framework's icosphere numbering, for generated tables). Geometry
    # built from geometry.icosphere (rotation/warp tables) only matches
    # 'canonical' tables.
    ordering: str = "atlas"

    @property
    def num_patches(self) -> int:
        return self.indices.shape[0]

    @property
    def vertices_per_patch(self) -> int:
        return self.indices.shape[1]

    @property
    def num_mesh_vertices(self) -> int:
        return ics.num_vertices(self.ico)

    def validate(self) -> "PatchTable":
        """Check the invariants the reference never asserts (SURVEY §C10):
        shape from the geometry formula, id range, full mesh coverage, and
        uniqueness of ids within each patch."""
        n_patches, n_per_patch = ics.patch_grid(self.ico, self.sub_ico)
        if self.indices.shape != (n_patches, n_per_patch):
            raise ValueError(
                f"table shape {self.indices.shape} != expected "
                f"{(n_patches, n_per_patch)} for ico={self.ico}, "
                f"sub_ico={self.sub_ico}"
            )
        total = self.num_mesh_vertices
        if self.indices.min() < 0 or self.indices.max() >= total:
            raise ValueError("vertex ids out of range")
        covered = np.unique(self.indices)
        if covered.size != total:
            raise ValueError(
                f"patches cover {covered.size} of {total} mesh vertices"
            )
        for p in range(n_patches):
            if np.unique(self.indices[p]).size != n_per_patch:
                raise ValueError(f"patch {p} has duplicate vertex ids")
        return self

    # TPU-friendly derived layouts --------------------------------------

    def flat_indices(self) -> np.ndarray:
        """(num_patches * vertices_per_patch,) int32 — for a single fused
        gather ``x[..., flat]`` followed by a reshape to (L, V)."""
        return np.ascontiguousarray(self.indices.reshape(-1))

    def padded_indices(self, lane_multiple: int = 128) -> np.ndarray:
        """(num_patches, pad(vertices_per_patch)) with padding slots pointing
        at vertex 0; used by kernels that need lane-aligned rows. Padded
        columns must be masked/ignored downstream."""
        v_pad = _round_up(self.vertices_per_patch, lane_multiple)
        out = np.zeros((self.num_patches, v_pad), dtype=np.int32)
        out[:, : self.vertices_per_patch] = self.indices
        return out


# Loaders ---------------------------------------------------------------


def read_reference_csv(path: str | os.PathLike) -> np.ndarray:
    """Read a reference-format table CSV (one column per patch, header row of
    patch ids) into a (num_patches, vertices_per_patch) int32 array."""
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    arr = np.empty((len(body), len(header)), dtype=np.int32)
    for r, row in enumerate(body):
        arr[r] = row
    return np.ascontiguousarray(arr.T)  # -> (patches, vertices)


def convert_csv_to_npz(
    csv_path: str | os.PathLike, npz_path: str | os.PathLike, ico: int, sub_ico: int
) -> PatchTable:
    """Convert a reference-format CSV into our validated npz asset format."""
    table = PatchTable(read_reference_csv(csv_path), ico, sub_ico).validate()
    np.savez_compressed(
        npz_path, indices=table.indices, ico=ico, sub_ico=sub_ico
    )
    return table


def _npz_name(ico: int, sub_ico: int) -> str:
    return f"patch_table_ico{ico}_sub{sub_ico}.npz"


def load_patch_table(
    ico: int = 6,
    sub_ico: int = 2,
    path: str | os.PathLike | None = None,
    generate_if_missing: bool = True,
) -> PatchTable:
    """Load the patch table for (ico, sub_ico).

    Search order:
      1. explicit ``path`` (.npz in our format or reference-format .csv);
      2. ``$SVT_TABLE_DIR`` then the shipped ``assets/`` directory for
         ``patch_table_ico{ico}_sub{sub_ico}.npz`` (dHCP atlas vertex order);
      3. if ``generate_if_missing``, generate canonically via
         :func:`geometry.icosphere.generate_patch_table` (our own vertex
         order — NOT dHCP-data compatible, fine for synthetic/new meshes).
    """
    if path is not None:
        p = Path(path)
        if p.suffix == ".csv":
            return PatchTable(read_reference_csv(p), ico, sub_ico).validate()
        with np.load(p) as z:
            return PatchTable(
                z["indices"], int(z["ico"]), int(z["sub_ico"])
            ).validate()

    search_dirs = []
    if os.environ.get("SVT_TABLE_DIR"):
        search_dirs.append(Path(os.environ["SVT_TABLE_DIR"]))
    search_dirs.append(_ASSET_DIR)
    for d in search_dirs:
        cand = d / _npz_name(ico, sub_ico)
        if cand.exists():
            with np.load(cand) as z:
                return PatchTable(
                    z["indices"], int(z["ico"]), int(z["sub_ico"])
                ).validate()

    if not generate_if_missing:
        raise FileNotFoundError(
            f"no patch table asset for ico={ico}, sub_ico={sub_ico} "
            f"(searched {[str(d) for d in search_dirs]})"
        )
    table, verts = ics.generate_patch_table(ico, sub_ico)
    table = ics.remap_table_to_icosphere(table, verts, ico)
    return PatchTable(table, ico, sub_ico, ordering="canonical").validate()
