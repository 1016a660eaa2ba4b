from surface_vision_transformers_tpu.geometry.icosphere import (
    generate_patch_table,
    icosahedron,
    icosphere,
    num_faces,
    num_vertices,
    patch_grid,
    remap_table_to_icosphere,
    subdivide,
)
from surface_vision_transformers_tpu.geometry.tables import (
    PatchTable,
    convert_csv_to_npz,
    load_patch_table,
    read_reference_csv,
)

__all__ = [
    "PatchTable",
    "convert_csv_to_npz",
    "generate_patch_table",
    "icosahedron",
    "icosphere",
    "load_patch_table",
    "num_faces",
    "num_vertices",
    "patch_grid",
    "read_reference_csv",
    "remap_table_to_icosphere",
    "subdivide",
]
