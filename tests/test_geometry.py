"""Geometry invariants the reference never asserts (SURVEY §C10, §4)."""

import numpy as np
import pytest

from surface_vision_transformers_tpu import geometry as G


def test_icosphere_counts():
    for order in range(5):
        verts, faces = G.icosphere(order)
        assert verts.shape == (G.num_vertices(order), 3)
        assert faces.shape == (G.num_faces(order), 3)
        np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 1.0, atol=1e-12)


def test_patch_grid_formula():
    # the numbers the reference hardcodes in YAML
    # (config/SiT/training/hparams.yml:71-81)
    assert G.patch_grid(6, 0) == (20, 2145)
    assert G.patch_grid(6, 1) == (80, 561)
    assert G.patch_grid(6, 2) == (320, 153)
    # extension levels the reference is data-blocked on
    assert G.patch_grid(6, 3) == (1280, 45)
    assert G.patch_grid(7, 2) == (320, 561)


@pytest.mark.parametrize("ico,sub", [(3, 1), (4, 2), (5, 1)])
def test_generated_tables_validate(ico, sub):
    table, verts = G.generate_patch_table(ico, sub)
    remapped = G.remap_table_to_icosphere(table, verts, ico)
    G.PatchTable(remapped, ico, sub).validate()
    # remapped ids must address the canonical icosphere coordinates
    target_verts, _ = G.icosphere(ico)
    np.testing.assert_array_equal(
        np.asarray(target_verts)[remapped[0]], verts[table[0]]
    )


def test_generated_patch_vertices_lie_near_face(table_sub2=None):
    ico, sub = 4, 1
    table, verts = G.generate_patch_table(ico, sub)
    base_verts, base_faces = G.icosphere(sub)
    # every vertex of patch p is inside the spherical triangle of face p
    # (within tolerance): check via positive barycentric-style coords against
    # the face normal frame.
    for p in [0, 7, 41]:
        corners = np.asarray(base_verts)[base_faces[p]]
        pts = verts[table[p]]
        # solve pts ~ alpha*A + beta*B + gamma*C with alpha,beta,gamma >= -eps
        coef, *_ = np.linalg.lstsq(corners.T, pts.T, rcond=None)
        assert coef.min() > -1e-6


def test_reference_csv_tables_validate(reference_dir):
    for sub in (1, 2):
        arr = G.read_reference_csv(
            reference_dir / f"utils/triangle_indices_ico_6_sub_ico_{sub}.csv"
        )
        G.PatchTable(arr, 6, sub).validate()


def test_shipped_assets_match_reference(reference_dir):
    for sub in (1, 2):
        shipped = G.load_patch_table(6, sub)
        ref = G.read_reference_csv(
            reference_dir / f"utils/triangle_indices_ico_6_sub_ico_{sub}.csv"
        )
        np.testing.assert_array_equal(shipped.indices, ref)


def test_padded_indices():
    t = G.load_patch_table(6, 2)
    padded = t.padded_indices(128)
    assert padded.shape == (320, 256)
    np.testing.assert_array_equal(padded[:, :153], t.indices)
    assert (padded[:, 153:] == 0).all()


def test_validation_catches_corruption():
    t = G.load_patch_table(6, 2)
    bad = t.indices.copy()
    bad[0, 0] = bad[0, 1]  # duplicate within patch
    with pytest.raises(ValueError):
        G.PatchTable(bad, 6, 2).validate()
    bad = t.indices.copy()
    bad[bad == 40961] = 0  # drop coverage of the last vertex
    with pytest.raises(ValueError):
        G.PatchTable(bad, 6, 2).validate()
