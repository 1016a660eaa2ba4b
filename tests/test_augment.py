"""Rotation/warp augmentation tests (new capability; BASELINE config 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_vision_transformers_tpu.data.augment import SurfaceAugment
from surface_vision_transformers_tpu.geometry import load_patch_table, rotations as rot
from surface_vision_transformers_tpu.geometry.icosphere import icosphere
from surface_vision_transformers_tpu.ops import patchify

ICO = 3  # G = 642: fast tests


def test_rotation_group_properties():
    mats = rot.icosahedral_rotation_group()
    assert mats.shape == (60, 3, 3)
    # all proper rotations
    for R in mats:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0.99
    # closed under composition (tolerance match)
    prod = mats[3] @ mats[7]
    assert min(np.abs(prod - R).max() for R in mats) < 1e-9


def test_exact_permutations_are_permutations():
    perms = rot.exact_rotation_permutations(ICO)
    G = perms.shape[1]
    for r in (0, 13, 59):
        assert np.unique(perms[r]).size == G
    # group property: data is preserved under any perm + its inverse partner
    verts, _ = icosphere(ICO)
    verts = np.asarray(verts)
    mats = rot.icosahedral_rotation_group()
    # check geometric consistency: verts[perm[r, i]] == R^T verts[i]
    r = 5
    np.testing.assert_allclose(
        verts[perms[r]], verts @ mats[r], atol=1e-9
    )


def test_barycentric_table_identity_and_smoothness():
    # identity rotation -> exact identity table
    idx, w = rot.barycentric_resample_table(ICO, np.eye(3))
    vals = np.random.default_rng(0).standard_normal(642).astype(np.float32)
    out = (vals[idx] * w).sum(-1)
    np.testing.assert_allclose(out, vals, atol=1e-5)

    # small rotation of a smooth function ~ analytic rotation of the field
    verts = np.asarray(icosphere(ICO)[0])
    R = rot.random_rotation_matrix(np.random.default_rng(1), 10.0)
    field = verts[:, 0] ** 2 + 0.5 * verts[:, 1]  # smooth on the sphere
    idx, w = rot.barycentric_resample_table(ICO, R)
    resampled = (field[idx] * w).sum(-1)
    truth = ((verts @ R)[:, 0] ** 2 + 0.5 * (verts @ R)[:, 1])
    assert np.abs(resampled - truth).max() < 0.02  # interpolation error only


def test_augment_raw_and_patched_agree():
    """Augmenting raw vertices then patchifying == augmenting pre-patched."""
    table = load_patch_table(ICO, 1)  # canonical ordering (generated)
    aug_raw = SurfaceAugment(ico=ICO, patch_table=table.indices, num_warps=2,
                             warp_prob=1.0, seed=0)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 642))

    out_raw = aug_raw(key, x)  # (4, 2, 642)
    patched_then = np.asarray(patchify(out_raw, table.indices))  # (4, L, V*C)

    x4 = np.asarray(patchify(x, table.indices)).reshape(4, 80, -1, 2)
    x4 = jnp.asarray(x4.transpose(0, 3, 1, 2))  # (4, 2, L, V)
    out_patched = aug_raw(key, x4)
    flat = np.asarray(out_patched).transpose(0, 2, 3, 1).reshape(4, 80, -1)
    np.testing.assert_allclose(patched_then, flat, atol=1e-5)


def test_warp_per_batch_uses_one_table():
    """warp_per_batch=True: every warped sample in a batch comes from the
    SAME warp table (one of the K per-sample results), unwarped samples
    are untouched, and the config key threads through."""
    from surface_vision_transformers_tpu.utils.config import from_dict

    exp = from_dict({
        "resolution": {"ico": 6, "sub_ico": 2},
        "transformer": {"dim": 32, "depth": 1, "heads": 2, "mlp_dim": 64,
                        "dim_head": 16},
        "augmentation": {"enabled": True, "warp_per_batch": True},
    })
    assert exp.augment.warp_per_batch is True

    kw = dict(ico=ICO, exact_rotations=False, num_warps=3, warp_prob=0.7,
              seed=1)
    aug_pb = SurfaceAugment(warp_per_batch=True, **kw)
    aug_ps = SurfaceAugment(warp_per_batch=False, **kw)
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 2, 642))
    out_pb = np.asarray(aug_pb(key, x))
    xr = np.asarray(x)  # no rotations -> base is the input itself

    # each per-sample row either equals the input (warp off) or equals ONE
    # table's warp of it; per-batch output must use a single table for all
    # warped rows
    per_table = [
        np.asarray(sum(
            jnp.take(x, jnp.asarray(aug_ps._warp_idx[k, :, j]), axis=2)
            * jnp.asarray(aug_ps._warp_w[k, :, j], x.dtype)
            for j in range(3)
        ))
        for k in range(3)
    ]
    used = set()
    for i in range(6):
        if np.allclose(out_pb[i], xr[i], atol=1e-6):
            continue
        matches = [k for k in range(3)
                   if np.allclose(out_pb[i], per_table[k][i], atol=1e-5)]
        assert matches, i
        used.add(matches[0])
    assert len(used) == 1, used  # one shared table per batch


def _per_table_warps(aug, x):
    """Reference per-table warp of the FULL batch (3 static gathers each)."""
    return [
        np.asarray(sum(
            jnp.take(x, jnp.asarray(aug._warp_idx[k, :, j]), axis=2)
            * jnp.asarray(aug._warp_w[k, :, j], x.dtype)
            for j in range(3)
        ))
        for k in range(aug.num_warps)
    ]


def test_quota_exact_count_and_even_split():
    """warp_assign='quota' (the default law): EXACTLY round(warp_prob*B)
    samples warp on every step, split base+(k<rem) across the K tables —
    the exact-count trade the reference itself makes for MPP masking
    (reference models/mpp.py:25-39)."""
    B, K, p = 10, 3, 0.7  # m_on = 7 -> counts [3, 2, 2] (rem path)
    aug = SurfaceAugment(ico=ICO, exact_rotations=False, num_warps=K,
                         warp_prob=p, warp_assign="quota", seed=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 2, 642))
    per_table = _per_table_warps(aug, x)
    xr = np.asarray(x)
    m_on = round(p * B)
    base, rem = divmod(m_on, K)
    expect_counts = [base + (k < rem) for k in range(K)]
    for trial in range(5):
        out = np.asarray(aug(jax.random.PRNGKey(100 + trial), x))
        counts = [0] * K
        n_unwarped = 0
        for b in range(B):
            if np.allclose(out[b], xr[b], atol=1e-6):
                n_unwarped += 1
                continue
            ms = [k for k in range(K)
                  if np.allclose(out[b], per_table[k][b], atol=1e-5)]
            assert len(ms) == 1, (b, ms)
            counts[ms[0]] += 1
        assert n_unwarped == B - m_on, (trial, n_unwarped)
        assert counts == expect_counts, (trial, counts)


def test_quota_multinomial_marginals_agree():
    """The quota law keeps the per-sample marginal P(warp)=warp_prob and the
    per-(sample, table) marginal warp_prob/K of the pre-r4 'multinomial'
    law; only the joint law changes (exact counts)."""
    B, K, p = 8, 2, 0.5  # p*B integer -> quota marginal is exactly p
    n_trials = 150
    freqs = {}
    for law in ("quota", "multinomial"):
        aug = SurfaceAugment(ico=ICO, exact_rotations=False, num_warps=K,
                             warp_prob=p, warp_assign=law, seed=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 2, 642))
        per_table = _per_table_warps(aug, x)
        xr = np.asarray(x)
        warp_n = np.zeros(B)
        table_n = np.zeros(K)
        for t in range(n_trials):
            out = np.asarray(aug(jax.random.PRNGKey(1000 + t), x))
            for b in range(B):
                if np.allclose(out[b], xr[b], atol=1e-6):
                    continue
                warp_n[b] += 1
                ms = [k for k in range(K)
                      if np.allclose(out[b], per_table[k][b], atol=1e-5)]
                table_n[ms[0]] += 1
        freqs[law] = (warp_n / n_trials, table_n / (n_trials * B))
    for law, (wf, tf) in freqs.items():
        np.testing.assert_allclose(wf, p, atol=0.14, err_msg=law)
        np.testing.assert_allclose(tf, p / K, atol=0.1, err_msg=law)


def test_identity_skip_matches_ostacked_select():
    """The r4 identity-skip rotation select (identity orientation reuses the
    block-gather result; others where-select in) is BITWISE-equal to the
    pre-r4 law: every orientation through the exact one-hot GEMM, O-stacked,
    then take_along_axis."""
    from surface_vision_transformers_tpu.ops.exact_move import exact_linear_move

    table = load_patch_table(ICO, 1)  # canonical ordering (generated)
    aug = SurfaceAugment(ico=ICO, patch_table=table.indices, num_warps=0,
                         seed=0)
    assert aug._structured is not None
    rot_patch, orient_id, orients = aug._structured
    O, V = orients.shape
    raw = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4, 2, 642)))
    x4 = jnp.asarray(raw[:, :, np.asarray(table.indices)])  # (4, 2, L, V)
    key = jax.random.PRNGKey(7)
    fast = np.asarray(aug._apply_structured(key, x4))

    k_rot, _, _ = jax.random.split(key, 3)
    r = jax.random.randint(k_rot, (4,), 0, rot_patch.shape[0])
    pidx = jnp.take(jnp.asarray(rot_patch), r, axis=0)
    xg = jnp.take_along_axis(x4, pidx[:, None, :, None], axis=2,
                             mode="promise_in_bounds")
    ys = []
    for o in range(O):
        onehot = np.zeros((V, V), np.float32)
        onehot[orients[o], np.arange(V)] = 1.0
        oh16 = jnp.asarray(onehot, jnp.bfloat16)
        ys.append(exact_linear_move(
            xg,
            lambda planes, _oh=oh16: jnp.einsum(
                "bclv,vw->bclw", planes, _oh,
                preferred_element_type=jnp.float32,
            ),
        ))
    stacked = jnp.stack(ys)  # (O, B, C, L, V)
    osel = jnp.take(jnp.asarray(orient_id), r, axis=0)  # (B, L)
    old = jnp.take_along_axis(
        stacked, osel[None, :, None, :, None], axis=0,
        mode="promise_in_bounds",
    )[0]
    np.testing.assert_array_equal(fast, np.asarray(old))


def test_augment_preserves_statistics():
    aug = SurfaceAugment(ico=ICO, num_warps=0, warp_prob=0.0, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2, 642))
    out = aug(jax.random.PRNGKey(1), x)
    # exact rotations only permute: per-sample sets of values are identical
    for b in range(8):
        np.testing.assert_allclose(
            np.sort(np.asarray(out[b, 0])), np.sort(np.asarray(x[b, 0])),
            atol=0,
        )


def test_augmented_training_runs():
    from surface_vision_transformers_tpu.data import make_regression_dataset
    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict
    import tempfile

    raw = {
        "resolution": {"ico": 3, "sub_ico": 1},
        "transformer": {"dim": 16, "depth": 1, "heads": 2, "mlp_dim": 32,
                        "dim_head": 8},
        "training": {"LR": 1e-3, "bs": 8, "epochs": 2, "val_epoch": 1},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32"},
        "augmentation": {"enabled": True, "num_warps": 2, "warp_prob": 0.5},
    }
    exp = from_dict(raw)
    # raw-vertex dataset so both patchify and augmentation run on device
    data, labels = make_regression_dataset(
        24, raw_vertices=642, num_channels=4, label_range=(-1, 1), seed=0
    )
    with tempfile.TemporaryDirectory() as td:
        res = runner.run_training(
            exp, datasets={"train": (data[:16], labels[:16]),
                           "validation": (data[16:], labels[16:])},
            run_root=td, progress=False,
        )
    assert res["training_finished"] and np.isfinite(res["best_mae"])


def test_structured_rotation_matches_general_gather():
    """The patch-block + orientation-GEMM rotation path (the TPU fast path:
    93 -> ~8 ms at B=256) must be BITWISE-equal to the general flattened
    gather — one-hot matmuls move exact values."""
    table = load_patch_table(ICO, 1)  # canonical ordering (generated)
    aug = SurfaceAugment(ico=ICO, patch_table=table.indices, num_warps=0,
                         seed=0)
    assert aug._structured is not None
    rot_patch, orient_id, orients = aug._structured
    assert orients.shape[0] <= 16  # orientations collapse on canonical tables

    L, V = table.indices.shape
    # CONSISTENT patched data (border slots duplicate their vertex): the two
    # paths read a duplicated vertex from different (equal-valued) slots
    raw = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4, 2, 642)))
    x4 = jnp.asarray(raw[:, :, np.asarray(table.indices)])  # (4, 2, L, V)
    key = jax.random.PRNGKey(5)
    fast = aug._apply_structured(key, x4)
    general = aug._apply(
        key, x4.reshape(4, 2, -1), jnp.asarray(aug._perms_patched), None, None
    ).reshape(4, 2, L, V)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(general))


def test_structured_tables_absent_for_atlas_ordering():
    """The shipped dHCP tables use the authors' arbitrary within-patch
    order; the structured decomposition must detect that and fall back to
    the general gather (only reachable with the matching sphere anyway)."""
    import pytest as _pytest

    dhcp = load_patch_table(6, 2)  # shipped atlas-ordered asset
    if dhcp.ordering == "canonical":
        _pytest.skip("no atlas asset available")
    sphere = np.asarray  # the atlas path needs sphere coords; build tables
    # directly from the canonical icosphere against the ATLAS table: the
    # rotation perms are in canonical numbering so patches don't map
    aug = SurfaceAugment(ico=6, patch_table=dhcp.indices, num_warps=0,
                         seed=0)
    assert aug._structured is None
