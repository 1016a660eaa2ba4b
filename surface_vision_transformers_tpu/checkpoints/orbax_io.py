"""Orbax checkpointing: resumable training state, not just weights.

The reference saves bare ``state_dict``s on best-val (tools/train.py:361-363)
and, for pretraining, dicts with epoch/optimizer state it never reads back
(tools/pretrain.py:378-389 — there is no resume path, SURVEY §5). Here a
checkpoint is the full TrainState (params, optimizer state, step, PRNG key)
plus metadata (epoch, best metric), and ``restore`` resumes exactly.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path) -> str:
    return str(Path(path).resolve())


def fetch_tree(tree: Any) -> Any:
    """Device->host copy of a pytree with PIPELINED transfers: start the
    async host copy of every leaf first, then materialize. Leaf-by-leaf
    ``np.asarray`` pays one relay round-trip per array (~60 ms x ~130
    leaves ≈ 8 s per checkpoint on this host); pipelined it is ~one."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for leaf in leaves:
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:  # non-addressable/committed arrays: sync path
                pass
    return jax.tree_util.tree_unflatten(
        treedef,
        [np.asarray(l) if isinstance(l, jax.Array) else l for l in leaves],
    )


def save_state(path: str | os.PathLike, state: Any, metadata: dict | None = None):
    """Save a pytree (e.g. TrainState) + JSON metadata to ``path``."""
    path = Path(_abs(path))
    # hand orbax a host tree: its own per-leaf device fetches serialize on
    # the relay (see fetch_tree)
    state = fetch_tree(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", state, force=True)
    if metadata is not None:
        with open(path / "metadata.json", "w") as f:
            json.dump(metadata, f)


def restore_state(path: str | os.PathLike, template: Any) -> tuple[Any, dict]:
    """Restore a pytree saved by save_state; template supplies the structure
    (an abstract or concrete TrainState). Returns (state, metadata)."""
    path = Path(_abs(path))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path / "state", template)
    meta_file = path / "metadata.json"
    metadata = {}
    if meta_file.exists():
        metadata = json.loads(meta_file.read_text())
    return state, metadata


def save_params_npz(path: str | os.PathLike, params: Any) -> None:
    """Portable flat-npz export of a param tree (no orbax needed to read)."""
    params = fetch_tree(params)
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str | os.PathLike) -> dict:
    """Inverse of save_params_npz: nested dict keyed by path segments."""
    out: dict = {}
    with np.load(path) as z:
        for name in z.files:
            parts = name.split("/")
            cur = out
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = z[name]
    return out
