"""Device mesh + sharding rules: the framework's scale-out layer.

The reference is strictly single-process / single-GPU (device bind at
tools/train.py:72; no torch.distributed anywhere — SURVEY §2). Here scale-out
is declarative GSPMD: a ``jax.sharding.Mesh`` with axes

    ('data', 'fsdp', 'model')

where the batch shards over ('data', 'fsdp') (pure DP uses data only), params
optionally shard over 'fsdp' (ZeRO-3 style) and/or 'model'
(Megatron-style tensor parallelism over QKV/MLP), and XLA inserts the
gradient all-reduces / all-gathers over ICI. Going multi-host or multi-slice
is a mesh-shape change, not a code change.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "model")



def batch_axes(mesh) -> tuple:
    """The mesh's batch axes, by the framework's ('data', 'fsdp') naming
    convention — the single source for every batch-sharding PartitionSpec."""
    return tuple(a for a in ("data", "fsdp") if a in dict(mesh.shape))


def make_mesh(
    data: int = -1, fsdp: int = 1, model: int = 1, pipe: int = 1, devices=None
) -> Mesh:
    """Build the ('data', 'fsdp', 'model'[, 'pipe']) mesh. ``data=-1``
    consumes all remaining devices. The 'pipe' axis (GPipe stage sharding,
    parallel/pipeline.py) is appended only when pipe > 1, so non-PP runs keep
    the three-axis shape every existing sharding rule was written for."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    rest = fsdp * model * pipe
    if data == -1:
        if n % rest:
            raise ValueError(
                f"{n} devices not divisible by fsdp*model*pipe={rest}"
            )
        data = n // rest
    if data * rest > n:
        raise ValueError(f"mesh {data}x{fsdp}x{model}x{pipe} > {n} devices")
    if data * rest < n:
        # legal (e.g. a pinned single-device baseline on a multi-chip host)
        # but never silent: idling hardware must be a visible choice
        import warnings

        warnings.warn(
            f"mesh {data}x{fsdp}x{model}x{pipe} uses {data * rest} of {n} "
            f"devices; set mesh_data=-1 to consume the rest",
            stacklevel=2,
        )
    devices = devices[: data * rest]
    if pipe > 1:
        arr = np.asarray(devices).reshape(data, fsdp, model, pipe)
        return Mesh(arr, AXES + ("pipe",))
    arr = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(arr, AXES)


def mesh_from_config(tpu_cfg, devices=None) -> Optional[Mesh]:
    """The product-path mesh: build ('data','fsdp','model') from the
    ``tpu.mesh_{data,fsdp,model}`` config keys (the public entry points run
    everything through this — a v5e-8 user gets 8-way DP from the default
    config with zero extra flags; reference equivalent: the single
    ``cuda:{gpu}`` bind at tools/train.py:72).

    Returns ``None`` when the run is single-device with no sharding
    requested, so the trivial case skips GSPMD entirely."""
    devices = list(devices if devices is not None else jax.devices())
    data = getattr(tpu_cfg, "mesh_data", -1)
    fsdp = getattr(tpu_cfg, "mesh_fsdp", 1)
    model = getattr(tpu_cfg, "mesh_model", 1)
    pipe = getattr(tpu_cfg, "mesh_pipe", 1)
    if (
        fsdp == 1 and model == 1 and pipe == 1
        and (data == -1 or data == 1) and len(devices) == 1
    ):
        return None
    return make_mesh(
        data=data, fsdp=fsdp, model=model, pipe=pipe, devices=devices
    )


def batch_pspec(ndim: int) -> P:
    """Batch arrays shard their leading dim over ('data', 'fsdp')."""
    return P(("data", "fsdp"), *([None] * (ndim - 1)))


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, batch_pspec(x.ndim)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- parameter sharding rules -------------------------------------------------

# Megatron-style TP: QKV and MLP-in shard their OUTPUT features; the
# out-projection and MLP-out shard their INPUT features, so each layer does
# one all-reduce per residual branch.
_TP_RULES: list[tuple[str, P]] = [
    ("to_qkv/kernel", P(None, "model")),
    ("to_out/kernel", P("model", None)),
    ("fc1/kernel", P(None, "model")),
    ("fc1/bias", P("model")),
    ("fc2/kernel", P("model", None)),
    ("to_original/kernel", P(None, "model")),
    ("to_original/bias", P("model")),
]


def _path_str(keypath) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)


def param_pspec(
    keypath, leaf, *, tp: bool, fsdp_size: int
) -> P:
    """PartitionSpec for one parameter."""
    path = _path_str(keypath)
    spec = [None] * np.ndim(leaf)
    if tp:
        for suffix, rule in _TP_RULES:
            if path.endswith(suffix):
                spec = list(rule) + [None] * (np.ndim(leaf) - len(rule))
                break
    if fsdp_size > 1:
        # ZeRO-3: shard the largest still-unsharded, divisible axis
        dims = sorted(
            range(np.ndim(leaf)), key=lambda d: -np.shape(leaf)[d]
        )
        for d in dims:
            if spec[d] is None and np.shape(leaf)[d] % fsdp_size == 0 and np.shape(leaf)[d] >= 2 * fsdp_size:
                spec[d] = "fsdp"
                break
    return P(*spec)


def params_pspecs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec tree for a param pytree under this mesh."""
    tp = mesh.shape["model"] > 1
    fsdp_size = mesh.shape["fsdp"]
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: param_pspec(kp, leaf, tp=tp, fsdp_size=fsdp_size), params
    )


def params_shardings(params: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), params_pspecs(params, mesh)
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh per the TP/FSDP rules."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s), params, params_shardings(params, mesh)
    )


def state_shardings(state: Any, params: Any, mesh: Mesh) -> Any:
    """Shardings for a full TrainState: params + matching optimizer moments
    (optax mu/nu/momentum buffers mirror the param tree, so their leaf paths
    end with the param's path), scalars/PRNG replicated."""
    pspecs = params_pspecs(params, mesh)
    path_to_spec: dict[str, P] = {}
    for (kp, _), (_, spec) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(
            pspecs, is_leaf=lambda x: isinstance(x, P)
        )[0],
    ):
        path_to_spec["/" + _path_str(kp)] = spec
    replicated_sh = NamedSharding(mesh, P())
    sharding_cache = {P(): replicated_sh}

    def spec_for(kp, leaf):
        if np.ndim(leaf) == 0:
            return replicated_sh
        path = "/" + _path_str(kp)
        # optimizer-state paths are '<wrapper fields>/<param path>'; exact
        # param paths match themselves
        for ppath, spec in path_to_spec.items():
            if path.endswith(ppath):
                if spec not in sharding_cache:
                    sharding_cache[spec] = NamedSharding(mesh, spec)
                return sharding_cache[spec]
        return replicated_sh

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Place a full TrainState onto the mesh: params + optimizer moments per
    the TP/FSDP rules, everything else replicated."""
    shardings = state_shardings(state, state.params, mesh)
    return jax.tree.map(jax.device_put, state, shardings)
