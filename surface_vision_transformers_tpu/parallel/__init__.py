from surface_vision_transformers_tpu.parallel.mesh import (
    AXES,
    batch_pspec,
    make_mesh,
    param_pspec,
    params_pspecs,
    params_shardings,
    shard_batch,
    shard_params,
    state_shardings,
)

__all__ = [
    "AXES",
    "batch_pspec",
    "make_mesh",
    "param_pspec",
    "params_pspecs",
    "params_shardings",
    "shard_batch",
    "shard_params",
    "state_shardings",
]
