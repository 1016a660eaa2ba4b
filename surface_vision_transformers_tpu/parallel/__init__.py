from surface_vision_transformers_tpu.parallel.mesh import (
    AXES,
    batch_pspec,
    make_mesh,
    mesh_from_config,
    param_pspec,
    params_pspecs,
    params_shardings,
    shard_batch,
    shard_params,
    shard_state,
    batch_axes,
    state_shardings,
)
from surface_vision_transformers_tpu.parallel.multihost import (
    initialize_multihost,
    local_batch_to_global,
)
from surface_vision_transformers_tpu.parallel.pipeline import (
    pipe_size,
    pipeline_loss,
)

__all__ = [
    "AXES",
    "batch_pspec",
    "make_mesh",
    "mesh_from_config",
    "param_pspec",
    "params_pspecs",
    "params_shardings",
    "shard_batch",
    "shard_params",
    "shard_state",
    "batch_axes",
    "state_shardings",
    "initialize_multihost",
    "local_batch_to_global",
    "pipe_size",
    "pipeline_loss",
]
