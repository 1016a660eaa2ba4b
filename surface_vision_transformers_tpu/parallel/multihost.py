"""Multi-host (multi-process) readiness: process init + per-process feed.

The reference is strictly single-process (device bind at reference
tools/train.py:72, no torch.distributed anywhere — SURVEY §2). The TPU-native
multi-host model is SPMD: every host runs the same program over the devices it
can see, ``jax.distributed.initialize`` wires the processes into one runtime,
the ``Mesh`` spans ``jax.devices()`` (all processes), and each host feeds only
its local shard of every batch via
``jax.make_array_from_process_local_data`` — XLA's GSPMD partitioner then
compiles exactly the same program it compiles single-host, with ICI/DCN
collectives inserted at the mesh-axis boundaries.

Launch (one command per host; on Cloud TPU pods the coordinator/process env
is injected by the runtime and ``initialize()`` needs no arguments)::

    python -m surface_vision_transformers_tpu.cli.train config.yml --multihost

Everything here is process-count agnostic: on one process it degrades to
no-ops, which is how the fake-8-device CPU tests exercise it.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from surface_vision_transformers_tpu.parallel.mesh import batch_pspec


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join the multi-process JAX runtime. Arguments default to the
    TPU-pod/launcher environment (``jax.distributed.initialize`` auto-detects
    on Cloud TPU; set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID for manual launches). Safe to call when already
    initialized or single-process. Returns ``jax.process_index()``."""
    if jax.process_count() > 1:
        return jax.process_index()  # already initialized by the launcher
    want_init = (
        coordinator_address is not None
        or num_processes is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")  # Cloud TPU pod slice
    )
    if want_init:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError:
            pass  # already initialized
    return jax.process_index()


def process_local_slice(n_global: int, *, process_index=None, process_count=None):
    """(start, stop) of this process's contiguous sample range when a
    host-resident dataset of ``n_global`` samples is split evenly (remainder
    to the leading processes) across processes."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_global, pc)
    start = pi * base + min(pi, rem)
    return start, start + base + (1 if pi < rem else 0)

def local_batch_to_global(x: np.ndarray, mesh: Mesh, n_global: int) -> jax.Array:
    """Assemble a globally-sharded batch array from this process's local
    rows (`jax.make_array_from_process_local_data`, the SURVEY §5
    multi-host-feed commitment). ``x`` holds only the rows this process owns
    (its ``process_local_slice`` of the ``n_global``-row batch, in order);
    single-process it is the whole batch and this is a plain device_put."""
    sharding = NamedSharding(mesh, batch_pspec(x.ndim))
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    global_shape = (n_global,) + tuple(x.shape[1:])
    return jax.make_array_from_process_local_data(sharding, x, global_shape)
