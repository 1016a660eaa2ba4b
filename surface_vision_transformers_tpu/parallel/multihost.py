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


_PROBE_WARNED = False


def _backends_are_initialized() -> bool:
    """True if any XLA backend is already live. JAX has no public probe that
    doesn't itself initialize a backend (jax.devices() would), so this tries
    the private helper (present in jax 0.4.x-0.9.x) and FAILS OPEN: without
    it we skip the refuse-late-init guard and rely on
    ``jax.distributed.initialize``'s own ordering error. The degradation is
    announced once rather than silent, so a JAX upgrade that removes the
    helper surfaces here instead of as a behavior change."""
    global _PROBE_WARNED
    try:
        from jax._src import xla_bridge as _xb  # no public equivalent

        return bool(_xb.backends_are_initialized())
    except Exception:
        if not _PROBE_WARNED:
            _PROBE_WARNED = True
            import warnings

            warnings.warn(
                "jax._src.xla_bridge.backends_are_initialized is unavailable "
                f"under jax {jax.__version__}; the refuse-late-init guard in "
                "initialize_multihost is disabled (multi-process init errors "
                "will come from jax.distributed.initialize itself)",
                RuntimeWarning,
                stacklevel=2,
            )
        return False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join the multi-process JAX runtime. MUST run before anything touches
    the XLA backend (``cli._common`` calls it before importing the runner).

    Arguments default to the launcher environment:
    ``jax.distributed.initialize`` auto-detects Cloud TPU pods / SLURM; for
    manual launches set JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES and
    JAX_PROCESS_ID (read here and forwarded — JAX itself only knows the
    first). No-op when nothing requests multi-process. Returns
    ``jax.process_index()``."""
    if jax.distributed.is_initialized():
        # already initialized (public check; does not touch the local
        # backend, which would make initialize() below impossible)
        return jax.process_index()
    env = os.environ
    coordinator_address = coordinator_address or env.get(
        "JAX_COORDINATOR_ADDRESS"
    ) or env.get("COORDINATOR_ADDRESS")
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    explicit = coordinator_address is not None or num_processes is not None
    if explicit and _backends_are_initialized():
        # degrading to single-process here would silently train a wrong
        # global batch on every host — refuse instead
        raise RuntimeError(
            "initialize_multihost was given a multi-process configuration "
            "but the XLA backend is already initialized; call it (or pass "
            "--multihost) before any other JAX use"
        )
    if explicit or (
        env.get("TPU_WORKER_HOSTNAMES")  # Cloud TPU pod slice auto-detect
        and not _backends_are_initialized()
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
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
