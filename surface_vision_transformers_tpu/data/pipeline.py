"""Input pipelines: device-resident (default) and host-streaming datasets.

The default training path keeps the whole dataset in HBM and scans epochs on
device (dHCP-scale data is a few hundred MB — SURVEY §6). For datasets that
exceed HBM (e.g. UKB-scale surfaces or ico-7 meshes), ``StreamingLoader``
iterates shuffled, padded batches from host memory (plain arrays or np.memmap)
with double-buffered async ``device_put`` so the H2D copy of batch k+1
overlaps the compute of batch k. The reference's equivalent is a
torch DataLoader with 16 worker processes (reference: tools/train.py:112-122);
here the loader is zero-copy from memmaps and the overlap comes from XLA's
async dispatch rather than worker processes.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StreamingLoader:
    """Shuffled, weight-padded batch iterator with async device placement.

    Yields (batch, targets, weights) device arrays; the last partial batch is
    padded with weight-0 samples (same convention as the on-device epoch
    scan, so metrics and gradient scales are identical).
    """

    def __init__(
        self,
        data: np.ndarray,
        targets: Optional[np.ndarray] = None,
        *,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        sharding=None,
        mesh=None,
        drop_remainder: bool = False,
    ):
        if targets is not None and data.shape[0] != targets.shape[0]:
            raise ValueError(
                f"{data.shape[0]} samples vs {targets.shape[0]} targets"
            )
        self.data = data
        self.targets = targets
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.sharding = sharding
        self.mesh = mesh  # batch-shard over the mesh's data axes; multi-host
        # aware (each process feeds only its process_local_slice of every
        # batch via make_array_from_process_local_data)
        self.drop_remainder = drop_remainder
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Align the shuffle stream with a given epoch index — resumed runs
        call this with their start epoch so the continued trajectory sees the
        same batch permutations the uninterrupted run would have."""
        self._epoch = int(epoch)

    @property
    def num_samples(self) -> int:
        return self.data.shape[0]

    def steps_per_epoch(self) -> int:
        n = self.num_samples
        return n // self.batch_size if self.drop_remainder else math.ceil(
            n / self.batch_size
        )

    def _put(self, arr: np.ndarray, *, batched: bool = True) -> jax.Array:
        if self.mesh is not None:
            from surface_vision_transformers_tpu.parallel import (
                local_batch_to_global,
            )
            from surface_vision_transformers_tpu.parallel.multihost import (
                process_local_slice,
            )

            n_global = arr.shape[0]
            shape = dict(self.mesh.shape)
            n_shards = shape.get("data", 1) * shape.get("fsdp", 1)
            if n_global % n_shards:
                # batch doesn't divide the data axes: place replicated; the
                # consumer's with_sharding_constraint still shards compute
                # (GSPMD pads uneven shards internally)
                return jnp.asarray(arr)
            if batched and jax.process_count() > 1:
                start, stop = process_local_slice(n_global)
                arr = arr[start:stop]
            return local_batch_to_global(arr, self.mesh, n_global)
        if self.sharding is not None:
            return jax.device_put(arr, self.sharding)
        return jnp.asarray(arr)

    def _rows(self, source, idx) -> np.ndarray:
        """Contiguous float32 rows from a plain array or np.memmap (the cast
        is per batch, so an on-disk f64/f16 dataset never materializes).
        Routed through the threaded C++ gather (native.gather_rows) when the
        library is built — numpy fancy indexing on a memmap is serial."""
        if source.dtype in (np.float32, np.float64, np.float16) and source.ndim > 1:
            from surface_vision_transformers_tpu.data import native

            return native.gather_rows(source, idx)
        rows = np.ascontiguousarray(source[idx])
        if rows.dtype not in (np.float32, np.dtype("bfloat16")):
            rows = rows.astype(np.float32)
        return rows

    def __iter__(self) -> Iterator[tuple]:
        n = self.num_samples
        bs = self.batch_size
        order = np.arange(n)
        if self.shuffle:
            # numpy RNG (not jax.random): the permutation happens on host
            # where the data lives; deterministic across processes so every
            # multi-host participant computes the SAME global batch order
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        steps = self.steps_per_epoch()
        pending = None
        for s in range(steps):
            idx = order[s * bs : (s + 1) * bs]
            w = np.ones(bs, np.float32)
            if idx.size < bs:
                w[idx.size :] = 0.0
                idx = np.concatenate([idx, np.zeros(bs - idx.size, idx.dtype)])
            batch = self._put(self._rows(self.data, idx))
            tgt = (
                self._put(self._rows(self.targets, idx))
                if self.targets is not None
                else None
            )
            wd = self._put(w)
            # double buffer: hold one prepared batch so the H2D copy of the
            # next batch overlaps the consumer's compute on the current one
            if pending is not None:
                yield pending
            pending = (batch, tgt, wd)
        if pending is not None:
            yield pending
