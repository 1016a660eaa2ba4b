"""Compiled serving artifacts: the serving step as a jax.export blob.

Rebuilds the reference's deployment entry point (reference
tools/testing.py:53-101 — load a checkpoint, run batched inference) as a
TPU-native COMPILED artifact: the fused bf16/int8 serving forward with the
weights baked in as constants, serialized via ``jax.export`` (StableHLO +
Mosaic custom-call payloads for the megakernels). The artifact loads and
runs WITHOUT this framework installed — only ``jax`` is needed:

    from jax import export
    rt = export.deserialize(open("serve_B8.jaxexport", "rb").read())
    logits = rt.call(x)            # x: (8, C, V) in the recorded dtype

``export_serving`` writes one blob per (static) batch size plus a
standalone ``loader.py`` and a ``meta.json`` describing shapes/dtypes and
the numerics mode. Exports are platform-locked: a blob exported on TPU
embeds TPU Mosaic kernels and only runs on TPU; export with ``fused=False``
for a pure-XLA artifact that any backend can serve (CPU tier tests use
this; it is also the safe cross-version choice — StableHLO is the
compatibility surface, Mosaic payloads track the exporting jax).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_LOADER = '''\
"""Standalone serving-artifact loader — needs ONLY jax (no framework).

    from loader import load
    fn, meta = load(batch_size=8)
    logits = fn(x)   # x: meta["input_shape"] in meta["input_dtype"]

Self-check: ``python loader.py [batch_size]`` runs the artifact on zeros.
"""

import json
import pathlib

import jax.numpy as jnp
from jax import export

_DIR = pathlib.Path(__file__).resolve().parent


def load(batch_size):
    meta = json.loads((_DIR / "meta.json").read_text())
    b = str(batch_size)
    if b not in meta["batch_sizes"]:
        raise ValueError(
            f"no artifact for batch size {batch_size}; "
            f"available: {sorted(meta['batch_sizes'])}"
        )
    m = meta["batch_sizes"][b]
    rt = export.deserialize((_DIR / m["file"]).read_bytes())
    info = dict(meta, input_shape=m["input_shape"])
    return rt.call, info


if __name__ == "__main__":
    import sys

    meta = json.loads((_DIR / "meta.json").read_text())
    bs = sys.argv[1] if len(sys.argv) > 1 else min(
        meta["batch_sizes"], key=int
    )
    fn, info = load(bs)
    x = jnp.zeros(info["input_shape"], jnp.dtype(info["input_dtype"]))
    y = fn(x)
    print(f"B={bs}: {x.shape} {x.dtype} -> {y.shape} {y.dtype}  OK")
'''


def make_serving_fn(model, params, *, quant: str | None = None,
                    scan_blocks: bool = False, fused: bool | None = None):
    """The serving forward as ``fn(x) -> logits`` with ``params`` closed
    over (bakes into constants under jax.export). ``fused=None`` picks the
    megakernel path on TPU and the modular XLA path elsewhere; int8 obeys
    the measured crossover (dim >= fused_mssit.INT8_MIN_DIM) like the
    trainer does."""
    from surface_vision_transformers_tpu.models import MSSiT, SiT
    from surface_vision_transformers_tpu.models.fused_mssit import INT8_MIN_DIM

    if fused is None:
        fused = jax.default_backend() == "tpu"
    variables = {"params": params}
    if quant == "int8" and isinstance(model, SiT) and model.dim < INT8_MIN_DIM:
        quant = None  # measured wash below the crossover (docs/design.md)
    if quant is not None and not fused:
        raise ValueError("quant serving requires the fused (TPU) path")

    if fused and isinstance(model, MSSiT):
        from surface_vision_transformers_tpu.models.fused_mssit import (
            fused_mssit_forward,
        )

        def fn(x):
            return fused_mssit_forward(model, variables, x, quant=quant,
                                       scan_blocks=scan_blocks)
    elif fused:
        from surface_vision_transformers_tpu.models.fused import fused_forward

        def fn(x):
            return fused_forward(model, variables, x, quant=quant,
                                 scan_blocks=scan_blocks)
    else:

        def fn(x):
            return model.apply(variables, x)

    return fn, ("int8" if quant else ("bf16-fused" if fused else "xla"))


def export_serving(model, params, dst, *, batch_sizes=(1, 8, 256),
                   quant: str | None = None, scan_blocks: bool = False,
                   fused: bool | None = None, input_shape=None,
                   input_dtype=jnp.bfloat16) -> dict:
    """Export the serving step at each static batch size to ``dst/``.

    ``input_shape``: per-sample shape WITHOUT the batch dim — defaults to
    raw-vertex ``(C, V)`` from the model's patch table (the shape
    ``run_testing`` feeds). Writes ``serve_B{B}.jaxexport`` per size,
    ``meta.json``, and the standalone ``loader.py``. Returns the meta dict.
    """
    from jax import export as jexport

    dst = Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    if input_shape is None:
        if model.patch_table is None:
            raise ValueError(
                "model has no patch table; pass input_shape=(C, ...) "
                "explicitly (pre-patched inputs: (C, L, V))"
            )
        num_v = int(np.asarray(model.patch_table).max()) + 1
        input_shape = (int(model.num_channels), num_v)
    fn, mode = make_serving_fn(model, params, quant=quant,
                               scan_blocks=scan_blocks, fused=fused)

    meta = {
        "framework": "surface_vision_transformers_tpu",
        "model": type(model).__name__,
        "numerics": mode,
        "platforms": None,
        "input_dtype": np.dtype(input_dtype).name,
        "batch_sizes": {},
        "loader": "loader.py",
    }
    for b in batch_sizes:
        shape = (int(b),) + tuple(input_shape)
        exp = jexport.export(jax.jit(fn))(
            jax.ShapeDtypeStruct(shape, input_dtype)
        )
        blob = exp.serialize()
        name = f"serve_B{b}.jaxexport"
        (dst / name).write_bytes(blob)
        meta["platforms"] = list(exp.platforms)
        meta["batch_sizes"][str(b)] = {
            "file": name,
            "input_shape": list(shape),
            "bytes": len(blob),
        }
    (dst / "meta.json").write_text(json.dumps(meta, indent=2))
    (dst / "loader.py").write_text(_LOADER)
    return meta


def load_serving(dst, batch_size):
    """Load an exported artifact (framework-side convenience; the shipped
    ``loader.py`` does the same with only jax imported)."""
    from jax import export as jexport

    dst = Path(dst)
    meta = json.loads((dst / "meta.json").read_text())
    m = meta["batch_sizes"][str(batch_size)]
    rt = jexport.deserialize((dst / m["file"]).read_bytes())
    return rt.call, meta
