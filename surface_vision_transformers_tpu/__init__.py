"""surface_vision_transformers_tpu — a TPU-native framework for attention-based
cortical-surface modelling (JAX / XLA / Pallas / pjit).

A ground-up rebuild (not a port) of the capabilities of the reference PyTorch
implementation of the Surface Vision Transformer (SiT, MIDL 2022,
reference: models/sit.py, models/mpp.py, tools/{train,pretrain,testing,
preprocessing}.py):

- icosahedral patchification of ico-N surface meshes into non-overlapping
  triangular patches (``geometry``),
- a pure-functional SiT encoder with fused-QKV pre-norm blocks (``models``),
- masked-patch pretraining (MPP) with on-device corruption (``models.mpp``),
- fused patchify+normalize+embed and blockwise attention Pallas TPU kernels
  with XLA fallbacks (``ops``),
- a single Trainer covering supervised regression, MPP pretraining, and
  evaluation with on-device epoch loops (``train``),
- data-parallel / FSDP / tensor-parallel sharding over a jax.sharding.Mesh
  (``parallel``),
- Orbax checkpointing plus PyTorch/timm checkpoint import (``checkpoints``),
- a stdlib-only GIFTI reader/writer and the offline preprocessing ETL
  (``data``),
- YAML-config CLI entry points mirroring the reference's train.py /
  pretrain.py / testing.py / preprocessing.py (``cli``).

Typical use::

    import surface_vision_transformers_tpu as svt
    model = svt.models.SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                           num_patches=320, num_vertices=153)
"""

from surface_vision_transformers_tpu.version import __version__

from surface_vision_transformers_tpu import geometry
from surface_vision_transformers_tpu import models
from surface_vision_transformers_tpu import ops
from surface_vision_transformers_tpu import utils

__all__ = [
    "__version__",
    "geometry",
    "models",
    "ops",
    "utils",
]
