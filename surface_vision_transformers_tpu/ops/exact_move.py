"""Bitwise-exact value movement through one-hot MXU GEMMs.

Permutations/selections applied as one-hot matmuls are the TPU-fast form of
a per-sample gather (the MXU runs them ~5x faster than XLA's gather — see
models/mpp.py and data/augment.py). The catch is fp32 operands: the v5e MXU
multiplies in bf16, and

- ``Precision.DEFAULT`` runs ONE bf16 pass — every moved value (and every
  self-indexed untouched row) silently quantizes to bf16;
- ``Precision.HIGHEST`` is exact but splits BOTH operands 3-way (6 passes),
  pointless here because the one-hot operand is already exact in bf16.

``exact_linear_move`` splits only the VALUE operand into three bf16 planes
covering the top/mid/low 8 significand bits — an exact decomposition, since
bf16 shares fp32's exponent range:

    h1 = bf16(v);  r1 = v - h1   (exact: h1 within one ulp-step of v)
    h2 = bf16(r1); r2 = r1 - h2  (exact; r2 has <= 8 significant bits)
    h3 = bf16(r2)                (exact: 8 bits fit bf16's significand)

Each plane moves exactly through one bf16 pass (1.0 * h == h, zeros add
nothing), and the fp32 re-sum (h1 + h2) + h3 reconstructs v exactly (each
partial sum has <= 24 significant bits). Three passes total; bf16 inputs
take the single pass unchanged.

Caveats (both outside any real data range; pinned with explicit carve-outs
in tests/test_exact_move.py):

- fp32 values above bf16's max (~3.39e38) overflow the h1 cast.
- fp32 values whose LOW significand bits fall below fp32's NORMAL floor
  (2^-126) reconstruct inexactly: XLA (TPU and CPU) flushes subnormal
  intermediates, so a residual plane that lands subnormal (r1/r2 < 2^-126)
  flushes to zero and its bits are lost. fp32 subnormals themselves
  (|v| < 2^-126) and near-min-normal values with set low bits
  (e.g. 2^-126 * (1 + 2^-23), residual 2^-149) are the failing cases.
  Exactness holds whenever every needed residual bit is >= 2^-126 — in
  particular for all |v| >= 2^-103 (~1e-31), and for any smaller value
  exactly representable in <= 8 significand bits down to bf16's own
  subnormal floor. The absolute error in the caveat region is < 2^-125
  (~2.4e-38): at most the flushed subnormal residuals.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["exact_linear_move"]


def exact_linear_move(
    values: jax.Array,
    linear_fn: Callable[[jax.Array], jax.Array],
    out_dtype=None,
) -> jax.Array:
    """Apply a value-MOVING linear op bitwise-exactly on the MXU.

    ``linear_fn`` takes a bf16 array shaped like ``values`` and returns an
    fp32 result — typically a dot_general/einsum against a bf16 one-hot
    (permutation/selection) operand with ``preferred_element_type=float32``.
    Exactness relies on ``linear_fn`` being a 0/1-weighted move: each output
    element a sum of distinct input elements (here: exactly one).
    """
    ob = jax.lax.optimization_barrier
    if values.dtype == jnp.bfloat16:
        out = linear_fn(values)
    else:
        # The barriers between each bf16 downcast and its fp32 upcast are
        # load-bearing: XLA's excess-precision rewrite
        # (xla_allow_excess_precision, default ON) collapses the adjacent
        # pair convert_f32(convert_bf16(x)) to x, turning every residual
        # into x - x = 0 and silently reducing the whole function to the
        # single truncating pass it exists to avoid (observed on v5e; the
        # barrier splits the pair so the rewrite cannot fire). The barriers
        # on the GEMM results keep the three dots from being re-fused into
        # one bf16-operand dot by distributivity simplification.
        v32 = values.astype(jnp.float32)
        h1 = ob(v32.astype(jnp.bfloat16))
        r1 = v32 - h1.astype(jnp.float32)
        h2 = ob(r1.astype(jnp.bfloat16))
        h3 = ob((r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16))
        out = (ob(linear_fn(h1)) + ob(linear_fn(h2))) + ob(linear_fn(h3))
    return out.astype(out_dtype if out_dtype is not None else values.dtype)
