"""Same-host cross-check for the vs_baseline denominator (BASELINE.md).

The headline ``vs_baseline`` divides the measured TPU surfaces/sec by an
ANALYTIC estimate of the reference PyTorch pipeline on an A100 (no A100
exists here to measure). This script anchors that estimate with what CAN be
measured on this host: eager-PyTorch inference of the reference-semantics
SiT-tiny (tests/torch_ref.py — the exact model the golden-parity suite pins
to the reference weight map) and, for an apples-to-apples implementation
check, this framework's own XLA-CPU path on the same core.

Run from the repo root:

    python scripts/baseline_cpu_crosscheck.py

Writes BASELINE_CPU.json and prints a summary. See BASELINE.md for how the
numbers feed the A100 scaling argument.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def bench_torch(batch=16, iters=8):
    import torch

    from torch_ref import TorchSiT

    torch.manual_seed(0)
    torch.set_num_threads(1)  # this host exposes one core
    model = TorchSiT(dim=192, depth=12, heads=3, mlp_dim=768,
                     num_patches=320, num_vertices=153).eval()
    x = torch.randn(batch, 4, 320, 153)
    with torch.no_grad():
        model(x)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


def bench_jax_cpu(batch=16, iters=8):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from surface_vision_transformers_tpu.models import SiT

    model = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                num_patches=320, num_vertices=153, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 4, 320, 153))
    params = model.init(key, x)
    fwd = jax.jit(lambda p, xx: model.apply(p, xx))
    np_out = fwd(params, x).block_until_ready()  # compile+warm (local CPU: real)
    t0 = time.perf_counter()
    for _ in range(iters):
        fwd(params, x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    torch_sps = bench_torch()
    jax_sps = bench_jax_cpu()
    out = {
        "host": "single shared CPU core",
        "model": "SiT-tiny sub-ico-2, pre-patched input, fp32 eager/jit",
        "torch_cpu_surfaces_per_s": round(torch_sps, 2),
        "jax_cpu_surfaces_per_s": round(jax_sps, 2),
        "jax_over_torch_same_host": round(jax_sps / torch_sps, 2),
        "note": (
            "Same-host measured anchor for BASELINE.md's A100 scaling "
            "argument; the A100 number itself remains an estimate."
        ),
    }
    Path(__file__).resolve().parent.parent.joinpath(
        "BASELINE_CPU.json"
    ).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
