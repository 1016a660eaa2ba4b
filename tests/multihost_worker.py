"""Worker for the REAL 2-process integration test (test_multiprocess.py).

Each invocation is one JAX process: it joins the distributed runtime via the
product-path ``initialize_multihost`` (local coordinator), builds the mesh
from the config exactly like ``cli.train``, and trains through
``runner.run_training`` with the per-process feed
(``make_array_from_process_local_data`` — every process holds the full
synthetic dataset but transfers only its ``process_local_slice`` rows).

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import json
import sys
import tempfile


def main() -> None:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # the image's sitecustomize force-sets JAX_PLATFORMS=axon (TPU); pin CPU
    # before ANY backend touch (distributed init must come first too)
    jax.config.update("jax_platforms", "cpu")

    from surface_vision_transformers_tpu.parallel.multihost import (
        initialize_multihost,
    )

    initialize_multihost(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np

    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict

    # identical synthetic data on every process (seeded)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((32, 4, 20, 15)).astype(np.float32)
    labels = data[:, 0, :, 0].mean(axis=1).astype(np.float32)

    raw = {
        "resolution": {"ico": 2, "sub_ico": 0},
        "transformer": {"dim": 16, "depth": 1, "heads": 2, "mlp_dim": 32,
                        "dim_head": 8},
        "training": {"LR": 1e-2, "bs": 16, "epochs": 2, "val_epoch": 1,
                     "seed": 0, "save_ckpt": False},
        "optimisation": {"optimiser": "Adam"},
        "tpu": {"compute_dtype": "float32", "mesh_data": -1},
        "logging": {"folder_to_save_model": "logs-test"},
    }
    res = runner.run_training(
        from_dict(raw),
        datasets={"train": (data, labels),
                  "validation": (data[:16], labels[:16])},
        run_root=tempfile.mkdtemp(), progress=False,
    )

    # same recipe through the STREAMING loader (data.streaming: on): pins
    # the loader's multihost path — each process feeds only its
    # process_local_slice of every batch (COMPONENTS.md §5 claim)
    raw_s = dict(raw, data={"streaming": "on"})
    res_s = runner.run_training(
        from_dict(raw_s),
        datasets={"train": (data, labels),
                  "validation": (data[:16], labels[:16])},
        run_root=tempfile.mkdtemp(), progress=False,
    )
    print("RESULT " + json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "best_mae": res["best_mae"],
        "best_mae_streaming": res_s["best_mae"],
        "streaming": res_s["streaming"],
        "mesh": res["mesh"],
    }), flush=True)


if __name__ == "__main__":
    main()
