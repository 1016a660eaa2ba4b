"""REAL multi-process execution (VERDICT r2 #4): two separate CPU processes
join one JAX runtime via a local coordinator and train the toy recipe through
``runner.run_training`` with the per-process feed — the first actual
``process_count > 1`` execution of the ``make_array_from_process_local_data``
path, not the single-process degradation the fake-8-device tests exercise."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    # each process contributes its default 1 CPU device -> 2-device mesh
    env.pop("XLA_FLAGS", None)

    worker = str(REPO / "tests" / "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-4000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))

    # both processes agree, actually ran 2-process, and used a 2-wide mesh
    assert all(r["process_count"] == 2 for r in results), results
    assert results[0]["mesh"] == {"data": 2, "fsdp": 1, "model": 1}, results
    assert abs(results[0]["best_mae"] - results[1]["best_mae"]) < 1e-9, results

    # loss parity with the same recipe single-process (this process, 1 dev)
    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict

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
        "tpu": {"compute_dtype": "float32", "mesh_data": 1},
        "logging": {"folder_to_save_model": "logs-test"},
    }
    import tempfile

    base = runner.run_training(
        from_dict(raw),
        datasets={"train": (data, labels),
                  "validation": (data[:16], labels[:16])},
        run_root=tempfile.mkdtemp(), progress=False,
    )
    assert abs(base["best_mae"] - results[0]["best_mae"]) < 1e-4, (
        base["best_mae"], results)

    # the STREAMING loader's multihost per-process feed (each process
    # transfers only its process_local_slice of every batch) trained the
    # same recipe in both workers: bit-agreement ACROSS processes (the
    # load-bearing claim), same metric scale as the device-resident run
    # (streaming shuffles on host with its own RNG, so trajectories differ
    # — same bound as test_streaming_epoch_matches_on_device)
    assert all(r["streaming"] for r in results), results
    assert abs(results[0]["best_mae_streaming"]
               - results[1]["best_mae_streaming"]) < 1e-9, results
    assert abs(results[0]["best_mae_streaming"]
               - results[0]["best_mae"]) < 0.25, results
