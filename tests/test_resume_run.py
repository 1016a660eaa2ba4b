"""Interrupted-run resume (`--resume RUN_DIR` / ``run_training(resume_from)``)
with the rolling ``training.ckpt_every`` checkpoint: the continued run must
reproduce the uninterrupted trajectory exactly — the checkpoint carries
params, optimizer, PRNG, epoch counter and best-so-far. No reference
equivalent (its interrupted runs start over)."""

import sys

import numpy as np
import pytest

from surface_vision_transformers_tpu.data import make_regression_dataset
from surface_vision_transformers_tpu.train import runner
from surface_vision_transformers_tpu.utils.config import from_dict

from tests.test_workflows import L, V, C, base_raw


@pytest.fixture(scope="module")
def ds():
    data, labels = make_regression_dataset(
        48, num_patches=L, num_vertices=V, label_range=(-1, 1), seed=1
    )
    return {
        "train": (data[:32], labels[:32]),
        "validation": (data[32:], labels[32:]),
    }


def test_resume_reproduces_uninterrupted_run(ds, tmp_path):
    raw = base_raw(epochs=4, val_epoch=2, ckpt_every=1)

    full = runner.run_training(
        from_dict(raw), datasets=ds, run_root=tmp_path / "full", progress=False
    )

    raw_short = base_raw(epochs=2, val_epoch=2, ckpt_every=1)
    short = runner.run_training(
        from_dict(raw_short), datasets=ds, run_root=tmp_path / "parts",
        progress=False,
    )
    resumed = runner.run_training(
        from_dict(raw), datasets=ds, progress=False,
        resume_from=short["run_dir"],
    )

    assert resumed["run_dir"] == short["run_dir"]  # continues in place
    np.testing.assert_allclose(
        resumed["best_mae"], full["best_mae"], rtol=1e-6
    )
    assert resumed["best_epoch"] == full["best_epoch"]


def test_resume_completed_run_is_noop(ds, tmp_path):
    raw = base_raw(epochs=2, val_epoch=1)
    first = runner.run_training(
        from_dict(raw), datasets=ds, run_root=tmp_path, progress=False
    )
    again = runner.run_training(
        from_dict(raw), datasets=ds, progress=False,
        resume_from=first["run_dir"],
    )
    # start_epoch == epochs: no further training, best carried over
    np.testing.assert_allclose(again["best_mae"], first["best_mae"], rtol=1e-6)


def test_resume_missing_checkpoint_errors(ds, tmp_path):
    raw = base_raw(epochs=1, save_ckpt=False)
    res = runner.run_training(
        from_dict(raw), datasets=ds, run_root=tmp_path, progress=False
    )
    with pytest.raises(FileNotFoundError, match="last/final/best"):
        runner.run_training(
            from_dict(raw), datasets=ds, progress=False,
            resume_from=res["run_dir"],
        )
    with pytest.raises(FileNotFoundError, match="run directory"):
        runner.run_training(
            from_dict(raw), datasets=ds, progress=False,
            resume_from=str(tmp_path / "nope"),
        )


def test_cli_parses_resume_flag(monkeypatch, tmp_path):
    from surface_vision_transformers_tpu.cli._common import parse_config

    cfg = tmp_path / "c.yml"
    cfg.write_text("training:\n  bs: 8\n")
    monkeypatch.setattr(
        sys, "argv", ["prog", str(cfg), "--resume", "/some/run"]
    )
    raw, resume_dir = parse_config("t", with_resume=True)
    assert raw["training"]["bs"] == 8 and resume_dir == "/some/run"
    monkeypatch.setattr(sys, "argv", ["prog", str(cfg)])
    raw, resume_dir = parse_config("t", with_resume=True)
    assert resume_dir is None


def test_resume_reproduces_uninterrupted_streaming_run(ds, tmp_path):
    """Same exactness contract on the STREAMING path: the loader's shuffle
    stream is realigned to the resume epoch (StreamingLoader.set_epoch), so
    the continued run sees the same batch permutations the uninterrupted one
    would have."""
    def raw_for(epochs):
        raw = base_raw(epochs=epochs, val_epoch=2, ckpt_every=1)
        raw["data"] = {"streaming": "on"}
        return raw

    full = runner.run_training(
        from_dict(raw_for(4)), datasets=ds, run_root=tmp_path / "full",
        progress=False,
    )
    short = runner.run_training(
        from_dict(raw_for(2)), datasets=ds, run_root=tmp_path / "parts",
        progress=False,
    )
    resumed = runner.run_training(
        from_dict(raw_for(4)), datasets=ds, progress=False,
        resume_from=short["run_dir"],
    )
    np.testing.assert_allclose(resumed["best_mae"], full["best_mae"], rtol=1e-6)
    assert resumed["best_epoch"] == full["best_epoch"]


def test_resume_picks_newest_checkpoint_not_last(ds, tmp_path):
    """epochs=3 with ckpt_every=2 leaves `last` at epoch 1 but `final` at
    epoch 2: resume must pick the checkpoint with the highest epoch (final),
    making the resume a no-op instead of silently retraining the tail."""
    import json
    from pathlib import Path

    raw = base_raw(epochs=3, val_epoch=1, ckpt_every=2)
    first = runner.run_training(
        from_dict(raw), datasets=ds, run_root=tmp_path, progress=False
    )
    run_dir = Path(first["run_dir"])
    assert json.loads((run_dir / "last" / "metadata.json").read_text())["epoch"] == 1
    assert json.loads((run_dir / "final" / "metadata.json").read_text())["epoch"] == 2

    n_train_records = sum(
        1 for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        if "train/loss" in line
    )
    again = runner.run_training(
        from_dict(raw), datasets=ds, progress=False, resume_from=str(run_dir)
    )
    n_after = sum(
        1 for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        if "train/loss" in line
    )
    assert n_after == n_train_records  # no epochs re-trained
    np.testing.assert_allclose(again["best_mae"], first["best_mae"], rtol=1e-6)
    assert again["best_epoch"] == first["best_epoch"]
