"""Observability: run folders, metric logging, profiler hooks.

Mirrors the reference's run-folder UX — timestamped directory with
arch/init-source suffixes (-tiny/-small/-base, -imgnet, -ssl-{dataset},
-finetune/-freeze; reference: tools/train.py:151-183) and a config YAML
re-dumped with results (tools/train.py:352-359) — while replacing its
TensorBoard-only logging with structured JSONL + CSV (TensorBoard optional if
installed). Fixes the reference's global-step bug (train-loss logged with
``epoch+1`` inside the batch loop, tools/train.py:298).
"""

from __future__ import annotations

import contextlib
import csv
import json
import os
import time
from datetime import datetime
from pathlib import Path
from typing import Any

from surface_vision_transformers_tpu.utils.config import Experiment


def run_folder_name(exp: Experiment, date: str | None = None) -> str:
    """Reference-compatible run folder name (tools/train.py:151-183)."""
    date = date or datetime.today().strftime("%Y-%m-%d-%H:%M:%S")
    name = date + "-" + exp.model.size_name
    if exp.training.load_weights_imagenet:
        name += "-imgnet"
    if exp.training.load_weights_ssl:
        name += "-ssl-" + exp.training.dataset_ssl
    if exp.is_pretraining:
        name += "-mpp"
    elif exp.training.finetuning:
        name += "-finetune"
    else:
        name += "-freeze"
    return name


class MetricLogger:
    """JSONL (one record per event) + CSV (per-epoch metrics) + optional
    TensorBoard. All writes are host-side and happen at epoch granularity —
    never inside the device loop."""

    def __init__(self, run_dir: str | os.PathLike, use_tensorboard: bool = True):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.run_dir / "metrics.jsonl", "a")
        # one CSV per metric prefix: a single DictWriter would freeze its
        # columns on the first (train/) record and silently drop val/ fields
        self._csv: dict[str, tuple] = {}
        self._tb = None
        if use_tensorboard:
            try:  # tensorboard is optional
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.run_dir))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: dict[str, Any], prefix: str = "") -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({prefix + k: v for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

        key = prefix.strip("/") or "metrics"
        if key not in self._csv:
            path = self.run_dir / (
                "metrics.csv" if key == "metrics" else f"metrics_{key}.csv"
            )
            f = open(path, "a", newline="")
            w = csv.DictWriter(f, fieldnames=list(rec.keys()), extrasaction="ignore")
            if path.stat().st_size == 0:
                w.writeheader()
            self._csv[key] = (f, w)
        f, w = self._csv[key]
        w.writerow(rec)
        f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(prefix + k, v, step)

    def close(self) -> None:
        self._jsonl.close()
        for f, _ in self._csv.values():
            f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(log_dir: str | os.PathLike, enabled: bool = True):
    """jax.profiler trace context (view in TensorBoard's profile plugin or
    Perfetto) — the tracing subsystem the reference lacks (SURVEY §5)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
