"""Shared CLI plumbing: `python -m surface_vision_transformers_tpu.cli.<tool>
<config.yml>` mirrors the reference's positional-YAML UX
(reference: tools/train.py:443-459) with optional key overrides."""

from __future__ import annotations

import argparse

import yaml


def parse_config(description: str, with_resume: bool = False):
    """Returns the raw config dict — or (raw, resume_dir) when
    ``with_resume`` (train/pretrain support ``--resume RUN_DIR``)."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("config", type=str, help="path to the YAML config")
    if with_resume:
        p.add_argument(
            "--resume",
            metavar="RUN_DIR",
            default=None,
            help="continue an interrupted run from its latest checkpoint "
            "(last/final/best) in this existing run directory",
        )
    p.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="dotted.key=value",
        help="override a config value (repeatable), e.g. --set training.bs=64",
    )
    p.add_argument(
        "--multihost",
        action="store_true",
        help="join the multi-process JAX runtime before running (one launch "
        "per host; coordinator/process ids from the TPU-pod environment)",
    )
    args = p.parse_args()
    if args.multihost:
        from surface_vision_transformers_tpu.parallel import initialize_multihost

        initialize_multihost()
    with open(args.config) as f:
        raw = yaml.safe_load(f)
    for ov in args.set:
        key, _, val = ov.partition("=")
        cur = raw
        parts = key.split(".")
        for k in parts[:-1]:
            cur = cur.setdefault(k, {})
        cur[parts[-1]] = yaml.safe_load(val)
    if with_resume:
        return raw, args.resume
    return raw
