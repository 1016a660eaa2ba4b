"""Checkpoint conversion CLI: move weights between this framework and the
reference PyTorch layout in either direction.

    python -m surface_vision_transformers_tpu.cli.export \
        --src logs/SiT/<run>/best_params.npz --dst checkpoint.pth --depth 12
    python -m surface_vision_transformers_tpu.cli.export \
        --src checkpoint.pth --dst params.npz --depth 12

Formats by extension: .npz (this framework's portable export),
.pt/.pth (reference-layout torch state dict; requires torch installed).

Compiled serving artifacts (--serve): export the serving step itself as
jax.export blobs loadable WITHOUT the framework (reference deployment
entry point tools/testing.py:53-101, rebuilt TPU-native):

    python -m surface_vision_transformers_tpu.cli.export \
        --serve artifacts/ --config cfg.yml --src best_params.npz \
        --batch-sizes 1,8,256 [--quant int8] [--xla]
"""

from __future__ import annotations

import argparse


def _serve(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from surface_vision_transformers_tpu.geometry import load_patch_table
    from surface_vision_transformers_tpu.serving import export_serving
    from surface_vision_transformers_tpu.train import runner as _runner
    from surface_vision_transformers_tpu.train.runner import merge_params
    from surface_vision_transformers_tpu.train.trainer import Trainer
    from surface_vision_transformers_tpu.utils.config import from_dict

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    for ov in args.set:
        key, _, val = ov.partition("=")
        cur = raw
        parts = key.split(".")
        for k in parts[:-1]:
            cur = cur.setdefault(k, {})
        cur[parts[-1]] = yaml.safe_load(val)
    exp = from_dict(raw)
    table = load_patch_table(exp.ico, exp.sub_ico).indices
    trainer = Trainer(exp, patch_table=table)
    num_v = int(np.asarray(table).max()) + 1
    state = trainer.init_state(
        jnp.zeros((1, trainer.model.num_channels, num_v), jnp.float32)
    )
    loaded = _runner._load_params_any(args.src, exp.model.depth)
    params = merge_params(jax.tree.map(np.asarray, state.params), loaded)
    meta = export_serving(
        trainer.model, params, args.serve,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        quant=(args.quant if args.quant != "none" else None),
        scan_blocks=exp.tpu.scan_blocks,
        fused=(False if args.xla else None),
    )
    sizes = {b: m["bytes"] for b, m in meta["batch_sizes"].items()}
    print(f"wrote serving artifacts ({meta['numerics']}, platforms "
          f"{meta['platforms']}) to {args.serve}: {sizes}")


def main() -> None:
    p = argparse.ArgumentParser(description="SiT checkpoint format converter")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", default=None)
    p.add_argument("--depth", type=int, default=12,
                   help="transformer depth of the checkpoint")
    p.add_argument("--serve", default=None, metavar="DIR",
                   help="export compiled serving artifacts to DIR "
                        "(requires --config)")
    p.add_argument("--config", default=None,
                   help="experiment YAML for --serve (model geometry)")
    p.add_argument("--set", nargs="*", default=[],
                   help="config overrides for --serve (key=value)")
    p.add_argument("--batch-sizes", default="1,8,256")
    p.add_argument("--quant", default="none", choices=["none", "int8"])
    p.add_argument("--xla", action="store_true",
                   help="export the portable pure-XLA path instead of the "
                        "platform-locked fused kernels")
    args = p.parse_args()

    if args.serve:
        if not args.config:
            raise SystemExit("--serve requires --config")
        _serve(args)
        return
    if not args.dst:
        raise SystemExit("--dst is required (or use --serve DIR)")

    import numpy as np

    from surface_vision_transformers_tpu.checkpoints import orbax_io
    from surface_vision_transformers_tpu.checkpoints.torch_import import (
        load_torch_state_dict,
        sit_params_from_torch,
        sit_params_to_torch,
    )

    if args.src.endswith(".npz") and args.dst.endswith((".pt", ".pth")):
        tree = orbax_io.load_params_npz(args.src)
        state = sit_params_to_torch(tree, depth=args.depth)
        import torch

        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in state.items()},
                   args.dst)
        print(f"wrote reference-layout state dict: {args.dst} ({len(state)} keys)")
    elif args.src.endswith((".pt", ".pth")) and args.dst.endswith(".npz"):
        state = load_torch_state_dict(args.src)
        params = sit_params_from_torch(state, depth=args.depth, strict=False)

        flat = {}

        def walk(tree, prefix):
            for k, v in tree.items():
                if isinstance(v, dict):
                    walk(v, prefix + k + "/")
                else:
                    flat["params/" + prefix + k] = np.asarray(v)

        walk(params, "")
        np.savez(args.dst, **flat)
        print(f"wrote npz params: {args.dst} ({len(flat)} arrays)")
    else:
        raise SystemExit(
            "unsupported conversion; use .npz -> .pt/.pth or .pt/.pth -> .npz"
        )


if __name__ == "__main__":
    main()
