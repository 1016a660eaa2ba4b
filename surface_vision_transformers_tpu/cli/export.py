"""Checkpoint conversion CLI: move weights between this framework and the
reference PyTorch layout in either direction.

    python -m surface_vision_transformers_tpu.cli.export \
        --src logs/SiT/<run>/best_params.npz --dst checkpoint.pth --depth 12
    python -m surface_vision_transformers_tpu.cli.export \
        --src checkpoint.pth --dst params.npz --depth 12

Formats by extension: .npz (this framework's portable export),
.pt/.pth (reference-layout torch state dict; requires torch installed).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="SiT checkpoint format converter")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--depth", type=int, default=12,
                   help="transformer depth of the checkpoint")
    args = p.parse_args()

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
