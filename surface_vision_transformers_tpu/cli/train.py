"""Supervised training CLI (reference tools/train.py equivalent):

    python -m surface_vision_transformers_tpu.cli.train config.yml
"""

from surface_vision_transformers_tpu.cli._common import parse_config


def main() -> None:
    raw, resume_dir = parse_config(
        "SiT supervised phenotype-regression training", with_resume=True
    )
    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict

    exp = from_dict(raw)
    if exp.is_pretraining:
        raise SystemExit(
            "config contains a pretraining_mpp block; use cli.pretrain"
        )
    results = runner.run_training(exp, resume_from=resume_dir)
    print(results)


if __name__ == "__main__":
    main()
