"""MPP pretraining CLI (reference tools/pretrain.py equivalent):

    python -m surface_vision_transformers_tpu.cli.pretrain mpp.yml
"""

from surface_vision_transformers_tpu.cli._common import parse_config


def main() -> None:
    raw, resume_dir = parse_config("SiT masked-patch pretraining",
                                   with_resume=True)
    raw.setdefault("SSL", "mpp")  # force the MPP task
    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict

    results = runner.run_training(from_dict(raw), resume_from=resume_dir)
    print(results)


if __name__ == "__main__":
    main()
