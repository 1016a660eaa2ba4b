"""Batched-inference evaluation CLI (reference tools/testing.py equivalent):

    python -m surface_vision_transformers_tpu.cli.test config.yml
"""

from surface_vision_transformers_tpu.cli._common import parse_config


def main() -> None:
    raw = parse_config("SiT test-time evaluation")
    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict

    results = runner.run_testing(from_dict(raw))
    print(results)


if __name__ == "__main__":
    main()
