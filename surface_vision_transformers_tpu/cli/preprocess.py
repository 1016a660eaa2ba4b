"""Offline preprocessing CLI (reference tools/preprocessing.py equivalent):

    python -m surface_vision_transformers_tpu.cli.preprocess config.yml
"""

from surface_vision_transformers_tpu.cli._common import parse_config


def main() -> None:
    raw = parse_config("GIFTI -> patched .npy preprocessing")
    from surface_vision_transformers_tpu.data import preprocess

    print(preprocess.run(raw))


if __name__ == "__main__":
    main()
