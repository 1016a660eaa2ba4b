from surface_vision_transformers_tpu.serving.artifact import (  # noqa: F401
    export_serving,
    load_serving,
    make_serving_fn,
)
