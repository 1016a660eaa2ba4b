from surface_vision_transformers_tpu.utils.env import (
    enable_compilation_cache,
    force_cpu,
)
from surface_vision_transformers_tpu.utils.config import (
    DataConfig,
    Experiment,
    ModelConfig,
    MPPConfig,
    OptimConfig,
    TPUConfig,
    TrainingConfig,
    dump_config_with_results,
    from_dict,
    load_config,
)

__all__ = [
    "enable_compilation_cache",
    "force_cpu",
    "DataConfig",
    "Experiment",
    "MPPConfig",
    "ModelConfig",
    "OptimConfig",
    "TPUConfig",
    "TrainingConfig",
    "dump_config_with_results",
    "from_dict",
    "load_config",
]
