from surface_vision_transformers_tpu.checkpoints import orbax_io, torch_import

__all__ = ["orbax_io", "torch_import"]
