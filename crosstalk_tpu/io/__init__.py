from crosstalk_tpu.io.checkpoint import (
    AsyncCheckpointWriter,
    load_checkpoint,
    read_checkpoint_meta,
    save_checkpoint,
)
from crosstalk_tpu.io.export import (
    export_serving_model,
    load_exported,
    read_exported,
    save_exported,
)
from crosstalk_tpu.io.torch_convert import (
    flax_to_torch,
    image_size_compatible,
    infer_image_size,
    infer_model_size,
    load_pth,
    model_config_for_checkpoint,
    save_pth,
    torch_to_flax,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "read_checkpoint_meta",
    "AsyncCheckpointWriter",
    "torch_to_flax",
    "flax_to_torch",
    "load_pth",
    "save_pth",
    "image_size_compatible",
    "infer_image_size",
    "infer_model_size",
    "model_config_for_checkpoint",
    "export_serving_model",
    "save_exported",
    "read_exported",
    "load_exported",
]
