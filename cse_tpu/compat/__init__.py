from cse_tpu.compat.torch_export import save_torch_checkpoint, sepformer_to_state_dict
from cse_tpu.compat.torch_import import (
    infer_reference_config,
    load_torch_checkpoint,
    sepformer_from_state_dict,
)

__all__ = [
    "save_torch_checkpoint", "sepformer_to_state_dict", "infer_reference_config",
    "load_torch_checkpoint", "sepformer_from_state_dict",
]
