from .orbax_io import CheckpointManager, load_pytree, save_pytree
from .torch_convert import from_torch_state_dict, monai_layout, to_torch_state_dict

__all__ = [
    "CheckpointManager",
    "from_torch_state_dict",
    "load_pytree",
    "monai_layout",
    "save_pytree",
    "to_torch_state_dict",
]
