from .convert_torch import convert_torch_state_dict, assign_into_variables
from .platform import (
    apply_platform_env, tpu_compiler_options, tpu_train_compiler_options,
)

__all__ = [
    "convert_torch_state_dict",
    "assign_into_variables",
    "apply_platform_env",
    "tpu_compiler_options",
    "tpu_train_compiler_options",
]
