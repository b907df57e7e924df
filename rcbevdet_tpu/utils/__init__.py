from .convert_torch import convert_torch_state_dict, assign_into_variables

__all__ = ["convert_torch_state_dict", "assign_into_variables"]
