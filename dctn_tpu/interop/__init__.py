"""Interop with the reference's torch checkpoint format.

The reference saves and loads raw ``model.state_dict()`` pickles via
``torch.save``/``torch.load`` (dctn/training.py:120-121, new_runner.py:432-433,
mnist.py:455-456). These converters let a reference user bring their trained
``.pt`` files here (and take ours back) without retraining.
"""

from .torch_checkpoint import (
    is_torch_checkpoint,
    load_torch_state_dict,
    eps_plus_linear_params_from_state_dict,
    state_dict_from_eps_plus_linear_params,
    conv_sbs_params_from_state_dict,
    state_dict_from_conv_sbs_params,
    load_params_from_torch_checkpoint,
)

__all__ = [
    "is_torch_checkpoint",
    "load_torch_state_dict",
    "eps_plus_linear_params_from_state_dict",
    "state_dict_from_eps_plus_linear_params",
    "conv_sbs_params_from_state_dict",
    "state_dict_from_conv_sbs_params",
    "load_params_from_torch_checkpoint",
]
