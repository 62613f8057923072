from .torch_ckpt import (convert_conv, convert_linear, load_torch_resnet_s,
                         torch_state_dict_to_numpy)

__all__ = ["load_torch_resnet_s", "torch_state_dict_to_numpy",
           "convert_conv", "convert_linear"]
