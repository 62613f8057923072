from .heads import ASPP, DeepLabHead, DeepLabHeadV3Plus, resize_bilinear
from .mobilenetv2 import MobileNetV2Backbone
from .modeling import (DeepLab, MODEL_MAP, build_model,
                       segmentation_param_labels)

__all__ = ["DeepLab", "build_model", "MODEL_MAP",
           "segmentation_param_labels", "ASPP", "DeepLabHead",
           "DeepLabHeadV3Plus", "MobileNetV2Backbone", "resize_bilinear"]
