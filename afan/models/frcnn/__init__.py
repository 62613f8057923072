from .model import DetectionLosses, FRCNNConfig, FasterRCNN
from . import anchors, boxes, roi_head, rpn, sampling

__all__ = ["FasterRCNN", "FRCNNConfig", "DetectionLosses",
           "anchors", "boxes", "roi_head", "rpn", "sampling"]
