"""DeepLab composite models — port of `Segmentation/network/modeling.py`
and `_SimpleSegmentationModel` (`network/utils.py:14-47`).

Constructor parity (`modeling.py:6-30`): output_stride 8 → dilate layer3+4
with aspp rates (12, 24, 36); 16 → dilate layer4 with (6, 12, 18).
The dict-dispatch forward becomes explicit methods:

| reference input_dict                | method here            |
|-------------------------------------|------------------------|
| flag='head', out_idx=k              | backbone_head          |
| int out_idx, flag='tail'/'clean'    | forward / forward_tail |
| out_idx='aspp_head'/'concat_head'   | sd_head                |
| out_idx='aspp_tail'/'concat_tail'   | sd_tail                |

Segmentation BatchNorm trains with momentum 0.01
(`main_aug_final.py:75` via set_bn_momentum); the backbone lr x0.1 group is
an optimizer label (:func:`segmentation_param_labels`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..resnet import from_name
from .heads import DeepLabHead, DeepLabHeadV3Plus, resize_bilinear
from .mobilenetv2 import MobileNetV2Backbone

# torch BN momentum 0.01 == flax momentum 0.99 (flax's is the EMA decay)
BN_FLAX_MOMENTUM = 0.99


class DeepLab(nn.Module):
    """backbone + classifier with SE (backbone layer) and SD (decoder)
    taps."""
    backbone_name: str = "resnet50"       # resnet50 | resnet101 | mobilenet
    num_classes: int = 21
    output_stride: int = 16
    plus: bool = True                     # DeepLabV3+ vs V3
    separable_conv: bool = False          # --separable_conv parity
    # rematerialize backbone stages in backward passes: one bool for all
    # stages or a per-stage 4-tuple (resnet.py:ResNetTorso.remat). Seg at
    # the stock recipes (b4, 512/768 crop) fits WITHOUT remat on a 16GB
    # chip and runs faster; detection keeps its own default (resnet.py).
    backbone_remat: Any = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone_name == "mobilenet":
            # the reference registers mobilenet constructors but its wiring
            # is commented out (`network/modeling.py:32-60`); this is the
            # working implementation of that intended path.
            self.backbone = MobileNetV2Backbone(
                output_stride=self.output_stride, dtype=self.dtype)
        else:
            self.backbone = from_name(
                self.backbone_name, output_stride=self.output_stride,
                frozen_bn=False, bn_momentum=BN_FLAX_MOMENTUM,
                remat=self.backbone_remat, dtype=self.dtype)
        rates = (12, 24, 36) if self.output_stride == 8 else (6, 12, 18)
        head_cls = DeepLabHeadV3Plus if self.plus else DeepLabHead
        self.classifier = head_cls(num_classes=self.num_classes,
                                   aspp_dilate=rates,
                                   bn_momentum=BN_FLAX_MOMENTUM,
                                   separable=self.separable_conv,
                                   dtype=self.dtype)

    # ---------- SE tap (backbone layers) ----------

    def backbone_head(self, x, tap: int, train: bool = False):
        """flag='head': (out_after_layer_tap, low_level) — low_level is
        always exported (`network/backbone/resnet.py:201-253`)."""
        return self.backbone.head(x, tap, train, with_low_level=True)

    def forward_tail_logits(self, feat, low_level, tap: int,
                            train: bool = False):
        """:meth:`forward_tail` WITHOUT the final upsample — the os4
        logits. Exists so callers that batch several tail forwards (the
        spectrum) can hoist the resize OUT of a ``vmap``: a vmapped
        ``jax.image.resize`` lowers catastrophically on TPU (measured
        148x slower than the identical resize flattened into the batch
        axis — scripts/microbench_resize_ce.py)."""
        out = self.backbone.tail(feat, tap, 4, train)
        return self.classifier(out, low_level, train)

    def forward_tail(self, x_shape, feat, low_level, tap: int,
                     train: bool = False):
        """int out_idx + flag='tail': backbone tail from the adversarial
        feature, full decoder, upsample to input size
        (`network/utils.py:22-30` + `resnet.py:255-286`)."""
        logits = self.forward_tail_logits(feat, low_level, tap, train)
        return resize_bilinear(logits, (x_shape[1], x_shape[2]))

    def low_level_feature(self, x, train: bool = False):
        """The always-exported post-layer1 feature, recomputed for the
        final loss graph: the reference does NOT detach ``low_level`` —
        the spectrum-tail losses backprop through it into stem+layer1
        (`main_aug_final.py:169` takes it undetached from the head
        forward; `:214-215` feeds it to the tail forwards). XLA CSEs
        this with the clean forward's identical stem+layer1 subgraph, so
        the recompute is free when the clean image is unperturbed."""
        return self.backbone.head(x, 1, train, with_low_level=True)[1]

    # ---------- clean forward ----------

    def forward_logits(self, x, train: bool = False):
        """Clean forward WITHOUT the final upsample (os4 logits) — lets
        the train step fold every loss site into one flattened resize+CE
        (see forward_tail_logits docstring for why)."""
        out, low_level = self.backbone.head(x, 4, train, with_low_level=True)
        return self.classifier(out, low_level, train)

    def __call__(self, x, train: bool = False):
        logits = self.forward_logits(x, train)
        return resize_bilinear(logits, (x.shape[1], x.shape[2]))

    # ---------- SD taps (decoder features) ----------

    def sd_head(self, x, which: str, train: bool = False) -> Dict[str, Any]:
        """out_idx='<which>_head' (`network/utils.py:31-36`): decoder
        feature + everything the tail needs."""
        out, low_level = self.backbone.head(x, 4, train, with_low_level=True)
        if which == "aspp":
            adv = self.classifier.aspp_head(out, train)
        elif which == "concat":
            adv = self.classifier.concat_head(out, low_level, train)
        else:
            raise ValueError(f"unknown sd tap {which!r}")
        return {"adv": adv, "low_level": low_level, "out": out}

    def attack_features(self, x, tap: int, which: str,
                        train: bool = False):
        """ONE backbone+decoder pass producing (se_feat, low_level,
        sd_dict) — the A-FAN step's attack-side features. Equivalent to
        backbone_head + sd_head (the reference pays two separate head
        forwards, `Segmentation/main_aug_final.py:160-166`, recomputing
        stages [0, tap) twice); the tensors are identical, stages run
        once."""
        feat_se, low_level = self.backbone.head(x, tap, train,
                                                with_low_level=True)
        out = self.backbone.tail(feat_se, tap, 4, train)
        if which == "aspp":
            adv = self.classifier.aspp_head(out, train)
        elif which == "concat":
            adv = self.classifier.concat_head(out, low_level, train)
        else:
            raise ValueError(f"unknown sd tap {which!r}")
        return feat_se, low_level, {"adv": adv, "low_level": low_level,
                                    "out": out}

    def sd_tail_logits(self, sd_dict: Dict[str, Any], which: str,
                       adv_feature: Optional[jnp.ndarray] = None,
                       train: bool = False):
        """:meth:`sd_tail` without the final upsample (os4 logits)."""
        adv = adv_feature if adv_feature is not None else sd_dict["adv"]
        if which == "aspp":
            return self.classifier.aspp_tail(adv, sd_dict["low_level"],
                                             train)
        if which == "concat":
            return self.classifier.concat_tail(adv, train)
        raise ValueError(f"unknown sd tap {which!r}")

    def sd_tail(self, sd_dict: Dict[str, Any], which: str, x_shape,
                adv_feature: Optional[jnp.ndarray] = None,
                train: bool = False):
        """out_idx='<which>_tail' (`network/utils.py:38-45`)."""
        logits = self.sd_tail_logits(sd_dict, which, adv_feature, train)
        return resize_bilinear(logits, (x_shape[1], x_shape[2]))


def segmentation_param_labels(params):
    """'backbone' (lr x0.1 group, `main_aug_final.py:79-82`) vs
    'classifier'."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "backbone"
        if str(getattr(path[0], "key", "")) == "backbone" else "classifier",
        params)


MODEL_MAP = {
    # name parity with `main_aug_final.py:63-70`
    "deeplabv3_resnet50": dict(backbone_name="resnet50", plus=False),
    "deeplabv3plus_resnet50": dict(backbone_name="resnet50", plus=True),
    "deeplabv3_resnet101": dict(backbone_name="resnet101", plus=False),
    "deeplabv3plus_resnet101": dict(backbone_name="resnet101", plus=True),
    "deeplabv3_mobilenet": dict(backbone_name="mobilenet", plus=False),
    "deeplabv3plus_mobilenet": dict(backbone_name="mobilenet", plus=True),
}


def build_model(name: str, num_classes: int, output_stride: int = 16,
                dtype=jnp.float32, separable_conv: bool = False,
                backbone_remat: bool = False) -> DeepLab:
    if name not in MODEL_MAP:
        raise ValueError(f"unknown model {name!r}; have {list(MODEL_MAP)}")
    return DeepLab(num_classes=num_classes, output_stride=output_stride,
                   separable_conv=separable_conv,
                   backbone_remat=backbone_remat, dtype=dtype,
                   **MODEL_MAP[name])
