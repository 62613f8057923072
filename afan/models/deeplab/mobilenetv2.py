"""MobileNetV2 backbone for DeepLab — port of
`Segmentation/network/backbone/mobilenetv2.py` (inverted residual blocks
with dilation for output_stride 8/16; low-level feature after the 24-ch
stage). The reference's segmentation wiring for this backbone is commented
out (`network/modeling.py:32-60`) while the model_map still registers the
constructors — this is the working implementation of that intended path.

Exposes the same ``head(x, tap, train, with_low_level)`` / ``tail`` API as
:class:`afan.models.resnet.ResNetTorso`, with taps 1..4 mapped to the four
stride-stage boundaries so SE feature attacks work unchanged.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..resnet import IMAGENET_MEAN, IMAGENET_STD

# (expansion t, channels c, repeats n, stride s) — MobileNetV2 paper table 2
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),    # low_level exported after this stage (24 ch)
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
# tap i (1..4) = exit after this stage index (0-based into the setting)
TAP_TO_STAGE = {1: 1, 2: 2, 3: 4, 4: 6}


class InvertedResidual(nn.Module):
    ch_out: int
    stride: int
    expand: int
    dilation: int = 1
    bn_momentum: float = 0.99
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch_in = x.shape[-1]
        hidden = ch_in * self.expand
        use_res = self.stride == 1 and ch_in == self.ch_out
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, dtype=self.dtype,
                             name="expand_bn")(y)
            y = nn.relu6(y)
        y = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype, name="depthwise")(y)
        y = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, dtype=self.dtype,
                         name="depthwise_bn")(y)
        y = nn.relu6(y)
        y = nn.Conv(self.ch_out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, dtype=self.dtype,
                         name="project_bn")(y)
        return x + y if use_res else y


class MobileNetV2Backbone(nn.Module):
    output_stride: int = 16
    bn_momentum: float = 0.99
    dtype: Any = jnp.float32

    def setup(self):
        self.stem_conv = nn.Conv(32, (3, 3), strides=(2, 2), padding=1,
                                 use_bias=False, dtype=self.dtype,
                                 name="stem")
        self.stem_bn = nn.BatchNorm(momentum=self.bn_momentum,
                                    dtype=self.dtype, name="stem_bn")
        blocks = []
        current_stride = 2
        dilation = 1
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            stage = []
            for i in range(n):
                stride = s if i == 0 else 1
                d = dilation
                if stride > 1 and current_stride >= self.output_stride:
                    # convert stride to dilation past the output stride
                    dilation *= stride
                    d = dilation // stride if i == 0 else dilation
                    stride = 1
                elif stride > 1:
                    current_stride *= stride
                stage.append(InvertedResidual(
                    ch_out=c, stride=stride, expand=t,
                    dilation=max(d, 1), bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name=f"b{len(blocks)}_{i}"))
            blocks.append(stage)
        self.stages_blocks = blocks

    def _stem(self, x, train):
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        x = self.stem_conv(x)
        x = self.stem_bn(x, use_running_average=not train)
        return nn.relu6(x)

    def _run(self, x, start_stage: int, end_stage: int, train: bool,
             want_low: bool):
        low_level = None
        for si in range(start_stage, end_stage + 1):
            for blk in self.stages_blocks[si]:
                x = blk(x, train)
            if si == 1:
                low_level = x  # 24-ch feature for the V3+ decoder
        return (x, low_level) if want_low else x

    def head(self, x, tap: int, train: bool = False,
             with_low_level: bool = False):
        x = self._stem(x, train)
        return self._run(x, 0, TAP_TO_STAGE[tap], train, with_low_level)

    def tail(self, feature, tap: int, end: int = 4, train: bool = False):
        return self._run(feature, TAP_TO_STAGE[tap] + 1, TAP_TO_STAGE[end],
                         train, False)
