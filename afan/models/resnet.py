"""ImageNet-style ResNet torso (18/50/101) with static tap points,
dilation support, and BN-freeze — shared by the detection and segmentation
stacks.

Behavioral port of the reference's two torsos:
* `Detection/backbone/resnet50_ori.py:203-266` — split forward where
  ``head`` exits after layer1/2/3 (``out_idx`` 1-3), ``tail`` resumes at the
  next layer, ``clean`` runs stem→layer3 (layer4 is the ROI-head "hidden");
  embedded ImageNet normalization (`:131-132`); stem+layer1 frozen
  (`backbone/resnet50.py:36-38`); ALL BatchNorms forced to eval + no-grad
  by the composite model (`Detection/model.py:27-35`).
* `Segmentation/network/backbone/resnet.py:198-304` — same pattern with
  dilation (output_stride 8 → dilate layer3+4, 16 → dilate layer4,
  `network/modeling.py:8-14`) and a ``low_level`` export after layer1
  (`resnet.py:201-253`).

TPU-first: NHWC layout, bf16-capable compute dtype, BN freeze expressed as
``use_running_average=True`` (never mutates batch_stats) rather than
runtime ``.eval()`` flipping; frozen-parameter groups are applied in the
optimizer (zero-update label), mirroring ``requires_grad=False``.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class FrozenBatchNorm(nn.Module):
    """BatchNorm that ALWAYS normalizes with running statistics and never
    updates them — the reference's bn.eval()-every-forward semantics
    (`Detection/model.py:27-35,47-48`). Scale/bias are still parameters so
    torch checkpoints map 1:1; the trainer freezes them via optimizer
    labels (requires_grad=False parity)."""
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=True, momentum=self.momentum,
                            epsilon=self.epsilon, dtype=self.dtype,
                            name="bn")(x)


def make_norm(frozen: bool, momentum: float, dtype):
    """Stage norm factory: frozen (detection) vs trainable (segmentation,
    momentum 0.01 per `Segmentation/utils/utils.py:23-29`)."""
    if frozen:
        def norm(name):
            return lambda x, train: FrozenBatchNorm(
                momentum=momentum, dtype=dtype, name=name)(x, train)
    else:
        def norm(name):
            return lambda x, train: nn.BatchNorm(
                use_running_average=not train, momentum=momentum,
                epsilon=1e-5, dtype=dtype, name=name)(x)
    return norm


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 reduce → 3x3 (stride/dilation) → 1x1
    expand(x4), projection shortcut on shape change."""
    planes: int
    stride: int = 1
    dilation: int = 1
    frozen_bn: bool = True
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.frozen_bn, self.bn_momentum, self.dtype)
        out_ch = self.planes * self.expansion
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_out, name="conv1")(x)
        y = norm("bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_out, name="conv2")(y)
        y = norm("bn2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_out, name="conv3")(y)
        y = norm("bn3")(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=kaiming_out, name="ds_conv")(x)
            identity = norm("ds_bn")(identity, train)
        return nn.relu(y + identity)


class BasicBlockI(nn.Module):
    """torchvision BasicBlock (ResNet-18/34)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    frozen_bn: bool = True
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.frozen_bn, self.bn_momentum, self.dtype)
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_out, name="conv1")(x)
        y = norm("bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_out,
                    name="conv2")(y)
        y = norm("bn2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=kaiming_out, name="ds_conv")(x)
            identity = norm("ds_bn")(identity, train)
        return nn.relu(y + identity)


class ResNetStage(nn.Module):
    """One of layer1..layer4: n blocks, stride on the first."""
    block: Any  # Bottleneck or BasicBlockI class
    planes: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1
    prev_dilation: int = 1
    frozen_bn: bool = True
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torchvision dilation semantics: when a stage is dilated, its
        # stride moves into dilation; first block uses prev_dilation.
        stride = self.stride
        first_dil = self.prev_dilation
        if self.dilation > self.prev_dilation:
            stride = 1
        for i in range(self.num_blocks):
            x = self.block(planes=self.planes,
                           stride=stride if i == 0 else 1,
                           dilation=first_dil if i == 0 else self.dilation,
                           frozen_bn=self.frozen_bn,
                           bn_momentum=self.bn_momentum,
                           dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class ResNetTorso(nn.Module):
    """Stem + layer1..4 with tap-indexed split forward.

    Tap indices (the reference's ``out_idx``): 1..4 = exit after layer1..4.
    ``low_level`` (post-layer1 feature) is returned by :meth:`head` when
    requested, matching the segmentation backbone's always-exported
    low_level (`Segmentation/network/backbone/resnet.py:201-253`).
    """
    layers: Sequence[int] = (3, 4, 6, 3)          # resnet50
    block_name: str = "bottleneck"                # or "basic"
    output_stride: int = 32                       # 8/16 dilate per modeling.py
    frozen_bn: bool = True
    bn_momentum: float = 0.9
    include_normalize: bool = True
    # rematerialize stages in backward passes: trades ~25% FLOPs for a
    # large activation-memory cut — required for full-scale (600x1000)
    # detection training on a 16GB chip (jax.checkpoint, SURVEY.md design
    # note "use remat to trade FLOPs for memory"). Either one bool for all
    # 4 stages or a per-stage 4-sequence (selective remat: early stages
    # carry the largest activations per FLOP, so e.g. (1,1,0,0) cuts most
    # of the memory at a fraction of the recompute).
    remat: Any = True
    dtype: Any = jnp.float32

    def _dilations(self) -> Tuple[List[int], List[int]]:
        # (strides, dilations) for layer1..4 given output_stride
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        if self.output_stride == 16:
            dilations = [1, 1, 1, 2]
        elif self.output_stride == 8:
            dilations = [1, 1, 2, 4]
        return strides, dilations

    def setup(self):
        block = Bottleneck if self.block_name == "bottleneck" else BasicBlockI
        strides, dils = self._dilations()
        planes = (64, 128, 256, 512)
        remat_mask = (tuple(self.remat) if isinstance(self.remat, (tuple, list))
                      else (bool(self.remat),) * 4)
        stages = []
        prev_dil = 1
        for i in range(4):
            stage_cls = (nn.remat(ResNetStage, static_argnums=(2,))
                         if remat_mask[i] else ResNetStage)
            stages.append(stage_cls(
                block=block, planes=planes[i], num_blocks=self.layers[i],
                stride=strides[i], dilation=dils[i], prev_dilation=prev_dil,
                frozen_bn=self.frozen_bn, bn_momentum=self.bn_momentum,
                dtype=self.dtype, name=f"layer{i + 1}"))
            prev_dil = dils[i]
        self.stages_list = stages
        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                             use_bias=False, dtype=self.dtype,
                             kernel_init=kaiming_out, name="conv1")
        if self.frozen_bn:
            self.bn1 = FrozenBatchNorm(momentum=self.bn_momentum,
                                       dtype=self.dtype, name="bn1")
        else:
            self.bn1 = nn.BatchNorm(momentum=self.bn_momentum, epsilon=1e-5,
                                    dtype=self.dtype, name="bn1")

    def _norm_input(self, x):
        if not self.include_normalize:
            return x
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        return (x - mean) / std

    def stem(self, x, train: bool = False):
        x = self._norm_input(x)
        x = self.conv1(x)
        if self.frozen_bn:
            x = self.bn1(x, train)
        else:
            x = self.bn1(x, use_running_average=not train)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride 2, padding 1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x

    def __call__(self, x, start: int = 0, end: int = 4, train: bool = False,
                 with_low_level: bool = False):
        """Run layers (start, end]: start=0 includes the stem; e.g.
        (0, 3] = clean detection forward to layer3; (2, 4] = tail resuming
        from a layer2 feature."""
        low_level = None
        if start == 0:
            x = self.stem(x, train)
            start_stage = 0
        else:
            start_stage = start
        for i in range(start_stage, end):
            x = self.stages_list[i](x, train)
            if i == 0:
                low_level = x
        if with_low_level:
            return x, low_level
        return x

    def head(self, x, tap: int, train: bool = False,
             with_low_level: bool = False):
        """Input → feature after layer``tap`` (+ low_level after layer1)."""
        return self(x, 0, tap, train, with_low_level)

    def tail(self, feature, tap: int, end: int = 4, train: bool = False):
        """Resume from a (possibly adversarial) layer-``tap`` feature."""
        return self(feature, tap, end, train)

    def run_stage(self, x, stage: int, train: bool = False):
        """Apply a single layer (used for the detection 'hidden' = layer4
        on pooled ROIs, `Detection/backbone/resnet50.py:31-33`)."""
        return self.stages_list[stage](x, train)


def resnet18(**kw) -> ResNetTorso:
    kw.setdefault("block_name", "basic")
    return ResNetTorso(layers=(2, 2, 2, 2), **kw)


def resnet50(**kw) -> ResNetTorso:
    return ResNetTorso(layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNetTorso:
    return ResNetTorso(layers=(3, 4, 23, 3), **kw)


BACKBONES = {"resnet18": resnet18, "resnet50": resnet50,
             "resnet101": resnet101}


def from_name(name: str, **kw) -> ResNetTorso:
    """Backbone registry (parity with `Detection/backbone/base.py:10-22`)."""
    if name not in BACKBONES:
        raise ValueError(f"unknown backbone {name!r}; have {list(BACKBONES)}")
    return BACKBONES[name](**kw)


# channels out of layer3 (detection features) / layer4 (hidden) per arch
NUM_FEATURES_OUT = {"resnet18": 256, "resnet50": 1024, "resnet101": 1024}
NUM_HIDDEN_OUT = {"resnet18": 512, "resnet50": 2048, "resnet101": 2048}
